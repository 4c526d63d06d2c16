#!/usr/bin/env python
"""The north-star conjunction check: renderer="hybrid" error vs the exact
kernel across the 72-pose sweep (3 zooms x 3 pitches x 8 yaws at 1024^2,
the window-policy sweep's pose set) + slope-timed speed at the bench pose.

Per-pose |hybrid - exact| is reduced ON DEVICE (16 MB/frame transfers
choke this tunnel). Prints per-pose mean err, the sweep mean/max, and the
frame time. Results checkpoint to /tmp/hybrid_sweep_<budget>_<ii>.jsonl —
a rerun skips poses already measured (the tunnel dies mid-sweep at times).

Usage: python tools/hybrid_sweep.py [budget] [intermediate] [n_yaw]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    ii = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    n_yaw = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from bench import slope_time
    from vokselis_tpu.core.camera import Camera, CameraUniform
    from vokselis_tpu.ops.hybrid import HybridBonsaiRenderer
    from vokselis_tpu.ops.pallas.march_bonsai import build_renderer
    from vokselis_tpu.volume.io import get_bonsai

    W = H = 1024
    vol = get_bonsai()
    hyb = HybridBonsaiRenderer(vol, intermediate=ii, budget=budget)
    render, pack = build_renderer(vol, with_overflow=True)

    @jax.jit
    def diff(h, e):
        d = jnp.abs(h[..., :3] - e[..., :3]).mean(axis=-1)
        return d.mean(), d.max()

    def err_of(u):
        # two separate top-level dispatches (their jits are already
        # compiled/cached); only the tiny reduction jit is new
        e, _ovf = render(pack, u, W, H)
        h, _o = hyb._call_traced(u, W, H)
        me, mx = diff(h, e)
        return me, mx

    import json

    ckpt_path = f"/tmp/hybrid_sweep_{budget}_{ii}.jsonl"
    done = {}
    if os.path.exists(ckpt_path):
        with open(ckpt_path) as f:
            for line in f:
                rec = json.loads(line)
                done[rec["pose"]] = rec
        print(f"resuming: {len(done)} poses from {ckpt_path}", flush=True)
    ckpt = open(ckpt_path, "a")

    errs, maxes = [], []
    t0 = time.time()
    for zoom in (0.6, 1.0, 1.6):
        for pitch in (0.5, -0.35, 1.2):
            for i in range(n_yaw):
                key = f"{zoom}/{pitch}/{i}"
                if key in done:
                    me, mx = done[key]["mean"], done[key]["max"]
                else:
                    cam = Camera(zoom=zoom, pitch=pitch,
                                 yaw=2 * math.pi * i / n_yaw,
                                 target=(0.5, 0.5, 0.5), aspect=1.0)
                    u = cam.uniform()
                    me, mx = err_of(u)
                    me, mx = float(me), float(mx)
                    ckpt.write(json.dumps(
                        {"pose": key, "mean": me, "max": mx}) + "\n")
                    ckpt.flush()
                errs.append(me)
                maxes.append(mx)
                flag = " <-- over" if me > 1e-3 else ""
                print(f"zoom={zoom} pitch={pitch} yaw_i={i}: "
                      f"mean={me:.2e} max={mx:.3f}{flag}", flush=True)
    errs = np.asarray(errs)
    print(f"\nsweep ({len(errs)} poses, budget={budget}, I={ii}): "
          f"mean-of-means={errs.mean():.3e}  worst-pose={errs.max():.3e}  "
          f"poses>1e-3: {(errs > 1e-3).sum()}  [{time.time()-t0:.0f}s]",
          flush=True)

    # speed at the bench pose (pin the pose's real window hint: the loop
    # body is traced, so pose_hint alone would fall back to defaults)
    from vokselis_tpu.ops.shear_warp import pose_hint

    u0 = Camera.bonsai(1.0).uniform()
    hint = pose_hint(u0, W, H, ii, hyb.dims)
    print(f"bench-pose hint (win, wu, degen): {hint}", flush=True)

    # packs/layouts as jit ARGUMENTS: closing over them bakes ~100 MB of
    # constants into the HLO -> HTTP 413 on the remote-compile hop
    frender, fpack = hyb.functional()

    def build(n):
        def frames(pk, vp, pv, ip):
            def body(i, acc):
                u = CameraUniform(vp + acc * 1e-20, pv, ip)
                img, _o, _d = frender(pk, u, W, H, hint=hint)
                return acc + img[0, 0, 0] + img[H // 2, W // 2, 0]
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        jf = jax.jit(frames)
        return lambda: jf(fpack, u0.view_position, u0.proj_view, u0.inv_proj)

    sec = slope_time(build)
    print(f"hybrid frame at bench pose: {sec*1000:.2f} ms = "
          f"{W*H/sec/1e6:.0f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
