#!/usr/bin/env python
"""The pair-fusion trade, measured as one decision: error on the sweep's
worst poses AND interleaved frame timing for each (pair, budget) config.

Round-4 finding chain: the pair-fused re-march cut the op point 8.45 ->
7.81 ms, but pair-granularity selection wastes budget on low-score pair
partners — the 72-pose sweep regressed to 3 poses over 1e-3 (max 1.25e-3)
where single-tile selection at the same budget clears (worst 9.7e-4,
tools/pair_rank_probe + the VOK_HYBRID_PAIR=0 probe). The fix is either
more budget (pairs at 72/80) or dropping pairs: this probe measures all
four configs in ONE process (pair is patched at trace time; budget is a
jit static) so the timing comparison is interleaved, not cross-process.

Usage: python tools/pair_tradeoff_probe.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

W = H = 1024
N_HI = int(os.environ.get("VOK_PROBE_NHI", "12"))
CONFIGS = [("pair64", True, 64), ("single64", False, 64),
           ("pair72", True, 72), ("pair80", True, 80)]
POSES = [("bench", 1.0, 0.5, 0), ("y1", 1.0, -0.35, 1),
         ("y5", 1.0, -0.35, 5), ("y7", 1.0, -0.35, 7)]


def main():
    from vokselis_tpu.core.camera import Camera, CameraUniform
    from vokselis_tpu.ops import hybrid as hmod
    from vokselis_tpu.ops.pallas.march_bonsai import build_renderer
    from vokselis_tpu.volume.io import get_bonsai

    vol = get_bonsai()
    hyb = hmod.HybridBonsaiRenderer(vol, intermediate=512)
    render_e, pack_e = build_renderer(vol, with_overflow=True)
    frender, fpack = hyb.functional()
    u0 = Camera.bonsai(1.0).uniform()

    @jax.jit
    def diff(h, e):
        return jnp.abs(h[..., :3] - e[..., :3]).mean()

    exacts = {}
    for name, zoom, pitch, yi in POSES:
        cam = Camera(zoom=zoom, pitch=pitch, yaw=2 * math.pi * yi / 8,
                     target=(0.5, 0.5, 0.5), aspect=1.0)
        u = cam.uniform()
        e, _ = render_e(pack_e, u, W, H)
        exacts[name] = (u, e)
    print("exact frames done", flush=True)

    out = {"n_hi": N_HI}
    timers = {}
    for tag, pair, budget in CONFIGS:
        # pair is read at TRACE time via _pair_mode's module global
        hmod._PAIR = pair
        errs = {}
        for name, (u, e) in exacts.items():
            h, _, _ = frender(fpack, u, W, H, budget=budget)
            errs[name] = float(diff(h, e))
        out[tag + "_errs"] = errs
        print(f"{tag}: " + "  ".join(f"{k}={v:.3e}" for k, v in errs.items()),
              flush=True)

        def build(n, budget=budget, pair=pair):
            hmod._PAIR = pair

            def frames(pk, vp, pv, ip):
                def body(i, acc):
                    u = CameraUniform(vp + acc * 1e-20, pv, ip)
                    img, _o, _d = frender(pk, u, W, H, budget=budget)
                    return acc + img[0, 0, 0] + img[H // 2, W // 2, 0]
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            jf = jax.jit(frames)
            return lambda: jf(fpack, u0.view_position, u0.proj_view,
                              u0.inv_proj)

        f1, fN = build(1), build(N_HI)
        np.asarray(f1()); np.asarray(fN())
        np.asarray(f1()); np.asarray(fN())
        timers[tag] = (f1, fN)
        print(f"{tag}: timing warmed", flush=True)

    rounds = 7
    slopes = {tag: [] for tag, _, _ in CONFIGS}
    for _ in range(rounds):
        for tag, _, _ in CONFIGS:
            f1, fN = timers[tag]
            t = time.time(); np.asarray(f1()); t1 = time.time() - t
            t = time.time(); np.asarray(fN()); tn = time.time() - t
            slopes[tag].append(max((tn - t1) / (N_HI - 1), 1e-9))

    for tag, _, _ in CONFIGS:
        s = np.asarray(slopes[tag]) * 1000
        out[tag + "_ms"] = round(float(np.median(s)), 3)
        print(f"{tag}: {np.median(s):.3f} ms  (min {s.min():.3f} "
              f"max {s.max():.3f})  = {W*H/np.median(s)/1e3:.0f} Mrays/s",
              flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
