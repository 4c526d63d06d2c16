#!/usr/bin/env python
"""Fast + hybrid on the dense-occupancy stress volume (VERDICT round 3
#4): the 50%-occupancy fog (volume/io.dense_stress) removes everything the
fast mode's occupancy gates skip and marches rays DEEP — does the hybrid's
concentrated-error model (selection covers the worst tiles) still hold,
and what do the modes cost?

For each pose: mean |mode - exact_kernel| (the exact Pallas kernel is the
ground truth; its own oracle parity is ~1e-6) and slope-timed frame cost
at the bench pose. Writes /tmp/r4_logs/dense_stress.json.

Usage: python tools/dense_stress_probe.py [budget]
"""
from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

W = H = 1024


def main():
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    from bench import slope_time
    from vokselis_tpu.core.camera import Camera, CameraUniform
    from vokselis_tpu.ops.hybrid import HybridBonsaiRenderer
    from vokselis_tpu.ops.pallas.march_bonsai import build_renderer
    from vokselis_tpu.ops.shear_warp import FastBonsaiRenderer, pose_hint
    from vokselis_tpu.volume.io import dense_stress

    poses = {
        "bench": Camera.bonsai(1.0),
        "z1.0-axis": Camera(zoom=1.0, pitch=0.0, yaw=0.0,
                            target=(0.5, 0.5, 0.5), aspect=1.0),
        "z1.6-diag": Camera(zoom=1.6, pitch=0.5, yaw=math.pi / 4,
                            target=(0.5, 0.5, 0.5), aspect=1.0),
    }

    vol = dense_stress()
    render, pack = build_renderer(vol, with_overflow=True)
    exact = {k: np.asarray(render(pack, c.uniform(), W, H)[0])
             for k, c in poses.items()}
    print("exact frames done", flush=True)

    fast = FastBonsaiRenderer(vol)
    hyb = HybridBonsaiRenderer(vol, budget=budget)
    out = {"budget": budget}
    for name, cam in poses.items():
        u = cam.uniform()
        f = np.asarray(fast(u, W, H))
        h, _ = hyb._call_traced(u, W, H)
        h = np.asarray(h)
        ef = float(np.abs(f[..., :3] - exact[name][..., :3]).mean())
        eh = float(np.abs(h[..., :3] - exact[name][..., :3]).mean())
        out[f"{name}_fast_err"] = ef
        out[f"{name}_hybrid_err"] = eh
        print(f"{name}: fast {ef:.3e}  hybrid {eh:.3e}", flush=True)

    # slope-timed frame costs at the bench pose
    u0 = poses["bench"].uniform()

    def build_exact(n):
        def frames(pk, vp, pv, ip):
            def body(i, acc):
                u = CameraUniform(vp + acc * 1e-20, pv, ip)
                img, _ = render(pk, u, W, H)
                return acc + img[0, 0, 0] + img[H // 2, W // 2, 0]
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        jf = jax.jit(frames)
        return lambda: jf(pack, u0.view_position, u0.proj_view, u0.inv_proj)

    sec = slope_time(build_exact)
    out["exact_ms"] = round(sec * 1000, 2)
    print(f"exact {sec*1000:.2f} ms", flush=True)

    from vokselis_tpu.ops.shear_warp import _render_fast

    fpacks = fast.packs

    def build_fast(n):
        def frames(pk, vp, pv, ip):
            def body(i, acc):
                u = CameraUniform(vp + acc * 1e-20, pv, ip)
                img = _render_fast(pk, u, W, H, 512, True,
                                   warp_win=0, warp_wu=128)
                return acc + img[0, 0, 0] + img[H // 2, W // 2, 0]
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        jf = jax.jit(frames)
        return lambda: jf(fpacks, u0.view_position, u0.proj_view,
                          u0.inv_proj)

    sec = slope_time(build_fast)
    out["fast_ms"] = round(sec * 1000, 2)
    print(f"fast {sec*1000:.2f} ms", flush=True)

    frender, fpack = hyb.functional()
    hint = pose_hint(u0, W, H, hyb.intermediate, hyb.dims)

    def build_hyb(n):
        def frames(pk, vp, pv, ip):
            def body(i, acc):
                u = CameraUniform(vp + acc * 1e-20, pv, ip)
                img, _o, _d = frender(pk, u, W, H, hint=hint)
                return acc + img[0, 0, 0] + img[H // 2, W // 2, 0]
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        jf = jax.jit(frames)
        return lambda: jf(fpack, u0.view_position, u0.proj_view,
                          u0.inv_proj)

    sec = slope_time(build_hyb)
    out["hybrid_ms"] = round(sec * 1000, 2)
    print(f"hybrid {sec*1000:.2f} ms", flush=True)

    print(json.dumps(out), flush=True)
    os.makedirs("/tmp/r4_logs", exist_ok=True)
    with open("/tmp/r4_logs/dense_stress.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
