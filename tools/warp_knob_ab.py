#!/usr/bin/env python
"""WITHIN-RUN A/B of the warp knobs on the stats-contract frame at I=1024:
where do the warp milliseconds live?

Variants (module flags patched between jit builds, trace-time reads):
  base            : pass-1 window (WIN_CAP=48, 128), rewarp cap 192
  norewarp        : adaptive pass-2 disabled (cap 0) — timing-only (error
                    shifts to the overflow flags / re-march)
  cap64 / cap384  : rewarp cap sweep
  win80           : pass-1 WIN_CAP 80 (fewer overflow tiles -> smaller
                    pass 2; costs every tile a bigger matmul)

Timing-only: error consequences are NOT measured here (the mini-sweep /
oppoint ladder own that); this locates cost, nothing else.

Usage: python tools/warp_knob_ab.py [I]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax


def main():
    ii = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    width = height = 1024

    from bench import slope_time
    import vokselis_tpu.ops.pallas.warp2d as w2
    import vokselis_tpu.ops.shear_warp as sw
    from vokselis_tpu.core.camera import Camera, CameraUniform
    from vokselis_tpu.volume.io import get_bonsai

    u0 = Camera.bonsai(1.0).uniform()
    packs = sw.prepare_fast_volume(get_bonsai())

    def measure():
        def builder(n):
            def frames(pk, vp, pv, ip):
                def body(i, acc):
                    u = CameraUniform(vp + acc * 1e-20, pv, ip)
                    (r, g, b), stats = sw._render_fast(
                        pk, u, width, height, ii, False,
                        return_aux="stats")
                    return acc + r[0, 0] + stats[0, 0] + b[-1, -1]
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            jf = jax.jit(frames)
            return lambda: jf(packs, u0.view_position, u0.proj_view,
                             u0.inv_proj)
        return slope_time(builder) * 1000.0

    base_cap, base_win = w2._REWARP_CAP, w2.WIN_CAP
    variants = [
        ("base", base_cap, base_win),
        ("norewarp", 0, base_win),
        ("cap64", 64, base_win),
        ("cap384", 384, base_win),
        ("win80", base_cap, 80),
        ("base2", base_cap, base_win),  # drift sentinel
    ]
    for name, cap, win in variants:
        w2._REWARP_CAP, w2.WIN_CAP = cap, win
        # warp_stats_packed is itself jit-decorated: its cached trace
        # would ignore the patched flags without an explicit clear
        try:
            w2.warp_stats_packed.clear_cache()
        except AttributeError:
            pass
        t0 = time.time()
        ms = measure()
        print(f"{name:9s} cap={cap:3d} win={win:2d}  {ms:6.2f} ms  "
              f"[{time.time()-t0:.0f}s wall]", flush=True)
    w2._REWARP_CAP, w2.WIN_CAP = base_cap, base_win


if __name__ == "__main__":
    main()
