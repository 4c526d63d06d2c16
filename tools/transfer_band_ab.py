#!/usr/bin/env python
"""WITHIN-RUN A/B of the round-5 fast-frame changes (low-degree transfer,
banded resample) on the hybrid-relevant stats-contract frame.

Motivation: both changes WIN standalone at I=1024 (composite 2.05 -> 1.07,
resample 0.97 -> 0.51, slope-timed in their own processes) yet ladder b0
moved 4.02 -> 4.57 -> 4.92 ACROSS runs spanning hours — while remote
compile walls doubled (505 -> 1075 s), i.e. the tunnel's own speed drifts
by tens of percent across runs. CLAUDE.md already bans trusting
cross-run full-frame deltas; this tool builds EVERY (band, lowdeg)
variant in ONE process and slope-times them back to back, so the only
difference between rows is the code path.

The _BAND/_LOWDEG flags are read at import but consulted at TRACE time,
so monkeypatching the module globals between jit builds yields distinct
compiled variants in one process.

Usage: python tools/transfer_band_ab.py [I] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    ii = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    width = height = 1024

    from bench import slope_time
    import vokselis_tpu.ops.pallas.shear_resample as sr
    import vokselis_tpu.ops.shear_warp as sw
    from vokselis_tpu.core.camera import Camera, CameraUniform
    from vokselis_tpu.volume.io import get_bonsai

    u0 = Camera.bonsai(1.0).uniform()
    packs = sw.prepare_fast_volume(get_bonsai())

    def build(band, lowdeg):
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

        sr._BAND = band
        sr._LOWDEG = lowdeg
        t0 = time.time()
        ms = slope_time(builder, repeats=reps) * 1000.0
        return ms, time.time() - t0

    rows = []
    # interleave A/B/A to expose drift WITHIN this run too
    for band, lowdeg in [(True, True), (False, True), (True, False),
                         (False, False), (True, True)]:
        ms, wall = build(band, lowdeg)
        rows.append((band, lowdeg, ms, wall))
        print(f"band={int(band)} lowdeg={int(lowdeg)}  {ms:6.2f} ms  "
              f"[{wall:.0f}s wall]", flush=True)
    print("\nfinal (band=1 lowdeg=1 repeat) vs first: "
          f"{rows[-1][2]:.2f} vs {rows[0][2]:.2f} ms "
          "(difference = within-run drift)")


if __name__ == "__main__":
    main()
