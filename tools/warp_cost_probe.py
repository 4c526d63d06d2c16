#!/usr/bin/env python
"""Decompose the MXU warp kernel's per-tile cost: how much of the ~1 ms
warp stage (tools/profile_fast2.py, I=512 @1024^2) is per-tile FIXED
machinery (grid step, coord min/max probes, window roll setup) vs work
that scales with the window size (rolls + hat matmuls)?

Method (all in ONE process — tunnel sessions vary +-15%, only in-process
A/B is trustworthy): slope-time warp_bilinear_packed on a real bench-pose
coordinate set at
  - the default pose window (adaptive off, win1)   -> baseline
  - a minimal (8, 128) window (WRONG output, same machinery) -> fixed cost
  - VOK_WARP_GATE=0 x default window (all tiles hot) -> gate value
  - adaptive on (the production config)             -> + pass-2 tax
If (win 8) ~= (win1), the kernel is fixed-cost-bound and fusing tiles
into (16, 128) grid steps (march kernel tps=2 analog) is the lever; if
not, the window work itself dominates and fusion can't help much.

Usage: python tools/warp_cost_probe.py [ii] [W H]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ii = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

    from bench import slope_time
    from vokselis_tpu.ops.pallas import warp2d
    from vokselis_tpu.ops.pallas.march_bonsai import _pack_tiles

    # Synthesize coords with the same STATISTICS as the bench pose —
    # per-tile windows spanning ~6..120 rows, ~55% hit coverage. For COST
    # purposes only the per-tile window geometry and hit density matter,
    # not the exact values (the kernel's work is data-independent given
    # the window extents).
    rng = np.random.default_rng(0)
    ny, nx = h // 32, w // 32
    n_tiles = ny * nx
    # hit disk covering ~55% of the frame like the bench pose
    yy, xx = np.mgrid[0:h, 0:w]
    hit = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) < (0.42 * h) ** 2
    # homography-like coords: affine + mild perspective
    avf = (yy - h * 0.05) * (ii / (1.15 * h)) + 8.0 * np.sin(xx / w * 3.0)
    buf = (xx - w * 0.05) * (ii / (1.15 * w)) + 8.0 * np.cos(yy / h * 2.0)
    avf = np.where(hit, avf, 1e6).astype(np.float32)
    buf = np.where(hit, buf, 1e6).astype(np.float32)

    def pk(x):
        return _pack_tiles(jnp.asarray(x), h, w)

    av_p, bu_p = pk(avf), pk(buf)
    hit_p = pk(hit.astype(np.float32))
    chans = jnp.asarray(
        rng.standard_normal((3, ii, ii)).astype(np.float32))

    results = {}

    def time_variant(name, win_rows, win_u, adaptive):
        f = jax.jit(
            lambda c, a, b, ht: warp2d.warp_bilinear_packed(
                c, a, b, ht, h, w, win_rows, win_u,
                with_overflow=True, adaptive=adaptive)[0])

        def build(n):
            @jax.jit
            def run(c, a, b, ht):
                def body(i, acc):
                    return acc + f(c, a, b, ht)[0, 0]
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
            return lambda: run(chans, av_p, bu_p, hit_p)

        ms = slope_time(build) * 1e3
        results[name] = round(ms, 3)
        print(f"{name:28s} {ms:6.3f} ms", flush=True)

    win1 = warp2d._win_rows(ii, h, w)
    time_variant(f"default win ({win1},128)", win1, 128, False)
    time_variant("minimal win (8,128)", 8, 128, False)
    time_variant("big win (128,256)", 128, 256, False)
    time_variant("adaptive (production)", None, 128, True)

    os.makedirs("/tmp/r4_logs", exist_ok=True)
    with open(f"/tmp/r4_logs/warp_cost_{ii}.json", "w") as fh:
        json.dump({"ii": ii, "w": w, "h": h, "win1": win1, **results}, fh)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
