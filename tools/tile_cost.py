#!/usr/bin/env python
"""Slope-timed per-tile marginal cost of the exact tile-subset march.

The hybrid renderer's viability hinges on the marginal cost of re-marching
a silhouette-rim tile with render_bonsai_tiles_pallas. study2's wall-clock
medians rode the ~29 ms dispatch floor; this measures the real on-device
cost as the slope between 1- and N-call fori loops, for several selections:

  miss     - all ids = n_tiles (the appended all-miss tile): pure per-step
             floor (class probes only, no DMA, no scan)
  true64   - top-64 tiles by TRUE |fast - exact| error (silhouette rim)
  P1-64    - top-64 by raw luminance contrast (dense canopy -> worst case)
  rim16/32 - P3 rim predictor truncated budgets

Usage: python tools/tile_cost.py [pose_idx] [win_rows]
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

TILE = 32


def tile_mean(x):
    ny, nx = x.shape[0] // TILE, x.shape[1] // TILE
    return x.reshape(ny, TILE, nx, TILE).mean(axis=(1, 3)).reshape(-1)


def slope_time(fn_builder, n_hi=5, repeats=5):
    f1 = fn_builder(1)
    fN = fn_builder(n_hi)
    np.asarray(f1()); np.asarray(fN())
    np.asarray(f1()); np.asarray(fN())
    slopes = []
    for _ in range(repeats):
        t = time.time(); np.asarray(f1()); t1 = time.time() - t
        t = time.time(); np.asarray(fN()); tn = time.time() - t
        slopes.append(max((tn - t1) / (n_hi - 1), 1e-9))
    return float(np.median(slopes))


def main():
    pose_idx = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    win = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from vokselis_tpu.core import geometry
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.ops.pallas.march_bonsai import (
        BonsaiRenderer, render_bonsai_tiles_pallas, prepare_volume,
    )
    from vokselis_tpu.ops.shear_warp import FastBonsaiRenderer
    from vokselis_tpu.volume.io import get_bonsai

    vol = get_bonsai()
    exact = BonsaiRenderer(vol)
    fast = FastBonsaiRenderer(vol, intermediate=512)
    (dims, band_rows, nb, bstride), pack = prepare_volume(vol, 64)
    W = H = 1024
    n_tiles = (H // TILE) * (W // TILE)

    yaw = 1.0 + 2.0 * np.pi * pose_idx / 8
    pitch = [0.5, 0.2, -0.4, 0.9][pose_idx % 4]
    zoom = [1.0, 1.3, 0.8, 1.6][(pose_idx // 4) % 4]
    cam = Camera(zoom=zoom, pitch=pitch, yaw=yaw,
                 target=(0.5, 0.5, 0.5), aspect=1.0)
    u = cam.uniform()

    img_e = np.asarray(exact(u, W, H))[..., :3]
    img_f = np.asarray(fast(u, W, H))[..., :3]
    err = np.abs(img_e - img_f).mean(axis=-1)
    tm = tile_mean(err)

    lum = img_f.mean(axis=-1)
    gx = np.abs(np.diff(lum, axis=1, prepend=lum[:, :1]))
    gy = np.abs(np.diff(lum, axis=0, prepend=lum[:1]))
    edge = gx + gy
    p1 = tile_mean(edge)
    from scipy.ndimage import minimum_filter
    near_black = (minimum_filter(lum, size=5) < 5e-3).astype(np.float32)
    p3 = tile_mean(edge * near_black) + 0.08 * p1

    order_t = np.argsort(tm)[::-1]
    order_1 = np.argsort(p1)[::-1]
    order_3 = np.argsort(p3)[::-1]

    eye, dxyz = geometry.rays_fragment_soa(u, W, H)
    eye = jnp.asarray(eye)
    dx, dy, dz = [jnp.asarray(v) for v in dxyz]

    def timed(ids_np, budget):
        ids = jnp.asarray(np.asarray(ids_np[:budget], np.int32))

        def builder(n):
            # pack as a jit ARGUMENT: closing over the ~100 MB layouts
            # bakes them into the HLO -> HTTP 413 on the remote-compile hop
            @jax.jit
            def run(pk, e, a, b, c, tids):
                def body(i, acc):
                    p, o = render_bonsai_tiles_pallas(
                        pk, e + acc * 1e-20, (a, b, c), tids, dims,
                        444, win, band_rows, nb, bstride,
                    )
                    return acc + p[0][0, 0] + o.astype(jnp.float32) * 1e-9
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            return lambda: run(pack, eye, dx, dy, dz, ids)
        # overflow check once
        p, o = jax.jit(render_bonsai_tiles_pallas,
                       static_argnums=(4, 5, 6, 7, 8, 9))(
            pack, eye, (dx, dy, dz), ids, dims, 444, win, band_rows, nb,
            bstride)
        ovf = int(o)
        return slope_time(builder), ovf

    sels = [
        ("miss64", np.full(64, n_tiles), 64),
        ("true64", order_t, 64),
        ("P1-64", order_1, 64),
        ("rim16", order_3, 16),
        ("rim32", order_3, 32),
        ("rim64", order_3, 64),
    ]
    base = None
    for name, order, budget in sels:
        ms, ovf = timed(order, budget)
        ms *= 1000
        note = ""
        if name == "miss64":
            base = ms
        elif base is not None:
            note = f"  marginal {(ms - base) * 1000 / budget:.1f} us/tile"
        print(f"pose {pose_idx} win {win} {name:7s}: {ms:6.2f} ms"
              f"  ovf={ovf}{note}", flush=True)


if __name__ == "__main__":
    main()
