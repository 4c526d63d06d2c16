#!/usr/bin/env python
"""Hybrid predictor + cost study (round 3, after the first timing pass).

The naive luminance-contrast ranking picks dense-canopy tiles (fbm
texture = high contrast) whose exact re-march costs 50-80 us each; the
true error tiles are the silhouette RIM (content/background boundaries)
whose grazing rays are occupancy-gated cheap. This study scores several
predictors on (a) tiles needed to reach mean err targets and (b) the
actual per-tile march cost of each predictor's selection.

Usage: python tools/hybrid_study2.py [n_poses]
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


def k_needed(tm, order, n_tiles, target):
    cum = np.cumsum(tm[order])
    rem = (tm.sum() - cum) / n_tiles
    if rem[-1] > target:
        return -1
    return int(np.searchsorted(-rem, -target) + 1)


def main():
    n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 8

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
    meta, pack = prepare_volume(vol, 64)
    dims, band_rows, nb, bstride = meta
    W = H = 1024
    n_tiles = (H // TILE) * (W // TILE)

    poses = []
    for i in range(n_poses):
        yaw = 1.0 + 2.0 * np.pi * i / n_poses
        pitch = [0.5, 0.2, -0.4, 0.9][i % 4]
        zoom = [1.0, 1.3, 0.8, 1.6][(i // 4) % 4]
        poses.append(Camera(zoom=zoom, pitch=pitch, yaw=yaw,
                            target=(0.5, 0.5, 0.5), aspect=1.0))

    # jitted tile-subset march with ids as ARGUMENT (fixed budget shape)
    BUDGET = 64

    @jax.jit
    def march_tiles(eye, dx, dy, dz, ids):
        return render_bonsai_tiles_pallas(
            pack, eye, (dx, dy, dz), ids, dims, 444, 64,
            band_rows, nb, bstride,
        )

    def time_tiles(eye, dxyz, ids):
        ids = jnp.asarray(ids, jnp.int32)
        dx, dy, dz = dxyz

        def run():
            p, o = march_tiles(eye, dx, dy, dz, ids)
            return np.asarray(p[0][0, 0])

        run(); run()
        ts = []
        for _ in range(5):
            t = time.time(); run(); ts.append(time.time() - t)
        return float(np.median(ts)) * 1000  # ms incl ~29ms dispatch floor

    sel_sets = {}
    for p_i, cam in enumerate(poses):
        u = cam.uniform()
        img_e = np.asarray(exact(u, W, H))[..., :3]
        img_f = np.asarray(fast(u, W, H))[..., :3]
        err = np.abs(img_e - img_f).mean(axis=-1)
        tm = tile_mean(err)

        lum = img_f.mean(axis=-1)
        gx = np.abs(np.diff(lum, axis=1, prepend=lum[:, :1]))
        gy = np.abs(np.diff(lum, axis=0, prepend=lum[:1]))
        edge = gx + gy

        # P1: raw contrast
        p1 = tile_mean(edge)
        # P2: content-background boundary fraction: edge pixels whose 3x3
        # neighborhood touches near-black
        from scipy.ndimage import minimum_filter
        near_black = (minimum_filter(lum, size=5) < 5e-3).astype(np.float32)
        p2 = tile_mean(edge * near_black)
        # P3: boundary + a small contrast term (inner silhouettes)
        p3 = p2 + 0.08 * p1

        row = [f"pose {p_i}: err={err.mean():.2e}"]
        orders = {}
        for name, score in (("true", tm), ("P1", p1), ("P2", p2),
                            ("P3", p3)):
            order = np.argsort(score)[::-1]
            orders[name] = order
            k8 = k_needed(tm, order, n_tiles, 8e-4)
            k10 = k_needed(tm, order, n_tiles, 1e-3)
            row.append(f"{name}: k8e-4={k8} k1e-3={k10}")
        print("  ".join(row), flush=True)
        sel_sets[p_i] = orders

    # cost of marching each predictor's top-64 on pose 0 and pose 3
    for p_i in (0, 3 if n_poses > 3 else 0):
        cam = poses[p_i]
        u = cam.uniform()
        eye, dxyz = geometry.rays_fragment_soa(u, W, H)
        eye = jnp.asarray(eye)
        base = time_tiles(eye, dxyz, np.full(BUDGET, n_tiles))  # all-miss
        for name in ("true", "P1", "P2", "P3"):
            ids = sel_sets[p_i][name][:BUDGET]
            ms = time_tiles(eye, dxyz, ids)
            print(f"pose {p_i} {name}-top{BUDGET}: {ms:.1f} ms raw, "
                  f"marginal {(ms - base) * 1000 / BUDGET:.1f} us/tile",
                  flush=True)
        print(f"pose {p_i} all-miss baseline: {base:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
