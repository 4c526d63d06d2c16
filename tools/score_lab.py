#!/usr/bin/env python
"""Offline tile-scoring lab: iterate the hybrid's re-march selection in
pure numpy against the raw per-pose dumps from tools/residual_decay.py
(/tmp/r3_logs/decay_raw_<pose>_<ii>.npz) — no TPU round-trips, no jit
variants. For each candidate scheme prints the budget needed to reach the
error targets per pose, plus err(B) at reference budgets, next to the
ORACLE (sort by true per-tile error) floor.

The winning scheme gets implemented in ops/hybrid.py (and mirrored in
residual_decay's replica); this file documents the losers so they don't
get re-tried.

Usage: python tools/score_lab.py [ii]
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np

TILE = 32


def tile_mean(x):
    ny, nx = x.shape[0] // TILE, x.shape[1] // TILE
    return x.reshape(ny, TILE, nx, TILE).mean(axis=(1, 3)).reshape(-1)


def tile_max(x):
    ny, nx = x.shape[0] // TILE, x.shape[1] // TILE
    return x.reshape(ny, TILE, nx, TILE).max(axis=(1, 3)).reshape(-1)


def dilate3(t, ny, nx):
    t = t.reshape(ny, nx)
    p = np.pad(t, 1)
    return np.max(np.stack([p[i:i + ny, j:j + nx]
                            for i in range(3) for j in range(3)]),
                  axis=0).reshape(-1)


def budget_for(order, per_tile_err, target, n_tiles):
    """Smallest prefix of `order` whose removal brings mean err <= target."""
    total = per_tile_err.mean()
    cum = np.cumsum(per_tile_err[order]) / n_tiles
    resid = total - cum
    idx = np.nonzero(resid <= target)[0]
    return int(idx[0]) + 1 if idx.size else None


def schemes(d):
    errd, bad, rgb, fast_s = d["errd"], d["bad"], d["rgb"], d["fast_srgb"]
    lum = np.maximum(rgb.mean(axis=-1), 1e-6)
    slope = np.where(lum > 0.0031308,
                     (1.055 / 2.4) * lum ** (1.0 / 2.4 - 1.0), 12.92)
    lums = fast_s.mean(axis=-1)
    gx = np.abs(np.diff(lums, axis=1, prepend=lums[:, :1]))
    gy = np.abs(np.diff(lums, axis=0, prepend=lums[:1]))
    edge_t = tile_mean(gx + gy)
    errd_t = tile_mean(errd * slope)
    ext = tile_mean((bad & 1).astype(np.float32))
    ovf = tile_mean(((bad & 2) > 0).astype(np.float32))
    ny, nx = lums.shape[0] // TILE, lums.shape[1] // TILE
    peak = dilate3(tile_max(lums), ny, nx)
    errd_mx = tile_max(errd * slope)

    out = {
        "v1-boost-all-bad": np.where(
            (ext + ovf) > 0, 1e3 + ext + ovf, errd_t + 0.03 * edge_t),
        "v2-ext*peak": np.where(
            ovf > 0, 1e3 + ovf, errd_t + 0.03 * edge_t + ext * peak),
        "v3-no-edge": np.where(
            ovf > 0, 1e3 + ovf, errd_t + ext * peak),
        "v4-mean+max": np.where(
            ovf > 0, 1e3 + ovf,
            errd_t + errd_mx / 1024.0 + 0.03 * edge_t + ext * peak),
        "v5-ovf-ranked": (errd_t + 0.03 * edge_t + ext * peak
                          + ovf * peak * 4.0),
        "v6-ext-soft": np.where(
            ovf > 0, 1e3 + ovf,
            errd_t + 0.03 * edge_t + 0.25 * ext * peak),
        "v7-ovf8": (errd_t + 0.03 * edge_t + ext * peak + ovf * peak * 8.0),
        "v8-no-edge": (errd_t + ext * peak + ovf * peak * 4.0),
        "v9-edge01": (errd_t + 0.01 * edge_t + ext * peak
                      + ovf * peak * 4.0),
        "v10-scurv": (errd_t + 0.03 * edge_t + 0.2 * scurv_t(fast_s)
                      + ext * peak + ovf * peak * 4.0),
        "v11-extovf-half": (errd_t + 0.03 * edge_t
                            + 0.5 * (ext + ovf) * peak),
        "v12-ext2": (errd_t + 0.03 * edge_t + (ext * 2.0 + ovf * 4.0)
                     * peak),
    }
    return out


def scurv_t(fast_s):
    """Screen-space curvature of the fast sRGB frame (tile mean)."""
    l = fast_s.mean(axis=-1)
    d2x = np.abs(2 * l - np.roll(l, 1, 1) - np.roll(l, -1, 1))
    d2y = np.abs(2 * l - np.roll(l, 1, 0) - np.roll(l, -1, 0))
    return tile_mean(d2x + d2y)


def main():
    ii = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    files = sorted(glob.glob(f"/tmp/r3_logs/decay_raw_*_{ii}.npz"))
    if not files:
        sys.exit("no dumps; run tools/residual_decay.py first")
    targets = (8e-4, 4e-4)
    budgets_ref = (32, 48, 64, 96, 128)

    agg = {}
    for f in files:
        pose = os.path.basename(f)[len("decay_raw_"):-len(f"_{ii}.npz")]
        d = np.load(f)
        pte = d["per_tile_err"]
        n_tiles = pte.size
        oracle = np.argsort(pte)[::-1]
        rows = {"oracle": oracle}
        for name, sc in schemes(d).items():
            rows[name] = np.argsort(sc)[::-1]
        print(f"\n=== {pose}  (total fast err {pte.mean():.3e}) ===")
        for name, order in rows.items():
            bs = [budget_for(order, pte, t, n_tiles) for t in targets]
            cum = np.cumsum(pte[order]) / n_tiles
            errs = " ".join(
                f"B{b}={pte.mean() - cum[b - 1]:.1e}" for b in budgets_ref)
            print(f"  {name:18s} B(8e-4)={bs[0]} B(4e-4)={bs[1]}  {errs}")
            agg.setdefault(name, []).append(bs[0] if bs[0] else 9999)

    print("\n=== worst-pose budget for 8e-4 ===")
    for name, arr in agg.items():
        print(f"  {name:18s} {max(arr)}")


if __name__ == "__main__":
    main()
