#!/usr/bin/env python
"""Err-vs-budget curves WITHOUT per-budget recompiles: from one fast frame
(+aux) and one exact frame per pose, compute the hybrid's residual mean
error as a function of re-march budget under

  - ORACLE selection: tiles sorted by true per-tile |fast - exact| — the
    information-theoretic floor for any tile ranking; and
  - ACTUAL selection: the hybrid's score (warped curvature x sRGB slope +
    0.03 x screen edge, bad-tile boost, thresh parking — replicated from
    ops/hybrid.py in numpy).

Re-marched tiles become exactly right, so err(B) = total - sum(top-B tile
errors). The gap between the two curves is selection quality; the oracle
curve's tail is the DIFFUSE error floor no budget can fix (the fast
mode's structural ~1/I warp-reconstruction + sample-phase residual,
PARITY_REPORT.md). Prices the north-star conjunction: with the measured
re-march slope (tools/fit_budget_slope.py) a budget B costs
fast_ms + tax + B * slope — the curve says what error that buys.

Usage: python tools/residual_decay.py [ii] [budgets,csv]
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

W = H = 1024
TILE = 32


def tile_mean(x):
    ny, nx = x.shape[0] // TILE, x.shape[1] // TILE
    return x.reshape(ny, TILE, nx, TILE).mean(axis=(1, 3)).reshape(-1)


def main():
    ii = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    budgets = ([int(b) for b in sys.argv[2].split(",")] if len(sys.argv) > 2
               else [0, 16, 32, 48, 64, 96, 128, 192, 256, 384])

    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.core.colors import linear_to_srgb
    from vokselis_tpu.ops.hybrid import DEFAULT_THRESH
    from vokselis_tpu.ops.pallas.march_bonsai import build_renderer
    from vokselis_tpu.ops.shear_warp import (
        _render_fast, pose_hint, prepare_fast_volume,
    )
    from vokselis_tpu.volume.io import get_bonsai

    poses = {
        "bench": Camera.bonsai(1.0),
        "z1.0-axis": Camera(zoom=1.0, pitch=0.0, yaw=0.0,
                            target=(0.5, 0.5, 0.5), aspect=1.0),
        "z1.6-diag": Camera(zoom=1.6, pitch=0.5, yaw=math.pi / 4,
                            target=(0.5, 0.5, 0.5), aspect=1.0),
        "z1.0-tilt": Camera(zoom=1.0, pitch=-0.35, yaw=0.0,
                            target=(0.5, 0.5, 0.5), aspect=1.0),
    }

    vol = get_bonsai()
    render, pack = build_renderer(vol, with_overflow=True)
    packs = prepare_fast_volume(vol)

    out = {}
    for name, cam in poses.items():
        u = cam.uniform()
        wwin, wwu, degen = pose_hint(u, W, H, ii, 256)
        exact = np.asarray(render(pack, u, W, H)[0])[..., :3]
        img, bad, errd = _render_fast(packs, u, W, H, ii, False,
                                      warp_win=wwin, warp_wu=wwu,
                                      return_aux=True)
        # srgb like the final frame (error budget is measured in sRGB)
        fast_s = np.asarray(linear_to_srgb(jnp.maximum(img[..., :3], 0.0)))
        rgb = np.asarray(img[..., :3])
        bad = np.asarray(bad)
        errd = np.asarray(errd)

        err_px = np.abs(fast_s - exact).mean(axis=-1)
        per_tile_err = tile_mean(err_px)  # mean-per-pixel err owned by tile
        n_tiles = per_tile_err.size
        total = per_tile_err.mean()

        # actual scoring (ops/hybrid.py step 2, numpy replica)
        lum = np.maximum(rgb.mean(axis=-1), 1e-6)
        srgb_slope = np.where(lum > 0.0031308,
                              (1.055 / 2.4) * lum ** (1.0 / 2.4 - 1.0), 12.92)
        lums = fast_s.mean(axis=-1)
        gx = np.abs(np.diff(lums, axis=1, prepend=lums[:, :1]))
        gy = np.abs(np.diff(lums, axis=0, prepend=lums[:1]))
        scores = tile_mean(errd * srgb_slope) + 0.03 * tile_mean(gx + gy)
        # ops/hybrid.py replica (score-lab v5): extent + overflow channels
        # rank continuously, weighted by dilated tile peak luminance
        ext_frac = tile_mean((bad & 1).astype(np.float32))
        ovf_frac = tile_mean(((bad & 2) > 0).astype(np.float32))
        ny, nx = H // TILE, W // TILE
        tp = lums.reshape(ny, TILE, nx, TILE).max(axis=(1, 3))
        tpp = np.pad(tp, 1)
        tp = np.max(np.stack([tpp[i:i + ny, j:j + nx]
                              for i in range(3) for j in range(3)]), axis=0)
        scores = scores + (ext_frac + 4.0 * ovf_frac) * tp.reshape(-1)

        # raw per-pose dump for OFFLINE scoring iteration (numpy only, no
        # TPU round-trips): tools/score_lab.py reads these
        np.savez_compressed(
            f"/tmp/r3_logs/decay_raw_{name}_{ii}.npz",
            per_tile_err=per_tile_err, errd=errd.astype(np.float32),
            bad=bad.astype(np.uint8), rgb=rgb.astype(np.float32),
            fast_srgb=fast_s.astype(np.float32),
            err_px=err_px.astype(np.float32),
        )

        order_oracle = np.argsort(per_tile_err)[::-1]
        order_actual = np.argsort(scores)[::-1]
        rec = {"total_fast_err": round(float(total), 9), "degen": bool(degen),
               "curve": []}
        for b in budgets:
            sel_o = order_oracle[:b]
            sel_a = order_actual[:b]
            sel_a = sel_a[scores[sel_a] > DEFAULT_THRESH]  # thresh parking
            e_o = total - per_tile_err[sel_o].sum() / n_tiles
            e_a = total - per_tile_err[sel_a].sum() / n_tiles
            rec["curve"].append({"budget": b,
                                 "oracle": round(float(e_o), 9),
                                 "actual": round(float(e_a), 9)})
        out[name] = rec
        print(name, json.dumps(rec), flush=True)

    path = f"/tmp/r3_logs/residual_decay_{ii}.json"
    os.makedirs("/tmp/r3_logs", exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
