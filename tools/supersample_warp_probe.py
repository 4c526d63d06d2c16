#!/usr/bin/env python
"""Measure the round-4 VERDICT's proposed repair family: does SUPERSAMPLING
the final warp (2x2 subpixel taps averaged per screen pixel) reduce the
flagged tiles' error vs the exact march?

Theory check before building a kernel variant. The fast frame's dominant
error is the bilinear warp's reconstruction of the ALIASED composited
intermediate at silhouettes (CLAUDE.md round-2: ~1/I scaling). Two
hypotheses compete:

- phase-noise dominated: the bilinear taps carry quasi-random subtexel
  phase error; averaging 4 taps cancels ~2x of it (supersampling WINS —
  the same reason Catmull-Rom lost: sharper reconstruction AMPLIFIES
  aliasing noise, smoothing reduces it);
- edge-bias dominated: the exact target is a POINT sample of an edge; a
  box filter moves the estimate away from it by O(edge height x filter
  width) (supersampling LOSES or is neutral).

Proxy on CPU (no kernels): render the fast frame at 2W x 2H through the
XLA path (same intermediate I), box-downsample 2x2 — exactly a 4-tap
jittered supersample of the warp per target pixel (the sub-rays are the
2x-res pixel centers = target centers +- 1/4 px) — and compare per-tile
mean |err| vs the exact oracle against the plain fast frame, on ALL tiles
and on the top-K error tiles (the ones a budget<=32 hybrid leaves
unrepaired).

Usage: python tools/supersample_warp_probe.py [W] [I] [K]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vokselis_tpu.core.camera import Camera  # noqa: E402
from vokselis_tpu.ops import reference  # noqa: E402
from vokselis_tpu.ops.shear_warp import _render_fast, prepare_fast_volume  # noqa: E402
from vokselis_tpu.volume import get_bonsai  # noqa: E402


def tile_errs(img, exact, tile=32):
    d = np.abs(img[..., :3] - exact[..., :3]).mean(axis=-1)
    h, w = d.shape
    return d.reshape(h // tile, tile, w // tile, tile).mean(axis=(1, 3))


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    II = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    vol = get_bonsai()
    packs = prepare_fast_volume(vol)
    volj = jnp.asarray(vol)

    poses = {
        "bench": Camera.bonsai(1.0),
        "z1.0-axis": Camera(zoom=1.0, pitch=0.0, yaw=0.0,
                            target=(0.5, 0.5, 0.5), aspect=1.0),
        "z1.0-tilt": Camera(zoom=1.0, pitch=-0.35, yaw=0.0,
                            target=(0.5, 0.5, 0.5), aspect=1.0),
    }
    out = {}
    for name, cam in poses.items():
        u = cam.uniform()
        exact = np.asarray(
            reference.render_bonsai(volj, u, width=W, height=W))
        fast1 = np.asarray(_render_fast(packs, u, W, W, II, True))
        fast2 = np.asarray(_render_fast(packs, u, 2 * W, 2 * W, II, True))
        # box 2x2 downsample in LINEAR? the frames are sRGB; the kernel
        # variant would average linear taps then convert — approximate
        # both ways to bound the choice
        ss_srgb = fast2.reshape(W, 2, W, 2, 4).mean(axis=(1, 3))
        lin = np.clip(fast2[..., :3], 0.0, None) ** 2.4  # crude linearize
        ss_lin = (lin.reshape(W, 2, W, 2, 3).mean(axis=(1, 3))
                  ** (1 / 2.4))
        ss_lin = np.concatenate(
            [ss_lin, np.ones((W, W, 1), np.float32)], axis=-1)

        t1 = tile_errs(fast1, exact)
        t_srgb = tile_errs(ss_srgb, exact)
        t_lin = tile_errs(ss_lin, exact)
        # the tiles a budget<=K hybrid leaves unrepaired: ranked by the
        # PLAIN frame's true error, drop the top K (re-marched exactly),
        # look at the next K (the ones that pin the budget)
        order = np.argsort(t1.reshape(-1))[::-1]
        nextk = order[K:3 * K]
        rec = {
            "mean_fast1": float(t1.mean()),
            "mean_ss_srgb": float(t_srgb.mean()),
            "mean_ss_lin": float(t_lin.mean()),
            "nextK_fast1": float(t1.reshape(-1)[nextk].mean()),
            "nextK_ss_srgb": float(t_srgb.reshape(-1)[nextk].mean()),
            "nextK_ss_lin": float(t_lin.reshape(-1)[nextk].mean()),
        }
        rec["ratio_nextK"] = (rec["nextK_ss_srgb"]
                              / max(rec["nextK_fast1"], 1e-12))
        out[name] = rec
        print(name, json.dumps(rec), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
