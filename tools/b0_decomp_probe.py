#!/usr/bin/env python
"""Decompose the hybrid's budget-0 fixed cost ON THE HEADLINE PATH
(bench pose, static pose-hint windows, I=512, stats contract).

OPPOINT round-4 fit: op point = intercept 3.97 + 0.059 ms/tile; the
re-march slope is content-bound (selected tiles are the ~60 us dense
ones even in the full-frame kernel, tools/tile_cost), so the intercept
is the remaining lever. This probe splits it:

  fast_plain    - classic finished fast frame (the 1.55 ms reference)
  packed3_nofin - packed 3-channel warp, no finish (packed plumbing only)
  packed3_fin   - + finish (unpack x3 + srgb + alpha concat)
  stats_nofin   - stats-contract warp (4th curv channel + in-kernel
                  per-tile reduces), no finish
  b0            - _render_hybrid budget=0 (= stats + finish + degraded)
  b8            - _render_hybrid budget=8 (adds scoring + select + pad +
                  grid launch + 8 tiles of march)

finish tax = packed3_fin - packed3_nofin; stats tax = stats_nofin -
packed3_nofin; scoring/launch tax ~= b8 - b0 - 8*slope.

All variants are timed interleaved (round-robin medians) like
tools/interleave_probe.py so sub-ms deltas survive dispatch jitter.
DON'T run concurrently with other tunnel timing jobs.

Usage: python tools/b0_decomp_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

W = H = 1024
II = int(os.environ.get("VOK_PROBE_II", "512"))
N_HI = int(os.environ.get("VOK_PROBE_NHI", "16"))


def main():
    from vokselis_tpu.core.camera import Camera, CameraUniform
    from vokselis_tpu.ops import hybrid as hmod
    from vokselis_tpu.ops.shear_warp import _render_fast, pose_hint
    from vokselis_tpu.volume.io import get_bonsai

    vol = get_bonsai()
    hyb = hmod.HybridBonsaiRenderer(vol, intermediate=II)
    u0 = Camera.bonsai(1.0).uniform()
    wwin, wwu, _deg = pose_hint(u0, W, H, II, hyb.dims)
    if os.environ.get("VOK_PROBE_WIN0", "0") == "1":
        # measure the _render_fast variants at the ADAPTIVE default hint
        # (0, 128) — the windows the hybrid actually collapses to on the
        # headline path (ops/hybrid.py mxu_adaptive_eligible) — instead of
        # the static pose-hint buckets. b0/b8 are unaffected (they collapse
        # internally); the fast/packed/stats rows become apples-to-apples
        # with them.
        wwin, wwu = 0, 128
    print(f"hint windows: ({wwin}, {wwu})", flush=True)
    frender, fpack = hyb.functional()
    packs = hyb.packs

    def fast_frame(pk, u, aux, finish):
        if aux == "plain":  # the classic finished fast frame (1.55 ref)
            img = _render_fast(pk, u, W, H, II, True,
                               warp_win=wwin, warp_wu=wwu)
            return img[0, 0, 0] + img[H // 2, W // 2, 0]
        if aux == "stats":
            rgbp, statsp = _render_fast(pk, u, W, H, II, False,
                                        warp_win=wwin, warp_wu=wwu,
                                        return_aux="stats")
            extra = statsp.sum()
        else:  # packed 3-channel, no curvature / overflow / scoring
            rgbp, okp, errdp, ovfp, hitp = _render_fast(
                pk, u, W, H, II, False, warp_win=wwin, warp_wu=wwu,
                return_aux="packed-nocurv-noovf")
            extra = okp[0, 0] + hitp[0, 0]
        if not finish:
            return rgbp[0][0, 0] + rgbp[1][0, 0] + rgbp[2][0, 0] + extra
        from vokselis_tpu.core.colors import linear_to_srgb
        from vokselis_tpu.ops.pallas.march_bonsai import _unpack_tiles
        merged = [_unpack_tiles(p, H, W) for p in rgbp]
        out = linear_to_srgb(jnp.stack(merged, axis=-1))
        alpha = jnp.ones((H, W, 1), jnp.float32)
        out = jnp.concatenate([out, alpha], axis=-1)
        return out[0, 0, 0] + out[H // 2, W // 2, 0] + extra

    def make(fn):
        def build(n):
            def frames(pk, vp, pv, ip):
                def body(i, acc):
                    u = CameraUniform(vp + acc * 1e-20, pv, ip)
                    return acc + fn(pk, u)
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            jf = jax.jit(frames)
            return lambda: jf(fpack, u0.view_position, u0.proj_view,
                              u0.inv_proj)
        return build

    def hyb_fn(budget):
        def fn(pk, u):
            im, _, _ = frender(pk, u, W, H, hint=(wwin, wwu, False),
                            budget=budget)
            return im[0, 0, 0] + im[H // 2, W // 2, 0]
        return fn

    VARIANTS = [
        ("fast_plain", make(lambda pk, u: fast_frame(packs, u, "plain",
                                                     True))),
        ("packed3_nofin", make(lambda pk, u: fast_frame(packs, u, "p3",
                                                        False))),
        ("packed3_fin", make(lambda pk, u: fast_frame(packs, u, "p3",
                                                      True))),
        ("stats_nofin", make(lambda pk, u: fast_frame(packs, u, "stats",
                                                      False))),
        ("b0", make(hyb_fn(0))),
        ("b8", make(hyb_fn(8))),
    ]

    timers = {}
    for tag, build in VARIANTS:
        f1, fN = build(1), build(N_HI)
        np.asarray(f1()); np.asarray(fN())
        np.asarray(f1()); np.asarray(fN())
        timers[tag] = (f1, fN)
        print(f"{tag}: warmed", flush=True)

    rounds = 9
    slopes = {tag: [] for tag, _ in VARIANTS}
    for _ in range(rounds):
        for tag, _ in VARIANTS:
            f1, fN = timers[tag]
            t = time.time(); np.asarray(f1()); t1 = time.time() - t
            t = time.time(); np.asarray(fN()); tn = time.time() - t
            slopes[tag].append(max((tn - t1) / (N_HI - 1), 1e-9))

    out = {"n_hi": N_HI, "hint": [wwin, wwu]}
    for tag, _ in VARIANTS:
        s = np.asarray(slopes[tag]) * 1000
        out[tag + "_ms"] = round(float(np.median(s)), 3)
        print(f"{tag}: {np.median(s):.3f} ms (min {s.min():.3f} "
              f"max {s.max():.3f})", flush=True)
    out["finish_tax_ms"] = round(
        out["packed3_fin_ms"] - out["packed3_nofin_ms"], 3)
    out["stats_tax_ms"] = round(
        out["stats_nofin_ms"] - out["packed3_nofin_ms"], 3)
    out["b0_vs_statsfin_ms"] = round(
        out["b0_ms"] - out["stats_nofin_ms"] - out["finish_tax_ms"], 3)
    out["b8_minus_b0_ms"] = round(out["b8_ms"] - out["b0_ms"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
