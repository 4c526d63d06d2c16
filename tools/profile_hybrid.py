#!/usr/bin/env python
"""Decompose the hybrid frame's cost at 1024^2 (round-3 ladder showed
~3.2 ms at budget=0 vs 1.55 ms for the plain fast frame, plus ~1.1 ms
fixed once budget>0 and ~64-78 us/tile marginal):

  1. plain fast frame (return_aux=False)          -> the 1.55 ms floor
  2. fast frame with packed aux (budget=0 hybrid) -> + aux channels tax
  3. hybrid with ALL ids parked (scores computed,
     re-march kernel runs n_sel miss-floor steps) -> + scoring/launch tax
  4. hybrid at budget B (default 64)              -> + true re-march

Variant 3 needs a one-line env knob (VOK_HYBRID_PARK=1) in ops/hybrid to
force thresh=+inf so top_k still runs but every pick parks.

DON'T run concurrently with other tunnel timing jobs.

Usage: python tools/profile_hybrid.py [budget] [ii]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

W = H = 1024


def main():
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ii = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from bench import slope_time
    from vokselis_tpu.core.camera import Camera, CameraUniform
    from vokselis_tpu.ops.hybrid import HybridBonsaiRenderer
    from vokselis_tpu.ops.shear_warp import build_fast_renderer, pose_hint
    from vokselis_tpu.volume.io import get_bonsai

    u0 = Camera.bonsai(1.0).uniform()
    vol = get_bonsai()

    out = {}

    # 1. plain fast frame
    render, pack = build_fast_renderer(vol, intermediate=ii)

    def build_fast(n):
        def frames(pk, vp, pv, ip):
            def body(i, acc):
                u = CameraUniform(vp + acc * 1e-20, pv, ip)
                img = render(pk, u, W, H)
                return acc + img[0, 0, 0] + img[H // 2, W // 2, 0]
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        jf = jax.jit(frames)
        return lambda: jf(pack, u0.view_position, u0.proj_view, u0.inv_proj)

    sec = slope_time(build_fast)
    out["fast_plain_ms"] = round(sec * 1000, 3)
    print(f"1. plain fast frame: {sec*1000:.3f} ms", flush=True)

    hyb = HybridBonsaiRenderer(vol, intermediate=ii, budget=budget)
    hint = pose_hint(u0, W, H, ii, hyb.dims)
    frender, fpack = hyb.functional()

    from vokselis_tpu.ops.pallas.march_bonsai import build_renderer

    erender, epack = build_renderer(vol, with_overflow=True)
    exact, _eovf = erender(epack, u0, W, H)

    @jax.jit
    def mean_err(h, e):
        return jnp.abs(h[..., :3] - e[..., :3]).mean()

    def build_hyb(b, thresh=None):
        def mk(n):
            def frames(pk, vp, pv, ip):
                def body(i, acc):
                    u = CameraUniform(vp + acc * 1e-20, pv, ip)
                    im, _, _ = frender(pk, u, W, H, hint=hint, budget=b)
                    return acc + im[0, 0, 0] + im[H // 2, W // 2, 0]
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            jf = jax.jit(frames)
            return lambda: jf(fpack, u0.view_position, u0.proj_view,
                              u0.inv_proj)
        return mk

    # 2. budget=0 (packed aux + unpack, no scoring/re-march)
    sec = slope_time(build_hyb(0))
    out["hybrid_b0_ms"] = round(sec * 1000, 3)
    print(f"2. hybrid budget=0: {sec*1000:.3f} ms", flush=True)

    # 2b. window-size tax: budget=0 with explicit warp windows (only
    # meaningful with VOK_WARP_ADAPTIVE=0 — the adaptive MXU path ignores
    # the hint, so every variant would recompile the same computation)
    variants = (((0, 128), (64, 128), (64, 256))
                if os.environ.get("VOK_PROFILE_WINVARIANTS", "0") == "1"
                else ())
    for wwin, wwu in variants:
        if (wwin, wwu) == (hint[0], hint[1]):
            continue
        small_hint = (wwin, wwu, False)

        def build_small(n):
            def frames(pk, vp, pv, ip):
                def body(i, acc):
                    u = CameraUniform(vp + acc * 1e-20, pv, ip)
                    im, _, _ = frender(pk, u, W, H, hint=small_hint, budget=0)
                    return acc + im[0, 0, 0] + im[H // 2, W // 2, 0]
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            jf = jax.jit(frames)
            return lambda: jf(fpack, u0.view_position, u0.proj_view,
                              u0.inv_proj)

        sec = slope_time(build_small)
        out[f"hybrid_b0_w{wwin}x{wwu}_ms"] = round(sec * 1000, 3)
        # error at the operating budget with this window: do overflow
        # tiles get ranked and re-marched back under the error target?
        h, _, _ = frender(fpack, u0, W, H, hint=small_hint, budget=budget)
        e = float(mean_err(h, exact))
        out[f"hybrid_b{budget}_w{wwin}x{wwu}_err"] = round(e, 9)
        print(f"2b. hybrid win=({wwin},{wwu}): b0 {sec*1000:.3f} ms, "
              f"err@b{budget} {e:.3e}", flush=True)

    # 3. scoring runs, every pick parked (miss-floor re-march)
    old = hyb.thresh
    hyb.thresh = 1e30
    frender_p, _ = hyb.functional()

    def build_park(n):
        def frames(pk, vp, pv, ip):
            def body(i, acc):
                u = CameraUniform(vp + acc * 1e-20, pv, ip)
                im, _, _ = frender_p(pk, u, W, H, hint=hint, budget=budget)
                return acc + im[0, 0, 0] + im[H // 2, W // 2, 0]
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        jf = jax.jit(frames)
        return lambda: jf(fpack, u0.view_position, u0.proj_view, u0.inv_proj)

    sec = slope_time(build_park)
    hyb.thresh = old
    out["hybrid_parked_ms"] = round(sec * 1000, 3)
    print(f"3. hybrid parked (budget={budget}): {sec*1000:.3f} ms",
          flush=True)

    # 4. full hybrid at the budget
    sec = slope_time(build_hyb(budget))
    out["hybrid_full_ms"] = round(sec * 1000, 3)
    print(f"4. hybrid budget={budget}: {sec*1000:.3f} ms", flush=True)

    out["aux_tax_ms"] = round(out["hybrid_b0_ms"] - out["fast_plain_ms"], 3)
    out["scoring_launch_ms"] = round(
        out["hybrid_parked_ms"] - out["hybrid_b0_ms"], 3)
    out["remarch_ms"] = round(
        out["hybrid_full_ms"] - out["hybrid_parked_ms"], 3)
    out["budget"] = budget
    out["ii"] = ii
    print(json.dumps(out), flush=True)
    with open(f"/tmp/r3_logs/profile_hybrid_{budget}_{ii}.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    os.makedirs("/tmp/r3_logs", exist_ok=True)
    main()
