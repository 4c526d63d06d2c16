#!/usr/bin/env python
"""Decompose the hybrid's AUX TAX: what each packed-aux ingredient adds
to the plain fast frame (round-3 ladder: hybrid budget=0 = 3.30 ms vs
1.55 ms plain fast at 1024^2/I=512 — a ~1.75 ms gap that caps the hybrid
at ~124 Mrays/s even before the re-march).

Variants (return_aux values of ops.shear_warp._render_fast):
  False                -> plain fast frame (the 1.55 ms reference)
  packed-nocurv-noovf  -> + packed-layout plumbing only (3ch, no flags)
  packed-nocurv        -> + overflow plane (3ch warp + flag machinery)
  packed-noovf         -> + curvature channel (4ch warp, no flags)
  packed               -> everything (= hybrid budget=0 minus nothing)

Each packed variant is finished with the hybrid's unpack+srgb so the
timings are apples-to-apples with the ladder's b0. Run once with
VOK_WARP_ADAPTIVE=1 (default) and once =0 to split the two-pass rewarp's
share. DON'T run concurrently with other tunnel timing jobs.

Usage: python tools/aux_tax_probe.py [ii]
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
    args = [a for a in sys.argv[1:] if a != "-q"]
    ii = int(args[0]) if args else 512

    from bench import slope_time
    from vokselis_tpu.core.camera import Camera, CameraUniform
    from vokselis_tpu.core.colors import linear_to_srgb
    from vokselis_tpu.ops.pallas.march_bonsai import _unpack_tiles
    from vokselis_tpu.ops.shear_warp import _render_fast, prepare_fast_volume
    from vokselis_tpu.utils.grid import cdiv
    from vokselis_tpu.volume.io import get_bonsai

    u0 = Camera.bonsai(1.0).uniform()
    packs = prepare_fast_volume(get_bonsai())
    ph = cdiv(H, 32) * 32
    pw = cdiv(W, 32) * 32

    def frame(pk, u, aux):
        if aux is False:
            return _render_fast(pk, u, W, H, ii, True, warp_win=0,
                                warp_wu=128)
        if aux == "stats":
            rgbp, statsp = _render_fast(
                pk, u, W, H, ii, False, warp_win=0, warp_wu=128,
                return_aux="stats")
            merged = [_unpack_tiles(p, ph, pw)[:H, :W] for p in rgbp]
            out = linear_to_srgb(jnp.stack(merged, axis=-1))
            return out + 0.0 * statsp.sum()
        rgbp, okp, errdp, ovfp, hitp = _render_fast(
            pk, u, W, H, ii, False, warp_win=0, warp_wu=128,
            return_aux=aux)
        # the hybrid's finish(): single unpack of the 3 planes + srgb.
        # Touch every aux output so nothing dead-code-eliminates.
        merged = [_unpack_tiles(p, ph, pw)[:H, :W] for p in rgbp]
        out = linear_to_srgb(jnp.stack(merged, axis=-1))
        out = out + 0.0 * (errdp.sum() + ovfp.sum() + okp[0, 0]
                           + hitp.sum())
        return out

    out = {"ii": ii,
           "adaptive": os.environ.get("VOK_WARP_ADAPTIVE", "1")}
    variants = (False, "stats", "packed") if "-q" in sys.argv else (
        False, "stats", "packed-nocurv-noovf", "packed-nocurv",
        "packed-noovf", "packed")
    for aux in variants:
        def build(n):
            def frames(pk, vp, pv, ip):
                def body(i, acc):
                    u = CameraUniform(vp + acc * 1e-20, pv, ip)
                    img = frame(pk, u, aux)
                    return acc + img[0, 0, 0] + img[H // 2, W // 2, 0]
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            jf = jax.jit(frames)
            return lambda: jf(packs, u0.view_position, u0.proj_view,
                              u0.inv_proj)

        sec = slope_time(build)
        key = "fast_plain" if aux is False else aux
        out[key + "_ms"] = round(sec * 1000, 3)
        print(f"{key}: {sec*1000:.3f} ms", flush=True)

    print(json.dumps(out), flush=True)
    os.makedirs("/tmp/r3_logs", exist_ok=True)
    tag = out["adaptive"]
    with open(f"/tmp/r3_logs/aux_tax_{ii}_ad{tag}.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
