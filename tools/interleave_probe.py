#!/usr/bin/env python
"""Interleaved high-n slope timing of fast-frame variants.

The round-3/4 aux-tax probes measured each variant ONCE via
bench.slope_time (n_hi=5): for a ~3 ms frame that is ~12 ms of signal
against the ~29 ms dispatch floor's jitter, and between-variant drift on
this tunnel produced contradictions (packed measured FASTER than plain in
one run, slower by 1.0 ms in another). This probe fixes both knobs:

- n_hi=16 (~45 ms of per-frame signal per measurement), and
- INTERLEAVED rounds: every variant is compiled+warmed up front, then
  measured round-robin R times; per-variant median-of-rounds is reported
  with the spread, so slow drift hits all variants equally.

Usage: python tools/interleave_probe.py [ii] [rounds]
Variants: the hybrid b0 ladder (fast_plain / stats / packed).
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
N_HI = int(os.environ.get("VOK_PROBE_NHI", "16"))


def main():
    ii = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 7

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
        merged = [_unpack_tiles(p, ph, pw)[:H, :W] for p in rgbp]
        out = linear_to_srgb(jnp.stack(merged, axis=-1))
        return out + 0.0 * (errdp.sum() + ovfp.sum() + okp[0, 0]
                            + hitp.sum())

    variants = [("fast_plain", False), ("stats", "stats"),
                ("packed", "packed")]

    # build + warm every (variant, n) jit up front
    pairs = {}
    for name, aux in variants:
        def build(n, aux=aux):
            def frames(pk, vp, pv, ip):
                def body(i, acc):
                    u = CameraUniform(vp + acc * 1e-20, pv, ip)
                    img = frame(pk, u, aux)
                    return acc + img[0, 0, 0] + img[H // 2, W // 2, 0]
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            jf = jax.jit(frames)
            return lambda: jf(packs, u0.view_position, u0.proj_view,
                              u0.inv_proj)
        f1, fN = build(1), build(N_HI)
        np.asarray(f1()); np.asarray(fN())
        np.asarray(f1()); np.asarray(fN())
        pairs[name] = (f1, fN)
        print(f"warmed {name}", flush=True)

    slopes = {name: [] for name, _ in variants}
    for r in range(rounds):
        for name, _ in variants:
            f1, fN = pairs[name]
            t = time.time(); np.asarray(f1()); t1 = time.time() - t
            t = time.time(); np.asarray(fN()); tn = time.time() - t
            slopes[name].append(max((tn - t1) / (N_HI - 1), 1e-9))

    out = {"ii": ii, "n_hi": N_HI, "rounds": rounds}
    for name, _ in variants:
        s = np.asarray(slopes[name]) * 1000
        out[name + "_ms"] = round(float(np.median(s)), 3)
        out[name + "_spread"] = round(float(s.max() - s.min()), 3)
        print(f"{name}: {np.median(s):.3f} ms  "
              f"(min {s.min():.3f} max {s.max():.3f})", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
