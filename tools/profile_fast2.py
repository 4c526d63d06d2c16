#!/usr/bin/env python
"""Stage-level profile of the FUSED fast path (round 3: shear_resample).

Times each stage with the slope method (bench.py): this transport has a
~29 ms dispatch floor, so per-iteration cost is the slope between 1- and
N-iteration on-device loops. Large arrays travel as jit ARGUMENTS.

Stages:
  prelude   - XLA geometry: rays, extents, pos_u/pos_v, irho
  resample  - resample_slabs (fused weights + both MXU matmuls)
  occ       - composite_chunks' XLA occupancy reduce + argsort compaction
  compos    - composite_chunks (occupancy + Pallas chunk composite)
  re+co     - resample_composite (both halves)
  warp      - warp_bilinear_pallas at the frame size
  full      - whole _render_fast

Usage: python tools/profile_fast2.py [I] [W H]
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
    ii = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

    from vokselis_tpu.core.camera import Camera, CameraUniform
    from vokselis_tpu.core import geometry
    from vokselis_tpu.ops.shear_warp import prepare_fast_volume, _render_fast
    from vokselis_tpu.ops.pallas.shear_resample import (
        resample_slabs, composite_chunks, resample_composite, OCC_EPS,
    )
    from vokselis_tpu.ops.pallas.warp2d import warp_bilinear_pallas
    from vokselis_tpu.volume.io import get_bonsai

    u0 = Camera.bonsai(1.0).uniform()
    packs = prepare_fast_volume(get_bonsai())
    d = packs[0].shape[1]
    dm1 = packs[0].shape[0]
    fd = float(d)

    eye, dirs = geometry.rays_fragment(u0, width, height)
    eye = np.asarray(eye); dirs_c = np.asarray(dirs[height // 2, width // 2])
    m = int(np.argmax(np.abs(dirs_c)))
    print(f"I={ii} frame={width}x{height} dominant axis m={m}",
          file=sys.stderr, flush=True)
    volm = packs[m]

    e_t = eye * fd - 0.5
    em = float(e_t[m])
    denom = (fd - 1.0) / 2.0 - em
    gp = (dm1 + 7) // 8 * 8
    grid_u = jnp.linspace(-20.0, fd + 20.0, ii)
    ks = jnp.arange(gp, dtype=jnp.float32) + 0.5
    s_k = (ks - em) / denom
    pos_u0 = em + s_k[:, None] * (grid_u[None, :] - em)
    pos_v0 = pos_u0 + 0.25
    valid = (jnp.arange(gp) < dm1)[:, None]
    pos_u0 = jnp.where(valid, pos_u0, -1e6)
    pos_v0 = jnp.where(valid, pos_v0, -1e6)
    irho0 = jnp.ones((ii, ii), jnp.float32)

    res0 = jax.jit(resample_slabs)(volm, pos_u0, pos_v0)

    stages = {}

    def loop(body, *args):
        def builder(n):
            def frames(*a):
                def it(i, acc):
                    return acc + body(acc * 1e-20, *a)
                return lax.fori_loop(0, n, it, jnp.float32(0.0))
            jf = jax.jit(frames)
            return lambda: jf(*args)
        return builder

    only = os.environ.get("VOK_PROF_STAGES", "")
    wwin = int(os.environ.get("VOK_PROF_WIN", "0"))
    wwu = int(os.environ.get("VOK_PROF_WU", "128"))

    def record(name, fn):
        if only and name not in only.split(","):
            return
        t = time.time()
        stages[name] = fn()
        print(f"{name:10s} {stages[name]*1000:7.2f} ms   "
              f"[{time.time()-t:.0f}s wall]", file=sys.stderr, flush=True)

    def prelude_body(eps, cu):
        u = CameraUniform(cu.view_position + eps, cu.proj_view, cu.inv_proj)
        ey, dr = geometry.rays_fragment(u, width, height)
        return ey[0] + dr[0, 0, 0] + dr[-1, -1, -1]
    record("prelude", lambda: slope_time(loop(prelude_body, u0)))

    def res_body(eps, vol, pu, pv):
        r = resample_slabs(vol, pu + eps, pv)
        return r[0, 0, 0, 0, 0].astype(jnp.float32)
    record("resample", lambda: slope_time(loop(res_body, volm, pos_u0, pos_v0)))

    def occ_body(eps, res):
        # round-5 layout: (C, nrb, 8, 8, I); occ_b is per ROW-BLOCK
        occ = jnp.max(res.astype(jnp.float32) + eps, axis=(2, 3, 4)) > OCC_EPS
        c = res.shape[0]
        occ_b = occ.T  # (nrb, C)
        cids = jnp.arange(c, dtype=jnp.int32)
        key = jnp.where(occ_b, cids[None, :], jnp.int32(2 * c))
        ids = jnp.argsort(key, axis=1).astype(jnp.int32)
        return ids.sum().astype(jnp.float32)
    record("occ", lambda: slope_time(loop(occ_body, res0)))

    def comp_body(eps, res, irho):
        r, g, b, a = composite_chunks(res, 1, irho + eps)
        return r[0, 0] + a[-1, -1]
    record("compos", lambda: slope_time(loop(comp_body, res0, irho0)))

    def reco_body(eps, vol, pu, pv, irho):
        r, g, b, a = resample_composite(vol, pu + eps, pv, 1, irho)
        return r[0, 0] + a[-1, -1]
    record("re+co", lambda: slope_time(
        loop(reco_body, volm, pos_u0, pos_v0, irho0)))

    avv, buu = jnp.meshgrid(jnp.linspace(0, ii - 1.0, height),
                            jnp.linspace(0, ii - 1.0, width), indexing="ij")
    chans0 = jnp.stack([jnp.zeros((ii, ii), jnp.float32)] * 3)

    def warp_body(eps, ch, av, bu):
        p = warp_bilinear_pallas(ch + eps, av, bu, None,
                                 win_rows=wwin or None, win_u=wwu)
        return p[0, 0, 0] + p[-1, -1, -1]
    record("warp", lambda: slope_time(loop(warp_body, chans0, avv, buu)))

    # the hybrid's ACTUAL warp: 4-channel stats contract, packed coords
    from vokselis_tpu.core.geometry import packed_pixel_grid
    from vokselis_tpu.ops.pallas.warp2d import (
        mxu_stats_eligible, warp_stats_packed,
    )

    if mxu_stats_eligible(ii):
        ixp, iyp = packed_pixel_grid(width, height)
        av_p = iyp.astype(jnp.float32) * (float(ii) / height)
        bu_p = ixp.astype(jnp.float32) * (float(ii) / width)
        okp = jnp.ones_like(av_p)
        chans4 = jnp.zeros((4, ii, ii), jnp.float32)

        def statswarp_body(eps, ch, av, bu, ok):
            outs = warp_stats_packed(ch + eps, av, bu, ok, ok,
                                     height, width)
            return outs[0][0, 0] + outs[3][-1, -1]
        record("statswarp", lambda: slope_time(
            loop(statswarp_body, chans4, av_p, bu_p, okp)))

    def full_builder(n):
        def frames(pk, vp, pv, ip):
            def body(i, acc):
                u = CameraUniform(vp + acc * 1e-20, pv, ip)
                img = _render_fast(pk, u, width, height, ii, True,
                                   warp_win=wwin, warp_wu=wwu)
                return acc + img[0, 0, 0] + img[height // 2, width // 2, 0]
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        jf = jax.jit(frames, static_argnames=())
        return lambda: jf(packs, u0.view_position, u0.proj_view, u0.inv_proj)
    record("full", lambda: slope_time(full_builder))

    def aux_builder(n):
        # the hybrid's fast stage: aux outputs + 4-channel warp
        def frames(pk, vp, pv, ip):
            def body(i, acc):
                u = CameraUniform(vp + acc * 1e-20, pv, ip)
                img, bad, errd = _render_fast(pk, u, width, height, ii,
                                              False, warp_win=wwin,
                                              warp_wu=wwu, return_aux=True)
                return (acc + img[0, 0, 0] + img[height // 2, width // 2, 0]
                        + errd[0, 0])
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        jf = jax.jit(frames, static_argnames=())
        return lambda: jf(packs, u0.view_position, u0.proj_view, u0.inv_proj)
    record("full_aux", lambda: slope_time(aux_builder))

    for k, v in stages.items():
        print(f"{k:10s} {v*1000:7.2f} ms")


if __name__ == "__main__":
    main()
