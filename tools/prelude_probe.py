#!/usr/bin/env python
"""Decompose the hybrid's UNATTRIBUTED intercept mass (~1.1 ms of the
round-4 b0 probe after compos/resample/warp/stats/finish are accounted):
packed raygen + extents, the ray_bbox robust-quantile SORTS (two 16k
jnp.sort calls — TPU sorts are multi-pass bitonic), the occupancy-table
cumsum/argsort chain, and the scoring/top_k/select tail.

Each stage is slope-timed standalone (bench.py method). Large arrays are
jit ARGUMENTS. Run serially — never alongside other tunnel timing jobs.

Usage: python tools/prelude_probe.py [W H I]
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


def slope_time(builder, n_hi=16, repeats=5):
    f1, fN = builder(1), builder(n_hi)
    np.asarray(f1()); np.asarray(fN()); np.asarray(f1()); np.asarray(fN())
    slopes = []
    for _ in range(repeats):
        t = time.time(); np.asarray(f1()); t1 = time.time() - t
        t = time.time(); np.asarray(fN()); tn = time.time() - t
        slopes.append(max((tn - t1) / (n_hi - 1), 1e-9))
    return float(np.median(slopes))


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    II = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    from vokselis_tpu.core import geometry
    from vokselis_tpu.core.camera import Camera, CameraUniform

    u0 = Camera.bonsai(1.0).uniform()
    results = {}

    def loop(body, *args):
        def builder(n):
            def frames(*a):
                def it(i, acc):
                    return acc + body(acc * 1e-20, *a)
                return lax.fori_loop(0, n, it, jnp.float32(0.0))
            jf = jax.jit(frames)
            return lambda: jf(*args)
        return builder

    def record(name, body, *args):
        results[name] = slope_time(loop(body, *args))
        print(f"{name:16s} {results[name]*1000:7.3f} ms", flush=True)

    # packed raygen + box intersect (the geometry _render_fast computes
    # before extents)
    def raygen_body(eps, vp, pv, ip):
        u = CameraUniform(vp + eps, pv, ip)
        ixp, iyp = geometry.packed_pixel_grid(W, H)
        ndc_x = 2.0 * (ixp.astype(jnp.float32) + 0.5) / W - 1.0
        ndc_y = 1.0 - 2.0 * (iyp.astype(jnp.float32) + 0.5) / H
        inv = u.inv_proj
        nx4, ny4, nz4, nw4 = geometry.mat4_apply(inv, ndc_x, ndc_y,
                                                 jnp.float32(0.0))
        fx4, fy4, fz4, fw4 = geometry.mat4_apply(inv, ndc_x, ndc_y,
                                                 jnp.float32(1.0))
        dxs = fx4 / fw4 - nx4 / nw4
        dys = fy4 / fw4 - ny4 / nw4
        dzs = fz4 / fw4 - nz4 / nw4
        il = 1.0 / jnp.sqrt(dxs * dxs + dys * dys + dzs * dzs)
        eye = u.view_position[:3]
        t0, t1 = geometry.intersect_box_soa(
            jnp.broadcast_to(eye[0], dxs.shape),
            jnp.broadcast_to(eye[1], dxs.shape),
            jnp.broadcast_to(eye[2], dxs.shape),
            dxs * il, dys * il, dzs * il, 0.0, 1.0)
        return t0[0, 0] + t1[-1, -1] + dxs[7, 7] * il[7, 7]

    record("raygen+box", raygen_body, u0.view_position, u0.proj_view,
           u0.inv_proj)

    # the ray_bbox quantile sort pair on the packed subsample
    n_tiles = (H // 32) * (W // 32)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.normal(size=(n_tiles * 8, 128)) * 100,
                     jnp.float32)
    hit = jnp.asarray(rng.random((n_tiles * 8, 128)) > 0.4)

    def bbox_body(eps, xr, hit):
        def one(xr):
            xs = xr[::2, :32:8] + eps
            oks = (hit[::2, :32:8] & jnp.isfinite(xs)).reshape(-1)
            sub = xs.reshape(-1)
            n_ok = jnp.sum(oks.astype(jnp.int32))
            srt = jnp.sort(jnp.where(oks, sub, jnp.inf))
            nf = jnp.maximum(n_ok.astype(jnp.float32), 1.0)
            i_lo = jnp.clip((0.002 * nf).astype(jnp.int32), 0,
                            srt.shape[0] - 1)
            i_hi = jnp.clip(n_ok - 1 - (0.002 * nf).astype(jnp.int32), 0,
                            srt.shape[0] - 1)
            return srt[i_lo] + srt[i_hi]
        return one(xr) + one(xr * 0.9 + 3.0)  # both axes, like _render_fast

    record("ray_bbox sorts", bbox_body, xr, hit)

    # occupancy-table chain as _render_fast ACTUALLY runs it since the
    # round-5 vectorization: _window_any mask-reduce (no take_along_axis
    # — the scalar-rate prefix-sum gathers were the round-4 tax), the
    # per-(row-block, chunk) occ_b reshape, and composite_chunks'
    # (nrb, C) compaction argsort + band meta
    from vokselis_tpu.ops.shear_warp import _window_any
    from vokselis_tpu.ops.pallas.shear_resample import _band_meta

    d = 256
    gp = d  # padded slab count
    ng = d // 8
    tab = jnp.asarray(rng.random((d - 1, ng)) > 0.6)
    pos_fake = jnp.asarray(
        rng.random((gp, II)).cumsum(axis=1) * (260.0 / II), jnp.float32)

    def occ_body(eps, tab, pos_v):
        tabp = jnp.pad(tab, ((0, gp - tab.shape[0]), (0, 0)))
        n_ub = II // 128
        nrb = II // 8
        lo = jnp.broadcast_to(jnp.arange(n_ub, dtype=jnp.float32) * 40 + eps,
                              (gp, n_ub))
        occ2_u = _window_any(tabp, lo, lo + 90.0)
        lo_v = jnp.broadcast_to(
            jnp.arange(nrb, dtype=jnp.float32) * 2 + eps, (gp, nrb))
        occ2_v = _window_any(tabp, lo_v, lo_v + 11.0)
        any_u = occ2_u.any(axis=1)
        occ_k = (any_u & occ2_v.any(axis=1)).astype(jnp.int32)
        occ_rb = occ2_v & any_u[:, None]
        occ_b = occ_rb.reshape(gp // 8, 8, nrb).any(axis=1).T  # (nrb, C)
        c = gp // 8
        cids = jnp.arange(c, dtype=jnp.int32)
        key = jnp.where(occ_b, cids[None, :], jnp.int32(2 * c))
        ids = jnp.argsort(key, axis=1).astype(jnp.int32)
        band0, bflag = _band_meta(pos_v + eps, d, II // 128)
        return (ids.sum() + occ_k.sum() + band0.sum()
                + bflag.sum()).astype(jnp.float32)

    record("occ chain", occ_body, tab, pos_fake)

    # scoring + selection tail (stats plane -> ids), as in _render_hybrid
    from vokselis_tpu.ops.hybrid import _dilate3, select_units

    statsp = jnp.asarray(rng.random((n_tiles * 8, 128)), jnp.float32)

    def score_body(eps, statsp):
        ny, nx = H // 32, W // 32
        st = (statsp + eps).reshape(n_tiles, 8, 128)[:, :, 0]
        inv_px = 1.0 / (8 * 128)
        scores = (st[:, 0] + 0.03 * st[:, 1]) * inv_px
        tile_peak = _dilate3(st[:, 4].reshape(ny, nx))
        degr = (st[:, 2] + 4.0 * st[:, 3]) * inv_px
        scores = scores + (degr.reshape(ny, nx) * tile_peak).reshape(-1)
        ids = select_units(scores, n_tiles, 64, 1e-3, True)
        return ids.sum().astype(jnp.float32)

    record("score+select", score_body, statsp)

    print(json.dumps({k: round(v * 1000, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
