"""Fused resample + chunk-compacted composite for the fast shear-warp mode.

Round-2's pipeline materialized the (G, I, I) resampled slab stack through
XLA (weights in HBM, two dot_generals, an occupancy pass, a relayout
transpose) and then composited it with a per-slab ``lax.cond`` fori — the
round-3 profile (tools/profile_fast.py) put that composite at ~4.6-5 ms of
the 5.5 ms frame at I=512.

Round 5 restructured BOTH kernels around the measured bottleneck: the
round-3/4 shape ran a (gp, n_ub) resample grid and an (nrb * n_ub)
composite grid, and the stage split (tools/profile_fast2.py, round 5)
showed the cost was ~1.1 us of FIXED overhead per grid step, not compute —
resample at I=1024 measured 2.17 ms for ~0.17 ms of MXU work (2048 steps,
with the (D, D) volume slab re-DMA'd once per u-block), composite 1.60 ms
(1024 while-loop steps). So:

- ``resample_slabs``: ONE grid step per SLAB (gp steps) builds both
  full-width hat-weight stacks in VMEM and runs both MXU matmuls at the
  intermediate's full lane width, writing the slab straight into the
  composite's chunked block layout — (chunk, row-block, slab, 8, I) bf16,
  a NATURAL row split of the (I, I) slab (the old (..., n_ub, 8, 128)
  layout needed an in-kernel relayout). The volume slab is DMA'd once per
  slab instead of once per (slab, u-block).
- ``composite_chunks``: one grid step per ROW-BLOCK (nrb steps, n_ub x
  fewer), compositing (8, I)-wide state; per occupied chunk ONE DMA of
  (8 slabs, 8, I) — n_ub x fewer, n_ub x bigger. Empty space still costs
  nothing (occupied-chunk ids are scalar-prefetched in marching order),
  saturated blocks skip chunk compute via one reduce, and every DMA start
  has an unconditional matching wait (starts are strictly index-gated
  below the loop bound).

Matches shaders/raycast_naive.wgsl:101-117 through the shared
bonsai_transfer_soa + the two exact composite corrections documented in
ops.shear_warp (off-dominant-axis rate irho, per-pixel 0.95 stop).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vokselis_tpu.core.colors import (
    bonsai_transfer_pow_fast_soa,
    bonsai_transfer_pow_lowdeg_soa,
    bonsai_transfer_soa,
    smoothstep,
)

# precision experiment knob shared with ops.shear_warp (see there)
_SLAB_DTYPE = (
    jnp.float32 if os.environ.get("VOK_FAST_F32", "0") == "1" else jnp.bfloat16
)

# TIMING-ONLY ablation knob for the composite's per-slab math (values are
# comma-separable): "nopow" drops the irho rate correction, "nopal" replaces
# the vertigo palette with the raw transfer value. Both BREAK correctness —
# they exist so the VOK_COMP_ABLATE probe can attribute the composite's
# cost between transcendentals (3 cos + log + exp per slab-sample) and
# loop/DMA machinery. Never set in production.
_COMP_ABLATE = os.environ.get("VOK_COMP_ABLATE", "")

# A/B knob: VOK_EXACT_TRANSFER=1 restores the transcendental transfer/
# palette/pow in the composite (the polynomial mirror is the default —
# <= 1.4e-6/sample vs exact, tools/fit_transfer_poly.py)
_EXACT_TRANSFER = os.environ.get("VOK_EXACT_TRANSFER", "0") == "1"

# A/B knob: VOK_COMP_LOWDEG=0 restores the 1e-6-grade polynomial set
# (bonsai_transfer_pow_fast_soa). Default is the round-5 low-degree
# palette + hardware-exp/log alpha (<= 1.7e-5/sample, measured ~2x
# cheaper at I=1024 — see core/colors.bonsai_transfer_pow_lowdeg_soa).
_LOWDEG = os.environ.get("VOK_COMP_LOWDEG", "1") == "1"

OCC_EPS = 0.1  # slabs whose block max <= 0.1 are no-ops: smoothstep(0.10,..)

# dv band width for the BANDED second matmul (round 5): the hat weights
# wv have support width < 2 texels per intermediate row, so res's
# contraction over all D volume rows burns ~4/5 of its MACs on zeros at
# I=1024/D=256 (268M of the 335M MACs/slab live in matmul 2). Each
# 128-row block of the intermediate touches only a ~D*128/I + 3 wide dv
# window (positions are affine per slab), so the block's dot contracts
# just [dv0, dv0+_WB) — dv0 per (slab, block) is precomputed in XLA and
# scalar-prefetched; slabs whose window overflows _WB (degenerate
# geometry, |s_k| large) fall back to the full contraction PER SLAB.
# VOK_BAND_RESAMPLE=0 restores the full contraction everywhere.
_WB = 64
_BAND = os.environ.get("VOK_BAND_RESAMPLE", "1") == "1"


def _band_meta(pos_v, d, nb):
    """Per-(slab, 128-row-block) aligned dv window starts + per-slab
    bandable flags, computed XLA-side from the affine position endpoints.
    Returns (gp*nb,) int32 dv0/16 and (gp,) int32 flags. The start is
    stored PRE-DIVIDED by 16 and multiplied back in-kernel: Mosaic must
    statically prove the dynamic sublane start's alignment (a prefetched
    scalar can't be proven; 16*q can), and 16 covers bf16 sublane tiling."""
    gp, ii = pos_v.shape
    rows = pos_v.reshape(gp, nb, ii // nb)
    lo = jnp.minimum(rows[:, :, 0], rows[:, :, -1])
    hi = jnp.maximum(rows[:, :, 0], rows[:, :, -1])
    # hat support of row i is dv in (pv_i - 1, pv_i + 1): pad a texel on
    # each side, align the start down to 16, clip into [0, d - _WB]
    lo_i = jnp.floor(jnp.clip(lo, -1e9, 1e9)).astype(jnp.int32) - 1
    lo_q = jnp.clip(lo_i // 16, 0, max((d - _WB) // 16, 0))
    hi_need = jnp.minimum(
        jnp.ceil(jnp.clip(hi, -1e9, 1e9)).astype(jnp.int32) + 2, d)
    ok_rb = (hi_need - lo_q * 16) <= _WB
    bflag = ok_rb.all(axis=1).astype(jnp.int32)
    return lo_q.reshape(-1).astype(jnp.int32), bflag


def _resample_kernel(occ_ref, bflag_ref, band0_ref, pos_u_ref, pos_v_ref,
                     vol_ref, out_ref, wv_s, tmp_s, *, d, ii, nrb, nb):
    """One grid step per slab: hat weights + matmul 1 into VMEM scratch,
    then either nb banded block dots (dv window [dv0, dv0+_WB)) or the
    full-contraction dot, per the prefetched bandable flag."""
    k = pl.program_id(0)
    hot = occ_ref[k] > 0

    @pl.when(hot)
    def _():
        # wv stored TRANSPOSED (D rows, I lanes): iota rides sublanes, the
        # position row broadcasts over lanes — no (1, I) -> (I, 1) relayout
        dv = lax.broadcasted_iota(jnp.int32, (d, ii), 0).astype(jnp.float32)
        pv = pos_v_ref[pl.ds(k, 1), :]  # (1, I)
        wv_s[:] = jnp.maximum(0.0, 1.0 - jnp.abs(pv - dv)).astype(_SLAB_DTYPE)
        pu = pos_u_ref[pl.ds(k, 1), :]  # (1, I)
        wu = jnp.maximum(0.0, 1.0 - jnp.abs(pu - dv)).astype(_SLAB_DTYPE)

        # tmp[dv, u] = sum_du vol[dv, du] wu[du, u] — (D, D) @ (D, I) MXU
        tmp_s[:] = lax.dot_general(
            vol_ref[0], wu, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(_SLAB_DTYPE)

        if nb > 0:
            @pl.when(bflag_ref[k] > 0)
            def _():
                rpb = (ii // nb) // 8  # row-blocks of the out layout per dot
                for rb in range(nb):
                    dv0 = band0_ref[k * nb + rb] * 16
                    wv_blk = wv_s[pl.ds(dv0, _WB),
                                  rb * (ii // nb):(rb + 1) * (ii // nb)]
                    tmp_blk = tmp_s[pl.ds(dv0, _WB), :]
                    blk = lax.dot_general(
                        wv_blk, tmp_blk, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (128, I)
                    out_ref[0, rb * rpb:(rb + 1) * rpb, 0, :, :] = (
                        blk.reshape(rpb, 8, ii).astype(_SLAB_DTYPE))

        full_gate = (bflag_ref[k] == 0) if nb > 0 else (occ_ref[k] > 0)

        @pl.when(full_gate)
        def _():
            # res[i, u] = sum_dv wv[dv, i] tmp[dv, u] — contract sublanes
            res = lax.dot_general(
                wv_s[:], tmp_s[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (I, I) f32
            out_ref[0, :, 0, :, :] = res.reshape(nrb, 8, ii).astype(
                _SLAB_DTYPE)

    @pl.when(jnp.logical_not(hot))
    def _():
        # an empty slab resamples below OCC_EPS -> transfer 0; write real
        # zeros so un-gated composite chunks stay exact
        out_ref[0, :, 0, :, :] = jnp.zeros((nrb, 8, ii), _SLAB_DTYPE)


def resample_slabs(volm, pos_u, pos_v, occ=None, interpret: bool = False):
    """Resample every slab onto the intermediate grid, in chunked layout.

    volm: (G, D, D) bf16 half-shifted slab-major volume (axis m pack).
    pos_u/pos_v: (gp, I) f32 ref-plane sample positions per slab (rows
    k >= G padded with an off-grid sentinel so their weights are all 0).
    occ: optional (gp,) int32 PER-SLAB occupancy gate (any window of the
    slab hot — shear_warp derives it from the static group tables):
    cold slabs skip both matmuls and write zeros.
    Returns res: (C, nrb, 8, 8, I) with C = gp//8 slab chunks — chunk c,
    row-block rb, slab s within the chunk, 8 intermediate rows, I cols.
    """
    g, d, _ = volm.shape
    gp, ii = pos_u.shape
    assert gp % 8 == 0 and ii % 128 == 0 and ii % 8 == 0
    nrb = ii // 8
    c = gp // 8

    # banded matmul 2 needs 128-row blocks and a volume deeper than the
    # band; otherwise every slab takes the full-contraction path
    band_on = _BAND and d >= _WB and ii % 128 == 0
    nb = ii // 128 if band_on else 0
    if band_on:
        band0, bflag = _band_meta(pos_v, d, nb)
    else:
        band0 = jnp.zeros((max(gp * nb, 1),), jnp.int32)
        bflag = jnp.zeros((gp,), jnp.int32)
    if occ is None:
        occ = jnp.ones((gp,), jnp.int32)

    out_spec = pl.BlockSpec(
        (1, nrb, 1, 8, ii),
        lambda k, *_: (k // 8, 0, k % 8, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec((gp, ii), lambda k, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((gp, ii), lambda k, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d, d), lambda k, *_: (jnp.minimum(k, g - 1), 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = jax.ShapeDtypeStruct((c, nrb, 8, 8, ii), _SLAB_DTYPE)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(gp,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((d, ii), _SLAB_DTYPE),  # wv (transposed)
            pltpu.VMEM((d, ii), _SLAB_DTYPE),  # tmp (matmul-1 result)
        ],
    )
    return pl.pallas_call(
        partial(_resample_kernel, d=d, ii=ii, nrb=nrb, nb=nb),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(occ, bflag, band0, pos_u, pos_v, volm)


def _composite_chunks_kernel(
    meta_ref,  # scalar-prefetch (1,): sgn
    nocc_ref,  # scalar-prefetch (nrb,): occupied-chunk counts per row-block
    ids_ref,  # scalar-prefetch (nrb * C,): marching-ordered chunk ids
    res_hbm,  # (C * nrb, 8, 8, I) chunked slab stacks
    irho_ref,  # (8, I) per-pixel exact steps per slab
    out_r, out_g, out_b, out_a,
    buf_a, buf_b,  # scratch (8, 8, I)
    sem_a, sem_b,
    *,
    nrb: int,
    c: int,
):
    ti = pl.program_id(0)
    sgn = meta_ref[0]
    n = nocc_ref[ti]
    irho = irho_ref[:]
    zero = jnp.zeros_like(irho)

    def cid(t):
        return ids_ref[ti * c + jnp.clip(t, 0, c - 1)]

    def dma(buf, sem, t):
        return pltpu.make_async_copy(
            res_hbm.at[cid(t) * nrb + ti], buf, sem
        )

    def process(buf, t, carry):
        def run(carry):
            r, g, b, a = carry
            for s in range(8):
                idx = jnp.where(sgn > 0, s, 7 - s)
                resv = buf[idx].astype(jnp.float32)
                # transfer + palette + the exact-march rate correction
                # (irho >= 1 steps per slab telescope to 1-(1-tv)^irho,
                # ops.shear_warp module docstring) in ONE polynomial pass:
                # the transcendental form measured ~90% of this kernel
                # (pow 0.43 + palette 0.51 of 0.99 ms at I=512, round-4
                # VOK_COMP_ABLATE probe); the polynomial mirror is exact
                # to <= 1.4e-6/sample (tools/fit_transfer_poly.py).
                if _COMP_ABLATE:  # timing-only ablations — see knob
                    if "nopal" in _COMP_ABLATE:
                        tv = smoothstep(0.10, 1.2, jnp.minimum(0.9, resv))
                        cr = cg = cb = tv
                    else:
                        tv, cr, cg, cb = bonsai_transfer_soa(resv)
                    if "nopow" not in _COMP_ABLATE:
                        tv = 1.0 - jnp.exp(irho * jnp.log(1.0 - tv))
                elif _EXACT_TRANSFER:  # A/B reference path
                    tv, cr, cg, cb = bonsai_transfer_soa(resv)
                    tv = 1.0 - jnp.exp(irho * jnp.log(1.0 - tv))
                elif _LOWDEG:
                    tv, cr, cg, cb = bonsai_transfer_pow_lowdeg_soa(
                        resv, irho)
                else:
                    tv, cr, cg, cb = bonsai_transfer_pow_fast_soa(resv, irho)
                # reference's per-pixel march stop at alpha 0.95
                live = (a < 0.95).astype(jnp.float32)
                w = (1.0 - a) * tv * live
                r, g, b, a = r + w * cr, g + w * cg, b + w * cb, a + w
            return r, g, b, a

        r, g, b, a = carry
        return lax.cond(
            (t < n) & (jnp.min(a) < 0.95), run, lambda cy: cy, carry
        )

    @pl.when(n > 0)
    def _():
        dma(buf_a, sem_a, 0).start()

    @pl.when(n > 1)
    def _():
        dma(buf_b, sem_b, 1).start()

    def body(carry):
        t, r, g, b, a = carry

        @pl.when(t < n)
        def _():
            dma(buf_a, sem_a, t).wait()

        r, g, b, a = process(buf_a, t, (r, g, b, a))

        @pl.when(t + 2 < n)
        def _():
            dma(buf_a, sem_a, t + 2).start()

        @pl.when(t + 1 < n)
        def _():
            dma(buf_b, sem_b, t + 1).wait()

        r, g, b, a = process(buf_b, t + 1, (r, g, b, a))

        @pl.when(t + 3 < n)
        def _():
            dma(buf_b, sem_b, t + 3).start()

        return t + 2, r, g, b, a

    def cond(carry):
        return carry[0] < n

    _, r, g, b, a = lax.while_loop(
        cond, body, (jnp.int32(0), zero, zero, zero, zero)
    )
    out_r[:] = r
    out_g[:] = g
    out_b[:] = b
    out_a[:] = a


def composite_chunks(res, sgn, irho, occ_b=None, interpret: bool = False):
    """Chunk-compacted front-to-back composite.

    res: (C, nrb, 8, 8, I) chunked slab stacks (resample_slabs).
    sgn: traced +-1 marching direction along the slab axis.
    irho: (I, I) per-pixel exact steps per slab (>= 1).
    occ_b: optional (nrb, C) bool chunk occupancy per ROW-BLOCK
    (shear_warp derives it from the volume-side tables); without it, one
    full reduce over ``res`` derives it from the resampled values.
    Returns (r, g, b, a) planes, each (I, I) f32.
    """
    c, nrb, _, _, ii = res.shape

    if occ_b is None:
        # occupied-chunk compaction at the composite's granularity: one
        # reduce over the chunked stack, then tiny nrb x C math
        occ = jnp.max(
            res.astype(jnp.float32), axis=(2, 3, 4)
        ) > OCC_EPS  # (C, nrb)
        occ_b = occ.T  # (nrb, C)
    cids = jnp.arange(c, dtype=jnp.int32)
    ord_pos = jnp.where(sgn > 0, cids, c - 1 - cids)
    key = jnp.where(occ_b, ord_pos[None, :], jnp.int32(2 * c))
    ids = jnp.argsort(key, axis=1).astype(jnp.int32).reshape(-1)
    nocc = occ_b.sum(axis=1).astype(jnp.int32)

    meta = jnp.asarray([sgn], jnp.int32).reshape(1)
    res_flat = res.reshape(c * nrb, 8, 8, ii)

    block_spec = pl.BlockSpec(
        (8, ii), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nrb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), block_spec],
        out_specs=[block_spec] * 4,
        scratch_shapes=[
            pltpu.VMEM((8, 8, ii), _SLAB_DTYPE),
            pltpu.VMEM((8, 8, ii), _SLAB_DTYPE),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    outs = pl.pallas_call(
        partial(_composite_chunks_kernel, nrb=nrb, c=c),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ii, ii), jnp.float32)] * 4,
        interpret=interpret,
    )(meta, nocc, ids, res_flat, irho)

    return outs


def resample_composite(volm, pos_u, pos_v, sgn, irho, occ=None, occ_b=None,
                       interpret: bool = False):
    """resample_slabs + composite_chunks in one call -> (r, g, b, a)."""
    res = resample_slabs(volm, pos_u, pos_v, occ=occ, interpret=interpret)
    return composite_chunks(res, sgn, irho, occ_b=occ_b, interpret=interpret)
