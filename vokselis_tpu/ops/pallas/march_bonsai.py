"""Fused Pallas trilinear raymarch of a voxel grid (bonsai path).

TPU-native rebuild of shaders/raycast_naive.wgsl fs_main (:84-125). The
reference's per-pixel fragment march performs ~400 trilinear texture fetches
per ray; TPUs have no texture units and XLA gathers run at scalar rate
(~0.02 Mray/s measured on v5e). This kernel restructures the march around a
key property of the reference's step size (raycast_naive.wgsl:97-99):

    dt = 1 / (256 * max|dir|)  =>  each step advances the ray's DOMINANT
    axis by exactly one voxel.

Therefore, per ray, the dominant-axis (m) texel coordinate at step j is
``X_m(j) = X_m(0) + j*s`` with a constant fraction — every ray visits
consecutive volume slabs, one per step, in its sign direction. Design:

1. rays are classified by (dominant axis m, sign s) — 6 classes. Each class
   gets its own slab-major volume layout in HBM, with negative-sign classes
   PRE-FLIPPED along the slab axis so every class marches in ascending slab
   order (tap order reverses: ``k0' = D-2-k0``, ``fm' = 1-fm``). ONE grid
   step serves ONE 32x32 image tile for ALL classes: a dynamic fori over
   classes derives slab-space params in-register and sweeps only classes
   with rays (a ~10-op probe + 1 reduce gates each).
2. The volume is stored as SLAB-PAIR chunks: uint16 section s of chunk c
   holds clamped slab 8c-1+s in the low byte and its +1 neighbor in the
   high byte — the trilinear m-lerp's two taps ride one value. Chunks are
   further split into overlapped v-BANDS of ``band_rows`` rows — one
   scalar-leading-index DMA fetches the rows a tile's window needs for 8
   march steps (``pl.ds`` DMA slicing does not compile on this toolchain;
   banding recovers the savings).
3. DMA is OCCUPANCY-GATED: a per-(chunk, 8-row v-band, u-band) table built
   at volume-prep time is consulted through scalar prefetch; chunks whose
   window region is empty are neither fetched nor processed (empty voxels
   contribute exactly zero through the transfer function:
   smoothstep(0.10, 1.2, min(0.9, 0)) == 0). In-flight DMAs are tracked by
   explicit started-flags carried through the sweep loop and drained on
   exit — every start has exactly one wait.
4. Per occupied chunk the window rows are dequantized into int32 QUADS:
   low half = the u16 slab pair at u, high half = the pair at u+1 (second
   lane roll, volume-edge clamped) — the full 2x2 (m, u) tap footprint of
   a bilinear sample is ONE lane gather (gathers measured the dominant
   cost: ablating half of them saved 7.4 ms/frame at 1024^2).
5. The row scan visits only each slab's envelope row range (u, v are
   linear in the slab index; ten reduces once per class bound every slab)
   and decodes taps with exact integer bit math (values <= 65535 in f32);
   ``take_along_axis`` along 128 lanes is vector-rate; no sublane gather
   exists, hence the v-scan + u-gather split and the dynamic lane roll
   locating the u window.
6. Transfer function faithful to the reference: the ``min(0.9, v)``
   clamp-arg-order quirk, smoothstep(0.10, 1.2), vertigo palette,
   front-to-back under-compositing; slabs sweep front-to-back with
   double-buffered band DMAs and tile-level early exit replacing the
   per-pixel break at opacity 0.95 (:115-117).

Limitations (flagged via the ``overflow`` output): requires dt_scale == 1
(the slab-order identity) and per-grid-step-per-chunk footprints <=
(win_rows-9, 127) voxels — all BASELINE.json configs fit at >= 512x512
output with the auto-picked windows (auto_win_rows / pick_tiles_per_step:
two fused 32x32 tiles per grid step with a 96-128 row window at >= 512^2
on 256^3 volumes; single tiles otherwise).
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vokselis_tpu.core import geometry
from vokselis_tpu.core.colors import (
    bonsai_transfer_fast_soa,
    bonsai_transfer_soa,
    linear_to_srgb,
    smoothstep,
)
from vokselis_tpu.utils.grid import cdiv, round_up

MAX_STEPS_BONSAI = int(math.ceil(math.sqrt(3.0) * 256.0)) + 1

# Perf-ablation switch for kernel development (0=off, 1=no row scan,
# 2=no conversion, 3=no occupied work, -4=half gathers, -5=whole-chunk
# scan) — nonzero values render WRONG images (timing only) and warn loudly
_ABLATE = int(os.environ.get("VOK_ABLATE", "0"))
if _ABLATE:
    import sys as _sys

    print(
        f"WARNING: VOK_ABLATE={_ABLATE} — the bonsai kernel will render "
        "WRONG images (perf ablation mode)",
        file=_sys.stderr,
    )

# (v-axis, u-axis) per dominant axis m (world axes 0=x, 1=y, 2=z)
_AXES = {0: (2, 1), 1: (2, 0), 2: (1, 0)}

WIN_V = 64  # default slab-window rows; u window is 128 lanes after the roll
TILE = 32  # pixel tile edge; one (8,128) block = one 32x32 tile
CHUNK = 8  # march slabs per DMA chunk (chunk holds CHUNK+1 slabs)
OCC_V = 8  # v-rows per occupancy block
OCC_U = 128  # u-cols per occupancy block
# Occupancy VISIBILITY cutoff (EXACT, round 5): the transfer
# tv = smoothstep(0.10, 1.2, min(0.9, samp)) is identically zero for
# samp <= 0.1, and trilinear interpolation is convex, so a block whose
# every voxel is <= floor(0.1 * 255) = 25 can never contribute — such
# blocks are equivalent to empty for the march (raycast_naive.wgsl:
# 106-108). Gating at > 25 instead of > 0 is what makes the config-5 fog
# honest: the radially-masked fbm field has a wide alpha TAIL (~49% of
# voxels nonzero) of which only the > 0.1 core is visible.
OCC_CUT = 25
# v-band start granularity: finer bands shrink each chunk DMA (measured
# 50.1 -> 51.0 Mrays/s at 256^3 with stride 16) but multiply the layout's
# HBM footprint; prepare_volume picks per volume size
BAND_STRIDE = 64
BAND_STRIDE_SMALL = 16  # for volumes <= 256^3 (layout stays < 1 GiB)
# rows per row-scan unroll group: 16 re-measured best vs 8 (37.2 vs 34.7
# Mrays/s at 1024^2) even WITH per-slab envelope ranges — dynamic-loop
# iteration overhead outweighs the ~25% fewer scanned rows
# (env override for A/B experiments only)
SCAN_GRP = int(os.environ.get("VOK_SCAN_GRP", "16"))
# default for prepare_volume's prequad option (see its docstring): store
# int32 quads in HBM so the kernel's conversion is one roll per row group
_PREQUAD = os.environ.get("VOK_PREQUAD", "0") == "1"


def _march_kernel(
    crange_ref,  # scalar-prefetch: (12,) int32 per-class occupied chunk lo/hi
    occ_ref,  # scalar-prefetch: flat int32 occupancy [(chunk*nvb+vb)*nub+ub]
    eye_ref,  # SMEM (3,) f32 camera eye
    vol_hbm,  # (6*n_chunks*nb, CHUNK, band_rows, D) u16 pair / i32 quad chunks
    dxr, dyr, dzr, tstr, t1r, hitr,  # raw ray blocks (8, 128)
    out_r, out_g, out_b, out_a, out_ovf,
    buf_a, buf_b,  # scratch (CHUNK, band_rows, D), vol_hbm's dtype
    win2d,  # scratch (CHUNK*win_v + 32, 128) int32 — quad windows
    sem_a, sem_b,
    *,
    dims: int,
    win_rows: int,
    band_rows: int,
    nb: int,
    bstride: int,
    max_steps: int,
    fast_transfer: bool = False,
):
    """One grid step = one 32x32 image tile, ALL six (axis, sign) ray
    classes: a dynamic fori over classes derives each class's slab-space
    params (u0/v0/du/dv/fm/k0) from the raw rays in-register and runs the
    banded sweep only when the class has rays in this tile. Round 1 ran a
    (6 x tiles) grid instead; ~5/6 of those steps were empty yet each paid
    full grid-step overhead (input block DMAs + dispatch) — the bulk of the
    measured 9.5 ms/frame skeleton floor at 1024^2."""
    win_v = min(win_rows, dims)
    win_u = min(128, dims)
    dx, dy, dz = dxr[:], dyr[:], dzr[:]
    t_start, t1 = tstr[:], t1r[:]
    hit = hitr[:] > 0.5
    exs, eys, ezs = eye_ref[0], eye_ref[1], eye_ref[2]

    n_chunks = cdiv(dims + 1, CHUNK)
    big = jnp.int32(10 * dims)
    zero = jnp.zeros_like(dx)
    fdims = float(dims)
    nvb = dims // OCC_V
    nub = max(dims // OCC_U, 1)

    # per-tile ray quantities shared by every class
    adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    amax = jnp.maximum(adx, jnp.maximum(ady, adz))
    dt = 1.0 / (fdims * amax)
    m_axis = jnp.where(adx == amax, 0, jnp.where(ady == amax, 1, 2))
    n_f = jnp.ceil((t1 - t_start) / dt)
    n_f = jnp.clip(jnp.where(hit, n_f, 0.0), 0.0, float(max_steps))
    nsteps = n_f.astype(jnp.int32)

    def class_probe(cls):
        """Cheapest activity test for class cls: ~10 vector ops + 1 reduce.
        Everything else (slab-space params, chunk ranges) is derived ONLY
        for classes with rays — typically 1-2 of 6 per 32x32 tile."""
        # scalar selects with VECTOR operands don't legalize in Mosaic
        # (arith.select with i1 scalar + vector); use scalar-float masks
        # (splat multiplies) instead
        m = cls // 2
        neg = (cls % 2) == 1
        w0 = (m == 0).astype(jnp.float32)
        w1 = (m == 1).astype(jnp.float32)
        w2 = (m == 2).astype(jnp.float32)
        d_m = w0 * dx + w1 * dy + w2 * dz
        # neg -> d_m < 0; pos -> d_m >= 0 == ~(d_m < 0)
        sign_ok = (d_m < 0) == neg
        mask = hit & (m_axis == m) & sign_ok & (nsteps > 0)
        return mask, d_m, (m, neg, w0, w1, w2)

    def class_state(mask, d_m, meta):
        """Slab-space ray params for one class — the XLA-side per-class
        prep of round 1, now in-register (and only for active classes)."""
        m, neg, w0, w1, w2 = meta
        e_m = jnp.where(m == 0, exs, jnp.where(m == 1, eys, ezs))  # scalars
        # (v-axis, u-axis) per m — see _AXES
        d_u = w0 * dy + (w1 + w2) * dx
        e_u = jnp.where(m == 0, eys, exs)
        d_v = (w0 + w1) * dz + w2 * dy
        e_v = jnp.where(m == 2, eys, ezs)
        xm0 = (e_m + t_start * d_m) * fdims - 0.5
        k0f = jnp.floor(xm0)
        fm = xm0 - k0f
        u0 = (e_u + t_start * d_u) * fdims - 0.5
        v0 = (e_v + t_start * d_v) * fdims - 0.5
        du = d_u * dt * fdims
        dv = d_v * dt * fdims
        # flipped layout for negative classes: k0' = D-2-k0, fm' = 1-fm
        wn = neg.astype(jnp.float32)
        k0c = k0f + wn * ((fdims - 2.0) - 2.0 * k0f)
        fmc = fm + wn * (1.0 - 2.0 * fm)
        return u0, v0, du, dv, fmc, k0c.astype(jnp.int32)

    def march_class(cls, mask, u0, v0, du, dv, fm, k0):
        """Run the banded occupancy-gated sweep for one ray class (callers
        guarantee the class has at least one ray)."""
        cbase = cls * (n_chunks * nb)
        k_last_per_ray = k0 + nsteps - 1
        k_first = jnp.clip(jnp.min(jnp.where(mask, k0, big)), -1, dims - 1)
        k_last = jnp.clip(
            jnp.max(jnp.where(mask, k_last_per_ray, -big)), -1, dims - 1
        )
        # chunk c covers k in [8c-1, 8c+6]; clamped to the class's occupied
        # range
        c_first = jnp.clip((k_first + 1) // CHUNK, crange_ref[2 * cls],
                           n_chunks - 1)
        c_last = jnp.clip((k_last + 1) // CHUNK, 0, crange_ref[2 * cls + 1])
        n_c = c_last - c_first + 1

        # ---- reduce-free window envelope ---------------------------------
        # u, v are LINEAR in the slab index: u(k) = (u0 - (k0+1) du) +
        # (k+1) du with k+1 >= 0 always (k >= -1), so a per-class linear
        # envelope — TEN reduces once per class — bounds every chunk's and
        # every slab's footprint in pure scalar math. Round 1 re-reduced 5
        # vector min/maxes per CHUNK (~160k reduces/frame at 1024^2), each
        # a vector->scalar sync on the DMA-index critical path.
        kp = k0.astype(jnp.float32) + 1.0
        pv = v0 - kp * dv
        inf = jnp.float32(1e9)

        def _mn(x):
            return jnp.min(jnp.where(mask, x, inf))

        def _mx(x):
            return jnp.max(jnp.where(mask, x, -inf))

        av_min, av_max = _mn(pv), _mx(pv)
        bv_min, bv_max = _mn(dv), _mx(dv)

        def chunk_meta(c, a):
            """Bounds + occupancy for chunk c given current opacities.

            Exact per-chunk vector reduces: measured TIGHTER than the pure
            scalar envelope (which ignores per-ray j-clamping and opacity
            exits and so widened windows enough to lose more in scans/DMA
            than the removed reduces saved: 35.5 vs 37.2 Mrays/s). The
            envelope still powers the per-SLAB scan ranges below. Computed
            once at DMA-start time; the resulting (want, band, window)
            scalars ride the loop carry so starts and waits always agree."""
            k_lo = CHUNK * c - 1
            k_hi = k_lo + CHUNK - 1
            in_range = (c >= c_first) & (c <= c_last)
            active_c = mask & (a < 0.95) & (k0 <= k_hi) & (k_last_per_ray >= k_lo)
            # (a scalar k-range test in place of this reduce measured
            # within noise: 50.2 vs 50.5-51.9 — kept for its opacity
            # tightening on partially-saturated sweeps)
            anyact = jnp.any(active_c) & in_range

            j_lo = jnp.clip((k_lo - k0).astype(jnp.float32), 0.0, nsteps - 1.0)
            j_hi = jnp.clip((k_hi - k0).astype(jnp.float32), 0.0, nsteps - 1.0)
            u_a, u_b = u0 + j_lo * du, u0 + j_hi * du
            v_a, v_b = v0 + j_lo * dv, v0 + j_hi * dv
            u_lo = jnp.clip(jnp.floor(jnp.minimum(u_a, u_b)), 0.0, fdims - 1.0)
            u_hi = jnp.clip(jnp.floor(jnp.maximum(u_a, u_b)) + 1.0, 0.0,
                            fdims - 1.0)
            v_lo = jnp.clip(jnp.floor(jnp.minimum(v_a, v_b)), 0.0, fdims - 1.0)
            v_hi = jnp.clip(jnp.floor(jnp.maximum(v_a, v_b)) + 1.0, 0.0,
                            fdims - 1.0)
            u_base = jnp.min(jnp.where(active_c, u_lo, fdims)).astype(jnp.int32)
            v_base = jnp.min(jnp.where(active_c, v_lo, fdims)).astype(jnp.int32)
            u_max = jnp.max(jnp.where(active_c, u_hi, 0.0)).astype(jnp.int32)
            v_max = jnp.max(jnp.where(active_c, v_hi, 0.0)).astype(jnp.int32)

            # occupancy over the window's (v, u) bands
            cc = jnp.clip(c, 0, n_chunks - 1)
            cc_tab = (cls * n_chunks + cc) * nvb * nub
            vb0 = v_base // OCC_V
            vb_hi = v_max // OCC_V
            ub0 = u_base // OCC_U
            ub_hi = u_max // OCC_U
            occ = jnp.int32(0)
            for q in range(win_v // OCC_V + 1):
                vb = jnp.clip(vb0 + q, 0, nvb - 1)
                v_in = vb <= vb_hi
                for qu in range(min(128 // OCC_U + 1, nub)):
                    ub = jnp.clip(ub0 + qu, 0, nub - 1)
                    occ = occ | jnp.where(
                        v_in & (ub <= ub_hi), occ_ref[(cc_tab + vb * nub) + ub], 0
                    )

            v_b2 = (v_base // 8) * 8  # int8 sublane alignment
            step_ovf = ((u_max - u_base) > win_u - 1) | ((v_max - v_b2) > win_v - 1)
            u_b2 = jnp.clip(u_base, 0, dims - win_u)
            v_b2 = jnp.clip(v_b2, 0, dims - win_v)
            n_rows = jnp.clip(v_max - v_b2 + 1, 0, win_v)
            band = jnp.clip(v_b2 // bstride, 0, nb - 1)
            want = anyact & (occ > 0)
            return (want, cc, band, u_b2, v_b2, n_rows, step_ovf & anyact)

        def dma_band(buf, sem, meta):
            _, cc, band, _, _, _, _ = meta
            return pltpu.make_async_copy(
                vol_hbm.at[cbase + cc * nb + band], buf, sem
            )

        def process_chunk(buf, c, meta, state):
            """March the 8 slabs k = 8c-1 .. 8c+6 from one resident band."""
            r, g, b, a, ovf = state
            want, _, band, u_b2, v_b2, n_rows, step_ovf = meta
            k_lo = CHUNK * c - 1
            ovf = ovf | step_ovf

            def occupied(r, g, b, a):
                v_loc = pl.multiple_of(v_b2 - band * bstride, 8)
                ub_f = u_b2.astype(jnp.float32)
                vb_f = v_b2.astype(jnp.float32)

                # dequantize + roll the slab windows, in row groups so rows
                # past n_rows (never read by the scan) skip conversion
                prequad = buf.dtype == jnp.int32  # HBM already holds quads
                grp_rows = 16 if win_v % 16 == 0 else 8
                n_groups = 0 if _ABLATE >= 2 else win_v // grp_rows
                for src in range(CHUNK):
                    for grp in range(n_groups):
                        @pl.when((grp == 0) | (grp * grp_rows < n_rows))
                        def _(src=src, grp=grp):
                            raw = buf[src, pl.ds(v_loc + grp * grp_rows, grp_rows), :]
                            if prequad:
                                # prepare_volume(prequad=True) pre-packed
                                # the quads (u+1 edge-clamped): one window-
                                # aligning roll replaces the whole decode
                                quad = pltpu.roll(raw, -u_b2, 1)[:, :win_u]
                            else:
                                # int32 QUAD per (v, u): the u16 slab pair
                                # at u in the low half, the pair at u+1 in
                                # the high half (second roll) — the row scan
                                # fetches the whole 2x2 (m, u) tap footprint
                                # of a bilinear sample in ONE gather
                                w = raw.astype(jnp.int32)
                                r0 = pltpu.roll(w, -u_b2, 1)
                                # NOTE a "static" pltpu.roll(r0, dims-1) for
                                # the neighbor measured SLOWER (42.9 vs
                                # 50.8): large static rotates lower worse
                                # than a second dynamic roll here
                                r1 = pltpu.roll(w, -(u_b2 + 1), 1)
                                # clamp-to-edge at the volume's last column:
                                # the roll WRAPS u = D-1's neighbor to col
                                # 0; the reference clamps (iu1 = min(iu0+1,
                                # D-1))
                                lanes = lax.broadcasted_iota(
                                    jnp.int32, r0.shape, 1
                                )
                                r1 = jnp.where(
                                    lanes == (dims - 1) - u_b2, r0, r1
                                )
                                quad = (r0 | (r1 << 16))[:, :win_u]
                            if win_u < 128:
                                quad = jnp.pad(
                                    quad, ((0, 0), (0, 128 - win_u))
                                )
                            win2d[
                                pl.ds(src * win_v + grp * grp_rows, grp_rows), :
                            ] = quad

                def slab(s_in, st):
                    r, g, b, a = st
                    k = k_lo + s_in
                    j = (k - k0).astype(jnp.float32)
                    active = mask & (j >= 0) & (j < nsteps) & (a < 0.95)

                    # per-slab scan range from the class envelope (scalar):
                    # this slab's taps lie in v(k) in [av+kp*bv] +- margin,
                    # typically ~1/3 of the whole-chunk n_rows span
                    kpf = (k + 1).astype(jnp.float32)
                    sv_lo = av_min + kpf * bv_min
                    sv_hi = av_max + kpf * bv_max
                    lo_i = jnp.clip(jnp.floor(sv_lo) - 1.0, 0.0, fdims - 1.0)
                    hi_i = jnp.clip(jnp.floor(sv_hi) + 2.0, 0.0, fdims - 1.0)
                    # clip to the chunk's EXACT row count too: the linear
                    # class envelope is slack at chunk edges (per-ray
                    # j-clamping), and active rays' taps provably lie in
                    # [v_b2, v_b2 + n_rows) by the window construction
                    lo_rel = jnp.clip(lo_i.astype(jnp.int32) - v_b2, 0,
                                      n_rows - 1)
                    hi_rel = jnp.clip(hi_i.astype(jnp.int32) - v_b2, 0,
                                      n_rows - 1)
                    if _ABLATE == -5:  # experiment: whole-chunk scan
                        base8 = jnp.int32(0)
                        g_lo, g_hi = 0, (n_rows + SCAN_GRP - 1) // SCAN_GRP
                    else:
                        # 8-aligned dynamic scan start: groups tile from
                        # lo8 = 8-aligned floor of the slab's first row, not
                        # from fixed multiples of SCAN_GRP — a 12-row span
                        # straddling a 16-boundary scans 16-24 rows instead
                        # of 32 (fewer gathers, same trip count)
                        base8 = (lo_rel // 8) * 8
                        g_lo = 0
                        g_hi = (hi_rel - base8) // SCAN_GRP + 1
                    u = u0 + j * du
                    v = v0 + j * dv
                    fu0 = jnp.floor(u)
                    fv0 = jnp.floor(v)
                    iu0 = jnp.clip(fu0, 0.0, fdims - 1.0)
                    iv0 = jnp.clip(fv0, 0.0, fdims - 1.0)
                    iv1 = jnp.clip(fv0 + 1.0, 0.0, fdims - 1.0)
                    fu = u - fu0
                    fv = v - fv0
                    # the quad's high half is column iu0+1 (volume-edge
                    # clamped in the conversion); the LOW edge needs a
                    # per-ray fix: for u in [-0.5, 0) the oracle taps
                    # clip(floor(u)+1) = column 0 == iu0, not iu0+1
                    u_low = fu0 < 0.0
                    iu0l = jnp.clip((iu0 - ub_f).astype(jnp.int32), 0, win_u - 1)
                    iv0l = (iv0 - vb_f).astype(jnp.int32)
                    iv1l = (iv1 - vb_f).astype(jnp.int32)
                    base_a = s_in * win_v

                    def row_scan(ci, quads):
                        # unrolled x16: dynamic-loop iterations cost ~1us
                        # each on this target; over-scanning is safe (rows
                        # past the span never match a tap index; scratch
                        # padded +32 rows). x16 beat x4/x8 and a fully-static
                        # 64-row scan (28.4 / 29.5 / 35.1 / 37.9 Mrays/s).
                        # The scan selects RAW int32 quads (one per v-row);
                        # the bit decode + m-lerp run ONCE per slab after
                        # the loop, not once per scanned row — the decode
                        # (~11 vector ops) used to dominate the row body
                        # ONE dynamic read per group (8-aligned start);
                        # rows come out as static slices of the block —
                        # replaces SCAN_GRP dynamic sublane reads
                        blk = win2d[pl.ds(base_a + base8 + ci * SCAN_GRP,
                                          SCAN_GRP), :]
                        for q in range(SCAN_GRP):
                            cc_ = base8 + ci * SCAN_GRP + q
                            q0a, q1a = quads
                            row = jnp.broadcast_to(blk[q:q + 1, :], u0.shape)
                            # ONE gather per row: int32 quad holds both
                            # slab-pair taps (u and u+1)
                            g = jnp.take_along_axis(row, iu0l, axis=1)
                            # OR-accumulate with disjoint row masks (at most
                            # one row matches each accumulator): associative,
                            # so the 16 unrolled contributions reduce as a
                            # tree instead of a 16-deep select chain
                            s0 = -((iv0l == cc_).astype(jnp.int32))
                            s1 = -((iv1l == cc_).astype(jnp.int32))
                            quads = (q0a | (g & s0), q1a | (g & s1))
                        return quads

                    if _ABLATE >= 1:
                        t00 = t01 = t10 = t11 = fu * 0.001
                    else:
                        zi = jnp.zeros(u0.shape, jnp.int32)
                        q0, q1 = lax.fori_loop(g_lo, g_hi, row_scan, (zi, zi))

                        def mlerp(g):
                            a0_ = (g & 0xFF).astype(jnp.float32)
                            b0 = ((g >> 8) & 0xFF).astype(jnp.float32)
                            a1_ = ((g >> 16) & 0xFF).astype(jnp.float32)
                            b1 = ((g >> 24) & 0xFF).astype(jnp.float32)
                            # m-lerp fused per tap; exact bit math (<= 255)
                            return a0_ + (b0 - a0_) * fm, a1_ + (b1 - a1_) * fm

                        t00, t01 = mlerp(q0)
                        t10, t11 = mlerp(q1)
                    # low-edge u clamp (see u_low above)
                    t01 = jnp.where(u_low, t00, t01)
                    t11 = jnp.where(u_low, t10, t11)
                    c0 = t00 + (t01 - t00) * fu
                    c1 = t10 + (t11 - t10) * fu
                    samp = (c0 + (c1 - c0) * fv) * (1.0 / 255.0)

                    # transfer (raycast_naive.wgsl:101-108). fast_transfer
                    # swaps the three vertigo cosines for their Chebyshev
                    # polynomials (<= 1.4e-6/channel, alpha EXACT —
                    # core.colors.bonsai_transfer_fast_soa): the hybrid's
                    # re-march uses it (its contract is measured in 1e-3s);
                    # the flagship full-frame kernel keeps the
                    # transcendental form and its ~1e-6 oracle parity.
                    if fast_transfer:
                        tv, cr, cg, cb = bonsai_transfer_fast_soa(samp)
                    else:
                        tv, cr, cg, cb = bonsai_transfer_soa(samp)
                    one_m_a = 1.0 - a
                    w = one_m_a * tv
                    return (
                        jnp.where(active, r + w * cr, r),
                        jnp.where(active, g + w * cg, g),
                        jnp.where(active, b + w * cb, b),
                        jnp.where(active, a + one_m_a * tv, a),
                    )

                return lax.fori_loop(0, CHUNK, slab, (r, g, b, a))

            if _ABLATE >= 3:
                return r + 0.0001, g, b, a + 0.001, ovf
            r, g, b, a = lax.cond(
                want, occupied, lambda r, g, b, a: (r, g, b, a), r, g, b, a
            )
            return r, g, b, a, ovf

        def alive(c_next, a):
            k_cursor = CHUNK * c_next - 1
            return jnp.any(mask & (a < 0.95) & (k_cursor <= k_last_per_ray))

        def body(carry):
            i, c, ma, mb, r, g, b, a, ovf = carry

            # stage A: chunk c from buf_a
            @pl.when(ma[0])
            def _():
                dma_band(buf_a, sem_a, ma).wait()

            r, g, b, a, ovf = process_chunk(buf_a, c, ma, (r, g, b, a, ovf))

            # prefetch chunk c+2 into buf_a (A is free; overlaps stage B)
            m2 = chunk_meta(c + 2, a)
            m2 = (m2[0] & (i + 2 < n_c),) + m2[1:]

            @pl.when(m2[0])
            def _():
                dma_band(buf_a, sem_a, m2).start()

            # stage B: chunk c+1 from buf_b
            @pl.when(mb[0])
            def _():
                dma_band(buf_b, sem_b, mb).wait()

            r, g, b, a, ovf = process_chunk(buf_b, c + 1, mb, (r, g, b, a, ovf))

            # prefetch chunk c+3 into buf_b
            m3 = chunk_meta(c + 3, a)
            m3 = (m3[0] & (i + 3 < n_c),) + m3[1:]

            @pl.when(m3[0])
            def _():
                dma_band(buf_b, sem_b, m3).start()

            return i + 2, c + 2, m2, m3, r, g, b, a, ovf

        def cond(carry):
            i, c, ma, mb, r, g, b, a, ovf = carry
            return (i < n_c) & alive(c, a)

        def sweep(_):
            # ---- 2 chunks per iteration, started-flag DMA pipeline; the
            # prologue lives INSIDE this branch so inactive classes pay
            # nothing (every start drains in run(): the while carries the
            # in-flight metas out and the epilogue waits on them) ----------
            meta0 = chunk_meta(c_first, zero)
            meta0 = (meta0[0] & (n_c > 0),) + meta0[1:]
            meta1 = chunk_meta(c_first + 1, zero)
            meta1 = (meta1[0] & (n_c > 1),) + meta1[1:]

            @pl.when(meta0[0])
            def _():
                dma_band(buf_a, sem_a, meta0).start()

            @pl.when(meta1[0])
            def _():
                dma_band(buf_b, sem_b, meta1).start()

            init = (jnp.int32(0), c_first, meta0, meta1, zero, zero, zero,
                    zero, jnp.bool_(False))
            final = lax.while_loop(cond, body, init)
            _, _, ma_f, mb_f, r, g, b, a, ovf = final

            # drain DMAs started for chunks the early exit never processed
            @pl.when(ma_f[0])
            def _():
                dma_band(buf_a, sem_a, ma_f).wait()

            @pl.when(mb_f[0])
            def _():
                dma_band(buf_b, sem_b, mb_f).wait()

            return r, g, b, a, ovf

        def no_sweep(_):
            return zero, zero, zero, zero, jnp.bool_(False)

        return lax.cond(n_c > 0, sweep, no_sweep, 0)

    def class_body(cls, carry):
        mask, d_m, meta = class_probe(cls)

        def active_case(carry):
            acc_r, acc_g, acc_b, acc_a, acc_ovf = carry
            u0, v0, du, dv, fm, k0 = class_state(mask, d_m, meta)
            r, g, b, a, ovf = march_class(cls, mask, u0, v0, du, dv, fm, k0)
            # every ray belongs to exactly one class: merge by mask
            return (
                jnp.where(mask, r, acc_r),
                jnp.where(mask, g, acc_g),
                jnp.where(mask, b, acc_b),
                jnp.where(mask, a, acc_a),
                acc_ovf | ovf,
            )

        return lax.cond(jnp.any(mask), active_case, lambda c: c, carry)

    r, g, b, a, ovf = lax.fori_loop(
        0, 6, class_body, (zero, zero, zero, zero, jnp.bool_(False))
    )

    out_r[:] = r
    out_g[:] = g
    out_b[:] = b
    if out_a is not None:  # the hybrid re-march consumes rgb only
        out_a[:] = a
    out_ovf[:] = jnp.broadcast_to(ovf.astype(jnp.float32), out_ovf.shape)


def prepare_volume(vol_u8, max_win_rows: int = WIN_V, prequad: bool | None = None):
    """Build the six slab-major banded slab-pair (uint16) layouts +
    occupancy.

    ``vol_u8``: (D, D, D) numpy/jnp uint8 indexed [z, y, x]. Class order is
    (m=0,s=+1), (m=0,s=-1), (m=1,s=+1), ... — negative classes use the
    slab-axis-reversed volume so the kernel always sweeps ascending.

    ``prequad=True`` (default: the VOK_PREQUAD env flag) stores int32 QUADS
    instead of uint16 pairs: the u+1 neighbor pair (volume-edge clamped,
    exactly the kernel's roll-wrap fix) pre-packed into the high 16 bits.
    The kernel's per-chunk conversion then needs ONE dynamic roll instead
    of astype + two rolls + edge-select + shift-or, at the cost of 2x the
    layout bytes and 2x the per-chunk window DMA — an A/B experiment for
    the conversion cost (~3.7 ms of the ~17 ms 1024^2 frame, VOK_ABLATE
    splits). The kernel infers the mode from the pack's dtype.

    Returns ``(meta, pack)`` where meta = (dims, band_rows, nb, bstride)
    statics and
    pack = (banded chunks, flat occupancy, per-class chunk ranges) arrays.
    """
    if prequad is None:
        prequad = _PREQUAD
    vol_np = np.asarray(vol_u8)
    assert vol_np.dtype == np.uint8, "bonsai kernel wants a uint8 volume"
    d = vol_np.shape[0]
    assert vol_np.shape == (d, d, d), "cubic volumes only (reference: 256^3)"
    base = {
        0: np.transpose(vol_np, (2, 0, 1)),  # m=x: [x][z][y] (v=z, u=y)
        1: np.transpose(vol_np, (1, 0, 2)),  # m=y: [y][z][x] (v=z, u=x)
        2: vol_np,  # m=z: [z][y][x] (v=y, u=x)
    }
    n_chunks = cdiv(d + 1, CHUNK)
    _, band_rows, nb, bstride = volume_layout_meta(d, max_win_rows)

    idx = np.clip(
        (np.arange(n_chunks)[:, None] * CHUNK - 1) + np.arange(CHUNK + 1)[None, :],
        0,
        d - 1,
    )
    stacks = []
    for m in range(3):
        for s in (1, -1):
            lay = base[m] if s > 0 else base[m][::-1]
            stacks.append(lay[idx])
    chunks = np.stack(stacks).reshape(-1, CHUNK + 1, d, d)

    # SLAB-PAIR packing: section s holds slab s | slab s+1 << 8 as uint16.
    # The trilinear m-lerp taps slabs (k, k+1) at the SAME (u, v): packing
    # the pair into one integer-exact f32 value (A + 256B <= 65535) halves
    # the kernel's lane gathers — measured the dominant cost of the row
    # scan (ablating 2 of 4 gathers: 28.5 -> 21.1 ms/frame at 1024^2)
    pairs = chunks[:, :CHUNK].astype(np.uint16) | (
        chunks[:, 1:].astype(np.uint16) << 8
    )
    if prequad:
        # int32 quad = pair at u | pair at min(u+1, D-1) << 16 — the edge
        # clamp reproduces the kernel's roll-wrap fix bit-exactly. Built in
        # uint32 (the high pair's top bit would overflow a signed shift)
        # and reinterpreted: the kernel's decode masks each byte.
        p32 = pairs.astype(np.uint32)
        nbr = np.concatenate([p32[..., 1:], p32[..., -1:]], axis=-1)
        pairs = (p32 | (nbr << 16)).view(np.int32)

    # v-banded copies: band b = rows [64b, 64b + band_rows), zero-padded
    padded = np.zeros(
        (pairs.shape[0], CHUNK, (nb - 1) * bstride + band_rows, d),
        pairs.dtype,
    )
    padded[:, :, :d, :] = pairs
    banded = np.stack(
        [padded[:, :, b * bstride : b * bstride + band_rows, :]
         for b in range(nb)],
        axis=1,
    ).reshape(-1, CHUNK, band_rows, d)

    nub = max(d // OCC_U, 1)
    occ3d = (
        chunks.reshape(chunks.shape[0], CHUNK + 1, d // OCC_V, OCC_V, nub, d // nub)
        > OCC_CUT
    ).any(axis=(1, 3, 5))
    occ = occ3d.astype(np.int32).reshape(-1)
    occ2d = occ3d.any(axis=2)
    nonempty = occ2d.reshape(6, n_chunks, -1).any(axis=2)
    cranges = np.zeros((6, 2), np.int32)
    for cls in range(6):
        idxs = np.nonzero(nonempty[cls])[0]
        cranges[cls] = (idxs[0], idxs[-1]) if len(idxs) else (1, 0)

    meta = (d, band_rows, nb, bstride)
    pack = (jnp.asarray(banded), jnp.asarray(occ), jnp.asarray(cranges))
    return meta, pack


@partial(jax.jit, static_argnames=("max_win_rows", "prequad"))
def prepare_volume_device(vol_u8, max_win_rows: int = WIN_V,
                          prequad: bool | None = None):
    """Device-side (jit) mirror of :func:`prepare_volume` — same six banded
    slab-pair layouts, occupancy tables and per-class chunk ranges, built
    from a TRACED uint8 volume so a time-varying density (config 5's
    per-batch volume update, ops.pallas.genvol.generate_density_u8_pallas)
    can be re-packed in the frame loop instead of through seconds of host
    numpy. Bit-identical to the host pack (tested), including the
    ``prequad`` int32-quad layout option (default: the VOK_PREQUAD env
    flag, same as the host builder); the statics (dims, band_rows, nb,
    bstride) follow the same formulas and are returned by
    :func:`volume_layout_meta`."""
    if prequad is None:
        prequad = _PREQUAD
    d = vol_u8.shape[0]
    assert vol_u8.dtype == jnp.uint8 and vol_u8.shape == (d, d, d)
    n_chunks = cdiv(d + 1, CHUNK)
    dims, band_rows, nb, bstride = volume_layout_meta(d, max_win_rows)

    base = {
        0: jnp.transpose(vol_u8, (2, 0, 1)),
        1: jnp.transpose(vol_u8, (1, 0, 2)),
        2: vol_u8,
    }

    # chunks[c, j] = lay[clip(c*CHUNK - 1 + j, 0, d-1)] — the host builder's
    # clipped arithmetic-progression gather. On device that gather
    # materializes ~d^3*(1+1/CHUNK) bytes per class through a gather HLO;
    # the identical tensor falls out of STATIC slices of a once-padded
    # layout: layp = [lay[0], lay, lay[-1]*pad] so layp[i] =
    # lay[clip(i-1, 0, d-1)], then rows j<CHUNK are a plain reshape of
    # layp[:n_chunks*CHUNK] and row j=CHUNK is a stride-CHUNK slice
    # (chunk c's last slab == chunk c+1's first). tools/repack_probe.py
    # measures the stage split.
    pad_back = n_chunks * CHUNK - d

    def windows(lay):
        layp = jnp.concatenate(
            [lay[:1], lay,
             jnp.broadcast_to(lay[-1:], (pad_back, d, d))])
        body = layp[: n_chunks * CHUNK].reshape(n_chunks, CHUNK, d, d)
        tail = layp[CHUNK :: CHUNK][:n_chunks]
        return jnp.concatenate([body, tail[:, None]], axis=1)

    stacks = []
    for m in range(3):
        for s in (1, -1):
            lay = base[m] if s > 0 else base[m][::-1]
            stacks.append(windows(lay))
    chunks = jnp.stack(stacks).reshape(-1, CHUNK + 1, d, d)

    pairs = chunks[:, :CHUNK].astype(jnp.uint16) | (
        chunks[:, 1:].astype(jnp.uint16) << 8
    )
    if prequad:
        # mirror of the host builder's quad pack: pair at u | edge-clamped
        # pair at u+1 << 16, built unsigned then bitcast to int32
        p32 = pairs.astype(jnp.uint32)
        nbr = jnp.concatenate([p32[..., 1:], p32[..., -1:]], axis=-1)
        pairs = jax.lax.bitcast_convert_type(p32 | (nbr << 16), jnp.int32)

    pad_rows = (nb - 1) * bstride + band_rows
    padded = jnp.pad(pairs, ((0, 0), (0, 0), (0, pad_rows - d), (0, 0)))
    banded = jnp.stack(
        [padded[:, :, b * bstride : b * bstride + band_rows, :]
         for b in range(nb)],
        axis=1,
    ).reshape(-1, CHUNK, band_rows, d)

    nub = max(d // OCC_U, 1)
    occ3d = (
        chunks.reshape(chunks.shape[0], CHUNK + 1, d // OCC_V, OCC_V, nub,
                       d // nub)
        > OCC_CUT
    ).any(axis=(1, 3, 5))
    occ = occ3d.astype(jnp.int32).reshape(-1)
    nonempty = occ3d.any(axis=(1, 2)).reshape(6, n_chunks)
    any_cls = nonempty.any(axis=1)
    first = jnp.argmax(nonempty, axis=1).astype(jnp.int32)
    last = (n_chunks - 1 - jnp.argmax(nonempty[:, ::-1], axis=1)).astype(
        jnp.int32
    )
    cranges = jnp.stack(
        [jnp.where(any_cls, first, 1), jnp.where(any_cls, last, 0)], axis=1
    )
    return banded, occ, cranges


def volume_layout_meta(d: int, max_win_rows: int = WIN_V):
    """The static layout parameters prepare_volume derives from the volume
    edge: (dims, band_rows, nb, bstride)."""
    win = min(max_win_rows, d)
    bstride = BAND_STRIDE_SMALL if d <= 256 else BAND_STRIDE
    band_rows = min(d, round_up(bstride + win, 8))
    nb = 1 if d <= band_rows else cdiv(d - band_rows, bstride) + 1
    return d, band_rows, nb, bstride


def _pack_tiles(x, ph, pw):
    """(ph, pw) -> (T*8, 128): each 32x32 image tile becomes one (8,128) block."""
    t = x.reshape(ph // TILE, TILE, pw // TILE, TILE)
    t = t.transpose(0, 2, 1, 3).reshape(-1, TILE * TILE)
    return t.reshape(-1, 8, 128).reshape(-1, 128)


def _unpack_tiles(x, ph, pw):
    t = x.reshape(-1, 8, 128).reshape(ph // TILE, pw // TILE, TILE, TILE)
    return t.transpose(0, 2, 1, 3).reshape(ph, pw)


@partial(
    jax.jit,
    static_argnames=(
        "dims", "max_steps", "srgb", "win_rows", "band_rows", "nb", "bstride",
        "tiles_per_step",
    ),
)
def render_bonsai_rays_pallas(
    vol_pack,  # (banded u16 pair chunks, occ int32, per-class chunk ranges)
    eye,  # (3,) f32 camera eye
    dxyz,  # SoA ray directions: (dx, dy, dz), each (H, W) f32, normalized
    dims: int,
    max_steps: int = MAX_STEPS_BONSAI,
    srgb: bool = True,
    win_rows: int = WIN_V,
    band_rows: int = 128,
    nb: int = 3,
    bstride: int = BAND_STRIDE,
    tiles_per_step: int = 1,
):
    """March an arbitrary SoA ray set with the fused slab-march kernel —
    the Pallas analog of ops.reference.render_bonsai_rays, shared by the
    full-frame renderer and the row-sharded multi-chip path (each chip
    marches its band of rays; parallel/sharding.render_frame_tiled).
    Returns ((H, W, 4) image, overflow count)."""
    vol_chunks, occ, cranges = vol_pack
    dx, dy, dz = dxyz
    height, width = dx.shape
    ex = jnp.broadcast_to(eye[0], dx.shape)
    ey = jnp.broadcast_to(eye[1], dx.shape)
    ez = jnp.broadcast_to(eye[2], dx.shape)
    t0, t1 = geometry.intersect_box_soa(ex, ey, ez, dx, dy, dz, 0.0, 1.0)
    hit = t0 <= t1
    t_start = jnp.maximum(t0, 0.0)

    ph = cdiv(height, TILE) * TILE
    pw = cdiv(width, TILE) * TILE

    def pack(x):
        return _pack_tiles(jnp.pad(x, ((0, ph - height), (0, pw - width))), ph, pw)

    n_tiles = (ph // TILE) * (pw // TILE)

    # raw per-ray data only; the kernel derives each class's slab-space
    # params in-register (one grid step per tile handles all 6 classes)
    ins = [pack(x) for x in (dx, dy, dz, t_start, t1, hit.astype(jnp.float32))]
    eye_vec = jnp.stack([eye[0], eye[1], eye[2]]).astype(jnp.float32)

    # tiles_per_step=2 fuses two horizontally-adjacent 32x32 tiles into one
    # (16, 128) grid step — halves the per-step scalar machinery (class
    # probes, chunk metas, DMA starts): measured 20.6 -> 17.7 ms at 1024^2
    # (win 80-96). 4-tile fusion measured WORSE (21.4 ms at win 128: the
    # quadrupled per-class window spans cost more scan/DMA than the saved
    # steps). Guarded to divisible tile rows so fused pairs never wrap
    # across image edges (a wrapped pair's union footprint spans the
    # frame); windows must be sized for the PAIR footprint (auto_win_rows).
    tps = tiles_per_step
    if tps not in (2, 4) or (n_tiles % tps) or ((pw // TILE) % tps):
        tps = 1
    grid = (n_tiles // tps,)
    block = pl.BlockSpec(
        (8 * tps, 128), lambda i, _cr, _occ: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + [block] * 6,
        out_specs=[block] * 5,
        scratch_shapes=[
            pltpu.VMEM((CHUNK, band_rows, dims), vol_chunks.dtype),
            pltpu.VMEM((CHUNK, band_rows, dims), vol_chunks.dtype),
            # +32 rows: the x16-unrolled row scan may over-read past the
            # last slab section (values never match a tap index)
            pltpu.VMEM((CHUNK * min(win_rows, dims) + 32, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    outs_call = pl.pallas_call(
        partial(_march_kernel, dims=dims, win_rows=win_rows,
                band_rows=band_rows, nb=nb, bstride=bstride,
                max_steps=max_steps),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles * 8, 128), jnp.float32)] * 5,
    )
    outs = outs_call(cranges.reshape(-1), occ, eye_vec, vol_chunks, *ins)

    n_ovf = jnp.sum(outs[4]).astype(jnp.int32)
    planes = [_unpack_tiles(o, ph, pw)[:height, :width] for o in outs[:4]]
    rgb = jnp.stack(planes[:3], axis=-1)
    if srgb:
        rgb = linear_to_srgb(rgb)
    alpha = jnp.ones((height, width, 1), jnp.float32)
    return jnp.concatenate([rgb, alpha], axis=-1), n_ovf


def _march_kernel_ids(ids_ref, crange_ref, occ_ref, *args, **kwargs):
    """_march_kernel behind a tile-id indirection prefetch (the ids only
    drive the BlockSpec index maps; the kernel body never reads them)."""
    del ids_ref
    return _march_kernel(crange_ref, occ_ref, *args, **kwargs)


def render_bonsai_tiles_pallas(
    vol_pack,
    eye,
    dxyz,  # SoA ray directions for the FULL frame: (dx, dy, dz), (H, W) f32
    tile_ids,  # (n_sel,) int32 — 32x32 tile ids to march; pad with n_tiles
    dims: int,
    max_steps: int = MAX_STEPS_BONSAI,
    win_rows: int = WIN_V,
    band_rows: int = 128,
    nb: int = 3,
    bstride: int = BAND_STRIDE,
):
    """March ONLY the listed 32x32 tiles of the frame — the hybrid
    renderer's exact-refinement pass (re-march silhouette-flagged tiles of
    the fast shear-warp frame with the exact kernel; matches
    shaders/raycast_naive.wgsl:84-125 like the full-frame entry).

    ``tile_ids`` entries equal to ``n_tiles`` (= padded count for a static
    selection budget) index an appended ALL-MISS tile: its rays belong to
    no class, so the grid step costs only the class probes. Returns
    (compact linear-rgb planes (n_sel*8, 128) x4, overflow count); scatter
    rows ``tile_ids[i]*8 + r`` back into the packed frame (padded entries
    land out of bounds and drop).
    """
    vol_chunks, occ, cranges = vol_pack
    dx, dy, dz = dxyz
    height, width = dx.shape
    ex = jnp.broadcast_to(eye[0], dx.shape)
    ey = jnp.broadcast_to(eye[1], dx.shape)
    ez = jnp.broadcast_to(eye[2], dx.shape)
    t0, t1 = geometry.intersect_box_soa(ex, ey, ez, dx, dy, dz, 0.0, 1.0)
    hit = t0 <= t1
    t_start = jnp.maximum(t0, 0.0)

    ph = cdiv(height, TILE) * TILE
    pw = cdiv(width, TILE) * TILE

    def pack(x):
        p = _pack_tiles(jnp.pad(x, ((0, ph - height), (0, pw - width))), ph, pw)
        return jnp.pad(p, ((0, 8), (0, 0)))  # all-miss tile for padded ids

    n_sel = tile_ids.shape[0]
    ins = [pack(x) for x in (dx, dy, dz, t_start, t1, hit.astype(jnp.float32))]
    eye_vec = jnp.stack([eye[0], eye[1], eye[2]]).astype(jnp.float32)

    in_block = pl.BlockSpec(
        (8, 128), lambda i, ids, _cr, _occ: (ids[i], 0),
        memory_space=pltpu.VMEM,
    )
    out_block = pl.BlockSpec(
        (8, 128), lambda i, _ids, _cr, _occ: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_sel,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + [in_block] * 6,
        out_specs=[out_block] * 5,
        scratch_shapes=[
            pltpu.VMEM((CHUNK, band_rows, dims), vol_chunks.dtype),
            pltpu.VMEM((CHUNK, band_rows, dims), vol_chunks.dtype),
            pltpu.VMEM((CHUNK * min(win_rows, dims) + 32, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    outs = pl.pallas_call(
        partial(_march_kernel_ids, dims=dims, win_rows=win_rows,
                band_rows=band_rows, nb=nb, bstride=bstride,
                max_steps=max_steps),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_sel * 8, 128), jnp.float32)] * 5,
    )(tile_ids.astype(jnp.int32), cranges.reshape(-1), occ, eye_vec,
      vol_chunks, *ins)
    n_ovf = jnp.sum(outs[4]).astype(jnp.int32)
    return outs[:4], n_ovf


def _march_kernel_ids_into(ids_ref, crange_ref, occ_ref, eye_ref, vol_hbm,
                           dxr, dyr, dzr, tstr, t1r, hitr,
                           br, bg, bb, out_r, out_g, out_b, out_ovf,
                           *scratch, **kwargs):
    """_march_kernel behind tile-id indirection with aliased base planes:
    the base refs only feed the output aliasing (never read in-kernel).
    Base/output planes are rgb-only — the hybrid's finish never consumes
    alpha, so the round-3 4th zero plane (alloc + pad copy + per-step
    aliased writes) is gone (round-4 b0 decomposition)."""
    del ids_ref, br, bg, bb
    return _march_kernel(crange_ref, occ_ref, eye_ref, vol_hbm,
                         dxr, dyr, dzr, tstr, t1r, hitr,
                         out_r, out_g, out_b, None, out_ovf,
                         *scratch, **kwargs)


def _tile_rays_compact(camera_uniform, tile_ids, width: int, height: int,
                       tiles_per_step: int = 1):
    """Fragment-path rays for ONLY the listed 32x32 tiles, emitted directly
    in the packed (n_sel*8*tps, 128) layout of :func:`_pack_tiles` (packed
    element (s, l) of a tile is its row ``(s%8)*4 + l//32``, col ``l%32``).

    Replaces full-frame raygen + 6 full-frame tile packs in the hybrid's
    re-march path: the fixed full-frame prep measured ~2.5 ms at 1024^2
    (round-3 oppoint, budget=16 → 4.3 ms vs 1.55 ms fast frame) while the
    budget-sized planes here cost ~budget/1024 of that. Math matches
    geometry.rays_fragment_soa + intersect_box_soa exactly (same ops, same
    order) so parity with the full-frame path is bit-exact.

    With ``tiles_per_step=2`` the ids index PAIRS of horizontally-adjacent
    tiles (unit p = tiles 2p, 2p+1 — raster-consecutive, so callers must
    guarantee an even tile row width): one (16, 128) block per unit, the
    re-march analog of the full-frame kernel's 2-tile grid-step fusion.

    Entries equal to the unit count (parked picks) and pixels outside the
    frame (cdiv padding) get hit=0 — they compose to the miss color and
    never gate DMA. Returns 6 planes (dx, dy, dz, t_start, t1, hit).
    """
    nx = cdiv(width, TILE)
    ny = cdiv(height, TILE)
    tps = tiles_per_step
    n_units = (ny * nx) // tps
    ids = tile_ids.astype(jnp.int32)
    s = jnp.arange(8 * tps, dtype=jnp.int32)
    lane = jnp.arange(128, dtype=jnp.int32)
    tile = ids[:, None] * tps + (s // 8)[None, :]  # (n_sel, 8*tps)
    ty = (tile // nx)[:, :, None]
    tx = (tile % nx)[:, :, None]
    iy = (ty * TILE + ((s % 8) * 4)[None, :, None]
          + (lane // 32)[None, None, :])
    ix = tx * TILE + (lane % 32)[None, None, :]
    px = ix.astype(jnp.float32) + 0.5
    py = iy.astype(jnp.float32) + 0.5
    ndc_x = 2.0 * px / width - 1.0
    ndc_y = 1.0 - 2.0 * py / height
    inv = camera_uniform.inv_proj
    nx4, ny4, nz4, nw4 = geometry.mat4_apply(inv, ndc_x, ndc_y, jnp.float32(0.0))
    fx, fy, fz, fw = geometry.mat4_apply(inv, ndc_x, ndc_y, jnp.float32(1.0))
    dx = fx / fw - nx4 / nw4
    dy = fy / fw - ny4 / nw4
    dz = fz / fw - nz4 / nw4
    inv_len = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    dx, dy, dz = dx * inv_len, dy * inv_len, dz * inv_len
    eye = camera_uniform.view_position[:3]
    ex = jnp.broadcast_to(eye[0], dx.shape)
    ey = jnp.broadcast_to(eye[1], dx.shape)
    ez = jnp.broadcast_to(eye[2], dx.shape)
    t0, t1 = geometry.intersect_box_soa(ex, ey, ez, dx, dy, dz, 0.0, 1.0)
    hit = (t0 <= t1) & (ids[:, None, None] < n_units)
    hit &= (ix < width) & (iy < height)
    t_start = jnp.maximum(t0, 0.0)
    n_sel = ids.shape[0]
    return tuple(p.reshape(n_sel * 8 * tps, 128) for p in
                 (dx, dy, dz, t_start, t1, hit.astype(jnp.float32)))


def render_bonsai_tiles_into(
    vol_pack,
    base_planes,  # 3-tuple (rgb) of ((n_tiles + tps) * 8, 128) packed planes
    camera_uniform,
    tile_ids,  # (n_sel,) int32 — tile (or pair) ids to march; pad w/ count
    width: int,
    height: int,
    dims: int,
    max_steps: int = MAX_STEPS_BONSAI,
    win_rows: int = WIN_V,
    band_rows: int = 128,
    nb: int = 3,
    bstride: int = BAND_STRIDE,
    tiles_per_step: int = 1,
    fast_transfer: bool = False,
):
    """render_bonsai_tiles_pallas, but the exact tiles are written IN PLACE
    over donated base planes via Pallas output aliasing — no XLA scatter
    (measured multi-ms at 1024^2: TPU scatters serialize), and the ray
    planes are generated compactly for ONLY the selected tiles
    (:func:`_tile_rays_compact`) — no full-frame prep. The base planes
    are the fast frame's packed linear rgb with ONE extra trailing unit
    row-block: padded ``tile_ids`` entries (== unit count) land there and
    the caller slices it off. Returns (merged r/g/b, overflow count).

    ``tiles_per_step=2`` marches PAIRS of horizontally-adjacent tiles per
    grid step (ids are pair indices; see :func:`_tile_rays_compact`): the
    per-step scalar machinery (class probes, chunk metas, band DMAs +
    window conversion) amortizes over both tiles exactly like the
    full-frame kernel's 2-tile fusion, and selected silhouette tiles are
    spatially clustered so the pair's union slab window barely grows.
    Callers must size ``win_rows`` for the PAIR footprint
    (auto_win_rows(..., 2)) and guarantee an even tile row width.
    """
    vol_chunks, occ, cranges = vol_pack
    ph = cdiv(height, TILE) * TILE
    pw = cdiv(width, TILE) * TILE
    n_tiles = (ph // TILE) * (pw // TILE)
    tps = tiles_per_step
    assert tps == 1 or (pw // TILE) % tps == 0, (tps, pw)

    n_sel = tile_ids.shape[0]
    ins = _tile_rays_compact(camera_uniform, tile_ids, width, height, tps)
    eye = camera_uniform.view_position[:3]
    eye_vec = jnp.stack([eye[0], eye[1], eye[2]]).astype(jnp.float32)
    for bp in base_planes:
        assert bp.shape == ((n_tiles + tps) * 8, 128), bp.shape

    in_block = pl.BlockSpec(
        (8 * tps, 128), lambda i, ids, _cr, _occ: (ids[i], 0),
        memory_space=pltpu.VMEM,
    )
    sel_block = pl.BlockSpec(
        (8 * tps, 128), lambda i, _ids, _cr, _occ: (i, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_sel,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + [sel_block] * 6 + [in_block] * 3,
        out_specs=[in_block] * 3 + [sel_block],
        scratch_shapes=[
            pltpu.VMEM((CHUNK, band_rows, dims), vol_chunks.dtype),
            pltpu.VMEM((CHUNK, band_rows, dims), vol_chunks.dtype),
            pltpu.VMEM((CHUNK * min(win_rows, dims) + 32, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    # operand numbering for aliasing counts the scalar-prefetch args:
    # 0 ids, 1 cranges, 2 occ, 3 eye, 4 vol, 5-10 rays, 11-13 base planes
    outs = pl.pallas_call(
        partial(_march_kernel_ids_into, dims=dims, win_rows=win_rows,
                band_rows=band_rows, nb=nb, bstride=bstride,
                max_steps=max_steps, fast_transfer=fast_transfer),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(((n_tiles + tps) * 8, 128), jnp.float32)
        ] * 3 + [jax.ShapeDtypeStruct((n_sel * 8 * tps, 128), jnp.float32)],
        input_output_aliases={11: 0, 12: 1, 13: 2},
    )(tile_ids.astype(jnp.int32), cranges.reshape(-1), occ, eye_vec,
      vol_chunks, *ins, *base_planes)
    n_ovf = jnp.sum(outs[3]).astype(jnp.int32)
    return outs[:3], n_ovf


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "dims", "max_steps", "srgb", "win_rows",
        "band_rows", "nb", "bstride", "tiles_per_step",
    ),
)
def _render_bonsai_pallas(
    vol_pack,
    camera_uniform,
    width: int,
    height: int,
    dims: int,
    max_steps: int,
    srgb: bool,
    win_rows: int = WIN_V,
    band_rows: int = 128,
    nb: int = 3,
    bstride: int = BAND_STRIDE,
    tiles_per_step: int = 1,
):
    eye, dxyz = geometry.rays_fragment_soa(camera_uniform, width, height)
    return render_bonsai_rays_pallas(
        vol_pack, eye, dxyz, dims, max_steps, srgb,
        win_rows, band_rows, nb, bstride, tiles_per_step,
    )


def auto_win_rows(dims: int, width: int, height: int,
                  tiles_per_step: int = 1) -> int:
    """Window rows sized to the worst per-grid-step slab footprint: a
    TILE*tiles_per_step-pixel step at 90-degree fovy spans
    ~dims * edge/min(w,h) * path voxels; +32 covers chunk growth,
    alignment, and tap spill. Measured needs: 64 at 1024^2, 80 at 512^2,
    96 at 640x360 (256^3 volume, tps=1). Fused pairs get +16 headroom and
    a 96-row floor: zoomed-out DIAGONAL poses overflow an est-sized pair
    window (zoom 1.6 measured: 80 fails, 96 clean — the formula cannot
    see zoom), and window size costs little (envelope scans + occupancy
    gating keep work proportional to content, not window)."""
    if tiles_per_step == 2:
        return min(128, _pair_window_demand(dims, width, height))
    # single tiles: +8 headroom, cap at the 128-row layout default (a
    # 96-row cap overflowed 2 tiles at 640x360 — flagged, found via the
    # parity report's stale-scratch-dependent max error)
    est = (3 * dims * TILE) // max(min(width, height), 1) + 32
    return max(64, min(128, (est + 8 + 7) // 8 * 8))


def _pair_window_demand(dims: int, width: int, height: int) -> int:
    """Window rows a fused 2-tile step wants, before the 128-row layout
    clamp (auto_win_rows' tps=2 formula). The 128 clamp is empirically
    sufficient at 512^2 (demand 144 -> 128, pose-sweep clean) — the
    formula is conservative — but a cap BELOW the demand is not."""
    est = (3 * dims * 2 * TILE) // max(min(width, height), 1) + 32
    return max(96, (est + 16 + 7) // 8 * 8)


def pick_tiles_per_step(dims: int, width: int, height: int,
                        cap: int = 128) -> int:
    """Fuse two tiles per grid step when the PAIR's window footprint fits a
    <=128-row window within ``cap`` (measured: 2-tile fusion wins 20.6 ->
    ~16-17 ms at 1024^2 and 9.3 -> 8.0 ms at 512^2; the per-step scalar
    machinery halves. 4-tile fusion measured worse. Window demand doubles
    for the classes whose v-axis maps to image x, so small frames or large
    volumes fall back to 1). Gates on the window auto_win_rows would
    actually pick, so a custom cap in [96, 127] never selects fusion whose
    demanded window exceeds the cap (advisor finding, round 2); big-volume
    cases (demand far beyond 128, e.g. 512^3 @512^2 est 224) stay
    unfused via the est<=128 term."""
    est = (3 * dims * 2 * TILE) // max(min(width, height), 1) + 32
    demand = min(128, _pair_window_demand(dims, width, height))
    return 2 if est <= 128 and demand <= min(cap, 128) else 1


class BonsaiRenderer:
    """Holds the per-volume banded slab layouts; call to render.

    TPU-side analog of the reference's VolumeTexture + RaycastPipeline pair
    (examples/bonsai/raycast.rs:12-141).
    """

    def __init__(self, vol_u8, win_rows: int = 128,
                 prequad: bool | None = None):
        # layouts are built for the LARGEST window the renderer may use;
        # smaller per-call windows reuse the same bands
        (self.dims, self.band_rows, self.nb, self.bstride), self.layouts = prepare_volume(
            vol_u8, win_rows, prequad=prequad
        )
        self.max_win_rows = win_rows
        self.last_overflow = 0
        self._vol = np.asarray(vol_u8)  # for the strict-mode oracle fallback

    def __call__(
        self,
        camera_uniform,
        width: int = 1280,
        height: int = 720,
        max_steps: int = MAX_STEPS_BONSAI,
        srgb: bool = True,
        win_rows: int | None = None,
        strict: bool = False,
    ):
        """Render one frame. ``strict=True`` synchronously checks the
        kernel's window-overflow flag and re-renders the frame with the jnp
        oracle if any tile's slab footprint exceeded the window — guaranteed
        correct pixels at the cost of a device round-trip per frame (use for
        goldens/extreme poses; interactive paths read ``last_overflow``
        asynchronously instead)."""
        tps = pick_tiles_per_step(self.dims, width, height,
                                  cap=self.max_win_rows)
        if win_rows is None:
            win_rows = min(auto_win_rows(self.dims, width, height, tps),
                           self.max_win_rows)
        img, ovf = _render_bonsai_pallas(
            self.layouts, camera_uniform, width, height,
            self.dims, max_steps, srgb,
            win_rows, self.band_rows, self.nb, self.bstride, tps,
        )
        self.last_overflow = ovf
        if strict and int(jax.device_get(ovf)) > 0:
            # retry with the most forgiving kernel config first (largest
            # window, no tile fusion) — ms, not the ~47 s/frame oracle
            if win_rows < self.max_win_rows or tps != 1:
                img, ovf = _render_bonsai_pallas(
                    self.layouts, camera_uniform, width, height,
                    self.dims, max_steps, srgb,
                    self.max_win_rows, self.band_rows, self.nb,
                    self.bstride, 1,
                )
                self.last_overflow = ovf
            if int(jax.device_get(self.last_overflow)) > 0:
                from vokselis_tpu.ops import reference

                img = reference.render_bonsai(
                    jnp.asarray(self._vol), camera_uniform, width=width,
                    height=height, max_steps=max_steps, srgb=srgb,
                )
        return img


def build_renderer(vol_u8, win_rows: int | None = None,
                   with_overflow: bool = False):
    """Functional API for jit pipelines: returns (render_fn, pack) where
    render_fn(pack, camera_uniform, width, height) is jittable and the pack
    travels as ARGUMENTS (closing over it would bake ~100MB of constants
    into the HLO — catastrophic for this environment's remote compiles).

    ``win_rows`` caps the slab window (layouts are built for it; default 128
    — per-call windows and the 2-tile grid-step fusion are auto-picked per
    render size within the cap). ``with_overflow=True`` makes render_fn
    return ``(img, overflow_count)`` so jit pipelines can check the
    kernel's only wrong-pixels signal (a step's slab footprint exceeding
    the VMEM window); bench.py asserts it is zero during warmup."""
    cap = 128 if win_rows is None else win_rows
    (dims, band_rows, nb, bstride), pack = prepare_volume(vol_u8, cap)

    def render(pk, camera_uniform, width, height,
               max_steps=MAX_STEPS_BONSAI, srgb=True):
        tps = pick_tiles_per_step(dims, width, height, cap=cap)
        win = min(auto_win_rows(dims, width, height, tps), cap)
        img, ovf = _render_bonsai_pallas(
            pk, camera_uniform, width, height, dims, max_steps, srgb,
            win, band_rows, nb, bstride, tps,
        )
        return (img, ovf) if with_overflow else img

    return render, pack


def render_bonsai_pallas(vol_u8, camera_uniform, width=1280, height=720, **kw):
    """One-shot wrapper (rebuilds volume layouts every call — hold a
    :class:`BonsaiRenderer` for repeated rendering)."""
    return BonsaiRenderer(vol_u8)(camera_uniform, width, height, **kw)
