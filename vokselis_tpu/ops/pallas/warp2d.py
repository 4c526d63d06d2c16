"""Bilinear homography warp kernel: (C, I, I) image -> (H, W) at fractional
coordinates. The final pass of the shear-warp fast renderer
(ops.shear_warp): XLA gathers run at scalar rate on TPU, so the per-pixel
4-tap lookup runs here with the march kernel's machinery — 32x32 pixel
tiles packed into (8,128) blocks, a banded row-window DMA per tile, a lane
roll to align the u footprint, and a v-row scan with lane gathers
(take_along_axis along 128 lanes is vector-rate; no sublane gather exists).

Coordinates must be FINITE and pre-sanitized by the caller; the ``hit``
mask excludes non-hit pixels from the per-tile window min/max (an unmasked
park value would drag a silhouette-straddling tile's window away from its
hit pixels' rows and clamp their taps — round-2 review finding). Non-hit
pixels read edge-clamped garbage and must be masked by the caller.
Out-of-range taps clamp to the intermediate's edge, whose 1-texel pad
ring is ~zero, matching map_coordinates' cval=0 within the pad.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vokselis_tpu.ops.pallas.march_bonsai import (
    TILE,
    _pack_tiles,
    _unpack_tiles,
)
from vokselis_tpu.utils.grid import cdiv

# precision experiment knob shared with ops.shear_warp (see there)
_CH_DTYPE = (
    jnp.float32 if os.environ.get("VOK_FAST_F32", "0") == "1" else jnp.bfloat16
)

# row window scales with the intermediate/output ratio (worst per-tile v
# span = TILE * r * persp_scale * (|cos|+|sin|) ~ 1.84 * TILE * r, + taps);
# capped at 48 (VMEM) — beyond-cap footprints edge-extend (fast mode)
WIN_CAP = 48
BAND_STRIDE = 16
_GATE = os.environ.get("VOK_WARP_GATE", "1") == "1"


def _win_rows(ii: int, height: int, width: int) -> int:
    est = int(1.84 * TILE * ii / max(min(height, width), 1)) + 10
    return min(ii, min(WIN_CAP, ((est + 7) // 8) * 8))


def _warp_kernel(
    bands_hbm,  # (nb, C, band_rows, IW) f32
    avr, bur,  # (8, 128) fractional coords (v, u)
    hitr,  # (8, 128) 1.0 where the pixel participates in the window
    *rest,  # n_ch output refs + overflow-flag ref, then scratch:
    # buf (C, band_rows, IW), win (C * WIN_ROWS, 128) rolled window, DMA sem
    **kw,
):
    return _warp_kernel_impl(bands_hbm, avr, bur, hitr, rest, **kw)


def _warp_kernel_impl(
    bands_hbm, avr, bur, hitr, rest,
    *,
    ii: int,  # real rows (v extent)
    iw: int,  # real cols (u extent); bands are padded to iw_pad
    iw_pad: int,  # power-of-two lane width of the banded image
    win_rows: int,
    band_rows: int,
    nb: int,
    n_ch: int,
    want_ovf: bool,
):
    av, bu = avr[:], bur[:]
    hitm = hitr[:] > 0.5
    win_u = min(128, iw_pad)

    fav = jnp.floor(av)
    fbu = jnp.floor(bu)
    iv0 = jnp.clip(fav, 0.0, float(ii) - 1.0)
    iv1 = jnp.clip(fav + 1.0, 0.0, float(ii) - 1.0)
    iu0 = jnp.clip(fbu, 0.0, float(iw) - 1.0)
    iu1 = jnp.clip(fbu + 1.0, 0.0, float(iw) - 1.0)
    fa = jnp.clip(av - fav, 0.0, 1.0)
    fb = jnp.clip(bu - fbu, 0.0, 1.0)

    outs = rest[:n_ch]
    out_o = rest[n_ch] if want_ovf else None
    buf, win, sem = rest[n_ch + (1 if want_ovf else 0):]
    # all-miss tiles (background is most of the frame at typical poses)
    # skip the DMA and the row scan entirely: the caller masks non-hit
    # pixels to black, so zeros are exact. VOK_WARP_GATE=0 disables for
    # A/B timing.
    any_hit = jnp.any(hitm) if _GATE else jnp.bool_(True)

    @pl.when(jnp.logical_not(any_hit))
    def _():
        for c in range(n_ch):
            outs[c][:] = jnp.zeros_like(avr[:])
        if want_ovf:
            out_o[:] = jnp.zeros_like(avr[:])

    @pl.when(any_hit)
    def _():
        big = float(max(ii, iw))
        v_lo = jnp.min(jnp.where(hitm, iv0, big)).astype(jnp.int32)
        v_hi = jnp.max(jnp.where(hitm, iv1, 0.0)).astype(jnp.int32)
        u_lo = jnp.min(jnp.where(hitm, iu0, big)).astype(jnp.int32)

        v_b = jnp.clip((v_lo // 8) * 8, 0, max(ii - win_rows, 0))
        band = jnp.clip(v_b // BAND_STRIDE, 0, nb - 1)
        v_loc = pl.multiple_of(v_b - band * BAND_STRIDE, 8)
        u_b = jnp.clip(u_lo, 0, max(iw_pad - win_u, 0))
        n_rows = jnp.clip(v_hi - v_b + 1, 1, win_rows)

        cp = pltpu.make_async_copy(bands_hbm.at[band], buf, sem)
        cp.start()

        # per-pixel tap indices overlap the DMA latency
        ub_f0 = u_b.astype(jnp.float32)
        vb_f0 = v_b.astype(jnp.float32)
        iu0l = jnp.clip((iu0 - ub_f0).astype(jnp.int32), 0, win_u - 1)
        iu1l = jnp.clip((iu1 - ub_f0).astype(jnp.int32), 0, win_u - 1)
        # clamp into the window: footprints beyond win_rows (extreme zoom)
        # edge-extend instead of going dark — fast-mode artifact, not a crash
        iv0l = jnp.clip((iv0 - vb_f0).astype(jnp.int32), 0, win_rows - 1)
        iv1l = jnp.clip((iv1 - vb_f0).astype(jnp.int32), 0, win_rows - 1)
        # flag hit pixels whose footprint exceeded the (win_rows, win_u)
        # window and edge-extended (mirrors the MXU kernel's out_o): the
        # hybrid re-marches those tiles, restoring the error contract on
        # this fallback path too
        if want_ovf:
            out_o[:] = jnp.where(
                hitm
                & ((iv0 - vb_f0 > float(win_rows - 2))
                   | (iu0 - ub_f0 > float(win_u - 2))),
                1.0,
                0.0,
            )

        cp.wait()

        for c in range(n_ch):
            rolled = pltpu.roll(
                buf[c, pl.ds(v_loc, win_rows), :].astype(jnp.float32), -u_b, 1
            )[:, :win_u]
            if win_u < 128:
                rolled = jnp.pad(rolled, ((0, 0), (0, 128 - win_u)))
            win[pl.ds(c * win_rows, win_rows), :] = rolled  # width iw_pad rolled

        zero = jnp.zeros_like(av)

        def row_scan(ci, taps):
            # x8 unroll (dynamic-loop iterations have heavy fixed overhead)
            for q in range(8):
                cc = ci * 8 + q
                new = []
                for c in range(n_ch):
                    t0c, t1c = taps[2 * c], taps[2 * c + 1]
                    row = jnp.broadcast_to(
                        win[pl.ds(c * win_rows + cc, 1), :], av.shape
                    )
                    g0 = jnp.take_along_axis(row, iu0l, axis=1)
                    g1 = jnp.take_along_axis(row, iu1l, axis=1)
                    t = g0 + (g1 - g0) * fb
                    m0 = iv0l == cc
                    m1 = iv1l == cc
                    new.append(jnp.where(m0, t, t0c))
                    new.append(jnp.where(m1, t, t1c))
                taps = tuple(new)
            return taps

        taps0 = (zero,) * (2 * n_ch)
        taps = lax.fori_loop(0, (n_rows + 7) // 8, row_scan, taps0)

        for c in range(n_ch):
            t0c, t1c = taps[2 * c], taps[2 * c + 1]
            outs[c][:] = t0c + (t1c - t0c) * fa


def _roll_blocks(win_u: int, n_jb: int) -> int:
    """Lane blocks a (.., win_u) window read must cover: the window start
    u_b sits anywhere inside its 128-lane block (s = u_b - 128*jb <= 127),
    so s + win_u <= nblk * 128 — rounded UP to a power of two because
    pltpu.roll with a TRACED shift silently corrupts on non-power-of-two
    lane widths (probed round 3: 384 wrong, 256/512 exact)."""
    nblk = win_u // 128 + 1
    return min(1 << (nblk - 1).bit_length(), n_jb)


def _load_window(chans_ref, c, n_jb, v_b, u_b, win_rows, win_u):
    """(win_rows, win_u) f32 window starting at (v_b, u_b) from the
    lane-BLOCKED (C * n_jb, I, 128) intermediate: slice the 2 (or 4)
    128-lane blocks the window can touch (traced leading index + dynamic
    8-aligned sublane start), then ONE power-of-two-width roll. The old
    layout rolled the full (win_rows, iw_pad) row span per channel per
    tile — at I=1024 that is 4x the vector traffic the window needs, and
    the roll was the measured bulk of the 1.31 ms warp (round-5 stage
    split, tools/profile_fast2.py)."""
    nblk = _roll_blocks(win_u, n_jb)
    jb = jnp.clip(u_b // 128, 0, n_jb - nblk)
    parts = [
        chans_ref[c * n_jb + jb + j, pl.ds(v_b, win_rows), :]
        for j in range(nblk)
    ]
    row = jnp.concatenate(parts, axis=1).astype(jnp.float32)
    if nblk == n_jb:
        # the blocks span the whole row: s == u_b (jb clamped to 0)
        return pltpu.roll(row, -u_b, 1)[:, :win_u]
    s = u_b - jb * 128
    return pltpu.roll(row, -s, 1)[:, :win_u]


def _warp_kernel_mxu(
    chans_ref,  # (C * n_jb, I, 128) bf16 — lane-blocked, VMEM-resident
    avr, bur,  # (8, 128) fractional coords (v, u)
    hitr,  # (8, 128) 1.0 where the pixel participates in the window
    *rest,  # n_ch output refs, [overflow-flag ref], the window scratch
    ii: int,
    iw: int,
    iw_pad: int,
    win_rows: int,
    win_u: int,
    n_ch: int,
    want_ovf: bool,
):
    """MXU formulation of the per-tile bilinear warp: the u-lerp rides a
    hat-weight matmul (exactly the resample kernel's trick) and the v-lerp
    is a small VPU multiply-reduce — no row scan, no per-row lane gathers.
    The banded-DMA + row-scan kernel above measured 1.88 ms at 1024^2
    (I=512): ~240 take_along_axis per hot tile dominated. Requires the
    intermediate to fit VMEM ((C, I, iw_pad) f32 — I <= 640 or so); the
    caller falls back to the scan kernel above it doesn't.

    ``out_o`` is a per-pixel WINDOW-OVERFLOW flag (1.0 where a hit pixel's
    taps fell outside the (win_rows, win_u) window and were edge-clamped):
    perspective-stretched footprints at off-axis poses can exceed any
    static window (spans of 100-220 intermediate texels per 32 px tile
    were measured at zoom 1.0 diagonals), so instead of silently clamping,
    the kernel reports exactly which pixels degraded — the hybrid renderer
    re-marches those tiles with the exact kernel (emitted only when the
    caller asks: fast-only frames skip the flag plane's compute/store)."""
    outs = rest[:n_ch]
    out_o = rest[n_ch] if want_ovf else None
    a_win = rest[n_ch + (1 if want_ovf else 0)]
    av, bu = avr[:], bur[:]
    hitm = hitr[:] > 0.5
    win_u = min(win_u, iw_pad)
    wk = max(win_u, 128)  # matmul contraction width (>= 1 lane tile)

    # image-edge clamp first (matches the scan kernel's iu/iv clip): a hat
    # weight at a clamped integer coordinate is 1.0 on the edge texel,
    # reproducing the lerp-of-clamped-taps exactly
    av_c = jnp.clip(av, 0.0, float(ii) - 1.0)
    bu_c = jnp.clip(bu, 0.0, float(iw) - 1.0)

    any_hit = jnp.any(hitm) if _GATE else jnp.bool_(True)

    @pl.when(jnp.logical_not(any_hit))
    def _():
        for c in range(n_ch):
            outs[c][:] = jnp.zeros_like(avr[:])
        if want_ovf:
            out_o[:] = jnp.zeros_like(avr[:])

    @pl.when(any_hit)
    def _():
        big = float(max(ii, iw))
        v_lo = jnp.min(jnp.where(hitm, jnp.floor(av_c), big))
        u_lo = jnp.min(jnp.where(hitm, jnp.floor(bu_c), big))
        v_b = pl.multiple_of(
            jnp.clip(
                (v_lo.astype(jnp.int32) // 8) * 8,
                0,
                max((ii - win_rows) // 8 * 8, 0),
            ),
            8,
        )
        u_b = jnp.clip(u_lo.astype(jnp.int32), 0, max(iw_pad - win_u, 0))

        n_jb = chans_ref.shape[0] // n_ch
        for c in range(n_ch):
            # chans are stored bf16 (the hat matmul runs bf16 regardless —
            # zero precision cost, half the VMEM/DMA) but the roll must run
            # f32: Mosaic's dynamic rotate is 32-bit-only ("Rotate with
            # non-32-bit data" compile error on a traced-shift bf16 roll)
            rolled = _load_window(chans_ref, c, n_jb, v_b, u_b,
                                  win_rows, win_u)
            if win_u < wk:  # clipped bu_l <= win_u-1 zeroes the pad's hats
                rolled = jnp.pad(rolled, ((0, 0), (0, wk - win_u)))
            a_win[pl.ds(c * win_rows, win_rows), :] = rolled.astype(
                jnp.bfloat16
            )

        vb_f = v_b.astype(jnp.float32)
        ub_f = u_b.astype(jnp.float32)
        # taps iv0 = floor(av_c), iv1 = iv0 + 1 must land in
        # [v_b, v_b + win_rows); same for u — flag hit pixels whose
        # footprint exceeds the window (their taps edge-extend below)
        if want_ovf:
            out_o[:] = jnp.where(
                hitm
                & ((jnp.floor(av_c) - vb_f > float(win_rows - 2))
                   | (jnp.floor(bu_c) - ub_f > float(win_u - 2))),
                1.0,
                0.0,
            )

        # window-local coords; out-of-window footprints (extreme zoom)
        # edge-extend exactly like the scan kernel's tap clamp
        bu_l = jnp.clip(bu_c - ub_f, 0.0, win_u - 1.0)
        av_l = jnp.clip(av_c - vb_f, 0.0, win_rows - 1.0)

        # Mosaic iota must be integer; convert after
        iota_u = lax.broadcasted_iota(jnp.int32, (wk, 128), 0).astype(
            jnp.float32
        )
        iota_v = lax.broadcasted_iota(jnp.int32, (win_rows, 128), 0).astype(
            jnp.float32
        )
        aw = a_win[:, :]
        # per packed sublane row q: one (C*win_rows, win_u) @ (win_u, 128)
        # MXU dot folds the u-lerp; the v-lerp is a (win_rows, 128)
        # hat-weighted sublane reduce per channel
        for q in range(8):
            wu = jnp.maximum(
                0.0, 1.0 - jnp.abs(iota_u - bu_l[q : q + 1, :])
            ).astype(jnp.bfloat16)
            cq = lax.dot_general(
                aw, wu, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C * win_rows, 128)
            hv = jnp.maximum(0.0, 1.0 - jnp.abs(iota_v - av_l[q : q + 1, :]))
            for c in range(n_ch):
                outs[c][q : q + 1, :] = jnp.sum(
                    hv * cq[c * win_rows : (c + 1) * win_rows, :],
                    axis=0,
                    keepdims=True,
                )


# VMEM budget for the resident-intermediate MXU kernel: (C, I, iw_pad)
# bf16 input block + (C*win_rows, win_u) scratch + out blocks. The input
# block has a constant index map (resident once, not double-buffered);
# only the small (8, 128) coord/out blocks pipeline, so 10 MiB of resident
# intermediate still leaves ~6 MiB headroom under the 16 MiB/core budget.
# 10 MiB admits the hybrid's 4-channel I=1024 stats intermediate (8.4 MiB
# — round 5: I=1024 halves the warp's ~1/I reconstruction error, moving
# the hybrid op point to budget 32; validated on-device by the OPPOINT
# ladder), I=768 pads to 1024 lanes = 6.3 MiB.
_MXU_VMEM_CAP = 10 * 1024 * 1024
_MXU = os.environ.get("VOK_WARP_MXU", "1") == "1"

# adaptive re-warp: max tiles re-warped at the big window per frame. The
# footprint distribution is heavy-tailed (bench pose: 128 of 592 hit
# tiles exceed the 40-row default, 0 exceed (128, 256)); tiles beyond the
# cap keep their pass-1 edge-extended pixels WITH overflow flags set, so
# the hybrid's exact re-march still covers them — the cap bounds cost,
# not correctness.
_REWARP_CAP = int(os.environ.get("VOK_REWARP_CAP", "192"))
_ADAPTIVE = os.environ.get("VOK_WARP_ADAPTIVE", "1") == "1"
_REWARP_ROWS = 128
_REWARP_U = 256


def _rewarp_window(ii: int, iw_pad: int):
    """Pass-2 (adaptive re-warp) window, scaled with the intermediate:
    footprint spans grow ~linearly with I (round-3 span measurements were
    6-220 texels per 32px tile at I=512; at I=1024 the same poses need up
    to ~440), so a fixed (128, 256) window that covered every I=512 pose
    leaks overflows at I=1024 — measured round 5 as 8 zoom-1.0 off-axis
    sweep poses at 1.1-1.9e-3 under a budget-32 re-march. The window is
    VMEM-cheap (scratch 4*rows*u bf16, 1 MiB at (256, 512)) and only the
    <= _REWARP_CAP overflowed tiles pay its matmul."""
    scale = max(1, ii // 512)
    rows = min(_REWARP_ROWS * scale, max((ii // 8) * 8, 8), ii)
    win_u = min(_REWARP_U * scale, iw_pad)
    return rows, win_u


def _lane_blocked(chans_b):
    """(C, I, iw_pad) -> (C * n_jb, I, 128): split the lane axis into
    128-wide blocks and lift the block index to the leading dim, so the
    warp kernels can pre-slice the 2 (or 4) blocks a window touches with
    a traced leading index instead of rolling the full row span (see
    _load_window). One XLA transpose per frame (~the array's own size in
    vector traffic) buys a per-TILE saving."""
    n_ch, ii, iw_pad = chans_b.shape
    if iw_pad < 128:  # tiny intermediates: one partial block, zero-padded
        chans_b = jnp.pad(chans_b, ((0, 0), (0, 0), (0, 128 - iw_pad)))
        iw_pad = 128
    n_jb = iw_pad // 128
    return (chans_b.reshape(n_ch, ii, n_jb, 128)
            .transpose(0, 2, 1, 3)
            .reshape(n_ch * n_jb, ii, 128))


def mxu_adaptive_eligible(n_ch: int, ii: int) -> bool:
    """True when warp_bilinear_packed's MXU path will take over window
    sizing (two-pass adaptive) for an (n_ch, ii, ii) intermediate — the
    caller should then pass the default (0, 128) window hint instead of
    pose-dependent buckets (each bucket is a separate jit variant with
    identical adaptive behavior; remote compiles here cost minutes)."""
    iw_pad = 1 << (ii - 1).bit_length()
    return _ADAPTIVE and _MXU and n_ch * ii * iw_pad * 2 <= _MXU_VMEM_CAP


def _packed_edge(x):
    """|d/dcol| + |d/drow| of a PACKED tile plane or block, within-tile
    only. Packed element (s, l) of a tile is image row ``(s%8)*4 + l//32``,
    col ``l%32`` (march_bonsai._pack_tiles), so the left neighbor is one
    lane over (masked at within-tile col 0) and the row-above neighbor is
    32 lanes over — or, for image rows 0 mod 4, one sublane up and 96
    lanes forward. Cross-tile diffs are dropped (tiles aren't adjacent in
    memory): the edge channel is a 0.03-weighted selection heuristic and
    the score lab measured edge-weight insensitivity. Static rolls only —
    wrapped values are exactly the masked positions — so the same code
    runs on the full (n_tiles*8, 128) plane in XLA and on one (8, 128)
    block inside the Mosaic stats kernel."""
    lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    sub = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    prev_col = jnp.roll(x, 1, axis=1)
    cd = jnp.where(lane % 32 == 0, 0.0, jnp.abs(x - prev_col))
    prev_lane32 = jnp.roll(x, 32, axis=1)
    prev_sub96 = jnp.roll(jnp.roll(x, 1, axis=0), -96, axis=1)
    prev_row = jnp.where(lane >= 32, prev_lane32, prev_sub96)
    rd = jnp.where((sub % 8 == 0) & (lane < 32), 0.0, jnp.abs(x - prev_row))
    return cd + rd


def _srgb_score_lum(lum):
    """(slope, srgb_lum) of the SCORING luminance from ONE log+exp pair:
    t = lum^(1/2.4) gives both the transfer slope (1.055/2.4)*t/lum and
    the sRGB luminance 1.055*t - 0.055. The luminance is srgb-of-MEAN —
    the round-3 contract was mean-of-srgb over r/g/b (3 extra log+exp
    pairs per pixel); the difference is a Jensen gap on the 0.03-weighted
    edge term and the peak ranking weight only (curv*slope, the dominant
    score term, uses the slope, which is unchanged). Swapped after the
    transcendental count measured as the stats kernel's biggest vector
    cost (round 4; CPU mini-sweep re-validated 72/72 <= 1e-3)."""
    t = jnp.exp(jnp.log(lum) * (1.0 / 2.4))
    hi = lum > 0.0031308
    slope = jnp.where(hi, (1.055 / 2.4) * t / lum, 12.92)
    srgb_lum = jnp.where(hi, 1.055 * t - 0.055, 12.92 * lum)
    return slope, srgb_lum


# stats plane row layout (each row broadcast across its 128 lanes); the
# divisor for the sum rows is the 8*128 tile pixel count
STAT_CURV = 0   # sum(warped curvature x sRGB slope), ok pixels
STAT_EDGE = 1   # sum of within-tile |grad| of the sRGB luminance
STAT_OVF = 2    # count of ok pixels whose warp window overflowed
STAT_EXT = 3    # count of box-hit pixels outside the warp extent (~ok)
STAT_PEAK = 4   # max sRGB luminance in the tile


def _stats_rows(vals):
    """(8, 128) block with vals[i] broadcast across row i, rest zero."""
    sub = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    out = jnp.zeros((8, 128), jnp.float32)
    for i, v in enumerate(vals):
        out = out + jnp.where(sub == i, v, 0.0)
    return out


def _warp_kernel_mxu_stats(
    chans_ref,  # (4 * n_jb, I, 128) bf16 — rgb + curvature, lane-blocked
    avr, bur,  # (8, 128) fractional coords (v, u)
    okr,  # (8, 128) 1.0 where the warp can reconstruct the pixel
    boxr,  # (8, 128) 1.0 where the ray hits the volume box
    out_r, out_g, out_b,  # ok-masked linear rgb
    stats_ref,  # (8, 128) per-tile score statistics (see STAT_* rows)
    a_win,  # scratch (4 * win_rows, wk) bf16
    *,
    ii: int,
    iw: int,
    iw_pad: int,
    win_rows: int,
    win_u: int,
):
    """The MXU warp with the hybrid's ENTIRE per-pixel aux contract folded
    in-kernel: everything the tile scoring consumes (warped curvature x
    sRGB slope, luminance edge term, window-overflow and extent-excluded
    counts, peak luminance) reduces to ONE (8, 128) stats block per tile
    while the data is already VMEM-resident. Replaces the round-3 packed
    contract's two extra full-frame planes (errd, ovf), two full-frame
    packs (ok, hit returned to XLA) and five full-frame XLA scoring
    passes (3x linear_to_srgb, packed edge, masking selects + per-tile
    reduces) — the bulk of the measured ~1.0-1.4 ms aux tax and ~0.5 ms
    scoring tax on the hybrid's budget-0 frame (tools/aux_tax_probe.py,
    OPPOINT.json round 3)."""
    av, bu = avr[:], bur[:]
    okm = okr[:] > 0.5
    boxm = boxr[:] > 0.5
    win_u = min(win_u, iw_pad)
    wk = max(win_u, 128)

    av_c = jnp.clip(av, 0.0, float(ii) - 1.0)
    bu_c = jnp.clip(bu, 0.0, float(iw) - 1.0)
    any_ok = jnp.any(okm) if _GATE else jnp.bool_(True)

    @pl.when(jnp.logical_not(any_ok))
    def _():
        z = jnp.zeros_like(av)
        out_r[:] = z
        out_g[:] = z
        out_b[:] = z
        # extent-excluded pixels still count: a black-rendered hit cluster
        # next to content must stay rankable (its tile_peak neighborhood
        # term is applied XLA-side from the dilated peak grid)
        ext = jnp.sum(boxm.astype(jnp.float32))
        stats_ref[:] = _stats_rows([0.0, 0.0, 0.0, ext, 0.0])

    @pl.when(any_ok)
    def _():
        big = float(max(ii, iw))
        v_lo = jnp.min(jnp.where(okm, jnp.floor(av_c), big))
        u_lo = jnp.min(jnp.where(okm, jnp.floor(bu_c), big))
        v_b = pl.multiple_of(
            jnp.clip(
                (v_lo.astype(jnp.int32) // 8) * 8,
                0,
                max((ii - win_rows) // 8 * 8, 0),
            ),
            8,
        )
        u_b = jnp.clip(u_lo.astype(jnp.int32), 0, max(iw_pad - win_u, 0))

        n_jb = chans_ref.shape[0] // 4
        for c in range(4):
            rolled = _load_window(chans_ref, c, n_jb, v_b, u_b,
                                  win_rows, win_u)
            if win_u < wk:
                rolled = jnp.pad(rolled, ((0, 0), (0, wk - win_u)))
            a_win[pl.ds(c * win_rows, win_rows), :] = rolled.astype(
                jnp.bfloat16
            )

        vb_f = v_b.astype(jnp.float32)
        ub_f = u_b.astype(jnp.float32)
        ovf = okm & (
            (jnp.floor(av_c) - vb_f > float(win_rows - 2))
            | (jnp.floor(bu_c) - ub_f > float(win_u - 2))
        )

        bu_l = jnp.clip(bu_c - ub_f, 0.0, win_u - 1.0)
        av_l = jnp.clip(av_c - vb_f, 0.0, win_rows - 1.0)
        iota_u = lax.broadcasted_iota(jnp.int32, (wk, 128), 0).astype(
            jnp.float32
        )
        iota_v = lax.broadcasted_iota(jnp.int32, (win_rows, 128), 0).astype(
            jnp.float32
        )
        aw = a_win[:, :]
        # per packed sublane row q: one (4*win_rows, win_u) @ (win_u, 128)
        # MXU dot folds the u-lerp; the v-lerp is a hat-weighted sublane
        # reduce per channel. Rows land in the output refs (curvature
        # parks in stats_ref, overwritten below) — read back as full
        # blocks for the masking + stats, avoiding sublane concatenates.
        row_refs = (out_r, out_g, out_b, stats_ref)
        for q in range(8):
            wu = jnp.maximum(
                0.0, 1.0 - jnp.abs(iota_u - bu_l[q : q + 1, :])
            ).astype(jnp.bfloat16)
            cq = lax.dot_general(
                aw, wu, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (4 * win_rows, 128)
            hv = jnp.maximum(0.0, 1.0 - jnp.abs(iota_v - av_l[q : q + 1, :]))
            for c in range(4):
                row_refs[c][q : q + 1, :] = jnp.sum(
                    hv * cq[c * win_rows : (c + 1) * win_rows, :],
                    axis=0,
                    keepdims=True,
                )

        r = jnp.where(okm, out_r[:], 0.0)
        g = jnp.where(okm, out_g[:], 0.0)
        b = jnp.where(okm, out_b[:], 0.0)
        cu = jnp.where(okm, stats_ref[:], 0.0)
        out_r[:] = r
        out_g[:] = g
        out_b[:] = b

        lum = jnp.maximum((r + g + b) * (1.0 / 3.0), 1e-6)
        slope, lums = _srgb_score_lum(lum)
        edge = _packed_edge(lums)
        stats_ref[:] = _stats_rows([
            jnp.sum(cu * slope),
            jnp.sum(edge),
            jnp.sum(ovf.astype(jnp.float32)),
            jnp.sum((boxm & jnp.logical_not(okm)).astype(jnp.float32)),
            jnp.max(lums),
        ])


def stats_from_packed(rgbp, curvp, ovfp, okp, boxp):
    """XLA mirror of the stats kernel's reduction: packed ok-MASKED rgb +
    curvature planes, per-pixel overflow flags and the ok/box-hit masks
    (all (n_tiles*8, 128)) -> the stats plane. The CPU fallback path and
    the interpret-mode tests run the hybrid's scoring through this."""
    r, g, b = rgbp
    n_tiles = r.shape[0] // 8
    lum = jnp.maximum((r + g + b) * (1.0 / 3.0), 1e-6)
    slope, lums = _srgb_score_lum(lum)
    edge = _packed_edge(lums)

    def tsum(x):
        return x.reshape(n_tiles, 8, 128).sum(axis=(1, 2))

    vals = [
        tsum(curvp * slope),
        tsum(edge),
        tsum(okp * ovfp),
        tsum(boxp * (1.0 - okp)),
        lums.reshape(n_tiles, 8, 128).max(axis=(1, 2)),
    ]
    sub = (jnp.arange(n_tiles * 8) % 8)[:, None]
    out = jnp.zeros((n_tiles * 8, 128), jnp.float32)
    for i, v in enumerate(vals):
        out = out + jnp.where(sub == i, jnp.repeat(v, 8)[:, None], 0.0)
    return out


def _rewarp_kernel_stats(ids_ref, chans_ref, avr, bur, okr, boxr,
                         *rest, **kw):
    """Compact stats re-warp wrapper: drop the scalar-prefetch ids ref and
    the 4 ALIASED input plane refs (the output refs are the same memory)."""
    return _warp_kernel_mxu_stats(chans_ref, avr, bur, okr, boxr,
                                  *rest[4:], **kw)


def _rewarp_overflow_tiles_stats(chans_b, av_p, bu_p, ok_p, box_p, planes,
                                 ii, iw, iw_pad, win_rows, win_u):
    """_rewarp_overflow_tiles for the stats contract: per-tile overflow
    counts come from the stats plane's STAT_OVF row, and the re-warp
    updates each selected tile's rgb AND stats block in place (a tile
    still exceeding the big window keeps a nonzero count for the hybrid's
    exact re-march)."""
    n_tiles = av_p.shape[0] // 8
    n_sel = min(_REWARP_CAP, n_tiles)
    counts = planes[3].reshape(n_tiles, 8, 128)[:, STAT_OVF, 0]
    vals, ids = jax.lax.top_k(counts, n_sel)
    ids = jnp.where(vals > 0.0, ids, n_tiles).astype(jnp.int32)

    pad8 = ((0, 8), (0, 0))
    base = [jnp.pad(p, pad8) for p in planes]
    av_pp, bu_pp, ok_pp, box_pp = (
        jnp.pad(x, pad8) for x in (av_p, bu_p, ok_p, box_p)
    )

    id_block = pl.BlockSpec(
        (8, 128), lambda i, ids: (ids[i], 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_sel,),
        in_specs=[
            pl.BlockSpec(chans_b.shape, lambda i, ids: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [id_block] * 8,
        out_specs=[id_block] * 4,
        scratch_shapes=[
            pltpu.VMEM((4 * win_rows, max(win_u, 128)), jnp.bfloat16),
        ],
    )
    # operand numbering for aliasing counts the scalar-prefetch arg:
    # 0 ids, 1 chans, 2-5 coords/masks, 6-9 the aliased planes
    outs = pl.pallas_call(
        partial(_rewarp_kernel_stats, ii=ii, iw=iw, iw_pad=iw_pad,
                win_rows=win_rows, win_u=win_u),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(((n_tiles + 1) * 8, 128), jnp.float32)
        ] * 4,
        input_output_aliases={6 + j: j for j in range(4)},
    )(ids, chans_b, av_pp, bu_pp, ok_pp, box_pp, *base)
    return [o[:-8] for o in outs]


def mxu_stats_eligible(ii: int) -> bool:
    """True when the in-kernel stats warp can run a (4, ii, ii)
    intermediate (VMEM residency, same budget as the plain MXU path)."""
    iw_pad = 1 << (ii - 1).bit_length()
    return _MXU and 4 * ii * iw_pad * 2 <= _MXU_VMEM_CAP


@partial(jax.jit, static_argnames=("height", "width", "adaptive"))
def warp_stats_packed(chans, av_p, bu_p, ok_p, box_p, height, width,
                      adaptive=True):
    """Stats-contract warp: (4, I, I) rgb+curvature channels warped at the
    packed coords -> [r, g, b, stats] packed planes, with the rgb
    ok-masked in-kernel and every per-tile scoring ingredient reduced into
    the stats plane (see STAT_* rows). Two-pass adaptive windows like
    warp_bilinear_packed. Caller must check :func:`mxu_stats_eligible`."""
    n_ch, ii, iw = chans.shape
    assert n_ch == 4, n_ch
    iw_pad = 1 << (iw - 1).bit_length()
    if iw_pad != iw:
        chans = jnp.pad(chans, ((0, 0), (0, 0), (0, iw_pad - iw)))
    n_tiles = av_p.shape[0] // 8
    block = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    win1 = min(_win_rows(ii, height, width), max((ii // 8) * 8, 8), ii)
    win1_u = min(128, iw_pad)
    win2, win2_u = _rewarp_window(ii, iw_pad)
    use2 = (_ADAPTIVE and adaptive and (win2 > win1 or win2_u > win1_u))

    chans_b = _lane_blocked(chans.astype(jnp.bfloat16))
    outs = pl.pallas_call(
        partial(_warp_kernel_mxu_stats, ii=ii, iw=iw, iw_pad=iw_pad,
                win_rows=win1, win_u=win1_u),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(chans_b.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [block] * 4,
        out_specs=[block] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * 8, 128), jnp.float32)
        ] * 4,
        scratch_shapes=[
            pltpu.VMEM((4 * win1, max(win1_u, 128)), jnp.bfloat16),
        ],
    )(chans_b, av_p, bu_p, ok_p, box_p)
    if use2:
        outs = _rewarp_overflow_tiles_stats(
            chans_b, av_p, bu_p, ok_p, box_p, outs,
            ii, iw, iw_pad, win2, win2_u,
        )
    return outs


def _rewarp_kernel(ids_ref, chans_ref, avr, bur, hitr, *rest, n_out, **kw):
    """Compact re-warp wrapper: drop the scalar-prefetch ids ref and the
    n_out ALIASED input plane refs (the output refs are the same memory);
    the body is the plain MXU warp kernel at the big window."""
    return _warp_kernel_mxu(chans_ref, avr, bur, hitr, *rest[n_out:], **kw)


def _rewarp_overflow_tiles(chans_b, av_p, bu_p, hit_p, planes,
                           ii, iw, iw_pad, win_rows, win_u, n_ch):
    """Second warp pass over the tiles whose pass-1 window overflowed:
    rank tiles by their overflow-pixel count, re-warp the top
    ``_REWARP_CAP`` with the (win_rows, win_u) BIG window in a compact
    id-indexed grid, and write the results IN PLACE over the pass-1
    planes via output aliasing (the exact re-march's machinery,
    march_bonsai.render_bonsai_tiles_into). ``planes`` is the list of
    n_ch pass-1 channel planes + the pass-1 overflow plane; the returned
    planes have re-warped tiles' channels AND overflow flags replaced
    (a tile still exceeding the big window stays flagged for the
    hybrid's exact re-march)."""
    n_tiles = av_p.shape[0] // 8
    n_sel = min(_REWARP_CAP, n_tiles)
    ovf1 = planes[n_ch]
    counts = ovf1.reshape(n_tiles, 8, 128).sum(axis=(1, 2))
    vals, ids = jax.lax.top_k(counts, n_sel)
    ids = jnp.where(vals > 0.0, ids, n_tiles).astype(jnp.int32)

    # one extra trailing tile block receives parked ids' writes (zeros —
    # the pad coords/hit are zero, so the kernel's all-miss branch runs)
    pad8 = ((0, 8), (0, 0))
    base = [jnp.pad(p, pad8) for p in planes]
    av_pp, bu_pp, hit_pp = (jnp.pad(x, pad8) for x in (av_p, bu_p, hit_p))

    n_out = n_ch + 1
    id_block = pl.BlockSpec(
        (8, 128), lambda i, ids: (ids[i], 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_sel,),
        in_specs=[
            pl.BlockSpec(chans_b.shape, lambda i, ids: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [id_block] * (3 + n_out),
        out_specs=[id_block] * n_out,
        scratch_shapes=[
            pltpu.VMEM((n_ch * win_rows, max(win_u, 128)), jnp.bfloat16),
        ],
    )
    # operand numbering for aliasing counts the scalar-prefetch arg:
    # 0 ids, 1 chans, 2-4 coords/hit, 5.. the n_out base planes
    outs = pl.pallas_call(
        partial(_rewarp_kernel, ii=ii, iw=iw, iw_pad=iw_pad,
                win_rows=win_rows, win_u=win_u, n_ch=n_ch, want_ovf=True,
                n_out=n_out),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(((n_tiles + 1) * 8, 128), jnp.float32)
        ] * n_out,
        input_output_aliases={5 + j: j for j in range(n_out)},
    )(ids, chans_b, av_pp, bu_pp, hit_pp, *base)
    return [o[:-8] for o in outs]


@partial(jax.jit, static_argnames=("height", "width", "win_rows", "win_u",
                                   "with_overflow", "adaptive"))
def warp_bilinear_packed(chans, av_p, bu_p, hit_p, height, width,
                         win_rows=None, win_u=128, with_overflow=False,
                         adaptive=True):
    """Packed-layout warp core: coords/mask arrive AND results leave in the
    (n_tiles*8, 128) tile packing of march_bonsai._pack_tiles — the layout
    the kernel works in anyway. The hybrid renderer stays in this layout
    end-to-end (score, re-march, merge) and unpacks once at the very end:
    each avoided full-frame relayout measured ~0.07-0.1 ms at 1024^2
    (round-3 intercept decomposition, tools/fit_budget_slope.py).

    Returns a list of ``n_ch`` packed planes, plus a packed overflow plane
    appended when ``with_overflow`` (1.0 at participating pixels whose
    taps exceeded the window and were edge-clamped).

    With ``adaptive`` (default) the MXU path IGNORES the caller's window
    and runs TWO passes: the whole frame at the cheap default window,
    then a compact id-indexed re-warp of the overflowed tiles at the
    maximum (128, 256) window (``_rewarp_overflow_tiles``). Footprints
    are pose-dependent AND heavy-tailed (bench pose: 128 of 592 hit
    tiles exceed the 40-row default; a global (128, 256) window costs
    >10x the per-tile warp matmul FLOPs of the default) — the two-pass
    form prices the tail at ~cap * microseconds instead of sizing the
    whole frame for it. The scan fallback (large intermediates) keeps
    the caller's pose-hint window. Pass ``adaptive=False`` to probe a
    specific static window (tests, A/B timing)."""
    n_ch, ii, iw = chans.shape
    # pltpu.roll with a traced shift SILENTLY corrupts on non-power-of-two
    # lane widths (probed: 384 wrong, 256/512 exact) — pad columns up
    iw_pad = 1 << (iw - 1).bit_length()
    if iw_pad != iw:
        chans = jnp.pad(chans, ((0, 0), (0, 0), (0, iw_pad - iw)))
    if not win_rows:
        win_rows = _win_rows(ii, height, width)
    win_rows = min(win_rows, max((ii // 8) * 8, 8), ii)
    win_u = min(win_u, iw_pad)

    n_tiles = av_p.shape[0] // 8
    block = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    n_out = n_ch + (1 if with_overflow else 0)
    if _MXU and n_ch * ii * iw_pad * 2 <= _MXU_VMEM_CAP:
        win2, win2_u = _rewarp_window(ii, iw_pad)
        if _ADAPTIVE and adaptive:
            win1 = min(_win_rows(ii, height, width),
                       max((ii // 8) * 8, 8), ii)
            win1_u = min(128, iw_pad)
        else:
            win1, win1_u = win_rows, win_u
        use2 = (_ADAPTIVE and adaptive
                and (win2 > win1 or win2_u > win1_u))
        if not use2:
            win1, win1_u = win_rows, win_u
        want1 = with_overflow or use2
        n_out1 = n_ch + (1 if want1 else 0)
        chans_b = _lane_blocked(chans.astype(jnp.bfloat16))
        outs = pl.pallas_call(
            partial(_warp_kernel_mxu, ii=ii, iw=iw, iw_pad=iw_pad,
                    win_rows=win1, win_u=win1_u, n_ch=n_ch,
                    want_ovf=want1),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(chans_b.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [block] * 3,
            out_specs=[block] * n_out1,
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles * 8, 128), jnp.float32)
            ] * n_out1,
            scratch_shapes=[
                pltpu.VMEM((n_ch * win1, max(win1_u, 128)), jnp.bfloat16),
            ],
        )(chans_b, av_p, bu_p, hit_p)
        if use2:
            outs = _rewarp_overflow_tiles(
                chans_b, av_p, bu_p, hit_p, outs,
                ii, iw, iw_pad, win2, win2_u, n_ch,
            )
        return outs if n_out == len(outs) else outs[:n_out]

    band_rows = min(ii, win_rows + BAND_STRIDE)
    nb = 1 if ii <= band_rows else cdiv(ii - band_rows, BAND_STRIDE) + 1

    # banded copies of the intermediate (DMA supports scalar leading index
    # only): band b = rows [16b, 16b + band_rows). bf16 halves the per-tile
    # window DMA; the composited radiance tolerates 0.4% in fast mode
    pad_rows = (nb - 1) * BAND_STRIDE + band_rows
    cp = jnp.pad(chans.astype(_CH_DTYPE), ((0, 0), (0, pad_rows - ii), (0, 0)))
    bands = jnp.stack(
        [cp[:, b * BAND_STRIDE : b * BAND_STRIDE + band_rows, :]
         for b in range(nb)]
    )  # (nb, C, band_rows, I)

    return pl.pallas_call(
        partial(_warp_kernel, ii=ii, iw=iw, iw_pad=iw_pad,
                win_rows=win_rows, band_rows=band_rows, nb=nb, n_ch=n_ch,
                want_ovf=with_overflow),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [block] * 3,
        out_specs=[block] * n_out,
        out_shape=[jax.ShapeDtypeStruct((n_tiles * 8, 128),
                                        jnp.float32)] * n_out,
        scratch_shapes=[
            pltpu.VMEM((n_ch, band_rows, iw_pad), _CH_DTYPE),
            pltpu.VMEM((n_ch * win_rows + 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(bands, av_p, bu_p, hit_p)


def warp_bilinear_pallas(chans, av, bu, hit=None, win_rows=None, win_u=128,
                         with_overflow=False, adaptive=True):
    """(C<=4, I, I) channels sampled at (H, W) coords -> (C, H, W).
    ``hit`` (H, W) bool optionally restricts the per-tile sampling window
    to participating pixels (see module docstring).

    ``win_rows``/``win_u`` override the static window size (pose-dependent
    footprints: see ops.shear_warp.pose_hint; the banded scan fallback
    caps win_u at 128 lanes — wider u footprints flag instead). With
    ``with_overflow=True`` returns (planes, ovf) where ovf (H, W) f32 is
    1.0 at hit pixels whose taps exceeded the window and were edge-clamped
    (both paths). Unpacked-layout wrapper around warp_bilinear_packed."""
    n_ch = chans.shape[0]
    height, width = av.shape
    ph = cdiv(height, TILE) * TILE
    pw = cdiv(width, TILE) * TILE

    def pack(x):
        return _pack_tiles(
            jnp.pad(x, ((0, ph - height), (0, pw - width))), ph, pw
        )

    hitf = (jnp.ones(av.shape, jnp.float32) if hit is None
            else hit.astype(jnp.float32))
    outs = warp_bilinear_packed(chans, pack(av), pack(bu), pack(hitf),
                                height, width, win_rows, win_u,
                                with_overflow, adaptive)
    planes = [_unpack_tiles(o, ph, pw)[:height, :width] for o in outs[:n_ch]]
    if with_overflow:
        ovf = _unpack_tiles(outs[n_ch], ph, pw)[:height, :width]
        return jnp.stack(planes), ovf
    return jnp.stack(planes)
