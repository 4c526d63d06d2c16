"""Hybrid bonsai renderer: fast shear-warp frame + exact re-march of
silhouette-flagged tiles.

The fast mode's error is CONCENTRATED: the dominant term is the final
homography warp's bilinear reconstruction of composited colors across
silhouette discontinuities, plus side-entry sample phase — both live on a
small set of high-contrast screen tiles (tools/hybrid_design.py, round 3:
reaching mean err <= 8e-4 at 1024^2 needs the worst 0.1-10% of 32x32
tiles replaced; a screen-space contrast ranking finds them within ~1.5x
of the oracle ranking). So:

1. render the whole frame with the MXU shear-warp path (ops.shear_warp),
   in linear color;
2. score every 32x32 tile by its local contrast (|dx| + |dy| of the
   linear luminance, tile-mean) — silhouettes and volume edges rank top;
3. re-march the top ``budget`` tiles whose score clears ``thresh`` with
   the EXACT Pallas slab-march (ops.pallas.march_bonsai
   .render_bonsai_tiles_pallas) and scatter the exact pixels over the
   fast frame (padded selections point at an all-miss tile and drop on
   scatter).

The result keeps the fast mode's throughput scaling (exact work ~ budget,
not frame area) while the measured error meets the <= 1e-3 budget vs the
oracle (PARITY_REPORT.md). Matches shaders/raycast_naive.wgsl:84-125.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vokselis_tpu.core.colors import linear_to_srgb
from vokselis_tpu.ops.pallas.march_bonsai import (
    MAX_STEPS_BONSAI,
    TILE,
    _render_bonsai_pallas,
    _unpack_tiles,
    auto_win_rows,
    pick_tiles_per_step,
    prepare_volume,
    render_bonsai_tiles_into,
)
from vokselis_tpu.ops.pallas.warp2d import (
    STAT_CURV,
    STAT_EDGE,
    STAT_EXT,
    STAT_OVF,
    STAT_PEAK,
    mxu_stats_eligible,
)
from vokselis_tpu.ops.shear_warp import (
    _render_fast,
    pose_hint,
    prepare_fast_volume,
    traced_degenerate,
)
from vokselis_tpu.utils.grid import cdiv

# tile-score threshold below which a tile is never re-marched (score =
# tile-mean warped curvature x sRGB slope — see _render_hybrid): easy
# poses spend near-zero exact work while hard poses fill the budget
DEFAULT_THRESH = 1e-3
DEFAULT_BUDGET = 128

# Volume-density fallback (VERDICT round-3 #4, measured round 4 on
# volume/io.dense_stress's 50%-occupancy fog, tools/dense_stress_probe):
# the hybrid's error model assumes the fast frame's error CONCENTRATES on
# a small set of silhouette tiles, but on dense fog it is DIFFUSE —
# hybrid budget=64 measured 3.6e-3 (bench pose) / 6.2e-3 (z1.0-axis) vs
# the exact kernel, and no budget fixes a diffuse field (the exact kernel
# itself runs 57.9 ms there). Volumes whose occupied-voxel fraction
# (density > shear_resample.OCC_EPS) exceeds this cutoff route every
# frame to the exact kernel at PREP time: bonsai measures 0.054, the fog
# 0.41 — the cutoff sits far from both.
DENSE_OCC_FRAC = 0.25

# A/B switch for the pair-fused re-march (VOK_HYBRID_PAIR=0 to disable)
_PAIR = os.environ.get("VOK_HYBRID_PAIR", "1") == "1"

# Pair RANKING objective (VOK_PAIR_RANK=max for the old behavior). The
# sweep/bench gate is per-pose MEAN error, and pair scores are per-tile
# mean-error estimates, so greedy mean-error reduction ranks pairs by the
# SUM of member scores — worst-member ranking spends half of every pair's
# budget on whatever tile happens to sit next to a bad one. Measured
# round 4 (tools/pair_rank_probe, budget 64 / I=512, bench + the sweep's
# 3 worst poses): sum beats max on all four (bench 6.61e-4 -> 6.17e-4;
# worst pose 1.246e-3 -> 1.146e-3) — a uniform but small win.
_PAIR_RANK_SUM = os.environ.get("VOK_PAIR_RANK", "sum") == "sum"


def _pair_mode(dims: int, width: int, height: int, cap: int) -> bool:
    """True when the re-march should fuse tile pairs: even tile row width
    (raster-consecutive ids must be horizontal neighbors) and a pair slab
    window that fits the cap (same gate as the full-frame kernel's
    fusion, pick_tiles_per_step)."""
    return (_PAIR and cdiv(width, TILE) % 2 == 0
            and pick_tiles_per_step(dims, width, height, cap) == 2)


def select_units(scores, n_tiles: int, budget: int, thresh: float,
                 pair: bool):
    """Pick the re-march unit ids from per-tile scores (traced math).

    Single-tile mode: top ``budget`` tiles above ``thresh``; below-thresh
    picks park at the ``n_tiles`` sentinel (the kernel's pad row-block).

    Pair mode (ids index PAIRS of raster-consecutive tiles): rank by the
    SUM of member scores — the sweep/bench gate is per-pose MEAN error
    and pair scores are per-tile mean-error estimates, so greedy
    mean-error reduction per grid step ranks pairs by their summed
    members; worst-member ranking spends half of every pair's budget on
    whatever tile sits next to a bad one (VOK_PAIR_RANK=max restores it).
    The threshold still gates on the WORST member so a pair with one
    above-thresh tile qualifies; parked sentinel is ``n_tiles // 2``.
    """
    if pair:
        n_units = n_tiles // 2
        # budget is a hard cap in TILES: odd budgets round DOWN one tile
        # (advisor, round 4 — cdiv exceeded the cap by one); budget 1
        # still buys one pair, or selection would be empty
        budget_u = min(max(budget // 2, 1), n_units)
        pair_scores = scores.reshape(n_units, 2)
        rank = pair_scores.sum(axis=1) if _PAIR_RANK_SUM \
            else pair_scores.max(axis=1)
        _, ids = jax.lax.top_k(rank, budget_u)
        gate = pair_scores.max(axis=1)[ids]
        return jnp.where(gate > thresh, ids, n_units)
    budget = min(budget, n_tiles)  # small frames: top_k k must fit
    vals, ids = jax.lax.top_k(scores, budget)
    return jnp.where(vals > thresh, ids, n_tiles)


def _dilate3(t):
    """3x3 max filter over the (ny, nx) tile grid (content proximity for
    the extent-excluded channel). The grid is ~32x32 floats — negligible."""
    p = jnp.pad(t, 1)
    h, w = t.shape
    return jnp.max(
        jnp.stack([p[i:i + h, j:j + w] for i in range(3) for j in range(3)]),
        axis=0,
    )


def _packed_edge(x):
    """|d/dcol| + |d/drow| of a (n_tiles*8, 128) PACKED plane, within-tile
    only. Packed element (s, l) of a tile is image row ``(s%8)*4 + l//32``,
    col ``l%32`` (march_bonsai._pack_tiles), so the left neighbor is one
    lane over (masked at within-tile col 0) and the row-above neighbor is
    32 lanes over — or, for image rows 0 mod 4, one sublane up and 96
    lanes forward. Cross-tile diffs are dropped (tiles aren't adjacent in
    memory): the edge channel is a 0.03-weighted selection heuristic and
    the score lab measured edge-weight insensitivity, while staying packed
    avoids two full-frame relayouts."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    prev_col = jnp.pad(x, ((0, 0), (1, 0)))[:, :-1]
    cd = jnp.where(lane % 32 == 0, 0.0, jnp.abs(x - prev_col))
    prev_lane32 = jnp.pad(x, ((0, 0), (32, 0)))[:, :-32]
    prev_sub = jnp.pad(x, ((1, 0), (0, 0)))[:-1]
    prev_sub96 = jnp.pad(prev_sub, ((0, 0), (0, 96)))[:, 96:]
    prev_row = jnp.where(lane >= 32, prev_lane32, prev_sub96)
    rd = jnp.where((sub % 8 == 0) & (lane < 32), 0.0,
                   jnp.abs(x - prev_row))
    return cd + rd


@partial(
    jax.jit,
    static_argnames=("width", "height", "intermediate", "budget", "srgb",
                     "dims", "win_rows", "band_rows", "nb", "bstride",
                     "max_steps", "warp_win", "warp_wu", "pair"),
)
def _render_hybrid(
    packs,
    layouts,
    camera_uniform,
    thresh,
    width: int,
    height: int,
    intermediate: int,
    budget: int,
    srgb: bool,
    dims: int,
    win_rows: int,
    band_rows: int,
    nb: int,
    bstride: int,
    max_steps: int = MAX_STEPS_BONSAI,
    warp_win: int = 0,
    warp_wu: int = 128,
    pair: bool = False,
):
    # 1. fast frame in LINEAR color (srgb once, after the merge), in the
    # PACKED (n_tiles*8, 128) tile layout the warp kernel and the
    # re-march kernel both work in — scoring, selection, and the merge
    # never touch the unpacked frame, so the only full-frame relayout in
    # the hybrid is the single unpack at the end (round-2 pipeline paid 8
    # extra packs/unpacks; intercept decomposition, round 3).
    # Contract (see _warp_to_screen): with the MXU stats warp eligible,
    # the kernel reduces EVERY scoring ingredient to one per-tile stats
    # plane in-kernel ("stats", round 4 — kills the measured ~1.0-1.4 ms
    # aux tax + ~0.5 ms XLA scoring of the round-3 packed contract);
    # otherwise the packed per-pixel contract: ok-masked linear rgb, the
    # ok mask, warped-curvature density, overflow flags, box-hit mask.
    use_stats = (jax.default_backend() != "tpu"
                 or mxu_stats_eligible(intermediate))
    if use_stats:
        rgbp, statsp = _render_fast(
            packs, camera_uniform, width, height, intermediate, False,
            warp_win=warp_win, warp_wu=warp_wu, return_aux="stats")
    else:
        rgbp, okp, errdp, ovfp, hitp = _render_fast(
            packs, camera_uniform, width, height, intermediate, False,
            warp_win=warp_win, warp_wu=warp_wu, return_aux="packed")
    # tile grid over the PADDED frame so n_tiles (and the parked-id
    # sentinel) matches render_bonsai_tiles_into's cdiv-based count at
    # non-multiple-of-32 sizes (e.g. the 1280x720 default); padded pixels
    # are non-ok -> zero rgb/errd, diluting partial tiles proportionally
    ph = cdiv(height, TILE) * TILE
    pw = cdiv(width, TILE) * TILE
    ny, nx = ph // TILE, pw // TILE
    n_tiles = ny * nx

    def finish(planes3):
        merged = [_unpack_tiles(p, ph, pw)[:height, :width] for p in planes3]
        out = jnp.stack(merged, axis=-1)
        if srgb:
            out = linear_to_srgb(out)
        alpha = jnp.ones((height, width, 1), jnp.float32)
        return jnp.concatenate([out, alpha], axis=-1)

    # traced pose-quality flag: TRUE when the shear-warp factorization is
    # degenerate at this pose (eye in the slab range / s_near collapse) and
    # the frame needs the exact kernel instead — computable under an outer
    # jit where the host-side pose_hint ladder cannot run (round-3 review:
    # functional-API fori loops silently rendered 5e-3 zoom-0.6 frames)
    degraded = traced_degenerate(camera_uniform, dims)

    if budget == 0:  # pure fast frame: no tile scoring, no zero-grid call
        return finish(rgbp), jnp.int32(0), degraded

    # 2. per-tile score = warped reconstruction-error density (the
    # intermediate's curvature sampled at each pixel's own tap — a direct
    # bound on the bilinear warp's error, not a screen-space heuristic),
    # converted to the sRGB scale the error budget is measured in via the
    # transfer's local slope (gamma amplifies dark-region differences up
    # to 12.92x), plus a small within-tile contrast term for the
    # side-entry sample-phase error the curvature field cannot see.
    # Degraded-pixel channels (extent exclusions and window overflows)
    # rank CONTINUOUSLY, weighted by the dilated neighborhood's peak
    # luminance (a degraded pixel only differs from the exact march near
    # actual content) — a hard 1e3 boost lets content-free degraded tiles
    # soak the whole budget (offline score lab, round 3: worst-pose
    # budget for 8e-4 fell 138 -> 66 vs the oracle ranking's 59).
    inv_px = 1.0 / (8 * 128)
    if use_stats:
        # the warp kernel already reduced every ingredient per tile
        st = statsp.reshape(n_tiles, 8, 128)[:, :, 0]  # (n_tiles, 8)
        scores = (st[:, STAT_CURV] + 0.03 * st[:, STAT_EDGE]) * inv_px
        tile_peak = _dilate3(st[:, STAT_PEAK].reshape(ny, nx))
        degr = ((st[:, STAT_EXT] + 4.0 * st[:, STAT_OVF]) * inv_px)
        scores = scores + (degr.reshape(ny, nx) * tile_peak).reshape(-1)
    else:
        rp, gp, bp = rgbp
        lum = jnp.maximum((rp + gp + bp) * (1.0 / 3.0), 1e-6)
        srgb_slope = jnp.where(
            lum > 0.0031308, (1.055 / 2.4) * lum ** (1.0 / 2.4 - 1.0), 12.92
        )
        lums = (linear_to_srgb(jnp.maximum(rp, 0.0))
                + linear_to_srgb(jnp.maximum(gp, 0.0))
                + linear_to_srgb(jnp.maximum(bp, 0.0))) * (1.0 / 3.0)
        edge = _packed_edge(lums)

        def ptile_mean(x):
            # (n_tiles*8, 128) -> (n_tiles, 8, 128) is a free leading-dim
            # split; reducing both trailing axes needs no relayout
            return x.reshape(n_tiles, 8, 128).mean(axis=(1, 2))

        scores = ptile_mean(errdp * srgb_slope) + 0.03 * ptile_mean(edge)
        ext_frac = ptile_mean(hitp * (1.0 - okp)).reshape(ny, nx)
        ovf_frac = ptile_mean(okp * ovfp).reshape(ny, nx)
        tile_peak = (lums.reshape(n_tiles, 8, 128).max(axis=(1, 2))
                     .reshape(ny, nx))
        # content proximity: a tile's own peak or any 8-neighbor's peak
        tile_peak = _dilate3(tile_peak)
        scores = scores + ((ext_frac + 4.0 * ovf_frac) * tile_peak).reshape(-1)

    # selection granularity: with ``pair`` the re-march fuses two
    # horizontally-adjacent tiles per grid step (the full-frame kernel's
    # tps=2 trick — per-step scalar machinery, band DMAs and window
    # conversion amortize over both tiles), so selection runs over PAIRS;
    # budget stays counted in TILES.
    tps_r = 2 if pair else 1
    ids = select_units(scores, n_tiles, budget, thresh, pair)

    # 3. exact re-march of the selected tiles, written IN PLACE over the
    # packed fast planes via Pallas output aliasing (an XLA scatter here
    # measured multi-ms — TPU scatters serialize). The pad unit row-block
    # receives parked ids' writes and is sliced off before the unpack.
    base = tuple(jnp.pad(p, ((0, 8 * tps_r), (0, 0))) for p in rgbp)
    # fast_transfer: the re-march evaluates the vertigo palette through
    # its Chebyshev polynomials (alpha exact, colors <= 1.4e-6 — far
    # under this renderer's 1e-3 contract); the three cosines measured
    # ~27 vector-op equivalents each in the composite's ablation and the
    # march pays them per slab step on the DENSEST tiles of the frame
    planes, ovf = render_bonsai_tiles_into(
        layouts, base, camera_uniform, ids, width, height, dims, max_steps,
        win_rows, band_rows, nb, bstride, tiles_per_step=tps_r,
        fast_transfer=True,
    )
    return finish([p[:-8 * tps_r] for p in planes]), ovf, degraded


class HybridBonsaiRenderer:
    """renderer="hybrid": shear-warp frame + exact re-march of the worst
    tiles. Call like BonsaiRenderer; ``last_overflow`` mirrors the exact
    kernel's window-overflow signal for the re-marched tiles."""

    def __init__(self, vol_u8, intermediate: int = 512,
                 budget: int = DEFAULT_BUDGET, thresh: float = DEFAULT_THRESH,
                 win_cap: int = 128):
        vol_u8 = np.asarray(vol_u8)
        self.packs = prepare_fast_volume(vol_u8)
        (self.dims, self.band_rows, self.nb, self.bstride), self.layouts = (
            prepare_volume(vol_u8, win_cap)
        )
        self.win_cap = win_cap
        self.intermediate = intermediate
        self.budget = budget
        self.thresh = thresh
        self.last_overflow = 0
        # dense volumes break the concentrated-error model (see
        # DENSE_OCC_FRAC): route every pose to the exact kernel
        from vokselis_tpu.ops.pallas.shear_resample import OCC_EPS

        # integer-space threshold (advisor, round 4): u8 > OCC_EPS*255 is
        # exactly (u8/255 > OCC_EPS) without a ~540 MB float temporary on
        # a 512^3 volume — only the bool result allocates
        self.occ_frac = float((vol_u8 > OCC_EPS * 255.0).mean())
        self.dense_fallback = self.occ_frac > DENSE_OCC_FRAC

    def _call_traced(self, camera_uniform, width: int = 1280,
                     height: int = 720, max_steps: int = MAX_STEPS_BONSAI,
                     srgb: bool = True, budget: int | None = None,
                     hint=None):
        """Pure (img, ovf) form — safe to call under an outer jit trace
        (no attribute mutation). Degenerate poses (shear-warp factorization
        breaks: eye inside/near the slab range, or close-up magnification —
        see ops.shear_warp.pose_hint) fall back to the EXACT full-frame
        kernel, so the hybrid's error contract holds at every pose; the
        hint (and so the fallback) only engages when the camera uniform is
        concrete — under an outer trace the fast path is used as-is unless
        the caller pins a concrete ``hint=(warp_win, warp_wu, degenerate)``
        (e.g. a frame loop jitted around a known pose)."""
        if self.dense_fallback:
            tps = pick_tiles_per_step(self.dims, width, height,
                                      cap=self.win_cap)
            ewin = min(auto_win_rows(self.dims, width, height, tps),
                       self.win_cap)
            return _render_bonsai_pallas(
                self.layouts, camera_uniform, width, height, self.dims,
                max_steps, srgb, ewin, self.band_rows, self.nb,
                self.bstride, tps,
            )
        wwin, wwu, degen = (hint if hint is not None else
                            pose_hint(camera_uniform, width, height,
                                      self.intermediate, self.dims))
        ii = self.intermediate
        escalated = False
        if degen and hint is None:
            # magnification-degenerate poses may become representable at a
            # larger intermediate (the bf16-resident MXU stats warp fits
            # I=1024 since the round-5 VMEM-cap raise): ~2-4x the fast
            # frame's cost instead of the exact kernel's ~10x.
            # Eye-in-slab-range poses stay degenerate at any I. Steps
            # below the base intermediate are skipped (escalation must
            # RAISE resolution).
            for ii_up in (ii2 for ii2 in (768, 1024) if ii2 > ii):
                w2, u2, d2 = pose_hint(camera_uniform, width, height,
                                       ii_up, self.dims)
                if not d2:
                    wwin, wwu, degen, ii = w2, u2, False, ii_up
                    escalated = True
                    break
        from vokselis_tpu.ops.pallas.warp2d import mxu_adaptive_eligible

        if not degen and mxu_adaptive_eligible(4, ii):
            # the adaptive MXU warp sizes windows itself (two-pass;
            # warp2d._rewarp_overflow_tiles): collapse the pose-hint
            # window buckets to the ONE default jit variant
            wwin, wwu = 0, 128
        if degen:
            tps = pick_tiles_per_step(self.dims, width, height,
                                      cap=self.win_cap)
            ewin = min(auto_win_rows(self.dims, width, height, tps),
                       self.win_cap)
            return _render_bonsai_pallas(
                self.layouts, camera_uniform, width, height, self.dims,
                max_steps, srgb, ewin, self.band_rows, self.nb,
                self.bstride, tps,
            )
        pair = _pair_mode(self.dims, width, height, self.win_cap)
        win = min(auto_win_rows(self.dims, width, height, 2 if pair else 1),
                  self.win_cap)
        b = self.budget if budget is None else budget
        if escalated:
            # escalation poses are intrinsically harder (close-up
            # magnification): measured at budget 64 / I=768 they sit at
            # 1.1-1.25e-3 with the pair-fused re-march (the pair
            # granularity spends ~1/3 of the budget on low-score partners
            # — tools/pair_tradeoff_probe, round 4) while every
            # non-escalated pose clears <=1e-3. +50% budget on exactly
            # these poses restores the sweep-wide contract without
            # touching the bench-pose op point; they already pay a
            # separate jit variant for I=768, so no new variant cost.
            b = b + (b + 1) // 2
        img, ovf, _deg = _render_hybrid(
            self.packs, self.layouts, camera_uniform,
            jnp.float32(self.thresh), width, height, ii,
            b, srgb, self.dims, win,
            self.band_rows, self.nb, self.bstride, max_steps,
            wwin, wwu, pair,
        )
        return img, ovf

    def functional(self):
        """(render, pack) pair for OUTER-JIT callers (fori frame loops):
        ``render(pack, camera_uniform, width, height, hint=None, ...)``
        -> (img, ovf, degraded) with the volume packs/layouts travelling
        as jit ARGUMENTS. Calling ``_call_traced`` under an outer trace
        instead closes over ~100 MB of layouts as HLO constants, which
        this environment's HTTP remote-compile hop rejects outright (413).
        The degenerate-pose EXACT fallback cannot run under a trace, so
        the TRACED ``degraded`` flag (ops.shear_warp.traced_degenerate)
        is part of the DEFAULT return (round-4 verdict: it must be
        unmissable): True marks frames whose pose breaks the shear-warp
        factorization (eye in the slab range / s_near close-up) — consume
        it (re-render exact, or discard) instead of trusting the pixels.
        Callers that pre-validate their poses with pose_hint may opt out
        with ``with_degraded=False``."""
        pack = (self.packs, self.layouts)

        if self.dense_fallback:
            # volume density is a PREP-time property: the functional
            # renderer for a dense volume IS the exact kernel (same
            # signature; degraded flag is constant False — frames are
            # exact by construction)
            def render_exact(pk, camera_uniform, width, height, hint=None,
                             max_steps=MAX_STEPS_BONSAI, srgb=True,
                             budget=None, with_degraded=True):
                _packs, layouts = pk
                tps = pick_tiles_per_step(self.dims, width, height,
                                          cap=self.win_cap)
                ewin = min(auto_win_rows(self.dims, width, height, tps),
                           self.win_cap)
                img, ovf = _render_bonsai_pallas(
                    layouts, camera_uniform, width, height, self.dims,
                    max_steps, srgb, ewin, self.band_rows, self.nb,
                    self.bstride, tps,
                )
                if with_degraded:
                    return img, ovf, jnp.bool_(False)
                return img, ovf

            return render_exact, pack

        def render(pk, camera_uniform, width, height, hint=None,
                   max_steps=MAX_STEPS_BONSAI, srgb=True, budget=None,
                   with_degraded=True):
            packs, layouts = pk
            wwin, wwu = (0, 128) if hint is None else (hint[0], hint[1])
            pair = _pair_mode(self.dims, width, height, self.win_cap)
            win = min(auto_win_rows(self.dims, width, height,
                                    2 if pair else 1), self.win_cap)
            out = _render_hybrid(
                packs, layouts, camera_uniform, jnp.float32(self.thresh),
                width, height, self.intermediate,
                self.budget if budget is None else budget, srgb, self.dims,
                win, self.band_rows, self.nb, self.bstride, max_steps,
                wwin, wwu, pair,
            )
            return out if with_degraded else out[:2]

        return render, pack

    def __call__(self, camera_uniform, width: int = 1280, height: int = 720,
                 max_steps: int = MAX_STEPS_BONSAI, srgb: bool = True,
                 budget: int | None = None):
        img, ovf = self._call_traced(camera_uniform, width, height,
                                     max_steps, srgb, budget)
        self.last_overflow = ovf
        return img


def build_hybrid_renderer(vol_u8, intermediate: int = 512,
                          budget: int = DEFAULT_BUDGET,
                          thresh: float = DEFAULT_THRESH, win_cap: int = 128):
    """Functional (render, pack) pair: render(pack, cam, width, height)
    -> ``(img, degraded)`` with img (H, W, 4); the pack tuple travels as
    jit arguments.

    Built for jit pipelines where the camera is TRACED, so the host-side
    pose classification cannot run — render() takes an optional concrete
    ``hint=(warp_win, warp_wu, degenerate_ignored)`` (from
    ops.shear_warp.pose_hint at a representative pose) and otherwise uses
    the default warp windows with NO degenerate-pose exact fallback.
    Degenerate poses (eye in the slab range, close-up magnification — see
    pose_hint) degrade beyond what the budgeted re-march repairs, so the
    TRACED ``degraded`` flag is an unconditional part of the return
    (round-4 verdict: no public hybrid entry point may render a
    degenerate pose without a signal): when it is True the pixels are
    outside the error contract — re-render via the exact kernel or drop
    the frame. Use :class:`HybridBonsaiRenderer` when the pose is
    concrete, which escalates/falls back automatically."""
    r = HybridBonsaiRenderer(vol_u8, intermediate, budget, thresh, win_cap)
    pack = (r.packs, r.layouts)

    if r.dense_fallback:
        render_exact, pack = r.functional()

        def render(pk, camera_uniform, width, height,
                   max_steps=MAX_STEPS_BONSAI, srgb=True, hint=None):
            img, _ovf, deg = render_exact(pk, camera_uniform, width, height,
                                          max_steps=max_steps, srgb=srgb)
            return img, deg

        return render, pack

    def render(pk, camera_uniform, width, height,
               max_steps=MAX_STEPS_BONSAI, srgb=True, hint=None):
        packs, layouts = pk
        wwin, wwu = (0, 128) if hint is None else (hint[0], hint[1])
        pair = _pair_mode(r.dims, width, height, r.win_cap)
        win = min(auto_win_rows(r.dims, width, height, 2 if pair else 1),
                  r.win_cap)
        img, _ovf, deg = _render_hybrid(
            packs, layouts, camera_uniform, jnp.float32(thresh),
            width, height, intermediate, budget, srgb,
            r.dims, win, r.band_rows, r.nb, r.bstride, max_steps,
            wwin, wwu, pair,
        )
        return img, deg

    return render, pack
