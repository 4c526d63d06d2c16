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

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vokselis_tpu.core.colors import linear_to_srgb
from vokselis_tpu.ops.pallas.march_bonsai import (
    MAX_STEPS_BONSAI,
    TILE,
    _pack_tiles,
    _render_bonsai_pallas,
    _unpack_tiles,
    auto_win_rows,
    pick_tiles_per_step,
    prepare_volume,
    render_bonsai_tiles_into,
)
from vokselis_tpu.ops.shear_warp import (
    _render_fast,
    pose_hint,
    prepare_fast_volume,
)
from vokselis_tpu.utils.grid import cdiv

# tile-score threshold below which a tile is never re-marched (score =
# tile-mean warped curvature x sRGB slope — see _render_hybrid): easy
# poses spend near-zero exact work while hard poses fill the budget
DEFAULT_THRESH = 1e-3
DEFAULT_BUDGET = 128


@partial(
    jax.jit,
    static_argnames=("width", "height", "intermediate", "budget", "srgb",
                     "dims", "win_rows", "band_rows", "nb", "bstride",
                     "max_steps", "warp_win", "warp_wu"),
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
):
    # 1. fast frame in LINEAR color (srgb once, after the merge), plus the
    # warp's cannot-reconstruct mask (out-of-extent rays + window-overflow
    # pixels — see _warp_to_screen): those pixels are rendered black by
    # the fast path and MUST be re-marched, independent of contrast; and
    # the warped curvature field errd — the per-pixel reconstruction-error
    # density of the bilinear warp (see _warp_to_screen).
    img, bad, errd = _render_fast(packs, camera_uniform, width, height,
                                  intermediate, False, warp_win=warp_win,
                                  warp_wu=warp_wu, return_aux=True)
    rgb = img[..., :3]
    if budget == 0:  # pure fast frame: no tile scoring, no zero-grid call
        out = linear_to_srgb(rgb) if srgb else rgb
        alpha = jnp.ones((height, width, 1), jnp.float32)
        return (jnp.concatenate([out, alpha], axis=-1),
                jnp.int32(0))

    # 2. per-tile score = warped reconstruction-error density (the
    # intermediate's curvature sampled at each pixel's own tap — a direct
    # bound on the bilinear warp's error, not a screen-space heuristic),
    # converted to the sRGB scale the error budget is measured in via the
    # transfer's local slope (gamma amplifies dark-region differences up
    # to 12.92x), plus a small screen-contrast term for the side-entry
    # sample-phase error the curvature field cannot see.
    lum = jnp.maximum(rgb.mean(axis=-1), 1e-6)
    srgb_slope = jnp.where(
        lum > 0.0031308, (1.055 / 2.4) * lum ** (1.0 / 2.4 - 1.0), 12.92
    )
    lums = linear_to_srgb(jnp.maximum(rgb, 0.0)).mean(axis=-1)
    gx = jnp.abs(jnp.diff(lums, axis=1, prepend=lums[:, :1]))
    gy = jnp.abs(jnp.diff(lums, axis=0, prepend=lums[:1]))
    edge = gx + gy
    # tile grid over the PADDED frame so n_tiles (and the parked-id
    # sentinel) matches render_bonsai_tiles_into's cdiv-based count at
    # non-multiple-of-32 sizes (e.g. the 1280x720 default); padded pixels
    # score zero, diluting partial edge tiles proportionally
    ph = cdiv(height, TILE) * TILE
    pw = cdiv(width, TILE) * TILE
    ny, nx = ph // TILE, pw // TILE
    n_tiles = ny * nx

    def tile_mean(x):
        x = jnp.pad(x, ((0, ph - height), (0, pw - width)))
        return x.reshape(ny, TILE, nx, TILE).mean(axis=(1, 3)).reshape(-1)

    scores = tile_mean(errd * srgb_slope) + 0.03 * tile_mean(edge)
    # any warp-degraded pixel outranks every score (1e3 >> error
    # densities); among degraded tiles, more degraded pixels rank first.
    # (the mask is hit-gated in _warp_to_screen: a degraded pixel whose
    # ray misses the volume box is black in both fast and exact renders,
    # so boosting it burns budget on already-exact tiles — measured,
    # round 3: bench/tilt-pose errors were bit-identical from budget 16
    # to 48 because background rim tiles outranked every true silhouette)
    bad_frac = tile_mean(bad.astype(jnp.float32))
    scores = jnp.where(bad_frac > 0.0, 1e3 + bad_frac, scores)

    budget = min(budget, n_tiles)  # small frames: top_k k must fit
    vals, ids = jax.lax.top_k(scores, budget)
    ids = jnp.where(vals > thresh, ids, n_tiles)  # park below-thresh picks

    # 3. exact re-march of the selected tiles, written IN PLACE over the
    # packed fast planes via Pallas output aliasing (an XLA scatter here
    # measured multi-ms — TPU scatters serialize)
    def pack_base(x):
        p = _pack_tiles(jnp.pad(x, ((0, ph - height), (0, pw - width))), ph, pw)
        return jnp.pad(p, ((0, 8), (0, 0)))  # pad tile: parked ids land here

    base = tuple(pack_base(rgb[..., ch]) for ch in range(3))
    base = base + (jnp.zeros_like(base[0]),)
    planes, ovf = render_bonsai_tiles_into(
        layouts, base, camera_uniform, ids, width, height, dims, max_steps,
        win_rows, band_rows, nb, bstride,
    )

    merged = [_unpack_tiles(p[:-8], ph, pw)[:height, :width]
              for p in planes[:3]]
    out = jnp.stack(merged, axis=-1)
    if srgb:
        out = linear_to_srgb(out)
    alpha = jnp.ones((height, width, 1), jnp.float32)
    return jnp.concatenate([out, alpha], axis=-1), ovf


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
        wwin, wwu, degen = (hint if hint is not None else
                            pose_hint(camera_uniform, width, height,
                                      self.intermediate, self.dims))
        ii = self.intermediate
        if degen and hint is None:
            # magnification-degenerate poses may become representable at a
            # larger intermediate (the bf16-resident MXU warp fits I=768):
            # ~2.3x the fast frame's cost instead of the exact kernel's
            # ~10x. Eye-in-slab-range poses stay degenerate at any I.
            for ii_up in (768,):
                w2, u2, d2 = pose_hint(camera_uniform, width, height,
                                       ii_up, self.dims)
                if not d2:
                    wwin, wwu, degen, ii = w2, u2, False, ii_up
                    break
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
        win = min(auto_win_rows(self.dims, width, height, 1), self.win_cap)
        img, ovf = _render_hybrid(
            self.packs, self.layouts, camera_uniform,
            jnp.float32(self.thresh), width, height, ii,
            self.budget if budget is None else budget, srgb, self.dims, win,
            self.band_rows, self.nb, self.bstride, max_steps,
            wwin, wwu,
        )
        return img, ovf

    def functional(self):
        """(render, pack) pair for OUTER-JIT callers (fori frame loops):
        ``render(pack, camera_uniform, width, height, hint=None, ...)``
        -> (img, ovf) with the volume packs/layouts travelling as jit
        ARGUMENTS. Calling ``_call_traced`` under an outer trace instead
        closes over ~100 MB of layouts as HLO constants, which this
        environment's HTTP remote-compile hop rejects outright (413).
        The degenerate-pose fallback cannot run under a trace — pin a
        concrete ``hint`` from pose_hint at a representative pose."""
        pack = (self.packs, self.layouts)

        def render(pk, camera_uniform, width, height, hint=None,
                   max_steps=MAX_STEPS_BONSAI, srgb=True, budget=None):
            packs, layouts = pk
            wwin, wwu = (0, 128) if hint is None else (hint[0], hint[1])
            win = min(auto_win_rows(self.dims, width, height, 1),
                      self.win_cap)
            return _render_hybrid(
                packs, layouts, camera_uniform, jnp.float32(self.thresh),
                width, height, self.intermediate,
                self.budget if budget is None else budget, srgb, self.dims,
                win, self.band_rows, self.nb, self.bstride, max_steps,
                wwin, wwu,
            )

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
    -> (H, W, 4); the pack tuple travels as jit arguments.

    WARNING: built for jit pipelines where the camera is TRACED, so the
    host-side pose classification cannot run — render() takes an optional
    concrete ``hint=(warp_win, warp_wu, degenerate_ignored)`` (from
    ops.shear_warp.pose_hint at a representative pose) and otherwise uses
    the default warp windows with NO degenerate-pose exact fallback.
    Degenerate poses (eye in the slab range, close-up magnification — see
    pose_hint) degrade beyond what the budgeted re-march repairs; use
    :class:`HybridBonsaiRenderer` when the pose is concrete, which
    escalates/falls back automatically."""
    r = HybridBonsaiRenderer(vol_u8, intermediate, budget, thresh, win_cap)
    pack = (r.packs, r.layouts)

    def render(pk, camera_uniform, width, height,
               max_steps=MAX_STEPS_BONSAI, srgb=True, hint=None):
        packs, layouts = pk
        wwin, wwu = (0, 128) if hint is None else (hint[0], hint[1])
        win = min(auto_win_rows(r.dims, width, height, 1), r.win_cap)
        img, _ovf = _render_hybrid(
            packs, layouts, camera_uniform, jnp.float32(thresh),
            width, height, intermediate, budget, srgb,
            r.dims, win, r.band_rows, r.nb, r.bstride, max_steps,
            wwin, wwu,
        )
        return img

    return render, pack
