"""Shear-warp MXU renderer — the ``renderer="fast"`` approximate bonsai mode.

The exact Pallas slab-march (ops.pallas.march_bonsai) is gather-bound: the
VPU resolves 4 lane-gathers per scanned window row. This module instead
factorizes the perspective view (Lacroute-Levoy shear-warp, adapted to the
reference's sampling scheme) so the per-slab resample runs on the MXU:

    view = warp_2d  o  (per-slab homothety in slab space)

- Slabs are taken along the VIEW's dominant axis m (the axis most aligned
  with the camera forward) — one sample per slab crossing, exactly the
  reference's step rule dt = 1/(D * max|dir|) (raycast_naive.wgsl:97-99).
- For a pinhole camera, the map between two parallel planes is a homothety
  (uniform scale + translation), so slab k's footprint on a fixed
  axis-aligned intermediate grid is a SEPARABLE scale/shift resample:
  two (I x D) bilinear-weight matmuls per slab — MXU work, zero gathers.
- Sample positions lie at m = k + 0.5: the volume pack pre-blends adjacent
  slabs (0.5*(vol[k]+vol[k+1])), which IS the exact trilinear interpolant
  at that plane, halving the mean phase error vs the ray-lattice samples
  (per-ray phase fm ~ U[0,1): E|fm-0.5| = 0.25 vs E|fm| = 0.5).
- Outside-the-box samples get ZERO weight — identical to the reference's
  ray clipping, because transfer(0) = smoothstep(0.10, 1.2, min(0.9,0)) = 0
  contributes nothing (raycast_naive.wgsl:101-108).
- The final screen warp is a single bilinear homography lookup; on TPU it
  runs in a small Pallas kernel (ops.pallas.warp2d) — XLA gathers are
  scalar-rate — and falls back to jax.scipy map_coordinates elsewhere.

Two EXACT corrections are folded into the composite (measured ~5-9% mean
error reduction, round 2 continuation):

- off-dominant-axis opacity rate: a ray whose own dominant axis isn't m
  takes irho = max|d|/|d_m| >= 1 exact-march steps per slab; n equal
  under-composite steps of alpha ``tv`` telescope exactly to
  ``1 - (1-tv)^n`` for a locally constant field, and irho is separable
  across the intermediate grid (max(1, au[iu], av[iv]));
- the reference's per-pixel march break at alpha >= 0.95
  (raycast_naive.wgsl:115-117): compositing stops once a pixel saturates
  instead of accumulating up to 5% extra color.

Remaining error vs the exact kernel (MEASURED, tools/fast_error_report.py
/ PARITY_REPORT.md): sample-position phase for rays entering through side
faces or marching off the global axis (their exact samples do not lie on
slab planes — inherent to the factorization), the final warp's bilinear
reconstruction of COMPOSITED colors across silhouette discontinuities
(~1/I scaling; the dominant term), and bf16 operands (measured negligible:
an f32 variant changed mean error by < 1e-5 — VOK_FAST_F32 probe). The
flagship benchmark keeps the exact kernel (BASELINE.md:16 policy).
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vokselis_tpu.core import geometry
from vokselis_tpu.core.colors import (
    bonsai_transfer_pow_fast_soa,
    bonsai_transfer_pow_lowdeg_soa,
    linear_to_srgb,
)
from vokselis_tpu.ops.reference import MAX_STEPS_BONSAI

# precision experiment knob (read at trace time): VOK_FAST_F32=1 keeps the
# resample weights/volume/composite/warp in f32 to isolate how much of the
# fast mode's error floor is bf16 operands vs structural (warp reconstruction
# at silhouettes). See PARITY_REPORT.md.
_FAST_F32 = os.environ.get("VOK_FAST_F32", "0") == "1"
_MM_DTYPE = jnp.float32 if _FAST_F32 else jnp.bfloat16


def prepare_fast_volume(vol_u8):
    """Pack = three half-shifted slab-major f32 volumes, one per dominant
    axis (same axis conventions as march_bonsai.prepare_volume):
    m=0: [x][z][y], m=1: [y][z][x], m=2: [z][y][x]; each pre-blended
    0.5*(slab k + slab k+1) so a bilinear in-slab sample equals the exact
    trilinear interpolant at m = k + 0.5 (D-1 slabs per axis).

    The 4th element is a pair of static occupancy tables (3, G, D//8)
    bool: per-slab 8-column-group max > OCC_EPS along u (reduced over v)
    and along v (reduced over u). A bilinear resample is a convex combo,
    so a window whose table groups are all empty resamples to <= OCC_EPS
    -> transfer 0: the frame path uses them to skip empty (slab, u-block)
    resamples and to build the composite's chunk compaction WITHOUT the
    round-3 profile's full (G, I, I) occupancy reduce over HBM."""
    from vokselis_tpu.ops.pallas.shear_resample import OCC_EPS

    vol_np = np.asarray(vol_u8).astype(np.float32) / 255.0
    d = vol_np.shape[0]
    assert vol_np.shape == (d, d, d)
    base = {
        0: np.transpose(vol_np, (2, 0, 1)),
        1: np.transpose(vol_np, (1, 0, 2)),
        2: vol_np,
    }
    packs, occ_u, occ_v = [], [], []
    ng = d // 8
    for m in range(3):
        v = base[m]
        # bf16 storage: a half-blend of two u8 levels has 9 significant
        # bits; bf16 keeps 8 (<=1/512 error) and feeds the MXU at full rate
        blend = 0.5 * (v[:-1] + v[1:])
        packs.append(jnp.asarray(blend, jnp.bfloat16))
        hot = blend > OCC_EPS  # (G, Dv, Du)
        occ_u.append(hot.any(axis=1).reshape(-1, ng, 8).any(axis=2))
        occ_v.append(hot.any(axis=2).reshape(-1, ng, 8).any(axis=2))
    tables = (jnp.asarray(np.stack(occ_u), jnp.bool_),
              jnp.asarray(np.stack(occ_v), jnp.bool_))
    return tuple(packs) + (tables,)


def _window_counts(cum, pos_lo, pos_hi):
    """Occupied-group count for [pos_lo-1, pos_hi+1] windows against a
    per-slab prefix-summed group table cum (G, ng+1). Off-grid windows
    (including the -1e6 pad sentinel) clip to an empty span."""
    ng = cum.shape[1] - 1
    gl = jnp.clip(jnp.floor((pos_lo - 1.0) / 8.0).astype(jnp.int32), 0, ng)
    gh = jnp.clip(
        jnp.floor((pos_hi + 1.0) / 8.0).astype(jnp.int32) + 1, 0, ng
    )
    gh = jnp.maximum(gh, gl)
    return (jnp.take_along_axis(cum, gh, axis=1)
            - jnp.take_along_axis(cum, gl, axis=1))


def _window_any(tab, pos_lo, pos_hi):
    """Occupied-window test: does any occupied group of ``tab`` (G, ng)
    bool intersect the [pos_lo-1, pos_hi+1] window (both (G, nwin))?
    Same group arithmetic as _window_counts but as a broadcast
    mask-reduce over the ng axis instead of prefix-sum gathers: the two
    take_along_axis calls ran at SCALAR rate on TPU (occ2_v alone is
    2 x G x nrb = 32k gathers at I=512 — the bulk of the measured
    0.25 ms occ-chain tax, round-5 prelude probe); the mask-reduce is
    ~G*nwin*ng/1024 vector ops (~500 at I=512)."""
    ng = tab.shape[1]
    gl = jnp.clip(jnp.floor((pos_lo - 1.0) / 8.0), 0.0, float(ng))
    gh = jnp.floor((pos_hi + 1.0) / 8.0)
    gidx = jnp.arange(ng, dtype=jnp.float32)
    # group g participates when gl <= g <= gh (gh is inclusive here:
    # _window_counts' exclusive bound is floor(..)+1)
    m = ((gidx[None, None, :] >= gl[:, :, None])
         & (gidx[None, None, :] <= gh[:, :, None]))
    return jnp.any(m & tab[:, None, :], axis=2)


@partial(
    jax.jit,
    static_argnames=("width", "height", "intermediate", "srgb", "exit_every",
                     "warp_win", "warp_wu", "return_aux"),
)
def _render_fast(
    packs,  # 3-tuple of (D-1, D, D) f32 half-shifted slab-major volumes
    camera_uniform,
    width: int,
    height: int,
    intermediate: int,
    srgb: bool,
    exit_every: int = 32,
    warp_win: int = 0,  # 0 = warp kernel's static default
    warp_wu: int = 128,
    return_aux: bool = False,
):
    dm1, d, _ = packs[0].shape
    fd = float(d)
    ii = intermediate

    # ---- per-frame geometry (traced scalars) ------------------------------
    # The hybrid contracts (return_aux "stats"/"packed*") consume every
    # per-pixel plane in the kernels' packed (n_tiles*8, 128) tile layout;
    # generating rays packed NATIVELY (geometry.packed_pixel_grid) makes
    # each downstream plane (hit, xr, av, bu, ok) packed for free and
    # deletes the four full-frame pack relayouts _warp_to_screen paid per
    # frame (~0.07-0.1 ms each at 1024^2 — round-4 b0 decomposition). The
    # elementwise math is identical; only the element ORDER differs.
    packed_geom = isinstance(return_aux, str)
    eye = camera_uniform.view_position[:3]
    if packed_geom:
        ixp, iyp = geometry.packed_pixel_grid(width, height)
        ndc_x = 2.0 * (ixp.astype(jnp.float32) + 0.5) / width - 1.0
        ndc_y = 1.0 - 2.0 * (iyp.astype(jnp.float32) + 0.5) / height
        inv = camera_uniform.inv_proj
        nx4, ny4, nz4, nw4 = geometry.mat4_apply(
            inv, ndc_x, ndc_y, jnp.float32(0.0))
        fx4, fy4, fz4, fw4 = geometry.mat4_apply(
            inv, ndc_x, ndc_y, jnp.float32(1.0))
        dxs = fx4 / fw4 - nx4 / nw4
        dys = fy4 / fw4 - ny4 / nw4
        dzs = fz4 / fw4 - nz4 / nw4
        inv_len = 1.0 / jnp.sqrt(dxs * dxs + dys * dys + dzs * dzs)
        dirs_s = (dxs * inv_len, dys * inv_len, dzs * inv_len)
        # padded-grid pixels outside the frame must never participate
        valid = (ixp < width) & (iyp < height)
        fwd = geometry.center_ray_dir(camera_uniform, width, height)
    else:
        _, dirs = geometry.rays_fragment(camera_uniform, width, height)
        dirs_s = (dirs[..., 0], dirs[..., 1], dirs[..., 2])
        valid = None
        fwd = dirs[height // 2, width // 2]
    afwd = jnp.abs(fwd)
    m = jnp.argmax(afwd)

    # eye and per-pixel slopes in the (m, v, u) frame, texel space
    # (X = p*D - 0.5, matching march_bonsai's xm0)
    e_t = eye * fd - 0.5  # (3,) world-axis texel eye
    # world axis ids for (m, v, u): m=0 ->(0,2,1), 1 ->(1,2,0), 2 ->(2,1,0)
    def pick(vec):
        vm = jnp.where(m == 0, vec[0], jnp.where(m == 1, vec[1], vec[2]))
        vv = jnp.where(m == 2, vec[1], vec[2])
        vu = jnp.where(m == 0, vec[1], vec[0])
        return vm, vv, vu

    em, ev, eu = pick(e_t)
    dmx, dvx, dux = pick(dirs_s)  # per-pixel planes (frame or packed)

    sgn = jnp.where(pick(fwd)[0] >= 0, 1.0, -1.0)

    # slab planes sampled at Z = k + 0.5, k in [0, D-2]. (The ref-plane
    # POSITION is immaterial: crossings on any two planes differ by a
    # global homothety about the eye, which the extent normalization
    # cancels — probed. What matters is the extent CLIP below.)
    z_ref = (fd - 1.0) / 2.0
    # the factorization needs the eye OUTSIDE the slab range along m
    # (s(k) must not cross zero); eye-inside poses get clamped divisors so
    # the frame stays FINITE (geometry degrades — use the exact renderer
    # for such poses; review finding, round 2)
    denom_raw = z_ref - em
    denom_ref = jnp.where(
        jnp.abs(denom_raw) < 1.0,
        jnp.where(denom_raw >= 0, 1.0, -1.0),
        denom_raw,
    )

    # intermediate grid extent on the ref plane: union over k of the
    # homothety preimages of [0, D-1]; s(k) monotonic -> endpoints suffice
    ks = jnp.asarray([0.5, dm1 - 0.5])  # first/last sample planes

    def extent(e_axis):
        s = (ks - em) / denom_ref  # (2,)
        s = jnp.where(jnp.abs(s) < 1e-3, jnp.where(s >= 0, 1e-3, -1e-3), s)
        lo = (0.0 - e_axis) / s + e_axis
        hi = (fd - 1.0 - e_axis) / s + e_axis
        both = jnp.concatenate([lo, hi])
        return jnp.min(both), jnp.max(both)

    u_lo, u_hi = extent(eu)
    v_lo, v_hi = extent(ev)

    # FRUSTUM CLIP: the union-of-preimages extent covers every slab's
    # whole footprint, but visible rays only cross the ref plane inside
    # the screen's frustum — at perspective-heavy poses the union is many
    # times wider, wasting most of the I x I intermediate and magnifying
    # the warp's 1/I reconstruction error (zoom-1.0 diagonals measured
    # median tile magnification > 2.7x before this clip). Intersect with
    # the hit rays' ref-plane bounding box; near-parallel rays (x_ref
    # diverges as 1/d_m) are excluded by the intersection itself.
    exf = jnp.broadcast_to(eye[0], dirs_s[0].shape)
    eyf = jnp.broadcast_to(eye[1], dirs_s[0].shape)
    ezf = jnp.broadcast_to(eye[2], dirs_s[0].shape)
    tf0, tf1 = geometry.intersect_box_soa(
        exf, eyf, ezf, dirs_s[0], dirs_s[1], dirs_s[2], 0.0, 1.0
    )
    hitf = tf0 <= tf1
    if valid is not None:
        hitf = hitf & valid
    safe_dmf = jnp.where(jnp.abs(dmx) < 1e-8, 1e-8, dmx)
    xr_u = eu + denom_ref * dux / safe_dmf
    xr_v = ev + denom_ref * dvx / safe_dmf

    def ray_bbox(xr, lo, hi):
        # robust [0.2%, 99.8%] quantile box over a subsampled ray grid: a
        # hard min/max would chase the silhouette rays whose crossings
        # diverge (1/d_m) and never shrink anything. The excluded tail
        # renders black + flagged (see _warp_to_screen) and the hybrid
        # re-marches it exactly.
        if packed_geom:
            # image-(::8, ::8) subsample in packed layout: image rows
            # 0 mod 8 live at (even sublane, lane < 32), image cols
            # 0 mod 8 at lane % 8 == 0 — same SET of rays, different
            # order (the quantile sort is order-independent)
            xs = xr[::2, :32:8]
            hs = hitf[::2, :32:8]
        else:
            xs = xr[::8, ::8]
            hs = hitf[::8, ::8]
        sub = xs.reshape(-1)
        oks = (hs & jnp.isfinite(xs)).reshape(-1)
        n_ok = jnp.sum(oks.astype(jnp.int32))
        srt = jnp.sort(jnp.where(oks, sub, jnp.inf))
        nf = jnp.maximum(n_ok.astype(jnp.float32), 1.0)
        i_lo = jnp.clip((0.002 * nf).astype(jnp.int32), 0, srt.shape[0] - 1)
        i_hi = jnp.clip(n_ok - 1 - (0.002 * nf).astype(jnp.int32),
                        0, srt.shape[0] - 1)
        mn, mx = srt[i_lo], srt[i_hi]
        pad = 0.05 * (mx - mn) + 2.0
        good = (n_ok > 0) & jnp.isfinite(mn) & jnp.isfinite(mx)
        return (jnp.where(good, jnp.maximum(lo, mn - pad), lo),
                jnp.where(good, jnp.minimum(hi, mx + pad), hi))

    u_lo, u_hi = ray_bbox(xr_u, u_lo, u_hi)
    v_lo, v_hi = ray_bbox(xr_v, v_lo, v_hi)

    # half-texel pad so border bilinear taps are interior
    u_lo, u_hi = u_lo - 1.0, u_hi + 1.0
    v_lo, v_hi = v_lo - 1.0, v_hi + 1.0
    su = (u_hi - u_lo) / ii
    sv = (v_hi - v_lo) / ii
    grid_u = u_lo + (jnp.arange(ii, dtype=jnp.float32) + 0.5) * su  # (I,)
    grid_v = v_lo + (jnp.arange(ii, dtype=jnp.float32) + 0.5) * sv

    volm = lax.switch(m, [lambda: packs[0], lambda: packs[1], lambda: packs[2]])

    # exact-march steps per slab for each INTERMEDIATE pixel's ray: the
    # reference dt = 1/(D*max|dir|) advances m by |d_m|/max|dir| texels per
    # step, so a ray whose own dominant axis isn't m takes
    # irho = max|d|/|d_m| > 1 steps per slab. Direction of the ray through
    # ref-plane point (z_ref, gv, gu) is (z_ref-em, gv-ev, gu-eu) in texel
    # space — separable per axis.
    au = jnp.abs(grid_u - eu) / jnp.abs(denom_ref)  # (I,)
    av = jnp.abs(grid_v - ev) / jnp.abs(denom_ref)
    irho = jnp.maximum(
        1.0, jnp.maximum(av[:, None], au[None, :])
    )  # (I_v, I_u)

    if jax.default_backend() == "tpu":
        # fused Pallas resample (on-the-fly weights + both MXU matmuls,
        # chunked output layout) + chunk-compacted composite — the round-2
        # separate-composite path spent ~4.6 ms/frame at I=512 on per-slab
        # dynamic-loop overhead (see ops.pallas.shear_resample docstring)
        from vokselis_tpu.ops.pallas.shear_resample import (
            composite_chunks,
            resample_slabs,
        )

        gp = (dm1 + 7) // 8 * 8
        ks = jnp.arange(gp, dtype=jnp.float32) + 0.5
        s_k = (ks - em) / denom_ref  # (gp,)
        pos_u = eu + s_k[:, None] * (grid_u[None, :] - eu)  # (gp, I)
        pos_v = ev + s_k[:, None] * (grid_v[None, :] - ev)
        # pad slabs k >= G: off-grid sentinel -> all-zero weights
        valid = (jnp.arange(gp) < dm1)[:, None]
        pos_u = jnp.where(valid, pos_u, -1e6)
        pos_v = jnp.where(valid, pos_v, -1e6)
        sgn_i = jnp.where(sgn > 0, 1, -1).astype(jnp.int32)

        occ_k = occ_b = None
        if len(packs) >= 4:
            # volume-side occupancy: per-slab gate for the resample and
            # per-(row-block, chunk) compaction for the composite from the
            # static group tables — replaces the full resampled-stack
            # reduce and skips empty-slab matmuls
            tab_u, tab_v = packs[3]
            tu = lax.switch(m, [lambda i=i: tab_u[i] for i in range(3)])
            tv_tab = lax.switch(m, [lambda i=i: tab_v[i] for i in range(3)])

            def pad_tab(tab):
                return jnp.pad(tab, ((0, gp - tab.shape[0]), (0, 0)))

            n_ub = ii // 128
            nrb = ii // 8
            # pos_* are affine per slab -> block windows from endpoints
            pu_e = pos_u.reshape(gp, n_ub, 128)
            pv_e = pos_v.reshape(gp, nrb, 8)
            u_lo_b = jnp.minimum(pu_e[:, :, 0], pu_e[:, :, -1])
            u_hi_b = jnp.maximum(pu_e[:, :, 0], pu_e[:, :, -1])
            v_lo_b = jnp.minimum(pv_e[:, :, 0], pv_e[:, :, -1])
            v_hi_b = jnp.maximum(pv_e[:, :, 0], pv_e[:, :, -1])
            occ2_u = _window_any(pad_tab(tu), u_lo_b, u_hi_b)  # (gp, n_ub)
            occ2_v = _window_any(pad_tab(tv_tab), v_lo_b, v_hi_b)  # (gp, nrb)
            any_u = occ2_u.any(axis=1)  # (gp,)
            occ_k = (any_u & occ2_v.any(axis=1)).astype(jnp.int32)
            # row-block rb needs slab k when its v window is hot AND the
            # slab has any hot u window (the resample is full-width now)
            occ_rb = occ2_v & any_u[:, None]  # (gp, nrb)
            occ_b = occ_rb.reshape(gp // 8, 8, nrb).any(axis=1).T  # (nrb, C)

        res = resample_slabs(volm, pos_u, pos_v, occ=occ_k)
        r, g, b, a = composite_chunks(res, sgn_i, irho, occ_b=occ_b)
        return _warp_to_screen(r, g, b, a, hitf, xr_u, xr_v,
                               u_lo, v_lo, su, sv, height,
                               width, srgb, warp_win, warp_wu, return_aux)

    # ---- XLA path (CPU / tests): grouped matmuls + cumprod composite ------
    grp = exit_every
    n_groups = (dm1 + grp - 1) // grp
    dpad = n_groups * grp
    # zero-padded tail slabs resample to 0 -> transfer(0) = 0 -> no-ops
    volp = jnp.pad(volm.astype(jnp.bfloat16), ((0, dpad - dm1), (0, 0), (0, 0)))
    cols = jnp.arange(d, dtype=jnp.float32)

    def group(gi, state):
        def run(state):
            r, g, b, a = state
            # ascending k slice for this group
            start = jnp.where(sgn > 0, gi * grp, dpad - (gi + 1) * grp)
            ks = start + jnp.arange(grp)
            z = ks.astype(jnp.float32) + 0.5
            s_k = (z - em) / denom_ref  # (G,)
            pos_u = eu + s_k[:, None] * (grid_u[None, :] - eu)  # (G, I)
            pos_v = ev + s_k[:, None] * (grid_v[None, :] - ev)
            # bf16 operands, f32 accumulate: the volume is u8-derived (a
            # half-blend has 9 significant bits, bf16 keeps 8 -> <=0.2%)
            # and bilinear weights lose ~0.4% — inside the fast-mode error
            # budget, and the MXU runs bf16 at full rate vs multi-pass f32
            wu = jnp.maximum(
                0.0, 1.0 - jnp.abs(pos_u[:, None, :] - cols[None, :, None])
            ).astype(jnp.bfloat16)  # (G, D, I)
            wv = jnp.maximum(
                0.0, 1.0 - jnp.abs(pos_v[:, None, :] - cols[None, :, None])
            ).astype(jnp.bfloat16)
            slabs = lax.dynamic_slice_in_dim(volp, start, grp, axis=0)
            tmp = jax.lax.dot_general(
                slabs, wu, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (G, Dv, I)
            res = jax.lax.dot_general(
                wv, tmp, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (G, I_v, I_u)

            # whole-group composite: front-to-back under-compositing over
            # the group collapses to an exclusive transmittance cumprod +
            # weighted sums — one scan over (G, I, I) instead of G carry
            # round-trips of the (I, I) rgba state through HBM (the
            # sequential form measured HBM-bound, not MXU-bound).
            # entry-side-first order
            res_o = lax.cond(sgn > 0, lambda t: t, lambda t: lax.rev(t, (0,)),
                             res)
            # transfer + palette + irho rate correction via the SAME
            # pass the Pallas composite uses (low-degree palette +
            # hardware-exp/log alpha by default, VOK_COMP_LOWDEG=0 for the
            # 1e-6 polynomial set) so fast-mode semantics are identical
            # across backends — the CPU mini-sweep validates the hybrid
            # ladder through THIS path; palette color comes from the RAW
            # transfer value, alpha is 1-(1-tv)^irho (exact steps/slab)
            from vokselis_tpu.ops.pallas.shear_resample import _LOWDEG
            if _LOWDEG:
                tv, cr, cg, cb = bonsai_transfer_pow_lowdeg_soa(
                    res_o, irho[None])
            else:
                tv, cr, cg, cb = bonsai_transfer_pow_fast_soa(
                    res_o, irho[None])
            one_m = 1.0 - tv
            cum = jnp.cumprod(one_m, axis=0)  # inclusive transmittance
            t_excl = jnp.concatenate(
                [jnp.ones((1, ii, ii), jnp.float32), cum[:-1]], axis=0
            )
            # per-pixel march stop at alpha 0.95 (reference break): alpha
            # before slab k is 1 - (1-a)*t_excl_k and is monotonic, so the
            # live mask is a prefix — masked later slabs contribute nothing
            # even though t_excl keeps multiplying their (1-tv)
            t_in = 1.0 - a
            live = (1.0 - t_in * t_excl) < 0.95
            w = jnp.where(live, tv * t_excl, 0.0)  # per-slab weight in group
            r = r + t_in * jnp.sum(w * cr, axis=0)
            g = g + t_in * jnp.sum(w * cg, axis=0)
            b = b + t_in * jnp.sum(w * cb, axis=0)
            a = a + t_in * jnp.sum(w, axis=0)
            return (r, g, b, a)

        r, g, b, a = state
        # global early exit once every composited texel saturates
        return lax.cond(jnp.min(a) < 0.95, run, lambda s: s, state)

    zero = jnp.zeros((ii, ii), jnp.float32)
    r, g, b, a = lax.fori_loop(0, n_groups, group, (zero, zero, zero, zero))
    return _warp_to_screen(r, g, b, a, hitf, xr_u, xr_v,
                           u_lo, v_lo, su, sv, height, width, srgb,
                           warp_win, warp_wu, return_aux)


def _warp_to_screen(r, g, b, a, hit, x_ref_u, x_ref_v,
                    u_lo, v_lo, su, sv, height, width, srgb,
                    warp_win=0, warp_wu=128, return_aux=False):
    """Final homography warp of the composited intermediate to the screen.
    ``hit``/``x_ref_u``/``x_ref_v`` are the full-frame box-hit mask and
    ref-plane crossings already computed by _render_fast's frustum clip
    (recomputing them here measured as pure duplicate (H, W) vector work).

    With ``return_aux=True`` also returns an (H, W) bool mask of hit
    pixels the warp could NOT reconstruct faithfully: rays whose ref-plane
    crossing lands outside the intermediate extent (side-entry and
    near-slab-parallel rays — their projection diverges as 1/d_m and was
    measured to drag per-tile sampling windows by 1e6+ texels at close
    zooms) plus pixels whose in-extent footprint overflowed the kernel's
    (warp_win, warp_wu) window. The hybrid renderer re-marches those
    pixels' tiles with the exact kernel; fast-only callers render them
    black (bounded error instead of unbounded window-clamp garbage)."""
    # per-pixel ref-plane position -> intermediate pixel coords; misses and
    # near-parallel rays (d_m ~ 0, sanitized upstream) are parked at +1e6
    # so the warp kernel's window probe and int casts stay finite. Parked
    # HIGH, not low: the kernel's window base is the block MIN of the
    # coords, so a low park would drag every silhouette-straddling tile's
    # window to row/col 0 and clamp the hit pixels' taps into it (review
    # finding, round 2); a high park only widens the scan, and the pixels
    # are masked below.
    bu = (x_ref_u - u_lo) / su - 0.5  # (H, W) intermediate coords
    av = (x_ref_v - v_lo) / sv - 0.5
    ii = r.shape[0]
    # exclude rays whose ref-plane crossing misses the intermediate extent
    # (+pad): their taps would clamp to arbitrary WINDOW-edge texels, and
    # their extreme coords drag whole tiles' windows off the hit pixels
    pad_ext = 4.0
    in_ext = ((av > -pad_ext) & (av < ii - 1 + pad_ext)
              & (bu > -pad_ext) & (bu < ii - 1 + pad_ext))
    ok = hit & jnp.isfinite(av) & jnp.isfinite(bu) & in_ext
    av = jnp.where(ok, av, 1e6)
    bu = jnp.where(ok, bu, 1e6)

    # "packed" variants "packed-nocurv"/"packed-noovf"/"packed-nocurv-noovf"
    # drop the curvature channel / overflow plane (zeros instead) — cost
    # ablation knobs for tools/aux_tax_probe.py, not production modes.
    # "stats" is the round-4 hybrid contract: the warp kernel reduces the
    # whole per-pixel aux story to one per-tile stats plane in-kernel.
    aux_packed = isinstance(return_aux, str) and return_aux.startswith("packed")
    aux_stats = return_aux == "stats"
    want_curv = (return_aux is True or aux_stats
                 or (aux_packed and "nocurv" not in return_aux))
    want_ovf = return_aux is True or (aux_packed and "noovf" not in return_aux)
    chans = [r, g, b]
    if want_curv:
        # 4th channel: the intermediate's local curvature |lap c| summed
        # over rgb. The warp's bilinear reconstruction error is bounded by
        # (fu(1-fu)/2)|f''_u| + (fv(1-fv)/2)|f''_v| — the discrete second
        # difference AT the sample point is a near-oracle per-pixel error
        # density, measured where the error originates (silhouette and
        # volume-edge discontinuities in the COMPOSITED image), unlike any
        # screen-space contrast heuristic. Warping it alongside rgb costs
        # one extra hat-matmul channel; the hybrid ranks tiles by it.
        def curv(c):
            d2v = jnp.abs(2.0 * c - jnp.roll(c, 1, 0) - jnp.roll(c, -1, 0))
            d2u = jnp.abs(2.0 * c - jnp.roll(c, 1, 1) - jnp.roll(c, -1, 1))
            return d2v + d2u

        chans.append(curv(r) + curv(g) + curv(b))

    if aux_stats:
        # STATS contract (hybrid, round 4): ok-masked packed rgb + ONE
        # per-tile stats plane; curvature riding as the 4th warp channel
        # reduces in-kernel (warp2d._warp_kernel_mxu_stats) — no errd/ovf
        # planes, no ok/hit planes returned, no XLA scoring passes. The
        # per-pixel inputs (hit/av/bu/ok) arrive ALREADY in the packed
        # tile layout (_render_fast's packed-native raygen) — no pack
        # relayouts here.
        from vokselis_tpu.ops.pallas.warp2d import (
            mxu_stats_eligible,
            stats_from_packed,
            warp_stats_packed,
        )

        okp = ok.astype(jnp.float32)
        boxp = hit.astype(jnp.float32)
        if jax.default_backend() == "tpu" and mxu_stats_eligible(ii):
            outs = warp_stats_packed(
                jnp.stack(chans, 0), av, bu, okp, boxp, height, width,
            )
        else:
            # CPU tests/minisweep (and, correct-but-slow, an ineligible
            # intermediate): exact sampling + the XLA stats mirror
            from jax.scipy.ndimage import map_coordinates

            planes = [map_coordinates(c, [av, bu], order=1,
                                      mode="constant", cval=0.0)
                      for c in chans]
            planes = [jnp.where(okp > 0.0, p, 0.0) for p in planes]
            stats = stats_from_packed(planes[:3], planes[3],
                                      jnp.zeros_like(okp), okp, boxp)
            outs = planes[:3] + [stats]
        return tuple(outs[:3]), outs[3]

    if aux_packed:
        # PACKED aux contract for the hybrid renderer: everything the
        # hybrid consumes stays in the (n_tiles*8, 128) tile packing the
        # warp kernel works in, so the hybrid can score, re-march and
        # merge without any full-frame relayout (each pack/unpack of a
        # 1024^2 plane measured ~0.07-0.1 ms; the round-2 hybrid paid 8).
        # Per-pixel inputs are packed-native already (_render_fast).
        okp = ok.astype(jnp.float32)
        if jax.default_backend() == "tpu":
            from vokselis_tpu.ops.pallas.warp2d import warp_bilinear_packed

            outs = warp_bilinear_packed(
                jnp.stack(chans, 0), av, bu, okp, height,
                width, warp_win or None, warp_wu, with_overflow=want_ovf,
            )
        else:
            # CPU fallback mirrors _warp_bilinear's: exact sampling, no
            # window, zero overflow (the kernel path needs a TPU)
            from jax.scipy.ndimage import map_coordinates

            outs = [map_coordinates(c, [av, bu], order=1,
                                    mode="constant", cval=0.0)
                    for c in chans]
            if want_ovf:
                outs.append(jnp.zeros_like(outs[0]))
        rgbp = tuple(jnp.where(okp > 0.0, o, 0.0) for o in outs[:3])
        errdp = (jnp.where(okp > 0.0, outs[3], 0.0) if want_curv
                 else jnp.zeros_like(okp))
        ovfp = outs[3 + int(want_curv)] if want_ovf else jnp.zeros_like(okp)
        # packed hit mask: the hybrid derives its extent-excluded channel
        # as hitp*(1-okp) with a packed per-tile mean — returning the
        # (H, W) ext_bad instead forced a (ny, 32, nx, 32) relayout there
        hitp = hit.astype(jnp.float32)
        return rgbp, okp, errdp, ovfp, hitp

    out = _warp_bilinear(jnp.stack(chans, 0), av, bu, ok,
                         win_rows=warp_win, win_u=warp_wu,
                         with_overflow=return_aux)
    if return_aux:
        planes, wovf = out
    else:
        planes = out
    rgb = jnp.moveaxis(planes[:3], 0, -1)
    rgb = jnp.where(ok[..., None], rgb, 0.0)
    if srgb:
        rgb = linear_to_srgb(rgb)
    alpha = jnp.ones((height, width, 1), jnp.float32)
    img = jnp.concatenate([rgb, alpha], axis=-1)
    if return_aux:
        # int8 bitmask, hit-gated BOTH ways: a miss ray is black in the
        # fast frame AND in the exact march, so neither its out-of-extent
        # park nor its (trivially overflowing, 1e6-parked) warp window
        # makes the pixel wrong. Unhit overflow flags previously outranked
        # every true silhouette tile in the hybrid's ranking (score 1e3+)
        # and soaked the whole re-march budget on already-exact background
        # tiles (round-3 oppoint: errors bit-identical, budgets 16-48).
        #   bit 1: hit ray outside the warp extent -> rendered BLACK (may
        #          or may not be wrong: most such rays traverse empty
        #          voxels and are black in the exact march too)
        #   bit 2: reconstructable (ok) pixel whose warp window overflowed
        #          -> edge-clamped taps, value untrustworthy
        bad = (hit & jnp.logical_not(ok)).astype(jnp.int8)
        bad = bad | (ok & (wovf > 0.5)).astype(jnp.int8) * 2
        errd = jnp.where(ok, planes[3], 0.0)
        return img, bad, errd
    return img


def _warp_bilinear(chans, av, bu, hit=None, win_rows=0, win_u=128,
                   with_overflow=False):
    """Bilinear lookup of (C, I, I) channels at (H, W) fractional coords.
    Pallas kernel on TPU (gathers are scalar-rate in XLA); map_coordinates
    elsewhere. ``hit`` restricts the kernel's per-tile window to
    participating pixels; window overrides and the overflow flag are
    documented on warp_bilinear_pallas (the XLA fallback samples exactly
    and returns a zero flag)."""
    if jax.default_backend() == "tpu":
        from vokselis_tpu.ops.pallas.warp2d import warp_bilinear_pallas

        return warp_bilinear_pallas(chans, av, bu, hit,
                                    win_rows=win_rows or None, win_u=win_u,
                                    with_overflow=with_overflow)
    from jax.scipy.ndimage import map_coordinates

    planes = jnp.stack(
        [
            map_coordinates(c, [av, bu], order=1, mode="constant", cval=0.0)
            for c in chans
        ]
    )
    if with_overflow:
        return planes, jnp.zeros(av.shape, jnp.float32)
    return planes


def traced_degenerate(camera_uniform, d: int):
    """TRACED mirror of pose_hint's scalar degeneracy criteria: (a) the
    eye inside/near the slab range along the dominant axis (the s(k)
    homothety divisor crosses ~zero) and (b) nearest-slab scale collapse
    (s_near < 0.25 — close-up poses whose near slabs the intermediate
    under-resolves >= 4x, surfacing banding the re-march budget cannot
    cover). Pure scalar math on the camera uniform, so it runs under an
    outer jit where the host-side pose_hint cannot — the hybrid's
    functional API returns it as a ``degraded`` flag (round-3 review: a
    traced fori loop at zoom 0.6 silently rendered 5e-3 frames).

    pose_hint's third criterion (median tile span < 12, magnification)
    needs the coarse ray-grid statistics; it is intermediate-dependent
    and NOT mirrored here — concrete-pose callers get it from pose_hint."""
    inv = camera_uniform.inv_proj
    n = geometry.mat4_apply(inv, jnp.float32(0.0), jnp.float32(0.0),
                            jnp.float32(0.0))
    f = geometry.mat4_apply(inv, jnp.float32(0.0), jnp.float32(0.0),
                            jnp.float32(1.0))
    fwd = jnp.stack([f[i] / f[3] - n[i] / n[3] for i in range(3)])
    eye = camera_uniform.view_position[:3]
    fd = float(d)
    e_t = eye * fd - 0.5
    em = e_t[jnp.argmax(jnp.abs(fwd))]
    z_ref = (fd - 1.0) / 2.0
    denom_raw = z_ref - em
    degen_eye = jnp.abs(denom_raw) <= (fd - 1.0) / 2.0 + 8.0
    den = jnp.where(jnp.abs(denom_raw) < 1.0,
                    jnp.where(denom_raw >= 0, 1.0, -1.0), denom_raw)
    s_near = jnp.minimum(jnp.abs((0.5 - em) / den),
                         jnp.abs((fd - 1.5 - em) / den))
    return degen_eye | (s_near < 0.25)


_HINT_CACHE: dict = {}


def pose_hint(camera_uniform, width: int, height: int, intermediate: int,
              d: int, stride: int = 8):
    """Host-side pose classification for the warp stage: returns
    ``(warp_win, warp_wu, degenerate)``.

    The warp kernel's per-tile window must cover the tile's footprint in
    the intermediate, and that footprint is POSE-dependent: it scales with
    the intermediate-to-screen ratio and stretches with perspective at
    off-axis yaws (measured spans per 32 px tile across the 72-pose sweep:
    6 texels at close zooms up to 220 at zoom-1.0 diagonals). This traces
    a coarse (stride-subsampled) numpy replica of _render_fast's geometry,
    measures per-tile coordinate spans, and picks quantized window buckets
    — quantized because each bucket is a separate jit variant.

    ``degenerate`` is True when the shear-warp factorization itself
    degrades: the eye is inside/near the slab range along the dominant
    axis (the s(k) homothety divisor crosses ~zero, see _render_fast), or
    the intermediate is magnified >~2x onto the screen (close-up poses:
    the 1/I reconstruction error scales with magnification). Degenerate
    poses should be rendered by the exact kernel (HybridBonsaiRenderer
    does this automatically).

    Returns conservative defaults ``(0, 128, False)`` when the uniform is
    traced (inside an outer jit) — concrete callers get the real hint.
    Results are cached by the uniform's bytes (one small device_get per
    new pose)."""
    import jax.core as jcore

    pv = camera_uniform.proj_view
    if isinstance(pv, jcore.Tracer):
        return 0, 128, False
    host = getattr(camera_uniform, "host_np", None)
    if host is not None:  # Camera.uniform() attaches host mirrors
        vp_a, pv_a, ip_a = host
    else:
        vp_a, ip_a = jax.device_get(
            (camera_uniform.view_position, camera_uniform.inv_proj)
        )
        pv_a = jax.device_get(pv)
    pv_a = np.asarray(pv_a, np.float64)
    key = (pv_a.tobytes(), bytes(np.asarray(vp_a, np.float64)),
           width, height, intermediate, d)
    cached = _HINT_CACHE.get(key)
    if cached is not None:
        return cached

    ii = intermediate
    fd = float(d)
    eye = np.asarray(vp_a, np.float64)[:3]
    inv = np.asarray(ip_a, np.float64)

    # coarse pixel grid (mirrors geometry.rays_fragment)
    px = np.arange(stride / 2.0, width, stride, dtype=np.float64)
    py = np.arange(stride / 2.0, height, stride, dtype=np.float64)
    ndc_x = 2.0 * (px + 0.5) / width - 1.0
    ndc_y = 1.0 - 2.0 * (py + 0.5) / height
    gx, gy = np.meshgrid(ndc_x, ndc_y)  # (ny, nx)

    def unproj(z):
        h = np.stack([gx, gy, np.full_like(gx, z), np.ones_like(gx)], 0)
        p = np.einsum("ij,jyx->iyx", inv, h)
        return p[:3] / p[3:4]

    dirs = unproj(1.0) - unproj(0.0)  # (3, ny, nx), unnormalized
    cy, cx = dirs.shape[1] // 2, dirs.shape[2] // 2
    fwd = dirs[:, cy, cx]
    m = int(np.argmax(np.abs(fwd)))
    ax = {0: (0, 2, 1), 1: (1, 2, 0), 2: (2, 1, 0)}[m]
    e_t = eye * fd - 0.5
    em, ev, eu = e_t[ax[0]], e_t[ax[1]], e_t[ax[2]]
    dm, dv, du = dirs[ax[0]], dirs[ax[1]], dirs[ax[2]]
    z_ref = (fd - 1.0) / 2.0
    denom_raw = z_ref - em
    # degenerate when the eye is inside/near the slab range along m
    degen = abs(denom_raw) <= (fd - 1.0) / 2.0 + 8.0
    den = denom_raw
    if abs(den) < 1.0:
        den = 1.0 if den >= 0 else -1.0
    # ... or when the NEAREST slab's homothety scale collapses: slab k's
    # crossing pattern scales by s(k) = (k - em)/den about the eye, and the
    # intermediate's extent is normalized over ALL slabs, so the nearest
    # slab is resolved at ~s_near x the intermediate resolution. Close-up
    # poses (eye just outside a box face, e.g. zoom 0.6: s_near 0.06-0.12
    # vs 0.43+ at zoom >= 1.0 — a wide, stable gap) under-resolve the near
    # slabs >= 4x and surface the per-slab sample-phase error as concentric
    # banding the re-march budget cannot cover (measured: diffuse 5e-3
    # mean over 62/64 tiles at zoom 0.6 / pitch 1.2). s_near is
    # intermediate-independent, so these poses go straight to the exact
    # kernel rather than up the I-escalation ladder.
    s_near = min(abs((0.5 - em) / den), abs((fd - 1.5 - em) / den))
    degen = degen or s_near < 0.25

    ks = np.array([0.5, fd - 1.5])

    def extent(e_axis):
        s = (ks - em) / den
        s = np.where(np.abs(s) < 1e-3, np.where(s >= 0, 1e-3, -1e-3), s)
        both = np.concatenate(
            [(0.0 - e_axis) / s + e_axis, (fd - 1.0 - e_axis) / s + e_axis]
        )
        return both.min(), both.max()

    u_lo, u_hi = extent(eu)
    v_lo, v_hi = extent(ev)

    # box hit test (slab method on the unit cube)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_d = 1.0 / dirs
        t0 = (0.0 - eye[:, None, None]) * inv_d
        t1 = (1.0 - eye[:, None, None]) * inv_d
        tn = np.minimum(t0, t1).max(axis=0)
        tf = np.maximum(t0, t1).min(axis=0)
        hit = tn <= tf

        safe = np.where(np.abs(dm) < 1e-8, 1e-8, dm)
        xr_u = eu + den * du / safe
        xr_v = ev + den * dv / safe

    # robust frustum clip of the union extent (mirrors _render_fast)
    def ray_bbox(xr, lo, hi):
        vals = xr[hit & np.isfinite(xr)]
        if vals.size == 0:
            return lo, hi
        mn, mx = np.quantile(vals, [0.002, 0.998])
        pad = 0.05 * (mx - mn) + 2.0
        return max(lo, mn - pad), min(hi, mx + pad)

    u_lo, u_hi = ray_bbox(xr_u, u_lo, u_hi)
    v_lo, v_hi = ray_bbox(xr_v, v_lo, v_hi)
    u_lo, u_hi = u_lo - 1.0, u_hi + 1.0
    v_lo, v_hi = v_lo - 1.0, v_hi + 1.0
    su = (u_hi - u_lo) / ii
    sv = (v_hi - v_lo) / ii

    with np.errstate(invalid="ignore"):
        bu = (xr_u - u_lo) / su - 0.5
        av = (xr_v - v_lo) / sv - 0.5
    ok = (hit & np.isfinite(av) & np.isfinite(bu)
          & (av > -4.0) & (av < ii + 3.0) & (bu > -4.0) & (bu < ii + 3.0))
    av = np.where(ok, av, np.nan)
    bu = np.where(ok, bu, np.nan)

    spt = 32 // stride  # samples per tile side
    ny, nx = av.shape
    ty, tx = ny // spt, nx // spt

    def tile_spans(c):
        import warnings

        t = c[: ty * spt, : tx * spt].reshape(ty, spt, tx, spt)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN tiles
            s = (np.nanmax(t, axis=(1, 3)) - np.nanmin(t, axis=(1, 3)))
        # a tile whose samples are mostly parked (silhouette edge) yields a
        # degenerate near-zero span — it would poison the magnification
        # median; demand a mostly-interior tile for the statistics
        n_ok = np.isfinite(t).sum(axis=(1, 3))
        s = np.where(n_ok >= (spt * spt) * 3 // 4, s, np.nan)
        return s[np.isfinite(s)]

    vs, us = tile_spans(av), tile_spans(bu)
    scale = 32.0 / max(32 - stride, 1)  # coarse max-min undercovers
    if vs.size == 0:
        win, wu, med = 0, 128, np.inf
    else:
        v99 = float(np.quantile(vs, 0.995)) * scale + 6.0
        u99 = float(np.quantile(us, 0.995)) * scale + 6.0
        from vokselis_tpu.ops.pallas.warp2d import _win_rows

        default = _win_rows(ii, height, width)
        if v99 <= default:
            win = 0
        elif v99 <= 64:
            win = 64
        elif v99 <= 96:
            win = 96
        else:
            win = 128
        wu = 128 if u99 <= 124 else 256
        med = float(np.median(vs)) * scale
    # magnification >~2x: intermediate under-resolved for the screen
    degen = bool(degen or med < 12.0)

    out = (win, wu, degen)
    if len(_HINT_CACHE) > 512:
        _HINT_CACHE.clear()
    _HINT_CACHE[key] = out
    return out


class FastBonsaiRenderer:
    """renderer="fast": whole-frame shear-warp approximation. Holds the
    half-shifted per-axis volume packs; call like BonsaiRenderer. The warp
    window is sized per pose via pose_hint; degenerate poses (see there)
    still render fast — use HybridBonsaiRenderer for guaranteed accuracy."""

    def __init__(self, vol_u8, intermediate: int = 512):
        self.packs = prepare_fast_volume(vol_u8)
        self.intermediate = intermediate
        self.dims = int(self.packs[0].shape[1])

    def __call__(self, camera_uniform, width=1280, height=720, srgb=True,
                 max_steps: int = MAX_STEPS_BONSAI, intermediate=None):
        from vokselis_tpu.ops.pallas.warp2d import mxu_adaptive_eligible

        ii = intermediate or self.intermediate
        win, wu, _degen = pose_hint(camera_uniform, width, height, ii,
                                    self.dims)
        if mxu_adaptive_eligible(3, ii):
            # adaptive MXU warp sizes its own windows (two-pass): one jit
            # variant instead of a pose-hint bucket per window size
            win, wu = 0, 128
        return _render_fast(
            self.packs, camera_uniform, width, height, ii, srgb,
            warp_win=win, warp_wu=wu,
        )


def build_fast_renderer(vol_u8, intermediate: int = 512):
    """Functional (render, pack) pair matching build_renderer's signature."""
    packs = prepare_fast_volume(vol_u8)

    def render(pk, camera_uniform, width, height,
               max_steps=MAX_STEPS_BONSAI, srgb=True):
        return _render_fast(pk, camera_uniform, width, height,
                            intermediate, srgb)

    return render, packs
