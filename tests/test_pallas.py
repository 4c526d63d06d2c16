"""Pallas kernel parity tests vs the jnp oracles (SURVEY.md §4 point 2).

These run the kernels in interpreter mode on CPU so CI needs no TPU; the
same code paths compile on real TPUs (exercised by bench.py and the
driver's compile checks). Sizes are tiny — interpret mode emulates every
grid step in Python.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import jax.experimental.pallas as pl


@pytest.fixture(autouse=True)
def force_interpret(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    # reload kernel modules so they pick up the patched pallas_call
    # (ops.hybrid last: it imports march_bonsai's functions by name)
    import importlib
    import vokselis_tpu.ops.pallas.march_field as mf
    import vokselis_tpu.ops.pallas.march_bonsai as mb
    import vokselis_tpu.ops.pallas.genvol as gv
    import vokselis_tpu.ops.pallas.shear_resample as sr
    import vokselis_tpu.ops.hybrid as hy

    for mod in (mf, mb, gv, sr, hy):
        importlib.reload(mod)
    yield
    for mod in (mf, mb, gv, sr, hy):
        importlib.reload(mod)


def test_field_kernel_matches_oracle():
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.ops.reference import render_compute_inline
    import vokselis_tpu.ops.pallas.march_field as mf

    u = Camera.xor(1.0).uniform()
    img_p = np.asarray(
        mf.render_field_pallas(
            u, 0.0, width=32, height=32, tile_h=16, tile_w=128, max_steps=32,
            sphere_clip=False, grad="fd",
        )
    )
    img_o = np.asarray(render_compute_inline(u, width=32, height=32, max_steps=32))
    err = np.abs(img_p - img_o)
    # fract(sin) hash amplifies fma-fusion differences on a small fraction
    # of samples; see tests/test_render_oracle.py
    assert err.max() < 5e-3
    assert err.mean() < 1e-5


def test_field_kernel_trig_emission_matches_oracle():
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.ops.reference import render_field
    import vokselis_tpu.ops.pallas.march_field as mf

    u = Camera.xor(1.0).uniform()
    img_p = np.asarray(
        mf.render_field_pallas(
            u, 0.0, width=32, height=32, field="trig", shading="emission",
            quantize=False, tile_h=16, tile_w=128, max_steps=32,
            sphere_clip=False,
        )
    )
    img_o = np.asarray(render_field(u, 0.0, width=32, height=32, max_steps=32))
    err = np.abs(img_p - img_o)
    assert err.max() < 1e-4  # analytic field: no hash amplification
    assert err.mean() < 1e-6


def test_genvol_kernel_matches_jnp():
    from vokselis_tpu.volume import fields
    import vokselis_tpu.ops.pallas.genvol as gv

    d_p, n_p = gv.generate_xor_volumes_pallas(0.0, dims=16, tile_z=8, tile_y=8)
    d_j, n_j = fields.generate_xor_volumes(16, time=0.0)
    assert np.abs(np.asarray(d_p) - np.asarray(d_j)).max() < 2e-3
    assert np.abs(np.asarray(d_p) - np.asarray(d_j)).mean() < 1e-5
    # normals can flip at hash boundaries; compare where gradients are stable
    dn = np.abs(np.asarray(n_p) - np.asarray(n_j))
    assert np.quantile(dn, 0.99) < 1e-2


def test_bonsai_kernel_matches_oracle():
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.ops.reference import render_bonsai
    from vokselis_tpu.volume.io import get_bonsai
    import vokselis_tpu.ops.pallas.march_bonsai as mb

    vol = get_bonsai(32)
    u = Camera.bonsai(1.0).uniform()
    r = mb.BonsaiRenderer(vol)
    img_p = np.asarray(r(u, width=32, height=32))
    img_o = np.asarray(render_bonsai(jnp.asarray(vol), u, width=32, height=32))
    err = np.abs(img_p - img_o)
    # direct-form texel coords vs the oracle's accumulated p: ~1e-5 drift
    assert err.max() < 1e-3
    assert err.mean() < 1e-5


def test_bonsai_prequad_layout_matches_pairs():
    """prepare_volume(prequad=True) stores int32 quads in HBM (the u+1
    neighbor pre-packed with the edge clamp); the kernel's one-roll
    conversion must yield BIT-IDENTICAL taps to the two-roll u16 path, so
    the rendered frames match exactly."""
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.volume.io import get_bonsai
    import vokselis_tpu.ops.pallas.march_bonsai as mb

    vol = get_bonsai(32)
    u = Camera.bonsai(1.0).uniform()
    r16 = mb.BonsaiRenderer(vol, prequad=False)  # pin: VOK_PREQUAD-proof
    r32 = mb.BonsaiRenderer(vol, prequad=True)
    assert r16.layouts[0].dtype == jnp.uint16
    assert r32.layouts[0].dtype == jnp.int32
    img16 = np.asarray(r16(u, width=32, height=32))
    img32 = np.asarray(r32(u, width=32, height=32))
    assert np.array_equal(img16, img32)


def test_window_and_fusion_policy():
    """auto_win_rows / pick_tiles_per_step encode TPU-measured tradeoffs:
    fused pairs at large frames (96-row floor — est-sized windows overflow
    zoomed-out diagonal poses), singles for small frames / big volumes."""
    from vokselis_tpu.ops.pallas.march_bonsai import (
        auto_win_rows,
        pick_tiles_per_step,
    )

    assert pick_tiles_per_step(256, 1024, 1024) == 2
    assert pick_tiles_per_step(256, 1920, 1080) == 2
    assert pick_tiles_per_step(256, 512, 512) == 2
    assert pick_tiles_per_step(256, 256, 256) == 1  # est 224 > 128
    assert pick_tiles_per_step(512, 512, 512) == 1  # big volume
    assert pick_tiles_per_step(256, 1024, 1024, cap=64) == 1  # small layout

    assert auto_win_rows(256, 1024, 1024, 1) == 64
    assert auto_win_rows(256, 640, 360, 1) == 112  # 96 overflowed
    assert auto_win_rows(256, 1024, 1024, 2) == 96  # pair floor
    assert auto_win_rows(256, 512, 512, 2) == 128
    assert auto_win_rows(256, 512, 512, 1) == 88


def test_bonsai_kernel_fused_tile_pairs():
    """tiles_per_step=2 (two 32x32 tiles per grid step — the 1024^2 default
    via pick_tiles_per_step) must match the oracle exactly. Small test
    volumes never auto-pick fusion (their per-pair window demand exceeds
    the cap), so drive the static arg directly."""
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.ops.reference import render_bonsai
    from vokselis_tpu.volume.io import get_bonsai
    import vokselis_tpu.ops.pallas.march_bonsai as mb

    vol = get_bonsai(32)
    r = mb.BonsaiRenderer(vol)
    for cam in (Camera.bonsai(1.0),
                Camera(zoom=1.3, pitch=0.2, yaw=2.2, target=(0.5, 0.5, 0.5),
                       aspect=1.0)):
        u = cam.uniform()
        img_p, ovf = mb._render_bonsai_pallas(
            r.layouts, u, 64, 64, r.dims, 64, True,
            96, r.band_rows, r.nb, r.bstride, 2,
        )
        assert int(np.asarray(ovf)) == 0
        img_o = np.asarray(
            render_bonsai(jnp.asarray(vol), u, width=64, height=64,
                          max_steps=64)
        )
        err = np.abs(np.asarray(img_p) - img_o)
        assert err.max() < 1e-3, err.max()
        assert err.mean() < 1e-5


def test_bonsai_kernel_eye_inside():
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.ops.reference import render_bonsai
    from vokselis_tpu.volume.io import get_bonsai
    import vokselis_tpu.ops.pallas.march_bonsai as mb

    vol = get_bonsai(32)
    cam = Camera(zoom=0.3, pitch=0.1, yaw=0.7, target=(0.5, 0.5, 0.5), aspect=1.0)
    r = mb.BonsaiRenderer(vol)
    # strict mode: overflowed frames fall back to the oracle, so parity must
    # hold UNCONDITIONALLY (round-1 escape hatch removed)
    img_p = np.asarray(r(cam.uniform(), width=32, height=32, strict=True))
    img_o = np.asarray(render_bonsai(jnp.asarray(vol), cam.uniform(), width=32, height=32))
    assert np.abs(img_p - img_o).max() < 1e-3
    assert np.isfinite(img_p).all()


def test_bonsai_strict_fallback_on_overflow():
    """A deliberately tiny window forces the overflow flag; strict mode must
    detect it and return oracle-exact pixels anyway."""
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.ops.reference import render_bonsai
    from vokselis_tpu.volume.io import get_bonsai
    import vokselis_tpu.ops.pallas.march_bonsai as mb

    vol = get_bonsai(64)
    cam = Camera(zoom=0.25, pitch=0.2, yaw=0.5, target=(0.5, 0.5, 0.5), aspect=1.0)
    r = mb.BonsaiRenderer(vol, win_rows=16)
    img_p = np.asarray(r(cam.uniform(), width=32, height=32, strict=True))
    assert int(np.asarray(r.last_overflow)) > 0, (
        "test premise: this pose must overflow a 16-row window"
    )
    img_o = np.asarray(
        render_bonsai(jnp.asarray(vol), cam.uniform(), width=32, height=32)
    )
    assert np.abs(img_p - img_o).max() < 1e-6  # strict returned the oracle


def test_field_kernel_nonzero_time_all_combos():
    """Parity at time=1.7 for every (field, shading, quantize) combination —
    guards the trig raw-time vs sin(time) semantics (round-1 VERDICT weak #4:
    all parity tests pinned time=0 and masked a divergence)."""
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.ops.reference import render_compute_inline, render_field
    from vokselis_tpu.volume import fields
    import vokselis_tpu.ops.pallas.march_field as mf

    u = Camera.xor(1.0).uniform()
    t = 1.7
    combos = [
        ("noise", "xor", True, lambda: render_compute_inline(
            u, t, width=32, height=32, max_steps=32, field=fields.noise_volume)),
        ("trig", "emission", False, lambda: render_field(
            u, t, width=32, height=32, max_steps=32, field=fields.trig_field)),
    ]
    for field, shading, quantize, oracle in combos:
        img_p = np.asarray(
            mf.render_field_pallas(
                u, t, width=32, height=32, field=field, shading=shading,
                quantize=quantize, tile_h=16, tile_w=128, max_steps=32,
                sphere_clip=False, grad="fd",
            )
        )
        img_o = np.asarray(oracle())
        err = np.abs(img_p - img_o)
        assert err.max() < 5e-3, f"{field}/{shading} max {err.max()}"
        assert err.mean() < 1e-4, f"{field}/{shading} mean {err.mean()}"


def test_field_kernel_sphere_clip_parity():
    """The shipped default path (sphere_clip=True) must match the oracle —
    the clip is exact empty-space skipping, not an approximation. Full
    max_steps: with a step CAP the clip legitimately reaches deeper than the
    oracle (the cap truncates different sample sets), so exactness only
    holds when both paths march to completion. Early exit keeps this fast."""
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.ops.reference import render_compute_inline
    import vokselis_tpu.ops.pallas.march_field as mf

    u = Camera.xor(1.0).uniform()
    img_p = np.asarray(
        mf.render_field_pallas(
            u, 0.0, width=16, height=16, tile_h=8, tile_w=128,
            sphere_clip=True, grad="fd",
        )
    )
    img_o = np.asarray(render_compute_inline(u, width=16, height=16))
    err = np.abs(img_p - img_o)
    assert err.max() < 5e-3
    assert err.mean() < 1e-5


def test_bonsai_kernel_border_volume_parity():
    """Regression (round-2 review): the int32 quad packing dropped the
    LOW-edge u clamp — for u in [-0.5, 0) the oracle taps column 0 twice,
    not columns (0, 1). Hidden by the bonsai volume's empty borders; this
    random volume fills them."""
    import numpy as np
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.ops.reference import render_bonsai
    import vokselis_tpu.ops.pallas.march_bonsai as mb

    rng = np.random.default_rng(5)
    vol = rng.integers(30, 220, (32, 32, 32), dtype=np.uint8)
    for cam in (Camera.bonsai(1.0),
                Camera(zoom=1.3, pitch=0.2, yaw=2.2, target=(0.5, 0.5, 0.5),
                       aspect=1.0)):
        u = cam.uniform()
        r = mb.BonsaiRenderer(vol)
        img_p = np.asarray(r(u, width=32, height=32))
        img_o = np.asarray(
            render_bonsai(jnp.asarray(vol), u, width=32, height=32)
        )
        err = np.abs(img_p - img_o)
        assert int(np.asarray(r.last_overflow)) == 0
        assert err.max() < 1e-3, err.max()
        assert err.mean() < 1e-5


def test_banded_resample_matches_full():
    """The round-5 banded second matmul (dv windows from _band_meta) vs
    the full contraction, on a volume deep enough to enable banding
    (d >= _WB), including slabs whose windows overflow (|s_k| large ->
    per-slab full-contraction fallback) and sentinel-padded slabs."""
    import numpy as np
    import jax.numpy as jnp
    import vokselis_tpu.ops.pallas.shear_resample as sr

    assert sr._BAND, "banding must be on by default"
    rng = np.random.default_rng(3)
    d, g, ii = 128, 61, 256  # d > _WB -> real windows; ii gives 2 blocks
    vol = jnp.asarray(rng.random((g, d, d)), jnp.float32)
    gp = 64
    em = -40.0
    denom = 80.0  # s_k in ~[0.5, 1.3]: shallow slabs band, steep overflow
    s_k = (np.arange(gp) + 0.5 - em) / denom  # up to ~1.7
    grid = np.linspace(-5, d + 5, ii)
    pos_u = em + s_k[:, None] * (grid[None, :] - em)
    pos_v = em + s_k[:, None] * (grid[None, :] * 0.9 - em)
    valid = (np.arange(gp) < g)[:, None]
    pos_u = jnp.asarray(np.where(valid, pos_u, -1e6), jnp.float32)
    pos_v = jnp.asarray(np.where(valid, pos_v, -1e6), jnp.float32)

    # the steep-slab geometry must actually exercise BOTH paths
    _, bflag = sr._band_meta(pos_v, d, ii // 128)
    bflag = np.asarray(bflag)[:g]
    assert bflag.min() == 0 and bflag.max() == 1, bflag

    res_band = sr.resample_slabs(vol, pos_u, pos_v, interpret=True)
    try:
        sr._BAND = False
        res_full = sr.resample_slabs(vol, pos_u, pos_v, interpret=True)
    finally:
        sr._BAND = True
    err = np.abs(np.asarray(res_band, np.float32)
                 - np.asarray(res_full, np.float32)).max()
    assert err == 0.0, err


def test_resample_composite_matches_dense_reference():
    """shear_resample's fused resample + chunk-compacted composite vs a
    dense jnp resample + sequential composite, both marching directions
    (f32 slabs so the comparison isolates logic, not bf16 rounding)."""
    import numpy as np
    import jax.numpy as jnp
    import vokselis_tpu.ops.pallas.shear_resample as sr
    from vokselis_tpu.core.colors import bonsai_transfer_soa

    sr._SLAB_DTYPE = jnp.float32
    rng = np.random.default_rng(0)
    d, g, ii = 32, 31, 128
    vol = jnp.asarray(
        rng.random((g, d, d)) * (rng.random((g, d, d)) > 0.7), jnp.float32
    )
    gp = 32
    em, denom = -50.0, 70.0
    s_k = (np.arange(gp) + 0.5 - em) / denom
    grid = np.linspace(-5, d + 5, ii)
    pos_u = em + s_k[:, None] * (grid[None, :] - em)
    pos_v = em + s_k[:, None] * (grid[None, :] * 0.9 - em)
    valid = (np.arange(gp) < g)[:, None]
    pos_u = jnp.asarray(np.where(valid, pos_u, -1e6), jnp.float32)
    pos_v = jnp.asarray(np.where(valid, pos_v, -1e6), jnp.float32)
    irho = jnp.asarray(1.0 + rng.random((ii, ii)), jnp.float32)

    cols = np.arange(d)
    wu = np.maximum(0, 1 - np.abs(np.asarray(pos_u)[:, None, :] - cols[None, :, None]))
    wv = np.maximum(0, 1 - np.abs(np.asarray(pos_v)[:, None, :] - cols[None, :, None]))
    res_ref = np.einsum(
        "kvi,kvd,kdu->kiu", wv.astype(np.float32),
        np.pad(np.asarray(vol), ((0, gp - g), (0, 0), (0, 0))),
        wu.astype(np.float32),
    )
    for sgn in (1, -1):
        planes = sr.resample_composite(
            vol, pos_u, pos_v, jnp.int32(sgn), irho
        )
        order = range(gp) if sgn > 0 else range(gp - 1, -1, -1)
        acc = [np.zeros((ii, ii)) for _ in range(4)]
        irho_n = np.asarray(irho)
        for k in order:
            tv, cr, cg, cb = [
                np.asarray(x) for x in bonsai_transfer_soa(jnp.asarray(res_ref[k]))
            ]
            tv = 1 - np.exp(irho_n * np.log(1 - tv))
            live = (acc[3] < 0.95).astype(np.float32)
            w = (1 - acc[3]) * tv * live
            for ch, cc in enumerate((cr, cg, cb)):
                acc[ch] += w * cc
            acc[3] += w
        for got, want in zip(planes, acc):
            assert np.abs(np.asarray(got) - want).max() < 1e-4


def test_tiles_subset_matches_full_march():
    """render_bonsai_tiles_pallas marches exactly the listed tiles (same
    pixels as the full-frame entry) and padded ids drop on scatter."""
    import numpy as np
    import jax.numpy as jnp
    from vokselis_tpu.core import geometry
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.volume.io import get_bonsai
    import vokselis_tpu.ops.pallas.march_bonsai as mb

    vol = get_bonsai(32)
    meta, pack = mb.prepare_volume(vol, 64)
    dims, band_rows, nb, bstride = meta
    u = Camera.bonsai(1.0).uniform()
    w = h = 64  # 2x2 tiles
    eye, dxyz = geometry.rays_fragment_soa(u, w, h)
    full, _ = mb.render_bonsai_rays_pallas(
        pack, eye, dxyz, dims, 64, False, 64, band_rows, nb, bstride
    )
    full_packed = mb._pack_tiles(full[..., 0], h, w)

    ids = jnp.asarray([2, 1, 4], jnp.int32)  # 4 = padded (all-miss)
    planes, ovf = mb.render_bonsai_tiles_pallas(
        pack, eye, dxyz, ids, dims, 64, 64, band_rows, nb, bstride
    )
    assert int(ovf) == 0
    for i, tid in enumerate((2, 1)):
        got = np.asarray(planes[0][i * 8:(i + 1) * 8])
        want = np.asarray(full_packed[tid * 8:(tid + 1) * 8])
        assert np.abs(got - want).max() < 1e-6, tid
    # padded entry: all-miss tile -> black
    assert np.abs(np.asarray(planes[0][16:24])).max() == 0.0


def test_tiles_into_merges_over_base():
    """render_bonsai_tiles_into writes exact tiles IN PLACE over aliased
    base planes: selected blocks match the full march, unselected blocks
    keep the base values."""
    import numpy as np
    import jax.numpy as jnp
    from vokselis_tpu.core import geometry
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.volume.io import get_bonsai
    import vokselis_tpu.ops.pallas.march_bonsai as mb

    vol = get_bonsai(32)
    meta, pack = mb.prepare_volume(vol, 64)
    dims, band_rows, nb, bstride = meta
    u = Camera.bonsai(1.0).uniform()
    w = h = 64  # 2x2 tiles
    eye, dxyz = geometry.rays_fragment_soa(u, w, h)
    full, _ = mb.render_bonsai_rays_pallas(
        pack, eye, dxyz, dims, 64, False, 64, band_rows, nb, bstride
    )
    full_packed = mb._pack_tiles(full[..., 0], h, w)

    n_tiles = 4
    base = tuple(
        jnp.full(((n_tiles + 1) * 8, 128), 7.0 + ch, jnp.float32)
        for ch in range(3)
    )
    ids = jnp.asarray([2, 1, 4], jnp.int32)  # 4 = padded (pad tile)
    planes, ovf = mb.render_bonsai_tiles_into(
        pack, base, u, ids, w, h, dims, 64, 64, band_rows, nb, bstride
    )
    assert int(ovf) == 0
    got_r = np.asarray(planes[0])
    for tid in (2, 1):
        want = np.asarray(full_packed[tid * 8:(tid + 1) * 8])
        assert np.abs(got_r[tid * 8:(tid + 1) * 8] - want).max() < 1e-6, tid
    # unselected tiles keep the base value
    for tid in (0, 3):
        assert (got_r[tid * 8:(tid + 1) * 8] == 7.0).all(), tid
    assert (np.asarray(planes[2])[0:8] == 9.0).all()

    # fast_transfer (the hybrid's production setting): polynomial palette,
    # exact alpha/weights -> linear-space error bounded by the per-sample
    # fit (<= 1.4e-6, tools/fit_transfer_poly.py)
    base2 = tuple(
        jnp.full(((n_tiles + 1) * 8, 128), 7.0 + ch, jnp.float32)
        for ch in range(3)
    )
    planes_f, _ = mb.render_bonsai_tiles_into(
        pack, base2, u, ids, w, h, dims, 64, 64, band_rows, nb, bstride,
        fast_transfer=True,
    )
    got_f = np.asarray(planes_f[0])
    for tid in (2, 1):
        want = np.asarray(full_packed[tid * 8:(tid + 1) * 8])
        assert np.abs(got_f[tid * 8:(tid + 1) * 8] - want).max() < 5e-6, tid


def test_tiles_into_pairs_matches_full_march():
    """tiles_per_step=2: pair ids march BOTH member tiles exactly (the
    re-march analog of the full-frame kernel's 2-tile grid-step fusion);
    unselected pairs keep base values and the parked id drops."""
    import numpy as np
    import jax.numpy as jnp
    from vokselis_tpu.core import geometry
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.volume.io import get_bonsai
    import vokselis_tpu.ops.pallas.march_bonsai as mb

    vol = get_bonsai(32)
    meta, pack = mb.prepare_volume(vol, 96)
    dims, band_rows, nb, bstride = meta
    u = Camera.bonsai(1.0).uniform()
    w, h = 128, 64  # 4x2 tiles -> 4 pairs
    eye, dxyz = geometry.rays_fragment_soa(u, w, h)
    full, _ = mb.render_bonsai_rays_pallas(
        pack, eye, dxyz, dims, 64, False, 96, band_rows, nb, bstride
    )
    full_packed = mb._pack_tiles(full[..., 0], h, w)

    n_tiles = 8
    base = tuple(
        jnp.full(((n_tiles + 2) * 8, 128), 7.0 + ch, jnp.float32)
        for ch in range(3)
    )
    ids = jnp.asarray([2, 1, 4], jnp.int32)  # pairs; 4 = parked
    planes, ovf = mb.render_bonsai_tiles_into(
        pack, base, u, ids, w, h, dims, 64, 96, band_rows, nb, bstride,
        tiles_per_step=2,
    )
    assert int(ovf) == 0
    got_r = np.asarray(planes[0])
    for tid in (2, 3, 4, 5):  # pairs 1, 2 -> tiles 2..5
        want = np.asarray(full_packed[tid * 8:(tid + 1) * 8])
        assert np.abs(got_r[tid * 8:(tid + 1) * 8] - want).max() < 1e-6, tid
    for tid in (0, 1, 6, 7):  # pairs 0, 3 unselected
        assert (got_r[tid * 8:(tid + 1) * 8] == 7.0).all(), tid


def test_hybrid_full_budget_matches_exact():
    """With budget = every tile and thresh 0 the hybrid frame IS the exact
    kernel frame (fast pixels fully replaced)."""
    import numpy as np
    import jax.numpy as jnp
    from vokselis_tpu.core import geometry
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.core.colors import linear_to_srgb
    from vokselis_tpu.volume.io import get_bonsai
    import vokselis_tpu.ops.pallas.march_bonsai as mb
    import vokselis_tpu.ops.hybrid as hy

    vol = get_bonsai(32)
    u = Camera.bonsai(1.0).uniform()
    w = h = 64
    r = hy.HybridBonsaiRenderer(vol, intermediate=128, budget=4,
                                thresh=-1.0, win_cap=64)
    img_h = np.asarray(r(u, w, h))

    meta, pack = mb.prepare_volume(vol, 64)
    dims, band_rows, nb, bstride = meta
    eye, dxyz = geometry.rays_fragment_soa(u, w, h)
    img_e, _ = mb.render_bonsai_rays_pallas(
        pack, eye, dxyz, dims, mb.MAX_STEPS_BONSAI, True,
        64, band_rows, nb, bstride,
    )
    # 3e-5, not 1e-5: the re-march's polynomial palette is <= 1.4e-6 per
    # channel in linear space, up to ~1.8e-5 through the 12.92 dark-region
    # sRGB slope (alpha/weights stay exact — tv is polynomial already)
    assert np.abs(img_h[..., :3] - np.asarray(img_e)[..., :3]).max() < 3e-5


def test_prepare_volume_device_matches_host():
    """Device (jit) repack is bit-identical to the host numpy pack — the
    config-5 time-varying path swaps them freely."""
    import numpy as np
    import jax.numpy as jnp
    import vokselis_tpu.ops.pallas.march_bonsai as mb

    rng = np.random.default_rng(3)
    for d in (16, 32):
        vol = ((rng.random((d, d, d)) > 0.6)
               * rng.integers(0, 255, (d, d, d))).astype(np.uint8)
        for pq in (False, True):
            meta, pack = mb.prepare_volume(vol, 64, prequad=pq)
            assert meta == mb.volume_layout_meta(d, 64)
            dev = mb.prepare_volume_device(jnp.asarray(vol), 64, prequad=pq)
            for name, a, b in zip(("banded", "occ", "cranges"), pack, dev):
                a, b = np.asarray(a), np.asarray(b)
                assert a.shape == b.shape and a.dtype == b.dtype, (name, pq)
                assert (a == b).all(), (name, pq)


def test_generate_density_u8_matches_field():
    """The config-5 device volume generator quantizes the radially-masked
    fbm alpha exactly like a direct field evaluation."""
    import numpy as np
    import jax.numpy as jnp
    import vokselis_tpu.ops.pallas.genvol as gv
    from vokselis_tpu.volume import fields_soa

    d = 16
    got = np.asarray(gv.generate_density_u8_pallas(1.25, d, tile_z=8,
                                                   tile_y=8))
    half = d / 2.0
    z, y, x = np.meshgrid(*([np.arange(d, dtype=np.float32)] * 3),
                          indexing="ij")
    cx, cy, cz = (x - half) / d, (y - half) / d, (z - half) / d
    sin_t = jnp.sin(jnp.float32(1.25))
    _, alpha = fields_soa.noise_volume(
        jnp.asarray(cx), jnp.asarray(cy), jnp.asarray(cz), sin_t
    )
    want = np.clip(np.asarray(alpha) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    assert (np.abs(got.astype(int) - want.astype(int)) <= 1).all()
