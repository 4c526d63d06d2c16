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
    import importlib
    import vokselis_tpu.ops.pallas.march_field as mf
    import vokselis_tpu.ops.pallas.march_bonsai as mb
    import vokselis_tpu.ops.pallas.genvol as gv

    importlib.reload(mf)
    importlib.reload(mb)
    importlib.reload(gv)
    yield
    importlib.reload(mf)
    importlib.reload(mb)
    importlib.reload(gv)


def test_field_kernel_matches_oracle():
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.ops.reference import render_compute_inline
    import vokselis_tpu.ops.pallas.march_field as mf

    u = Camera.xor(1.0).uniform()
    img_p = np.asarray(
        mf.render_field_pallas(
            u, 0.0, width=32, height=32, tile_h=16, tile_w=128, max_steps=32,
            sphere_clip=False,
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
                sphere_clip=False,
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
            sphere_clip=True,
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
