"""Shear-warp fast renderer: correctness of the warp kernel and bounded
error vs the exact oracle (the fast mode is documented-approximate; its
error budget here is what PARITY_REPORT.md reports)."""

import numpy as np
import jax.numpy as jnp
import pytest

import jax.experimental.pallas as pl


@pytest.fixture(params=["mxu", "scan"])
def interpret(monkeypatch, request):
    """Interpret-mode warp2d, parametrized over BOTH kernels: the
    VMEM-resident MXU formulation (default for I that fits) and the
    banded-DMA row-scan fallback (large intermediates)."""
    monkeypatch.setenv("VOK_WARP_MXU", "1" if request.param == "mxu" else "0")
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    import importlib
    import vokselis_tpu.ops.pallas.warp2d as w2

    importlib.reload(w2)
    yield
    monkeypatch.delenv("VOK_WARP_MXU", raising=False)
    importlib.reload(w2)


def test_warp_kernel_matches_map_coordinates(interpret):
    from jax.scipy.ndimage import map_coordinates
    import vokselis_tpu.ops.pallas.warp2d as w2

    rng = np.random.default_rng(7)
    ii = 64
    chans = jnp.asarray(rng.random((3, ii, ii), dtype=np.float32))
    # rotated + scaled coords covering in-range and out-of-range
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32)
    av = jnp.asarray(0.9 * yy + 0.3 * xx + 2.7)
    bu = jnp.asarray(-0.2 * yy + 1.1 * xx + 5.1)
    got = np.asarray(w2.warp_bilinear_pallas(chans, av, bu))
    want = np.stack([
        np.asarray(map_coordinates(c, [av, bu], order=1, mode="nearest"))
        for c in chans
    ])
    # interior: bf16-band quantization only (~0.4%); borders differ
    # (kernel edge-clamps, pad ring ~ zero)
    interior = (np.asarray(av) > 1) & (np.asarray(av) < ii - 2) & \
               (np.asarray(bu) > 1) & (np.asarray(bu) < ii - 2)
    err = np.abs(got - want)[:, interior]
    assert err.max() < 5e-3
    assert np.isfinite(got).all()


def test_fast_renderer_error_vs_oracle():
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.ops.reference import render_bonsai
    from vokselis_tpu.ops.shear_warp import FastBonsaiRenderer
    from vokselis_tpu.volume.io import get_bonsai

    vol = get_bonsai(64)
    r = FastBonsaiRenderer(vol, intermediate=128)
    for cam in (
        Camera.bonsai(1.0),
        Camera(zoom=1.2, pitch=0.9, yaw=1.1, target=(0.5, 0.5, 0.5), aspect=1.0),
        Camera(zoom=1.0, pitch=0.1, yaw=0.0, target=(0.5, 0.5, 0.5), aspect=1.0),
    ):
        u = cam.uniform()
        img_f = np.asarray(r(u, width=64, height=64))
        img_o = np.asarray(render_bonsai(jnp.asarray(vol), u, width=64, height=64))
        err = np.abs(img_f - img_o)
        assert np.isfinite(img_f).all()
        # documented fast-mode budget: mean error < 1%, p99 < 0.15
        assert err.mean() < 0.01, err.mean()
        assert np.quantile(err, 0.99) < 0.15


def test_fast_renderer_functional_api():
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.ops.shear_warp import build_fast_renderer
    from vokselis_tpu.volume.io import get_bonsai

    render, pack = build_fast_renderer(get_bonsai(32), intermediate=64)
    img = np.asarray(render(pack, Camera.bonsai(1.0).uniform(), 32, 32))
    assert img.shape == (32, 32, 4)
    assert np.isfinite(img).all()


def test_warp_kernel_silhouette_tile_not_dragged(interpret):
    """Regression (round-2 review): one parked (non-hit) pixel in a tile
    must not drag the window base to row 0 and clamp the hit pixels' taps.
    Misses are parked HIGH (+1e6) by _warp_to_screen."""
    from jax.scipy.ndimage import map_coordinates
    import vokselis_tpu.ops.pallas.warp2d as w2

    rng = np.random.default_rng(9)
    ii = 128
    chans = jnp.asarray(rng.random((3, ii, ii), dtype=np.float32))
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32)
    av_np = 0.4 * yy + 90.0
    bu_np = 0.4 * xx + 30.0
    av_np[0, 0] = 1e6  # one parked miss pixel, as the silhouette produces
    bu_np[0, 0] = 1e6
    got = np.asarray(w2.warp_bilinear_pallas(
        chans, jnp.asarray(av_np), jnp.asarray(bu_np)))
    want = np.stack([
        np.asarray(map_coordinates(c, [av_np, bu_np], order=1, mode="nearest"))
        for c in chans
    ])
    hitm = np.ones((32, 32), bool)
    hitm[0, 0] = False
    err = np.abs(got - want)[:, hitm]
    assert err.max() < 5e-3, err.max()


def test_composite_kernel_matches_sequential(monkeypatch):
    """The fused composite kernel (TPU path) vs a plain sequential
    under-composite with the same semantics: raw-tv palette color,
    irho-corrected alpha rate, per-pixel 0.95 march stop, descending order."""
    import importlib

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    import vokselis_tpu.ops.pallas.composite as comp

    importlib.reload(comp)
    try:
        from vokselis_tpu.core.colors import bonsai_transfer_soa

        rng = np.random.default_rng(11)
        g, ih, iw = 40, 16, 128  # lanes must be a multiple of 128
        # dense high values so some pixels cross the 0.95 stop
        res = jnp.asarray(rng.random((g, ih, iw), dtype=np.float32) * 0.9)
        irho = jnp.asarray(1.0 + rng.random((ih, iw), dtype=np.float32) * 0.7)
        for sgn in (1, -1):
            got = comp.composite_pallas(res, jnp.int32(sgn), irho)
            r = np.zeros((ih, iw), np.float32)
            gch = np.zeros((ih, iw), np.float32)
            b = np.zeros((ih, iw), np.float32)
            a = np.zeros((ih, iw), np.float32)
            # the kernel stores slabs as bf16: quantize the reference input
            # identically so the comparison isolates the composite math
            res_q = jnp.asarray(res, comp._SLAB_DTYPE).astype(jnp.float32)
            order = range(g) if sgn > 0 else range(g - 1, -1, -1)
            for k in order:
                tv, cr, cg, cb = (np.asarray(x) for x in
                                  bonsai_transfer_soa(res_q[k]))
                tv = 1.0 - np.exp(np.asarray(irho) * np.log(1.0 - tv))
                live = (a < 0.95).astype(np.float32)
                w = (1.0 - a) * tv * live
                r += w * cr
                gch += w * cg
                b += w * cb
                a += w
            for got_p, want_p in zip(got, (r, gch, b, a)):
                assert np.abs(np.asarray(got_p) - want_p).max() < 1e-4
    finally:
        importlib.reload(comp)


def test_fast_renderer_eye_inside_is_finite():
    """Eye inside the volume along the dominant axis: the shear-warp
    factorization degrades (documented) but must stay FINITE, not NaN
    (round-2 review finding)."""
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.ops.shear_warp import FastBonsaiRenderer
    from vokselis_tpu.volume.io import get_bonsai

    r = FastBonsaiRenderer(get_bonsai(32), intermediate=64)
    cam = Camera(zoom=0.3, pitch=0.1, yaw=0.7, target=(0.5, 0.5, 0.5),
                 aspect=1.0)
    img = np.asarray(r(cam.uniform(), width=32, height=32))
    assert np.isfinite(img).all()


def test_warp_four_channels(interpret):
    """The n_ch generalization (hybrid warps rgb + curvature): 4 channels
    through both kernels match map_coordinates."""
    from jax.scipy.ndimage import map_coordinates
    import vokselis_tpu.ops.pallas.warp2d as w2

    rng = np.random.default_rng(3)
    ii = 64
    chans = jnp.asarray(rng.random((4, ii, ii), dtype=np.float32))
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32)
    av = jnp.asarray(0.8 * yy + 0.2 * xx + 4.0)
    bu = jnp.asarray(0.1 * yy + 1.0 * xx + 8.0)
    got = np.asarray(w2.warp_bilinear_pallas(chans, av, bu))
    want = np.stack([
        np.asarray(map_coordinates(c, [av, bu], order=1, mode="nearest"))
        for c in chans
    ])
    interior = (np.asarray(av) > 1) & (np.asarray(av) < ii - 2) & \
               (np.asarray(bu) > 1) & (np.asarray(bu) < ii - 2)
    assert np.abs(got - want)[:, interior].max() < 5e-3


def test_warp_stats_kernel_matches_xla_mirror(monkeypatch):
    """The in-kernel stats reduction (round-4 hybrid contract) agrees with
    the XLA mirror stats_from_packed: ok-masked rgb outputs, curvature x
    slope / edge sums, extent counts and peak per tile. MXU kernel only
    (the stats contract requires the VMEM-resident formulation)."""
    import jax.experimental.pallas as pl
    import importlib

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )
    import vokselis_tpu.ops.pallas.warp2d as w2

    importlib.reload(w2)
    try:
        from jax.scipy.ndimage import map_coordinates
        from vokselis_tpu.ops.pallas.march_bonsai import _pack_tiles

        rng = np.random.default_rng(11)
        ii = 64
        h = w = 64  # 2x2 tiles
        chans = jnp.asarray(rng.random((4, ii, ii), dtype=np.float32))
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        # gentle map: per-tile footprints fit the default window
        av = jnp.asarray(0.55 * yy + 0.1 * xx + 3.0)
        bu = jnp.asarray(0.6 * xx + 2.0)
        ok = jnp.asarray((rng.random((h, w)) > 0.2).astype(np.float32))
        box = jnp.clip(ok + (rng.random((h, w)) > 0.5), 0.0, 1.0)

        def pack(x):
            return _pack_tiles(x, h, w)

        outs = w2.warp_stats_packed(
            chans, pack(av), pack(bu), pack(ok), pack(jnp.asarray(box)),
            h, w,
        )
        got_rgb = [np.asarray(o) for o in outs[:3]]
        got_stats = np.asarray(outs[3]).reshape(-1, 8, 128)[:, :, 0]

        # mirror on bf16-rounded channels (the kernel's resident dtype)
        cb = np.asarray(chans.astype(jnp.bfloat16).astype(jnp.float32))
        planes = [pack(map_coordinates(jnp.asarray(c), [av, bu], order=1,
                                       mode="nearest")) for c in cb]
        okp = pack(ok)
        planes = [jnp.where(okp > 0, p, 0.0) for p in planes]
        want_stats = np.asarray(w2.stats_from_packed(
            planes[:3], planes[3], jnp.zeros_like(okp), okp,
            pack(jnp.asarray(box)),
        )).reshape(-1, 8, 128)[:, :, 0]

        for c in range(3):
            assert np.abs(got_rgb[c] - np.asarray(planes[c])).max() < 2e-2
        # counts exact; sums within the bf16 resample band
        assert (got_stats[:, w2.STAT_EXT] == want_stats[:, w2.STAT_EXT]).all()
        assert (got_stats[:, w2.STAT_OVF] == 0).all()
        for row in (w2.STAT_CURV, w2.STAT_EDGE, w2.STAT_PEAK):
            g, wv = got_stats[:, row], want_stats[:, row]
            assert np.abs(g - wv).max() <= 0.02 * max(1.0, np.abs(wv).max()), row
    finally:
        monkeypatch.undo()
        importlib.reload(w2)


def test_warp_overflow_flag():
    """The MXU kernel flags hit pixels whose footprint exceeds the window
    (the hybrid re-marches those tiles); a window covering the footprint
    clears the flag."""
    import importlib
    import jax.experimental.pallas as pl
    import vokselis_tpu.ops.pallas.warp2d as w2

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pl.pallas_call = patched
    try:
        importlib.reload(w2)
        ii = 128
        chans = jnp.zeros((3, ii, ii), jnp.float32)
        yy, xx = np.mgrid[0:32, 0:32].astype(np.float32)
        # v footprint spans ~64 rows inside one 32x32 tile
        av = jnp.asarray(2.0 * yy + 1.0)
        bu = jnp.asarray(xx + 1.0)
        _, ovf_small = w2.warp_bilinear_pallas(
            chans, av, bu, None, win_rows=16, with_overflow=True,
            adaptive=False)
        _, ovf_big = w2.warp_bilinear_pallas(
            chans, av, bu, None, win_rows=96, with_overflow=True,
            adaptive=False)
        assert np.asarray(ovf_small).sum() > 0
        assert np.asarray(ovf_big).sum() == 0
        # adaptive two-pass: the same overflowing footprint is re-warped
        # at the big window — flags clear and values match the exact lerp
        rng = np.random.default_rng(3)
        chans_r = jnp.asarray(rng.random((3, ii, ii), dtype=np.float32))
        planes, ovf_ad = w2.warp_bilinear_pallas(
            chans_r, av, bu, None, win_rows=16, with_overflow=True)
        assert np.asarray(ovf_ad).sum() == 0
        from jax.scipy.ndimage import map_coordinates

        want = np.stack([
            np.asarray(map_coordinates(c, [av, bu], order=1,
                                       mode="nearest"))
            for c in chans_r
        ])
        assert np.abs(np.asarray(planes) - want).max() < 5e-3
    finally:
        pl.pallas_call = orig
        importlib.reload(w2)


def test_rewarp_cap_bounds_cost_not_correctness():
    """Adaptive two-pass contract: tiles past the re-warp cap keep their
    pass-1 overflow flags (the hybrid's exact re-march covers them), and
    an uncapped pass clears every flag."""
    import importlib
    import jax.experimental.pallas as pl
    import vokselis_tpu.ops.pallas.warp2d as w2

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pl.pallas_call = patched
    try:
        importlib.reload(w2)
        ii, hw = 128, 256  # pass-1 default window at 256^2 is 40 rows
        rng = np.random.default_rng(7)
        chans = jnp.asarray(rng.random((3, ii, ii), dtype=np.float32))
        yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32)
        top = yy < 128  # top-half tiles: 64-row footprint (overflows 40)
        av = jnp.asarray(np.where(top, 2.0 * (yy % 32), 0.5 * (yy % 32)) + 1.0)
        bu = jnp.asarray((xx % 32) + 1.0)

        w2._REWARP_CAP = 64  # >= n_tiles: every overflowed tile re-warped
        w2.warp_bilinear_packed.clear_cache()
        _, ovf_all = w2.warp_bilinear_pallas(
            chans, av, bu, None, with_overflow=True)
        assert np.asarray(ovf_all).sum() == 0

        w2._REWARP_CAP = 4  # only the worst 4 tiles re-warped
        w2.warp_bilinear_packed.clear_cache()
        _, ovf_capped = w2.warp_bilinear_pallas(
            chans, av, bu, None, with_overflow=True)
        n_flagged = (np.asarray(ovf_capped).reshape(8, 32, 8, 32)
                     .max(axis=(1, 3)) > 0).sum()
        assert n_flagged == 32 - 4  # 32 overflowing tiles, 4 cleared
    finally:
        pl.pallas_call = orig
        importlib.reload(w2)


def test_pose_hint_classification():
    """pose_hint: close zooms and eye-in-slab-range poses are degenerate;
    the bench pose is not; diagonal yaws demand wider windows than
    axis-aligned ones (measured footprint behavior, round 3)."""
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.ops.shear_warp import pose_hint

    def hint(zoom, pitch, yaw):
        u = Camera(zoom=zoom, pitch=pitch, yaw=yaw,
                   target=(0.5, 0.5, 0.5), aspect=1.0).uniform()
        return pose_hint(u, 1024, 1024, 512, 256)

    assert hint(0.6, 0.5, 0.0)[2] is True  # close-up: magnified
    assert pose_hint(Camera.bonsai(1.0).uniform(), 1024, 1024, 512, 256)[2] \
        is False
    ax = hint(1.0, 0.5, 0.0)
    diag = hint(1.6, 0.5, 2 * np.pi / 8)
    assert ax[2] is False
    assert diag[0] > ax[0] or diag[1] > ax[1]  # wider window off-axis
    # near-slab scale collapse (s_near < 0.25): every zoom-0.6 close-up is
    # degenerate at EVERY intermediate — the per-slab sample-phase banding
    # those poses surface is intermediate-independent (CPU 72-pose sweep,
    # round 3: 5e-3 diffuse error at zoom 0.6 / pitch 1.2 before this)
    for yaw in (0.0, np.pi / 4):
        assert hint(0.6, 1.2, yaw)[2] is True
        u = Camera(zoom=0.6, pitch=1.2, yaw=yaw,
                   target=(0.5, 0.5, 0.5), aspect=1.0).uniform()
        assert pose_hint(u, 1024, 1024, 768, 256)[2] is True
    assert hint(1.0, 1.2, 0.0)[2] is False  # zoom 1.0: s_near ~0.47


def test_render_fast_aux_consistency():
    """return_aux adds (bad, errd) without changing the frame; excluded
    pixels are black and flagged."""
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.ops.shear_warp import FastBonsaiRenderer, _render_fast
    from vokselis_tpu.volume.io import get_bonsai

    vol = get_bonsai(32)
    r = FastBonsaiRenderer(vol, intermediate=64)
    u = Camera.bonsai(1.0).uniform()
    plain = np.asarray(_render_fast(r.packs, u, 96, 96, 64, True))
    img, bad, errd = _render_fast(r.packs, u, 96, 96, 64, True,
                                  return_aux=True)
    img, bad, errd = np.asarray(img), np.asarray(bad), np.asarray(errd)
    assert np.array_equal(img, plain)
    assert errd.shape == (96, 96) and (errd >= 0).all()
    assert bad.dtype == np.int8  # bitmask: 1 = out-of-extent, 2 = overflow
    assert img[..., :3][(bad & 1) == 1].max(initial=0.0) == 0.0  # -> black


def test_window_any_matches_window_counts():
    """The vectorized occupied-window test (_window_any, round 5: the
    prefix-sum take_along_axis gathers ran scalar-rate on TPU) must agree
    with `_window_counts(...) > 0` on every window class: interior,
    clipped-low/high, inverted-empty, and the -1e6 pad sentinel."""
    import jax.numpy as jnp
    from vokselis_tpu.ops.shear_warp import _window_any, _window_counts

    rng = np.random.default_rng(7)
    g, ng, nwin = 24, 32, 16
    tab = jnp.asarray(rng.random((g, ng)) > 0.6)
    cum = jnp.pad(jnp.cumsum(tab.astype(jnp.int32), axis=1), ((0, 0), (1, 0)))

    lo = jnp.asarray(rng.uniform(-40.0, 8.0 * ng + 40.0, (g, nwin)),
                     jnp.float32)
    span = jnp.asarray(rng.uniform(0.0, 120.0, (g, nwin)), jnp.float32)
    hi = lo + span
    # sprinkle pad sentinels and inverted windows
    lo = lo.at[0].set(-1e6)
    hi = hi.at[0].set(-1e6)
    hi = hi.at[1].set(lo[1] - 50.0)

    want = np.asarray(_window_counts(cum, lo, hi) > 0)
    got = np.asarray(_window_any(tab, lo, hi))
    np.testing.assert_array_equal(got, want)


def test_traced_degraded_flag():
    """The functional hybrid API under an outer jit flags degenerate poses
    (zoom-0.6 close-up: s_near collapse) and passes clean poses — the
    traced mirror of pose_hint's scalar criteria (round-3 review: the
    fallback ladder cannot run under a trace; the flag must)."""
    import jax
    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.ops.shear_warp import pose_hint, traced_degenerate

    d = 256
    good = Camera.bonsai(1.0).uniform()
    bad = Camera(zoom=0.6, pitch=1.2, yaw=0.0, target=(0.5, 0.5, 0.5),
                 aspect=1.0).uniform()

    flag = jax.jit(lambda u: traced_degenerate(u, d))
    assert bool(flag(bad))
    assert not bool(flag(good))
    # agrees with the host-side classifier on these poses
    assert pose_hint(bad, 256, 256, 256, d)[2]
    assert not pose_hint(good, 256, 256, 256, d)[2]


def test_select_units_pair_semantics():
    """Pair selection ranks by SUMMED member scores (greedy per-pose
    mean-error reduction — the sweep gate is per-pose mean) but gates on
    the WORST member; below-thresh picks park at the n_units sentinel."""
    import jax.numpy as jnp
    from vokselis_tpu.ops.hybrid import select_units

    # 8 tiles -> 4 pairs. Pair sums: p0=1.0, p1=0.9, p2=0.05, p3=0.6
    # Pair maxes: p0=0.9, p1=0.5, p2=0.04, p3=0.6
    scores = jnp.array([0.9, 0.1, 0.5, 0.4, 0.04, 0.01, 0.6, 0.0])
    ids = np.asarray(select_units(scores, 8, budget=4, thresh=0.05,
                                  pair=True))
    # budget 4 tiles = 2 pairs: sum-ranking picks p0 (1.0) and p1 (0.9);
    # max-ranking would have picked p0 and p3 (0.6 > 0.5)
    assert set(ids.tolist()) == {0, 1}
    # a pair whose WORST member is below thresh parks at the sentinel
    # even when budget covers it: p2 (max 0.04 < thresh)
    ids = np.asarray(select_units(scores, 8, budget=8, thresh=0.05,
                                  pair=True))
    assert 2 not in ids.tolist() and 4 in ids.tolist()  # 4 == sentinel

    # single-tile mode: plain top-k with per-tile thresh parking at 8
    ids = np.asarray(select_units(scores, 8, budget=3, thresh=0.45,
                                  pair=False))
    assert set(ids.tolist()) == {0, 6, 2}


def test_hybrid_pose_escalation_ladder(monkeypatch):
    """Degenerate-at-512 poses retry the hint at I=768 then I=1024 (only
    steps ABOVE the base intermediate) before surrendering to the exact
    kernel; eye-in-range poses (degenerate at every I) fall back;
    non-degenerate poses render at the configured intermediate."""
    import vokselis_tpu.ops.hybrid as hy

    calls = {}

    def fake_render_hybrid(packs, layouts, u, thresh, w, h, ii, budget,
                           srgb, dims, win, band_rows, nb, bstride,
                           max_steps, wwin=0, wwu=128, pair=False):
        calls["mode"] = ("hybrid", ii, wwin, wwu)
        return "img", 0, False

    def fake_exact(*a, **k):
        calls["mode"] = ("exact",)
        return "img", 0

    hints = {}

    def fake_hint(u, w, h, ii, d):
        return hints[ii]

    r = hy.HybridBonsaiRenderer.__new__(hy.HybridBonsaiRenderer)
    r.packs = r.layouts = None
    r.dims, r.band_rows, r.nb, r.bstride = 32, 80, 1, 16
    r.win_cap = 64
    r.intermediate, r.budget, r.thresh = 512, 8, 0.0
    r.dense_fallback = False

    monkeypatch.setattr(hy, "_render_hybrid", fake_render_hybrid)
    monkeypatch.setattr(hy, "_render_bonsai_pallas", fake_exact)
    monkeypatch.setattr(hy, "pose_hint", fake_hint)
    # pin the adaptive-MXU window collapse OFF: this test checks the
    # pose-hint window PLUMBING through the ladder (the collapse is
    # asserted separately below)
    import vokselis_tpu.ops.pallas.warp2d as w2

    monkeypatch.setattr(w2, "mxu_adaptive_eligible", lambda n, i: False)

    hints = {512: (64, 128, False), 768: (96, 128, False)}
    r._call_traced(None, 64, 64)
    assert calls["mode"] == ("hybrid", 512, 64, 128)

    hints = {512: (128, 256, True), 768: (128, 256, False)}
    r._call_traced(None, 64, 64)
    assert calls["mode"] == ("hybrid", 768, 128, 256)

    # degenerate at 768 too -> the ladder's last step (I=1024) catches it
    hints = {512: (0, 128, True), 768: (0, 128, True),
             1024: (128, 256, False)}
    r._call_traced(None, 64, 64)
    assert calls["mode"] == ("hybrid", 1024, 128, 256)

    hints = {512: (0, 128, True), 768: (0, 128, True),
             1024: (0, 128, True)}
    r._call_traced(None, 64, 64)
    assert calls["mode"] == ("exact",)

    # a pinned hint bypasses the ladder entirely
    hints = {}
    r._call_traced(None, 64, 64, hint=(96, 128, False))
    assert calls["mode"] == ("hybrid", 512, 96, 128)

    # with the adaptive MXU warp eligible, every pose-hint window bucket
    # collapses to the single default variant (windowing moves into the
    # kernel's two-pass logic)
    monkeypatch.setattr(w2, "mxu_adaptive_eligible", lambda n, i: True)
    hints = {512: (128, 256, False)}
    r._call_traced(None, 64, 64)
    assert calls["mode"] == ("hybrid", 512, 0, 128)


def test_dense_volume_routes_to_exact(monkeypatch):
    """Volumes whose occupied fraction exceeds DENSE_OCC_FRAC break the
    hybrid's concentrated-error model (dense_stress fog measured 3.6e-3
    at budget 64, tools/dense_stress_probe) — the renderer must route
    every pose to the exact kernel at prep time, through BOTH the method
    and the functional APIs."""
    import vokselis_tpu.ops.hybrid as hy
    from vokselis_tpu.volume.io import dense_stress, get_bonsai

    calls = {}

    def fake_exact(*a, **k):
        calls["mode"] = "exact"
        return "img", 0

    def fake_render_hybrid(*a, **k):
        calls["mode"] = "hybrid"
        return "img", 0, False

    monkeypatch.setattr(hy, "_render_bonsai_pallas", fake_exact)
    monkeypatch.setattr(hy, "_render_hybrid", fake_render_hybrid)

    dense = hy.HybridBonsaiRenderer(dense_stress(64), budget=8)
    assert dense.dense_fallback and dense.occ_frac > hy.DENSE_OCC_FRAC
    dense._call_traced(None, 64, 64)
    assert calls["mode"] == "exact"

    render, pack = dense.functional()
    out = render(pack, None, 64, 64, with_degraded=True)
    assert calls["mode"] == "exact" and out[2] == False  # noqa: E712

    # the real bonsai stays on the hybrid path (occ_frac ~0.05)
    sparse = hy.HybridBonsaiRenderer(get_bonsai(64), budget=8)
    assert not sparse.dense_fallback
    sparse._call_traced(None, 64, 64, hint=(0, 128, False))
    assert calls["mode"] == "hybrid"


def test_degraded_flag_unmissable_in_public_apis(monkeypatch):
    """Round-4 verdict #7: no public hybrid entry point may render a
    degenerate pose without a signal. build_hybrid_renderer's render
    returns (img, degraded) unconditionally and functional() includes the
    flag BY DEFAULT; the flag itself is _render_hybrid's traced
    traced_degenerate output (correctness of that traced mirror at the
    zoom-0.6 pose is asserted in test_traced_degraded_flag — here the
    plumbing must deliver it to the caller unmodified)."""
    import vokselis_tpu.ops.hybrid as hy
    from vokselis_tpu.volume.io import get_bonsai

    sentinel = object()  # stands in for the traced degraded bool

    def fake_render_hybrid(*a, **k):
        return "img", 7, sentinel

    monkeypatch.setattr(hy, "_render_hybrid", fake_render_hybrid)

    render, pack = hy.build_hybrid_renderer(get_bonsai(64), budget=8)
    img, deg = render(pack, None, 64, 64)
    assert img == "img" and deg is sentinel

    r = hy.HybridBonsaiRenderer(get_bonsai(64), budget=8)
    frender, fpack = r.functional()
    out = frender(fpack, None, 64, 64)  # default: flag included
    assert len(out) == 3 and out[2] is sentinel
    out2 = frender(fpack, None, 64, 64, with_degraded=False)  # opt-out
    assert len(out2) == 2
