#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the flagship metric.

Flagship: bonsai 256^3 trilinear raymarch at 1024x1024 (BASELINE.json
config 3) on the fused Pallas slab-march kernel, reported as Mrays/sec/chip.
``vs_baseline`` is measured / 500 (the north-star target; the reference
publishes no numbers of its own — BASELINE.md).

Timing method: this environment's device tunnel has a ~29 ms per-dispatch
round-trip floor and an unreliable block_until_ready, so per-frame time is
the SLOPE between 1-frame and N-frame on-device loops (camera varied by a
loop-carried epsilon so nothing folds or hoists).

Run with --all for the full BASELINE.json config table (stderr).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def _load_oppoint():
    """Measured hybrid operating point (budget/intermediate), committed by
    tools/r3_measure.sh as OPPOINT.json. Empty dict if absent/invalid."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "OPPOINT.json")
    try:
        with open(path) as f:
            op = json.load(f).get("operating_point") or {}
        return op if isinstance(op, dict) else {}
    except Exception:
        return {}


def slope_time(build_frames_fn, n_hi: int = 5, repeats: int = 5):
    """Per-frame seconds via multi-frame dispatch slope.

    Each variant is compiled AND warmed before timing, then the slope is
    measured ``repeats`` times and the median taken — round-1 showed a ~25%
    run-to-run swing with a single cold-ish measurement (VERDICT weak #2)."""
    import numpy as np

    f1 = build_frames_fn(1)
    fN = build_frames_fn(n_hi)
    np.asarray(f1())  # compile
    np.asarray(fN())
    np.asarray(f1())  # warm post-compile caches
    np.asarray(fN())
    slopes = []
    for _ in range(repeats):
        t = time.time(); np.asarray(f1()); t1 = time.time() - t
        t = time.time(); np.asarray(fN()); tn = time.time() - t
        slopes.append(max((tn - t1) / (n_hi - 1), 1e-9))
    return float(np.median(slopes))


def bench_bonsai(width=1024, height=1024, use_pallas=None, vol=None):
    import jax
    import jax.numpy as jnp

    from vokselis_tpu.core.camera import Camera, CameraUniform
    from vokselis_tpu.volume.io import get_bonsai

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    u0 = Camera.bonsai(1.0).uniform()
    if vol is None:
        vol = get_bonsai()

    if use_pallas:
        from vokselis_tpu.ops.pallas.march_bonsai import build_renderer

        # volume travels as jit ARGUMENTS — closing over it bakes it into
        # the HLO as constants, which this environment ships over an HTTP
        # remote-compile hop (413 for 512^3; slow for 256^3)
        render_ovf, pack = build_renderer(vol, with_overflow=True)

        # the overflow flag is the kernel's only wrong-pixels signal; a
        # benchmark of wrong pixels would be meaningless (VERDICT weak #5)
        _img, ovf = render_ovf(pack, u0, width, height)
        assert int(ovf) == 0, f"window overflow on the bench pose: {int(ovf)}"

        def render(pk, u, w, h):
            return render_ovf(pk, u, w, h)[0]
    else:
        from vokselis_tpu.ops.reference import render_bonsai

        pack = jnp.asarray(vol)

        def render(pk, u, w, h):
            return render_bonsai(pk, u, width=w, height=h)

    def build(n):
        def frames(pk, vp, pv, ip):
            def body(i, acc):
                u = CameraUniform(vp + acc * 1e-20, pv, ip)
                img = render(pk, u, width, height)
                return acc + img[0, 0, 0] + img[height // 2, width // 2, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        jf = jax.jit(frames)
        return lambda: jf(pack, u0.view_position, u0.proj_view, u0.inv_proj)

    sec = slope_time(build)
    return width * height / sec / 1e6, sec


def bench_field(width=512, height=512, field="noise", shading="xor",
                quantize=True):
    import jax
    import jax.numpy as jnp

    from vokselis_tpu.core.camera import Camera, CameraUniform
    from vokselis_tpu.ops.pallas.march_field import render_field_pallas

    u0 = Camera.xor(1.0).uniform()

    def build(n):
        def frames(vp, pv, ip):
            def body(i, acc):
                u = CameraUniform(vp + acc * 1e-20, pv, ip)
                img = render_field_pallas(u, 0.0, width, height,
                                          field=field, shading=shading,
                                          quantize=quantize)
                return acc + img[0, 0, 0] + img[height // 2, width // 2, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        jf = jax.jit(frames)
        return lambda: jf(u0.view_position, u0.proj_view, u0.inv_proj)

    sec = slope_time(build)
    return width * height / sec / 1e6, sec


def bench_bonsai_fast(width=1024, height=1024, intermediate=256):
    """renderer="fast" (shear-warp MXU mode). Reported on stderr only: the
    flagship JSON line stays the EXACT kernel per BASELINE.md policy; the
    fast mode's error vs the oracle is documented in PARITY_REPORT.md."""
    import jax
    import jax.numpy as jnp

    from vokselis_tpu.core.camera import Camera, CameraUniform
    from vokselis_tpu.ops.shear_warp import build_fast_renderer
    from vokselis_tpu.volume.io import get_bonsai

    u0 = Camera.bonsai(1.0).uniform()
    render, pack = build_fast_renderer(get_bonsai(), intermediate=intermediate)

    def build(n):
        def frames(pk, vp, pv, ip):
            def body(i, acc):
                u = CameraUniform(vp + acc * 1e-20, pv, ip)
                img = render(pk, u, width, height)
                return acc + img[0, 0, 0] + img[height // 2, width // 2, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        jf = jax.jit(frames)
        return lambda: jf(pack, u0.view_position, u0.proj_view, u0.inv_proj)

    sec = slope_time(build)
    return width * height / sec / 1e6, sec


def bench_bonsai_hybrid(width=1024, height=1024, intermediate=None,
                        budget=None):
    """renderer="hybrid" (shear-warp frame + exact re-march of the worst
    tiles): the north-star mode — >=500 Mrays/s AND <=1e-3 mean error.
    Returns (mrays, sec, mean_err_vs_exact); the exact Pallas kernel is
    within ~1e-6 of the jnp oracle (PARITY_REPORT.md), so the error vs it
    stands in for error vs the oracle at ms cost instead of ~50 s."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vokselis_tpu.core.camera import Camera, CameraUniform
    from vokselis_tpu.ops.hybrid import HybridBonsaiRenderer
    from vokselis_tpu.ops.pallas.march_bonsai import build_renderer
    from vokselis_tpu.ops.shear_warp import pose_hint
    from vokselis_tpu.volume.io import get_bonsai

    op = _load_oppoint()
    if budget is None:
        # defaults from the measured operating point (the conjunction's
        # speed/error dials, tools/hybrid_operating_point.py; committed to
        # OPPOINT.json by the round-3 measurement driver)
        budget = int(os.environ.get("VOK_HYBRID_BUDGET",
                                    op.get("budget", 128)))
    if intermediate is None:
        intermediate = int(os.environ.get("VOK_HYBRID_II",
                                          op.get("ii", 512)))
    u0 = Camera.bonsai(1.0).uniform()
    vol = get_bonsai()
    hyb = HybridBonsaiRenderer(vol, intermediate=intermediate, budget=budget)
    hint = pose_hint(u0, width, height, intermediate, hyb.dims)

    render, pack = build_renderer(vol, with_overflow=True)
    exact, _ovf = render(pack, u0, width, height)
    img, _o = hyb._call_traced(u0, width, height, hint=hint)
    err = float(np.abs(np.asarray(img)[..., :3]
                       - np.asarray(exact)[..., :3]).mean())

    # packs/layouts as jit ARGUMENTS: closing over them bakes ~100 MB of
    # constants into the HLO -> HTTP 413 on the remote-compile hop
    frender, fpack = hyb.functional()

    def build(n):
        def frames(pk, vp, pv, ip):
            def body(i, acc):
                u = CameraUniform(vp + acc * 1e-20, pv, ip)
                im, _, _ = frender(pk, u, width, height, hint=hint)
                return acc + im[0, 0, 0] + im[height // 2, width // 2, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        jf = jax.jit(frames)
        return lambda: jf(fpack, u0.view_position, u0.proj_view, u0.inv_proj)

    sec = slope_time(build)
    return width * height / sec / 1e6, sec, err, budget


def bench_bonsai_orbit(width=1920, height=1080, n_poses=8):
    """Config 4: bonsai with an orbiting camera @1080p.

    Times the exact-kernel loop, then — if every orbit pose is
    non-degenerate and the hybrid's measured per-pose error clears the
    1e-3 budget — also times ``renderer="hybrid"`` through ONE traced
    loop (the adaptive MXU warp sizes its own windows in-kernel, so a
    single jit variant covers every pose; pre-adaptive, each pose-hint
    window bucket was a separate multi-minute remote compile). Returns
    (mrays, sec, hybrid_stats): hybrid_stats is None or
    (mrays, sec, max_pose_err, budget)."""
    import math

    import jax
    import jax.numpy as jnp

    from vokselis_tpu.core.camera import Camera, CameraUniform
    from vokselis_tpu.parallel.sharding import orbit_camera_batch
    from vokselis_tpu.ops.pallas.march_bonsai import build_renderer
    from vokselis_tpu.volume.io import get_bonsai

    vol = get_bonsai()
    render, pack = build_renderer(vol)
    cams = orbit_camera_batch(n_poses, aspect=width / height)

    def build_loop(frender, fpack, n):
        def frames(pk, vp, pv, ip):
            def body(i, acc):
                k = i % n_poses
                u = CameraUniform(vp[k] + acc * 1e-20, pv[k], ip[k])
                img = frender(pk, u, width, height)
                return acc + img[0, 0, 0] + img[height // 2, width // 2, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        jf = jax.jit(frames)
        return lambda: jf(fpack, cams.view_position, cams.proj_view,
                          cams.inv_proj)

    sec = slope_time(lambda n: build_loop(render, pack, n))
    mrays = width * height / sec / 1e6

    hyb_stats = None
    try:
        from vokselis_tpu.ops.hybrid import HybridBonsaiRenderer
        from vokselis_tpu.ops.shear_warp import pose_hint

        op = _load_oppoint()
        # ~2x the 1024^2 operating budget: degraded (silhouette) tile
        # count scales ~linearly with frame side, and 1080p has ~2x the
        # 32x32 tiles of 1024^2
        budget = int(os.environ.get(
            "VOK_ORBIT_BUDGET", 2 * int(op.get("budget", 64))))
        ii = int(op.get("ii", 512))
        hyb = HybridBonsaiRenderer(vol, intermediate=ii, budget=budget)
        poses = [Camera(zoom=1.0, pitch=0.5,
                        yaw=2.0 * math.pi * i / n_poses,
                        target=(0.5, 0.5, 0.5), aspect=width / height)
                 for i in range(n_poses)]
        if any(pose_hint(c.uniform(), width, height, ii, hyb.dims)[2]
               for c in poses):
            _log("config 4 hybrid: degenerate orbit pose — exact only")
            return mrays, sec, None
        frender, fpack = hyb.functional()
        err_max = 0.0
        for c in poses:
            u = c.uniform()
            him, _, _ = frender(fpack, u, width, height)
            eim = render(pack, u, width, height)
            err_max = max(err_max, float(jnp.abs(
                him[..., :3] - eim[..., :3]).mean()))
        if err_max <= 1e-3:
            hsec = slope_time(lambda n: build_loop(
                lambda pk, u, w, h: frender(pk, u, w, h)[0], fpack, n))
            hyb_stats = (width * height / hsec / 1e6, hsec, err_max, budget)
        else:
            _log(f"config 4 hybrid: max orbit-pose err {err_max:.2e} "
                 "> 1e-3 — exact only")
    except Exception as e:  # pragma: no cover - bench-only diagnostics
        _log(f"config 4 hybrid probe failed ({type(e).__name__}: {e}); "
             "exact numbers stand")
    return mrays, sec, hyb_stats


def bench_views_512(n_views=64, view_res=512):
    """Config 5: TIME-VARYING 512^3 volume, batched multi-view rendering.
    Every batch step regenerates the density on device (the genvol fbm
    field at 512^3, the reference's per-update compute fill analog —
    shaders/xor.wgsl:69-77) and re-packs the six banded slab layouts on
    device (prepare_volume_device) before the 64 views render. On one chip
    the views run sequentially in-device; multi-chip shards them over a
    'views' mesh via vokselis_tpu.parallel."""
    import jax
    import jax.numpy as jnp

    from vokselis_tpu.core.camera import CameraUniform
    from vokselis_tpu.parallel.sharding import orbit_camera_batch
    from vokselis_tpu.ops.pallas.genvol import generate_density_u8_pallas
    from vokselis_tpu.ops.pallas.march_bonsai import (
        _render_bonsai_pallas,
        auto_win_rows,
        pick_tiles_per_step,
        prepare_volume_device,
        volume_layout_meta,
    )

    import math

    win_cap = 96
    dims, band_rows, nb, bstride = volume_layout_meta(view_res, win_cap)
    tps = pick_tiles_per_step(dims, view_res, view_res, cap=win_cap)
    win = min(auto_win_rows(dims, view_res, view_res, tps), win_cap)
    max_steps = int(math.ceil(math.sqrt(3.0) * dims)) + 1  # full diagonal
    cams = orbit_camera_batch(n_views)

    def build(n):
        def frames(vp, pv, ip):
            def batch(b, acc):
                # per-batch volume update + device repack IN the loop —
                # the measured batch time includes both (VERDICT round 2)
                vol = generate_density_u8_pallas(
                    0.3 * b.astype(jnp.float32) + acc * 1e-20, dims
                )
                pk = prepare_volume_device(vol, win_cap)

                def body(i, acc):
                    u = CameraUniform(vp[i] + acc * 1e-20, pv[i], ip[i])
                    img, _ovf = _render_bonsai_pallas(
                        pk, u, view_res, view_res, dims, max_steps, True,
                        win, band_rows, nb, bstride, tps,
                    )
                    return acc + img[0, 0, 0] + img[view_res // 2,
                                                    view_res // 2, 0]

                return jax.lax.fori_loop(0, n_views, body, acc)

            return jax.lax.fori_loop(0, n, batch, jnp.float32(0.0))

        jf = jax.jit(frames)
        return lambda: jf(cams.view_position, cams.proj_view, cams.inv_proj)

    sec_batch = slope_time(build, n_hi=2)  # sec per 64-view batch
    rays = n_views * view_res * view_res
    return rays / sec_batch / 1e6, sec_batch


def measure_flagship_err(width=1024, height=1024):
    """Mean per-pixel |rgb| error of the flagship Pallas kernel vs the jnp
    oracle at the bench pose — the third driver metric (BASELINE.json:
    'Mrays/sec/chip; p50 frame ms; per-pixel error vs ref'). The oracle
    render is XLA-gather-bound (~50 s at 1024^2 on this tunnel) so it runs
    ONCE; the full multi-pose picture lives in PARITY_REPORT.md."""
    import numpy as np

    from vokselis_tpu.core.camera import Camera
    from vokselis_tpu.ops.pallas.march_bonsai import build_renderer
    from vokselis_tpu.ops.reference import render_bonsai
    from vokselis_tpu.volume.io import get_bonsai

    import jax.numpy as jnp

    u0 = Camera.bonsai(1.0).uniform()
    vol = get_bonsai()
    render, pack = build_renderer(vol)
    img = np.asarray(render(pack, u0, width, height))[..., :3]
    ref = np.asarray(render_bonsai(jnp.asarray(vol), u0,
                                   width=width, height=height))[..., :3]
    return float(np.abs(img - ref).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true", help="run every config")
    ap.add_argument("--cpu-oracle", action="store_true")
    ap.add_argument("--skip-err", action="store_true",
                    help="skip the ~50 s oracle render behind mean_err")
    args = ap.parse_args()

    import jax

    _log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    results = {}
    t0 = time.time()
    mrays, sec = bench_bonsai(use_pallas=False if args.cpu_oracle else None)
    results["bonsai_1024"] = (mrays, sec)
    _log(f"config 3 bonsai 256^3 @1024^2: {sec*1000:.1f} ms/frame = "
         f"{mrays:.1f} Mrays/s  [{time.time()-t0:.0f}s elapsed]")

    hyb_stats = None
    if not args.cpu_oracle and jax.default_backend() == "tpu":
        for ii in (256, 512) if args.all else (256,):
            m, s = bench_bonsai_fast(intermediate=ii)
            results[f"bonsai_1024_fast_i{ii}"] = (m, s)
            _log(f"renderer='fast' (shear-warp MXU, I={ii}): {s*1000:.2f} ms"
                 f"/frame = {m:.0f} Mrays/s (approximate — see PARITY_REPORT.md)")
        hm, hs, herr, hbud = bench_bonsai_hybrid()
        hyb_stats = (hm, hs, herr, hbud)
        _log(f"renderer='hybrid' (north-star mode, budget={hbud}): "
             f"{hs*1000:.2f} ms/frame = {hm:.0f} Mrays/s at mean err "
             f"{herr:.2e} vs exact (sweep errors: PARITY_REPORT.md)")

    if args.all:
        if not args.cpu_oracle and jax.default_backend() == "tpu":
            # dense-occupancy stress volume (~50% nonzero, deep marches):
            # bounds the flagship's sensitivity to the synthetic volume's
            # 8-15% occupancy (VERDICT round-2 weak #5)
            from vokselis_tpu.volume.io import dense_stress

            m, s = bench_bonsai(vol=dense_stress())
            results["bonsai_1024_dense"] = (m, s)
            _log(f"config 3 DENSE stress (50% occupancy) @1024^2: "
                 f"{s*1000:.1f} ms/frame = {m:.1f} Mrays/s")
        for name, kw in (
            ("trig_512", dict(width=512, height=512, field="trig",
                              shading="emission", quantize=False)),
            ("xor_512", dict(width=512, height=512)),
        ):
            m, s = bench_field(**kw)
            results[name] = (m, s)
            _log(f"{name}: {s*1000:.1f} ms/frame = {m:.1f} Mrays/s")
        m, s, orb_hyb = bench_bonsai_orbit()
        results["bonsai_1080p_orbit"] = (m, s)
        _log(f"config 4 bonsai orbit @1080p: {s*1000:.1f} ms/frame = {m:.1f} Mrays/s")
        if orb_hyb is not None:
            hm4, hs4, herr4, hbud4 = orb_hyb
            results["bonsai_1080p_orbit_hybrid"] = (hm4, hs4)
            _log(f"config 4 orbit @1080p HYBRID (budget={hbud4}): "
                 f"{hs4*1000:.1f} ms/frame = {hm4:.1f} Mrays/s, max "
                 f"orbit-pose err {herr4:.2e}")
        m, s = bench_views_512()
        results["views512"] = (m, s)
        _log(f"config 5 512^3 64 views @512^2: {s*1000:.0f} ms/batch = {m:.1f} Mrays/s")

    mrays, sec = results["bonsai_1024"]
    if args.skip_err:
        mean_err = None
    elif args.cpu_oracle or jax.default_backend() != "tpu":
        mean_err = 0.0  # the oracle IS the measured path
    else:
        mean_err = measure_flagship_err()
        _log(f"flagship mean_err vs oracle at the bench pose: {mean_err:.3e}")
    # Flagship mode selection: the north star is a CONJUNCTION (>=500
    # Mrays/s AND <=1e-3 mean error, BASELINE.json). The hybrid renderer
    # is the mode built to satisfy it; it is only allowed to headline when
    # its measured error actually meets the budget — otherwise the exact
    # kernel stays the honest flagship.
    if hyb_stats is not None and hyb_stats[2] <= 1e-3:
        hm, hs, herr, hbud = hyb_stats
        line = {
            "metric": "Mrays/sec/chip (bonsai 256^3 @ 1024^2, hybrid "
                      "shear-warp + exact tile re-march)",
            "value": round(hm, 2),
            "unit": "Mrays/s",
            "vs_baseline": round(hm / 500.0, 4),
            "p50_ms": round(hs * 1000.0, 3),
            "mean_err": round(herr, 9),
            "hybrid_budget": hbud,
            "exact_mrays": round(mrays, 2),
            "exact_p50_ms": round(sec * 1000.0, 3),
            "exact_mean_err": None if mean_err is None else round(mean_err, 9),
        }
    else:
        line = {
            "metric": "Mrays/sec/chip (bonsai 256^3 @ 1024^2, Pallas slab-march)",
            "value": round(mrays, 2),
            "unit": "Mrays/s",
            "vs_baseline": round(mrays / 500.0, 4),
            "p50_ms": round(sec * 1000.0, 3),
            "mean_err": None if mean_err is None else round(mean_err, 9),
        }
        if hyb_stats is not None:
            hm, hs, herr, hbud = hyb_stats
            line["hybrid_mrays"] = round(hm, 1)
            line["hybrid_p50_ms"] = round(hs * 1000.0, 3)
            line["hybrid_mean_err"] = round(herr, 9)
            line["hybrid_budget"] = hbud
    print(json.dumps(line))


if __name__ == "__main__":
    main()
