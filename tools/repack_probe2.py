#!/usr/bin/env python
"""Config-5 COUPLING probe: tools/repack_probe.py shows genvol +
prepare_volume_device cost ~141 ms in isolation (honest full-sum
consumption), yet config 5's time-varying batch runs ~1.58 s/batch over
its static baseline. The gap must come from the batch-loop COUPLING —
prime suspect: the march kernel's vol_chunks operand is loop-VARIANT in
the time-varying batch, and XLA copies the multi-GB banded layout per
pallas_call (64 views/batch) instead of passing the same loop-invariant
buffer the static benchmark enjoys.

Variants (all slope-timed over whole batches, n_views views each):
  render_static   - render only, static pack (the 0.91 s/64v baseline)
  gen_repack      - genvol + repack only, outputs sum-consumed, no render
  decoupled       - gen+repack (sum-consumed) AND render from the STATIC
                    pack in the same batch body
  coupled         - the real config 5: render consumes the fresh pack

coupled - decoupled = the cost of feeding a loop-variant pack to the
march kernel (per-call operand copies / layout fixups).

Usage: python tools/repack_probe2.py [n_views] [view_res]
"""
from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax


def main():
    n_views = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    view_res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    d = 512
    win_cap = 96

    from bench import slope_time
    from vokselis_tpu.core.camera import CameraUniform
    from vokselis_tpu.ops.pallas.genvol import generate_density_u8_pallas
    from vokselis_tpu.ops.pallas.march_bonsai import (
        _render_bonsai_pallas,
        auto_win_rows,
        pick_tiles_per_step,
        prepare_volume_device,
        volume_layout_meta,
    )
    from vokselis_tpu.parallel.sharding import orbit_camera_batch

    dims, band_rows, nb, bstride = volume_layout_meta(d, win_cap)
    tps = pick_tiles_per_step(dims, view_res, view_res, cap=win_cap)
    win = min(auto_win_rows(dims, view_res, view_res, tps), win_cap)
    max_steps = int(math.ceil(math.sqrt(3.0) * dims)) + 1
    cams = orbit_camera_batch(n_views)

    t0 = float(os.environ.get("VOK_PROBE_T", "0.3"))
    vol0 = jax.jit(generate_density_u8_pallas, static_argnums=1)(
        jnp.float32(t0), d)
    pack0 = jax.jit(prepare_volume_device, static_argnums=1)(vol0, win_cap)
    jax.block_until_ready(pack0)

    def consume(pk):
        return sum(p.astype(jnp.float32).sum() for p in pk)

    def render_views(pk, vp, pv, ip, acc):
        def body(i, acc):
            u = CameraUniform(vp[i] + acc * 1e-20, pv[i], ip[i])
            img, _ovf = _render_bonsai_pallas(
                pk, u, view_res, view_res, dims, max_steps, True,
                win, band_rows, nb, bstride, tps,
            )
            return acc + img[0, 0, 0] + img[view_res // 2,
                                            view_res // 2, 0]
        return lax.fori_loop(0, n_views, body, acc)

    def make(mode):
        def build(n):
            def run(pk0, vp, pv, ip):
                def batch(b, acc):
                    if mode == "render_static":
                        return render_views(pk0, vp, pv, ip, acc)
                    # "coupled" keeps the volume CONTENT constant (t=0.3,
                    # identical to pk0) while the pack stays loop-VARIANT —
                    # isolating the pipeline-coupling cost from the content
                    # drift a truly time-varying field adds (occupancy moves
                    # render cost up to ~3.4x, dense-stress row).
                    # "coupled_tv" is the real config 5 (t = 0.3*b).
                    t = (0.3 * b.astype(jnp.float32) if mode == "coupled_tv"
                         else 0.0 * b.astype(jnp.float32) + t0)
                    vol = generate_density_u8_pallas(t + acc * 1e-20, d)
                    pk = prepare_volume_device(vol, win_cap)
                    if mode == "gen_repack":
                        return acc + consume(pk)
                    if mode == "decoupled":
                        acc = acc + 1e-20 * consume(pk)
                        return render_views(pk0, vp, pv, ip, acc)
                    return render_views(pk, vp, pv, ip, acc)  # coupled*
                return lax.fori_loop(0, n, batch, jnp.float32(0.0))
            jf = jax.jit(run)
            return lambda: jf(pack0, cams.view_position, cams.proj_view,
                              cams.inv_proj)
        return build

    out = {"n_views": n_views, "view_res": view_res, "t0": t0}
    modes = os.environ.get(
        "VOK_PROBE_MODES",
        "render_static,gen_repack,decoupled,coupled,coupled_tv").split(",")
    for mode in modes:
        s = slope_time(make(mode), n_hi=2)
        out[mode] = round(s * 1000, 1)
        print(f"{mode:14s} {s*1000:8.1f} ms/batch", flush=True)
    if "coupled" in out and "decoupled" in out:
        out["coupling_ms"] = round(out["coupled"] - out["decoupled"], 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
