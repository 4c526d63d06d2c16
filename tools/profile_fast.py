#!/usr/bin/env python
"""Stage-level profile of the renderer="fast" shear-warp path at I=512.

Times each stage with the slope method (bench.py): this transport has a
~29 ms dispatch floor, so per-iteration cost is the slope between 1- and
N-iteration on-device loops. Large arrays travel as jit ARGUMENTS (closing
over them bakes them into the HLO — this environment remote-compiles over
HTTP and chokes on baked-in megabyte constants).

Stages:
  weights   - build wu/wv bilinear weight stacks (G, D, I)
  matmuls   - the two batched resample dot_generals (weights prebuilt)
  resample  - weights + matmuls (what shear_warp does before composite)
  composite - composite_pallas on a prebuilt (G, I, I) stack
  warp      - warp_bilinear_pallas at the frame size
  full      - whole _render_fast

Usage: python tools/profile_fast.py [I] [W H]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def slope_time(fn_builder, n_hi=5, repeats=5):
    f1 = fn_builder(1)
    fN = fn_builder(n_hi)
    np.asarray(f1()); np.asarray(fN())
    np.asarray(f1()); np.asarray(fN())
    slopes = []
    for _ in range(repeats):
        t = time.time(); np.asarray(f1()); t1 = time.time() - t
        t = time.time(); np.asarray(fN()); tn = time.time() - t
        slopes.append(max((tn - t1) / (n_hi - 1), 1e-9))
    return float(np.median(slopes))


def main():
    ii = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

    from vokselis_tpu.core.camera import Camera, CameraUniform
    from vokselis_tpu.core import geometry
    from vokselis_tpu.ops.shear_warp import prepare_fast_volume, _render_fast
    from vokselis_tpu.ops.pallas.composite import composite_pallas
    from vokselis_tpu.ops.pallas.warp2d import warp_bilinear_pallas
    from vokselis_tpu.volume.io import get_bonsai

    u0 = Camera.bonsai(1.0).uniform()
    packs = prepare_fast_volume(get_bonsai())
    d = packs[0].shape[1]
    dm1 = packs[0].shape[0]
    fd = float(d)

    # frame geometry at the default pose (mirrors _render_fast)
    eye, dirs = geometry.rays_fragment(u0, width, height)
    eye = np.asarray(eye); dirs_c = np.asarray(dirs[height // 2, width // 2])
    m = int(np.argmax(np.abs(dirs_c)))
    print(f"I={ii} frame={width}x{height} dominant axis m={m}",
          file=sys.stderr, flush=True)
    volm = packs[m]

    e_t = eye * fd - 0.5
    em = float(e_t[m])
    denom = (fd - 1.0) / 2.0 - em
    grid_u = jnp.linspace(-20.0, fd + 20.0, ii)
    cols = jnp.arange(d, dtype=jnp.float32)
    ks = jnp.arange(dm1, dtype=jnp.float32) + 0.5
    s_k = (ks - em) / denom

    def build_weights(sk, gu, co, eps):
        pos_u = em + sk[:, None] * (gu[None, :] + eps - em)
        pos_v = em + sk[:, None] * (gu[None, :] - eps - em)
        wu = jnp.maximum(0.0, 1.0 - jnp.abs(pos_u[:, None, :] - co[None, :, None])).astype(jnp.bfloat16)
        wv = jnp.maximum(0.0, 1.0 - jnp.abs(pos_v[:, None, :] - co[None, :, None])).astype(jnp.bfloat16)
        return wu, wv

    def do_matmuls(vol, wu, wv):
        tmp = lax.dot_general(vol.astype(jnp.bfloat16), wu,
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        res = lax.dot_general(wv, tmp, (((1,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
        return res

    wu0, wv0 = jax.jit(build_weights)(s_k, grid_u, cols, jnp.float32(0.0))
    res0 = jax.jit(do_matmuls)(volm, wu0, wv0)
    irho0 = jnp.ones((ii, ii), jnp.float32)

    stages = {}

    def loop(body, *args):
        """body(eps, *args) -> f32 scalar; args passed as jit arguments."""
        def builder(n):
            def frames(*a):
                def it(i, acc):
                    return acc + body(acc * 1e-20, *a)
                return lax.fori_loop(0, n, it, jnp.float32(0.0))
            jf = jax.jit(frames)
            return lambda: jf(*args)
        return builder

    def record(name, fn):
        t = time.time()
        stages[name] = fn()
        print(f"{name:10s} {stages[name]*1000:7.2f} ms   "
              f"[{time.time()-t:.0f}s wall]", file=sys.stderr, flush=True)

    def weights_body(eps, sk, gu, co):
        wu, wv = build_weights(sk, gu, co, eps)
        return (wu[0, 0, 0] + wv[-1, -1, -1]).astype(jnp.float32)
    record("weights", lambda: slope_time(
        loop(weights_body, s_k, grid_u, cols)))

    def mat_body(eps, vol, wu, wv):
        r = do_matmuls(vol + eps.astype(jnp.bfloat16), wu, wv)
        return r[0, 0, 0] + r[-1, -1, -1]
    record("matmuls", lambda: slope_time(loop(mat_body, volm, wu0, wv0)))

    def resample_body(eps, vol, sk, gu, co):
        wu, wv = build_weights(sk, gu, co, eps)
        r = do_matmuls(vol, wu, wv)
        return r[0, 0, 0] + r[-1, -1, -1]
    record("resample", lambda: slope_time(
        loop(resample_body, volm, s_k, grid_u, cols)))

    def comp_body(eps, res, irho):
        r, g, b, a = composite_pallas(res + eps, 1, irho)
        return r[0, 0] + a[-1, -1]
    record("composite", lambda: slope_time(loop(comp_body, res0, irho0)))

    avv, buu = jnp.meshgrid(jnp.linspace(0, ii - 1.0, height),
                            jnp.linspace(0, ii - 1.0, width), indexing="ij")
    chans0 = jnp.stack([res0[0], res0[1], res0[2]])

    def warp_body(eps, ch, av, bu):
        p = warp_bilinear_pallas(ch + eps, av, bu, None)
        return p[0, 0, 0] + p[-1, -1, -1]
    record("warp", lambda: slope_time(loop(warp_body, chans0, avv, buu)))

    def full_builder(n):
        def frames(pk, vp, pv, ip):
            def body(i, acc):
                u = CameraUniform(vp + acc * 1e-20, pv, ip)
                img = _render_fast(pk, u, width, height, ii, True)
                return acc + img[0, 0, 0] + img[height // 2, width // 2, 0]
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        jf = jax.jit(frames, static_argnames=())
        return lambda: jf(packs, u0.view_position, u0.proj_view, u0.inv_proj)
    record("full", lambda: slope_time(full_builder))

    for k, v in stages.items():
        print(f"{k:10s} {v*1000:7.2f} ms")


if __name__ == "__main__":
    main()
