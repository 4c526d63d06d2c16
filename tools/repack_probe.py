#!/usr/bin/env python
"""Decompose config 5's per-batch volume-update tax (VERDICT round 3 #6):
2.49 s/batch time-varying vs 0.91 s static at 512^3 — where do the ~1.6 s
go between the genvol fbm fill and prepare_volume_device's six banded
slab-pair layouts?

Stages (slope-timed, arrays as jit args):
  genvol    - generate_density_u8_pallas at D^3
  transpose - the six class transposes + chunk gather (chunks tensor)
  pairs     - slab-pair u16 packing from the chunks tensor
  banded    - the v-band stack/reshape from padded pairs
  occ       - occupancy tables + chunk ranges
  repack    - full prepare_volume_device
  gen+re    - genvol + prepare_volume_device (the config-5 per-batch tax)

Usage: python tools/repack_probe.py [D]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    win_cap = 96

    from bench import slope_time
    from vokselis_tpu.ops.pallas.genvol import generate_density_u8_pallas
    from vokselis_tpu.ops.pallas.march_bonsai import (
        CHUNK,
        prepare_volume_device,
        volume_layout_meta,
    )
    from vokselis_tpu.utils.grid import cdiv

    dims, band_rows, nb, bstride = volume_layout_meta(d, win_cap)
    n_chunks = cdiv(d + 1, CHUNK)
    vol0 = jax.jit(generate_density_u8_pallas, static_argnums=1)(
        jnp.float32(0.0), d)
    vol0.block_until_ready()

    def transposes_gather(vol):
        # round-3 construction: clipped arithmetic-progression gather
        base = {
            0: jnp.transpose(vol, (2, 0, 1)),
            1: jnp.transpose(vol, (1, 0, 2)),
            2: vol,
        }
        idx = jnp.clip(
            (jnp.arange(n_chunks)[:, None] * CHUNK - 1)
            + jnp.arange(CHUNK + 1)[None, :], 0, d - 1)
        stacks = []
        for m in range(3):
            for s in (1, -1):
                lay = base[m] if s > 0 else base[m][::-1]
                stacks.append(lay[idx])
        return jnp.stack(stacks).reshape(-1, CHUNK + 1, d, d)

    def transposes(vol):
        # round-4 construction: pad-once + static slices (the shipped
        # prepare_volume_device window builder)
        base = {
            0: jnp.transpose(vol, (2, 0, 1)),
            1: jnp.transpose(vol, (1, 0, 2)),
            2: vol,
        }
        pad_back = n_chunks * CHUNK - d

        def windows(lay):
            layp = jnp.concatenate(
                [lay[:1], lay,
                 jnp.broadcast_to(lay[-1:], (pad_back, d, d))])
            body = layp[: n_chunks * CHUNK].reshape(n_chunks, CHUNK, d, d)
            tail = layp[CHUNK :: CHUNK][:n_chunks]
            return jnp.concatenate([body, tail[:, None]], axis=1)

        stacks = []
        for m in range(3):
            for s in (1, -1):
                lay = base[m] if s > 0 else base[m][::-1]
                stacks.append(windows(lay))
        return jnp.stack(stacks).reshape(-1, CHUNK + 1, d, d)

    chunks0 = jax.jit(transposes)(vol0)
    chunks0.block_until_ready()

    def pairs_of(chunks):
        return chunks[:, :CHUNK].astype(jnp.uint16) | (
            chunks[:, 1:].astype(jnp.uint16) << 8)

    pairs0 = jax.jit(pairs_of)(chunks0)
    pairs0.block_until_ready()

    def banded_of(pairs):
        pad_rows = (nb - 1) * bstride + band_rows
        padded = jnp.pad(pairs, ((0, 0), (0, 0), (0, pad_rows - d), (0, 0)))
        return jnp.stack(
            [padded[:, :, b * bstride: b * bstride + band_rows, :]
             for b in range(nb)], axis=1,
        ).reshape(-1, CHUNK, band_rows, d)

    def occ_of(chunks):
        nub = max(d // 128, 1)
        occ3d = (chunks.reshape(chunks.shape[0], CHUNK + 1, d // 8, 8, nub,
                                d // nub) > 0).any(axis=(1, 3, 5))
        return occ3d.astype(jnp.int32).reshape(-1).sum()

    stages = {}

    def loop(body, *args):
        def builder(n):
            def run(*a):
                def it(i, acc):
                    return acc + body(acc * 1e-20, *a)
                return lax.fori_loop(0, n, it, jnp.float32(0.0))
            jf = jax.jit(run)
            return lambda: jf(*args)
        return builder

    def rec(name, body, *args):
        s = slope_time(loop(body, *args), n_hi=3)
        stages[name] = round(s * 1000, 1)
        print(f"{name:10s} {s*1000:8.1f} ms", flush=True)

    # Consume EVERY element of each stage's output (f32 sum): consuming
    # only [0,0,0,0] let XLA dead-code-eliminate the build itself — the
    # original probe reported 39 ms for a repack that costs ~1.5 s in
    # config 5's batch loop (round-4 finding). The sum adds one read pass
    # (~5-10 ms at HBM rate for the largest tensors) — small vs the
    # stages it keeps honest.
    def consume(x):
        return x.astype(jnp.float32).sum()

    rec("genvol", lambda eps, t: consume(generate_density_u8_pallas(
        t + eps, d)), jnp.float32(0.3))
    rec("transpose_gather", lambda eps, v: consume(transposes_gather(
        (v.astype(jnp.float32) + eps).astype(jnp.uint8))), vol0)
    rec("transpose", lambda eps, v: consume(transposes(
        (v.astype(jnp.float32) + eps).astype(jnp.uint8))), vol0)
    rec("pairs", lambda eps, c: consume(pairs_of(
        (c.astype(jnp.float32) + eps).astype(jnp.uint8))), chunks0)
    rec("banded", lambda eps, p: consume(banded_of(
        (p.astype(jnp.float32) + eps).astype(jnp.uint16))), pairs0)
    rec("occ", lambda eps, c: occ_of(
        (c.astype(jnp.float32) + eps).astype(jnp.uint8)
    ).astype(jnp.float32), chunks0)

    def consume_pack(pk):
        return sum(consume(p) for p in pk)

    rec("repack", lambda eps, v: consume_pack(prepare_volume_device(
        (v.astype(jnp.float32) + eps).astype(jnp.uint8), win_cap)), vol0)
    rec("gen+re", lambda eps, t: consume_pack(prepare_volume_device(
        generate_density_u8_pallas(t + eps, d), win_cap)), jnp.float32(0.3))

    print(json.dumps({"d": d, **stages}), flush=True)
    os.makedirs("/tmp/r4_logs", exist_ok=True)
    with open(f"/tmp/r4_logs/repack_{d}.json", "w") as f:
        json.dump({"d": d, **stages}, f)


if __name__ == "__main__":
    main()
