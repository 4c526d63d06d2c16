#!/usr/bin/env python
"""WITHIN-RUN A/B: single-tile vs pair-fused re-march selection at the
I=1024 operating point (round-4 VERDICT #3's untried half).

The pair-fused re-march amortizes per-grid-step machinery over two
tiles, but pair-granularity selection spends ~1/3 of the tile budget on
low-score partners (tools/pair_tradeoff_probe, round 4) — sum-ranking
softened that, it did not remove it.  Single-tile selection puts every
budgeted tile on a top-scored tile, so it may clear the 1e-3 contract at
budget ~20-28 where pair mode needs 32.  Whether that converts to FRAME
time depends on the single-step cost (no pair amortization, but smaller
win_rows) — so errors gate first, then timings run interleaved
(pair / single / pair) in THIS process per the round-5 drift discipline
(tools/transfer_band_ab.py: cross-run full-frame deltas are tunnel
drift, not code).

One HybridBonsaiRenderer serves every config: ``budget`` is a call-time
override and ``hybrid._PAIR`` is consulted at TRACE time, so patching
the module global between jit builds yields distinct compiled variants.

Usage: python tools/single_pair_ab.py [single_budgets,csv] [pair_budget]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

W = H = 1024
II = int(os.environ.get("VOK_AB_II", "1024"))
N_REPEATS = int(os.environ.get("VOK_OPPOINT_REPEATS", "3"))
CKPT = f"/tmp/single_pair_ab_{II}.jsonl"


def main():
    sb = ([int(b) for b in sys.argv[1].split(",")]
          if len(sys.argv) > 1 else [20, 28])
    pair_budget = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from bench import slope_time
    from vokselis_tpu.core.camera import Camera, CameraUniform
    from vokselis_tpu.ops import hybrid as hmod
    from vokselis_tpu.ops.pallas.march_bonsai import build_renderer
    from vokselis_tpu.ops.shear_warp import pose_hint
    from vokselis_tpu.volume.io import get_bonsai

    poses = {
        "bench": Camera.bonsai(1.0),
        "z1.0-axis": Camera(zoom=1.0, pitch=0.0, yaw=0.0,
                            target=(0.5, 0.5, 0.5), aspect=1.0),
        "z1.6-diag": Camera(zoom=1.6, pitch=0.5, yaw=math.pi / 4,
                            target=(0.5, 0.5, 0.5), aspect=1.0),
        "z1.0-tilt": Camera(zoom=1.0, pitch=-0.35, yaw=0.0,
                            target=(0.5, 0.5, 0.5), aspect=1.0),
        # the round-5 sweep-overfit classes (see hybrid_operating_point)
        "z1.0-dtilt": Camera(zoom=1.0, pitch=-0.35, yaw=7 * math.pi / 4,
                             target=(0.5, 0.5, 0.5), aspect=1.0),
        "z1.0-steep": Camera(zoom=1.0, pitch=1.2, yaw=0.0,
                             target=(0.5, 0.5, 0.5), aspect=1.0),
    }

    vol = get_bonsai()
    render, pack = build_renderer(vol, with_overflow=True)

    @jax.jit
    def mean_err(h, e):
        return jnp.abs(h[..., :3] - e[..., :3]).mean()

    exact = {k: render(pack, c.uniform(), W, H)[0] for k, c in poses.items()}

    hyb = hmod.HybridBonsaiRenderer(vol, intermediate=II, budget=pair_budget)
    frender, fpack = hyb.functional()
    u0 = poses["bench"].uniform()
    hint = pose_hint(u0, W, H, II, hyb.dims)

    done = {}
    if os.path.exists(CKPT):
        for line in open(CKPT):
            rec = json.loads(line)
            done[(rec["mode"], rec["budget"], rec["kind"])] = rec
        print(f"resuming: {len(done)} records from {CKPT}", flush=True)
    ckpt = open(CKPT, "a")

    def record(rec):
        ckpt.write(json.dumps(rec) + "\n")
        ckpt.flush()
        print(rec, flush=True)

    def errs_for(pair: bool, budget: int):
        key = ("pair" if pair else "single", budget, "err")
        if key in done:
            print(f"cached: {done[key]}", flush=True)
            return done[key]["errs"]
        hmod._PAIR = pair
        t0 = time.time()
        errs = {}
        for name, cam in poses.items():
            u = cam.uniform()
            h, _ = hyb._call_traced(u, W, H, budget=budget)
            errs[name] = round(float(mean_err(h, exact[name])), 9)
        record({"mode": key[0], "budget": budget, "kind": "err",
                "errs": errs, "wall_s": round(time.time() - t0, 1)})
        return errs

    def time_for(pair: bool, budget: int, tag=""):
        hmod._PAIR = pair
        t0 = time.time()

        def build(n):
            def frames(pk, vp, pv, ip):
                def body(i, acc):
                    u = CameraUniform(vp + acc * 1e-20, pv, ip)
                    img, _o, _d = frender(pk, u, W, H, hint=hint,
                                          budget=budget)
                    return acc + img[0, 0, 0] + img[H // 2, W // 2, 0]
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            jf = jax.jit(frames)
            return lambda: jf(fpack, u0.view_position, u0.proj_view,
                              u0.inv_proj)

        reps = [slope_time(build) * 1000 for _ in range(N_REPEATS)]
        record({"mode": "pair" if pair else "single", "budget": budget,
                "kind": f"time{tag}", "ms": round(float(np.mean(reps)), 3),
                "ms_reps": [round(r, 3) for r in reps],
                "wall_s": round(time.time() - t0, 1)})
        return float(np.mean(reps))

    # ---- phase 1: errors gate (cheapest compiles first) ----
    base_errs = errs_for(True, pair_budget)
    single_ok = []
    for b in sb:
        errs = errs_for(False, b)
        if max(errs.values()) <= 1e-3:
            single_ok.append((b, errs))

    if not single_ok:
        print("\nNO single budget cleared 1e-3 — pair stays; no timings.",
              flush=True)
        print(json.dumps({"verdict": "pair-wins-on-error",
                          "pair": base_errs}))
        return

    best_b = min(b for b, _ in single_ok)
    print(f"\nsingle clears at budget {best_b}; timing interleave...",
          flush=True)

    # ---- phase 2: interleaved timings (pair / single / pair) ----
    t_pair = time_for(True, pair_budget)
    t_single = time_for(False, best_b)
    t_pair2 = time_for(True, pair_budget, tag="-sentinel")

    out = {
        "pair": {"budget": pair_budget, "ms": round(t_pair, 3),
                 "ms_sentinel": round(t_pair2, 3), "errs": base_errs},
        "single": {"budget": best_b, "ms": round(t_single, 3),
                   "errs": dict(single_ok[0][1]) if single_ok else None},
        "single_ok": [b for b, _ in single_ok],
        "verdict": ("single-wins" if t_single < min(t_pair, t_pair2)
                    else "pair-wins-on-time"),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
