#!/usr/bin/env python
"""Find the hybrid's north-star OPERATING POINT: the smallest re-march
budget whose error clears the 1e-3 budget with margin, and whether its
frame time clears 500 Mrays/s (the conjunction, BASELINE.json).

The re-march cost scales ~linearly with budget (each selected 32x32 tile
marches all slabs), so budget is the speed/error dial: at 1024^2 the
exact kernel's ~17 ms full frame prices budget=128 at ~2.1 ms on top of
the ~1.6 ms fast frame — too slow for 500 Mrays/s — while budget<=32
fits if the curvature-channel selection really concentrates the error.

For each budget: mean |hybrid - exact| (device-reduced) on the bench pose
plus three probe poses (axis, zoom-out diagonal, tilted axis — the round-3
error-probe set; zoom-0.6 close-ups are degenerate -> exact and don't
depend on budget), and the slope-timed frame cost at the bench pose.
Checkpoints to /tmp/hybrid_oppoint_<ii>.jsonl; rerun resumes. Final line
prints the chosen operating point as JSON.

Usage: python tools/hybrid_operating_point.py [ii] [budgets,csv]
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
ERR_MARGIN = 8e-4  # margin under the 1e-3 budget for sweep-wide safety
ERR_TARGET = 1e-3  # the north-star error budget itself
MRAYS_TARGET = 500.0
N_REPEATS = int(os.environ.get("VOK_OPPOINT_REPEATS", "3"))


def main():
    ii = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    # each budget is a fresh jit variant (~4 min remote compile for the
    # hybrid frame + two fori timing variants): keep the default list
    # tight. budget=0 times the pure-fast frame through the hybrid path
    # (the cost model's intercept: fast frame + final unpack, no scoring).
    budgets = ([int(b) for b in sys.argv[2].split(",")]
               if len(sys.argv) > 2 else [0, 16, 32, 48, 64, 96, 128])

    from bench import slope_time
    from vokselis_tpu.core.camera import Camera, CameraUniform
    from vokselis_tpu.ops.hybrid import HybridBonsaiRenderer
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
        # round-5 lesson: the 4-pose set above overfit (its zoom-1.0
        # members are all yaw=0) — the b=32 op point it chose failed 8
        # sweep poses, worst 1.93e-3 at the TILTED DIAGONAL below, plus
        # the steep pitch-1.2 class. Any budget this ladder picks must
        # clear these two representatives too.
        "z1.0-dtilt": Camera(zoom=1.0, pitch=-0.35, yaw=7 * math.pi / 4,
                             target=(0.5, 0.5, 0.5), aspect=1.0),
        "z1.0-steep": Camera(zoom=1.0, pitch=1.2, yaw=0.0,
                             target=(0.5, 0.5, 0.5), aspect=1.0),
    }

    vol = get_bonsai()
    render, pack = build_renderer(vol, with_overflow=True)

    ckpt_path = f"/tmp/hybrid_oppoint_{ii}.jsonl"
    done = {}
    if os.path.exists(ckpt_path):
        for line in open(ckpt_path):
            rec = json.loads(line)
            done[rec["budget"]] = rec
        print(f"resuming: {len(done)} budgets from {ckpt_path}", flush=True)
    ckpt = open(ckpt_path, "a")

    @jax.jit
    def mean_err(h, e):
        return jnp.abs(h[..., :3] - e[..., :3]).mean()

    exact = {k: render(pack, c.uniform(), W, H)[0] for k, c in poses.items()}

    results = []
    first_build = None
    for budget in budgets:
        if budget in done:
            results.append(done[budget])
            print(f"budget={budget}: cached {done[budget]}", flush=True)
            continue
        t0 = time.time()
        hyb = HybridBonsaiRenderer(vol, intermediate=ii, budget=budget)
        errs = {}
        for name, cam in poses.items():
            u = cam.uniform()
            h, _ = hyb._call_traced(u, W, H)
            errs[name] = float(mean_err(h, exact[name]))

        u0 = poses["bench"].uniform()
        hint = pose_hint(u0, W, H, ii, hyb.dims)
        # packs/layouts as jit ARGUMENTS: closing over them bakes ~100 MB
        # of constants into the HLO -> HTTP 413 on the remote-compile hop
        frender, fpack = hyb.functional()

        def build(n):
            def frames(pk, vp, pv, ip):
                def body(i, acc):
                    u = CameraUniform(vp + acc * 1e-20, pv, ip)
                    img, _o, _d = frender(pk, u, W, H, hint=hint)
                    return acc + img[0, 0, 0] + img[H // 2, W // 2, 0]
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            jf = jax.jit(frames)
            return lambda: jf(fpack, u0.view_position, u0.proj_view,
                              u0.inv_proj)

        # round-5 VERDICT #4: per-point REPEATS with spread, no hand-
        # discarded anomalies — every timing claim quotes mean +- spread.
        # Each repeat is an independent slope_time (which itself medians
        # 5 1-vs-N slope estimates); the jit cache makes repeats cheap.
        if first_build is None:
            first_build = build  # drift sentinel: re-timed after the run
        reps = [slope_time(build) * 1000 for _ in range(N_REPEATS)]
        ms_mean = float(np.mean(reps))
        ms_spread = float(np.max(reps) - np.min(reps))
        rec = {"budget": budget, "ii": ii, "ms": round(ms_mean, 3),
               "ms_reps": [round(r, 3) for r in reps],
               "ms_spread": round(ms_spread, 3),
               "mrays": round(W * H / (ms_mean / 1000) / 1e6, 1),
               "errs": {k: round(v, 9) for k, v in errs.items()},
               "wall_s": round(time.time() - t0, 1)}
        results.append(rec)
        ckpt.write(json.dumps(rec) + "\n")
        ckpt.flush()
        print(rec, flush=True)

    # cost-model fit ms = a + b*budget over the FULL measured ladder,
    # every repeat an independent point (round-4 verdict: the 2-point
    # fit with a hand-discarded budget-32 anomaly steered the round;
    # now all points weigh in and the residual spread is reported).
    # budget=0 bypasses scoring entirely — keep it out of the linear fit
    # (it measures the pure-fast floor, not the hybrid's intercept)
    fitr = [r for r in results if r["budget"] > 0]
    bs = np.array([float(r["budget"]) for r in fitr
                   for _ in r.get("ms_reps", [r["ms"]])], np.float64)
    ms = np.array([m for r in fitr
                   for m in r.get("ms_reps", [r["ms"]])], np.float64)
    if len(fitr) >= 2:
        slope, intercept = np.polyfit(bs, ms, 1).tolist()
        resid = float(np.sqrt(np.mean(
            (ms - (intercept + slope * bs)) ** 2)))
    else:
        slope, intercept = 0.0, float(ms[0]) if len(ms) else 0.0
        resid = 0.0
    b0 = next((r["ms"] for r in results if r["budget"] == 0), None)

    conj = [r for r in results
            if max(r["errs"].values()) <= ERR_MARGIN
            and r["mrays"] >= MRAYS_TARGET]
    # prefer the LARGEST budget that still clears 500 Mrays/s (error
    # margin buys sweep-wide robustness); if the conjunction is empty on
    # this hardware, fall back to the FASTEST point that still meets the
    # 1e-3 error budget on every probe pose — bench.py headlines it with
    # the honest measured Mrays/s (v5e; the north star assumes v5p).
    if conj:
        chosen, is_conj = max(conj, key=lambda r: r["budget"]), True
    else:
        ok = [r for r in results
              if r["budget"] > 0 and max(r["errs"].values()) <= ERR_TARGET]
        chosen = max(ok, key=lambda r: r["mrays"]) if ok else None
        is_conj = False
    if chosen is not None:
        chosen = dict(chosen, conjunction=is_conj)
    # within-run drift sentinel (round-5 lesson: the tunnel's own speed
    # drifts by ~10-20% across hours — cross-run ladder deltas are NOT
    # code effects): re-time the first budget's cached variant at the END
    # of the run; the first-vs-end gap bounds the drift inside THIS run.
    drift = None
    if first_build is not None:
        first_fresh = next(r for r in results if r["budget"] not in done)
        end_reps = [slope_time(first_build) * 1000
                    for _ in range(N_REPEATS)]
        drift = {"budget": first_fresh["budget"],
                 "start_ms": first_fresh["ms"],
                 "end_ms": round(float(np.mean(end_reps)), 3),
                 "end_reps": [round(r, 3) for r in end_reps]}
        print(f"drift sentinel: {drift}", flush=True)

    out = {"operating_point": chosen,
           "fit": {"intercept_ms": round(intercept, 3),
                   "slope_ms_per_tile": round(slope, 5),
                   "fit_rms_resid_ms": round(resid, 3),
                   "n_fit_points": int(len(ms)),
                   "pure_fast_ms": b0},
           "drift_sentinel": drift,
           "ladder": results,
           "note": ("conjunction satisfied" if is_conj else
                    "no 500-Mrays/s conjunction on this chip; operating "
                    "point = fastest error-clearing budget" if chosen else
                    "NO budget meets the error target at this ii")}
    with open(f"/tmp/r3_logs/oppoint_{ii}.json", "w") as f:
        json.dump(out, f)
    # bench.py reads the committed operating point for its hybrid defaults
    repo_op = os.path.join(os.path.dirname(__file__), "..", "OPPOINT.json")
    with open(repo_op, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    os.makedirs("/tmp/r3_logs", exist_ok=True)
    main()
