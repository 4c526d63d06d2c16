#!/usr/bin/env python
"""TPU-free pose-robustness sweep: hybrid renderer (interpret-mode
Pallas) vs the jnp oracle across the 72-pose grid at 256^2, I=256,
budget=32 — a fast CPU proxy for tools/hybrid_sweep.py that exercises
the full pose-classification ladder (pose_hint windows, s_near/eye-in-
slab/magnification degeneracy, escalation, curvature-scored re-march)
end-to-end before burning TPU time.

Caught in round 3: zoom-0.6/pitch-1.2 close-ups rendering fast with
diffuse 5e-3 error (the s_near < 0.25 degeneracy criterion came from
this sweep). Error magnitudes are NOT the north-star numbers (different
resolution/intermediate); the signal is poses escaping their class.

Known 256^2-only residual: the worst remaining poses (zoom 1.6, a few
e-4) are re-march WINDOW OVERFLOW, not selection misses — per-tile slab
footprints scale as dims*TILE/frame, so a 256^2 frame demands >128
window rows at diagonal zoom-outs while the VMEM cap is 128 (the
renderer's last_overflow reports it; verified the selected tiles were
exactly the true-error tiles). At 1024^2 footprints are 4x smaller
(win 56-96, clean across the round-2 window sweep) and the class
disappears.

Checkpoints per pose to /tmp/cpu_minisweep.jsonl; rerun resumes.
Runtime ~10 min cold, ~7 s/pose warm. Usage: python tools/cpu_minisweep.py
"""
import json
import math
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
import jax.experimental.pallas as pl

_orig = pl.pallas_call
pl.pallas_call = lambda *a, **k: _orig(*a, **{**k, "interpret": True})

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from vokselis_tpu.core.camera import Camera
from vokselis_tpu.ops.hybrid import HybridBonsaiRenderer
from vokselis_tpu.ops import reference
from vokselis_tpu.volume import get_bonsai

W = H = 256
# overridable so variant sweeps (single-tile selection, other budgets)
# don't collide with the canonical pair/budget-32 checkpoint
CKPT = os.environ.get("VOK_MINISWEEP_CKPT", "/tmp/cpu_minisweep.jsonl")
BUDGET = int(os.environ.get("VOK_MINISWEEP_BUDGET", "32"))


def main():
    done = set()
    if os.path.exists(CKPT):
        for ln in open(CKPT):
            done.add(json.loads(ln)["pose"])

    vol = get_bonsai()
    hy = HybridBonsaiRenderer(vol, intermediate=256, budget=BUDGET)
    volj = jnp.asarray(vol)

    with open(CKPT, "a") as f:
        for z in (0.6, 1.0, 1.6):
            for p in (0.5, -0.35, 1.2):
                for i in range(8):
                    key = f"{z}/{p}/{i}"
                    if key in done:
                        continue
                    cam = Camera(zoom=z, pitch=p, yaw=2 * math.pi * i / 8,
                                 target=(0.5, 0.5, 0.5), aspect=1.0)
                    u = cam.uniform()
                    t0 = time.time()
                    h = np.asarray(hy(u, W, H))
                    e = np.asarray(
                        reference.render_bonsai(volj, u, width=W, height=H)
                    )
                    d = np.abs(h[..., :3] - e[..., :3])
                    rec = {"pose": key, "mean": float(d.mean()),
                           "max": float(d.max()), "sec": time.time() - t0}
                    f.write(json.dumps(rec) + "\n")
                    f.flush()
                    print(rec, flush=True)

    recs = [json.loads(l) for l in open(CKPT)]
    means = [r["mean"] for r in recs]
    print(f"poses: {len(recs)}  mean-of-means: {sum(means)/len(means):.3e}  "
          f"worst: {max(means):.3e}  over 1e-3: {sum(m > 1e-3 for m in means)}")


if __name__ == "__main__":
    main()
