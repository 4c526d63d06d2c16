#!/usr/bin/env python
"""Targeted A/B of the pair-ranking objective on the sweep's worst poses.

The round-4 72-pose sweep (budget 64, I=512, max-ranking) left exactly
three poses over the 1e-3 gate: zoom=1.0 pitch=-0.35 yaw_i in {1, 5, 7}
(1.11-1.25e-3). This probes those poses + the bench pose under both
VOK_PAIR_RANK objectives without paying for a full 72-pose sweep.

The ranking knob is read at import time, so each mode runs in a fresh
subprocess. Usage: python tools/pair_rank_probe.py [budget] [ii]
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

POSES = [
    ("bench", dict(zoom=1.0, pitch=0.5, yaw_i=0)),
    ("z1.0/p-0.35/y1", dict(zoom=1.0, pitch=-0.35, yaw_i=1)),
    ("z1.0/p-0.35/y5", dict(zoom=1.0, pitch=-0.35, yaw_i=5)),
    ("z1.0/p-0.35/y7", dict(zoom=1.0, pitch=-0.35, yaw_i=7)),
]


def run_mode(mode: str, budget: int, ii: int) -> dict:
    env = dict(os.environ, VOK_PAIR_RANK=mode)
    code = f"""
import json, math, sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import jax, jax.numpy as jnp
from vokselis_tpu.core.camera import Camera
from vokselis_tpu.ops.hybrid import HybridBonsaiRenderer
from vokselis_tpu.ops.pallas.march_bonsai import build_renderer
from vokselis_tpu.volume.io import get_bonsai

W = H = 1024
vol = get_bonsai()
hyb = HybridBonsaiRenderer(vol, intermediate={ii}, budget={budget})
render, pack = build_renderer(vol, with_overflow=True)

@jax.jit
def diff(h, e):
    return jnp.abs(h[..., :3] - e[..., :3]).mean()

out = {{}}
for name, p in {POSES!r}:
    cam = Camera(zoom=p["zoom"], pitch=p["pitch"],
                 yaw=2 * math.pi * p["yaw_i"] / 8,
                 target=(0.5, 0.5, 0.5), aspect=1.0)
    u = cam.uniform()
    e, _ = render(pack, u, W, H)
    h, _ = hyb._call_traced(u, W, H)
    out[name] = float(diff(h, e))
print("RESULT " + json.dumps(out))
"""
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=3600)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    print(r.stdout[-2000:], file=sys.stderr)
    print(r.stderr[-2000:], file=sys.stderr)
    raise RuntimeError(f"mode {mode} produced no RESULT")


def main():
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ii = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    res = {}
    for mode in ("max", "sum"):
        res[mode] = run_mode(mode, budget, ii)
        print(f"== {mode}", flush=True)
        for k, v in res[mode].items():
            print(f"  {k:18s} {v:.3e}", flush=True)
    print(json.dumps({"budget": budget, "ii": ii, **res}))


if __name__ == "__main__":
    main()
