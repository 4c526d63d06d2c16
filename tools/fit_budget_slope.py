#!/usr/bin/env python
"""Decompose the hybrid frame cost from operating-point checkpoints:

    ms(budget) ~= intercept + slope * budget

- intercept - fast_ms  = scoring + pack/merge overhead (the hybrid's fixed
  tax on top of the pure shear-warp frame, ops/hybrid.py steps 1-2);
- slope                = per-tile exact re-march cost (µs/tile,
  render_bonsai_tiles_into) — prices the error budget in milliseconds.

Reads the jsonl written by tools/hybrid_operating_point.py. Run BEFORE any
hybrid micro-optimization so the fix targets the measured term (CLAUDE.md
round-3 plan).

Usage: python tools/fit_budget_slope.py [ii] [fast_ms]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def main():
    ii = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    # measured pure fast frame at I=512, 1024^2 (profile_fast2, CLAUDE.md)
    fast_ms = float(sys.argv[2]) if len(sys.argv) > 2 else 1.55

    path = f"/tmp/hybrid_oppoint_{ii}.jsonl"
    if not os.path.exists(path):
        sys.exit(f"no checkpoints at {path} — run hybrid_operating_point.py")
    recs = {}
    for line in open(path):
        r = json.loads(line)
        recs[r["budget"]] = r  # last write wins
    recs = sorted(recs.values(), key=lambda r: r["budget"])
    if len(recs) < 2:
        sys.exit(f"need >=2 budgets to fit, have {len(recs)}")

    b = np.array([r["budget"] for r in recs], float)
    ms = np.array([r["ms"] for r in recs], float)
    slope, intercept = np.polyfit(b, ms, 1)

    print(f"I={ii}: {len(recs)} budgets {[int(x) for x in b]}")
    for r in recs:
        fit = intercept + slope * r["budget"]
        print(f"  budget={r['budget']:4d}: {r['ms']:7.3f} ms "
              f"({r['mrays']:6.1f} Mrays/s)  fit {fit:6.3f}  "
              f"resid {r['ms'] - fit:+6.3f}")
    print(f"\nintercept          = {intercept:.3f} ms")
    print(f"  - fast frame     = {fast_ms:.3f} ms")
    print(f"  = scoring/merge  = {intercept - fast_ms:.3f} ms")
    print(f"slope (re-march)   = {slope * 1000:.2f} us/tile")
    tgt = 1024 * 1024 / 500e6 * 1e3
    print(f"budget at 500 Mrays/s ({tgt:.3f} ms): "
          f"{(tgt - intercept) / slope:.0f} tiles")


if __name__ == "__main__":
    main()
