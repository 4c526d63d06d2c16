#!/usr/bin/env python
"""Measure the frame delta of the analytic-gradient xor march (config 2).

The fused noise+xor kernel can source its normal from (a) the reference's
eps=1e-4 one-sided difference (bit-identical to the jnp oracle — 60 hash
sins per step via the hash-shared fbm4) or (b) the closed-form gradient of
alpha = fbm * radial mask, which reuses the value's own 24 corner hashes
(zero extra sins). The march is transcendental-bound, so (b) is the speed
lever; this probe measures what it costs in CORRECTNESS: interpret-mode
256^2 frames at several times/poses, mean and max |analytic - fd| over
rgb. The oracle equals the fd render bitwise, so the delta IS the error
vs the oracle. Run on CPU (conftest-free: forces the CPU backend itself).

Usage: python tools/xor_grad_probe.py [size]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vokselis_tpu.core.camera import Camera  # noqa: E402
from vokselis_tpu.ops.pallas.march_field import render_field_pallas  # noqa: E402


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    poses = {
        "xor-default": Camera.xor(1.0),
        "zoom-0.7": Camera(zoom=0.7, pitch=0.3, yaw=0.8, aspect=1.0),
        "top-down": Camera(zoom=1.3, pitch=1.2, yaw=0.0, aspect=1.0),
    }
    times = [0.0, 0.7, 2.5]
    worst = 0.0
    for pname, cam in poses.items():
        u = cam.uniform()
        for t in times:
            kw = dict(width=size, height=size, field="noise",
                      shading="xor", interpret=True)
            fd = render_field_pallas(u, t, grad="fd", **kw)
            an = render_field_pallas(u, t, grad="analytic", **kw)
            d = jnp.abs(an[..., :3] - fd[..., :3])
            mean = float(d.mean())
            mx = float(d.max())
            worst = max(worst, mean)
            print(f"{pname:12s} t={t:3.1f}: mean {mean:.3e}  max {mx:.3e}",
                  flush=True)
    print(f"worst per-frame mean: {worst:.3e}")


if __name__ == "__main__":
    main()
