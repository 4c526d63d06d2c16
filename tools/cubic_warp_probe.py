#!/usr/bin/env python
"""Does higher-order reconstruction in the FINAL warp cut the fast mode's
error? The dominant fast-mode error term is the homography warp's bilinear
reconstruction of the composited intermediate (~1/I, PARITY_REPORT.md), and
the MXU warp kernel makes reconstruction order nearly free (the hat weights
are dense matrices either way). This probe A/Bs bilinear vs Catmull-Rom in
the CPU path (map_coordinates monkeypatch) against the jnp oracle across
poses BEFORE paying the TPU kernel work.

Usage: python tools/cubic_warp_probe.py [size] [ii]
"""
from __future__ import annotations

import math
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vokselis_tpu.core.camera import Camera
from vokselis_tpu.ops import reference
from vokselis_tpu.volume.io import get_bonsai

W = H = int(sys.argv[1]) if len(sys.argv) > 1 else 256
II = int(sys.argv[2]) if len(sys.argv) > 2 else 256


def catmull_rom_w(d):
    d = jnp.abs(d)
    d2, d3 = d * d, d * d * d
    w1 = 1.5 * d3 - 2.5 * d2 + 1.0
    w2 = -0.5 * d3 + 2.5 * d2 - 4.0 * d + 2.0
    return jnp.where(d < 1.0, w1, jnp.where(d < 2.0, w2, 0.0))


def cubic_map_coordinates(c, coords, order=1, mode="constant", cval=0.0):
    """Catmull-Rom lookup of c (I, J) at fractional [av, bu]; taps clamp to
    the edge (the kernel's behavior), coords clamped to the image."""
    av, bu = coords
    ii, jj = c.shape
    av = jnp.clip(av, 0.0, ii - 1.0)
    bu = jnp.clip(bu, 0.0, jj - 1.0)
    fv = jnp.floor(av)
    fu = jnp.floor(bu)
    out = jnp.zeros_like(av)
    for dv in range(-1, 3):
        iv = jnp.clip(fv + dv, 0, ii - 1).astype(jnp.int32)
        wv = catmull_rom_w(av - (fv + dv))
        row_acc = jnp.zeros_like(av)
        for du in range(-1, 3):
            iu = jnp.clip(fu + du, 0, jj - 1).astype(jnp.int32)
            wu = catmull_rom_w(bu - (fu + du))
            row_acc = row_acc + wu * c[iv, iu]
        out = out + wv * row_acc
    return out


def main():
    import vokselis_tpu.ops.shear_warp as sw

    vol = get_bonsai()
    packs = sw.prepare_fast_volume(vol)
    volj = jnp.asarray(vol)

    poses = [("bench", Camera.bonsai(1.0))]
    for z in (1.0, 1.6):
        for p in (0.5, -0.35):
            for i in (0, 1, 3):
                poses.append((f"z{z}-p{p}-y{i}",
                              Camera(zoom=z, pitch=p, yaw=2 * math.pi * i / 8,
                                     target=(0.5, 0.5, 0.5), aspect=1.0)))

    import jax.scipy.ndimage as ndi

    orig = ndi.map_coordinates
    rows = []
    for name, cam in poses:
        u = cam.uniform()
        e = np.asarray(reference.render_bonsai(volj, u, width=W, height=H))
        errs = {}
        for order in (1, 3):
            ndi.map_coordinates = orig if order == 1 else cubic_map_coordinates
            # re-trace each time (the fallback import binds at trace time)
            f = np.asarray(sw._render_fast.__wrapped__(
                packs, u, W, H, II, True))
            errs[order] = float(np.abs(f[..., :3] - e[..., :3]).mean())
        ndi.map_coordinates = orig
        ratio = errs[3] / max(errs[1], 1e-12)
        rows.append((name, errs[1], errs[3], ratio))
        print(f"{name:18s} bilin {errs[1]:.3e}  cubic {errs[3]:.3e}  "
              f"ratio {ratio:.3f}", flush=True)

    r = np.array([r[3] for r in rows])
    print(f"median ratio {np.median(r):.3f}  worst {r.max():.3f}  "
          f"best {r.min():.3f}")


if __name__ == "__main__":
    main()
