"""Measure the shear-warp fast renderer's error vs the exact kernel and its
speed, across intermediate resolutions and poses — the numbers quoted in
PARITY_REPORT.md's fast-mode section. Run on the TPU:

    python tools/fast_error_report.py
"""

from __future__ import annotations

import datetime
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402

    from bench import slope_time  # noqa: E402
    from vokselis_tpu.core.camera import Camera, CameraUniform  # noqa: E402
    from vokselis_tpu.ops.pallas.march_bonsai import build_renderer  # noqa: E402
    from vokselis_tpu.ops.shear_warp import (  # noqa: E402
        _render_fast,
        prepare_fast_volume,
    )
    from vokselis_tpu.volume.io import get_bonsai  # noqa: E402

    width = height = 1024
    vol = get_bonsai()
    pack = prepare_fast_volume(vol)
    render, rpack = build_renderer(vol)

    poses = {
        "default": Camera.bonsai(1.0),
        "tilt": Camera(zoom=1.2, pitch=0.9, yaw=1.1, target=(0.5, 0.5, 0.5),
                       aspect=1.0),
        "low": Camera(zoom=1.0, pitch=0.05, yaw=2.5, target=(0.5, 0.5, 0.5),
                      aspect=1.0),
        "orbit135": Camera(zoom=1.0, pitch=0.5, yaw=3 * math.pi / 4,
                           target=(0.5, 0.5, 0.5), aspect=1.0),
    }

    print(f"# fast-mode error/speed report @ {width}x{height}, "
          f"{jax.devices()[0].device_kind}")
    print("| I | pose | mean err | p99 err | max err |")
    print("|---|---|---|---|---|")
    rows = []
    for ii in (256, 512):
        for name, cam in poses.items():
            u = cam.uniform()
            exact = np.asarray(render(rpack, u, width, height))
            fast = np.asarray(_render_fast(pack, u, width, height, ii, True, 32))
            err = np.abs(fast - exact)
            rows.append((ii, name, err.mean(), np.quantile(err, 0.99), err.max()))
            print(f"| {ii} | {name} | {err.mean():.5f} | "
                  f"{np.quantile(err, 0.99):.4f} | {err.max():.3f} |")

    u0 = poses["default"].uniform()
    print("\n| I | ms/frame | Mrays/s |")
    print("|---|---|---|")
    for ii in (256, 512):
        def build(n, ii=ii):
            def frames(pk, vp, pv, ip):
                def body(i, acc):
                    u = CameraUniform(vp + acc * 1e-20, pv, ip)
                    img = _render_fast(pk, u, width, height, ii, True, 32)
                    return acc + img[0, 0, 0] + img[height // 2, width // 2, 0]
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
            jf = jax.jit(frames)
            return lambda: jf(pack, u0.view_position, u0.proj_view, u0.inv_proj)

        sec = slope_time(build)
        print(f"| {ii} | {sec * 1000:.2f} | {width * height / sec / 1e6:.0f} |")

    print(f"\nGenerated {datetime.date.today()}.")


if __name__ == "__main__":
    main()
