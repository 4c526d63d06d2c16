"""One-off probe: how much of the fast mode's error floor is bf16 operands?

Runs the shear-warp renderer at I in {256, 512} for two poses against the
exact kernel, in the CURRENT precision mode (set VOK_FAST_F32=1 for the f32
variant), plus a frame-time slope. Drive both variants:

    python tools/fast_precision_probe.py
    VOK_FAST_F32=1 python tools/fast_precision_probe.py
"""

from __future__ import annotations

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
        _FAST_F32,
        _render_fast,
        prepare_fast_volume,
    )
    from vokselis_tpu.volume.io import get_bonsai  # noqa: E402

    sizes = [int(a) for a in sys.argv[1:]] or [256, 512]
    width = height = 1024
    vol = get_bonsai()
    pack = prepare_fast_volume(vol)
    render, rpack = build_renderer(vol)
    mode = "f32" if _FAST_F32 else "bf16"

    poses = {
        "default": Camera.bonsai(1.0),
        "orbit135": Camera(zoom=1.0, pitch=0.5, yaw=3 * math.pi / 4,
                           target=(0.5, 0.5, 0.5), aspect=1.0),
        # axis-aligned: every box-hitting ray has irho == 1 and front-face
        # slab-plane phase — isolates the warp-reconstruction error
        "axis": Camera(zoom=1.0, pitch=0.0, yaw=0.0,
                       target=(0.5, 0.5, 0.5), aspect=1.0),
    }
    print(f"mode={mode} dev={jax.devices()[0].device_kind}")
    for ii in sizes:
        for name, cam in poses.items():
            u = cam.uniform()
            exact = np.asarray(render(rpack, u, width, height))
            fast = np.asarray(_render_fast(pack, u, width, height, ii, True, 32))
            err = np.abs(fast - exact)
            print(f"I={ii} pose={name} mean={err.mean():.5f} "
                  f"p99={np.quantile(err, 0.99):.4f} max={err.max():.3f}")

    u0 = poses["default"].uniform()
    for ii in sizes:
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
        print(f"I={ii} ms={sec * 1000:.2f} mrays={width * height / sec / 1e6:.0f}")


if __name__ == "__main__":
    main()
