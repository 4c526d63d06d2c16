"""Pixel comparison against the reference's committed xor screenshot
(/root/reference/volume.png, README.md:21).

The screenshot is 958x1050 and was captured at an UNKNOWN runtime camera
and time (the field animates; the user could have dragged/zoomed), so an
exact comparison is impossible without the pose. This tool renders our
full pipeline (Pallas march -> present resize/tonemap at the screenshot's
window size) over a pose/time grid and reports the best normalized COLOR
correlation and per-pixel error — the de-facto golden check VERDICT round
1 asked to attempt and record.

Recorded outcome (v5e, 2026-08-16): best color correlation 0.894 at
zoom=0.70x default, yaw offset +2.618 rad, pitch offset -0.35, t=0;
mean |pixel| error 0.018, p99 0.20. The cloud silhouette, fbm texture
scale, grey body and red directional tint all align (side-by-side visually
near-identical); the residual is the unknown pose/time and the wgpu GPU's
own sin()/precision in the hash field (chaotic per-pixel).
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
    from PIL import Image  # noqa: E402

    from vokselis_tpu.core.camera import Camera, CameraUniform  # noqa: E402
    from vokselis_tpu.media.png import write_png  # noqa: E402
    from vokselis_tpu.ops.pallas.march_field import render_field_pallas  # noqa: E402
    from vokselis_tpu.ops.present import present  # noqa: E402

    ref_path = "/root/reference/volume.png"
    ref = np.asarray(Image.open(ref_path).convert("RGB"), np.float32) / 255.0
    rh, rw = ref.shape[:2]

    def down(img, f=8):
        h, w = img.shape[:2]
        return img[: h // f * f, : w // f * f].reshape(
            h // f, f, w // f, f, 3).mean((1, 3))

    ref_d = down(ref)
    aspect = rw / rh
    base = Camera.xor(aspect)

    @jax.jit
    def render_one(vp, pv, ip, t):
        u = CameraUniform(vp, pv, ip)
        hdr = render_field_pallas(u, t, width=1280, height=720)
        return present(hdr, out_height=rh, out_width=rw)

    best = (-2.0, None, None)
    for dyaw in np.arange(-math.pi, math.pi, math.pi / 12):
        for zoom in (0.6, 0.65, 0.7):
            for dpitch in (-0.35, -0.25, -0.15):
                cam = Camera(
                    zoom=base.zoom * zoom, pitch=base.pitch + dpitch,
                    yaw=base.yaw + dyaw, target=base.target, aspect=aspect,
                )
                u = cam.uniform()
                img = np.asarray(render_one(
                    u.view_position, u.proj_view, u.inv_proj, jnp.float32(0.0)
                ))
                d = down(img[..., :3])
                a = d - d.mean((0, 1))
                b = ref_d - ref_d.mean((0, 1))
                corr = float((a * b).sum()
                             / max(np.sqrt((a * a).sum() * (b * b).sum()), 1e-9))
                if corr > best[0]:
                    best = (corr, (zoom, float(dyaw), dpitch), img)

    corr, params, img = best
    err = np.abs(img[..., :3] - ref)
    print(f"best color correlation: {corr:.4f} at (zoom x{params[0]}, "
          f"dyaw {params[1]:+.3f}, dpitch {params[2]:+.2f}, t=0)")
    print(f"pixel error at best pose: mean={err.mean():.4f} "
          f"p99={np.quantile(err, 0.99):.3f}")
    side = np.concatenate([img[..., :3], ref], axis=1)
    write_png("volume_cmp.png", (np.clip(side, 0, 1) * 255 + 0.5).astype(np.uint8))
    print("side-by-side written to volume_cmp.png (ours | reference)")


if __name__ == "__main__":
    main()
