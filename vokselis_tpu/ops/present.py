"""Present pass: ACES tonemap + sRGB encode + capture (shaders/present.wgsl).

The reference draws a fullscreen triangle sampling the fixed 1280x720 HDR
backbuffer with a bilinear ClampToEdge sampler into two targets at window
resolution — the swapchain surface and the rgb capture texture
(shaders/present.wgsl:106-119, src/context.rs:262-283,
src/context/present_pipeline.rs:36-112). Here that is one fused jit op: an
optional bilinear resize followed by ``srgb(ACES(x))`` (the vectorized
ceil-select sRGB form the present shader uses), returned once — the two wgpu
targets receive identical bytes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vokselis_tpu.core.colors import aces_film, linear_to_srgb_present


def _resize_bilinear(img, out_h: int, out_w: int):
    """Sample ``img`` (H, W, C) at the output grid's pixel-center uvs with
    wgpu linear/ClampToEdge semantics (half-texel centers)."""
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img
    u = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w
    v = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[None, :, None]
    fy = (y - y0)[:, None, None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x0c = jnp.clip(x0, 0, w - 1)
    x1c = jnp.clip(x0 + 1, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)
    top = img[y0c][:, x0c] * (1 - fx) + img[y0c][:, x1c] * fx
    bot = img[y1c][:, x0c] * (1 - fx) + img[y1c][:, x1c] * fx
    return top * (1 - fy) + bot * fy


@partial(jax.jit, static_argnames=("out_height", "out_width", "tonemap"))
def present(hdr, out_height: int | None = None, out_width: int | None = None,
            tonemap: bool = True):
    """Tonemap the HDR backbuffer for display/capture.

    ``hdr``: (H, W, 4) linear. Returns (out_H, out_W, 4) in [0,1] sRGB-encoded.
    ``tonemap=False`` is the present shader's ``fs_main_raw`` passthrough
    (shaders/present.wgsl:121-124).
    """
    out_h = out_height or hdr.shape[0]
    out_w = out_width or hdr.shape[1]
    img = _resize_bilinear(hdr.astype(jnp.float32), out_h, out_w)
    if not tonemap:
        return img
    rgb = linear_to_srgb_present(aces_film(img[..., :3]))
    return jnp.concatenate([rgb, img[..., 3:4]], axis=-1)


@jax.jit
def to_uint8(img):
    """Quantize a [0,1] float image to uint8 (the Rgba8Unorm capture target,
    src/context.rs:339-359): round-to-nearest like the GPU's unorm store."""
    return jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.uint8)
