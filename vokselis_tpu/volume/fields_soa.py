"""Structure-of-arrays variants of the procedural fields for TPU kernels.

Identical math to :mod:`vokselis_tpu.volume.fields` (shaders/xor.wgsl) but
over separate component arrays instead of a trailing (..., 3) axis — a
trailing axis of 3 occupies 3 of 128 vector lanes on TPU and wastes 97% of
the VPU; SoA keeps every lane busy. Used inside Pallas kernels and the fast
jnp paths; parity with the AoS forms is covered by tests.
"""

from __future__ import annotations

import jax.numpy as jnp

from vokselis_tpu.core.colors import fract, mix, smoothstep


def hash_(h):
    return fract(jnp.sin(h) * 43758.5453123)


def noise(x, y, z):
    """Value noise (shaders/xor.wgsl:22-35), SoA."""
    px, py, pz = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    fx, fy, fz = x - px, y - py, z - pz
    fx = fx * fx * (3.0 - 2.0 * fx)
    fy = fy * fy * (3.0 - 2.0 * fy)
    fz = fz * fz * (3.0 - 2.0 * fz)
    n = px + py * 157.0 + 113.0 * pz
    return mix(
        mix(
            mix(hash_(n + 0.0), hash_(n + 1.0), fx),
            mix(hash_(n + 157.0), hash_(n + 158.0), fx),
            fy,
        ),
        mix(
            mix(hash_(n + 113.0), hash_(n + 114.0), fx),
            mix(hash_(n + 270.0), hash_(n + 271.0), fx),
            fy,
        ),
        fz,
    )


def fbm(x, y, z):
    f = 0.5000 * noise(x, y, z)
    x, y, z = x * 2.01, y * 2.01, z * 2.01
    f = f + 0.2500 * noise(x, y, z)
    x, y, z = x * 2.02, y * 2.02, z * 2.02
    f = f + 0.1250 * noise(x, y, z)
    return f


def noise_volume(cx, cy, cz, sin_t):
    """fbm field (shaders/xor.wgsl:55-61). ``sin_t`` is sin(time) precomputed
    (constant across march steps). Returns (val, alpha)."""
    px = (cx + 1.0) * 32.0
    py = (cy + sin_t * 0.1) * 32.0
    pz = (cz + 21.0) * 32.0
    val = fbm(px, py, pz)
    r = jnp.sqrt(cx * cx + cy * cy + cz * cz)
    alpha = val * smoothstep(0.5, 0.25, r)
    return val, alpha


def noise_volume_alpha(cx, cy, cz, sin_t):
    """Alpha channel only (used by the gradient)."""
    return noise_volume(cx, cy, cz, sin_t)[1]


def gradient(cx, cy, cz, sin_t, eps: float = 1e-4):
    """One-sided difference normal of the alpha (shaders/xor.wgsl:63-67)."""
    a0 = noise_volume_alpha(cx, cy, cz, sin_t)
    gx = a0 - noise_volume_alpha(cx - eps, cy, cz, sin_t)
    gy = a0 - noise_volume_alpha(cx, cy - eps, cz, sin_t)
    gz = a0 - noise_volume_alpha(cx, cy, cz - eps, sin_t)
    n = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    inv = 1.0 / jnp.maximum(n, 1e-20)
    return gx * inv, gy * inv, gz * inv


def xor_field(cx, cy, cz, sin_t):
    """Bitwise x&y&z field (shaders/xor.wgsl:46-53), SoA."""
    px = (cx + 1.0) * 32.0
    py = (cy + sin_t * 0.1) * 32.0
    pz = (cz + 21.0) * 32.0
    res = 25.0
    qx = (px * res).astype(jnp.int32)
    qy = (py * res).astype(jnp.int32)
    qz = (pz * res).astype(jnp.int32)
    val = (qx & qy & qz).astype(jnp.float32) / res
    r = jnp.sqrt(cx * cx + cy * cy + cz * cz)
    alpha = val * smoothstep(0.7, 0.0, r)
    return val, alpha


def trig_field(cx, cy, cz, time):
    """Framework-defined trig density (see fields.trig_field), SoA."""
    val = 0.5 + 0.5 * jnp.sin(8.0 * cx + time) * jnp.sin(
        8.0 * cy + 0.5 * time
    ) * jnp.sin(8.0 * cz)
    r = jnp.sqrt(cx * cx + cy * cy + cz * cz)
    alpha = val * smoothstep(0.9, 0.2, r)
    return val, alpha
