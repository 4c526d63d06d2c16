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


# ---- fused density+gradient (hash-sharing) --------------------------------
#
# The raymarch needs the field at p AND at three eps-offset points per step
# (one-sided gradient). Evaluated independently that is 4 fbm calls = 96
# hash_() sins per step (plus the redundant alpha re-eval = 120). But the
# lattice hash argument n = px + 157*py + 113*pz is built from FLOOR-valued
# f32s whose magnitudes stay far below 2^24, so every add/multiply in it is
# EXACT integer arithmetic in f32: an eps-offset eval's lattice differs from
# the base only where its floor crossed (by exactly 1), and its corner
# hashes n_e + k coincide BITWISE with base corners whenever n_e == n0 or
# (n_e + k) == (n0 + k') for integer k'. Each offset therefore needs only
# the 4 corners on its own side (computed at n_e directly — equal to the
# base corners when no crossing happened) plus 4 selects — 60 sins per
# step total, bit-identical results.


def _smooth(f):
    return f * f * (3.0 - 2.0 * f)


def _mix8(h0, h1, h2, h3, h4, h5, h6, h7, fx, fy, fz):
    return mix(
        mix(mix(h0, h1, fx), mix(h2, h3, fx), fy),
        mix(mix(h4, h5, fx), mix(h6, h7, fx), fy),
        fz,
    )


_OCTAVES = ((0.5000, 2.01), (0.2500, 2.02), (0.1250, None))


def fbm_base(x, y, z):
    """3-octave fbm base eval (24 sins) that also returns the per-octave
    lattice state (floors, smoothed fracs, 8 corner hashes) so
    :func:`fbm_offsets_from_base` can evaluate the three eps-offset points
    with 4 new hashes per octave each."""
    f0 = 0.0
    state = []
    for amp, s in _OCTAVES:
        px, py, pz = jnp.floor(x), jnp.floor(y), jnp.floor(z)
        fx, fy, fz = _smooth(x - px), _smooth(y - py), _smooth(z - pz)
        n0 = px + py * 157.0 + 113.0 * pz
        h = tuple(
            hash_(n0 + k)
            for k in (0.0, 1.0, 157.0, 158.0, 113.0, 114.0, 270.0, 271.0)
        )
        f0 = f0 + amp * _mix8(*h, fx, fy, fz)
        state.append((px, py, pz, fx, fy, fz) + h)
        if s is not None:
            x, y, z = x * s, y * s, z * s
    return f0, tuple(state)


def fbm_offsets_from_base(state, xe, ye, ze):
    """fbm at the three one-sided offset points, reusing the base lattice
    state (36 sins for all three). Bitwise-equal to independent fbm calls."""
    fx_ = fy_ = fz_ = 0.0
    for (amp, s), st in zip(_OCTAVES, state):
        px, py, pz, fx, fy, fz, h0, h1, h2, h3, h4, h5, h6, h7 = st

        pxe = jnp.floor(xe)
        cx_ = pxe < px
        n_x = pxe + py * 157.0 + 113.0 * pz
        fxe = _smooth(xe - pxe)
        vx = _mix8(
            hash_(n_x + 0.0), jnp.where(cx_, h0, h1),
            hash_(n_x + 157.0), jnp.where(cx_, h2, h3),
            hash_(n_x + 113.0), jnp.where(cx_, h4, h5),
            hash_(n_x + 270.0), jnp.where(cx_, h6, h7),
            fxe, fy, fz,
        )

        pye = jnp.floor(ye)
        cy_ = pye < py
        n_y = px + pye * 157.0 + 113.0 * pz
        fye = _smooth(ye - pye)
        vy = _mix8(
            hash_(n_y + 0.0), hash_(n_y + 1.0),
            jnp.where(cy_, h0, h2), jnp.where(cy_, h1, h3),
            hash_(n_y + 113.0), hash_(n_y + 114.0),
            jnp.where(cy_, h4, h6), jnp.where(cy_, h5, h7),
            fx, fye, fz,
        )

        pze = jnp.floor(ze)
        cz_ = pze < pz
        n_z = px + py * 157.0 + 113.0 * pze
        fze = _smooth(ze - pze)
        vz = _mix8(
            hash_(n_z + 0.0), hash_(n_z + 1.0),
            hash_(n_z + 157.0), hash_(n_z + 158.0),
            jnp.where(cz_, h0, h4), jnp.where(cz_, h1, h5),
            jnp.where(cz_, h2, h6), jnp.where(cz_, h3, h7),
            fx, fy, fze,
        )
        fx_ = fx_ + amp * vx
        fy_ = fy_ + amp * vy
        fz_ = fz_ + amp * vz
        if s is not None:
            xe, ye, ze = xe * s, ye * s, ze * s
    return fx_, fy_, fz_


def fbm4(x, y, z, xe, ye, ze):
    """fbm at the base point and the three one-sided offsets, hash-shared."""
    f0, state = fbm_base(x, y, z)
    fx_, fy_, fz_ = fbm_offsets_from_base(state, xe, ye, ze)
    return f0, fx_, fy_, fz_


def noise_volume_grad(cx, cy, cz, sin_t, eps: float = 1e-4):
    """Fused (val, alpha, normal) of the fbm field: one hash-shared fbm4
    instead of 5 independent field evals. Bit-identical to
    ``noise_volume(...) + gradient(...)``."""
    ox = cx - eps
    oy = cy - eps
    oz = cz - eps
    x = (cx + 1.0) * 32.0
    y = (cy + sin_t * 0.1) * 32.0
    z = (cz + 21.0) * 32.0
    xe = (ox + 1.0) * 32.0
    ye = (oy + sin_t * 0.1) * 32.0
    ze = (oz + 21.0) * 32.0
    f0, fx_, fy_, fz_ = fbm4(x, y, z, xe, ye, ze)

    def window(v, ax, ay, az):
        rr = jnp.sqrt(ax * ax + ay * ay + az * az)
        return v * smoothstep(0.5, 0.25, rr)

    a0 = window(f0, cx, cy, cz)
    gx = a0 - window(fx_, ox, cy, cz)
    gy = a0 - window(fy_, cx, oy, cz)
    gz = a0 - window(fz_, cx, cy, oz)
    n = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    inv = 1.0 / jnp.maximum(n, 1e-20)
    return f0, a0, gx * inv, gy * inv, gz * inv


def fbm_grad_base(x, y, z):
    """fbm value + ANALYTIC lattice-space gradient from the SAME 24 corner
    hashes as the value (zero extra transcendentals — the one-sided-diff
    path pays 36 more sins in fbm_offsets_from_base). Value noise is a
    trilinear mix of corner hashes with C1 smoothstep weights, so within a
    cell d(noise)/dx = d(mix8)/dfx * s'(x - px), where s'(t) = 6t(1-t);
    octave o's coordinates carry a cumulative scale (2.01, 2.02) whose
    chain-rule factor multiplies its gradient. Returns (f, gx, gy, gz)
    with the gradient in LATTICE units of the first octave."""
    f0 = 0.0
    gx = gy = gz = 0.0
    cum = 1.0
    for amp, s in _OCTAVES:
        px, py, pz = jnp.floor(x), jnp.floor(y), jnp.floor(z)
        tx, ty, tz = x - px, y - py, z - pz
        fx, fy, fz = _smooth(tx), _smooth(ty), _smooth(tz)
        dsx = 6.0 * tx * (1.0 - tx)
        dsy = 6.0 * ty * (1.0 - ty)
        dsz = 6.0 * tz * (1.0 - tz)
        n0 = px + py * 157.0 + 113.0 * pz
        h0, h1, h2, h3, h4, h5, h6, h7 = (
            hash_(n0 + k)
            for k in (0.0, 1.0, 157.0, 158.0, 113.0, 114.0, 270.0, 271.0)
        )
        m01 = mix(h0, h1, fx)
        m23 = mix(h2, h3, fx)
        m45 = mix(h4, h5, fx)
        m67 = mix(h6, h7, fx)
        a = mix(m01, m23, fy)
        b = mix(m45, m67, fy)
        f0 = f0 + amp * mix(a, b, fz)
        dfx = mix(mix(h1 - h0, h3 - h2, fy), mix(h5 - h4, h7 - h6, fy), fz)
        dfy = mix(m23 - m01, m67 - m45, fz)
        dfz = b - a
        w = amp * cum
        gx = gx + w * dfx * dsx
        gy = gy + w * dfy * dsy
        gz = gz + w * dfz * dsz
        if s is not None:
            x, y, z = x * s, y * s, z * s
            cum = cum * s
    return f0, gx, gy, gz


def noise_volume_grad_analytic(cx, cy, cz, sin_t):
    """(val, alpha, normal) of the fbm field with the normal from the
    ANALYTIC gradient of alpha = fbm(p(c)) * smoothstep(0.5, 0.25, r(c))
    instead of the reference's eps = 1e-4 one-sided difference
    (shaders/xor.wgsl:63-67). 24 hash sins per step instead of
    noise_volume_grad's 60 — the march kernel is transcendental-bound, so
    this is the config-2 speed lever (round-5 verdict #5).

    NOT bit-identical to the oracle: the normalized one-sided-diff vector
    equals the normalized analytic gradient up to O(eps * |f''| / |f'|)
    plus the measure-~eps set of lanes whose offset point crossed a
    lattice cell. Measured frame error vs the exact-gradient render and
    the decision to default it live in tools/xor_grad_probe.py /
    PARITY_REPORT.md; VOK_XOR_GRAD=fd restores the oracle-exact path."""
    x = (cx + 1.0) * 32.0
    y = (cy + sin_t * 0.1) * 32.0
    z = (cz + 21.0) * 32.0
    f0, gpx, gpy, gpz = fbm_grad_base(x, y, z)
    r = jnp.sqrt(cx * cx + cy * cy + cz * cz)
    mask = smoothstep(0.5, 0.25, r)
    a0 = f0 * mask
    # d/dr of smoothstep(0.5, 0.25, r): t = clamp((r-0.5)/-0.25, 0, 1),
    # mask = t^2(3-2t) -> dmask/dr = 6t(1-t) * (-4); the clamp zeroes it
    # outside (0.25, 0.5) exactly like the FD of a flat mask
    t = jnp.clip((r - 0.5) * -4.0, 0.0, 1.0)
    dmask = 6.0 * t * (1.0 - t) * -4.0
    # the lattice map p(c) scales every axis by 32 (the sin_t shift is a
    # translation); radial term via c/r with an r ~ 0 guard (dmask = 0
    # there anyway — the mask plateau covers r < 0.25)
    w_rad = f0 * dmask / jnp.maximum(r, 1e-20)
    gx = 32.0 * mask * gpx + w_rad * cx
    gy = 32.0 * mask * gpy + w_rad * cy
    gz = 32.0 * mask * gpz + w_rad * cz
    n = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    inv = 1.0 / jnp.maximum(n, 1e-20)
    return f0, a0, gx * inv, gy * inv, gz * inv


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
