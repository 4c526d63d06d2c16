#!/usr/bin/env python
"""Fit the polynomial replacements for the composite's transcendentals.

The fused composite kernel (ops/pallas/shear_resample.py) measured ~90%
transcendental-bound at I=512 (VOK_COMP_ABLATE probe, round 4: pow
0.43 ms + palette cos 0.51 ms of the 0.99 ms kernel). Every per-slab
quantity is a 1-D function of the resampled sample (and irho):

    tv  = smoothstep(0.10, 1.2, min(0.9, samp))   tv in [0, TVMAX]
    c_k = 0.5 + 0.5 cos(TAU (c_k tv + d_k))       k in {r, g, b}
    a   = 1 - (1 - tv)^irho                       irho in [1, sqrt(3)]

This script fits, in float64 Chebyshev space on the exact domains:

    c_k(tv)           ~ Cheb_k(u),   u = 2 tv / TVMAX - 1
    ln(1-tv) / tv     ~ P(u)         (factored zero: L = tv P -> L(0) = 0)
    (exp(y) - 1) / y  ~ Q(w),  y = irho L in [YMIN, 0], w = 2 y/YMIN - 1
                                     (factored zero: a = -y Q -> a(0) = 0)

so empty samples stay EXACTLY transparent (tv = 0 -> a = 0, w = 0 — a
1e-5 leak there would accumulate over ~100 empty slabs per ray).

It then converts to monomial coefficients, evaluates everything in
simulated float32 Horner arithmetic on a dense grid, and prints the
degrees, max f32 errors, and the code-ready coefficient tuples for
vokselis_tpu/core/colors.py::bonsai_transfer_pow_fast_soa. Rerun after
any change to the transfer spec; the parity test
(tests/test_core.py::test_fast_transfer_poly_parity) guards the
committed coefficients against the exact functions.
"""

from __future__ import annotations

import numpy as np

TAU = 6.28318  # the shader's truncated constant (core/colors.py)
# real rays have irho = max|d|/|d_m| <= sqrt(3), but the intermediate
# grid's off-ray texels (extent padding, corner rays whose own dominant
# axis differs from the frame's) can exceed it — fit Q out to 3.0 and
# let the kernel clamp y to [YMIN, 0] (alpha saturates within 0.6%
# beyond that, on texels no real ray owns)
IRHO_MAX = 3.0


def smoothstep(e0, e1, x):
    t = np.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


TVMAX = float(smoothstep(0.10, 1.2, 0.9))  # samp clamps at 0.9
YMIN = float(IRHO_MAX * np.log1p(-TVMAX))


def cheb_fit(fn, lo, hi, deg):
    """Chebyshev LS fit (heavily oversampled -> near-minimax for smooth
    fns), returned as monomial coefficients in the MAPPED variable
    u = 2(x-lo)/(hi-lo) - 1, highest degree first (np.polyval order)."""
    xs = np.cos(np.pi * (np.arange(4096) + 0.5) / 4096)  # cheb nodes in u
    x = lo + (xs + 1.0) * 0.5 * (hi - lo)
    c = np.polynomial.chebyshev.chebfit(xs, fn(x), deg)
    return np.polynomial.chebyshev.cheb2poly(c)[::-1]


def horner_f32(coeffs, u):
    """np.polyval in simulated f32 (every intermediate rounded)."""
    acc = np.full_like(u, np.float32(coeffs[0]), dtype=np.float32)
    uf = u.astype(np.float32)
    for c in coeffs[1:]:
        acc = (acc * uf + np.float32(c)).astype(np.float32)
    return acc


def main():
    print(f"TVMAX = {TVMAX!r}  YMIN = {YMIN!r}")
    tv = np.linspace(0.0, TVMAX, 200001)
    u = (2.0 / TVMAX) * tv - 1.0

    # --- palette channels ---------------------------------------------------
    pal = {
        "r": (1.0, 0.0, 14),
        "g": (1.7, 0.15, 17),
        "b": (0.4, 0.20, 9),
    }
    coefs = {}
    for k, (c, d, deg) in pal.items():
        fn = lambda t, c=c, d=d: 0.5 + 0.5 * np.cos(TAU * (c * t + d))
        co = cheb_fit(fn, 0.0, TVMAX, deg)
        got = horner_f32(co, u)
        err = np.abs(got - fn(tv)).max()
        print(f"pal_{k}: deg {deg}  f32 max err {err:.3e}")
        coefs[f"pal_{k}"] = co

    # --- L = ln(1-tv)/tv ----------------------------------------------------
    def pfun(t):
        t = np.where(t < 1e-12, 1e-12, t)
        return np.log1p(-t) / t

    degp = 12
    co_p = cheb_fit(pfun, 0.0, TVMAX, degp)
    lp = horner_f32(co_p, u) * tv.astype(np.float32)
    err_l = np.abs(lp - np.log1p(-tv)).max()
    print(f"P(ln): deg {degp}  f32 max err (on L) {err_l:.3e}")
    coefs["ln_p"] = co_p

    # --- Q = (exp(y)-1)/y on [YMIN, 0] ---------------------------------------
    # cheb_fit's mapped variable is u = 2(y - YMIN)/(0 - YMIN) - 1
    y = np.linspace(YMIN, 0.0, 200001)
    wv = 1.0 - (2.0 / YMIN) * y

    def qfun(yy):
        yy = np.where(np.abs(yy) < 1e-12, -1e-12, yy)
        return np.expm1(yy) / yy

    degq = 10
    co_q = cheb_fit(qfun, YMIN, 0.0, degq)
    alpha = -(y.astype(np.float32) * horner_f32(co_q, wv))
    err_q = np.abs(alpha - (-np.expm1(y))).max()
    print(f"Q(exp): deg {degq}  f32 max err (on alpha) {err_q:.3e}")
    coefs["exp_q"] = co_q

    # --- end-to-end: alpha through BOTH polys on a (samp, irho) grid --------
    samp = np.linspace(0.0, 1.0, 2001)[None, :]
    irho = np.linspace(1.0, IRHO_MAX, 201)[:, None]
    tvx = smoothstep(0.10, 1.2, np.minimum(0.9, samp)) + 0.0 * irho
    ux = ((2.0 / TVMAX) * tvx - 1.0).astype(np.float32)
    lx = horner_f32(coefs["ln_p"], ux) * tvx.astype(np.float32)
    yx = (irho.astype(np.float32) * lx).astype(np.float32)
    wx = (1.0 - (2.0 / YMIN) * yx).astype(np.float32)
    ax = -(yx * horner_f32(coefs["exp_q"], wx))
    want = 1.0 - np.exp(irho * np.log1p(-tvx))
    print(f"alpha end-to-end f32 max err {np.abs(ax - want).max():.3e}; "
          f"alpha(tv=0) = {ax[:, 0].max():.1e} (must be exactly 0)")

    print("\n# --- code-ready (paste into core/colors.py) ---")
    for k, co in coefs.items():
        body = ", ".join(repr(float(c)) for c in co.astype(np.float32))
        print(f"_{k.upper()} = ({body})")


if __name__ == "__main__":
    main()
