"""Bonsai demo: fragment-raymarch of the 256^3 uint8 CT volume
(examples/bonsai/main.rs:10-76).

Uses the fused Pallas slab-march kernel on TPU and falls back to the jnp
oracle elsewhere (CPU CI). The raymarch output already applies
linear_to_srgb (raycast_naive.wgsl:121-124); the present pass then tonemaps
on top, exactly like the reference's two-stage chain.
"""

from __future__ import annotations

import jax

from vokselis_tpu.core.camera import Camera
from vokselis_tpu.engine.demo import Demo
from vokselis_tpu.volume.io import get_bonsai


class BonsaiDemo(Demo):
    def __init__(self, renderer, vol):
        self.renderer = renderer
        self.vol = vol

    @classmethod
    def init(cls, ctx, use_pallas: bool | None = None, renderer: str = "exact"):
        """``renderer``: "exact" (oracle-parity Pallas slab-march), "fast"
        (shear-warp MXU approximation — see PARITY_REPORT.md), or "hybrid"
        (fast frame + exact re-march of the worst tiles; meets the <=1e-3
        mean-error budget at a fraction of the exact kernel's cost, and
        falls back to the exact kernel at poses where the shear-warp
        factorization degrades)."""
        vol = get_bonsai()
        if renderer == "fast":
            from vokselis_tpu.ops.shear_warp import FastBonsaiRenderer

            return cls(FastBonsaiRenderer(vol), vol)
        if renderer == "hybrid":
            from vokselis_tpu.ops.hybrid import HybridBonsaiRenderer

            return cls(HybridBonsaiRenderer(vol), vol)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            from vokselis_tpu.ops.pallas.march_bonsai import BonsaiRenderer

            renderer = BonsaiRenderer(vol)
        else:
            import jax.numpy as jnp

            from vokselis_tpu.ops.reference import render_bonsai

            volj = jnp.asarray(vol)

            def renderer(cam_uniform, width, height):
                return render_bonsai(volj, cam_uniform, width=width, height=height)

        return cls(renderer, vol)

    @staticmethod
    def default_camera(aspect: float) -> Camera:
        # examples/bonsai/main.rs:68-73
        return Camera.bonsai(aspect)

    def render(self, ctx):
        bb = ctx.render_backbuffer
        img = self.renderer(ctx.camera_uniform, bb.width, bb.height)
        bb.store(img)
