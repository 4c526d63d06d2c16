"""Xor demo: compute raymarch of the procedural fbm volume
(examples/xor/main.rs:34-281).

Reference structure faithfully rebuilt:

- the volume is 'generated once at init' at time 0 (main.rs:135-146) —
  here the field closure is frozen at gen_time (regenerate by calling
  ``regenerate``; the reference would re-dispatch XorCompute);
- F1 toggles SinglePass/Tile dispatch (main.rs:189-208). On TPU the Pallas
  grid IS the tile dispatch, so the modes differ only in tile shape:
  'single' = 8x8-workgroup analog (tile rows 8), 'tile' = 256^2 tiles
  (TILE_SIZE, main.rs:12) — both bit-identical output, different schedule;
- the GPU timestamp-query pass timing printed every 100 frames
  (main.rs:120-131,164-187) becomes a PassTimer around the march.
"""

from __future__ import annotations

import jax
import numpy as np

from vokselis_tpu.core.camera import Camera
from vokselis_tpu.core.config import TILE_SIZE
from vokselis_tpu.engine.demo import Demo
from vokselis_tpu.engine.profiler import PassTimer


class XorDemo(Demo):
    MODES = ("SinglePass", "Tile")

    def __init__(self, use_pallas: bool, gen_time: float):
        self.mode = "SinglePass"
        self.use_pallas = use_pallas
        self.gen_time = gen_time  # field frozen at init (main.rs:135-146)
        self.timer = PassTimer("raycast shader")
        print("Change rendering mode on F1")

    @classmethod
    def init(cls, ctx, use_pallas: bool | None = None):
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        return cls(use_pallas, gen_time=float(ctx.global_uniform.time))

    @staticmethod
    def default_camera(aspect: float) -> Camera:
        # examples/xor/main.rs:270-276
        return Camera.xor(aspect)

    def update_input(self, event):
        if (
            event.get("type") == "key"
            and event.get("key", "").lower() == "f1"
            and event.get("pressed", True)
        ):
            self.mode = "Tile" if self.mode == "SinglePass" else "SinglePass"
            print(f"Switched to: {self.mode}")

    def regenerate(self, ctx):
        """Re-dispatch the volume generation (the reference only does this
        at init; call per-frame for an animated field)."""
        self.gen_time = float(ctx.global_uniform.time)

    def update(self, ctx):
        # timestamp report every 100 frames happens inside PassTimer
        pass

    def render(self, ctx):
        bb = ctx.render_backbuffer
        tile_h = 8 if self.mode == "SinglePass" else min(TILE_SIZE, bb.height)
        with self.timer.measure(n_rays=bb.width * bb.height):
            if self.use_pallas:
                from vokselis_tpu.ops.pallas.march_field import render_field_pallas

                img = render_field_pallas(
                    ctx.camera_uniform,
                    time=self.gen_time,
                    width=bb.width,
                    height=bb.height,
                    field="noise",
                    shading="xor",
                    tile_h=tile_h,
                )
            else:
                from vokselis_tpu.ops.reference import render_compute_inline

                img = render_compute_inline(
                    ctx.camera_uniform,
                    time=self.gen_time,
                    width=bb.width,
                    height=bb.height,
                )
        bb.store(img)
