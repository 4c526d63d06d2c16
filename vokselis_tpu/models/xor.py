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


class FieldPipeline:
    """Reloadable compute-march pipeline (ReloadablePipeline protocol):
    the render callable is re-derived when the watched FIELD SOURCE module
    changes — the reference's edit-shader -> live-swap loop
    (src/watcher.rs:45-54 + examples/bonsai/raycast.rs:137-141), with
    Python field modules playing the role of WGSL files."""

    def __init__(self, use_pallas: bool):
        self.use_pallas = use_pallas
        if use_pallas:
            from vokselis_tpu.ops.pallas.march_field import render_field_pallas

            self.render = render_field_pallas
            self.field_fn = None
        else:
            from vokselis_tpu.ops.reference import render_compute_inline
            from vokselis_tpu.volume import fields

            self.render = render_compute_inline
            self.field_fn = fields.noise_volume

    def reload(self, module):
        if self.use_pallas:
            # the kernel module binds fields_soa at import: re-importing it
            # picks up the freshly reloaded field source and re-creates the
            # jit wrapper (fresh trace cache)
            import importlib

            from vokselis_tpu.ops.pallas import march_field

            self.render = importlib.reload(march_field).render_field_pallas
        else:
            # the oracle takes the field callable as a STATIC jit arg — a
            # fresh function object forces the retrace
            self.field_fn = module.noise_volume


class XorDemo(Demo):
    MODES = ("SinglePass", "Tile")

    def __init__(self, use_pallas: bool, gen_time: float):
        self.mode = "SinglePass"
        self.use_pallas = use_pallas
        self.gen_time = gen_time  # field frozen at init (main.rs:135-146)
        self.timer = PassTimer("raycast shader")
        self.pipeline = FieldPipeline(use_pallas)
        print("Change rendering mode on F1")

    @classmethod
    def init(cls, ctx, use_pallas: bool | None = None):
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        demo = cls(use_pallas, gen_time=float(ctx.global_uniform.time))
        # register the field source with the context watcher at
        # construction, exactly like the reference's pipelines
        # (examples/bonsai/raycast.rs:137-141)
        from vokselis_tpu.volume import fields, fields_soa

        ctx.watcher.register(fields_soa if use_pallas else fields,
                             demo.pipeline)
        return demo

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
                img = self.pipeline.render(
                    ctx.camera_uniform,
                    time=self.gen_time,
                    width=bb.width,
                    height=bb.height,
                    field="noise",
                    shading="xor",
                    tile_h=tile_h,
                )
            else:
                img = self.pipeline.render(
                    ctx.camera_uniform,
                    time=self.gen_time,
                    width=bb.width,
                    height=bb.height,
                    field=self.pipeline.field_fn,
                )
        bb.store(img)
