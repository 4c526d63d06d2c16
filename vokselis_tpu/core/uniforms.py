"""Per-frame global uniform state (mirrors Uniform, src/context/global_ubo.rs:52-119).

In the reference this is a 48-byte UBO re-uploaded every frame
(src/context/global_ubo.rs:47-49). Here it is a pytree dataclass passed into
jitted render functions; scalar leaves are jnp scalars so camera/time changes
do not retrigger compilation.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class GlobalUniform:
    pos: jnp.ndarray  # (3,) f32 — user-nudged position (src/utils/input.rs:88-110)
    frame: jnp.ndarray  # () u32
    resolution: jnp.ndarray  # (2,) f32 (width, height)
    mouse: jnp.ndarray  # (2,) f32 NDC, y flipped (src/utils/input.rs:64-75)
    mouse_pressed: jnp.ndarray  # () u32
    time: jnp.ndarray  # () f32 seconds
    time_delta: jnp.ndarray  # () f32 seconds

    def tree_flatten(self):
        return (
            (
                self.pos,
                self.frame,
                self.resolution,
                self.mouse,
                self.mouse_pressed,
                self.time,
                self.time_delta,
            ),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def default(cls):
        """Default::default() for Uniform (src/context/global_ubo.rs:67-81).

        Keeps the reference's quirky default resolution of (1920, 780); the
        engine overwrites it with the real framebuffer size every frame
        (src/context.rs:226-229).
        """
        return cls(
            pos=jnp.zeros(3, jnp.float32),
            frame=jnp.uint32(0),
            resolution=jnp.asarray([1920.0, 780.0], jnp.float32),
            mouse=jnp.zeros(2, jnp.float32),
            mouse_pressed=jnp.uint32(0),
            time=jnp.float32(0.0),
            time_delta=jnp.float32(1.0 / 60.0),
        )

    def with_(self, **kw) -> "GlobalUniform":
        conv = {}
        for k, v in kw.items():
            if k in ("frame", "mouse_pressed"):
                conv[k] = jnp.uint32(v)
            elif k in ("time", "time_delta"):
                conv[k] = jnp.float32(v)
            else:
                conv[k] = jnp.asarray(v, jnp.float32)
        return replace(self, **conv)

    def __str__(self):
        # mirrors the Display impl (src/context/global_ubo.rs:121-143)
        return (
            "Global Uniforms:\n"
            f"\tposition:\t{[float(x) for x in self.pos]}\n"
            f"\tframe:\t\t{int(self.frame)}\n"
            f"\tresolution:\t{[float(x) for x in self.resolution]}\n"
            f"\tmouse:\t\t{[float(x) for x in self.mouse]}\n"
            f"\tmouse pressed:\t{bool(int(self.mouse_pressed))}\n"
            f"\ttime:\t\t{float(self.time)}\n"
            f"\ttime delta:\t{float(self.time_delta)}\n"
        )
