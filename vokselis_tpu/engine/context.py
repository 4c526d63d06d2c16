"""Render context: device handle, framebuffers, per-frame state, present.

Rebuilds the reference's Context (src/context.rs:38-359) for JAX:

- the wgpu instance/adapter/device/queue becomes the JAX device handle
  (``renderer_info`` mirrors the RendererInfo startup banner,
  context.rs:183-223);
- the HDR backbuffer is a fixed-resolution f32 framebuffer array
  (HdrBackBuffer, src/context/hdr_backbuffer.rs:10-11 — default 1280x720
  regardless of window size, faithfully kept);
- ``update()`` refreshes the global uniform (time/dt/frame/resolution +
  input, context.rs:225-236) and the camera uniform when dirty
  (camera.rs:62-71);
- ``render()`` is the present pass: ACES + sRGB into the window-sized
  display image AND the rgb capture image — one fused op returning
  identical bytes for both targets (context.rs:251-297);
- ``capture_frame()`` is the screenshot path: device_get + uint8 quantize
  (src/context/screenshot.rs:37-77 — no 256-byte row padding needed here,
  but ImageDimensions keeps the even-dimension rule for encoders).
"""

from __future__ import annotations

import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from vokselis_tpu.core.camera import Camera, CameraUniform
from vokselis_tpu.core.config import DEFAULT_RESOLUTION, EngineConfig
from vokselis_tpu.core.uniforms import GlobalUniform
from vokselis_tpu.engine.compiler import KernelCompiler
from vokselis_tpu.engine.input import Input
from vokselis_tpu.engine.reload import Watcher
from vokselis_tpu.ops.present import present, to_uint8
from vokselis_tpu.utils.misc import ImageDimensions


class HdrBackBuffer:
    """Offscreen HDR render target (src/context/hdr_backbuffer.rs).

    Fixed default resolution 1280x720 independent of window size
    (hdr_backbuffer.rs:10-11); stored f32 (the Rgba16Float analog — we render
    f32 and let capture quantize, SURVEY.md §7 'f16 accumulation')."""

    DEFAULT_RESOLUTION = DEFAULT_RESOLUTION

    def __init__(self, resolution=DEFAULT_RESOLUTION):
        self.width, self.height = resolution
        self.texture = jnp.zeros((self.height, self.width, 4), jnp.float32)

    @property
    def resolution(self):
        return (self.width, self.height)

    def store(self, img):
        assert img.shape == self.texture.shape, (
            f"demo rendered {img.shape}, backbuffer is {self.texture.shape}"
        )
        self.texture = img


def renderer_info() -> str:
    """Startup banner (RendererInfo, src/context.rs:183-223,319-337)."""
    d = jax.devices()[0]
    lines = [
        "Renderer information:",
        f"\tVendor name: {getattr(d, 'device_kind', d.platform)}",
        f"\tDevice id: {d.id}",
        f"\tBackend: {jax.default_backend()}",
        f"\tDevices on host: {jax.local_device_count()}",
        f"\tProcess count: {jax.process_count()}",
    ]
    return "\n".join(lines)


class Context:
    """Owns device-facing state and the per-frame update/present cycle."""

    def __init__(
        self,
        width: int = DEFAULT_RESOLUTION[0],
        height: int = DEFAULT_RESOLUTION[1],
        camera: Camera | None = None,
        config: EngineConfig | None = None,
        backbuffer_resolution=None,
        watch: bool = False,
    ):
        self.config = config or EngineConfig()
        self.width, self.height = width, height
        # default camera pose: src/context.rs:124-132
        self.camera = camera or Camera.default(aspect=width / height)
        self.camera_uniform: CameraUniform = self.camera.uniform()
        self.global_uniform = GlobalUniform.default()
        self.render_backbuffer = HdrBackBuffer(
            backbuffer_resolution or HdrBackBuffer.DEFAULT_RESOLUTION
        )
        self.display_image = None  # last presented frame (window-sized)
        self.shader_compiler = KernelCompiler()
        self.watcher = Watcher(autostart=watch)
        self.input = Input()
        self.dims = ImageDimensions.new(width, height)
        self._start_time = _time.perf_counter()
        self.frame = 0

    # --- per-frame state (context.rs:225-236) ----------------------------
    def update(self, time_delta: float | None = None, time: float | None = None):
        if time is None:
            time = _time.perf_counter() - self._start_time
        if time_delta is None:
            time_delta = 1.0 / 60.0
        self.global_uniform = self.global_uniform.with_(
            time=time,
            time_delta=time_delta,
            frame=self.frame,
            resolution=(float(self.render_backbuffer.width),
                        float(self.render_backbuffer.height)),
        )
        self.global_uniform = self.input.process_position(self.global_uniform)
        if self.camera.updated:
            self.camera_uniform = self.camera.uniform()
            self.camera.updated = False
        self.frame += 1

    # --- resize (context.rs:238-249): window resizes; backbuffer doesn't --
    def resize(self, width: int, height: int):
        self.width, self.height = width, height
        self.dims = ImageDimensions.new(width, height)
        self.camera.set_aspect(width, height)

    # --- present pass (context.rs:251-297) --------------------------------
    def render(self):
        """Tonemap the backbuffer to the window-sized display image; the
        same bytes serve the capture target. Returns the display image."""
        self.display_image = present(
            self.render_backbuffer.texture,
            out_height=self.height,
            out_width=self.width,
        )
        return self.display_image

    # --- capture (context.rs:299-302 + screenshot.rs:37-77) --------------
    def capture_frame(self) -> np.ndarray:
        """Blocking device->host readback of the last presented frame as
        uint8 RGBA rows (even-dimension cropped for encoders)."""
        if self.display_image is None:
            self.render()
        frame = np.asarray(to_uint8(self.display_image))
        return frame[: self.dims.height, : self.dims.width]
