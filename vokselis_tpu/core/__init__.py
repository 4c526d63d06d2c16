"""Core math: camera, global uniforms, ray geometry, color transforms, config."""

from vokselis_tpu.core.camera import Camera, CameraUniform
from vokselis_tpu.core.uniforms import GlobalUniform
from vokselis_tpu.core.config import RenderConfig

__all__ = ["Camera", "CameraUniform", "GlobalUniform", "RenderConfig"]
