"""Multi-chip scale-out over TPU meshes (absent in the single-GPU reference;
SURVEY.md §2d defines the TPU-native equivalents built here)."""

from vokselis_tpu.parallel.sharding import (
    make_mesh,
    orbit_camera_batch,
    render_views_sharded,
    render_frame_tiled,
    multi_view_step,
)

__all__ = [
    "make_mesh",
    "orbit_camera_batch",
    "render_views_sharded",
    "render_frame_tiled",
    "multi_view_step",
]
