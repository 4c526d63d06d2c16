"""Render ops: pure-jnp oracle renderers, Pallas TPU kernels, present pass.

The jnp renderers in :mod:`vokselis_tpu.ops.reference` are the correctness
oracles (and the CPU-testable "fake backend", SURVEY.md §4); the Pallas
kernels in :mod:`vokselis_tpu.ops.pallas` are the performance path and are
parity-tested against the oracles.
"""

from vokselis_tpu.ops.reference import (
    render_bonsai,
    render_compute_tex,
    render_compute_inline,
    render_field,
    MAX_STEPS_BONSAI,
    MAX_STEPS_COMPUTE,
)
from vokselis_tpu.ops.present import present
from vokselis_tpu.ops.shear_warp import FastBonsaiRenderer, build_fast_renderer
from vokselis_tpu.ops.hybrid import HybridBonsaiRenderer, build_hybrid_renderer

__all__ = [
    "FastBonsaiRenderer",
    "build_fast_renderer",
    "HybridBonsaiRenderer",
    "build_hybrid_renderer",
    "render_bonsai",
    "render_compute_tex",
    "render_compute_inline",
    "render_field",
    "present",
    "MAX_STEPS_BONSAI",
    "MAX_STEPS_COMPUTE",
]
