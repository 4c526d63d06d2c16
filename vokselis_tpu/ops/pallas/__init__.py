"""Pallas TPU kernels — the performance path.

Every WGSL device kernel of the reference maps to a kernel here
(SURVEY.md §2b):

- K2 raycast_compute.wgsl + K3 xor.wgsl -> :mod:`march_field` — a fused
  raygen+march+composite kernel with the procedural field evaluated INLINE at
  voxel-quantized coordinates. The reference precomputes the field into
  rgba16float storage textures and gathers per step; TPUs have no texture
  units and scalar-rate gathers, so inline evaluation on the VPU is the
  native formulation (bitwise-identical sample placement).
- K1 raycast_naive.wgsl -> :mod:`march_bonsai` — slab-ordered trilinear
  march of a voxel grid (gathers restructured into lane-gathers + MXU
  one-hot contractions).
- K3 -> :mod:`genvol` — procedural volume fill (for parity with the
  reference's precompute-then-march structure).
"""

from vokselis_tpu.ops.pallas.march_field import render_field_pallas
from vokselis_tpu.ops.pallas.march_bonsai import render_bonsai_pallas
from vokselis_tpu.ops.pallas.genvol import generate_xor_volumes_pallas

__all__ = [
    "render_field_pallas",
    "render_bonsai_pallas",
    "generate_xor_volumes_pallas",
]
