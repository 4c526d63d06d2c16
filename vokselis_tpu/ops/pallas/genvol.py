"""Pallas procedural volume generation (shaders/xor.wgsl cs_main, :69-78).

The reference fills two 256^3 rgba16float storage textures once at init with
an 8x8x8-workgroup compute dispatch (examples/xor/main.rs:135-146). The TPU
kernel tiles the volume over (z, y) blocks with x across lanes and evaluates
the field + its gradient per voxel (SoA). Kept for structural parity and for
the texture-based oracle; the march kernels normally evaluate the field
inline instead (see march_field.py).

Outputs are (D, H, W) planes: density value, density alpha, and the three
normal components plus magnitude — callers assemble whatever texture layout
they need.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vokselis_tpu.volume import fields_soa


def _genvol_kernel(sin_t_ref, val_ref, alpha_ref, nx_ref, ny_ref, nz_ref, *, dims, tile_z, tile_y):
    sin_t = sin_t_ref[0]
    zi = pl.program_id(0)
    yi = pl.program_id(1)
    half = dims / 2.0
    # voxel coords: x across lanes, y across sublanes, one z-plane per row of
    # the (tile_z*tile_y, dims) block — build (tile_z, tile_y, dims) indices
    z = (
        zi * tile_z
        + jax.lax.broadcasted_iota(jnp.int32, (tile_z, tile_y, dims), 0)
    ).astype(jnp.float32)
    y = (
        yi * tile_y
        + jax.lax.broadcasted_iota(jnp.int32, (tile_z, tile_y, dims), 1)
    ).astype(jnp.float32)
    x = jax.lax.broadcasted_iota(jnp.int32, (tile_z, tile_y, dims), 2).astype(
        jnp.float32
    )
    cx, cy, cz = (x - half) / dims, (y - half) / dims, (z - half) / dims
    val, alpha = fields_soa.noise_volume(cx, cy, cz, sin_t)
    nx, ny, nz = fields_soa.gradient(cx, cy, cz, sin_t)
    val_ref[:] = val
    alpha_ref[:] = alpha
    nx_ref[:] = nx
    ny_ref[:] = ny
    nz_ref[:] = nz


@partial(jax.jit, static_argnames=("dims", "tile_z", "tile_y", "interpret"))
def generate_xor_volumes_pallas(
    time=0.0, dims: int = 256, tile_z: int = 8, tile_y: int = 64, interpret: bool = False
):
    """Generate the xor demo's density + normal volumes on-device.

    Returns (density_tex, normal_tex) shaped (D, H, W, 4) f32, matching
    :func:`vokselis_tpu.volume.fields.generate_xor_volumes`.
    """
    time = jnp.asarray(time, jnp.float32)
    sin_t = jnp.sin(time * 1.0).reshape(1)
    grid = (dims // tile_z, dims // tile_y)
    block = pl.BlockSpec(
        (tile_z, tile_y, dims), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    out_shape = [jax.ShapeDtypeStruct((dims, dims, dims), jnp.float32)] * 5
    kernel = partial(_genvol_kernel, dims=dims, tile_z=tile_z, tile_y=tile_y)
    val, alpha, nx, ny, nz = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[block] * 5,
        out_shape=out_shape,
        interpret=interpret,
    )(sin_t)
    nmag = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    density = jnp.stack([val / 2.0, val / 2.0, val / 2.0, alpha], axis=-1)
    normal = jnp.stack([nx, ny, nz, nmag], axis=-1)
    return density, normal


def _gendensity_kernel(sin_t_ref, out_ref, *, dims, tile_z, tile_y):
    sin_t = sin_t_ref[0]
    zi = pl.program_id(0)
    yi = pl.program_id(1)
    half = dims / 2.0
    z = (
        zi * tile_z
        + jax.lax.broadcasted_iota(jnp.int32, (tile_z, tile_y, dims), 0)
    ).astype(jnp.float32)
    y = (
        yi * tile_y
        + jax.lax.broadcasted_iota(jnp.int32, (tile_z, tile_y, dims), 1)
    ).astype(jnp.float32)
    x = jax.lax.broadcasted_iota(jnp.int32, (tile_z, tile_y, dims), 2).astype(
        jnp.float32
    )
    cx, cy, cz = (x - half) / dims, (y - half) / dims, (z - half) / dims
    _, alpha = fields_soa.noise_volume(cx, cy, cz, sin_t)
    out_ref[:] = alpha


@partial(jax.jit, static_argnames=("dims", "tile_z", "tile_y", "interpret"))
def generate_density_u8_pallas(
    time=0.0, dims: int = 512, tile_z: int = 8, tile_y: int = 64,
    interpret: bool = False,
):
    """Time-varying u8 density volume, generated on-device — the config-5
    per-batch-step volume update (the reference's analog is the xor
    compute fill re-dispatched per update, shaders/xor.wgsl:69-77; here
    the radially-masked fbm alpha field at arbitrary ``dims``, quantized
    to the bonsai march kernel's uint8 voxel format)."""
    time = jnp.asarray(time, jnp.float32)
    sin_t = jnp.sin(time * 1.0).reshape(1)
    grid = (dims // tile_z, dims // tile_y)
    block = pl.BlockSpec(
        (tile_z, tile_y, dims), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    alpha = pl.pallas_call(
        partial(_gendensity_kernel, dims=dims, tile_z=tile_z, tile_y=tile_y),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((dims, dims, dims), jnp.float32),
        interpret=interpret,
    )(sin_t)
    return jnp.clip(alpha * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
