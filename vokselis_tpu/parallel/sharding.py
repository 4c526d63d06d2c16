"""Device-mesh sharding for batched multi-view and tiled rendering.

The reference is strictly single-GPU (SURVEY.md §2d); its only parallelism
constructs are workgroup grids and the framebuffer tile decomposition
(examples/xor/main.rs:77-118). The TPU-native scale-out maps:

- BASELINE.json config 5 (batched 64-view rendering) -> data parallelism
  over a 'views' mesh axis via shard_map: each chip renders its views with
  the unchanged single-chip renderer; an optional all_gather assembles
  frames on every chip over ICI;
- image-space tile sharding (the 'tile mode' ancestor) -> splitting frame
  ROWS over a 'tiles' axis — context/sequence-parallel analog: rays are
  independent, so no halo exchange is needed; the gather of tiles is the
  only collective;
- volumes too large for one chip's HBM would shard bricks with ppermute
  halo exchange — not needed for any reference config (256^3 = 16 MiB),
  left for the brick-cache design.

Renderers are passed as ``(render, pack)`` pairs — the functional API of
:func:`vokselis_tpu.ops.pallas.march_bonsai.build_renderer` — and the pack
(volume layouts) is threaded through shard_map as a REPLICATED argument, so
the exact same code path drives the fused Pallas kernel on TPU slices and
the jnp oracle on CPU meshes (:func:`build_default_renderer` picks).

Everything here works on the 8-device virtual CPU mesh used by tests
(XLA_FLAGS=--xla_force_host_platform_device_count=8) and on real TPU slices.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vokselis_tpu.core.camera import Camera, CameraUniform


def make_mesh(views: int | None = None, tiles: int = 1, devices=None) -> Mesh:
    """Build a (views, tiles) mesh; views defaults to n_devices/tiles."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if views is None:
        views = n // tiles
    assert views * tiles == n, f"{views}x{tiles} != {n} devices"
    arr = np.asarray(devices).reshape(views, tiles)
    return Mesh(arr, ("views", "tiles"))


def orbit_camera_batch(n_views: int, target=(0.5, 0.5, 0.5), zoom=1.0,
                       pitch=0.5, aspect=1.0) -> CameraUniform:
    """N cameras orbiting the target in yaw — BASELINE config 5's batched
    views (and config 4's orbiting camera, sampled at n frames). Returns a
    CameraUniform pytree with a leading (n_views,) batch axis."""
    uniforms = []
    for i in range(n_views):
        cam = Camera(zoom=zoom, pitch=pitch, yaw=2.0 * math.pi * i / n_views,
                     target=target, aspect=aspect)
        uniforms.append(cam.uniform())
    return jax.tree.map(lambda *xs: jnp.stack(xs), *uniforms)


def build_default_renderer(vol_u8, force_oracle: bool | None = None):
    """Backend-appropriate ``(render, pack)`` pair with the functional
    signature ``render(pack, camera_uniform, width, height, max_steps)``:
    the fused Pallas slab-march on TPU, the jnp oracle elsewhere (the
    oracle IS the correctness spec; the kernel is parity-tested against it).
    """
    use_oracle = (
        force_oracle
        if force_oracle is not None
        else jax.default_backend() != "tpu"
    )
    if not use_oracle:
        from vokselis_tpu.ops.pallas.march_bonsai import build_renderer

        return build_renderer(np.asarray(vol_u8))

    from vokselis_tpu.ops.reference import MAX_STEPS_BONSAI, render_bonsai

    pack = (jnp.asarray(vol_u8),)

    def render(pk, cam, width, height, max_steps=MAX_STEPS_BONSAI, srgb=True):
        return render_bonsai(pk[0], cam, width=width, height=height,
                             max_steps=max_steps, srgb=srgb)

    return render, pack


def render_views_sharded(
    mesh: Mesh,
    render,
    pack,
    cams: CameraUniform,  # leading (n_views,) batch axis
    width: int,
    height: int,
    max_steps: int = 64,
    gather: bool = False,
):
    """Render a batch of views, sharded over the mesh's 'views' axis.

    ``(render, pack)``: a functional renderer pair (build_renderer /
    build_default_renderer). The pack is replicated (256^3 layouts are
    ~100 MiB — far under chip HBM); cameras are split. With ``gather=True``
    every chip receives all frames via ICI all_gather (SURVEY.md §2d);
    otherwise the output stays view-sharded for per-shard host egress.
    """

    def local_step(pack_l, cams_l):
        imgs = jax.vmap(
            lambda c: render(pack_l, c, width, height, max_steps)
        )(cams_l)
        if gather:
            imgs = jax.lax.all_gather(imgs, "views", axis=0, tiled=True)
        return imgs

    pack_spec = jax.tree.map(lambda _: P(), pack)
    cam_spec = jax.tree.map(lambda _: P("views"), cams)
    out_spec = P() if gather else P("views")
    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(pack_spec, cam_spec),
        out_specs=out_spec,
        check_rep=False,
    )
    return jax.jit(fn)(pack, cams)


def render_frame_tiled(
    mesh: Mesh,
    vol,
    cam: CameraUniform,
    width: int,
    height: int,
    max_steps: int = 64,
):
    """Render ONE frame with its rows sharded over the 'tiles' axis — the
    multi-chip descendant of the xor demo's 256^2-tile dispatch
    (examples/xor/main.rs:235-254). Rays are independent: each chip marches
    its row band via the oracle's shared ray-set entry point
    (ops.reference.render_bonsai_rays — ONE implementation of the march
    semantics, no hand copies); the final all_gather assembles the frame."""
    from vokselis_tpu.core import geometry
    from vokselis_tpu.ops.reference import render_bonsai_rays

    n_tiles = mesh.shape["tiles"]
    assert height % n_tiles == 0

    def local_step(vol_l):
        ti = jax.lax.axis_index("tiles")
        band = height // n_tiles
        # full-frame ray set is cheap; slice this chip's band
        eye, dirs = geometry.rays_fragment(cam, width, height)
        d_band = jax.lax.dynamic_slice_in_dim(dirs, ti * band, band, axis=0)
        img = render_bonsai_rays(vol_l, eye, d_band, max_steps=max_steps)
        return jax.lax.all_gather(img, "tiles", axis=0, tiled=True)

    fn = shard_map(
        local_step, mesh=mesh, in_specs=(P(),), out_specs=P(), check_rep=False
    )
    return jax.jit(fn)(vol)


def multi_view_step(mesh: Mesh, vol, n_views: int, width: int, height: int,
                    max_steps: int = 32, gather: bool = True, renderer=None):
    """The full multi-chip 'step': batched orbit cameras -> sharded render ->
    gathered frames. This is what __graft_entry__.dryrun_multichip drives.
    ``renderer``: optional (render, pack) pair; defaults to the
    backend-appropriate one (Pallas kernel on TPU, oracle on CPU)."""
    render, pack = renderer if renderer is not None else build_default_renderer(vol)
    cams = orbit_camera_batch(n_views)
    cams = jax.device_put(
        cams,
        jax.tree.map(lambda _: NamedSharding(mesh, P("views")), cams),
    )
    return render_views_sharded(
        mesh, render, pack, cams, width, height, max_steps=max_steps,
        gather=gather,
    )
