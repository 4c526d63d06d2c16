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

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map_raw

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_raw(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_raw

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_raw(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)

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

    fn = _views_sharded_fn(
        mesh, render, width, height, max_steps, gather,
        jax.tree.structure(pack), jax.tree.structure(cams),
    )
    return fn(pack, cams)


@functools.lru_cache(maxsize=64)
def _views_sharded_fn(mesh, render, width, height, max_steps, gather,
                      pack_def, cam_def):
    """One jitted shard-mapped callable per (mesh, renderer, shape) config:
    wrapping jax.jit around a fresh closure on every render_views_sharded
    call would re-trace every frame (jit caches by function identity)."""

    def local_step(pack_l, cams_l):
        imgs = jax.vmap(
            lambda c: render(pack_l, c, width, height, max_steps)
        )(cams_l)
        if gather:
            imgs = jax.lax.all_gather(imgs, "views", axis=0, tiled=True)
        return imgs

    pack_spec = jax.tree.unflatten(pack_def, [P()] * pack_def.num_leaves)
    cam_spec = jax.tree.unflatten(cam_def, [P("views")] * cam_def.num_leaves)
    out_spec = P() if gather else P("views")
    return jax.jit(shard_map(local_step, mesh, (pack_spec, cam_spec),
                             out_spec))


def build_ray_renderer(vol_u8, force_oracle: bool | None = None,
                       win_rows: int = 128, full_frame=None,
                       with_overflow: bool = False):
    """Backend-appropriate ``(render_rays, pack)`` pair with the ray-set
    signature ``render_rays(pack, eye, (dx, dy, dz), max_steps)`` -> (H, W, 4)
    (or ``((H, W, 4), overflow_count)`` with ``with_overflow=True``):
    the fused Pallas slab-march's ray entry on TPU
    (ops.pallas.march_bonsai.render_bonsai_rays_pallas), the jnp oracle's
    (ops.reference.render_bonsai_rays) elsewhere. This is what the
    row-sharded single-frame path marches each chip's band with.

    ``win_rows`` caps the slab window (layouts are built for it); the
    per-call window is sized by ``auto_win_rows`` for the FULL frame —
    pass ``full_frame=(width, height)`` when each call's ray set is a
    shard band, because a band's per-tile slab footprint is set by the
    full frame's ray divergence, not the band's shape (advisor finding,
    round 2: a pinned 64-row window overflows at 512^2+)."""
    use_oracle = (
        force_oracle
        if force_oracle is not None
        else jax.default_backend() != "tpu"
    )
    if not use_oracle:
        from vokselis_tpu.ops.pallas.march_bonsai import (
            MAX_STEPS_BONSAI,
            auto_win_rows,
            pick_tiles_per_step,
            prepare_volume,
            render_bonsai_rays_pallas,
        )

        (dims, band_rows, nb, bstride), pack = prepare_volume(
            np.asarray(vol_u8), win_rows
        )

        def render_rays(pk, eye, dxyz, max_steps=MAX_STEPS_BONSAI):
            h, w = dxyz[0].shape
            fw, fh = full_frame if full_frame is not None else (w, h)
            tps = pick_tiles_per_step(dims, fw, fh, cap=win_rows)
            win = min(auto_win_rows(dims, fw, fh, tps), win_rows)
            img, ovf = render_bonsai_rays_pallas(
                pk, eye, dxyz, dims, max_steps, True,
                win, band_rows, nb, bstride, tps,
            )
            return (img, ovf) if with_overflow else img

        return render_rays, pack

    from vokselis_tpu.ops.reference import MAX_STEPS_BONSAI, render_bonsai_rays

    pack = (jnp.asarray(vol_u8),)

    def render_rays(pk, eye, dxyz, max_steps=MAX_STEPS_BONSAI):
        dirs = jnp.stack(dxyz, axis=-1)
        img = render_bonsai_rays(pk[0], eye, dirs, max_steps=max_steps)
        return (img, jnp.int32(0)) if with_overflow else img

    return render_rays, pack


def render_frame_tiled(
    mesh: Mesh,
    vol,
    cam: CameraUniform,
    width: int,
    height: int,
    max_steps: int = 64,
    renderer=None,
    with_overflow: bool = False,
):
    """Render ONE frame with its rows sharded over the 'tiles' axis — the
    multi-chip descendant of the xor demo's 256^2-tile dispatch
    (examples/xor/main.rs:235-254). Rays are independent: the full-frame ray
    set is generated once (replicated camera math), its ROWS are sharded
    over the mesh, and each chip marches its band through the shared
    ray-set entry point — the fused Pallas kernel on TPU slices, the jnp
    oracle on CPU meshes (``build_ray_renderer`` picks; ONE implementation
    of the march semantics either way). The final all_gather over ICI
    assembles the frame on every chip.

    ``renderer``: optional ``(render_rays, pack)`` pair from
    :func:`build_ray_renderer` built with ``with_overflow=True`` and
    ``full_frame=(width, height)``; ``vol`` is ignored when given.
    ``with_overflow=True`` returns ``(frame, overflow_count)`` — the
    psum over every chip's kernel overflow flag, the only wrong-pixels
    signal (mirrors BonsaiRenderer.last_overflow)."""
    from vokselis_tpu.core import geometry

    n_tiles = mesh.shape["tiles"]
    assert height % n_tiles == 0

    render_rays, pack = (
        renderer if renderer is not None
        else build_ray_renderer(vol, full_frame=(width, height),
                                with_overflow=True)
    )
    eye, (dx, dy, dz) = geometry.rays_fragment_soa(cam, width, height)
    fn = _frame_tiled_fn(mesh, render_rays, max_steps,
                         jax.tree.structure(pack))
    img, ovf = fn(pack, eye, dx, dy, dz)
    return (img, ovf) if with_overflow else img


@functools.lru_cache(maxsize=64)
def _frame_tiled_fn(mesh, render_rays, max_steps, pack_def):
    """Cached jitted row-sharded frame step (see _views_sharded_fn). Pass a
    STABLE ``renderer`` pair to render_frame_tiled to benefit — the default
    build_ray_renderer closure is fresh per call and caches nothing."""

    def local_step(pack_l, eye_l, dx_l, dy_l, dz_l):
        out = render_rays(pack_l, eye_l, (dx_l, dy_l, dz_l),
                          max_steps=max_steps)
        img, ovf = out if isinstance(out, tuple) else (out, jnp.int32(0))
        img = jax.lax.all_gather(img, "tiles", axis=0, tiled=True)
        ovf = jax.lax.psum(ovf, "tiles")
        return img, ovf

    pack_spec = jax.tree.unflatten(pack_def, [P()] * pack_def.num_leaves)
    row_spec = P("tiles")
    return jax.jit(shard_map(
        local_step,
        mesh,
        (pack_spec, P(), row_spec, row_spec, row_spec),
        (P(), P()),
    ))


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
