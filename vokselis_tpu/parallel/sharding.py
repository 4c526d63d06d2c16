"""Device-mesh sharding for batched multi-view and tiled rendering.

The reference is strictly single-GPU (SURVEY.md §2d); its only parallelism
constructs are workgroup grids and the framebuffer tile decomposition
(examples/xor/main.rs:77-118). The TPU-native scale-out maps:

- BASELINE.json config 5 (batched 64-view rendering) -> data parallelism
  over a 'views' mesh axis via shard_map: each chip renders its views with
  the unchanged single-chip kernel; an optional all_gather assembles frames
  on every chip over ICI;
- image-space tile sharding (the 'tile mode' ancestor) -> splitting frame
  ROWS over a 'tiles' axis — context/sequence-parallel analog: rays are
  independent, so no halo exchange is needed; the gather of tiles is the
  only collective;
- volumes too large for one chip's HBM would shard bricks with ppermute
  halo exchange — not needed for any reference config (256^3 = 16 MiB),
  left for the brick-cache design.

Everything here works on the 8-device virtual CPU mesh used by tests
(XLA_FLAGS=--xla_force_host_platform_device_count=8) and on real TPU slices.
"""

from __future__ import annotations

import math
from functools import partial

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


def _render_one(vol, cam: CameraUniform, width: int, height: int, max_steps: int):
    from vokselis_tpu.ops.reference import render_bonsai

    return render_bonsai(vol, cam, width=width, height=height, max_steps=max_steps)


def render_views_sharded(
    mesh: Mesh,
    vol,
    cams: CameraUniform,  # leading (n_views,) batch axis
    width: int,
    height: int,
    max_steps: int = 64,
    gather: bool = False,
    renderer=None,
):
    """Render a batch of views, sharded over the mesh's 'views' axis.

    The volume is replicated (16 MiB); cameras are split. With
    ``gather=True`` every chip receives all frames via ICI all_gather
    (SURVEY.md §2d); otherwise the output stays view-sharded for per-shard
    host egress (DCN/device_get path).
    """
    render_one = renderer or partial(_render_one, max_steps=max_steps)

    def local_step(vol_l, cams_l):
        imgs = jax.vmap(
            lambda c: render_one(vol_l, c, width=width, height=height)
            if renderer
            else _render_one(vol_l, c, width, height, max_steps)
        )(cams_l)
        if gather:
            imgs = jax.lax.all_gather(imgs, "views", axis=0, tiled=True)
        return imgs

    cam_spec = jax.tree.map(lambda _: P("views"), cams)
    out_spec = P() if gather else P("views")
    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), cam_spec),
        out_specs=out_spec,
        check_rep=False,
    )
    return jax.jit(fn)(vol, cams)


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
    (examples/xor/main.rs:235-254). Rays are independent: each chip renders
    its row band by slicing the full-res ray set; the final all_gather
    assembles the frame on all chips."""
    from vokselis_tpu.core import geometry
    from vokselis_tpu.ops.reference import MAX_STEPS_BONSAI

    n_tiles = mesh.shape["tiles"]
    assert height % n_tiles == 0

    def local_step(vol_l):
        ti = jax.lax.axis_index("tiles")
        band = height // n_tiles
        # full-frame ray set is cheap; slice this chip's band
        eye, dirs = geometry.rays_fragment(cam, width, height)
        d_band = jax.lax.dynamic_slice_in_dim(dirs, ti * band, band, axis=0)
        img = _march_band(vol_l, eye, d_band, max_steps)
        return jax.lax.all_gather(img, "tiles", axis=0, tiled=True)

    fn = shard_map(
        local_step, mesh=mesh, in_specs=(P(),), out_specs=P(), check_rep=False
    )
    return jax.jit(fn)(vol)


def _march_band(vol, eye, dirs, max_steps):
    """March a band of rays with the oracle's semantics (shared helper)."""
    import jax.numpy as jnp

    from vokselis_tpu.core.geometry import intersect_box_unit
    from vokselis_tpu.core.colors import linear_to_srgb
    from vokselis_tpu.ops.reference import _bonsai_transfer
    from vokselis_tpu.volume.sample import sample_trilinear_r8

    h, w = dirs.shape[:2]
    d = dirs.reshape(-1, 3)
    eye_b = jnp.broadcast_to(eye, d.shape)
    t0, t1 = intersect_box_unit(eye_b, d)
    hit = t0 <= t1
    t_start = jnp.maximum(t0, 0.0)
    n = jnp.asarray(vol.shape[0], jnp.float32)
    dt = jnp.min(1.0 / (n * jnp.abs(d)), axis=-1)
    p0 = eye_b + t_start[:, None] * d

    def body(i, carry):
        p, rgb, a, t = carry
        active = hit & (t < t1) & (a < 0.95)
        r = sample_trilinear_r8(vol, p)
        c_rgb, c_a = _bonsai_transfer(r)
        rgb = jnp.where(active[:, None], rgb + (1 - a)[:, None] * c_a[:, None] * c_rgb, rgb)
        a = jnp.where(active, a + (1 - a) * c_a, a)
        p = jnp.where(active[:, None], p + d * dt[:, None], p)
        t = jnp.where(active, t + dt, t)
        return p, rgb, a, t

    p, rgb, a, _ = jax.lax.fori_loop(
        0, max_steps, body,
        (p0, jnp.zeros_like(d), jnp.zeros(d.shape[0]), t_start),
    )
    rgb = linear_to_srgb(jnp.where(hit[:, None], rgb, 0.0))
    return jnp.concatenate([rgb, jnp.ones((d.shape[0], 1))], -1).reshape(h, w, 4)


def multi_view_step(mesh: Mesh, vol, n_views: int, width: int, height: int,
                    max_steps: int = 32, gather: bool = True):
    """The full multi-chip 'step': batched orbit cameras -> sharded render ->
    gathered frames. This is what __graft_entry__.dryrun_multichip drives."""
    cams = orbit_camera_batch(n_views)
    cams = jax.device_put(
        cams,
        jax.tree.map(lambda _: NamedSharding(mesh, P("views")), cams),
    )
    return render_views_sharded(
        mesh, vol, cams, width, height, max_steps=max_steps, gather=gather
    )
