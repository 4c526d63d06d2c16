"""Ray generation and ray-AABB intersection (pure jnp, shape-polymorphic).

Reference sources:
- slab test vs [0,1]^3: shaders/raycast_naive.wgsl:50-61
- slab test vs [-1,1]^3: shaders/raycast_compute.wgsl:42-53
- fragment-path ray gen (perspective-correct interpolation of cube-surface
  position minus eye — equivalent to unprojecting through pixel centers):
  shaders/raycast_naive.wgsl:40-48
- compute-path ray gen with the reference's ``screen.y *= -aspect`` quirk:
  shaders/raycast_compute.wgsl:99-117
"""

from __future__ import annotations

import jax.numpy as jnp


def intersect_box(orig, direction, box_min, box_max):
    """Slab test. Returns (t0, t1); hit iff t0 <= t1 (reference tests t0 > t1
    as the miss condition). ``orig``/``direction``: (..., 3)."""
    inv_dir = 1.0 / direction
    tmin_tmp = (box_min - orig) * inv_dir
    tmax_tmp = (box_max - orig) * inv_dir
    tmin = jnp.minimum(tmin_tmp, tmax_tmp)
    tmax = jnp.maximum(tmin_tmp, tmax_tmp)
    t0 = jnp.max(tmin, axis=-1)
    t1 = jnp.min(tmax, axis=-1)
    return t0, t1


def intersect_box_unit(orig, direction):
    """[0,1]^3 box (bonsai path, shaders/raycast_naive.wgsl:50-61)."""
    return intersect_box(orig, direction, 0.0, 1.0)


def intersect_box_sym(orig, direction):
    """[-1,1]^3 box (compute path, shaders/raycast_compute.wgsl:42-53)."""
    return intersect_box(orig, direction, -1.0, 1.0)


def pixel_centers(width: int, height: int, dtype=jnp.float32):
    """Framebuffer-space coordinates of pixel centers: (H, W) each of x, y."""
    xs = (jnp.arange(width, dtype=dtype) + 0.5)[None, :]
    ys = (jnp.arange(height, dtype=dtype) + 0.5)[:, None]
    x = jnp.broadcast_to(xs, (height, width))
    y = jnp.broadcast_to(ys, (height, width))
    return x, y


def mat4_apply(m, x, y, z, w=1.0):
    """Apply a row-major 4x4 to a homogeneous point with explicit f32
    arithmetic (NOT a matmul: batched jnp matmuls default to reduced
    precision on TPU, which destroys the tiny clip-space w of far-plane
    points; elementwise VPU math is both exact and faster for 4-vectors).

    Returns four arrays (X, Y, Z, W) broadcast over the inputs.
    """
    out = []
    for i in range(4):
        out.append(m[i, 0] * x + m[i, 1] * y + m[i, 2] * z + m[i, 3] * w)
    return out


def unproject(inv_proj, ndc_x, ndc_y, ndc_z):
    """Apply the inverse proj*view matrix to an NDC point, divide by w.

    ``ndc_*`` broadcastable arrays; returns (..., 3) world-space points.
    """
    x, y, z, w = mat4_apply(inv_proj, ndc_x, ndc_y, jnp.asarray(ndc_z, jnp.float32))
    return jnp.stack([x / w, y / w, z / w], axis=-1)


def rays_fragment(camera_uniform, width: int, height: int):
    """Bonsai-style rays: one per pixel center, through the camera.

    The reference rasterizes the unit cube and interpolates
    ``ray_dir = surface_pos - eye`` perspective-correct across the fragment
    (shaders/raycast_naive.wgsl:40-48), which is exactly the ray through the
    pixel center. wgpu NDC: x right in [-1,1], y up in [-1,1]; pixel (i, j)
    center maps to ndc (2*(i+.5)/W - 1, 1 - 2*(j+.5)/H).

    Returns (eye (3,), dirs (H, W, 3) normalized).
    """
    px, py = pixel_centers(width, height)
    ndc_x = 2.0 * px / width - 1.0
    ndc_y = 1.0 - 2.0 * py / height
    eye = camera_uniform.view_position[:3]
    # any point along the view ray: unproject at two depths, direction is
    # their difference (projective depths 0 = near, 1 = far in wgpu).
    p_near = unproject(camera_uniform.inv_proj, ndc_x, ndc_y, 0.0)
    p_far = unproject(camera_uniform.inv_proj, ndc_x, ndc_y, 1.0)
    d = p_far - p_near
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return eye, d


def packed_pixel_grid(width: int, height: int):
    """Integer pixel coordinates of the FULL frame in the kernels' packed
    (n_tiles*8, 128) tile layout (ops.pallas.march_bonsai._pack_tiles:
    packed element (s, l) of tile s//8 is image row (s%8)*4 + l//32, col
    l%32 of that 32x32 tile). Emitting per-pixel geometry natively in this
    layout removes the full-frame pack relayouts the hybrid's stats path
    paid per plane (~0.07-0.1 ms each at 1024^2, round-4 b0 decomposition).
    Frames padded to the 32-multiple grid include out-of-frame pixels —
    callers must mask ``(ix < width) & (iy < height)``.

    Returns (ix, iy) int32, each (cdiv(H,32)*cdiv(W,32)*8, 128).
    """
    ny = -(-height // 32)
    nx = -(-width // 32)
    n = ny * nx * 8
    s = jnp.arange(n, dtype=jnp.int32)
    lane = jnp.arange(128, dtype=jnp.int32)
    tile = s // 8
    ty = tile // nx
    tx = tile % nx
    iy = (ty * 32 + (s % 8) * 4)[:, None] + (lane // 32)[None, :]
    ix = (tx * 32)[:, None] + (lane % 32)[None, :]
    return ix, iy


def center_ray_dir(camera_uniform, width: int, height: int):
    """Normalized fragment-path ray direction through the CENTER pixel
    (row H//2, col W//2) — the single ray _render_fast's dominant-axis
    pick needs, without materializing the (H, W) frame. Arithmetic matches
    :func:`rays_fragment_soa` exactly. Returns a (3,) f32 vector."""
    ndc_x = jnp.float32(2.0 * ((width // 2) + 0.5) / width - 1.0)
    ndc_y = jnp.float32(1.0 - 2.0 * ((height // 2) + 0.5) / height)
    inv = camera_uniform.inv_proj
    nx, ny, nz, nw = mat4_apply(inv, ndc_x, ndc_y, jnp.float32(0.0))
    fx, fy, fz, fw = mat4_apply(inv, ndc_x, ndc_y, jnp.float32(1.0))
    dx = fx / fw - nx / nw
    dy = fy / fw - ny / nw
    dz = fz / fw - nz / nw
    inv_len = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    return jnp.stack([dx * inv_len, dy * inv_len, dz * inv_len])


def rays_fragment_soa(camera_uniform, width: int, height: int):
    """SoA variant of :func:`rays_fragment` for TPU kernels: returns
    (eye (3,), (dx, dy, dz) each (H, W))."""
    px, py = pixel_centers(width, height)
    ndc_x = 2.0 * px / width - 1.0
    ndc_y = 1.0 - 2.0 * py / height
    inv = camera_uniform.inv_proj
    nx, ny, nz, nw = mat4_apply(inv, ndc_x, ndc_y, jnp.float32(0.0))
    fx, fy, fz, fw = mat4_apply(inv, ndc_x, ndc_y, jnp.float32(1.0))
    dx = fx / fw - nx / nw
    dy = fy / fw - ny / nw
    dz = fz / fw - nz / nw
    inv_len = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    return camera_uniform.view_position[:3], (dx * inv_len, dy * inv_len, dz * inv_len)


def rays_compute_soa(camera_uniform, width: int, height: int, offset_x=0.0, offset_y=0.0):
    """SoA variant of :func:`rays_compute`: returns ((ex,ey,ez), (dx,dy,dz)),
    each component (H, W)."""
    px, py = pixel_centers(width, height)
    coord_x = px - 0.5 + offset_x
    coord_y = py - 0.5 + offset_y
    aspect_ratio = float(height) / float(width)
    sx = 2.0 * coord_x / width - 1.0
    sy = (2.0 * coord_y / height - 1.0) * (-aspect_ratio)
    inv = camera_uniform.inv_proj
    nx, ny, nz, nw = mat4_apply(inv, sx, sy, jnp.float32(0.0))
    fx, fy, fz, fw = mat4_apply(inv, sx, sy, jnp.float32(1.0))
    ex, ey, ez = nx / nw, ny / nw, nz / nw
    dx = fx / fw - ex
    dy = fy / fw - ey
    dz = fz / fw - ez
    inv_len = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    return (ex, ey, ez), (dx * inv_len, dy * inv_len, dz * inv_len)


def intersect_box_soa(ex, ey, ez, dx, dy, dz, box_min: float, box_max: float):
    """SoA slab test; returns (t0, t1) arrays."""
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    ax0, ax1 = (box_min - ex) * ix, (box_max - ex) * ix
    ay0, ay1 = (box_min - ey) * iy, (box_max - ey) * iy
    az0, az1 = (box_min - ez) * iz, (box_max - ez) * iz
    t0 = jnp.maximum(
        jnp.minimum(ax0, ax1),
        jnp.maximum(jnp.minimum(ay0, ay1), jnp.minimum(az0, az1)),
    )
    t1 = jnp.minimum(
        jnp.maximum(ax0, ax1),
        jnp.minimum(jnp.maximum(ay0, ay1), jnp.maximum(az0, az1)),
    )
    return t0, t1


def rays_compute(camera_uniform, width: int, height: int, offset_x=0.0, offset_y=0.0):
    """Compute-path rays, replicating shaders/raycast_compute.wgsl:99-117
    verbatim, including the ``screen.y *= -aspect_ratio`` quirk
    (aspect_ratio = H/W) and the screen-point/tangent-point unprojection.

    Returns (eyes (H, W, 3), dirs (H, W, 3)); note the compute path derives a
    per-pixel eye from unprojection (they all coincide up to fp error).
    """
    px, py = pixel_centers(width, height)
    # reference uses integer gid + offset, not pixel centers: coord = gid + offset
    coord_x = px - 0.5 + offset_x
    coord_y = py - 0.5 + offset_y
    aspect_ratio = float(height) / float(width)
    sx = 2.0 * coord_x / width - 1.0
    sy = (2.0 * coord_y / height - 1.0) * (-aspect_ratio)
    eye = unproject(camera_uniform.inv_proj, sx, sy, 0.0)
    tang = unproject(camera_uniform.inv_proj, sx, sy, 1.0)
    d = tang - eye
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return eye, d
