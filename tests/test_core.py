"""Unit tests for camera matrices, ray geometry, and color transforms
(SURVEY.md §4: closed-form cases)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from vokselis_tpu.core import geometry
from vokselis_tpu.core.camera import (
    Camera,
    look_at_rh,
    perspective_rh,
    FOVY,
    ZNEAR,
    ZFAR,
)
from vokselis_tpu.core.colors import (
    aces_film,
    linear_to_srgb,
    linear_to_srgb_present,
    smoothstep,
    vertigo,
)


class TestCamera:
    def test_fix_eye_formula(self):
        # src/camera.rs:148-157
        cam = Camera(zoom=2.0, pitch=0.3, yaw=0.7, target=(1.0, 2.0, 3.0))
        pc = math.cos(0.3)
        expected = np.array([1.0, 2.0, 3.0]) - 2.0 * np.array(
            [math.sin(0.7) * pc, math.sin(0.3), math.cos(0.7) * pc]
        )
        np.testing.assert_allclose(cam.eye, expected, rtol=1e-6)

    def test_zoom_clamp(self):
        cam = Camera()
        cam.set_zoom(0.01)
        assert cam.zoom == pytest.approx(0.3)
        cam.set_zoom(1000.0)
        assert cam.zoom == pytest.approx(ZFAR / 2.0)
        assert cam.updated

    def test_pitch_clamp_open_interval(self):
        cam = Camera()
        cam.set_pitch(10.0)
        assert cam.pitch < math.pi / 2
        cam.set_pitch(-10.0)
        assert cam.pitch > -math.pi / 2

    def test_look_at_rh_canonical(self):
        # eye at +Z looking at origin: view maps +Z world to -Z view space
        m = look_at_rh((0, 0, 5), (0, 0, 0), (0, 1, 0))
        p = m @ np.array([0.0, 0.0, 0.0, 1.0])
        np.testing.assert_allclose(p, [0, 0, -5, 1], atol=1e-6)
        p = m @ np.array([1.0, 0.0, 5.0, 1.0])
        np.testing.assert_allclose(p, [1, 0, 0, 1], atol=1e-6)

    def test_perspective_rh_depth_range(self):
        # wgpu 0..1 depth: znear -> 0, zfar -> 1
        m = perspective_rh(FOVY, 1.0, ZNEAR, ZFAR)
        near = m @ np.array([0, 0, -ZNEAR, 1.0])
        far = m @ np.array([0, 0, -ZFAR, 1.0])
        assert near[2] / near[3] == pytest.approx(0.0, abs=1e-6)
        assert far[2] / far[3] == pytest.approx(1.0, rel=1e-5)

    def test_uniform_inverse(self):
        u = Camera.bonsai(1280 / 720).uniform()
        ident = np.asarray(u.proj_view) @ np.asarray(u.inv_proj)
        np.testing.assert_allclose(ident, np.eye(4), atol=1e-5)

    def test_target_projects_to_center(self):
        cam = Camera.bonsai(1280 / 720)
        u = cam.uniform()
        x, y, z, w = geometry.mat4_apply(
            u.proj_view, jnp.float32(0.5), jnp.float32(0.5), jnp.float32(0.5)
        )
        assert abs(float(x / w)) < 1e-5
        assert abs(float(y / w)) < 1e-5


class TestGeometry:
    def test_slab_hit_through_center(self):
        t0, t1 = geometry.intersect_box_unit(
            jnp.asarray([0.5, 0.5, -1.0]), jnp.asarray([0.0, 0.0, 1.0])
        )
        assert float(t0) == pytest.approx(1.0)
        assert float(t1) == pytest.approx(2.0)

    def test_slab_miss(self):
        t0, t1 = geometry.intersect_box_unit(
            jnp.asarray([2.0, 2.0, -1.0]), jnp.asarray([0.0, 0.0, 1.0])
        )
        assert float(t0) > float(t1)

    def test_slab_inside(self):
        t0, t1 = geometry.intersect_box_sym(
            jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([1.0, 0.0, 0.0])
        )
        assert float(t0) == pytest.approx(-1.0)
        assert float(t1) == pytest.approx(1.0)

    def test_fragment_rays_hit_target_pixel(self):
        # the ray through the image center must pass (near) the camera target
        cam = Camera.bonsai(1.0)
        u = cam.uniform()
        eye, dirs = geometry.rays_fragment(u, 65, 65)
        # center pixel (32,32) has ndc (~0,~0): direction toward target
        d = np.asarray(dirs[32, 32])
        expected = np.array([0.5, 0.5, 0.5]) - np.asarray(cam.eye)
        expected /= np.linalg.norm(expected)
        np.testing.assert_allclose(d, expected, atol=5e-2)

    def test_fragment_rays_normalized(self):
        u = Camera.default().uniform()
        _, dirs = geometry.rays_fragment(u, 16, 16)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(dirs), axis=-1), 1.0, atol=1e-5
        )

    def test_compute_rays_eye_near_camera(self):
        cam = Camera.xor(16 / 9)
        u = cam.uniform()
        eyes, dirs = geometry.rays_compute(u, 32, 32)
        # unprojected near-plane eyes cluster within ~znear of the camera eye
        d = np.linalg.norm(np.asarray(eyes) - np.asarray(cam.eye), axis=-1)
        assert d.max() < 0.5

    def test_compute_rays_y_quirk(self):
        # the reference scales screen y by -aspect (H/W): for W != H the
        # vertical fov shrinks; verify asymmetry is present
        u = Camera.xor(16 / 9).uniform()
        _, dirs = geometry.rays_compute(u, 160, 90)
        top = np.asarray(dirs[0, 80])
        bottom = np.asarray(dirs[89, 80])
        left = np.asarray(dirs[45, 0])
        right = np.asarray(dirs[45, 159])
        ang_v = math.acos(np.clip(top @ bottom, -1, 1))
        ang_h = math.acos(np.clip(left @ right, -1, 1))
        assert ang_h > ang_v  # horizontal fov wider


class TestColors:
    def test_srgb_roundtrip_anchors(self):
        assert float(linear_to_srgb(jnp.float32(0.0))) == pytest.approx(0.0)
        assert float(linear_to_srgb(jnp.float32(1.0))) == pytest.approx(1.0, abs=1e-6)
        assert float(linear_to_srgb(jnp.float32(0.001))) == pytest.approx(
            12.92 * 0.001, rel=1e-6
        )

    def test_srgb_present_matches_branch_form(self):
        x = jnp.linspace(0.0, 1.0, 256)
        a = linear_to_srgb(x)
        b = linear_to_srgb_present(x)
        # present uses exponent 0.41666 vs 1/2.4=0.41667 — near identical
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def test_aces_anchors(self):
        assert float(aces_film(jnp.float32(0.0))) == pytest.approx(0.0, abs=1e-6)
        assert float(aces_film(jnp.float32(10.0))) == pytest.approx(1.0, abs=1e-2)
        v = float(aces_film(jnp.float32(0.5)))
        assert 0.5 < v < 0.8

    def test_smoothstep(self):
        assert float(smoothstep(0.0, 1.0, jnp.float32(0.5))) == pytest.approx(0.5)
        assert float(smoothstep(0.0, 1.0, jnp.float32(-1.0))) == 0.0
        assert float(smoothstep(0.0, 1.0, jnp.float32(2.0))) == 1.0
        # reversed edges (used by xor field, shaders/xor.wgsl:59-60)
        assert float(smoothstep(0.7, 0.0, jnp.float32(0.0))) == pytest.approx(1.0)
        assert float(smoothstep(0.7, 0.0, jnp.float32(0.7))) == pytest.approx(0.0)

    def test_vertigo_shape_and_range(self):
        t = jnp.linspace(0, 1, 7)
        v = vertigo(t)
        assert v.shape == (7, 3)
        assert float(jnp.min(v)) >= 0.0 - 1e-6
        assert float(jnp.max(v)) <= 1.0 + 1e-6
