"""Camera tests vs closed-form expectations (cpu/src/cam.c)."""

import math

import numpy as np

from parallel_ray_tracer_tpu.models.camera import (
    Camera,
    default_camera,
    ray_basis,
    screen_corners,
)


def test_identity_camera_corners():
    cam = Camera(pos=(0, 0, 0), rot=(0, 0, 0), fov=math.pi / 2)
    ul, ur, dl = screen_corners(cam, 16 / 9)
    cot = 1.0 / math.tan(math.pi / 4)  # == 1
    np.testing.assert_allclose(ul, [-16 / 9, cot, 1], rtol=1e-6)
    np.testing.assert_allclose(ur, [16 / 9, cot, 1], rtol=1e-6)
    np.testing.assert_allclose(dl, [-16 / 9, cot, -1], rtol=1e-6)


def test_translation():
    cam = Camera(pos=(1, 2, 3), rot=(0, 0, 0), fov=math.pi / 2)
    ul, _, _ = screen_corners(cam, 1.0)
    np.testing.assert_allclose(ul, [-1 + 1, 1 + 2, 1 + 3], rtol=1e-6)


def test_rotation_x_only():
    # rot.x = -pi/2 about X: (x, y, z) -> (x, y cos + z sin applied per C code)
    cam = Camera(pos=(0, 0, 0), rot=(math.pi / 2, 0, 0), fov=math.pi / 2)
    ul, _, _ = screen_corners(cam, 1.0)
    # C rotateX: y' = y cos - z sin = -1; z' = y sin + z cos = 1 (y=1, z=1)
    np.testing.assert_allclose(ul, [-1, -1, 1], atol=1e-6)


def test_rotation_order_y_then_x_then_z():
    # Verify the Y->X->Z composition on a known point.
    ry, rx, rz = 0.3, -0.2, 0.7
    cam = Camera(pos=(0, 0, 0), rot=(rx, ry, rz), fov=math.pi / 2)
    p = np.array([-1.0, 1.0, 1.0])  # UL for ar=1, cot=1

    def rot_y(p, a):
        x, y, z = p
        return np.array(
            [x * math.cos(a) + z * math.sin(a), y, -x * math.sin(a) + z * math.cos(a)]
        )

    def rot_x(p, a):
        x, y, z = p
        return np.array(
            [x, y * math.cos(a) - z * math.sin(a), y * math.sin(a) + z * math.cos(a)]
        )

    def rot_z(p, a):
        x, y, z = p
        return np.array(
            [x * math.cos(a) - y * math.sin(a), x * math.sin(a) + y * math.cos(a), z]
        )

    expect = rot_z(rot_x(rot_y(p, ry), rx), rz)
    ul, _, _ = screen_corners(cam, 1.0)
    np.testing.assert_allclose(ul, expect, atol=1e-6)


def test_ray_basis_spans_screen():
    cam = default_camera()
    w, h = 640, 360
    origin, dir00, inc_x, inc_y = ray_basis(cam, w, h)
    ul, ur, dl = screen_corners(cam, w / h)
    np.testing.assert_allclose(origin, [0, -9, 3], rtol=1e-6)
    np.testing.assert_allclose(dir00 + origin, ul, rtol=1e-5)
    np.testing.assert_allclose(dir00 + w * inc_x + origin, ur, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(dir00 + h * inc_y + origin, dl, rtol=1e-4, atol=1e-4)


def test_default_camera_matches_reference_harness():
    cam = default_camera()
    assert cam.pos == (0.0, -9.0, 3.0)
    np.testing.assert_allclose(cam.rot[0], -math.pi / 12)
    np.testing.assert_allclose(cam.cot_half_fov, 1.0 / math.tan(math.pi / 6.4))
