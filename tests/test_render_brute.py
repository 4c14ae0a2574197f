"""End-to-end brute-force render tests on the tiny deterministic scene."""

import math

import numpy as np

from parallel_ray_tracer_tpu.models.camera import Camera
from parallel_ray_tracer_tpu.models.device_scene import device_scene_from_host
from parallel_ray_tracer_tpu.ops.render import render_bruteforce

CAM = Camera(pos=(0.0, -9.0, 3.0), rot=(-math.pi / 12, 0.0, 0.0), fov=math.pi / 3.2)


def test_render_shapes_and_range(tiny_scene):
    ds = device_scene_from_host(tiny_scene)
    img = np.asarray(render_bruteforce(ds, CAM, 32, 18, bounces=2, chunk=8))
    assert img.shape == (18, 32, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_miss_pixels_get_ambient(tiny_scene):
    ds = device_scene_from_host(tiny_scene)
    img = np.asarray(render_bruteforce(ds, CAM, 32, 18, bounces=2, chunk=8))
    # Top rows look above the floor into empty space -> ambient 0.5 exactly.
    top = img[0]
    assert (np.abs(top - 0.5) < 1e-6).all(axis=-1).any()


def test_more_bounces_only_adds_light(tiny_scene):
    ds = device_scene_from_host(tiny_scene)
    img1 = np.asarray(render_bruteforce(ds, CAM, 32, 18, bounces=1, chunk=8))
    img4 = np.asarray(render_bruteforce(ds, CAM, 32, 18, bounces=4, chunk=8))
    # multiplier and kr are nonnegative here, so adding bounces can only add
    # energy (before the final clamp).
    assert (img4 >= img1 - 1e-5).all()


def test_row_chunking_is_exact(tiny_scene):
    ds = device_scene_from_host(tiny_scene)
    full = np.asarray(render_bruteforce(ds, CAM, 32, 18, bounces=2, chunk=8))
    chunked = np.asarray(
        render_bruteforce(ds, CAM, 32, 18, bounces=2, chunk=8, row_chunk=6)
    )
    np.testing.assert_array_equal(full, chunked)


def test_shadow_region_darker_than_lit(tiny_scene):
    # The occluder triangle hovers at z~3 between the light (0,-6,6) and the
    # floor; somewhere on the floor must be strictly darker than the brightest
    # floor point due to the shadow term.
    ds = device_scene_from_host(tiny_scene)
    img = np.asarray(render_bruteforce(ds, CAM, 64, 36, bounces=1, chunk=8))
    floor = img[24:, :, :]  # lower part of the frame shows the floor
    lum = floor.mean(axis=-1)
    assert lum.max() - lum.min() > 0.05
