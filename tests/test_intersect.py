"""Intersection primitives vs closed-form cases (cpu/src/raytracer.c:35-59)."""

import jax.numpy as jnp
import numpy as np

from parallel_ray_tracer_tpu.ops.intersect import (
    T_MAX,
    aabb_intersect,
    moller_trumbore,
    ray_sphere,
)
from parallel_ray_tracer_tpu.ops.vecmath import Vec3, vec3


def V(*cols):
    a = np.asarray(cols, np.float32)
    return Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]))


UNIT_TRI = (V([0, 0, 0]), V([1, 0, 0]), V([0, 1, 0]))  # z=0 plane


def test_mt_direct_hit():
    o = V([0.2, 0.2, 1.0])
    d = V([0, 0, -1.0])
    h = moller_trumbore(o, d, *UNIT_TRI)
    np.testing.assert_allclose(h.t, [1.0], rtol=1e-6)
    np.testing.assert_allclose(h.u, [0.2], atol=1e-6)
    np.testing.assert_allclose(h.v, [0.2], atol=1e-6)
    # n = e1 x e2 = +z; det = -dot(d, n) = 1 > 0 -> norm_dir False
    assert not bool(h.norm_dir[0])


def test_mt_backside_sets_norm_dir():
    o = V([0.2, 0.2, -1.0])
    d = V([0, 0, 1.0])
    h = moller_trumbore(o, d, *UNIT_TRI)
    np.testing.assert_allclose(h.t, [1.0], rtol=1e-6)
    assert bool(h.norm_dir[0])


def test_mt_miss_outside():
    o = V([0.9, 0.9, 1.0])  # u+v > 1 region
    d = V([0, 0, -1.0])
    h = moller_trumbore(o, d, *UNIT_TRI)
    assert float(h.t[0]) == float(T_MAX)


def test_mt_parallel_ray_misses():
    o = V([0.1, 0.1, 1.0])
    d = V([1.0, 0, 0])  # parallel to the plane -> |det| < EPSILON
    h = moller_trumbore(o, d, *UNIT_TRI)
    assert float(h.t[0]) == float(T_MAX)


def test_mt_behind_origin_misses():
    o = V([0.2, 0.2, -1.0])
    d = V([0, 0, -1.0])  # triangle is behind
    h = moller_trumbore(o, d, *UNIT_TRI)
    assert float(h.t[0]) == float(T_MAX)


def test_mt_epsilon_bias():
    # t <= EPSILON (1e-3) counts as a miss: the reference's self-hit guard.
    o = V([0.2, 0.2, 0.0005])
    d = V([0, 0, -1.0])
    h = moller_trumbore(o, d, *UNIT_TRI)
    assert float(h.t[0]) == float(T_MAX)


def test_mt_unnormalized_dir_scales_t():
    o = V([0.2, 0.2, 2.0])
    d = V([0, 0, -4.0])
    h = moller_trumbore(o, d, *UNIT_TRI)
    np.testing.assert_allclose(h.t, [0.5], rtol=1e-6)  # t in units of |dir|


def test_aabb_basic():
    bb_min = V([-1, -1, -1])
    bb_max = V([1, 1, 1])
    o = V([0, 0, -5])
    d = V([0, 0, 1])
    inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
    t = aabb_intersect(bb_min, bb_max, o, inv)
    np.testing.assert_allclose(t, [4.0], rtol=1e-6)


def test_aabb_from_inside_hits():
    bb_min, bb_max = V([-1, -1, -1]), V([1, 1, 1])
    o, d = V([0, 0, 0]), V([0, 0, 1])
    inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
    t = aabb_intersect(bb_min, bb_max, o, inv)
    # tmin < 0 but tmax > 0 -> returns (negative) tmin, like the C code.
    assert float(t[0]) == -1.0


def test_aabb_miss():
    bb_min, bb_max = V([-1, -1, -1]), V([1, 1, 1])
    o, d = V([0, 5, -5]), V([0, 0, 1])
    inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
    t = aabb_intersect(bb_min, bb_max, o, inv)
    assert float(t[0]) == float(T_MAX)


def test_aabb_axis_parallel_ray():
    # Ray parallel to x slab, inside it: division by zero must not cull.
    bb_min, bb_max = V([-1, -1, -1]), V([1, 1, 1])
    o, d = V([0, 0, -5]), V([0, 0, 1])
    d = Vec3(d.x * 0.0, d.y, d.z)  # dx = 0
    inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
    t = aabb_intersect(bb_min, bb_max, o, inv)
    np.testing.assert_allclose(t, [4.0], rtol=1e-6)


def test_sphere_hit_and_inside():
    c = V([0, 0, 0])
    o = V([0, 0, -5])
    d = V([0, 0, 1])
    h = ray_sphere(o, d, c, 1.0)
    np.testing.assert_allclose(h.t, [4.0], rtol=1e-6)
    assert not bool(h.inside[0])

    o2 = V([0, 0, 0])
    h2 = ray_sphere(o2, d, c, 1.0)
    np.testing.assert_allclose(h2.t, [1.0], rtol=1e-6)
    assert bool(h2.inside[0])


def test_sphere_miss():
    c = V([0, 0, 0])
    o = V([0, 5, -5])
    d = V([0, 0, 1])
    h = ray_sphere(o, d, c, 1.0)
    assert float(h.t[0]) == float(T_MAX)
