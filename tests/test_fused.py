"""Fused whole-frame kernel (pallas_trace.frame_tiles) vs the pass-based
pallas path: same image, interpret mode on CPU.

The fused kernel reassociates a handful of shading ops (rsqrt vs
sqrt+divide), so equality is tolerance-based with an allowance for
isolated shadow-silhouette pixels where a one-ULP direction difference
can flip a binary occlusion result.
"""

import numpy as np
import pytest

from parallel_ray_tracer_tpu import pipeline
from parallel_ray_tracer_tpu.config import RenderConfig
from parallel_ray_tracer_tpu.models.scene import Scene
from conftest import blocker_cloud_scene as conftest_scene


@pytest.fixture(scope="module")
def tiny_scene() -> Scene:
    return conftest_scene()


@pytest.mark.parametrize("bounces", [1, 3])
def test_fused_matches_pass_based(tiny_scene, bounces):
    cfg = RenderConfig(
        width=32, height=32, bounces=bounces, bvh_heuristic=6,
        tile_rows=8, tile_cols=128, use_native=False,
    )
    pipe = pipeline.prepare(cfg, scene=tiny_scene)
    img_pass = np.asarray(pipe.render(variant="pallas", interpret=True))
    img_fused = np.asarray(pipe.render(variant="fused", interpret=True))
    # non-vacuous: the scene is actually in frame (not uniform ambient)
    assert img_pass.std() > 0.01
    diff = np.abs(img_pass - img_fused)
    # almost all pixels match tightly; allow <=1% silhouette flips
    assert (diff.max(axis=-1) < 1e-3).mean() > 0.99, diff.max()
    assert np.median(diff) < 1e-5


@pytest.mark.parametrize("bounces", [1, 3])
def test_fused_spheres_match_pass_based(tiny_scene, bounces):
    """Spheres are first-class in the fused kernel: a dense in-kernel
    pass after each BVH traversal (closest AND shadow segments) must
    render the same image as the pass-based pallas path, whose sphere
    support goes through ops/spheres.wrap_tracer + override_attrs.
    bounces=3 exercises reflections OFF sphere surfaces (kr, normals)."""
    import dataclasses

    sc = conftest_scene(with_spheres=True)
    cfg = RenderConfig(
        width=32, height=32, bounces=bounces, bvh_heuristic=6,
        tile_rows=8, tile_cols=128, use_native=False,
    )
    pipe = pipeline.prepare(cfg, scene=sc)
    assert pipe.resolved_variant("auto") == "fused"
    img_pass = np.asarray(pipe.render(variant="pallas", interpret=True))
    img_fused = np.asarray(pipe.render(variant="fused", interpret=True))
    assert img_pass.std() > 0.01  # scene actually rendered, not ambient
    diff = np.abs(img_pass - img_fused)
    assert (diff.max(axis=-1) < 1e-3).mean() > 0.99, diff.max()
    assert np.median(diff) < 1e-5
    # the spheres are actually in frame: they change the image vs the
    # sphere-free render of the same scene
    pipe0 = pipeline.prepare(
        dataclasses.replace(cfg), scene=tiny_scene
    )
    img0 = np.asarray(pipe0.render(variant="fused", interpret=True))
    assert np.abs(img0 - img_fused).max() > 0.05


def test_fused_counters_image_identical_and_bounce0_matches_standalone(
    tiny_scene,
):
    """frame_tiles(counters=True) (a) renders the bit-identical image (the
    unrolled instrumented loop is a pure schedule change) and (b) its
    bounce-0 closest counter column equals the standalone
    closest_tiles(counters=True) run at the same traversal schedule on
    the same primary rays — so the roofline's fused-frame pricing uses
    counted slots, not the old b3 extrapolation (round-4 verdict)."""
    import jax.numpy as jnp

    from parallel_ray_tracer_tpu.models.camera import ray_basis
    from parallel_ray_tracer_tpu.ops import pallas_trace
    from parallel_ray_tracer_tpu.ops.render import generate_rays_tiled
    from parallel_ray_tracer_tpu.ops.vecmath import Vec3

    W, H, bounces = 128, 8, 2
    cfg = RenderConfig(
        width=W, height=H, bounces=bounces, bvh_heuristic=6,
        tile_rows=8, tile_cols=128, use_native=False,
    )
    pipe = pipeline.prepare(cfg, scene=tiny_scene)
    cbox, cmeta, tri, attr = pipe.packed_dev[:4]
    cmat = pipe.packed_dev[4] if len(pipe.packed_dev) >= 5 else None
    lamb = pallas_trace.pack_lights(pipe.ds)
    o, d = generate_rays_tiled(
        tuple(jnp.asarray(a) for a in ray_basis(pipe.camera(), W, H)),
        W, H, 8, 128,
    )
    R = o.x.shape[0]
    o2 = Vec3(*(p.reshape(R // 128, 128) for p in o))
    d2 = Vec3(*(p.reshape(R // 128, 128) for p in d))
    kw = dict(
        bounces=bounces, leaf_size=pipe.leaf_size,
        stack_depth=pipe.pallas_stack_depth, cmat=cmat,
        npop=4, adaptive=True, interpret=True,
    )
    col = pallas_trace.frame_tiles(cbox, cmeta, tri, attr, lamb, o2, d2, **kw)
    col_c, cnt = pallas_trace.frame_tiles(
        cbox, cmeta, tri, attr, lamb, o2, d2, counters=True, **kw
    )
    for a, b in zip(col, col_c):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ntiles = (R // 128) // 8
    assert cnt.shape == (ntiles, 7, 2 * bounces)
    cnt = np.asarray(cnt)
    assert (cnt >= 0).all()
    assert cnt[:, 0, 0].sum() > 0        # bounce-0 closest inner iters
    assert cnt[:, 5, 0].sum() > 0        # ... executed inner slots
    # bounce-0 closest == standalone counter kernel at the same schedule
    _, cnt0 = pallas_trace.closest_tiles(
        cbox, cmeta, tri, o2, d2, leaf_size=pipe.leaf_size,
        stack_depth=pipe.pallas_stack_depth, dual=True, cmat=cmat,
        npop=4, adaptive=True, counters=True, interpret=True,
    )
    np.testing.assert_array_equal(cnt[:, :, 0], np.asarray(cnt0))


def test_fused_leaf4_mxu_matches_leaf8(tiny_scene):
    """leaf_size=4 with the MXU leaf path (8 groups of 4 per visit) must
    render the same frame as the default leaf_size=8 configuration."""
    imgs = {}
    for ls in (8, 4):
        cfg = RenderConfig(
            width=32, height=32, bounces=3, bvh_heuristic=6,
            tile_rows=8, tile_cols=128, use_native=False,
            leaf_size=ls, leaf_threshold=ls, mxu_leaf=True,
        )
        pipe = pipeline.prepare(cfg, scene=tiny_scene)
        assert len(pipe.packed_dev) == 5  # cmat present -> MXU leaf active
        imgs[ls] = np.asarray(pipe.render(variant="fused", interpret=True))
    assert imgs[8].std() > 0.01  # scene actually rendered, not ambient
    diff = np.abs(imgs[4] - imgs[8])
    assert (diff.max(axis=-1) < 1e-3).mean() > 0.99, diff.max()
    assert np.median(diff) < 1e-5
