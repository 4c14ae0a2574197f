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
