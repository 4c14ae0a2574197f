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


@pytest.fixture(scope="module")
def tiny_scene() -> Scene:
    """Floor quad (z=0 plane) + a cloud of small blockers above it.

    Built in the camera's native convention (z up, camera looks along +y;
    cpu/src/cam.c): the DEFAULT camera at (0, -9, 3) pitched down pi/12
    frames the whole scene, so parity assertions on renders of this scene
    are non-vacuous (round-3 verdict: a test that renders nothing
    verifies nothing)."""
    rng = np.random.RandomState(7)
    verts = [
        [-6, -6, 0], [6, -6, 0], [6, 6, 0], [-6, 6, 0],
    ]
    faces = [[0, 1, 2], [0, 2, 3]]
    mat_idx = [0, 0]
    for k in range(30):
        c = rng.uniform(-3, 3, 3).astype(np.float32)
        c[2] = rng.uniform(0.5, 3.0)
        base = len(verts)
        for off in rng.normal(0, 0.35, (3, 3)):
            verts.append((c + off).tolist())
        faces.append([base, base + 1, base + 2])
        mat_idx.append(1 + (k % 2))
    return Scene(
        verts=np.asarray(verts, np.float32),
        faces=np.asarray(faces, np.int32),
        mat_idx=np.asarray(mat_idx, np.int32),
        mats_kd=np.asarray(
            [[0.6, 0.6, 0.6], [0.8, 0.2, 0.2], [0.2, 0.3, 0.8]], np.float32
        ),
        mats_ks=np.asarray(
            [[0.1, 0.1, 0.1], [0.3, 0.3, 0.3], [0.0, 0.0, 0.0]], np.float32
        ),
        mats_kr=np.asarray(
            [[0.3, 0.3, 0.3], [0.0, 0.0, 0.0], [0.5, 0.5, 0.5]], np.float32
        ),
        lights_pos=np.asarray([[4, 2, 6], [-5, -3, 4]], np.float32),
        lights_kl=np.asarray([[30, 28, 25], [10, 12, 16]], np.float32),
    )


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

    sc = dataclasses.replace(
        tiny_scene,
        spheres_center=np.asarray(
            [[0.0, 0.0, 1.0], [2.0, 1.5, 0.8], [-2.5, -1.0, 1.4]],
            np.float32,
        ),
        spheres_radius=np.asarray([0.8, 0.6, 1.0], np.float32),
        spheres_mat=np.asarray([1, 2, 0], np.int32),
    )
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
