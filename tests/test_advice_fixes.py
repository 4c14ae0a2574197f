"""Regression tests for the round-1 advisor findings (ADVICE.md).

1. SMEM traversal stacks are sized from the actual tree depth + kernel
   arity instead of a fixed 96 (deep --max-depth trees could overflow).
2. The native loader path no longer drops spheres.obj.
3. The tiny-scene (root-leaf) pack no longer relies on an "inverted AABB"
   never hitting — the ordered slab test makes such a box unconstrained.
4. flatten_bvh fails loudly on an inner node with two dead children
   instead of recursing forever.
"""

import os

import numpy as np
import pytest

from parallel_ray_tracer_tpu.models.scene import Scene
from parallel_ray_tracer_tpu.ops import pallas_trace
from parallel_ray_tracer_tpu.ops.bvh import BVH, build_bvh
from parallel_ray_tracer_tpu.ops.bvh_flat import flatten_bvh
from parallel_ray_tracer_tpu.ops.vecmath import Vec3


class TestStackDepthGuard:
    def test_monotone_and_floor(self):
        rsd = pallas_trace.required_stack_depth
        # Shallow trees keep the round-1 default (stable kernel cache).
        assert rsd(32, 2) == pallas_trace.STACK_DEPTH
        assert rsd(0, 2) == pallas_trace.STACK_DEPTH
        # Deep binary tree: depth+2 entries needed, beyond the default.
        assert rsd(120, 2) == 122
        # BVH4 collapses two levels per node but pushes up to 4 per pop.
        assert rsd(120, 4) == max(96, 3 * 60 + 2)
        assert rsd(121, 4) == 3 * 61 + 2
        # BVH8: three levels per node, up to 8 pushes per pop.
        assert rsd(120, 8) == 7 * 40 + 2

    def test_pipeline_threads_depth(self, tiny_scene):
        from parallel_ray_tracer_tpu import pipeline
        from parallel_ray_tracer_tpu.config import RenderConfig

        cfg = RenderConfig(width=32, height=32, use_native=False)
        pipe = pipeline.prepare(cfg, scene=tiny_scene)
        assert pipe.pallas_stack_depth >= pallas_trace.required_stack_depth(
            pipe.flat.depth, 4
        )

    def test_deep_tree_traces_in_interpret_mode(self):
        # 160 triangles stacked along one axis, leaf_threshold 1, midpoint
        # splits -> a deep, skinny tree; the packed stack must cover it.
        n = 160
        z = np.arange(n, dtype=np.float32)[:, None]
        base = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        tv = base[None, :, :] + np.concatenate(
            [np.zeros((n, 1, 2), np.float32), z[:, :, None]], axis=2
        )
        bvh = build_bvh(tv, heuristic=1, max_depth=64, leaf_threshold=1)
        flat = flatten_bvh(bvh, tv, leaf_size=2)
        packed = pallas_trace.pack_bvh(flat, tv)
        need = pallas_trace.required_stack_depth(flat.depth, 2)
        R = pallas_trace.PACKET
        o = Vec3(
            np.full((R,), 0.3, np.float32),
            np.full((R,), 0.3, np.float32),
            np.full((R,), -1.0, np.float32),
        )
        d = Vec3(
            np.zeros((R,), np.float32),
            np.zeros((R,), np.float32),
            np.ones((R,), np.float32),
        )
        closest, _ = pallas_trace.make_tracer(
            (packed.cbox, packed.cmeta, packed.tri),
            leaf_size=2, interpret=True, stack_depth=need,
        )
        h = closest(o, d)
        t = np.asarray(h.t)
        # Nearest stacked triangle is at z=0 -> t = 1.
        np.testing.assert_allclose(t, 1.0, atol=1e-5)


class TestTinySceneRootLeafPack:
    def test_both_children_alias_leaf(self):
        tv = np.array(
            [[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32
        )
        bvh = build_bvh(tv, heuristic=0, leaf_threshold=4)
        flat = flatten_bvh(bvh, tv, leaf_size=4)
        packed = pallas_trace.pack_bvh(flat, tv)
        # No inverted sentinel box anywhere in the node table.
        assert (packed.cbox[:, 0:3] <= packed.cbox[:, 3:6]).all()
        assert (packed.cbox[:, 6:9] <= packed.cbox[:, 9:12]).all()
        assert packed.cmeta[0, 0] == packed.cmeta[0, 1] == -1

    def test_single_triangle_hit_is_exact(self):
        tv = np.array(
            [[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32
        )
        bvh = build_bvh(tv, heuristic=0, leaf_threshold=4)
        flat = flatten_bvh(bvh, tv, leaf_size=4)
        packed = pallas_trace.pack_bvh(flat, tv)
        R = pallas_trace.PACKET
        o = Vec3(
            np.full((R,), 0.2, np.float32),
            np.full((R,), 0.2, np.float32),
            np.full((R,), 2.0, np.float32),
        )
        d = Vec3(
            np.zeros((R,), np.float32),
            np.zeros((R,), np.float32),
            np.full((R,), -1.0, np.float32),
        )
        closest, occluded = pallas_trace.make_tracer(
            (packed.cbox, packed.cmeta, packed.tri),
            leaf_size=4, interpret=True,
        )
        h = closest(o, d)
        np.testing.assert_allclose(np.asarray(h.t), 2.0, atol=1e-5)
        assert (np.asarray(h.idx) == 0).all()
        blocked = occluded(o, d, np.full((R,), 9.0, np.float32))
        assert np.asarray(blocked).all()


class TestDeadSubtreeGuard:
    def test_two_dead_children_raises(self):
        # Hand-built malformed tree: root is inner, both children dead
        # (count == 0 and a == 0, the builder's failed-split marker).
        tv = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
        z3 = np.zeros(3, np.float32)
        bvh = BVH(
            min_x=z3.copy(), min_y=z3.copy(), min_z=z3.copy(),
            max_x=z3 + 1, max_y=z3 + 1, max_z=z3 + 1,
            count=np.array([0, 0, 0], np.int32),
            a=np.array([1, 0, 0], np.int32),
            tri_perm=np.array([0], np.int32),
            stats={},
        )
        with pytest.raises(AssertionError, match="two dead children"):
            flatten_bvh(bvh, tv, leaf_size=4)


class TestNativeSphereParity:
    def test_native_loader_includes_spheres(self, tmp_path):
        from parallel_ray_tracer_tpu.native import builder as nb

        if not nb.available():
            pytest.skip("native toolchain unavailable")
        (tmp_path / "triangles.obj").write_text(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl m\nf 1 2 3\n"
        )
        (tmp_path / "triangles.mtl").write_text(
            "newmtl m\nKd 0.5 0.5 0.5\nKs 0 0 0\nKr 0 0 0\n"
        )
        (tmp_path / "lights.obj").write_text("0 0 5 10 10 10\n")
        (tmp_path / "spheres.obj").write_text("0.5 0.5 2 0.25 1\n")

        from parallel_ray_tracer_tpu.models.scene import load_scene

        sc_native = nb.load_scene_native(str(tmp_path))
        sc_py = load_scene(str(tmp_path))
        assert sc_native.num_spheres == sc_py.num_spheres == 1
        np.testing.assert_array_equal(
            sc_native.spheres_center, sc_py.spheres_center
        )
        np.testing.assert_array_equal(
            sc_native.spheres_radius, sc_py.spheres_radius
        )
        np.testing.assert_array_equal(
            sc_native.spheres_mat, sc_py.spheres_mat
        )
