"""Kernel-variant equivalence: dual-pop schedule and bf16-compressed rows.

Every traversal schedule and box format must produce EXACTLY the results
of the baseline single-pop f32 kernels (conservative bf16 rounding can
only add node visits, never change hits). Run in interpret mode on CPU;
the compiled TPU path is covered by bench/verify runs and the TPU-gated
golden test.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from parallel_ray_tracer_tpu.models.scene import synthetic_scene
from parallel_ray_tracer_tpu.ops import pallas_trace
from parallel_ray_tracer_tpu.ops.bvh import build_bvh
from parallel_ray_tracer_tpu.ops.bvh_flat import flatten_bvh
from parallel_ray_tracer_tpu.ops.vecmath import Vec3


@pytest.fixture(scope="module")
def packed_scene():
    sc = synthetic_scene(2000, seed=3)
    tv = sc.triangle_vertices()
    bvh = build_bvh(tv, heuristic=6, leaf_threshold=8)
    flat = flatten_bvh(bvh, tv, leaf_size=8)
    return flat, tv


@pytest.fixture(scope="module")
def rays():
    R = pallas_trace.PACKET
    rng = np.random.RandomState(0)
    o = Vec3(*(jnp.asarray(rng.uniform(-6, 6, R).astype(np.float32))
               for _ in range(3)))
    dn = rng.normal(size=(3, R)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=0, keepdims=True)
    d = Vec3(*(jnp.asarray(x) for x in dn))
    return o, d


def _tracers(packed, sd, **kw):
    pd = (
        jnp.asarray(packed.cbox),
        jnp.asarray(packed.cmeta),
        jnp.asarray(packed.tri),
    )
    return pallas_trace.make_tracer(
        pd, packed.leaf_size, interpret=True, stack_depth=sd, **kw
    )


@pytest.mark.parametrize("arity", [4, 8])
class TestDualPopSchedule:
    def test_matches_single_pop(self, packed_scene, rays, arity):
        flat, tv = packed_scene
        packer = {4: pallas_trace.pack_bvh4, 8: pallas_trace.pack_bvh8}[arity]
        packed = packer(flat, tv)
        sd = pallas_trace.required_stack_depth(flat.depth, arity)
        o, d = rays
        c1, o1 = _tracers(packed, sd, dual=False)
        c2, o2 = _tracers(packed, sd, dual=True)
        h1, h2 = c1(o, d), c2(o, d)
        assert np.array_equal(np.asarray(h1.t), np.asarray(h2.t))
        assert np.array_equal(np.asarray(h1.idx), np.asarray(h2.idx))
        m2 = jnp.full(o.x.shape, 25.0, jnp.float32)
        assert np.array_equal(
            np.asarray(o1(o, d, m2)), np.asarray(o2(o, d, m2))
        )


@pytest.mark.parametrize("arity", [4, 8])
class TestCompressedRows:
    def test_pairs_enclose_f32_boxes(self, packed_scene, arity):
        flat, tv = packed_scene
        packer = {4: pallas_trace.pack_bvh4, 8: pallas_trace.pack_bvh8}[arity]
        pf = packer(flat, tv, bf16=False)
        pc = packer(flat, tv, bf16=True)
        assert pc.compressed and pc.cbox.dtype == np.float32
        bits = pc.cbox.view(np.uint32)
        mn = (bits & np.uint32(0xFFFF0000)).view(np.float32)
        mx = (bits << np.uint32(16)).view(np.float32)
        for k in range(arity):
            valid = pf.cmeta[:, arity + k] > 0
            for c in range(3):
                assert (mn[valid, 3 * k + c] <= pf.cbox[valid, 6 * k + c]).all()
                assert (
                    mx[valid, 3 * k + c] >= pf.cbox[valid, 6 * k + 3 + c]
                ).all()

    @pytest.mark.parametrize("dual", [False, True])
    def test_hits_identical_to_f32(self, packed_scene, rays, arity, dual):
        flat, tv = packed_scene
        packer = {4: pallas_trace.pack_bvh4, 8: pallas_trace.pack_bvh8}[arity]
        pf = packer(flat, tv, bf16=False)
        pc = packer(flat, tv, bf16=True)
        sd = pallas_trace.required_stack_depth(flat.depth, arity)
        o, d = rays
        cf, of_ = _tracers(pf, sd, dual=dual)
        cc, oc_ = _tracers(pc, sd, dual=dual, compressed=True)
        hf, hc = cf(o, d), cc(o, d)
        assert np.array_equal(np.asarray(hf.t), np.asarray(hc.t))
        assert np.array_equal(np.asarray(hf.idx), np.asarray(hc.idx))
        m2 = jnp.full(o.x.shape, 25.0, jnp.float32)
        assert np.array_equal(
            np.asarray(of_(o, d, m2)), np.asarray(oc_(o, d, m2))
        )


class TestPipelineBf16Pallas:
    def test_prepare_produces_compressed_table(self, tiny_scene):
        from parallel_ray_tracer_tpu import pipeline
        from parallel_ray_tracer_tpu.config import RenderConfig

        cfg = RenderConfig(
            width=64, height=32, bounces=2, bf16_bvh=True, bvh_width=4,
            use_native=False, tile_rows=8, tile_cols=128,
        )
        pipe = pipeline.prepare(cfg, scene=tiny_scene)
        assert pipe.compressed
        img = np.asarray(pipe.render(variant="pallas", interpret=True))
        ref = np.asarray(pipe.render(variant="bruteforce"))
        np.testing.assert_allclose(img, ref, atol=3e-5)

    def test_width2_bf16_warns(self, tiny_scene):
        import jax
        from parallel_ray_tracer_tpu import pipeline
        from parallel_ray_tracer_tpu.config import RenderConfig

        cfg = RenderConfig(
            width=32, height=32, bounces=1, bf16_bvh=True, bvh_width=2,
            use_native=False,
        )
        if jax.default_backend() == "tpu":
            with pytest.warns(RuntimeWarning, match="bvh_width=2"):
                pipe = pipeline.prepare(cfg, scene=tiny_scene)
            assert not pipe.compressed
        else:
            pipe = pipeline.prepare(cfg, scene=tiny_scene)
            assert not pipe.compressed  # raw bf16 path, not pairs format


class TestStreamingKernels:
    """HBM-streaming leaf rows (tri/attr in ANY memory, ring + DMA
    prefetch): results must be identical to the VMEM-resident kernels."""

    @pytest.mark.parametrize("arity", [4, 8])
    def test_matches_resident(self, packed_scene, rays, arity):
        flat, tv = packed_scene
        packer = {4: pallas_trace.pack_bvh4, 8: pallas_trace.pack_bvh8}[arity]
        packed = packer(flat, tv)
        sd = pallas_trace.required_stack_depth(flat.depth, arity)
        o, d = rays
        c1, o1 = _tracers(packed, sd, dual=True)
        c2, o2 = _tracers(packed, sd, stream=True)
        h1, h2 = c1(o, d), c2(o, d)
        assert np.array_equal(np.asarray(h1.t), np.asarray(h2.t))
        assert np.array_equal(np.asarray(h1.idx), np.asarray(h2.idx))
        m2 = jnp.full(o.x.shape, 25.0, jnp.float32)
        assert np.array_equal(
            np.asarray(o1(o, d, m2)), np.asarray(o2(o, d, m2))
        )

    def test_attr_variant_matches(self, packed_scene, rays):
        flat, tv = packed_scene
        sc = synthetic_scene(2000, seed=3)
        packed = pallas_trace.pack_bvh4(flat, tv)
        attr = pallas_trace.pack_attr(
            flat, sc.mat_idx, sc.mats_kd, sc.mats_ks, sc.mats_kr
        )
        sd = pallas_trace.required_stack_depth(flat.depth, 4)
        o, d = rays
        pd = (
            jnp.asarray(packed.cbox), jnp.asarray(packed.cmeta),
            jnp.asarray(packed.tri), jnp.asarray(attr),
        )
        c1, _ = pallas_trace.make_tracer(
            pd, 8, interpret=True, stack_depth=sd, dual=True
        )
        c2, _ = pallas_trace.make_tracer(
            pd, 8, interpret=True, stack_depth=sd, stream=True
        )
        h1, h2 = c1(o, d), c2(o, d)
        assert np.array_equal(np.asarray(h1.t), np.asarray(h2.t))
        for f in ("n", "kd", "ks", "kr"):
            for c in "xyz":
                np.testing.assert_array_equal(
                    np.asarray(getattr(getattr(h1, f), c)),
                    np.asarray(getattr(getattr(h2, f), c)),
                )

    def test_pipeline_streams_when_forced(self, tiny_scene):
        from parallel_ray_tracer_tpu import pipeline
        from parallel_ray_tracer_tpu.config import RenderConfig

        cfg = RenderConfig(
            width=64, height=32, bounces=2, use_native=False,
            tile_rows=8, tile_cols=128, stream="on",
        )
        pipe = pipeline.prepare(cfg, scene=tiny_scene)
        assert pipe.stream
        img = np.asarray(pipe.render(variant="pallas", interpret=True))
        ref = np.asarray(pipe.render(variant="bruteforce"))
        np.testing.assert_allclose(img, ref, atol=3e-5)

    def test_auto_threshold(self, tiny_scene):
        from parallel_ray_tracer_tpu import pipeline
        from parallel_ray_tracer_tpu.config import RenderConfig

        cfg = RenderConfig(
            width=32, height=32, bounces=1, use_native=False,
        )
        pipe = pipeline.prepare(cfg, scene=tiny_scene)
        assert not pipe.stream  # tiny scene fits VMEM comfortably
