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

    @pytest.mark.parametrize("npop", [2, 8])
    def test_stream_wide_pops_match_resident(self, packed_scene, rays, npop):
        """The block-ring streamed kernels at the full wide/adaptive inner
        schedule must be BIT-identical to the resident kernels at the same
        schedule (streaming forces the VPU leaf, so the resident side runs
        without the MXU table too — the streamed MXU leaf was measured
        slower and removed, see pallas_trace's streaming section)."""
        flat, tv = packed_scene
        sc = synthetic_scene(2000, seed=3)
        packed = pallas_trace.pack_bvh4(flat, tv)
        attr = pallas_trace.pack_attr(
            flat, sc.mat_idx, sc.mats_kd, sc.mats_ks, sc.mats_kr
        )
        sd = pallas_trace.required_stack_depth(flat.depth, 4, npop=npop)
        o, d = rays
        pd = (
            jnp.asarray(packed.cbox), jnp.asarray(packed.cmeta),
            jnp.asarray(packed.tri), jnp.asarray(attr),
        )
        kw = dict(interpret=True, stack_depth=sd, dual=True, npop=npop,
                  adaptive=npop > 2)
        c_res, o_res = pallas_trace.make_tracer(pd, 8, **kw)
        c_str, o_str = pallas_trace.make_tracer(pd, 8, stream=True, **kw)
        h_r, h_s = c_res(o, d), c_str(o, d)
        assert np.array_equal(np.asarray(h_r.t), np.asarray(h_s.t))
        assert np.array_equal(np.asarray(h_r.idx), np.asarray(h_s.idx))
        for f in ("n", "kd", "ks", "kr"):
            for c in "xyz":
                np.testing.assert_array_equal(
                    np.asarray(getattr(getattr(h_r, f), c)),
                    np.asarray(getattr(getattr(h_s, f), c)),
                )
        m2 = jnp.full(o.x.shape, 25.0, jnp.float32)
        assert np.array_equal(
            np.asarray(o_res(o, d, m2)), np.asarray(o_str(o, d, m2))
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


def _interleave_cmat(cmat):
    """Mirror pipeline.prepare's upload: one [hi(16) | lo(16)] bf16 table."""
    cm = jnp.asarray(cmat)
    cmh = cm.astype(jnp.bfloat16)
    cml = (cm - cmh.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([cmh, cml], axis=1)


class TestMXULeaf:
    """MXU leaf evaluation (bf16x3 C@R matmuls) vs the VPU scalar leaf.

    bf16x3 carries ~2e-5 relative t error, so hits can flip only on
    shared-edge ties; t must agree tightly and idx on all but a tiny
    fraction of rays. Occlusion booleans must match except at the same
    measure-zero boundaries.
    """

    def test_closest_matches_vpu(self, packed_scene, rays):
        flat, tv = packed_scene
        packed = pallas_trace.pack_bvh4(flat, tv)
        sd = pallas_trace.required_stack_depth(flat.depth, 4)
        o, d = rays
        pd = (
            jnp.asarray(packed.cbox), jnp.asarray(packed.cmeta),
            jnp.asarray(packed.tri),
        )
        c_vpu, o_vpu = pallas_trace.make_tracer(
            pd, 8, interpret=True, stack_depth=sd, dual=True
        )
        # make_tracer's 5-tuple form is (cbox, cmeta, tri, attr, cmi)
        sc = synthetic_scene(2000, seed=3)
        attr = pallas_trace.pack_attr(
            flat, sc.mat_idx, sc.mats_kd, sc.mats_ks, sc.mats_kr
        )
        pd_m = pd + (jnp.asarray(attr), _interleave_cmat(packed.cmat))
        c_mxu, o_mxu = pallas_trace.make_tracer(
            pd_m, 8, interpret=True, stack_depth=sd, dual=True
        )
        h_v, h_m = c_vpu(o, d), c_mxu(o, d)
        t_v, t_m = np.asarray(h_v.t), np.asarray(h_m.t)
        miss_v, miss_m = t_v > 1e30, t_m > 1e30
        assert (miss_v == miss_m).mean() > 0.999
        both = ~miss_v & ~miss_m
        idx_v = np.asarray(h_v.idx)
        idx_m = np.asarray(h_m.idx)
        assert (idx_v[both] == idx_m[both]).mean() > 0.99
        same = both & (idx_v == idx_m)
        rel = np.abs(t_v[same] - t_m[same]) / np.maximum(t_v[same], 1e-9)
        # bf16x3 is ~2e-5 relative on typical hits; grazing hits (tiny
        # det) amplify the numerator error, so the tail is looser.
        assert rel.mean() < 2e-4
        assert rel.max() < 2e-2

        m2 = jnp.full(o.x.shape, 25.0, jnp.float32)
        b_v = np.asarray(o_vpu(o, d, m2))
        b_m = np.asarray(o_mxu(o, d, m2))
        assert (b_v == b_m).mean() > 0.999

    def test_attr_tracking_matches(self, packed_scene, rays):
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
        c_vpu, _ = pallas_trace.make_tracer(
            pd, 8, interpret=True, stack_depth=sd, dual=True
        )
        c_mxu, _ = pallas_trace.make_tracer(
            pd + (_interleave_cmat(packed.cmat),), 8,
            interpret=True, stack_depth=sd, dual=True,
        )
        h_v, h_m = c_vpu(o, d), c_mxu(o, d)
        idx_v, idx_m = np.asarray(h_v.idx), np.asarray(h_m.idx)
        same = idx_v == idx_m
        assert same.mean() > 0.99
        # Where the winner agrees, tracked attributes must agree exactly.
        for f in ("n", "kd", "ks", "kr"):
            for c in "xyz":
                a_v = np.asarray(getattr(getattr(h_v, f), c))
                a_m = np.asarray(getattr(getattr(h_m, f), c))
                np.testing.assert_array_equal(a_v[same], a_m[same])

    def test_non_dual_falls_back(self, packed_scene, rays):
        """cmat with dual=False must silently use the VPU leaf (identical
        results), not crash — sharded callers pass the full tuple."""
        flat, tv = packed_scene
        packed = pallas_trace.pack_bvh4(flat, tv)
        sd = pallas_trace.required_stack_depth(flat.depth, 4)
        o, d = rays
        pd3 = (
            jnp.asarray(packed.cbox), jnp.asarray(packed.cmeta),
            jnp.asarray(packed.tri),
        )
        sc = synthetic_scene(2000, seed=3)
        attr = pallas_trace.pack_attr(
            flat, sc.mat_idx, sc.mats_kd, sc.mats_ks, sc.mats_kr
        )
        pd5 = pd3[:3] + (jnp.asarray(attr), _interleave_cmat(packed.cmat))
        c_ref, _ = pallas_trace.make_tracer(
            pd3, 8, interpret=True, stack_depth=sd, dual=False
        )
        c_fb, _ = pallas_trace.make_tracer(
            pd5, 8, interpret=True, stack_depth=sd, dual=False
        )
        h_r, h_f = c_ref(o, d), c_fb(o, d)
        assert np.array_equal(np.asarray(h_r.t), np.asarray(h_f.t))
        assert np.array_equal(np.asarray(h_r.idx), np.asarray(h_f.idx))


class TestReverseShadows:
    """Light-origin shadow segments produce the same image as forward
    tracing (the occlusion window maps exactly; see shade_hit). Uses the
    portable jax packet variant — the transform lives in shade_hit, so
    it is the same code path the Pallas kernels get their inputs from."""

    def test_image_matches_forward(self):
        from parallel_ray_tracer_tpu.config import RenderConfig
        from parallel_ray_tracer_tpu import pipeline
        from parallel_ray_tracer_tpu.ops import render as render_ops

        cfg = RenderConfig(width=64, height=48, scene="car_only",
                           bounces=2, bvh_heuristic=6,
                           tile_rows=16, tile_cols=64, use_native=False)
        pipe = pipeline.prepare(cfg)
        kw = dict(bounces=cfg.bounces, leaf_size=pipe.leaf_size,
                  stack_depth=pipe.stack_depth, tile_rows=cfg.tile_rows,
                  tile_cols=cfg.tile_cols)
        fwd = np.asarray(render_ops.render_bvh_jax(
            pipe.ds, pipe.dbvh, pipe.camera(), 64, 48,
            reverse_shadows=False, **kw))
        rev = np.asarray(render_ops.render_bvh_jax(
            pipe.ds, pipe.dbvh, pipe.camera(), 64, 48,
            reverse_shadows=True, **kw))
        # fp-marginal shadow-edge lanes may flip; nothing else may move.
        frac = (np.abs(fwd - rev) > 1e-5).mean()
        assert frac <= 2e-3, f"{frac:.4%} of values differ"


@pytest.mark.parametrize("npop", [2, 8])
def test_mxu_leaf4_matches_vpu(npop):
    """L=4 leaf groups on the MXU path (finer culling: 8 groups of 4
    triangles fill the same 128-row MXU pass that 4 groups of 8 do).

    The generalized _mxu_* helpers slice (4L)-row group blocks; results
    must match the VPU scalar leaf at L=4 to bf16x3 accuracy, for both
    the dual-pop (npop=2) and wide-pop (npop=8) schedules."""
    sc = synthetic_scene(2000, seed=3)
    tv = sc.triangle_vertices()
    bvh = build_bvh(tv, heuristic=6, leaf_threshold=4)
    flat = flatten_bvh(bvh, tv, leaf_size=4)
    packed = pallas_trace.pack_bvh4(flat, tv)
    assert packed.cmat.shape[0] == (packed.tri.shape[0]) * 16
    sd = pallas_trace.required_stack_depth(flat.depth, 4, npop=npop)
    R = pallas_trace.PACKET
    rng = np.random.RandomState(1)
    o = Vec3(*(jnp.asarray(rng.uniform(-6, 6, R).astype(np.float32))
               for _ in range(3)))
    dn = rng.normal(size=(3, R)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=0, keepdims=True)
    d = Vec3(*(jnp.asarray(x) for x in dn))
    pd = (
        jnp.asarray(packed.cbox), jnp.asarray(packed.cmeta),
        jnp.asarray(packed.tri),
    )
    attr = pallas_trace.pack_attr(
        flat, sc.mat_idx, sc.mats_kd, sc.mats_ks, sc.mats_kr
    )
    c_vpu, o_vpu = pallas_trace.make_tracer(
        pd, 4, interpret=True, stack_depth=sd, dual=True, npop=npop
    )
    pd_m = pd + (jnp.asarray(attr), _interleave_cmat(packed.cmat))
    c_mxu, o_mxu = pallas_trace.make_tracer(
        pd_m, 4, interpret=True, stack_depth=sd, dual=True, npop=npop
    )
    h_v, h_m = c_vpu(o, d), c_mxu(o, d)
    t_v, t_m = np.asarray(h_v.t), np.asarray(h_m.t)
    # bf16x3 rounding differs from the VPU's f32 MT on some rays; exact
    # equality would mean the wrapper silently fell back to the VPU leaf.
    assert not np.array_equal(t_v, t_m), "MXU path not taken at L=4"
    miss_v, miss_m = t_v > 1e30, t_m > 1e30
    assert (miss_v == miss_m).mean() > 0.999
    both = ~miss_v & ~miss_m
    idx_v, idx_m = np.asarray(h_v.idx), np.asarray(h_m.idx)
    assert (idx_v[both] == idx_m[both]).mean() > 0.99
    same = both & (idx_v == idx_m)
    rel = np.abs(t_v[same] - t_m[same]) / np.maximum(t_v[same], 1e-9)
    assert rel.mean() < 2e-4 and rel.max() < 2e-2
    m2 = jnp.full(o.x.shape, 25.0, jnp.float32)
    b_v = np.asarray(o_vpu(o, d, m2))
    b_m = np.asarray(o_mxu(o, d, m2))
    assert (b_v == b_m).mean() > 0.999


@pytest.mark.parametrize("arity", [4, 8])
@pytest.mark.parametrize("npop", [4, 8])
class TestAdaptivePops:
    """Width-switched inner pops are a PURE schedule change: each visit
    runs at the narrowest power-of-two width covering the pending count
    instead of NULL-padding to npop, so the pushes (and their order) are
    identical and every output must match the fixed-width kernels bit for
    bit."""

    def test_bit_identical_to_fixed(self, packed_scene, rays, arity, npop):
        flat, tv = packed_scene
        packer = {4: pallas_trace.pack_bvh4, 8: pallas_trace.pack_bvh8}[arity]
        packed = packer(flat, tv)
        sd = pallas_trace.required_stack_depth(flat.depth, arity, npop=npop)
        o, d = rays
        c_f, o_f = _tracers(packed, sd, dual=True, npop=npop)
        c_a, o_a = _tracers(packed, sd, dual=True, npop=npop, adaptive=True)
        h_f, h_a = c_f(o, d), c_a(o, d)
        assert np.array_equal(np.asarray(h_f.t), np.asarray(h_a.t))
        assert np.array_equal(np.asarray(h_f.idx), np.asarray(h_a.idx))
        m2 = jnp.full(o.x.shape, 25.0, jnp.float32)
        assert np.array_equal(
            np.asarray(o_f(o, d, m2)), np.asarray(o_a(o, d, m2))
        )

    def test_mxu_bit_identical_to_fixed(self, packed_scene, rays, arity, npop):
        if arity != 4:
            pytest.skip("MXU leaf path packs at arity 4")
        flat, tv = packed_scene
        packed = pallas_trace.pack_bvh4(flat, tv)
        sc = synthetic_scene(2000, seed=3)
        attr = pallas_trace.pack_attr(
            flat, sc.mat_idx, sc.mats_kd, sc.mats_ks, sc.mats_kr
        )
        sd = pallas_trace.required_stack_depth(flat.depth, 4, npop=npop)
        o, d = rays
        pd = (
            jnp.asarray(packed.cbox), jnp.asarray(packed.cmeta),
            jnp.asarray(packed.tri), jnp.asarray(attr),
            _interleave_cmat(packed.cmat),
        )
        c_f, o_f = pallas_trace.make_tracer(
            pd, 8, interpret=True, stack_depth=sd, dual=True, npop=npop
        )
        c_a, o_a = pallas_trace.make_tracer(
            pd, 8, interpret=True, stack_depth=sd, dual=True, npop=npop,
            adaptive=True,
        )
        h_f, h_a = c_f(o, d), c_a(o, d)
        assert np.array_equal(np.asarray(h_f.t), np.asarray(h_a.t))
        assert np.array_equal(np.asarray(h_f.idx), np.asarray(h_a.idx))
        m2 = jnp.full(o.x.shape, 25.0, jnp.float32)
        assert np.array_equal(
            np.asarray(o_f(o, d, m2)), np.asarray(o_a(o, d, m2))
        )


def test_adaptive_fused_frame_matches_fixed():
    """Whole pipeline: the adaptive production config renders the same
    fused image as the fixed-width schedule (the adopted default flips
    adaptive_pop on and drops the npop0 primary split, both of which are
    image-identical schedule changes)."""
    from parallel_ray_tracer_tpu import pipeline
    from parallel_ray_tracer_tpu.config import RenderConfig

    base = dict(width=64, height=48, scene="car_only", bounces=2,
                bvh_heuristic=6, tile_rows=16, tile_cols=64,
                use_native=False)
    cfg_f = RenderConfig(adaptive_pop=False, **base)
    cfg_a = RenderConfig(adaptive_pop=True, **base)
    pipe_f = pipeline.prepare(cfg_f)
    pipe_a = pipeline.prepare(cfg_a)
    assert pipe_f.resolved_variant() == "fused"
    assert not pipe_f.adaptive and pipe_f.npop0 == 2
    assert pipe_a.adaptive and pipe_a.npop0 == 0
    img_f = np.asarray(pipe_f.render(interpret=True))
    img_a = np.asarray(pipe_a.render(interpret=True))
    # Hits are bit-identical (TestAdaptivePops); at the whole-frame level
    # the CPU backend's XLA fuses the differing control-flow graphs with
    # different FMA contraction in the shading math, so allow 1 ulp on a
    # small fraction of pixels (on the TPU backend the frames are equal).
    d = np.abs(img_f - img_a)
    assert d.max() <= 1.5e-7, d.max()
    assert (d > 0).mean() < 0.02


class TestPackedLaneCmi:
    """pack_cmi4: four groups' C-matrices per 128-lane row (2 KB/group
    instead of 8 — the layout that fits dragon-class tables resident).
    The kernels select the layout by STATIC lane width; results must be
    bit-identical to the standard (rows, 32) interleave. Auto-selection
    is off (measured neutral on dragon, DESIGN 9b) but the format is a
    supported input."""

    def test_bit_identical_to_standard_interleave(self, packed_scene, rays):
        flat, tv = packed_scene
        packed = pallas_trace.pack_bvh4(flat, tv)
        cm = jnp.asarray(packed.cmat)
        cmh = cm.astype(jnp.bfloat16)
        cml = (cm - cmh.astype(jnp.float32)).astype(jnp.bfloat16)
        cmi = jnp.concatenate([cmh, cml], axis=1)
        cmi4 = jnp.asarray(pallas_trace.pack_cmi4(packed.cmat, 8))
        assert cmi4.shape[1] == 128
        sd = pallas_trace.required_stack_depth(flat.depth, 4, npop=8)
        pd = (jnp.asarray(packed.cbox), jnp.asarray(packed.cmeta),
              jnp.asarray(packed.tri))
        o, d = rays
        o2 = Vec3(*(p.reshape(8, 128) for p in o))
        d2 = Vec3(*(p.reshape(8, 128) for p in d))
        kw = dict(leaf_size=8, stack_depth=sd, dual=True, npop=8,
                  adaptive=True, interpret=True)
        h_s = pallas_trace.closest_tiles(*pd, o2, d2, cmat=cmi, **kw)
        h_p = pallas_trace.closest_tiles(*pd, o2, d2, cmat=cmi4, **kw)
        np.testing.assert_array_equal(np.asarray(h_s.t), np.asarray(h_p.t))
        np.testing.assert_array_equal(np.asarray(h_s.idx),
                                      np.asarray(h_p.idx))
        m2 = jnp.full((8, 128), 25.0)
        b_s = pallas_trace.occluded_tiles(*pd, o2, d2, m2, cmat=cmi, **kw)
        b_p = pallas_trace.occluded_tiles(*pd, o2, d2, m2, cmat=cmi4, **kw)
        np.testing.assert_array_equal(np.asarray(b_s), np.asarray(b_p))


def test_occluded_unsorted_pushes_identical(packed_scene, rays):
    """occluded_tiles(sort=False): any-hit results are push-order-
    independent, so skipping the per-node sort network must not change
    a single blocked bit (the knob exists for forward-shadow workloads;
    measured numbers in metrics/bench_occl_nosort.json / DESIGN 9b)."""
    flat, tv = packed_scene
    packed = pallas_trace.pack_bvh4(flat, tv)
    sd = pallas_trace.required_stack_depth(flat.depth, 4, npop=8)
    pd = (jnp.asarray(packed.cbox), jnp.asarray(packed.cmeta),
          jnp.asarray(packed.tri))
    o, d = rays
    o2 = Vec3(*(p.reshape(8, 128) for p in o))
    d2 = Vec3(*(p.reshape(8, 128) for p in d))
    m2 = jnp.full((8, 128), 25.0)
    kw = dict(leaf_size=8, stack_depth=sd, dual=True, npop=8,
              adaptive=True, interpret=True)
    b_sorted = pallas_trace.occluded_tiles(*pd, o2, d2, m2, sort=True, **kw)
    b_nosort = pallas_trace.occluded_tiles(*pd, o2, d2, m2, sort=False, **kw)
    np.testing.assert_array_equal(np.asarray(b_sorted),
                                  np.asarray(b_nosort))


@pytest.mark.parametrize("npop,adaptive", [(2, False), (8, True)])
def test_smem_meta_mirror_identical(packed_scene, rays, npop, adaptive):
    """The SMEM meta mirror (child entries + validity as scalar loads
    instead of VMEM lane extracts — round 5, -0.8% frame / +1.8% dragon) is
    a pure mechanism change: hits and occlusion must be bit-identical
    with the mirror on and off, at both the dual-pop and the production
    adaptive wide-pop schedules."""
    flat, tv = packed_scene
    packed = pallas_trace.pack_bvh4(flat, tv)
    sd = pallas_trace.required_stack_depth(flat.depth, 4, npop=npop)
    pd = (jnp.asarray(packed.cbox), jnp.asarray(packed.cmeta),
          jnp.asarray(packed.tri))
    o, d = rays
    o2 = Vec3(*(p.reshape(8, 128) for p in o))
    d2 = Vec3(*(p.reshape(8, 128) for p in d))
    kw = dict(leaf_size=8, stack_depth=sd, dual=True, npop=npop,
              adaptive=adaptive, interpret=True)
    h_v = pallas_trace.closest_tiles(*pd, o2, d2, smem_meta=False, **kw)
    h_s = pallas_trace.closest_tiles(*pd, o2, d2, smem_meta=True, **kw)
    np.testing.assert_array_equal(np.asarray(h_v.t), np.asarray(h_s.t))
    np.testing.assert_array_equal(np.asarray(h_v.idx), np.asarray(h_s.idx))
    m2 = jnp.full((8, 128), 25.0)
    b_v = pallas_trace.occluded_tiles(*pd, o2, d2, m2, smem_meta=False, **kw)
    b_s = pallas_trace.occluded_tiles(*pd, o2, d2, m2, smem_meta=True, **kw)
    np.testing.assert_array_equal(np.asarray(b_v), np.asarray(b_s))


def test_smem_meta_oversized_table_fails_loudly(packed_scene, rays):
    """Explicitly forcing smem_meta=True past the measured SMEM budget
    must fail with a named assertion (not an opaque Mosaic SMEM error
    deep in pallas_call) — round-5 self-review finding."""
    flat, tv = packed_scene
    packed = pallas_trace.pack_bvh4(flat, tv)
    sd = pallas_trace.required_stack_depth(flat.depth, 4)
    # Oversized fake meta table: same row layout, too many rows for SMEM.
    n_big = pallas_trace.SMEM_META_LIMIT_BYTES // (4 * 8) + 1024
    big_meta = jnp.zeros((n_big, 8), jnp.int32)
    o, d = rays
    o2 = Vec3(*(p.reshape(8, 128) for p in o))
    d2 = Vec3(*(p.reshape(8, 128) for p in d))
    with pytest.raises(AssertionError, match="SMEM_META_LIMIT_BYTES"):
        pallas_trace.closest_tiles(
            jnp.asarray(packed.cbox), big_meta, jnp.asarray(packed.tri),
            o2, d2, leaf_size=8, stack_depth=sd, dual=True,
            smem_meta=True, interpret=True,
        )
