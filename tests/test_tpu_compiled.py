"""TPU-only checks of the COMPILED Pallas path (skipped on CPU, where the
suite covers the same code through the interpreter). Run on a TPU host:

    JAX_PLATFORMS=<tpu backend> python -m pytest tests/test_tpu_compiled.py
"""

import os

import numpy as np
import pytest
import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires a real TPU backend"
)

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "car_boxed_96x54_b4.npz")


def test_compiled_pallas_matches_golden():
    from parallel_ray_tracer_tpu.config import RenderConfig
    from parallel_ray_tracer_tpu import pipeline

    cfg = RenderConfig(
        width=96, height=54, scene="car_boxed", bounces=4,
        bvh_heuristic=6, tile_rows=32, tile_cols=32,
    )
    pipe = pipeline.prepare(cfg)
    img = np.asarray(pipe.render())
    golden = np.load(GOLDEN)["image"].astype(np.float32)
    # The MXU leaf path evaluates Möller-Trumbore in bf16x3 (f32-grade,
    # but not bit-equal): a handful of silhouette pixels may flip their
    # winning triangle vs the f32 golden. Exact semantics are covered by
    # the CPU suite; here allow <= 0.1% of channel values beyond atol.
    diff = np.abs(img - golden)
    frac = (diff > 2e-3).mean()
    assert frac <= 1e-3, f"{frac:.4%} of values beyond 2e-3"
    # A flipped winner lands on a different surface/shadow state, so its
    # color can differ substantially — bound it away from full scale.
    assert diff.max() < 0.5, diff.max()


def _small_packets():
    """A 512x256 car_boxed ray set + packed scene for kernel parity."""
    import jax.numpy as jnp
    from parallel_ray_tracer_tpu.config import RenderConfig
    from parallel_ray_tracer_tpu import pipeline
    from parallel_ray_tracer_tpu.models.camera import ray_basis
    from parallel_ray_tracer_tpu.ops.render import generate_rays_tiled
    from parallel_ray_tracer_tpu.ops.vecmath import Vec3

    W, H = 512, 256
    cfg = RenderConfig(width=W, height=H, scene="car_boxed", bounces=2,
                       bvh_heuristic=6, tile_rows=32, tile_cols=32,
                       mxu_leaf=True, true_sah=True)
    pipe = pipeline.prepare(cfg)
    cam = pipe.camera()
    base = tuple(jnp.asarray(a) for a in ray_basis(cam, W, H))
    o, d = generate_rays_tiled(base, W, H, 32, 32)
    rows = o.x.shape[0] // 128
    o2 = Vec3(*(p.reshape(rows, 128) for p in o))
    d2 = Vec3(*(p.reshape(rows, 128) for p in d))
    return pipe, o2, d2, rows


def test_combined_schedule_matches_standard():
    """combined=True (leaf+inner every iteration, NULL-padded) is
    bit-identical to the standard dual-pop schedule."""
    import jax.numpy as jnp
    from parallel_ray_tracer_tpu.ops import pallas_trace

    pipe, o2, d2, rows = _small_packets()
    cbox, cmeta, tri, attr, cmat = pipe.packed_dev[:5]
    kw = dict(leaf_size=8, stack_depth=pipe.pallas_stack_depth, dual=True,
              cmat=cmat)
    h_ref = pallas_trace.closest_tiles(cbox, cmeta, tri, o2, d2, npop=8, **kw)
    h_cmb = pallas_trace.closest_tiles(cbox, cmeta, tri, o2, d2, npop=8,
                                       combined=True, **kw)
    np.testing.assert_array_equal(np.asarray(h_ref.t), np.asarray(h_cmb.t))
    np.testing.assert_array_equal(np.asarray(h_ref.idx), np.asarray(h_cmb.idx))
    m2 = jnp.full((rows, 128), 100.0)
    b_ref = pallas_trace.occluded_tiles(cbox, cmeta, tri, o2, d2, m2,
                                        npop=8, **kw)
    b_cmb = pallas_trace.occluded_tiles(cbox, cmeta, tri, o2, d2, m2,
                                        npop=8, combined=True, nleaf=6, **kw)
    np.testing.assert_array_equal(np.asarray(b_ref), np.asarray(b_cmb))


def test_paired_occluded_matches_standard():
    """paired=True (two packets per kernel instance) is bit-identical."""
    import jax.numpy as jnp
    from parallel_ray_tracer_tpu.ops import pallas_trace

    pipe, o2, d2, rows = _small_packets()
    cbox, cmeta, tri, attr, cmat = pipe.packed_dev[:5]
    kw = dict(leaf_size=8, stack_depth=pipe.pallas_stack_depth, dual=True,
              cmat=cmat)
    m2 = jnp.full((rows, 128), 100.0)
    b_ref = pallas_trace.occluded_tiles(cbox, cmeta, tri, o2, d2, m2,
                                        npop=8, **kw)
    b_pair = pallas_trace.occluded_tiles(cbox, cmeta, tri, o2, d2, m2,
                                         npop=8, paired=True, **kw)
    np.testing.assert_array_equal(np.asarray(b_ref), np.asarray(b_pair))


def test_per_bounce_pop_frame_matches_uniform():
    """The fused frame kernel's unrolled bounce-0 pop width (npop0) does
    not change the image."""
    import jax.numpy as jnp
    from parallel_ray_tracer_tpu.ops import pallas_trace

    pipe, o2, d2, rows = _small_packets()
    cbox, cmeta, tri, attr, cmat = pipe.packed_dev[:5]
    lamb = pallas_trace.pack_lights(pipe.ds)
    kw = dict(bounces=4, leaf_size=8, stack_depth=pipe.pallas_stack_depth,
              cmat=cmat)
    ref = pallas_trace.frame_tiles(cbox, cmeta, tri, attr, lamb, o2, d2,
                                   npop=8, **kw)
    per = pallas_trace.frame_tiles(cbox, cmeta, tri, attr, lamb, o2, d2,
                                   npop=8, npop0=2, **kw)
    np.testing.assert_allclose(np.asarray(ref.x), np.asarray(per.x),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ref.y), np.asarray(per.y),
                               atol=1e-6)
