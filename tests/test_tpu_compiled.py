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
    np.testing.assert_allclose(img, golden, atol=2e-3)
