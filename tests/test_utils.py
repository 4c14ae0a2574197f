"""Utility-layer coverage: stats banner, profiling helpers, distributed
no-op init, package exports."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from parallel_ray_tracer_tpu.utils.stats import Z_99, format_summary, summarize
from parallel_ray_tracer_tpu.utils import profiling
from parallel_ray_tracer_tpu.parallel import distributed


class TestStats:
    def test_summary_math(self):
        # Population stddev + z=2.5758 CI (cpu/src/main.c:45-88 semantics).
        times = [10.0, 12.0, 14.0]
        s = summarize(times)
        assert s["mean_ms"] == 12.0 and s["median_ms"] == 12.0
        assert abs(s["stddev_ms"] - math.sqrt(8.0 / 3.0)) < 1e-9
        assert abs(s["ci99_ms"] - Z_99 * s["stddev_ms"] / math.sqrt(3)) < 1e-9
        assert abs(s["fps"] - 1000.0 / 12.0) < 1e-9

    def test_banner_formats(self):
        s = summarize([5.0] * 40)
        out = format_summary(s)
        assert "99" in out and "FPS" in out  # CI line shown for >=30 iters
        s2 = summarize([5.0])
        assert "mean" in format_summary(s2)


class TestProfiling:
    def test_timed_fences(self):
        out, secs = profiling.timed(lambda: jnp.arange(8.0) * 2)
        assert secs >= 0 and float(np.asarray(out)[-1]) == 14.0

    def test_annotate_context(self):
        with profiling.annotate("test-span"):
            _ = jnp.ones(4) + 1


class TestDistributed:
    def test_initialize_single_process_noop(self):
        distributed.initialize()  # must not raise on single-host
        assert distributed.is_primary()


class TestPackageApi:
    def test_exports(self):
        import parallel_ray_tracer_tpu as prt

        assert hasattr(prt, "RenderConfig")
        assert hasattr(prt, "prepare")
        assert prt.__version__
