"""TPU gradient-step benchmark: differentiable render through the
PRODUCTION Pallas tracer (VERDICT round-1 item 5's missing number).

Times one sharded SGD step (value_and_grad of the masked L2 loss over a
car_boxed render) with the chained-marginal methodology, for the pallas
and brute tracer variants. Writes metrics/bench_train.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from parallel_ray_tracer_tpu import pipeline
from parallel_ray_tracer_tpu.config import RenderConfig
from parallel_ray_tracer_tpu.parallel import sharded

BOUNCES = 2
# brute's VJP materializes O(rays x tris) intermediates; keep it tiny.
SIZES = {"pallas": 512, "brute": 128}


def main():
    mesh = sharded.make_mesh(1)
    report = {"sizes": SIZES, "bounces": BOUNCES}

    for variant in ("pallas", "brute"):
        W = H = SIZES[variant]
        cfg = RenderConfig(
            width=W, height=H, scene="car_boxed", bvh_heuristic=6,
            tile_rows=32, tile_cols=32,
        )
        pipe = pipeline.prepare(cfg)
        kwargs = {}
        if variant == "pallas":
            kwargs = dict(
                tracer_data=pipe.packed_dev, leaf_size=pipe.leaf_size,
                stack_depth=pipe.pallas_stack_depth,
                slot_map=pipe.flat.slot_map,
            )
        step, prep = sharded.make_train_step(
            pipe.scene, mesh, W, H, bounces=BOUNCES, lr=1e-4,
            variant=variant, **kwargs,
        )
        v, o_t, d_t, target = prep()

        @functools.partial(jax.jit, static_argnames=("k",))
        def multi(v0, k: int):
            def body(v, _):
                v, loss = step(v, o_t, d_t, target)
                return v, loss

            v1, losses = jax.lax.scan(body, v0, None, length=k)
            return losses[-1] + jnp.sum(v1) * 1e-20

        rep = [0]

        def call(k):
            # Per-call input jitter defeats remote dispatch-result caching.
            rep[0] += 1
            return float(multi(v + rep[0] * 1e-9, k))

        def timed(k):
            call(k)   # warm/compile, fence on fetched scalar
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                call(k)
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo, t_hi = timed(1), timed(4)
        per_step_ms = (t_hi - t_lo) / 3 * 1e3
        report[f"{variant}_step_ms"] = per_step_ms
        report[f"{variant}_size"] = W
        print(f"{variant} {W}x{H}: {per_step_ms:.1f} ms/step", flush=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metrics", "bench_train.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
