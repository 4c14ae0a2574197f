"""Benchmark harness: prints ONE JSON line for the driver.

Primary metric (BASELINE.json): primary rays/s/chip at 1080p on the
dragon-class scene (falls back to car_boxed while the high-poly substitute
asset is absent; the reference's own dragon OBJ is LFS-stripped upstream,
.MISSING_LARGE_BLOBS). Protocol mirrors the reference GPU harness: warmup
launches, then timed iterations, statistics over the timed runs
(gpu/include/options.cuh:25-26, gpu/src/gpu.cu:104-116).

`vs_baseline` is measured against the first TPU number recorded for this
framework (37.0M primary rays/s on car_boxed @1080p, heuristic 6, L=8,
TPU v5e single chip) — the reference repo publishes no numbers to compare
against (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_RAYS_PER_S = 37.0e6


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from parallel_ray_tracer_tpu.config import RenderConfig
    from parallel_ray_tracer_tpu import pipeline
    from parallel_ray_tracer_tpu.models.camera import ray_basis
    from parallel_ray_tracer_tpu.ops import pallas_trace
    from parallel_ray_tracer_tpu.ops.render import generate_rays_tiled
    from parallel_ray_tracer_tpu.utils.stats import summarize

    on_tpu = jax.default_backend() == "tpu"
    scene_name = "dragon" if _have_scene("dragon") else "car_boxed"
    width, height = (1920, 1080) if on_tpu else (256, 128)
    warmup, iters = (5, 20) if on_tpu else (1, 3)

    cfg = RenderConfig(
        width=width, height=height, scene=scene_name, bvh_heuristic=6,
        tile_rows=32, tile_cols=32,
    )
    pipe = pipeline.prepare(cfg)

    cam_arrays = tuple(
        jnp.asarray(a) for a in ray_basis(pipe.camera(), width, height)
    )
    o, d = generate_rays_tiled(cam_arrays, width, height, 32, 32)
    if on_tpu:
        closest, _ = pallas_trace.make_tracer(pipe.packed_dev, pipe.leaf_size)
    else:
        from parallel_ray_tracer_tpu.ops import trace_bvh

        closest, _ = trace_bvh.make_tracer(
            pipe.dbvh, pipe.ds, pipe.leaf_size, pipe.stack_depth, packet=1024
        )

    n_rays = o.x.shape[0]
    for _ in range(warmup):
        jax.block_until_ready(closest(o, d))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(closest(o, d))
        times.append((time.perf_counter() - t0) * 1e3)
    stats = summarize(times)
    rays_per_s = n_rays / (stats["median_ms"] / 1e3)

    print(
        json.dumps(
            {
                "metric": f"primary_rays_per_s_{scene_name}_{width}x{height}",
                "value": rays_per_s,
                "unit": "rays/s/chip",
                "vs_baseline": rays_per_s / BASELINE_RAYS_PER_S,
            }
        )
    )


def _have_scene(name: str) -> bool:
    from parallel_ray_tracer_tpu.config import DEFAULT_ASSET_ROOTS

    return any(
        os.path.isfile(os.path.join(root, name, "triangles.obj"))
        for root in DEFAULT_ASSET_ROOTS
    )


if __name__ == "__main__":
    main()
