"""Benchmark harness: prints ONE JSON line for the driver.

Primary metric (BASELINE.json): primary rays/s/chip at 1080p on the
dragon-class scene (procedural substitute — the reference's dragon OBJ is
LFS-stripped upstream) with car_boxed as the cross-check workload.

Methodology: the remote-TPU tunnel adds per-call dispatch overhead, caches
identical dispatches, and its async completion makes naive wall-clock loops
unreliable in both directions. The only airtight measurement is to chain k
traversals data-dependently inside ONE jit (iteration i's ray origins
depend on iteration i-1's hit distances, so nothing can be cached,
overlapped, or eliminated) and take the marginal cost
(T(k_hi) - T(k_lo)) / (k_hi - k_lo), which cancels the per-dispatch
overhead — the reference's warmup + cudaEvent protocol
(gpu/src/gpu.cu:104-116) adapted to a remote-dispatch environment. A local
persistent compilation cache (persisted in .jax_cache by warmup runs)
keeps the chained programs' XLA compiles out of the timed budget.

`vs_baseline`: ratio against the first honest TPU v5e number recorded for
this framework (95M primary rays/s, car_boxed @1080p, heuristic 6, L=8,
32x32 tiles). The reference repo publishes no numbers (BASELINE.md).
"""

from __future__ import annotations

import functools
import json
import time

BASELINE_RAYS_PER_S = 79.2e6  # round-1 dragon number (this framework)


def main() -> None:
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    import jax.numpy as jnp

    from parallel_ray_tracer_tpu.config import RenderConfig
    from parallel_ray_tracer_tpu import pipeline
    from parallel_ray_tracer_tpu.models.camera import ray_basis
    from parallel_ray_tracer_tpu.ops import pallas_trace, trace_bvh
    from parallel_ray_tracer_tpu.ops.render import generate_rays_tiled
    from parallel_ray_tracer_tpu.ops.vecmath import Vec3

    on_tpu = jax.default_backend() == "tpu"
    scene_name = "dragon"
    width, height = (1920, 1080) if on_tpu else (256, 128)
    k_lo, k_hi = (2, 8) if on_tpu else (1, 2)

    cfg = RenderConfig(
        width=width, height=height, scene=scene_name, bvh_heuristic=6,
        tile_rows=32, tile_cols=32,
    )
    try:
        pipe = pipeline.prepare(cfg)
    except Exception:
        scene_name = "car_boxed"
        cfg = RenderConfig(
            width=width, height=height, scene=scene_name, bvh_heuristic=6,
            tile_rows=32, tile_cols=32,
        )
        pipe = pipeline.prepare(cfg)

    cam_arrays = tuple(
        jnp.asarray(a) for a in ray_basis(pipe.camera(), width, height)
    )
    o, d = generate_rays_tiled(cam_arrays, width, height, 32, 32)
    n_rays = o.x.shape[0]
    rows = n_rays // 128

    o2 = Vec3(*(p.reshape(rows, 128) for p in o))
    d2 = Vec3(*(p.reshape(rows, 128) for p in d))

    if on_tpu:
        cbox, cmeta, tri = pipe.packed_dev[:3]

        def one(ox):
            return pallas_trace.closest_tiles(
                cbox, cmeta, tri, Vec3(ox, o2.y, o2.z), d2,
                leaf_size=pipe.leaf_size,
            )
    else:
        dbvh = pipe.dbvh
        ds = pipe.ds

        def one(ox):
            closest, _ = trace_bvh.make_tracer(
                dbvh, ds, pipe.leaf_size, pipe.stack_depth, packet=1024
            )
            o_f = Vec3(ox.reshape(-1), o2.y.reshape(-1), o2.z.reshape(-1))
            d_f = Vec3(*(p.reshape(-1) for p in d2))
            h = closest(o_f, d_f)
            return h._replace(t=h.t.reshape(rows, 128))

    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(ox0, k: int):
        def body(i, ox):
            h = one(ox)
            # Bounded data dependence defeats dispatch caching/overlap.
            return ox + jnp.where(h.t < 1.0, h.t, 0.0) * 1e-12

        return jax.lax.fori_loop(0, k, body, ox0)

    def timed(k: int) -> float:
        jax.block_until_ready(chained(o2.x, k))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(chained(o2.x, k))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(k_lo), timed(k_hi)
    per_traversal_s = max((t_hi - t_lo) / (k_hi - k_lo), 1e-9)
    rays_per_s = n_rays / per_traversal_s

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


if __name__ == "__main__":
    main()
