"""Large-scene streaming benchmark: the reference's synthetic scaling axis
(cpu/src/main.c:115-131) taken past the VMEM ceiling.

Builds synthetic random-triangle scenes of growing size, measures the
primary closest-hit pass (chained methodology) with the resident kernels
where they fit and the HBM-streaming kernels beyond, and records where
the rays/s cliff lands. Writes metrics/bench_stream.json.
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

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from parallel_ray_tracer_tpu import pipeline
from parallel_ray_tracer_tpu.config import RenderConfig
from parallel_ray_tracer_tpu.models.camera import ray_basis
from parallel_ray_tracer_tpu.ops import pallas_trace
from parallel_ray_tracer_tpu.ops.render import generate_rays_tiled
from parallel_ray_tracer_tpu.ops.vecmath import Vec3

W, H = 1920, 1080


def marginal_ms(fn, k_lo=2, k_hi=6, reps=3):
    def timed(k):
        float(fn(k))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(k))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(k_lo), timed(k_hi)
    return (t_hi - t_lo) / (k_hi - k_lo) * 1e3


def main():
    report = {}
    for n_tris in (100_000, 300_000, 1_000_000):
        cfg = RenderConfig(
            width=W, height=H, synthetic_triangles=n_tris, bvh_heuristic=6,
            tile_rows=32, tile_cols=32,
        )
        pipe = pipeline.prepare(cfg)
        cbox, cmeta, tri, attr = pipe.packed_dev
        leaf = pipe.leaf_size
        sdepth = pipe.pallas_stack_depth
        cam_arrays = tuple(
            jnp.asarray(a) for a in ray_basis(pipe.camera(), W, H)
        )
        o, d = generate_rays_tiled(cam_arrays, W, H, 32, 32)
        n_rays = o.x.shape[0]
        rows = n_rays // 128
        o2 = Vec3(*(p.reshape(rows, 128) for p in o))
        d2 = Vec3(*(p.reshape(rows, 128) for p in d))

        @functools.partial(jax.jit, static_argnames=("k", "stream"))
        def chain(ox0, k: int, stream: bool):
            def body(i, ox):
                h = pallas_trace.closest_tiles(
                    cbox, cmeta, tri, Vec3(ox, o2.y, o2.z), d2,
                    leaf_size=leaf, stack_depth=sdepth, dual=True,
                    stream=stream,
                )
                return ox + jnp.where(h.t < 1.0, h.t, 0.0) * 1e-12
            return jnp.sum(jax.lax.fori_loop(0, k, body, ox0))

        key = f"{n_tris}"
        report[key] = {"stream_auto": pipe.stream}
        modes = ["stream"] if pipe.stream else ["resident", "stream"]
        for mode in modes:
            ms = marginal_ms(
                lambda k: chain(o2.x, k, mode == "stream")
            )
            report[key][f"closest_{mode}_ms"] = ms
            report[key][f"rays_per_s_{mode}"] = n_rays / (ms / 1e3)
            print(n_tris, mode, f"{ms:.2f} ms", flush=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metrics", "bench_stream.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
