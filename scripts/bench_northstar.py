"""North-star configuration benchmarks (BASELINE.json capability list).

Runs the five benchmark configurations through the PRODUCTION frame
formulation (fused whole-frame kernel, per-bounce pop schedule, MXU
leaves, reversed shadow packets) with the chained-marginal methodology,
and writes metrics/bench_northstar.json for the BENCHMARKS.md table.

Scenes with LFS-stripped reference geometry (dragon, two_cars,
sportscar) use the committed procgen substitutes, exactly as the rest of
the framework does (models/procgen.py).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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

# (scene, width, height, bounces) — BASELINE.json's five configurations.
CONFIGS = [
    ("car_only", 256, 256, 1),
    ("car_boxed", 512, 512, 2),
    ("dragon", 1920, 1080, 2),
    ("two_cars", 1920, 1080, 4),
    ("sportscar", 3840, 2160, 4),
]


def marginal_ms(fn, k_lo=2, k_hi=10, reps=3):
    def timed(k):
        float(fn(k))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(k))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(k_lo), timed(k_hi)
    return max((t_hi - t_lo) / (k_hi - k_lo) * 1e3, 1e-6)


def bench_config(scene: str, W: int, H: int, bounces: int) -> dict:
    cfg = RenderConfig(
        width=W, height=H, scene=scene, bounces=bounces,
        bvh_heuristic=6, tile_rows=32, tile_cols=32,
    )
    pipe = pipeline.prepare(cfg)
    packed, leaf = pipe.packed_dev, pipe.leaf_size
    sdepth = pipe.pallas_stack_depth
    lamb = pallas_trace.pack_lights(pipe.ds)
    origin, dir00, inc_x, inc_y = (
        jnp.asarray(a) for a in ray_basis(pipe.camera(), W, H)
    )

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(eps0, k: int):
        def body(i, eps):
            o, d = generate_rays_tiled(
                (origin + eps, dir00, inc_x, inc_y), W, H, 32, 32
            )
            R = o.x.shape[0]
            col = pallas_trace.frame_tiles(
                *packed[:4], lamb, o.reshape(R // 128, 128),
                d.reshape(R // 128, 128), bounces=bounces,
                leaf_size=leaf, stack_depth=sdepth,
                cmat=packed[4] if len(packed) >= 5 else None,
                npop=pipe.npop, npop0=pipe.npop0,
                adaptive=pipe.adaptive,
            )
            return eps + jnp.sum(col.x) * 1e-18

        return jax.lax.fori_loop(0, k, body, eps0)

    ms = marginal_ms(lambda k, j: chain(j, k))
    return {
        "scene": scene, "width": W, "height": H, "bounces": bounces,
        "n_tris": pipe.scene.num_triangles,
        "n_lights": int(pipe.scene.lights_pos.shape[0]),
        "frame_ms": ms,
    }


def main():
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        print("WARNING: not on TPU; timings are not meaningful", flush=True)
    results = []
    for scene, W, H, bounces in CONFIGS:
        r = bench_config(scene, W, H, bounces)
        results.append(r)
        print(
            f"{scene} {W}x{H} b{bounces}: {r['frame_ms']:.1f} ms "
            f"({r['n_tris']} tris)",
            flush=True,
        )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metrics", "bench_northstar.json",
    )
    with open(out, "w") as f:
        json.dump({"on_tpu": on_tpu, "results": results}, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
