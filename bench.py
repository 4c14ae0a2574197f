"""Benchmark harness: prints ONE JSON line for the driver.

Primary metric: the reference's OWN default benchmark workload — car_boxed,
1920x1080, 4 bounces (cpu/include/options.h:6-7,34 in /root/reference) —
rendered end-to-end through the production path (native C++ build, BVH4
dual-pop Pallas kernels). `vs_baseline` is the speedup over the measured
best parallel-CPU frame time of the unmodified reference renderer on this
host (2,031 ms at its best thread count; full sweep in BASELINE.md), so
>1.0 means this framework beats the reference's parallel renderer.

Secondary fields in the same JSON object: primary rays/s on the
dragon-class scene (the BASELINE.json north-star metric; round-1 opening
number was 79.2M rays/s/chip) and the fused whole-frame-kernel time.

Methodology: the remote-TPU tunnel adds per-call dispatch overhead, caches
identical dispatches, and its async completion makes naive wall-clock loops
unreliable in both directions. The only airtight measurement is to chain k
frames/traversals data-dependently inside ONE jit (iteration i's rays
depend on iteration i-1's output, so nothing can be cached, overlapped, or
eliminated) and take the marginal cost (T(k_hi) - T(k_lo)) / (k_hi - k_lo)
— the reference's warmup + cudaEvent protocol (gpu/src/gpu.cu:104-116)
adapted to a remote-dispatch environment. A local persistent compilation
cache (.jax_cache) keeps the chained programs' XLA compiles out of the
timed budget.
"""

from __future__ import annotations

import functools
import json
import time

# Measured on this host: unmodified reference cpu/ renderer, its own
# makefile flags, best of 1..63 threads (4 physical cores) on the default
# workload. See BASELINE.md for the full thread sweep.
REFERENCE_PARALLEL_CPU_MS = 2031.0
ROUND1_RAYS_PER_S = 79.2e6  # first honest TPU number (dragon, round 1)


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
    from parallel_ray_tracer_tpu.ops.shade import trace_rays
    from parallel_ray_tracer_tpu.ops.vecmath import Vec3

    on_tpu = jax.default_backend() == "tpu"
    width, height = (1920, 1080) if on_tpu else (256, 128)
    bounces = 4

    # Shared jittered chained-marginal helper (scripts/_timing.py): every
    # timed dispatch carries a fresh input jitter because the tunnel's
    # dispatch cache keys on (program, inputs) and SURVIVES process
    # restarts (docs/DESIGN.md section 9).
    sys_path_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts"
    )
    import sys

    if sys_path_dir not in sys.path:
        sys.path.insert(0, sys_path_dir)
    from _timing import marginal_s

    # ---- primary: full frame on the reference's default workload ----
    cfg = RenderConfig(
        width=width, height=height, scene="car_boxed", bounces=bounces,
        bvh_heuristic=6, tile_rows=32, tile_cols=32,
    )
    pipe = pipeline.prepare(cfg)
    ds = pipe.ds
    origin, dir00, inc_x, inc_y = (
        jnp.asarray(a) for a in ray_basis(pipe.camera(), width, height)
    )

    if on_tpu:
        packed, leaf = pipe.packed_dev, pipe.leaf_size
        sdepth = pipe.pallas_stack_depth
        lamb = pallas_trace.pack_lights(ds)

        # The production frame formulation: the fused whole-frame kernel
        # (entire bounce loop in one Pallas launch per packet), adaptive
        # width-switched pops up to npop=8, MXU leaf evaluation.
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain_frame(eps0, k: int):
            def body(i, eps):
                o, d = generate_rays_tiled(
                    (origin + eps, dir00, inc_x, inc_y), width, height, 32, 32
                )
                R = o.x.shape[0]
                o2 = o.reshape(R // 128, 128)
                d2 = d.reshape(R // 128, 128)
                col = pallas_trace.frame_tiles(
                    *packed[:4], lamb, o2, d2, bounces=bounces,
                    leaf_size=leaf, stack_depth=sdepth,
                    cmat=packed[4] if len(packed) >= 5 else None,
                    npop=pipe.npop, npop0=pipe.npop0,
                    adaptive=pipe.adaptive,
                )
                return eps + jnp.sum(col.x) * 1e-18

            return jax.lax.fori_loop(0, k, body, eps0)

        frame_ms = marginal_s(
            lambda k, j: chain_frame(j, k), 1, 3
        ) * 1e3
    else:
        # CPU fallback: tiny jax-variant frame, so the driver's smoke run
        # completes; the number is not meaningful off-TPU.
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain_frame(eps0, k: int):
            def body(i, eps):
                o, d = generate_rays_tiled(
                    (origin + eps, dir00, inc_x, inc_y), width, height, 32, 32
                )
                closest_fn, occluded_fn = trace_bvh.make_tracer(
                    pipe.dbvh, ds, pipe.leaf_size, pipe.stack_depth,
                    packet=1024,
                )
                col = trace_rays(ds, closest_fn, occluded_fn, o, d, bounces)
                return eps + jnp.sum(col.x) * 1e-18

            return jax.lax.fori_loop(0, k, body, eps0)

        frame_ms = marginal_s(
            lambda k, j: chain_frame(j, k), 1, 2, reps=1
        ) * 1e3

    # ---- secondary: primary rays/s on the dragon-class scene ----
    rays_per_s = None
    try:
        dcfg = RenderConfig(
            width=width, height=height, scene="dragon", bvh_heuristic=6,
            tile_rows=32, tile_cols=32,
        )
        dpipe = pipeline.prepare(dcfg)
        do, dd = generate_rays_tiled(
            tuple(
                jnp.asarray(a)
                for a in ray_basis(dpipe.camera(), width, height)
            ),
            width, height, 32, 32,
        )
        n_rays = do.x.shape[0]
        rows = n_rays // 128
        o2 = Vec3(*(p.reshape(rows, 128) for p in do))
        d2 = Vec3(*(p.reshape(rows, 128) for p in dd))

        if on_tpu:
            cbox, cmeta, tri = dpipe.packed_dev[:3]
            dcmat = (
                dpipe.packed_dev[4] if len(dpipe.packed_dev) >= 5 else None
            )

            def one(ox):
                # Production traversal schedule: adaptive wide pops
                # (npop=8 ceiling; measured 168.8M vs 149.7M rays/s at
                # the old fixed npop=2 on this divergent scene).
                return pallas_trace.closest_tiles(
                    cbox, cmeta, tri, Vec3(ox, o2.y, o2.z), d2,
                    leaf_size=dpipe.leaf_size,
                    stack_depth=dpipe.pallas_stack_depth, dual=True,
                    cmat=dcmat, npop=dpipe.npop, adaptive=dpipe.adaptive,
                )
        else:
            def one(ox):
                closest, _ = trace_bvh.make_tracer(
                    dpipe.dbvh, dpipe.ds, dpipe.leaf_size,
                    dpipe.stack_depth, packet=1024,
                )
                o_f = Vec3(ox.reshape(-1), o2.y.reshape(-1), o2.z.reshape(-1))
                d_f = Vec3(*(p.reshape(-1) for p in d2))
                h = closest(o_f, d_f)
                return h._replace(t=h.t.reshape(rows, 128))

        @functools.partial(jax.jit, static_argnames=("k",))
        def chained(ox0, k: int):
            def body(i, ox):
                h = one(ox)
                return ox + jnp.where(h.t < 1.0, h.t, 0.0) * 1e-12

            return jax.lax.fori_loop(0, k, body, ox0)

        k_lo, k_hi = (2, 8) if on_tpu else (1, 2)
        per_traversal_s = marginal_s(
            lambda k, j: chained(o2.x + j, k), k_lo, k_hi,
            reps=3 if on_tpu else 1,
        )
        rays_per_s = n_rays / per_traversal_s
    except Exception:
        pass

    out = {
        "metric": f"frame_ms_car_boxed_{width}x{height}_b{bounces}",
        "value": frame_ms,
        "unit": "ms",
        "vs_baseline": REFERENCE_PARALLEL_CPU_MS / frame_ms,
        "baseline": "reference cpu renderer, best of 1-63 threads on this "
                    "host (2031 ms, BASELINE.md)",
    }
    if rays_per_s is not None:
        out["primary_rays_per_s_dragon"] = rays_per_s
        out["rays_vs_round1"] = rays_per_s / ROUND1_RAYS_PER_S
    print(json.dumps(out))


if __name__ == "__main__":
    main()
