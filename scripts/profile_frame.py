"""Decompose the full-frame cost on the real TPU (VERDICT round-1 item 1).

Times, with the chained-in-one-jit marginal methodology (see bench.py),
for car_boxed @1080p with the production BVH4 pallas kernels:

  1. plain closest-hit pass on primary rays        (the bench.py kernel)
  2. attribute-tracking closest pass (HitFull)     (what the frame runs)
  3. any-hit shadow pass on primary-hit points     (what the frame runs)
  4. full frames at bounces = 1..4, lights on
  5. full frames at bounces = 1, 4, lights off     (isolates shadow cost)

From these: per-bounce marginal cost, shadow share, and the XLA-glue
remainder. Writes a JSON report to metrics/profile_frame.json and prints
a table.
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
from parallel_ray_tracer_tpu.ops.shade import trace_rays
from parallel_ray_tracer_tpu.ops.vecmath import Vec3

W, H = 1920, 1080
TR = TC = 32


def marginal_ms(fn, k_lo=2, k_hi=6, reps=3):
    """fn(k) must run k data-chained copies and return a scalar."""
    def timed(k):
        float(fn(k))  # compile + warm + fence on a fetched scalar
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(k))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(k_lo), timed(k_hi)
    return (t_hi - t_lo) / (k_hi - k_lo) * 1e3


def main():
    cfg = RenderConfig(
        width=W, height=H, scene="car_boxed", bvh_heuristic=6,
        tile_rows=TR, tile_cols=TC,
    )
    pipe = pipeline.prepare(cfg)
    ds = pipe.ds
    packed = pipe.packed_dev
    leaf = pipe.leaf_size
    sdepth = pipe.pallas_stack_depth
    cam_arrays = tuple(
        jnp.asarray(a) for a in ray_basis(pipe.camera(), W, H)
    )
    o, d = generate_rays_tiled(cam_arrays, W, H, TR, TC)
    n_rays = o.x.shape[0]
    rows = n_rays // 128
    o2 = Vec3(*(p.reshape(rows, 128) for p in o))
    d2 = Vec3(*(p.reshape(rows, 128) for p in d))
    cbox, cmeta, tri, attr = packed

    report = {"n_rays": int(n_rays)}

    # --- 1. plain closest chain -------------------------------------------
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain_closest(ox0, k: int):
        def body(i, ox):
            h = pallas_trace.closest_tiles(
                cbox, cmeta, tri, Vec3(ox, o2.y, o2.z), d2,
                leaf_size=leaf, stack_depth=sdepth, dual=True,
            )
            return ox + jnp.where(h.t < 1.0, h.t, 0.0) * 1e-12
        return jnp.sum(jax.lax.fori_loop(0, k, body, ox0))

    report["closest_plain_ms"] = marginal_ms(lambda k: chain_closest(o2.x, k))
    print("closest_plain_ms", report["closest_plain_ms"], flush=True)

    # --- 2. attribute-tracking closest chain ------------------------------
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain_closest_full(ox0, k: int):
        def body(i, ox):
            h = pallas_trace.closest_tiles_full(
                cbox, cmeta, tri, attr, Vec3(ox, o2.y, o2.z), d2,
                leaf_size=leaf, stack_depth=sdepth, dual=True,
            )
            return ox + jnp.where(h.t < 1.0, h.t, 0.0) * 1e-12
        return jnp.sum(jax.lax.fori_loop(0, k, body, ox0))

    report["closest_attr_ms"] = marginal_ms(lambda k: chain_closest_full(o2.x, k))
    print("closest_attr_ms", report["closest_attr_ms"], flush=True)

    # --- 3. any-hit chain on primary-hit shadow rays ----------------------
    h0 = pallas_trace.closest_tiles(
        cbox, cmeta, tri, o2, d2, leaf_size=leaf, stack_depth=sdepth,
        dual=True,
    )
    t_safe = jnp.where(h0.idx >= 0, h0.t, 1.0)
    p = Vec3(o2.x + d2.x * t_safe, o2.y + d2.y * t_safe, o2.z + d2.z * t_safe)
    lp = Vec3(
        jnp.broadcast_to(ds.lights_pos.x[0], p.x.shape),
        jnp.broadcast_to(ds.lights_pos.y[0], p.x.shape),
        jnp.broadcast_to(ds.lights_pos.z[0], p.x.shape),
    )
    lvec = lp - p
    mag2 = lvec.mag2()
    mag = jnp.sqrt(jnp.maximum(mag2, 1e-30))
    ldir = lvec / mag

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain_occluded(px0, k: int):
        def body(i, px):
            blocked = pallas_trace.occluded_tiles(
                cbox, cmeta, tri, Vec3(px, p.y, p.z), ldir, mag2,
                leaf_size=leaf, stack_depth=sdepth, dual=True,
            )
            return px + blocked.astype(jnp.float32) * 1e-12
        return jnp.sum(jax.lax.fori_loop(0, k, body, px0))

    report["occluded_primary_ms"] = marginal_ms(lambda k: chain_occluded(p.x, k))
    print("occluded_primary_ms", report["occluded_primary_ms"], flush=True)

    # --- 4/5. full frames -------------------------------------------------
    origin, dir00, inc_x, inc_y = cam_arrays

    def make_frame(ds_used, bounces):
        def frame(eps):
            o_f, d_f = generate_rays_tiled(
                (origin + eps, dir00, inc_x, inc_y), W, H, TR, TC
            )
            closest_fn, occluded_fn = pallas_trace.make_tracer(
                packed, leaf, ds=ds_used, stack_depth=sdepth, dual=True,
            )
            col = trace_rays(ds_used, closest_fn, occluded_fn, o_f, d_f, bounces)
            return jnp.sum(col.x) + jnp.sum(col.y) + jnp.sum(col.z)
        return frame

    ds_nolight = ds._replace(
        lights_pos=Vec3(*(jnp.zeros((0,), jnp.float32) for _ in range(3))),
        lights_kl=Vec3(*(jnp.zeros((0,), jnp.float32) for _ in range(3))),
    )

    for tag, ds_used, blist in (
        ("frame", ds, (1, 2, 3, 4)),
        ("frame_nolight", ds_nolight, (1, 4)),
    ):
        for b in blist:
            frame = make_frame(ds_used, b)

            @functools.partial(jax.jit, static_argnames=("k",))
            def chain_frame(k: int, _frame=frame):
                def body(i, s):
                    return s * 1e-30 + _frame(s * 1e-30)
                return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

            key = f"{tag}_b{b}_ms"
            report[key] = marginal_ms(lambda k: chain_frame(k), k_lo=1, k_hi=3)
            print(key, report[key], flush=True)

    # Derived
    for b in (2, 3, 4):
        report[f"bounce{b-1}_marginal_ms"] = (
            report[f"frame_b{b}_ms"] - report[f"frame_b{b-1}_ms"]
        )
    report["shadow_total_b4_ms"] = (
        report["frame_b4_ms"] - report["frame_nolight_b4_ms"]
    )
    report["shadow_total_b1_ms"] = (
        report["frame_b1_ms"] - report["frame_nolight_b1_ms"]
    )
    report["glue_b1_ms"] = (
        report["frame_b1_ms"] - report["closest_attr_ms"]
        - report["occluded_primary_ms"]
    )

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metrics", "profile_frame_dual.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
