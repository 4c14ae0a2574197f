"""Streaming-pass floor accounting (round-3 verdict #5).

For each synthetic scene size, runs the 1080p primary closest pass with
the STREAM COUNTERS (pallas_trace stream kernels, counters=True):
per-packet (inner_iters, leaf_group_evals, sync_fetches, block_fills).
From these plus measured times it decomposes the streamed pass against
two floors:

  - DMA floor:   block_fills x STREAM_BLK x 512 B  /  819 GB/s
    (every started block DMA moves BLK lane-padded leaf rows from HBM)
  - compute floor: the RESIDENT pass at the identical schedule on the
    same scene (measured where it fits; at 1M triangles extrapolated
    from the per-iteration cost calibrated at 300k — same kernels, same
    visit counts, VPU leaf on both sides)

A perfectly overlapped stream runs at max(compute, DMA); the overlap
quality is sync_fetches / block_fills (fills that stalled compute).
Writes metrics/profile_stream.json.
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
from parallel_ray_tracer_tpu.models.camera import ray_basis
from parallel_ray_tracer_tpu.ops import pallas_trace
from parallel_ray_tracer_tpu.ops.render import generate_rays_tiled
from parallel_ray_tracer_tpu.ops.vecmath import Vec3

W, H = 1920, 1080
HBM_GBPS = 819.0
ROW_BYTES = 512                      # lane-padded (., 128) f32 leaf row
BLK_BYTES = pallas_trace.STREAM_BLK * ROW_BYTES


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


def make_chain(pp, o2, d2, stream):
    scene = pp.packed_dev[:3]

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(ox0, scene, _o2, _d2, k: int):
        cbox, cmeta, tri = scene

        def body(i, ox):
            h = pallas_trace.closest_tiles(
                cbox, cmeta, tri, Vec3(ox, _o2.y, _o2.z), _d2,
                leaf_size=pp.leaf_size,
                stack_depth=pp.pallas_stack_depth, dual=True,
                stream=stream, npop=pp.npop, adaptive=pp.adaptive,
            )
            return ox + jnp.where(h.t < 1.0, h.t, 0.0) * 1e-12
        return jnp.sum(jax.lax.fori_loop(0, k, body, ox0))

    return lambda k: chain(o2.x, scene, o2, d2, k)


def main():
    report = {"hbm_gbps": HBM_GBPS, "blk_bytes": BLK_BYTES}
    iter_cost_ns = None               # calibrated at the largest resident size
    for n_tris in (100_000, 300_000, 1_000_000):
        base = dict(
            width=W, height=H, synthetic_triangles=n_tris, bvh_heuristic=6,
            tile_rows=32, tile_cols=32,
        )
        pipe = pipeline.prepare(RenderConfig(**base))
        spipe = pipe if pipe.stream else pipeline.prepare(
            RenderConfig(stream="on", **base)
        )
        cam_arrays = tuple(
            jnp.asarray(a) for a in ray_basis(pipe.camera(), W, H)
        )
        o, d = generate_rays_tiled(cam_arrays, W, H, 32, 32)
        n_rays = o.x.shape[0]
        rows = n_rays // 128
        o2 = Vec3(*(p.reshape(rows, 128) for p in o))
        d2 = Vec3(*(p.reshape(rows, 128) for p in d))

        # Stream counters (single uncached run; counts are exact).
        sc = spipe.packed_dev[:3]
        _, cnt = pallas_trace.closest_tiles(
            *sc, o2, d2, leaf_size=spipe.leaf_size,
            stack_depth=spipe.pallas_stack_depth, dual=True, stream=True,
            counters=True, npop=spipe.npop, adaptive=spipe.adaptive,
        )
        cnt = np.asarray(cnt).astype(np.int64)
        inner, leafs, syncs, fills = (
            cnt[:, 0].sum(), cnt[:, 1].sum(), cnt[:, 2].sum(),
            cnt[:, 3].sum(),
        )
        # Leaf evals pair up behind one ring lookup (same-block second
        # pops); iterations ~ inner + leaf iterations.
        stream_ms = marginal_ms(make_chain(spipe, o2, d2, True))
        entry = {
            "inner_iters": int(inner),
            "leaf_group_evals": int(leafs),
            "sync_fetches": int(syncs),
            "block_fills": int(fills),
            "sync_frac_of_fills": float(syncs / max(1, fills)),
            "dma_bytes": int(fills * BLK_BYTES),
            "dma_floor_ms": fills * BLK_BYTES / (HBM_GBPS * 1e9) * 1e3,
            "stream_ms": stream_ms,
            "rays_per_s_stream": n_rays / (stream_ms / 1e3),
        }
        if not pipe.stream:
            res_ms = marginal_ms(make_chain(pipe, o2, d2, False))
            entry["resident_ms"] = res_ms
            # Per-iteration compute cost at this scene (VPU leaf; leaf
            # evals pair 2-per-iteration in the streamed loop, resident
            # pops one per iteration — use the resident structure).
            iters = inner + leafs
            iter_cost_ns = res_ms * 1e6 / iters
            entry["resident_iter_cost_ns"] = iter_cost_ns
            entry["compute_floor_ms"] = res_ms
        else:
            assert iter_cost_ns is not None
            entry["compute_floor_ms"] = (
                (inner + leafs) * iter_cost_ns / 1e6
            )
            entry["compute_floor_basis"] = (
                "extrapolated from the largest resident scene's "
                "per-iteration cost"
            )
        entry["overlap_floor_ms"] = max(
            entry["compute_floor_ms"], entry["dma_floor_ms"]
        )
        entry["stream_vs_floor"] = stream_ms / entry["overlap_floor_ms"]
        report[str(n_tris)] = entry
        print(n_tris, json.dumps(entry, indent=1), flush=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metrics", "profile_stream.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
