"""Simulate shadow-ray re-binning: per-packet union node visits.

The occlusion passes are ~60% of the car_boxed frame and 2x the closest
passes per ray. Hypothesis: shadow packets are fat because a screen tile's
hit points span depth discontinuities (car edge vs far wall), so the
packet's segment union covers boxes near BOTH surfaces. Re-binning shadow
rays by hit-point locality (at ROW granularity — 128 rays — so no per-lane
gathers are needed) should shrink the per-packet union.

This measures the per-packet union of BVH nodes geometrically hit by live
segments (== visits of an any-hit walk without the all-blocked early exit;
exact for unblocked-dominated packets, conservative where blocking helps)
for several orderings:

  natural    tile-major rows as the frame produces them
  rows_g     rows sorted by morton code of the row's mean hit point
  rows_c     same sort but only within chunks of 1024 rows (cheap to
             apply with a block-diagonal permutation)
  rays_g     per-ray global morton sort (what round 1 rejected for
             closest rays; the upper bound on regrouping freedom)

Writes metrics/sim_shadow_binning.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys

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
from parallel_ray_tracer_tpu.ops.render import generate_rays_tiled
from parallel_ray_tracer_tpu.ops.intersect import EPSILON

from bench_pass import bounce_ray_sets, shadow_rays  # noqa: E402

W, H = 1920, 1080
PACKET = 1024


def morton3(p: np.ndarray, bits: int = 10) -> np.ndarray:
    """Interleaved 3x`bits` morton codes for (N, 3) points in [0,1)."""
    q = np.clip((p * (1 << bits)).astype(np.int64), 0, (1 << bits) - 1)
    out = np.zeros(p.shape[0], np.int64)
    for b in range(bits):
        for ax in range(3):
            out |= ((q[:, ax] >> b) & 1) << (3 * b + ax)
    return out


@functools.partial(jax.jit, static_argnames=("n_chunks",))
def total_visits(o, d, tmax, live, nmin, nmax, n_chunks: int):
    """Sum over packets of |{nodes whose box any live segment hits}|.

    o, d: (P, K, 3); tmax, live: (P, K); nmin/nmax: (N, 3).
    """
    node_chunks_min = nmin.reshape(n_chunks, -1, 3)
    node_chunks_max = nmax.reshape(n_chunks, -1, 3)

    def per_packet(args):
        po, pd, pt, pl = args
        inv = jnp.where(jnp.abs(pd) > 1e-30, 1.0 / pd, 1e30)

        def per_chunk(carry, nm):
            cmin, cmax = nm
            t0 = (cmin[None, :, :] - po[:, None, :]) * inv[:, None, :]
            t1 = (cmax[None, :, :] - po[:, None, :]) * inv[:, None, :]
            lo = jnp.max(jnp.minimum(t0, t1), axis=-1)
            hi = jnp.min(jnp.maximum(t0, t1), axis=-1)
            hit = (
                (lo <= hi)
                & (hi >= EPSILON)
                & (lo <= pt[:, None])
                & pl[:, None]
            )
            return carry + jnp.sum(jnp.any(hit, axis=0)), None

        count, _ = jax.lax.scan(
            per_chunk, jnp.int32(0), (node_chunks_min, node_chunks_max)
        )
        return count

    counts = jax.lax.map(per_packet, (o, d, tmax, live))
    return jnp.sum(counts), counts


def pack_order(o, d, tmax, live, order):
    """Apply a flat-ray ordering, then shape into (P, K, 3) packets."""
    P = o.shape[0] // PACKET
    return (
        jnp.asarray(o[order].reshape(P, PACKET, 3)),
        jnp.asarray(d[order].reshape(P, PACKET, 3)),
        jnp.asarray(tmax[order].reshape(P, PACKET)),
        jnp.asarray(live[order].reshape(P, PACKET)),
    )


def main():
    cfg = RenderConfig(
        width=W, height=H, scene="car_boxed", bvh_heuristic=6,
        tile_rows=32, tile_cols=32,
    )
    pipe = pipeline.prepare(cfg)
    flat = pipe.flat
    nmin_np = np.asarray(flat.node_min, np.float32)
    nmax_np = np.asarray(flat.node_max, np.float32)
    N = nmin_np.shape[0]
    pad = (-N) % 512
    nmin_np = np.concatenate([nmin_np, np.full((pad, 3), 1e30, np.float32)])
    nmax_np = np.concatenate([nmax_np, np.full((pad, 3), -1e30, np.float32)])
    n_chunks = nmin_np.shape[0] // 512
    nmin = jnp.asarray(nmin_np)
    nmax = jnp.asarray(nmax_np)

    sets, ds, closest_fn = bounce_ray_sets(pipe, 2)
    report = {"scene": "car_boxed", "n_nodes": int(N)}

    for b, (o, d, alive) in enumerate(sets):
        so, sd, sm2 = shadow_rays(ds, o, d, alive, closest_fn)
        o_np = np.stack([np.asarray(p) for p in so], axis=-1)
        d_np = np.stack([np.asarray(p) for p in sd], axis=-1)
        t_np = np.sqrt(np.maximum(np.asarray(sm2), 1e-30))
        # mask_dead_rays marks dead lanes with d == 0.
        live_np = np.abs(d_np).sum(axis=-1) > 0
        R = o_np.shape[0]

        # morton key of each ray's hit point (the shadow origin)
        span = o_np[live_np]
        lo = span.min(axis=0) if span.size else np.zeros(3)
        hi = span.max(axis=0) if span.size else np.ones(3)
        unit = (o_np - lo) / np.maximum(hi - lo, 1e-9)
        keys = morton3(np.clip(unit, 0.0, 1.0 - 1e-7))
        # dead rays sort to the back so live rows pack densely
        keys = np.where(live_np, keys, np.int64(1) << 62)

        rows = R // 128
        row_keys = keys.reshape(rows, 128).min(axis=1)

        orders = {
            "natural": np.arange(R),
            "rows_g": (
                np.argsort(row_keys, kind="stable")[:, None] * 128
                + np.arange(128)[None, :]
            ).reshape(-1),
            "rays_g": np.argsort(keys, kind="stable"),
        }
        # chunked row sort: rows sorted only within 1024-row blocks
        rk = row_keys.reshape(-1, 1024) if rows % 1024 == 0 else None
        if rk is not None:
            base = np.arange(0, rows, 1024)[:, None]
            ro = np.argsort(rk, axis=1, kind="stable") + base
            orders["rows_c"] = (
                ro.reshape(-1)[:, None] * 128 + np.arange(128)[None, :]
            ).reshape(-1)

        for name, order in orders.items():
            po, pd, pt, pl = pack_order(o_np, d_np, t_np, live_np, order)
            tot, counts = total_visits(po, pd, pt, pl, nmin, nmax, n_chunks)
            key = f"shadow_b{b}_{name}"
            report[key] = int(tot)
            print(key, int(tot), flush=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metrics", "sim_shadow_binning.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
