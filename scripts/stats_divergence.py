"""Per-bounce ray-population statistics for the compaction decision.

Mirrors ops/shade.trace_rays' masking semantics exactly (miss kill,
multiplier-epsilon cutoff BEFORE the kr update, per-light backface "need"
mask) and reports, for every closest and shadow pass of the frame, the
fraction of lanes / 128-ray rows / 1024-ray packets that are live.

Packet traversal pays the union of its live lanes' node visits, and a
fully dead row or packet is skipped at (near) zero cost already — so the
headroom for row-granularity ray compaction between bounces is bounded by
the live-row fraction. Writes metrics/stats_divergence.json.
"""

from __future__ import annotations

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
from parallel_ray_tracer_tpu.ops.intersect import EPSILON
from parallel_ray_tracer_tpu.ops.render import generate_rays_tiled
from parallel_ray_tracer_tpu.ops.shade import mask_dead_rays, surface_attrs
from parallel_ray_tracer_tpu.ops.vecmath import Vec3

W, H = 1920, 1080
BOUNCES = 4


def frac(mask: np.ndarray) -> dict:
    m = np.asarray(mask).reshape(-1)
    rows = m.reshape(-1, 128)
    pkts = m.reshape(-1, 1024)
    return {
        "lanes": float(m.mean()),
        "rows": float(rows.any(axis=1).mean()),
        "packets": float(pkts.any(axis=1).mean()),
        # mean occupancy *within* live rows: how mixed a compacted packet
        # would be is governed by this staying high
        "lanes_in_live_rows": float(
            m.sum() / max(1, rows.any(axis=1).sum() * 128)
        ),
    }


def main():
    cfg = RenderConfig(
        width=W, height=H, scene="car_boxed", bounces=BOUNCES,
        bvh_heuristic=6, tile_rows=32, tile_cols=32,
    )
    pipe = pipeline.prepare(cfg)
    ds = pipe.ds
    from parallel_ray_tracer_tpu.ops import pallas_trace

    closest_fn, _ = pallas_trace.make_tracer(
        pipe.packed_dev, pipe.leaf_size, ds=None,
        stack_depth=pipe.pallas_stack_depth, dual=True,
    )

    cam_arrays = tuple(jnp.asarray(a) for a in ray_basis(pipe.camera(), W, H))
    o, d = generate_rays_tiled(cam_arrays, W, H, 32, 32)

    report = {"scene": "car_boxed", "w": W, "h": H, "bounces": BOUNCES}
    alive = jnp.ones(o.x.shape, bool)
    mult = Vec3(o.x * 0 + 1, o.y * 0 + 1, o.z * 0 + 1)

    for b in range(BOUNCES):
        report[f"closest_b{b}"] = frac(alive)
        # What the pass population would be if lanes with an *already zero*
        # multiplier were killed early (exact-identity optimization: their
        # contribution is mult*col == 0; trace_rays currently checks the
        # epsilon cutoff BEFORE the kr update, reference parity).
        live_now = alive & (mult.mag2() >= EPSILON * EPSILON)
        report[f"closest_b{b}_multcut"] = frac(live_now)
        o_m, d_m = mask_dead_rays(o, d, alive)
        hit = closest_fn(o_m, d_m)
        is_hit = hit.idx >= 0
        alive = alive & is_hit

        # shadow "need" per light = alive & not backface (shade_hit)
        t_safe = jnp.where(hit.idx >= 0, hit.t, 1.0)
        p = o + d * t_safe
        n, _, _, kr = surface_attrs(ds, hit, p)
        n_flip = (-n).where(hit.norm_dir, n)
        for i in range(ds.num_lights):
            lp = Vec3(
                jnp.broadcast_to(ds.lights_pos.x[i], p.x.shape),
                jnp.broadcast_to(ds.lights_pos.y[i], p.x.shape),
                jnp.broadcast_to(ds.lights_pos.z[i], p.x.shape),
            )
            lvec = lp - p
            backface = lvec.dot(n_flip) < 0.0
            need = alive & jnp.logical_not(backface)
            report[f"shadow_b{b}_l{i}"] = frac(need)

        alive = alive & (mult.mag2() >= EPSILON * EPSILON)
        mult = mult * kr
        refl = d + n_flip * (2.0 * jnp.abs(d.dot(n_flip)))
        rmag = jnp.sqrt(jnp.maximum(refl.mag2(), 1e-30))
        d = refl / rmag
        o = p

    report[f"closest_b{BOUNCES}"] = frac(alive)
    report[f"closest_b{BOUNCES}_multcut"] = frac(
        alive & (mult.mag2() >= EPSILON * EPSILON)
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metrics", "stats_divergence.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
