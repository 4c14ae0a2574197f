"""Lower-bound the any-hit pass: how much of it is irreducible?

An unblocked shadow ray must prove no intersection exists, so it walks
every node its segment geometrically hits — no early exit can help it.
Blocked lanes are where kernel scheduling (near-first ordering, dual-pop
leaf-first) can still save visits. This script splits the per-packet
union-visit proxy into:

  all     nodes hit by any live lane's segment  (= no-early-exit walk)
  floor   nodes hit by any UNBLOCKED lane's segment (irreducible)

If floor/all is close to 1, the occlusion pass has no pruning headroom
left and its cost is algorithmic; if it is small, smarter blocked-lane
scheduling is worth kernel work. Writes metrics/sim_shadow_floor.json.
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
from parallel_ray_tracer_tpu.ops import pallas_trace
from parallel_ray_tracer_tpu.ops.vecmath import Vec3

from bench_pass import bounce_ray_sets, shadow_rays  # noqa: E402
from sim_shadow_binning import total_visits, pack_order  # noqa: E402

W, H = 1920, 1080
PACKET = 1024


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
    cbox, cmeta, tri, attr = pipe.packed_dev
    report = {"scene": "car_boxed"}

    for b, (o, d, alive) in enumerate(sets):
        so, sd, sm2 = shadow_rays(ds, o, d, alive, closest_fn)
        rows = so.x.shape[0] // 128
        so2 = Vec3(*(p.reshape(rows, 128) for p in so))
        sd2 = Vec3(*(p.reshape(rows, 128) for p in sd))
        blocked = np.asarray(
            pallas_trace.occluded_tiles(
                cbox, cmeta, tri, so2, sd2, sm2.reshape(rows, 128),
                leaf_size=pipe.leaf_size,
                stack_depth=pipe.pallas_stack_depth, dual=True,
            )
        ).reshape(-1).astype(bool)

        o_np = np.stack([np.asarray(p) for p in so], axis=-1)
        d_np = np.stack([np.asarray(p) for p in sd], axis=-1)
        t_np = np.sqrt(np.maximum(np.asarray(sm2), 1e-30))
        live_np = np.abs(d_np).sum(axis=-1) > 0
        order = np.arange(o_np.shape[0])

        po, pd, pt, pl = pack_order(o_np, d_np, t_np, live_np, order)
        tot_all, _ = total_visits(po, pd, pt, pl, nmin, nmax, n_chunks)
        pl_floor = pl & ~jnp.asarray(blocked.reshape(pl.shape))
        tot_floor, _ = total_visits(po, pd, pt, pl_floor, nmin, nmax, n_chunks)

        frac_blocked = float(blocked[live_np].mean()) if live_np.any() else 0.0
        report[f"shadow_b{b}"] = {
            "visits_all": int(tot_all),
            "visits_floor": int(tot_floor),
            "floor_frac": float(tot_floor) / max(int(tot_all), 1),
            "blocked_frac": frac_blocked,
        }
        print(f"shadow_b{b}", report[f"shadow_b{b}"], flush=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metrics", "sim_shadow_floor.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
