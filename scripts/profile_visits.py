"""In-kernel visit accounting for the dual-pop kernels.

Uses the counters mode of closest_tiles/occluded_tiles to record, per
packet: dual-inner iterations, leaf visits, and iterations that had only
ONE pending inner node (the duplicated slab work is then wasted). Together
with the microbenched per-visit costs (BENCHMARKS.md roofline: ~116 vector
ops per dual-inner iteration, ~433 ns per 8-triangle leaf visit) this
decomposes every pass's measured time into explained vector work and
locates the remaining headroom.

Writes metrics/profile_visits.json.
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

W, H = 1920, 1080


def stats(cnt: np.ndarray) -> dict:
    inner, leaf, single = cnt[:, 0], cnt[:, 1], cnt[:, 2]
    out = {
        "inner_iters_total": int(inner.sum()),
        "leaf_visits_total": int(leaf.sum()),
        "single_pending_total": int(single.sum()),
        "inner_iters_mean": float(inner.mean()),
        "leaf_visits_mean": float(leaf.mean()),
        "single_pending_frac": float(single.sum() / max(inner.sum(), 1)),
        "inner_iters_max": int(inner.max()),
        "leaf_visits_max": int(leaf.max()),
    }
    if cnt.shape[1] >= 4:
        # Real popped slots whose visit pushed nothing: the stale or
        # fruitless visits an ideal pop-time cull could at best skip.
        dead = cnt[:, 3]
        out["dead_pops_total"] = int(dead.sum())
        out["real_inner_pops_total"] = int(
            cnt[:, 0].sum() * _NPOP - cnt[:, 2].sum()
        )
        out["dead_pops_frac_of_real"] = float(
            dead.sum() / max(1, out["real_inner_pops_total"])
        )
    if cnt.shape[1] >= 5:
        # Real leaf GROUP pops (excluding duplicate padding) — the
        # schedule-independent leaf work unit for the roofline.
        out["leaf_group_pops_total"] = int(cnt[:, 4].sum())
    if cnt.shape[1] >= 7:
        # Executed visit-slot totals (adaptive-aware widths): the EXACT
        # work units the roofline prices — inner_slots x 116 vreg-ops,
        # leaf_slots x per-group epilogue (round-4; replaces the fixed
        # npop x iterations model that went stale under adaptive pops).
        out["inner_slots_total"] = int(cnt[:, 5].sum())
        out["leaf_slots_total"] = int(cnt[:, 6].sum())
    return out


_NPOP = 2  # set from args in main()


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--pop", type=int, default=2, choices=(2, 4, 8, 16))
    ap.add_argument("--nleaf", type=int, default=0, choices=(0, 2, 4, 6, 8))
    ap.add_argument("--adaptive", action="store_true")
    ap.add_argument("--scene", default="car_boxed")
    args = ap.parse_args()
    global _NPOP
    _NPOP = args.pop
    cfg = RenderConfig(
        width=W, height=H, scene=args.scene, bvh_heuristic=6,
        tile_rows=32, tile_cols=32,
    )
    pipe = pipeline.prepare(cfg)
    cbox, cmeta, tri, attr = pipe.packed_dev[:4]
    cmat = pipe.packed_dev[4] if len(pipe.packed_dev) >= 5 else None
    leaf = pipe.leaf_size
    sdepth = pallas_trace.required_stack_depth(
        pipe.flat.depth, 4, npop=args.pop
    )

    sets, ds, closest_fn = bounce_ray_sets(pipe, 2)
    report = {"scene": args.scene, "true_sah": cfg.true_sah}

    for b, (o, d, alive) in enumerate(sets):
        from parallel_ray_tracer_tpu.ops.shade import mask_dead_rays

        o_m, d_m = mask_dead_rays(o, d, alive)
        rows = o_m.x.shape[0] // 128
        o2 = Vec3(*(p.reshape(rows, 128) for p in o_m))
        d2 = Vec3(*(p.reshape(rows, 128) for p in d_m))

        _, cnt = pallas_trace.closest_tiles(
            cbox, cmeta, tri, o2, d2, leaf_size=leaf, stack_depth=sdepth,
            dual=True, counters=True, npop=args.pop, nleaf=args.nleaf,
            cmat=cmat, adaptive=args.adaptive,
        )
        report[f"closest_b{b}"] = stats(np.asarray(cnt))
        print(f"closest_b{b}", report[f"closest_b{b}"], flush=True)

        so, sd, sm2 = shadow_rays(ds, o, d, alive, closest_fn)
        so2 = Vec3(*(p.reshape(rows, 128) for p in so))
        sd2 = Vec3(*(p.reshape(rows, 128) for p in sd))
        _, ocnt = pallas_trace.occluded_tiles(
            cbox, cmeta, tri, so2, sd2, sm2.reshape(rows, 128),
            leaf_size=leaf, stack_depth=sdepth, dual=True, counters=True,
            npop=args.pop, nleaf=args.nleaf, cmat=cmat,
            adaptive=args.adaptive,
        )
        report[f"occluded_b{b}"] = stats(np.asarray(ocnt))
        print(f"occluded_b{b}", report[f"occluded_b{b}"], flush=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metrics", "profile_visits"
        + (f"_pop{args.pop}" if args.pop != 2 else "")
        + (f"_nl{args.nleaf}" if args.nleaf else "")
        + ("_adpt" if args.adaptive else "")
        + (f"_{args.scene}" if args.scene != "car_boxed" else "")
        + ".json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
