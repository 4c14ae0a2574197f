"""Per-bounce executed-slot counters of the PRODUCTION fused frame kernel.

Round-4 verdict item #2: the roofline's frame row carried
`b3_ops_extrapolated` because the fused kernel — the path bench.py
actually ships — emitted no counters; the b1->b2 growth model stood in
for 36% of the frame. frame_tiles(counters=True) now runs the identical
unrolled schedule with the pass kernels' adaptive-aware slot counters
threaded through every bounce's closest and occluded traversals, so the
frame row prices ONLY counted slots.

Runs the reference default workload (car_boxed 1920x1080, 4 bounces) at
the production schedule (adaptive pops, npop0/npop from the pipeline)
and writes metrics/profile_frame_fused.json:

  { "fused_closest_b{b}":  {inner_iters_total, leaf_iters_total,
                            pad_slots_total, leaf_group_pops_total,
                            inner_slots_total, leaf_slots_total},
    "fused_occluded_b{b}": {... summed over lights ...},
    "meta": {...} }

Counter semantics: column k of frame_tiles' (ntiles, 7, 2*bounces)
output is the k-th entry of _run_closest_dual's counter tuple; lane 2b
is bounce b's closest run, lane 2b+1 its occluded runs summed over the
scene's lights (ops/pallas_trace.py `_frame_fused_kernel`).
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
from parallel_ray_tracer_tpu.ops import pallas_trace
from parallel_ray_tracer_tpu.ops.render import generate_rays_tiled
from parallel_ray_tracer_tpu.ops.vecmath import Vec3

W, H = 1920, 1080
COUNTER_NAMES = (
    "inner_iters", "leaf_iters", "pad_slots", "dead_pops",
    "leaf_group_pops", "inner_slots", "leaf_slots",
)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="car_boxed")
    ap.add_argument("--bounces", type=int, default=4)
    args = ap.parse_args()

    cfg = RenderConfig(
        width=W, height=H, scene=args.scene, bounces=args.bounces,
        bvh_heuristic=6, tile_rows=32, tile_cols=32,
    )
    pipe = pipeline.prepare(cfg)
    cbox, cmeta, tri, attr = pipe.packed_dev[:4]
    cmat = pipe.packed_dev[4] if len(pipe.packed_dev) >= 5 else None
    lamb = pallas_trace.pack_lights(pipe.ds)
    o, d = generate_rays_tiled(
        tuple(jnp.asarray(a) for a in ray_basis(pipe.camera(), W, H)),
        W, H, 32, 32,
    )
    R = o.x.shape[0]
    o2 = Vec3(*(p.reshape(R // 128, 128) for p in o))
    d2 = Vec3(*(p.reshape(R // 128, 128) for p in d))

    col, cnt = pallas_trace.frame_tiles(
        cbox, cmeta, tri, attr, lamb, o2, d2, bounces=args.bounces,
        leaf_size=pipe.leaf_size, stack_depth=pipe.pallas_stack_depth,
        cmat=cmat, npop=pipe.npop, npop0=pipe.npop0,
        adaptive=pipe.adaptive, counters=True,
    )
    jax.block_until_ready(col)
    cnt = np.asarray(cnt)  # (ntiles, 7, 2*bounces)

    report = {}
    for b in range(args.bounces):
        for j, kind in ((0, "closest"), (1, "occluded")):
            col_b = cnt[:, :, 2 * b + j]
            report[f"fused_{kind}_b{b}"] = {
                f"{COUNTER_NAMES[k]}_total": int(col_b[:, k].sum())
                for k in range(7)
            }
    report["meta"] = {
        "scene": args.scene,
        "resolution": [W, H],
        "bounces": args.bounces,
        "num_lights": int(lamb.shape[0]) - 1,
        "schedule": {
            "npop": pipe.npop, "npop0": pipe.npop0,
            "adaptive": pipe.adaptive, "leaf_size": pipe.leaf_size,
            "mxu": cmat is not None,
        },
        "image_checksum": float(np.asarray(col.x).sum()),
    }
    print(json.dumps(report, indent=2))

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metrics", "profile_frame_fused"
        + (f"_{args.scene}" if args.scene != "car_boxed" else "")
        + ".json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
