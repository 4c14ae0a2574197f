"""Full-frame benchmark: pass-based vs fused kernel, chained methodology.

Times the car_boxed 1080p `bounces`-bounce frame (the reference's default
workload) end-to-end through both frame formulations, with optional
presplit/true-sah tree options. Writes metrics/bench_frame_<tag>.json.
"""

from __future__ import annotations

import argparse
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
from parallel_ray_tracer_tpu.ops.shade import trace_rays
from parallel_ray_tracer_tpu.ops.vecmath import Vec3

W, H = 1920, 1080


from _timing import marginal_ms as _marginal_ms  # noqa: E402


def marginal_ms(fn, k_lo=1, k_hi=3, reps=3):
    return _marginal_ms(fn, k_lo=k_lo, k_hi=k_hi, reps=reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--presplit", type=float, default=0.0)
    ap.add_argument("--true-sah", action="store_true")
    ap.add_argument("--scene", default="car_boxed")
    ap.add_argument("--modes", default="pass,fused")
    ap.add_argument("--mxu", action=argparse.BooleanOptionalAction,
                    default=True, help="MXU leaf evaluation")
    ap.add_argument("--pop", type=int, default=2, choices=(2, 4, 8),
                    help="wide-pop width (inner nodes per visit)")
    ap.add_argument("--nleaf", type=int, default=0)
    ap.add_argument("--pop0", type=int, default=0,
                    help="bounce-0 pop width (0 = same as --pop)")
    ap.add_argument("--pops", default=None,
                    help="comma list: per-bounce pop widths for the fused "
                         "kernel (overrides --pop/--pop0), e.g. 2,4,8,8")
    ap.add_argument("--leaf-size", type=int, default=None,
                    help="triangles per leaf group (4 or 8; default 8)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16-pair compressed box rows (conservative)")
    ap.add_argument("--adaptive", action="store_true",
                    help="width-switched inner pops (branch on pending "
                         "count instead of NULL-padding to --pop)")
    ap.add_argument("--tag", default=None)
    args = ap.parse_args()

    cfg = RenderConfig(
        width=W, height=H, scene=args.scene, bounces=args.bounces,
        bvh_heuristic=6, tile_rows=32, tile_cols=32,
        presplit=args.presplit, true_sah=args.true_sah, mxu_leaf=args.mxu,
        pop_width=args.pop, leaf_size=args.leaf_size,
        leaf_threshold=(args.leaf_size or 2),
        bf16_bvh=args.bf16,
    )
    pipe = pipeline.prepare(cfg)
    leaf = pipe.leaf_size
    sdepth = pipe.pallas_stack_depth
    packed = pipe.packed_dev
    ds = pipe.ds
    lamb = pallas_trace.pack_lights(ds)
    cam = pipe.camera()
    base = tuple(jnp.asarray(a) for a in ray_basis(cam, W, H))
    origin, dir00, inc_x, inc_y = base

    report = {
        "scene": args.scene, "bounces": args.bounces,
        "presplit": args.presplit, "true_sah": args.true_sah,
        "mxu": len(packed) >= 5,
        "n_tris": pipe.scene.num_triangles,
        "leaf_size": leaf,
        "bf16": pipe.compressed,
    }

    def rays(eps):
        o, d = generate_rays_tiled(
            (origin + eps, dir00, inc_x, inc_y), W, H, 32, 32
        )
        return o, d

    if "pass" in args.modes.split(","):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain_pass(eps0, k: int):
            def body(i, eps):
                o, d = rays(eps)
                closest_fn, occluded_fn = pallas_trace.make_tracer(
                    packed, leaf, ds=ds, stack_depth=sdepth, dual=True,
                    npop=args.pop,
                    compressed=pipe.compressed, adaptive=args.adaptive,
                )
                if args.pop0 and args.pop0 != args.pop:
                    c0, o0 = pallas_trace.make_tracer(
                        packed, leaf, ds=ds, stack_depth=sdepth, dual=True,
                        npop=args.pop0,
                        compressed=pipe.compressed,
                    )
                    closest_fn = [c0, closest_fn]
                    occluded_fn = [o0, occluded_fn]
                col = trace_rays(ds, closest_fn, occluded_fn, o, d,
                                 args.bounces, reverse_shadows=True)
                return eps + jnp.sum(col.x) * 1e-18
            return jax.lax.fori_loop(0, k, body, eps0)

        ms = marginal_ms(lambda k, j: chain_pass(j, k))
        report["frame_pass_ms"] = ms
        print(f"pass-based: {ms:.1f} ms", flush=True)

    if "fused" in args.modes.split(","):
        rows = None

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain_fused(eps0, k: int):
            def body(i, eps):
                o, d = rays(eps)
                R = o.x.shape[0]
                o2 = o.reshape(R // 128, 128)
                d2 = d.reshape(R // 128, 128)
                col = pallas_trace.frame_tiles(
                    *packed[:4], lamb, o2, d2, bounces=args.bounces,
                    leaf_size=leaf, stack_depth=sdepth,
                    compressed=pipe.compressed,
                    cmat=packed[4] if len(packed) >= 5 else None,
                    npop=args.pop, nleaf=args.nleaf,
                    npop0=args.pop0,
                    npops=(tuple(int(x) for x in args.pops.split(","))
                           if args.pops else None),
                    adaptive=args.adaptive,
                )
                return eps + jnp.sum(col.x) * 1e-18
            return jax.lax.fori_loop(0, k, body, eps0)

        ms = marginal_ms(lambda k, j: chain_fused(j, k))
        report["frame_fused_ms"] = ms
        print(f"fused: {ms:.1f} ms", flush=True)

    tag = args.tag or (
        f"b{args.bounces}"
        + (f"_ps{round(1/args.presplit)}" if args.presplit else "")
        + ("_tsah" if args.true_sah else "")
        + ("_mxu" if len(packed) >= 5 else "")
        + (f"_pop{args.pop}" if args.pop != 2 else "")
        + (f"_p0{args.pop0}" if args.pop0 else "")
        + (f"_ps{args.pops.replace(',', '')}" if args.pops else "")
        + (f"_nl{args.nleaf}" if args.nleaf else "")
        + ("_adpt" if args.adaptive else "")
        + ("_bf16" if args.bf16 else "")
        + (f"_{args.scene}" if args.scene != "car_boxed" else "")
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metrics", f"bench_frame_{tag}.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
