"""Per-pass kernel benchmark on coherent AND incoherent ray sets.

The frame profile (metrics/profile_frame.json) shows incoherent bounce
passes dominate the frame. This harness generates the actual bounce-k ray
populations for car_boxed @1080p and times a traversal pass per kernel
configuration with the chained-marginal methodology, so kernel experiments
(arity, dual-pop, bf16 rows) are judged on the rays that matter.

Usage: python scripts/bench_pass.py [--width 4] [--passes closest,occluded]
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
from parallel_ray_tracer_tpu.ops.shade import mask_dead_rays
from parallel_ray_tracer_tpu.ops.vecmath import Vec3

W, H = 1920, 1080


from _timing import marginal_ms as _marginal_ms  # noqa: E402


def marginal_ms(fn, k_lo=2, k_hi=8, reps=3):
    return _marginal_ms(fn, k_lo=k_lo, k_hi=k_hi, reps=reps)


def bounce_ray_sets(pipe, n_bounces=2):
    """[(o, d, alive)] for bounce 0..n_bounces (flat (R,) planes).

    Always uses an f32 (uncompressed) tracer for ray-set generation so a
    --bf16 run only compiles the kernels actually under test.
    """
    ds = pipe.ds
    if pipe.compressed:
        tv = pipe.scene.triangle_vertices()
        pk = pallas_trace.pack_bvh4(pipe.flat, tv, bf16=False)
        attr_np = pallas_trace.pack_attr(
            pipe.flat, pipe.scene.mat_idx, pipe.scene.mats_kd,
            pipe.scene.mats_ks, pipe.scene.mats_kr,
        )
        packed = (
            jnp.asarray(pk.cbox), jnp.asarray(pk.cmeta),
            jnp.asarray(pk.tri), jnp.asarray(attr_np),
        )
        closest_fn, _ = pallas_trace.make_tracer(
            packed, pipe.leaf_size, ds=None,
            stack_depth=pipe.pallas_stack_depth, compressed=False,
        )
    else:
        packed = pipe.packed_dev
    cam_arrays = tuple(
        jnp.asarray(a) for a in ray_basis(pipe.camera(), W, H)
    )
    o, d = generate_rays_tiled(cam_arrays, W, H, 32, 32)
    if not pipe.compressed:
        closest_fn, _ = pallas_trace.make_tracer(
            packed, pipe.leaf_size, ds=None,
            stack_depth=pipe.pallas_stack_depth,
        )

    sets = []
    alive = jnp.ones(o.x.shape, bool)
    for b in range(n_bounces + 1):
        sets.append((o, d, alive))
        o_m, d_m = mask_dead_rays(o, d, alive)
        h = closest_fn(o_m, d_m)
        is_hit = h.idx >= 0
        alive = alive & is_hit
        t_safe = jnp.where(is_hit, h.t, 1.0)
        p = o + d * t_safe
        # Reflection off the winning triangle (attr planes carry raw n).
        mag2 = h.n.mag2()
        inv = 1.0 / jnp.sqrt(jnp.maximum(mag2, 1e-30))
        n = Vec3(h.n.x * inv, h.n.y * inv, h.n.z * inv)
        n = (-n).where(h.norm_dir, n)
        refl = d + n * (2.0 * jnp.abs(d.dot(n)))
        rmag = jnp.sqrt(jnp.maximum(refl.mag2(), 1e-30))
        d = refl / rmag
        o = p
    return sets, ds, closest_fn


def shadow_rays(ds, o, d, alive, closest_fn):
    """Shadow-ray population for a bounce's hits (light 0)."""
    o_m, d_m = mask_dead_rays(o, d, alive)
    h = closest_fn(o_m, d_m)
    is_hit = alive & (h.idx >= 0)
    t_safe = jnp.where(h.idx >= 0, h.t, 1.0)
    p = o + d * t_safe
    lp = Vec3(
        jnp.broadcast_to(ds.lights_pos.x[0], p.x.shape),
        jnp.broadcast_to(ds.lights_pos.y[0], p.x.shape),
        jnp.broadcast_to(ds.lights_pos.z[0], p.x.shape),
    )
    lvec = lp - p
    mag2 = lvec.mag2()
    mag = jnp.sqrt(jnp.maximum(mag2, 1e-30))
    ldir = lvec / mag
    p_m, l_m = mask_dead_rays(p, ldir, is_hit)
    return p_m, l_m, mag2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=4, choices=(2, 4, 8))
    ap.add_argument("--bounces", type=int, default=2)
    ap.add_argument("--dual", action="store_true",
                    help="dual-pop two-stack traversal kernels")
    ap.add_argument("--true-sah", action="store_true")
    ap.add_argument("--leaf-size", type=int, default=None)
    ap.add_argument("--leaf-threshold", type=int, default=8)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--mxu", action="store_true",
                    help="MXU leaf evaluation (needs --dual, width >= 4)")
    ap.add_argument("--presplit", type=float, default=0.0,
                    help="pre-split ratio (e.g. 0.0625 = 1/16)")
    ap.add_argument("--pop", type=int, default=2, choices=(2, 4, 8, 16),
                    help="wide-pop width (inner nodes per visit)")
    ap.add_argument("--nleaf", type=int, default=0, choices=(0, 2, 4, 6, 8),
                    help="leaf groups per MXU leaf visit (0 = auto)")
    ap.add_argument("--adaptive", action="store_true",
                    help="width-switched inner/leaf pops (production)")
    ap.add_argument("--no-sort", action="store_true",
                    help="skip the any-hit child sort network "
                         "(occluded passes only; order-independent result)")
    ap.add_argument("--reverse", action="store_true",
                    help="light-origin shadow segments (occluded passes)")
    ap.add_argument("--scene", default="car_boxed")
    ap.add_argument("--tag", default=None)
    args = ap.parse_args()

    cfg = RenderConfig(
        width=W, height=H, scene=args.scene, bvh_heuristic=6,
        tile_rows=32, tile_cols=32, bvh_width=args.width,
        true_sah=args.true_sah, leaf_size=args.leaf_size,
        bf16_bvh=args.bf16, leaf_threshold=args.leaf_threshold,
        presplit=args.presplit,
    )
    pipe = pipeline.prepare(cfg)
    packed = pipe.packed_dev
    leaf = pipe.leaf_size
    sdepth = pipe.pallas_stack_depth
    if args.pop > 2:
        sdepth = pallas_trace.required_stack_depth(
            pipe.flat.depth, args.width, npop=args.pop
        )
    cbox, cmeta, tri, attr = packed[:4]
    cmat = packed[4] if (len(packed) >= 5 and args.mxu) else None

    # The HitFull tracer for shadow-ray generation is the f32 one from
    # bounce_ray_sets (a bf16 run only compiles the kernels under test).
    sets, ds, closest_fn = bounce_ray_sets(pipe, args.bounces)

    results = {
        "pop": args.pop, "nleaf": args.nleaf, "adaptive": args.adaptive,
        "bvh_width": args.width, "dual": bool(args.dual),
        "presplit": args.presplit,
        "true_sah": bool(args.true_sah), "leaf_size": pipe.leaf_size,
        "bf16": bool(args.bf16), "leaf_threshold": args.leaf_threshold,
        "mxu": cmat is not None, "scene": args.scene,
    }
    dual = bool(args.dual)
    comp = pipe.compressed
    for b, (o, d, alive) in enumerate(sets):
        o_m, d_m = mask_dead_rays(o, d, alive)
        rows = o_m.x.shape[0] // 128
        o2 = Vec3(*(p.reshape(rows, 128) for p in o_m))
        d2 = Vec3(*(p.reshape(rows, 128) for p in d_m))

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain_c(ox0, k: int, _o2=o2, _d2=d2):
            def body(i, ox):
                h = pallas_trace.closest_tiles(
                    cbox, cmeta, tri, Vec3(ox, _o2.y, _o2.z), _d2,
                    leaf_size=leaf, stack_depth=sdepth, dual=dual,
                    compressed=comp, cmat=cmat, npop=args.pop,
                    nleaf=args.nleaf,
                    adaptive=args.adaptive,
                )
                return ox + jnp.where(h.t < 1.0, h.t, 0.0) * 1e-12
            return jnp.sum(jax.lax.fori_loop(0, k, body, ox0))

        key = f"closest_b{b}_ms"
        results[key] = marginal_ms(lambda k, j: chain_c(o2.x + j, k))
        print(key, f"{results[key]:.2f}", flush=True)

        so, sd, sm2 = shadow_rays(ds, o, d, alive, closest_fn)
        if args.reverse:
            import numpy as _np
            dead = (sd.x == 0) & (sd.y == 0) & (sd.z == 0)
            lx = jnp.float32(_np.asarray(ds.lights_pos.x)[0])
            ly = jnp.float32(_np.asarray(ds.lights_pos.y)[0])
            lz = jnp.float32(_np.asarray(ds.lights_pos.z)[0])
            dist = jnp.sqrt(sm2)
            rvx, rvy, rvz = so.x - lx, so.y - ly, so.z - lz
            rmag = jnp.sqrt(jnp.maximum(rvx**2 + rvy**2 + rvz**2, 1e-30))
            so = Vec3(jnp.where(dead, 1e30, lx), jnp.where(dead, 1e30, ly),
                      jnp.where(dead, 1e30, lz))
            sd = Vec3(jnp.where(dead, 0.0, rvx / rmag),
                      jnp.where(dead, 0.0, rvy / rmag),
                      jnp.where(dead, 0.0, rvz / rmag))
            sm2 = jnp.maximum(dist - 1e-3, 0.0) ** 2
        so2 = Vec3(*(p.reshape(rows, 128) for p in so))
        sd2 = Vec3(*(p.reshape(rows, 128) for p in sd))
        sm22 = sm2.reshape(rows, 128)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain_o(px0, k: int, _so2=so2, _sd2=sd2, _sm2=sm22):
            def body(i, px):
                blocked = pallas_trace.occluded_tiles(
                    cbox, cmeta, tri, Vec3(px, _so2.y, _so2.z), _sd2, _sm2,
                    leaf_size=leaf, stack_depth=sdepth, dual=dual,
                    compressed=comp, cmat=cmat, npop=args.pop,
                    nleaf=args.nleaf, adaptive=args.adaptive,
                    sort=not args.no_sort,
                )
                return px + blocked.astype(jnp.float32) * 1e-12
            return jnp.sum(jax.lax.fori_loop(0, k, body, px0))

        key = f"occluded_b{b}_ms"
        results[key] = marginal_ms(lambda k, j: chain_o(so2.x + j, k))
        print(key, f"{results[key]:.2f}", flush=True)

    tag = args.tag or (
        f"w{args.width}" + ("_dual" if dual else "")
        + ("_tsah" if args.true_sah else "")
        + (f"_L{pipe.leaf_size}" if args.leaf_size else "")
        + ("_bf16" if args.bf16 else "")
        + ("_mxu" if args.mxu else "")
        + (f"_ps{round(1/args.presplit)}" if args.presplit else "")
        + (f"_T{args.leaf_threshold}" if args.leaf_threshold != 8 else "")
        + (f"_pop{args.pop}" if args.pop != 2 else "")
        + (f"_nl{args.nleaf}" if args.nleaf else "")
        + ("_nosort" if args.no_sort else "")
        + ("_adpt" if args.adaptive else "")
        + ("_rev" if args.reverse else "")
        + (f"_{args.scene}" if args.scene != "car_boxed" else "")
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metrics", f"bench_pass_{tag}.json",
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
