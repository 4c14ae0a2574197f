"""Multi-device scaling-efficiency harness (round-4 verdict #3).

The north-star target is >=80% scaling efficiency 1->N devices
(BASELINE.json); the reference's identity is its committed thread-scaling
protocol (/root/reference/cpu/src/main.c:97-103,214-264 — best-of-sweep
over 1..63 threads). This harness is the TPU analog: it times
`parallel.sharded.render_sharded` (the production fused schedule under
shard_map) across every mesh size the current backend exposes and
reports rays/s/device and efficiency vs the 1-device run.

On this environment only ONE real TPU chip exists, so two things are
measurable today, and both are recorded:

  1. PROTOCOL validation on the 8-virtual-device CPU mesh
     (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
      python scripts/bench_scaling.py): mesh sizes {1,2,4,8}, image
     bit-identity across sizes, efficiency numbers emitted but flagged
     `shape_only` (CPU timing says nothing about ICI scaling).
  2. The mesh(1) shard_map TAX on the real chip
     (python scripts/bench_scaling.py): the 1-device sharded render vs
     the unsharded production fused frame, chained-marginal methodology.
     If this is not ~1.00x, sharding costs throughput before a second
     chip is even attached — a production bug worth knowing now.

When a real multi-chip pod appears, the efficiency number is this one
command — no new code.

Writes metrics/bench_scaling.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# --cpu: force the hermetic CPU backend with 8 virtual devices BEFORE jax
# initializes a backend (the container preimports jax with JAX_PLATFORMS=
# axon, so plain env vars are ignored — same dance as tests/conftest.py).
if "--cpu" in sys.argv:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
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
from parallel_ray_tracer_tpu.parallel import sharded
from parallel_ray_tracer_tpu.ops.vecmath import Vec3


from _timing import marginal_s  # noqa: E402  (shared jittered marginal)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="car_boxed")
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--width", type=int, default=0,
                    help="0 = backend default (1920 TPU / 256 CPU)")
    ap.add_argument("--height", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="hermetic protocol validation: CPU backend, "
                         "8 virtual devices (timing is shape-only)")
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    W = args.width or (1920 if on_tpu else 256)
    H = args.height or (1080 if on_tpu else 128)
    n_dev = len(jax.devices())
    mesh_sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev]

    cfg = RenderConfig(
        width=W, height=H, scene=args.scene, bounces=args.bounces,
        bvh_heuristic=6, tile_rows=32, tile_cols=32,
    )
    pipe = pipeline.prepare(cfg)
    cam = pipe.camera()
    cam_arrays = tuple(jnp.asarray(a) for a in ray_basis(cam, W, H))
    variant = pipe.resolved_variant("auto")
    n_rays = W * H

    kern = dict(
        bounces=args.bounces, leaf_size=pipe.leaf_size,
        stack_depth=pipe.pallas_stack_depth, tile_rows=32, tile_cols=32,
        variant=variant, compressed=pipe.compressed, dual=cfg.dual_pop,
        stream=pipe.stream, npop=pipe.npop, npop0=pipe.npop0,
        adaptive=pipe.adaptive,
        # Pallas kernels run interpreted on the CPU protocol mesh.
        interpret=not on_tpu,
    )

    def make_chain(mesh):
        # Build the jitted chain ONCE per mesh and reuse the SAME function
        # object across timing calls — a fresh jax.jit wrapper per call
        # measures retrace + cache lookup instead of device time
        # (chained-marginal methodology, bench.py).
        @functools.partial(jax.jit, static_argnames=("kk",))
        def run(eps0, kk: int):
            def body(i, eps):
                ca = (cam_arrays[0] + eps,) + cam_arrays[1:]
                img = sharded._render_sharded(
                    pipe.ds, pipe.packed_dev, ca, W, H,
                    mesh=mesh, **kern,
                )
                return eps + jnp.sum(img) * 1e-18

            return jax.lax.fori_loop(0, kk, body, eps0)

        return lambda k, j: run(j, k)

    out = {
        "backend": jax.default_backend(),
        "devices": n_dev,
        "scene": args.scene,
        "resolution": [W, H],
        "bounces": args.bounces,
        "variant": variant,
        "shape_only": not on_tpu,
        "mesh": {},
    }

    # ---- image identity across mesh sizes (the correctness half) ----
    imgs = {}
    for n in mesh_sizes:
        mesh = sharded.make_mesh(n)
        imgs[n] = np.asarray(
            sharded.render_sharded(
                pipe.ds, pipe.packed_dev, cam, W, H, mesh, **kern
            )
        )
    if len(mesh_sizes) < 2:
        # Never record a green claim for a check that could not run
        # (the 1-chip TPU case).
        out["mesh_identity"] = "single mesh size — identity not checkable"
    else:
        for n in mesh_sizes[1:]:
            if not np.array_equal(imgs[n], imgs[mesh_sizes[0]]):
                out["mesh_identity"] = f"MISMATCH at {n}"
                break
        else:
            out["mesh_identity"] = "bit-identical across mesh sizes"
    print(out["mesh_identity"], flush=True)

    # ---- timing sweep ----
    k_lo, k_hi = (1, 3) if on_tpu else (1, 2)
    base_rays_per_s_dev = None
    for n in mesh_sizes:
        mesh = sharded.make_mesh(n)
        per_frame = marginal_s(
            make_chain(mesh), k_lo, k_hi,
            reps=3 if on_tpu else 1,
        )
        rps_dev = n_rays / per_frame / n
        row = {
            "frame_ms": per_frame * 1e3,
            "rays_per_s_per_device": rps_dev,
        }
        if base_rays_per_s_dev is None:
            base_rays_per_s_dev = rps_dev
        row["efficiency_vs_1dev"] = rps_dev / base_rays_per_s_dev
        out["mesh"][str(n)] = row
        print(f"mesh({n}): {per_frame * 1e3:.1f} ms  "
              f"{rps_dev / 1e6:.1f}M rays/s/dev  "
              f"eff {row['efficiency_vs_1dev']:.3f}", flush=True)

    # ---- the one number this hardware CAN give: mesh(1) shard_map tax ----
    if on_tpu and variant == "fused":
        lamb = pallas_trace.pack_lights(pipe.ds)
        o, d = generate_rays_tiled(cam_arrays, W, H, 32, 32)
        R = o.x.shape[0]
        o2 = Vec3(*(p.reshape(R // 128, 128) for p in o))
        d2 = Vec3(*(p.reshape(R // 128, 128) for p in d))

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain_unsharded(eps0, k: int):
            def body(i, eps):
                col = pallas_trace.frame_tiles(
                    *pipe.packed_dev[:4], lamb,
                    Vec3(o2.x + eps, o2.y, o2.z), d2,
                    bounces=args.bounces, leaf_size=pipe.leaf_size,
                    stack_depth=pipe.pallas_stack_depth,
                    cmat=pipe.packed_dev[4]
                    if len(pipe.packed_dev) >= 5 else None,
                    npop=pipe.npop, npop0=pipe.npop0,
                    adaptive=pipe.adaptive,
                )
                return eps + jnp.sum(col.x) * 1e-18

            return jax.lax.fori_loop(0, k, body, eps0)

        unsh = marginal_s(
            lambda k, j: chain_unsharded(j, k), k_lo, k_hi
        )
        out["shard_map_tax_mesh1"] = {
            "unsharded_frame_ms": unsh * 1e3,
            "sharded_mesh1_frame_ms": out["mesh"]["1"]["frame_ms"],
            "tax": out["mesh"]["1"]["frame_ms"] / (unsh * 1e3),
        }
        print(f"mesh(1) shard_map tax: "
              f"{out['shard_map_tax_mesh1']['tax']:.3f}x "
              f"({out['mesh']['1']['frame_ms']:.1f} vs {unsh * 1e3:.1f} ms)",
              flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metrics",
        "bench_scaling.json" if on_tpu else "bench_scaling_cpu.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
