"""Large-scene streaming benchmark: the reference's synthetic scaling axis
(cpu/src/main.c:115-131) taken past the VMEM ceiling.

Builds synthetic random-triangle scenes of growing size, measures the
primary closest-hit pass (chained methodology) with the resident kernels
where they fit and the HBM-streaming kernels beyond, and records where
the rays/s cliff lands. Writes metrics/bench_stream.json.
"""

from __future__ import annotations

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
from parallel_ray_tracer_tpu.ops.vecmath import Vec3

W, H = 1920, 1080


from _timing import marginal_ms  # noqa: E402  (shared jittered marginal)


def main():
    report = {}
    # Round 5 adds the 450k (largest resident-measurable) and 600k
    # (half-scale streamed) points so the 1M compute floor rests on a
    # resident-cost curve fitted through THREE measured resident points
    # (100k/300k/450k; 600k+ cannot run resident) instead of a
    # two-point extrapolation (round-4 verdict, "what's weak" #5).
    for n_tris in (100_000, 300_000, 450_000, 600_000, 1_000_000):
        base = dict(
            width=W, height=H, synthetic_triangles=n_tris, bvh_heuristic=6,
            tile_rows=32, tile_cols=32,
        )
        pipe = pipeline.prepare(RenderConfig(**base))
        # Resident-eligible sizes compare against a stream-forced prepare
        # (it keeps the MXU C-matrix table eligible, which the resident
        # prepare may drop on VMEM-budget grounds).
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

        def make_chain(pp, stream):
            # Scene arrays ride as jit ARGUMENTS: closing over them embeds
            # them as HLO constants, which at 1M triangles exceeds what the
            # remote-compile tunnel will buffer.
            scene = pp.packed_dev[:3] + (
                (pp.packed_dev[4],) if len(pp.packed_dev) >= 5 else ()
            )

            @functools.partial(jax.jit, static_argnames=("k",))
            def chain(ox0, scene, _o2, _d2, k: int):
                cbox, cmeta, tri = scene[:3]
                cmat = scene[3] if len(scene) > 3 else None

                def body(i, ox):
                    h = pallas_trace.closest_tiles(
                        cbox, cmeta, tri, Vec3(ox, _o2.y, _o2.z), _d2,
                        leaf_size=pp.leaf_size,
                        stack_depth=pp.pallas_stack_depth, dual=True,
                        stream=stream, cmat=cmat, npop=pp.npop,
                        adaptive=pp.adaptive,
                    )
                    return ox + jnp.where(h.t < 1.0, h.t, 0.0) * 1e-12
                return jnp.sum(jax.lax.fori_loop(0, k, body, ox0))

            return lambda ox0, k, j: chain(ox0 + j, scene, o2, d2, k)

        key = f"{n_tris}"
        report[key] = {"stream_auto": pipe.stream}
        modes = (
            [("stream", spipe)] if pipe.stream
            else [("resident", pipe), ("stream", spipe)]
        )
        for mode, pp in modes:
            fn = make_chain(pp, mode == "stream")
            ms = marginal_ms(lambda k, j: fn(o2.x, k, j))
            report[key][f"closest_{mode}_ms"] = ms
            report[key][f"rays_per_s_{mode}"] = n_rays / (ms / 1e3)
            print(n_tris, mode, f"{ms:.2f} ms", flush=True)

    # Resident-cost curve through the measured resident points
    # (ms ~ a * n * log2(n) + b — per-ray work scales with tree depth),
    # evaluated at the streamed-only sizes as their compute floor.
    import numpy as np

    pts = [
        (int(k), v["closest_resident_ms"])
        for k, v in report.items() if "closest_resident_ms" in v
    ]
    if len(pts) >= 2:
        xs = np.array([n * np.log2(n) for n, _ in pts])
        ys = np.array([ms for _, ms in pts])
        A = np.stack([xs, np.ones_like(xs)], axis=1)
        coef, *_ = np.linalg.lstsq(A, ys, rcond=None)
        fit = {"model": "ms = a*n*log2(n) + b",
               "a": float(coef[0]), "b": float(coef[1]),
               "points": pts}
        for k, v in report.items():
            n = int(k)
            pred = float(coef[0] * n * np.log2(n) + coef[1])
            v["resident_floor_fit_ms"] = pred
            if "closest_stream_ms" in v:
                v["stream_vs_fit_floor"] = v["closest_stream_ms"] / pred
        report["fit"] = fit

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metrics", "bench_stream.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
