"""Microbenchmark: does Mosaic issue bf16 VPU ops at 2x lane density?

Round-3 verdict #2: the reference's half-precision payoff is 2-lane SIMD
*compute* (half2 slab tests, gpu/src/bvh.cu:50-78), not storage.  The TPU
analog would be the inner-visit slab test in native bf16 vregs: a (16, 128)
bf16 tile occupies the same vector registers as an (8, 128) f32 tile, so IF
the VPU issues bf16 elementwise ops one vreg per cycle (like f32), the same
op count covers 2x the lanes and the achieved-issue floor halves.

This harness measures exactly that marginal issue rate on hardware, before
any kernel surgery:

  - chains of multiply-subtract (the slab FMS form) and min/max (the slab
    reduction form) at f32 (8,128), f32 (16,128), bf16 (8,128), bf16 (16,128)
  - the full 2-child slab test: f32 pair (two sequential (8,128) children,
    production form) vs bf16 packed pair (both children in ONE (16,128)
    bf16 tile, scalar plane pairs built with 6 sublane selects)

Interpretation: bf16 (16,128) at ~1x the f32 (8,128) time  => the 2x lever
is real; at ~2x (promoted to f32 internally) => document and stop.

Run on the real chip:  python scripts/microbench_bf16.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from parallel_ray_tracer_tpu.ops.pallas_trace import (  # noqa: E402
    LANES, SUBLANES, T_MAX, Vec3, _extract3, _slab_masked,
)

N_NODES = 4096


def _box_rows(dtype):
    rng = np.random.default_rng(1)
    mn = rng.uniform(-4, 3, size=(N_NODES, 2, 3)).astype(np.float32)
    mx = mn + rng.uniform(0.1, 1.0, size=(N_NODES, 2, 3)).astype(np.float32)
    rows = np.zeros((N_NODES, 16), np.float32)
    for k in range(2):
        rows[:, 6 * k : 6 * k + 3] = mn[:, k]
        rows[:, 6 * k + 3 : 6 * k + 6] = mx[:, k]
    return jnp.asarray(rows, dtype)


def _rand(shape, dtype):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=shape) + 2.0, dtype)


def _time_loop(kernel, args, k_lo=100_000, k_hi=600_000, reps=3):
    def timed(k):
        ks = jnp.asarray([k], jnp.int32)
        float(kernel(ks, *args)[0, 0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(kernel(ks, *args)[0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(k_lo), timed(k_hi)
    return (t_hi - t_lo) / (k_hi - k_lo) * 1e9


def _chain_bench(name, shape, dtype, op, n_ops=40):
    """ns/iter for a length-n_ops data-dependent elementwise chain."""

    def kernel(k_ref, a_ref, b_ref, out_ref):
        a0 = a_ref[:, :]
        b = b_ref[:, :]

        def step(i, a):
            for _ in range(n_ops):
                a = op(a, b)
            # keep the chain data-dependent across iterations
            return a

        a = jax.lax.fori_loop(0, k_ref[0], step, a0)
        out_ref[0, 0] = a.astype(jnp.float32).max()

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    a = _rand(shape, dtype)
    b = _rand(shape, dtype) * jnp.asarray(0.5, dtype)
    ns = _time_loop(fn, (a, b), k_lo=20_000, k_hi=120_000)
    per_op = ns / n_ops
    print(f"{name:40s} {ns:8.1f} ns/iter  {per_op:6.2f} ns/op")
    return per_op


def _chain_bench_ilp(name, shape, dtype, op, n_ops=40, lanes=4):
    """Same as _chain_bench but with `lanes` INDEPENDENT chains per
    iteration: if the serial chain is latency-bound, this exposes the
    true issue throughput (ns per op at full ILP)."""

    def kernel(k_ref, a_ref, b_ref, out_ref):
        a0 = a_ref[:, :]
        b = b_ref[:, :]

        def step(i, chains):
            new = []
            for a in chains:
                for _ in range(n_ops):
                    a = op(a, b)
                new.append(a)
            return tuple(new)

        chains = tuple(a0 + jnp.asarray(k, dtype) for k in range(lanes))
        chains = jax.lax.fori_loop(0, k_ref[0], step, chains)
        acc = chains[0]
        for c in chains[1:]:
            acc = acc + c
        out_ref[0, 0] = acc.astype(jnp.float32).max()

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    a = _rand(shape, dtype)
    b = _rand(shape, dtype) * jnp.asarray(0.5, dtype)
    ns = _time_loop(fn, (a, b), k_lo=10_000, k_hi=60_000)
    per_op = ns / (n_ops * lanes)
    print(f"{name:40s} {ns:8.1f} ns/iter  {per_op:6.2f} ns/op (x{lanes} ILP)")
    return per_op


def _slab_pair_f32(rows):
    """Production 2-child slab: two sequential (8,128) f32 children."""

    def kernel(k_ref, rows_ref, ox, oy, oz, dx, dy, dz, out_ref):
        o = Vec3(ox[:, :], oy[:, :], oz[:, :])
        d = Vec3(dx[:, :], dy[:, :], dz[:, :])
        inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
        oi = Vec3(o.x * inv.x, o.y * inv.y, o.z * inv.z)

        def step(i, carry):
            e, acc = carry
            row = rows_ref[pl.ds(e, 1), :]
            vl = _slab_masked(
                _extract3(row, 0), _extract3(row, 3), oi, inv, acc
            )
            vr = _slab_masked(
                _extract3(row, 6), _extract3(row, 9), oi, inv, acc
            )
            both = jnp.concatenate([vl, vr], axis=0)
            red = jnp.min(both, axis=1)
            ml = jnp.min(red[:SUBLANES])
            mr = jnp.min(red[SUBLANES:])
            e = (e + 1 + (ml < mr).astype(jnp.int32)) % N_NODES
            return e, jnp.minimum(acc, jnp.float32(T_MAX))

        e, acc = jax.lax.fori_loop(
            0, k_ref[0], step, (jnp.int32(0), jnp.float32(T_MAX))
        )
        out_ref[0, 0] = acc + e.astype(jnp.float32)

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    rays = [
        _rand((SUBLANES, LANES), jnp.float32) for _ in range(6)
    ]
    ns = _time_loop(fn, (rows,) + tuple(rays))
    print(f"{'slab 2-child f32 (8,128) x2':40s} {ns:8.1f} ns/visit")
    return ns


def _slab_pair_bf16(rows_bf16):
    """Both children in ONE (16,128) bf16 tile.

    Scalar plane pairs (child L in sublanes 0-7, child R in 8-15) built with
    6 sublane selects; rays pre-replicated to (16,128) bf16 outside the
    loop.  The reduction (min over lanes, then per-half) stays the same
    shape as production's concatenated form."""
    DOUBLE = 2 * SUBLANES

    def kernel(k_ref, rows_ref, ox, oy, oz, dx, dy, dz, out_ref):
        bf = jnp.bfloat16
        o = [ox[:, :], oy[:, :], oz[:, :]]
        d = [dx[:, :], dy[:, :], dz[:, :]]
        o2 = [jnp.concatenate([c, c], 0).astype(bf) for c in o]
        d2 = [jnp.concatenate([c, c], 0).astype(bf) for c in d]
        inv2 = [(jnp.float32(1.0) / c.astype(jnp.float32)).astype(bf)
                for c in d2]
        oi2 = [a * b for a, b in zip(o2, inv2)]
        half = jax.lax.broadcasted_iota(jnp.int32, (DOUBLE, LANES), 0) < SUBLANES

        def sel(a, b):
            return jnp.where(half, a, b).astype(bf)

        def step(i, carry):
            e, acc = carry
            row = rows_ref[pl.ds(e, 1), :]
            # child-pair scalar planes: (16,128) bf16, L in top half
            tmin = None
            tmax = None
            for c in range(3):
                lo = sel(row[0, c], row[0, 6 + c])
                hi = sel(row[0, 3 + c], row[0, 9 + c])
                t1 = lo * inv2[c] - oi2[c]
                t2 = hi * inv2[c] - oi2[c]
                lo_t = jnp.minimum(t1, t2)
                hi_t = jnp.maximum(t1, t2)
                tmin = lo_t if tmin is None else jnp.maximum(tmin, lo_t)
                tmax = hi_t if tmax is None else jnp.minimum(tmax, hi_t)
            # bf16 vector compares fail Mosaic lowering on v5e ("Target
            # does not support this comparison") — compare in f32.
            tminf = tmin.astype(jnp.float32)
            tmaxf = tmax.astype(jnp.float32)
            ok = (tmaxf >= tminf) & (tmaxf > 0.0)
            v = jnp.where(ok, tminf, jnp.float32(T_MAX))
            red = jnp.min(v, axis=1)
            ml = jnp.min(red[:SUBLANES])
            mr = jnp.min(red[SUBLANES:])
            e = (e + 1 + (ml < mr).astype(jnp.int32)) % N_NODES
            return e, jnp.minimum(acc, jnp.float32(T_MAX))

        e, acc = jax.lax.fori_loop(
            0, k_ref[0], step, (jnp.int32(0), jnp.float32(T_MAX))
        )
        out_ref[0, 0] = acc + e.astype(jnp.float32)

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    rays = [_rand((SUBLANES, LANES), jnp.float32) for _ in range(6)]
    ns = _time_loop(fn, (rows_bf16,) + tuple(rays))
    print(f"{'slab 2-child bf16 packed (16,128) x1':40s} {ns:8.1f} ns/visit")
    return ns


def main():
    print(f"devices: {jax.devices()}")
    out = {}

    fms = lambda a, b: a * b - b  # noqa: E731  (the slab FMS form)
    mnx = lambda a, b: jnp.minimum(jnp.maximum(a, b), b + a)  # noqa: E731

    out["fms_f32_8x128"] = _chain_bench(
        "mul-sub f32 (8,128)", (SUBLANES, LANES), jnp.float32, fms)
    out["fms_f32_16x128"] = _chain_bench(
        "mul-sub f32 (16,128)", (2 * SUBLANES, LANES), jnp.float32, fms)
    out["fms_bf16_8x128"] = _chain_bench(
        "mul-sub bf16 (8,128)", (SUBLANES, LANES), jnp.bfloat16, fms)
    out["fms_bf16_16x128"] = _chain_bench(
        "mul-sub bf16 (16,128)", (2 * SUBLANES, LANES), jnp.bfloat16, fms)
    out["fms_bf16_32x128"] = _chain_bench(
        "mul-sub bf16 (32,128)", (4 * SUBLANES, LANES), jnp.bfloat16, fms)
    out["minmax_f32_8x128"] = _chain_bench(
        "min-max f32 (8,128)", (SUBLANES, LANES), jnp.float32, mnx)
    out["minmax_bf16_16x128"] = _chain_bench(
        "min-max bf16 (16,128)", (2 * SUBLANES, LANES), jnp.bfloat16, mnx)
    # ILP variants: true issue throughput, not chain latency.
    out["fms_f32_8x128_ilp"] = _chain_bench_ilp(
        "mul-sub f32 (8,128) ILP4", (SUBLANES, LANES), jnp.float32, fms)
    out["fms_f32_16x128_ilp"] = _chain_bench_ilp(
        "mul-sub f32 (16,128) ILP4", (2 * SUBLANES, LANES), jnp.float32, fms)
    out["fms_f32_32x128_ilp"] = _chain_bench_ilp(
        "mul-sub f32 (32,128) ILP4", (4 * SUBLANES, LANES), jnp.float32, fms)
    out["minmax_f32_8x128_ilp"] = _chain_bench_ilp(
        "min-max f32 (8,128) ILP4", (SUBLANES, LANES), jnp.float32, mnx)
    out["minmax_f32_16x128_ilp"] = _chain_bench_ilp(
        "min-max f32 (16,128) ILP4", (2 * SUBLANES, LANES), jnp.float32, mnx)

    rows_f32 = _box_rows(jnp.float32)
    out["slab2_f32"] = _slab_pair_f32(rows_f32)
    try:
        out["slab2_bf16_packed"] = _slab_pair_bf16(rows_f32)
    except Exception as e:  # Mosaic lowering gaps recorded, not fatal
        out["slab2_bf16_packed"] = None
        out["slab2_bf16_packed_error"] = str(e)[:400]
        print(f"slab2_bf16_packed: FAILED TO COMPILE: {str(e)[:160]}")
    # bf16 vector compares do not lower on this target (measured earlier
    # runs); record the fact for DESIGN 9b.
    out["bf16_vector_compare"] = "unsupported: Mosaic 'Target does not support this comparison' for vector<...bf16> cmpf"

    ratio = out["fms_bf16_16x128"] / out["fms_f32_8x128"]
    print(f"\nbf16(16,128) / f32(8,128) mul-sub ratio: {ratio:.2f} "
          f"(1.0 => full 2x lane-density win; 2.0 => promoted, no win)")
    os.makedirs("metrics", exist_ok=True)
    with open("metrics/microbench_bf16.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote metrics/microbench_bf16.json")


if __name__ == "__main__":
    main()
