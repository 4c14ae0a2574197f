"""MXU leaf microbench v6: VMEM-efficient C-matrix layouts.

v5's winning bf16x3 path stores C as (G*32, 16) bf16 — but Mosaic pads the
16-lane minor dim to 128, so the table occupies 8x its logical size in
VMEM (65 MB per half for car_boxed: the full-scene kernel OOMs VMEM).
This bench times two layouts that waste no lanes:

  T1  transposed blocks: ct (16, nblk*128) bf16 with 4 leaf groups per
      128-lane block (lane b*128 + 32*q2 + row). Per visit: dynamic lane
      slice at 128 granularity, dot_general contracting dim 0 of BOTH
      operands -> (128, 1024) covering 4 groups, then extract the active
      group's 32 rows with two scalar-predicate selects.
  T2  interleaved halves: one (G*32, 32) array with [hi(16) | lo(16)]
      per row — halves the padded footprint vs two separate tables
      (still 8x-ish padded; fallback if T1's dot form won't compile).

Baselines: v5's (G*32,16) two-table form, and the VPU scalar MT leaf.
"""

import functools
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

from parallel_ray_tracer_tpu.ops.pallas_trace import T_MAX

G = 512  # leaf groups in the table
EPS = 1e-3


def split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_t(a, b):
    """Contract dim 0 of both: (16, M) x (16, N) -> (M, N)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _hit_rows(outm):
    rows = []
    for r in range(8):
        blk = outm[:, r * 128 : r * 128 + 128]
        det = blk[0:8, :]
        invdet = 1.0 / det
        tj = blk[8:16, :] * invdet
        u = blk[16:24, :] * invdet
        v = blk[24:32, :] * invdet
        hit = (
            (jnp.abs(det) >= EPS)
            & (tj > EPS)
            & (u >= 0.0)
            & (v >= 0.0)
            & ((u + v) <= 1.0)
        )
        tcand = jnp.where(hit, tj, T_MAX)
        rows.append(jnp.min(tcand, axis=0, keepdims=True))
    return jnp.concatenate(rows, axis=0)


def kernel_v5(iters):
    """Baseline: (G*32,16) two-table refs (v5 winner, VMEM-padded 8x)."""
    def kernel(rmat, ch_ref, cl_ref, out):
        Rh, Rl = split_bf16(rmat[:, :])

        def body(i, carry):
            t, g = carry
            Ch = ch_ref[pl.ds(g * 32, 32), :]
            Cl = cl_ref[pl.ds(g * 32, 32), :]
            outm = _dot(Ch, Rh) + _dot(Ch, Rl) + _dot(Cl, Rh)
            t = jnp.minimum(t, _hit_rows(outm))
            return t, (g + 1) & (G - 1)

        t, _ = jax.lax.fori_loop(
            0, iters, body,
            (jnp.full((8, 128), T_MAX, jnp.float32), jnp.int32(0)),
        )
        out[:, :] = t

    return kernel


def kernel_t1(iters, extract: str):
    """Transposed blocks (16, nblk*128); extract in {'static','select'}."""
    def kernel(rmat, cth_ref, ctl_ref, out):
        Rh, Rl = split_bf16(rmat[:, :])

        def body(i, carry):
            t, g = carry
            b = g // 4
            q2 = g - 4 * b
            Ch = cth_ref[:, pl.ds(b * 128, 128)]
            Cl = ctl_ref[:, pl.ds(b * 128, 128)]
            big = _dot_t(Ch, Rh) + _dot_t(Ch, Rl) + _dot_t(Cl, Rh)
            if extract == "static":
                outm = big[0:32, :]
            else:
                half = jnp.where(q2 < 2, big[0:64, :], big[64:128, :])
                outm = jnp.where(
                    (q2 == 0) | (q2 == 2), half[0:32, :], half[32:64, :]
                )
            t = jnp.minimum(t, _hit_rows(outm))
            return t, (g + 1) & (G - 1)

        t, _ = jax.lax.fori_loop(
            0, iters, body,
            (jnp.full((8, 128), T_MAX, jnp.float32), jnp.int32(0)),
        )
        out[:, :] = t

    return kernel


def kernel_t2(iters):
    """Interleaved halves: one (G*32, 32) ref, [hi|lo] per row."""
    def kernel(rmat, c_ref, out):
        Rh, Rl = split_bf16(rmat[:, :])

        def body(i, carry):
            t, g = carry
            Crow = c_ref[pl.ds(g * 32, 32), :]
            Ch = Crow[:, 0:16]
            Cl = Crow[:, 16:32]
            outm = _dot(Ch, Rh) + _dot(Ch, Rl) + _dot(Cl, Rh)
            t = jnp.minimum(t, _hit_rows(outm))
            return t, (g + 1) & (G - 1)

        t, _ = jax.lax.fori_loop(
            0, iters, body,
            (jnp.full((8, 128), T_MAX, jnp.float32), jnp.int32(0)),
        )
        out[:, :] = t

    return kernel


@functools.partial(jax.jit, static_argnames=("iters", "which", "extract"))
def run(jit_eps, rmat, args, iters, which, extract="select"):
    rmat = rmat + jit_eps
    if which == "v5":
        kern = kernel_v5(iters)
    elif which == "t1":
        kern = kernel_t1(iters, extract)
    else:
        kern = kernel_t2(iters)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(args)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(rmat, *args)


def timeit(name, fn):
    rep = [0]

    def call(iters):
        rep[0] += 1
        return float(jnp.sum(fn(jnp.float32(rep[0] * 1e-7), iters)))

    pts = (2048, 8192, 32768)
    for iters in pts:
        call(iters)
    best = {}
    for iters in pts:
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            call(iters)
            ts.append(time.perf_counter() - t0)
        best[iters] = min(ts)
    m2 = (best[32768] - best[8192]) / (32768 - 8192)
    print(f"{name}: per-leaf {m2*1e9:.0f} ns   "
          f"(best {best[2048]*1e3:.2f}/{best[8192]*1e3:.2f}/"
          f"{best[32768]*1e3:.2f} ms)", flush=True)
    return m2


def main():
    rng = np.random.RandomState(0)
    C = rng.uniform(-5, 5, (G * 32, 16)).astype(np.float32)
    R = rng.uniform(-1, 1, (16, 1024)).astype(np.float32)

    ch = jnp.asarray(C.astype(jnp.bfloat16))
    cl = jnp.asarray((C - np.asarray(ch, np.float32)).astype(jnp.bfloat16))

    # T1 layout: block b's 128 lanes are C rows [b*128, (b+1)*128) transposed.
    nblk = G // 4
    Ct = np.zeros((16, nblk * 128), np.float32)
    for b in range(nblk):
        Ct[:, b * 128 : (b + 1) * 128] = C[b * 128 : (b + 1) * 128, :].T
    cth = jnp.asarray(Ct.astype(jnp.bfloat16))
    ctl = jnp.asarray((Ct - np.asarray(cth, np.float32)).astype(jnp.bfloat16))

    # T2 layout: [hi|lo] interleaved, (G*32, 32)
    c2 = jnp.asarray(
        np.concatenate([np.asarray(ch), np.asarray(cl)], axis=1)
    )

    rmat = jnp.asarray(R)

    # Correctness cross-check: t1/t2 must reproduce v5's output exactly.
    out_v5 = run(jnp.float32(0.0), rmat, (ch, cl), iters=G, which="v5")
    out_t1 = run(jnp.float32(0.0), rmat, (cth, ctl), iters=G, which="t1")
    out_t2 = run(jnp.float32(0.0), rmat, (c2,), iters=G, which="t2")
    print("t1 == v5:", bool(jnp.all(out_t1 == out_v5)),
          " t2 == v5:", bool(jnp.all(out_t2 == out_v5)), flush=True)

    timeit("v5 (G*32,16) two tables ", lambda e, i: run(
        e, rmat, (ch, cl), iters=i, which="v5"))
    timeit("t1 transp blocks select ", lambda e, i: run(
        e, rmat, (cth, ctl), iters=i, which="t1"))
    timeit("t1 transp blocks static ", lambda e, i: run(
        e, rmat, (cth, ctl), iters=i, which="t1", extract="static"))
    timeit("t2 interleaved [hi|lo]  ", lambda e, i: run(
        e, rmat, (c2,), iters=i, which="t2"))


if __name__ == "__main__":
    main()
