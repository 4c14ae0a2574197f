"""MXU leaf microbench v2: lane-grouped layout, no relayout.

v1 (microbench_mxu_leaf.py) put all 1024 rays in the matmul's lane dim and
paid 8x-inefficient (1,1024)-shaped hit logic, measuring ~456 ns/leaf vs the
VPU's 433 ns floor. v2 groups the matmul's 1024 lanes by RAY ROW (8 groups
of 128), so the (32,1024) output statically slices into native (8,128)
vregs per ray row with sublane = triangle:

    out[:, r*128:(r+1)*128][0:8]  = det of tris 0..7 for ray row r
                         [8:16]   = t_num
                         [16:24]  = u_num
                         [24:32]  = v_num

Hit logic then runs at full VPU rate (1 cycle/op per (8,128) vreg) on all
8 triangles at once, the per-ray min over triangles is a sublane reduce,
and the 8 per-row (1,128) results reassemble into the packet's native
(8,128) t plane — zero relayouts.

Variants timed (ns per 8-triangle leaf visit, 1024 rays):
  vpu      current scalar-broadcast Moller-Trumbore (baseline)
  mxu32    f32 C (32,16) @ f32 R (16,1024), lane-grouped hit logic
  mxu16    same with bf16 C and R (native MXU rate)
  mxu32x4  L=32 leaf: f32 C (128,16) one matmul, 4x hit logic
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

from parallel_ray_tracer_tpu.ops.pallas_trace import (
    _load_rays, _mt_scalar_tri, T_MAX,
)

G = 512          # leaf groups resident
EPS = 1e-3


def vpu_kernel(iters, L=8):
    def kernel(ox, oy, oz, dx, dy, dz, tri, out):
        o, d, inv, _oi = _load_rays(ox, oy, oz, dx, dy, dz)

        def body(i, carry):
            t, g = carry
            row = tri[pl.ds(g, 1), :].astype(jnp.float32)
            for j in range(L):
                tj, _ = _mt_scalar_tri(o, d, row, j)
                t = jnp.minimum(t, tj)
            g = (g + 1) & (G - 1)
            return t, g

        t, _ = jax.lax.fori_loop(
            0, iters, body,
            (jnp.full((8, 128), T_MAX, jnp.float32), jnp.int32(0)),
        )
        out[:, :] = t

    return kernel


def _hit_block(blk):
    """(32,128) matmul slab for one ray row -> (1,128) min-t over 8 tris."""
    det = blk[0:8, :]
    tn = blk[8:16, :]
    un = blk[16:24, :]
    vn = blk[24:32, :]
    invdet = 1.0 / det
    tj = tn * invdet
    u = un * invdet
    v = vn * invdet
    hit = (
        (jnp.abs(det) >= EPS)
        & (tj > EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & ((u + v) <= 1.0)
    )
    tcand = jnp.where(hit, tj, T_MAX)
    return jnp.min(tcand, axis=0, keepdims=True)   # (1,128)


def mxu_kernel(iters, rows_per_leaf=32, dtype=jnp.float32):
    def kernel(rmat, cmat, out):
        R = rmat[:, :].astype(dtype)               # (16, 1024), lane-grouped

        def body(i, carry):
            t, g = carry
            C = cmat[pl.ds(g * rows_per_leaf, rows_per_leaf), :].astype(dtype)
            outm = jax.lax.dot_general(
                C, R, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                       # (rows_per_leaf, 1024)
            rows = []
            for r in range(8):
                lane0 = r * 128
                tmins = [
                    _hit_block(outm[32 * b : 32 * b + 32, lane0 : lane0 + 128])
                    for b in range(rows_per_leaf // 32)
                ]
                m = tmins[0]
                for extra in tmins[1:]:
                    m = jnp.minimum(m, extra)
                rows.append(m)
            tnew = jnp.concatenate(rows, axis=0)    # (8,128) native
            t = jnp.minimum(t, tnew)
            g = (g + 1) & (G - 1)
            return t, g

        t, _ = jax.lax.fori_loop(
            0, iters, body,
            (jnp.full((8, 128), T_MAX, jnp.float32), jnp.int32(0)),
        )
        out[:, :] = t

    return kernel


@functools.partial(jax.jit, static_argnames=("iters",))
def run_vpu(jit_eps, ox, oy, oz, dx, dy, dz, tri, iters):
    ox = ox + jit_eps
    return pl.pallas_call(
        vpu_kernel(iters),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(ox, oy, oz, dx, dy, dz, tri)


@functools.partial(jax.jit, static_argnames=("iters", "rows", "bf16"))
def run_mxu(jit_eps, rmat, cmat, iters, rows, bf16):
    rmat = rmat + jit_eps
    return pl.pallas_call(
        mxu_kernel(iters, rows, jnp.bfloat16 if bf16 else jnp.float32),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(rmat, cmat)


def timeit(name, fn, *args, **kw):
    rep = [0]

    def call(iters):
        rep[0] += 1
        return float(
            jnp.sum(fn(jnp.float32(rep[0] * 1e-7), *args, iters=iters, **kw))
        )

    pts = (2048, 8192, 32768)
    for iters in pts:
        call(iters)  # warm compile
    best = {}
    raw = {}
    for iters in pts:
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            call(iters)
            ts.append(time.perf_counter() - t0)
        best[iters] = min(ts)
        raw[iters] = sorted(ts)
    m1 = (best[8192] - best[2048]) / (8192 - 2048)
    m2 = (best[32768] - best[8192]) / (32768 - 8192)
    print(f"{name}: marg(2k-8k)={m1*1e9:.0f} ns  marg(8k-32k)={m2*1e9:.0f} ns")
    for it in pts:
        print(f"  iters={it}: best={best[it]*1e3:.2f} ms "
              f"med={raw[it][3]*1e3:.2f} ms", flush=True)
    return m2


def main():
    rng = np.random.RandomState(0)
    planes = [
        jnp.asarray(rng.uniform(-1, 1, (8, 128)).astype(np.float32))
        for _ in range(6)
    ]
    tri = jnp.asarray(rng.uniform(-1, 1, (G, 128)).astype(np.float32))
    vpu = timeit("vpu  (L=8) ", run_vpu, *planes, tri)

    rmat = jnp.asarray(rng.uniform(-1, 1, (16, 1024)).astype(np.float32))
    cmat32 = jnp.asarray(rng.uniform(-1, 1, (G * 32, 16)).astype(np.float32))
    cmat128 = jnp.asarray(
        rng.uniform(-1, 1, (G * 128, 16)).astype(np.float32)
    )
    m32 = timeit("mxu32 (L=8) ", run_mxu, rmat, cmat32, rows=32, bf16=False)
    m16 = timeit("mxu16 (L=8) ", run_mxu, rmat, cmat32, rows=32, bf16=True)
    m128 = timeit("mxu32 (L=32)", run_mxu, rmat, cmat128, rows=128, bf16=False)
    print(f"\nper-leaf:  vpu={vpu*1e9:.0f}  mxu_f32={m32*1e9:.0f}  "
          f"mxu_bf16={m16*1e9:.0f}  mxu_f32_L32={m128*1e9:.0f} ns")
    print(f"speedup f32: {vpu/m32:.2f}x   bf16: {vpu/m16:.2f}x   "
          f"L32-vs-4xVPU: {4*vpu/m128:.2f}x")


if __name__ == "__main__":
    main()
