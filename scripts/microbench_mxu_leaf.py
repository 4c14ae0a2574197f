"""Feasibility microbench: MXU-based leaf evaluation vs VPU Möller-Trumbore.

Möller-Trumbore's four per-triangle quantities are linear in the per-ray
vector R = [d(3), M=o x d(3), o(3), 1]:

    det   = d . (-n)
    t_num = o . n - (v0 . n)
    u_num = M . e2 - d . (e2 x v0)
    v_num = d . (e1 x v0) - M . e1

so one leaf of 8 triangles is a (32, 16) constant matrix C (4 outputs x 8
tris, K=10 padded to 16), and a packet's leaf test is OUT = C @ R with
R (16, 1024) built once per packet. This script times, per loop iteration
inside one kernel:

  a) the current VPU scalar-broadcast MT of 8 triangles on (8,128) planes;
  b) the matmul C @ R on (16, 1024) lane-major planes + the same hit logic.

If (b) is much cheaper, a lane-major kernel rewrite is justified.
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

G = 512          # leaf groups
L = 8
EPS = 1e-3


def vpu_kernel(iters):
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


def mxu_kernel(iters):
    def kernel(rmat, cmat, out):
        R = rmat[:, :]            # (16, 1024) per-ray matrix

        def body(i, carry):
            t, g = carry
            C = cmat[pl.ds(g * 32, 32), :]    # (32, 16) leaf constants
            outm = jax.lax.dot_general(
                C, R, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                  # (32, 1024)
            for j in range(L):
                det = outm[4 * j : 4 * j + 1, :]
                tn = outm[4 * j + 1 : 4 * j + 2, :]
                un = outm[4 * j + 2 : 4 * j + 3, :]
                vn = outm[4 * j + 3 : 4 * j + 4, :]
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
                t = jnp.minimum(t, jnp.where(hit, tj, T_MAX))
            g = (g + 1) & (G - 1)
            return t, g

        t, _ = jax.lax.fori_loop(
            0, iters, body,
            (jnp.full((1, 1024), T_MAX, jnp.float32), jnp.int32(0)),
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


@functools.partial(jax.jit, static_argnames=("iters",))
def run_mxu(jit_eps, rmat, cmat, iters):
    rmat = rmat + jit_eps
    return pl.pallas_call(
        mxu_kernel(iters),
        out_shape=jax.ShapeDtypeStruct((1, 1024), jnp.float32),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(rmat, cmat)


def timeit(fn, *args):
    # Input jitter per call: the remote tunnel caches identical dispatches.
    rep = [0]

    def call(iters):
        rep[0] += 1
        return float(jnp.sum(fn(jnp.float32(rep[0] * 1e-7), *args, iters=iters)))

    for iters in (2048, 16384):
        call(iters)
    ts = {}
    for iters in (2048, 16384):
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            call(iters)
            best = min(best, time.perf_counter() - t0)
        ts[iters] = best
    return (ts[16384] - ts[2048]) / (16384 - 2048)


def main():
    rng = np.random.RandomState(0)
    planes = [
        jnp.asarray(rng.uniform(-1, 1, (8, 128)).astype(np.float32))
        for _ in range(6)
    ]
    tri = jnp.asarray(rng.uniform(-1, 1, (G, 128)).astype(np.float32))
    per_leaf_vpu = timeit(run_vpu, *planes, tri)
    print(f"VPU leaf (8 tris, 1024 rays): {per_leaf_vpu*1e9:.0f} ns", flush=True)

    rmat = jnp.asarray(rng.uniform(-1, 1, (16, 1024)).astype(np.float32))
    cmat = jnp.asarray(rng.uniform(-1, 1, (G * 32, 16)).astype(np.float32))
    per_leaf_mxu = timeit(run_mxu, rmat, cmat)
    print(f"MXU leaf (8 tris, 1024 rays): {per_leaf_mxu*1e9:.0f} ns", flush=True)
    print(f"speedup: {per_leaf_vpu/per_leaf_mxu:.2f}x")


if __name__ == "__main__":
    main()
