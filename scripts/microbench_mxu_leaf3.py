"""MXU leaf microbench v3: compact C storage + matmul precision/accuracy.

v2 established 117 ns/leaf (vs 438 VPU) with the lane-grouped layout, but
stored C as (G*32, 16) rows, which VMEM lane-pads to 128 lanes = 16 KB per
leaf group (car_boxed alone would need 92 MB). v3 answers:

  1. Cost of storing C compactly as (G*4, 128) f32 rows (2 KB/group) and
     reshaping (4,128) -> (32,16) in-kernel before the matmul.
  2. Whether Mosaic's default f32 dot_general precision is accurate enough
     for hit tests (vs precision=HIGHEST), by comparing against the VPU
     scalar Moller-Trumbore on realistic triangle data.
  3. Pad check: whether (N,16) really lane-pads (VMEM limit probe).
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

G = 512
EPS = 1e-3


def _hit_block(blk):
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
    return jnp.where(hit, tj, T_MAX)


def mxu_kernel(iters, compact: bool, precision):
    def kernel(rmat, cmat, out):
        R = rmat[:, :]

        def body(i, carry):
            t, g = carry
            if compact:
                C = cmat[pl.ds(g * 4, 4), :].reshape(32, 16)
            else:
                C = cmat[pl.ds(g * 32, 32), :]
            outm = jax.lax.dot_general(
                C, R, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            rows = []
            for r in range(8):
                tcand = _hit_block(outm[:, r * 128 : r * 128 + 128])
                rows.append(jnp.min(tcand, axis=0, keepdims=True))
            t = jnp.minimum(t, jnp.concatenate(rows, axis=0))
            g = (g + 1) & (G - 1)
            return t, g

        t, _ = jax.lax.fori_loop(
            0, iters, body,
            (jnp.full((8, 128), T_MAX, jnp.float32), jnp.int32(0)),
        )
        out[:, :] = t

    return kernel


@functools.partial(jax.jit, static_argnames=("iters", "compact", "prec"))
def run_mxu(jit_eps, rmat, cmat, iters, compact, prec):
    rmat = rmat + jit_eps
    precision = {
        "default": None,
        "highest": jax.lax.Precision.HIGHEST,
    }[prec]
    return pl.pallas_call(
        mxu_kernel(iters, compact, precision),
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


# --- accuracy: realistic scene-scale triangles, MXU vs VPU -----------------

def build_cmat(v0, e1, e2):
    """C rows per tri j: det(j), tn(8+j), un(16+j), vn(24+j) over
    R = [d(3), M=o x d(3), o(3), 1, pad(6)]."""
    n = np.cross(e1, e2)
    c2 = np.cross(e2, v0)
    c1 = np.cross(e1, v0)
    T = v0.shape[0]
    C = np.zeros((4, T, 16), np.float32)
    C[0, :, 0:3] = -n                                   # det = -n.d
    C[1, :, 6:9] = n                                    # tn = n.o - n.v0
    C[1, :, 9] = -np.sum(n * v0, axis=1)
    C[2, :, 3:6] = e2                                   # un = e2.M - (e2xv0).d
    C[2, :, 0:3] = -c2
    C[3, :, 3:6] = -e1                                  # vn = (e1xv0).d - e1.M
    C[3, :, 0:3] = c1
    return C.reshape(4 * T, 16)


def accuracy_check():
    rng = np.random.RandomState(1)
    T = 8
    # scene-scale: vertices in [-50, 50], rays from a camera-ish origin
    v0 = rng.uniform(-50, 50, (T, 3)).astype(np.float32)
    e1 = rng.uniform(-8, 8, (T, 3)).astype(np.float32)
    e2 = rng.uniform(-8, 8, (T, 3)).astype(np.float32)
    o = np.tile(rng.uniform(-60, -40, (1, 3)), (1024, 1)).astype(np.float32)
    d = rng.uniform(-1, 1, (1024, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    # VPU reference via the kernel's own scalar path, run in interpret mode
    n = np.cross(e1, e2)
    tri_row = np.zeros((1, 128), np.float32)
    tri_row[0, : 12 * T] = np.concatenate(
        [v0, e1, e2, n], axis=1
    ).reshape(-1)

    from parallel_ray_tracer_tpu.ops.vecmath import Vec3
    ov = Vec3(*(jnp.asarray(o[:, k].reshape(8, 128)) for k in range(3)))
    dv = Vec3(*(jnp.asarray(d[:, k].reshape(8, 128)) for k in range(3)))
    ts = []
    for j in range(T):
        tj, _ = _mt_scalar_tri(ov, dv, jnp.asarray(tri_row), j)
        ts.append(np.asarray(tj))
    t_ref = np.minimum.reduce(ts)                        # (8,128)

    C = build_cmat(v0, e1, e2)
    # reorder rows to block layout det*8, tn*8, un*8, vn*8
    Cb = np.concatenate(
        [C.reshape(4, T, 16)[q] for q in range(4)], axis=0
    )
    M = np.cross(o, d)
    R = np.zeros((16, 1024), np.float32)
    R[0:3] = d.T
    R[3:6] = M.T
    R[6:9] = o.T
    R[9] = 1.0
    # lane grouping: ray (r, c) of the (8,128) planes -> lane r*128+c;
    # reshape(8,128) row-major matches ray index r*128+c directly.
    for prec in ("default", "highest"):
        pv = {"default": None, "highest": jax.lax.Precision.HIGHEST}[prec]
        outm = jax.jit(
            lambda c, r: jax.lax.dot_general(
                c, r, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=pv,
            )
        )(jnp.asarray(Cb), jnp.asarray(R))
        outm = np.asarray(outm)
        det = outm[0:8]
        tn = outm[8:16]
        un = outm[16:24]
        vn = outm[24:32]
        with np.errstate(divide="ignore", invalid="ignore"):
            tj = tn / det
            u = un / det
            v = vn / det
        hit = (
            (np.abs(det) >= EPS) & (tj > EPS) & (u >= 0) & (v >= 0)
            & (u + v <= 1)
        )
        tm = np.where(hit, tj, T_MAX).min(axis=0).reshape(8, 128)
        both = (t_ref < T_MAX) & (tm < T_MAX)
        relerr = np.abs(tm - t_ref)[both] / np.maximum(t_ref[both], 1e-6)
        disagree = int(((t_ref < T_MAX) != (tm < T_MAX)).sum())
        print(f"accuracy[{prec}]: hits_ref={int((t_ref < T_MAX).sum())} "
              f"disagree={disagree} max_rel_t_err="
              f"{relerr.max() if relerr.size else 0:.2e}")


def main():
    accuracy_check()
    rng = np.random.RandomState(0)
    rmat = jnp.asarray(rng.uniform(-1, 1, (16, 1024)).astype(np.float32))
    cpad = jnp.asarray(rng.uniform(-1, 1, (G * 32, 16)).astype(np.float32))
    ccmp = jnp.asarray(rng.uniform(-1, 1, (G * 4, 128)).astype(np.float32))
    timeit("mxu padded  f32 default", run_mxu, rmat, cpad,
           compact=False, prec="default")
    timeit("mxu compact f32 default", run_mxu, rmat, ccmp,
           compact=True, prec="default")
    timeit("mxu compact f32 highest", run_mxu, rmat, ccmp,
           compact=True, prec="highest")


if __name__ == "__main__":
    main()
