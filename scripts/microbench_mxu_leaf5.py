"""MXU leaf microbench v5: manual bf16x3 matmul — the accuracy/speed middle.

v4 killed the two endpoints: default dot precision is bf16x1 (1.6e-3 rel
err — half-precision geometry, visible artifacts) and HIGHEST is 345 ns
(barely beats the 438 ns VPU floor). The classic middle is bf16x3: split
each f32 operand into hi+lo bf16 halves and take the three significant
cross products

    C @ R  ~=  Ch@Rh + Ch@Rl + Cl@Rh        (residual ~ Cl@Rl ~ 2^-16 rel)

at the MXU's native bf16 rate. C's halves are precomputed at pack time
(two bf16 arrays, 1 KB per leaf group total); R's halves are built once
per packet. This times bf16x3 with and without (idx, nd) tracking, and
checks accuracy on rays aimed AT the triangles (hundreds of real hits,
unlike v3's single-hit check).
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

from parallel_ray_tracer_tpu.ops.pallas_trace import T_MAX, _mt_scalar_tri
from parallel_ray_tracer_tpu.ops.vecmath import Vec3

G = 512
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


def mxu_kernel(iters, full: bool):
    def kernel(rmat, ch_ref, cl_ref, out):
        Rh, Rl = split_bf16(rmat[:, :])

        def body(i, carry):
            t, g = carry
            Ch = ch_ref[pl.ds(g * 32, 32), :]
            Cl = cl_ref[pl.ds(g * 32, 32), :]
            outm = _dot(Ch, Rh) + _dot(Ch, Rl) + _dot(Cl, Rh)
            rows = []
            irows = []
            for r in range(8):
                blk = outm[:, r * 128 : r * 128 + 128]
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
                rmin = jnp.min(tcand, axis=0, keepdims=True)
                rows.append(rmin)
                if full:
                    jio = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                    icand = jnp.where(tcand <= rmin, jio, 8)
                    irows.append(jnp.min(icand, axis=0, keepdims=True))
            tnew = jnp.concatenate(rows, axis=0)
            if full:
                inew = jnp.concatenate(irows, axis=0)
                better = tnew < t
                t = jnp.where(better, tnew, t)
                t = t + jnp.where(inew < 0, 1.0, 0.0)
            else:
                t = jnp.minimum(t, tnew)
            g = (g + 1) & (G - 1)
            return t, g

        t, _ = jax.lax.fori_loop(
            0, iters, body,
            (jnp.full((8, 128), T_MAX, jnp.float32), jnp.int32(0)),
        )
        out[:, :] = t

    return kernel


@functools.partial(jax.jit, static_argnames=("iters", "full"))
def run_mxu(jit_eps, rmat, ch, cl, iters, full=False):
    rmat = rmat + jit_eps
    return pl.pallas_call(
        mxu_kernel(iters, full),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(rmat, ch, cl)


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


def build_cmat(v0, e1, e2):
    n = np.cross(e1, e2)
    c2 = np.cross(e2, v0)
    c1 = np.cross(e1, v0)
    T = v0.shape[0]
    C = np.zeros((4, T, 16), np.float32)
    C[0, :, 0:3] = -n
    C[1, :, 6:9] = n
    C[1, :, 9] = -np.sum(n * v0, axis=1)
    C[2, :, 3:6] = e2
    C[2, :, 0:3] = -c2
    C[3, :, 3:6] = -e1
    C[3, :, 0:3] = c1
    return np.concatenate([C[q] for q in range(4)], axis=0)  # (32,16) blocks


def accuracy_check():
    rng = np.random.RandomState(1)
    T = 8
    v0 = rng.uniform(-30, 30, (T, 3)).astype(np.float32)
    e1 = rng.uniform(-10, 10, (T, 3)).astype(np.float32)
    e2 = rng.uniform(-10, 10, (T, 3)).astype(np.float32)
    o = np.tile(np.array([[0.0, 0.0, -80.0]], np.float32), (1024, 1))
    # aim rays at random barycentric points of random triangles
    ti = rng.randint(0, T, 1024)
    a = rng.uniform(0, 1, (1024, 1)).astype(np.float32)
    b = (rng.uniform(0, 1, (1024, 1)) * (1 - a)).astype(np.float32)
    target = v0[ti] + a * e1[ti] + b * e2[ti]
    d = (target - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True).astype(np.float32)

    n = np.cross(e1, e2)
    tri_row = np.zeros((1, 128), np.float32)
    tri_row[0, : 12 * T] = np.concatenate([v0, e1, e2, n], 1).reshape(-1)
    ov = Vec3(*(jnp.asarray(o[:, k].reshape(8, 128)) for k in range(3)))
    dv = Vec3(*(jnp.asarray(d[:, k].reshape(8, 128)) for k in range(3)))
    ts = []
    for j in range(T):
        tj, _ = _mt_scalar_tri(ov, dv, jnp.asarray(tri_row), j)
        ts.append(np.asarray(tj))
    t_ref = np.minimum.reduce(ts)

    C = jnp.asarray(build_cmat(v0, e1, e2))
    M = np.cross(o, d)
    R = np.zeros((16, 1024), np.float32)
    R[0:3] = d.T
    R[3:6] = M.T
    R[6:9] = o.T
    R[9] = 1.0
    R = jnp.asarray(R)

    def mm(kind):
        if kind == "bf16x3":
            Ch, Cl = split_bf16(C)
            Rh, Rl = split_bf16(R)
            return np.asarray(_dot(Ch, Rh) + _dot(Ch, Rl) + _dot(Cl, Rh))
        prec = {"default": None,
                "highest": jax.lax.Precision.HIGHEST}[kind]
        return np.asarray(jax.lax.dot_general(
            C, R, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec))

    for kind in ("default", "bf16x3", "highest"):
        outm = mm(kind)
        det, tn, un, vn = (outm[0:8], outm[8:16], outm[16:24], outm[24:32])
        with np.errstate(divide="ignore", invalid="ignore"):
            tj = tn / det
            u = un / det
            v = vn / det
        hit = ((np.abs(det) >= EPS) & (tj > EPS) & (u >= 0) & (v >= 0)
               & (u + v <= 1))
        tm = np.where(hit, tj, T_MAX).min(axis=0).reshape(8, 128)
        both = (t_ref < T_MAX) & (tm < T_MAX)
        relerr = (np.abs(tm - t_ref)[both]
                  / np.maximum(t_ref[both], 1e-6))
        disagree = int(((t_ref < T_MAX) != (tm < T_MAX)).sum())
        print(f"accuracy[{kind}]: hits_ref={int((t_ref < T_MAX).sum())}"
              f"/1024 disagree={disagree} "
              f"max_rel_t_err={relerr.max() if relerr.size else 0:.2e}",
              flush=True)


def main():
    accuracy_check()
    rng = np.random.RandomState(0)
    rmat = jnp.asarray(rng.uniform(-1, 1, (16, 1024)).astype(np.float32))
    c = jnp.asarray(rng.uniform(-1, 1, (G * 32, 16)).astype(np.float32))
    ch, cl = split_bf16(c)
    timeit("bf16x3      ", run_mxu, rmat, ch, cl)
    timeit("bf16x3 full ", run_mxu, rmat, ch, cl, full=True)


if __name__ == "__main__":
    main()
