"""MXU leaf microbench v4: precision cost, compact-assembly cost, VMEM probes.

Findings so far: lane-grouped MXU leaf = 80-117 ns vs 438 ns VPU (v2/v3), but
(a) default dot precision is bf16-grade (1.6e-3 rel err on t) — HIGH/HIGHEST
    needed; what do they cost?
(b) Mosaic can't reshape (4,128)->(32,16); compact storage needs another
    assembly. Here: C stored (G*8, 64) — row j = [det|tn|un|vn] 16-coef
    blocks of triangle j — assembled per leaf with four static (8,16) lane
    slices + one sublane concat into (32,16), q-major rows. 4 KB/group if
    (N,64) lane-pads to 128, 2 KB if not.
(c) Does (N,16) actually lane-pad to 128 in VMEM? Probe by compiling with a
    vmem_limit the padded form busts and the compact form fits.
(d) What's the real usable VMEM ceiling (docs say 128 MB on v5e; round-1
    note observed >61 MB)? Probe with growing resident arrays.
Also times a "full" variant tracking (t, idx, nd) like the real closest
kernel, at HIGHEST precision.
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

G = 512
EPS = 1e-3
PRECS = {
    "default": None,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _hit_rows(outm, lane0):
    blk = outm[:, lane0 : lane0 + 128]
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
    return jnp.where(hit, tj, T_MAX), det


def mxu_kernel(iters, storage: str, prec: str, full: bool):
    precision = PRECS[prec]

    def kernel(rmat, cmat, out):
        R = rmat[:, :]

        def body(i, carry):
            t, g = carry
            if storage == "padded":
                C = cmat[pl.ds(g * 32, 32), :]
            else:  # compact (G*8, 64): row j = 4 blocks of 16 coefs
                src = cmat[pl.ds(g * 8, 8), :]
                C = jnp.concatenate(
                    [src[:, 16 * q : 16 * q + 16] for q in range(4)],
                    axis=0,
                )  # (32,16), rows 8q+j
            outm = jax.lax.dot_general(
                C, R, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            rows = []
            irows = []
            for r in range(8):
                tcand, det = _hit_rows(outm, r * 128)
                rmin = jnp.min(tcand, axis=0, keepdims=True)
                rows.append(rmin)
                if full:
                    jiota = jax.lax.broadcasted_iota(
                        jnp.int32, (8, 128), 0
                    )
                    icand = jnp.where(tcand <= rmin, jiota, 8)
                    irows.append(jnp.min(icand, axis=0, keepdims=True))
            tnew = jnp.concatenate(rows, axis=0)
            if full:
                inew = jnp.concatenate(irows, axis=0)
                better = tnew < t
                t = jnp.where(better, tnew, t)
                # dummy consumption of inew to keep it live
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


@functools.partial(
    jax.jit, static_argnames=("iters", "storage", "prec", "full")
)
def run_mxu(jit_eps, rmat, cmat, iters, storage, prec, full=False):
    rmat = rmat + jit_eps
    return pl.pallas_call(
        mxu_kernel(iters, storage, prec, full),
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


def probe_pad():
    """Compile a kernel whose (N,16) input fits 40MB only if unpadded."""
    n = 92160  # x16 f32 = 5.9 MB unpadded, 47 MB padded to 128 lanes

    def kern(c, o):
        o[:, :] = c[pl.ds(0, 8), :].astype(jnp.float32) * 2.0

    for limit_mb, label in ((40, "40MB"), (64, "64MB"), (100, "100MB"),
                            (120, "120MB")):
        try:
            jax.jit(
                lambda c: pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((8, 16), jnp.float32),
                    grid=(1,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=limit_mb * 1024 * 1024
                    ),
                )(c)
            ).lower(
                jax.ShapeDtypeStruct((n, 16), jnp.float32)
            ).compile()
            print(f"pad-probe (92160,16) @ limit {label}: COMPILES", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"pad-probe (92160,16) @ limit {label}: FAILS ({msg})",
                  flush=True)


def probe_ceiling():
    """How big can a resident (N,128) f32 input get before compile fails?"""

    def kern(c, o):
        o[:, :] = c[pl.ds(0, 8), :] * 2.0

    for mb in (120, 140, 200):
        n = mb * 2048  # n rows x 512 B = mb MB
        try:
            jax.jit(
                lambda c: pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                    grid=(1,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=127 * 1024 * 1024
                    ),
                )(c)
            ).lower(
                jax.ShapeDtypeStruct((n, 128), jnp.float32)
            ).compile()
            print(f"ceiling-probe {mb} MB resident: COMPILES", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"ceiling-probe {mb} MB resident: FAILS ({msg})", flush=True)


def main():
    probe_pad()
    probe_ceiling()
    rng = np.random.RandomState(0)
    rmat = jnp.asarray(rng.uniform(-1, 1, (16, 1024)).astype(np.float32))
    cpad = jnp.asarray(rng.uniform(-1, 1, (G * 32, 16)).astype(np.float32))
    ccmp = jnp.asarray(rng.uniform(-1, 1, (G * 8, 64)).astype(np.float32))
    timeit("padded  highest", run_mxu, rmat, cpad, storage="padded",
           prec="highest")
    timeit("compact highest", run_mxu, rmat, ccmp, storage="compact",
           prec="highest")
    timeit("compact highest full", run_mxu, rmat, ccmp, storage="compact",
           prec="highest", full=True)


if __name__ == "__main__":
    main()
