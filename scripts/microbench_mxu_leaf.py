"""MXU-leaf investigation series (v1-v6), one harness + six stages.

Möller-Trumbore's four per-triangle quantities are linear in the per-ray
vector R = [d(3), M=o x d(3), o(3), 1]:

    det   = d . (-n)
    t_num = o . n - (v0 . n)
    u_num = M . e2 - d . (e2 x v0)
    v_num = d . (e1 x v0) - M . e1

so one leaf of 8 triangles is a (32, 16) constant matrix C (4 outputs x 8
tris, K=10 padded to 16) and a packet's leaf test is OUT = C @ R with
R (16, 1024) built once per packet. The six stages below are the
measurement trail that took this from idea to the production kernel
(ops/pallas_trace._mxu_leaf_*); each stage's findings are quoted in
docs/DESIGN.md 9b and BENCHMARKS.md. Run `--stage vN` (or `all`).

Stage findings (measured on the TPU v5e chip, ns per 8-triangle leaf
visit over 1024 rays; the VPU scalar-broadcast baseline is ~433-438 ns):

  v1  lane-major feasibility: all 1024 rays in the matmul lane dim pays
      8x-inefficient (1,1024) hit logic -> ~456 ns, no win. Verdict: the
      matmul is nearly free, the EPILOGUE layout decides.
  v2  lane-GROUPED layout (matmul lanes grouped by ray row, so the
      (32,1024) output statically slices into native (8,128) vregs with
      sublane = triangle): f32 117 ns, bf16 ~80 ns, L=32 one-matmul
      ~4x epilogue. The layout the production kernel uses.
  v3  compact C storage ((G*4,128) + in-kernel reshape) REJECTED: Mosaic
      cannot reshape (4,128)->(32,16) without relayout cost; measured
      default-precision accuracy: bf16-grade (1.6e-3 rel err on t) —
      NOT enough for hit tests; HIGHEST is accurate.
  v4  precision cost: HIGHEST = 345 ns (barely beats VPU), compact
      (G*8,64) assembly-by-slices also loses; VMEM probes: (N,16) DOES
      lane-pad to 128 (8x footprint), usable resident ceiling ~>100 MB.
  v5  bf16x3 middle (C,R split hi+lo bf16; C@R ~ Ch@Rh + Ch@Rl + Cl@Rh):
      227 ns plain / 274 ns with (idx,nd) tracking, 2.2e-5 rel t error,
      zero hit flips on a dense-hit fixture. The production math.
  v6  C-table storage: two (G*32,16) bf16 tables lane-pad 8x and OOM
      car_boxed-class scenes; INTERLEAVED [hi|lo] rows (G*32,32) halve
      the padded footprint at identical speed (247 vs 243 ns); truly
      lane-packed transposed layouts force a contract-dim-0 dot that is
      3x slower. The production layout.
"""

from __future__ import annotations

import argparse
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

from parallel_ray_tracer_tpu.ops.pallas_trace import (  # noqa: E402
    T_MAX, _load_rays, _mt_scalar_tri,
)
from parallel_ray_tracer_tpu.ops.vecmath import Vec3  # noqa: E402

G = 512          # leaf groups resident in the benchmark table
L = 8
EPS = 1e-3
PRECS = {
    "default": None,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}
_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


# --------------------------------------------------------------------------
# Shared harness
# --------------------------------------------------------------------------

def split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot(a, b, precision=None):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _dot_t(a, b):
    """Contract dim 0 of both: (16, M) x (16, N) -> (M, N)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _hit_rows(outm, full=False):
    """Lane-grouped epilogue: (32, 1024) quantities -> (8,128) min-t.

    full=True also derives the winner index per row (and keeps it live),
    matching the closest kernel's extra epilogue work."""
    rows, irows = [], []
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
        rmin = jnp.min(tcand, axis=0, keepdims=True)
        rows.append(rmin)
        if full:
            jio = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            icand = jnp.where(tcand <= rmin, jio, 8)
            irows.append(jnp.min(icand, axis=0, keepdims=True))
    tnew = jnp.concatenate(rows, axis=0)
    if full:
        return tnew, jnp.concatenate(irows, axis=0)
    return tnew, None


def _merge(t, tnew, inew):
    if inew is None:
        return jnp.minimum(t, tnew)
    better = tnew < t
    t = jnp.where(better, tnew, t)
    return t + jnp.where(inew < 0, 1.0, 0.0)  # keep inew live


def _leaf_loop(iters, init, step):
    """fori_loop over leaf visits carrying (t, g) with g wrapping at G."""
    def body(i, carry):
        t, g = carry
        t = step(t, g)
        return t, (g + 1) & (G - 1)

    t, _ = jax.lax.fori_loop(0, iters, body, (init, jnp.int32(0)))
    return t


def pallas_run(kernel, n_in, out_shape=(8, 128)):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=_VMEM,
    )


def timeit(name, fn, *args, **kw):
    """Marginal per-leaf cost from chained in-kernel iterations (the
    remote tunnel caches identical dispatches — jitter every call)."""
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
    """C rows per tri j: det(j), tn(8+j), un(16+j), vn(24+j) over
    R = [d(3), M=o x d(3), o(3), 1, pad(6)] — block layout (4*T, 16)."""
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
    return np.concatenate([C[q] for q in range(4)], axis=0)


def build_rmat(o, d):
    M = np.cross(o, d)
    R = np.zeros((16, 1024), np.float32)
    R[0:3] = d.T
    R[3:6] = M.T
    R[6:9] = o.T
    R[9] = 1.0
    return R


def rand_fixture(seed=0):
    rng = np.random.RandomState(seed)
    planes = [
        jnp.asarray(rng.uniform(-1, 1, (8, 128)).astype(np.float32))
        for _ in range(6)
    ]
    tri = jnp.asarray(rng.uniform(-1, 1, (G, 128)).astype(np.float32))
    rmat = jnp.asarray(rng.uniform(-1, 1, (16, 1024)).astype(np.float32))
    cmat = jnp.asarray(rng.uniform(-1, 1, (G * 32, 16)).astype(np.float32))
    return rng, planes, tri, rmat, cmat


def accuracy_check(kinds=("default", "bf16x3", "highest"), dense=True):
    """Max relative t error + hit flips of the matmul MT vs the kernel's
    own scalar VPU path. dense=True aims every ray AT a random triangle
    (hundreds of real hits); dense=False uses random directions."""
    rng = np.random.RandomState(1)
    T = 8
    if dense:
        v0 = rng.uniform(-30, 30, (T, 3)).astype(np.float32)
        e1 = rng.uniform(-10, 10, (T, 3)).astype(np.float32)
        e2 = rng.uniform(-10, 10, (T, 3)).astype(np.float32)
        o = np.tile(np.array([[0.0, 0.0, -80.0]], np.float32), (1024, 1))
        ti = rng.randint(0, T, 1024)
        a = rng.uniform(0, 1, (1024, 1)).astype(np.float32)
        b = (rng.uniform(0, 1, (1024, 1)) * (1 - a)).astype(np.float32)
        target = v0[ti] + a * e1[ti] + b * e2[ti]
        d = (target - o).astype(np.float32)
    else:
        v0 = rng.uniform(-50, 50, (T, 3)).astype(np.float32)
        e1 = rng.uniform(-8, 8, (T, 3)).astype(np.float32)
        e2 = rng.uniform(-8, 8, (T, 3)).astype(np.float32)
        o = np.tile(
            rng.uniform(-60, -40, (1, 3)), (1024, 1)
        ).astype(np.float32)
        d = rng.uniform(-1, 1, (1024, 3)).astype(np.float32)
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
    R = jnp.asarray(build_rmat(o, d))

    def mm(kind):
        if kind == "bf16x3":
            Ch, Cl = split_bf16(C)
            Rh, Rl = split_bf16(R)
            return np.asarray(_dot(Ch, Rh) + _dot(Ch, Rl) + _dot(Cl, Rh))
        return np.asarray(jax.jit(
            functools.partial(_dot, precision=PRECS[kind])
        )(C, R))

    for kind in kinds:
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
        relerr = np.abs(tm - t_ref)[both] / np.maximum(t_ref[both], 1e-6)
        disagree = int(((t_ref < T_MAX) != (tm < T_MAX)).sum())
        print(f"accuracy[{kind}]: hits_ref={int((t_ref < T_MAX).sum())}"
              f"/1024 disagree={disagree} max_rel_t_err="
              f"{relerr.max() if relerr.size else 0:.2e}", flush=True)


# --------------------------------------------------------------------------
# VPU baseline (all stages compare against it)
# --------------------------------------------------------------------------

def vpu_kernel(iters):
    def kernel(ox, oy, oz, dx, dy, dz, tri, out):
        o, d, _inv, _oi = _load_rays(ox, oy, oz, dx, dy, dz)

        def step(t, g):
            row = tri[pl.ds(g, 1), :].astype(jnp.float32)
            for j in range(L):
                tj, _ = _mt_scalar_tri(o, d, row, j)
                t = jnp.minimum(t, tj)
            return t

        out[:, :] = _leaf_loop(
            iters, jnp.full((8, 128), T_MAX, jnp.float32), step
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("iters",))
def run_vpu(jit_eps, ox, oy, oz, dx, dy, dz, tri, iters):
    return pallas_run(vpu_kernel(iters), 7)(
        ox + jit_eps, oy, oz, dx, dy, dz, tri
    )


# --------------------------------------------------------------------------
# v1: lane-major feasibility (output stays (1, 1024))
# --------------------------------------------------------------------------

def v1_kernel(iters):
    def kernel(rmat, cmat, out):
        R = rmat[:, :]

        def step(t, g):
            C = cmat[pl.ds(g * 32, 32), :]
            outm = _dot(C, R)
            for j in range(L):
                det = outm[4 * j : 4 * j + 1, :]
                invdet = 1.0 / det
                tj = outm[4 * j + 1 : 4 * j + 2, :] * invdet
                u = outm[4 * j + 2 : 4 * j + 3, :] * invdet
                v = outm[4 * j + 3 : 4 * j + 4, :] * invdet
                hit = (
                    (jnp.abs(det) >= EPS) & (tj > EPS)
                    & (u >= 0.0) & (v >= 0.0) & ((u + v) <= 1.0)
                )
                t = jnp.minimum(t, jnp.where(hit, tj, T_MAX))
            return t

        out[:, :] = _leaf_loop(
            iters, jnp.full((1, 1024), T_MAX, jnp.float32), step
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("iters",))
def run_v1(jit_eps, rmat, cmat, iters):
    return pallas_run(v1_kernel(iters), 2, out_shape=(1, 1024))(
        rmat + jit_eps, cmat
    )


def stage_v1():
    rng, planes, tri, rmat, cmat = rand_fixture()
    # v1 built its cmat with per-triangle interleaved rows (4 per tri).
    vpu = timeit("vpu  (L=8)       ", run_vpu, *planes, tri)
    mxu = timeit("v1 lane-major    ", run_v1, rmat, cmat)
    print(f"speedup: {vpu/mxu:.2f}x")


# --------------------------------------------------------------------------
# v2: lane-grouped layout (the keeper) — f32 / bf16 / L=32 variants
# --------------------------------------------------------------------------

def v2_kernel(iters, rows_per_leaf=32, dtype=jnp.float32):
    def kernel(rmat, cmat, out):
        R = rmat[:, :].astype(dtype)

        def step(t, g):
            C = cmat[pl.ds(g * rows_per_leaf, rows_per_leaf), :].astype(dtype)
            outm = _dot(C, R)
            tmins = [
                _hit_rows(outm[32 * b : 32 * b + 32, :])[0]
                for b in range(rows_per_leaf // 32)
            ]
            m = tmins[0]
            for extra in tmins[1:]:
                m = jnp.minimum(m, extra)
            return jnp.minimum(t, m)

        out[:, :] = _leaf_loop(
            iters, jnp.full((8, 128), T_MAX, jnp.float32), step
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("iters", "rows", "bf16"))
def run_v2(jit_eps, rmat, cmat, iters, rows, bf16):
    return pallas_run(
        v2_kernel(iters, rows, jnp.bfloat16 if bf16 else jnp.float32), 2
    )(rmat + jit_eps, cmat)


def stage_v2():
    rng, planes, tri, rmat, cmat32 = rand_fixture()
    cmat128 = jnp.asarray(
        rng.uniform(-1, 1, (G * 128, 16)).astype(np.float32)
    )
    vpu = timeit("vpu  (L=8)  ", run_vpu, *planes, tri)
    m32 = timeit("mxu32 (L=8) ", run_v2, rmat, cmat32, rows=32, bf16=False)
    m16 = timeit("mxu16 (L=8) ", run_v2, rmat, cmat32, rows=32, bf16=True)
    m128 = timeit("mxu32 (L=32)", run_v2, rmat, cmat128, rows=128, bf16=False)
    print(f"\nper-leaf:  vpu={vpu*1e9:.0f}  mxu_f32={m32*1e9:.0f}  "
          f"mxu_bf16={m16*1e9:.0f}  mxu_f32_L32={m128*1e9:.0f} ns")
    print(f"speedup f32: {vpu/m32:.2f}x   bf16: {vpu/m16:.2f}x   "
          f"L32-vs-4xVPU: {4*vpu/m128:.2f}x")


# --------------------------------------------------------------------------
# v3: compact storage (reshape) + default-precision accuracy
# --------------------------------------------------------------------------

def v3_kernel(iters, compact: bool, precision):
    def kernel(rmat, cmat, out):
        R = rmat[:, :]

        def step(t, g):
            if compact:
                C = cmat[pl.ds(g * 4, 4), :].reshape(32, 16)
            else:
                C = cmat[pl.ds(g * 32, 32), :]
            outm = _dot(C, R, precision=precision)
            return jnp.minimum(t, _hit_rows(outm)[0])

        out[:, :] = _leaf_loop(
            iters, jnp.full((8, 128), T_MAX, jnp.float32), step
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("iters", "compact", "prec"))
def run_v3(jit_eps, rmat, cmat, iters, compact, prec):
    return pallas_run(v3_kernel(iters, compact, PRECS[prec]), 2)(
        rmat + jit_eps, cmat
    )


def stage_v3():
    accuracy_check(kinds=("default", "highest"), dense=False)
    rng, _planes, _tri, rmat, cpad = rand_fixture()
    ccmp = jnp.asarray(rng.uniform(-1, 1, (G * 4, 128)).astype(np.float32))
    timeit("mxu padded  f32 default", run_v3, rmat, cpad,
           compact=False, prec="default")
    timeit("mxu compact f32 default", run_v3, rmat, ccmp,
           compact=True, prec="default")
    timeit("mxu compact f32 highest", run_v3, rmat, ccmp,
           compact=True, prec="highest")


# --------------------------------------------------------------------------
# v4: precision cost, slice-assembly storage, VMEM probes
# --------------------------------------------------------------------------

def v4_kernel(iters, storage: str, prec: str, full: bool):
    precision = PRECS[prec]

    def kernel(rmat, cmat, out):
        R = rmat[:, :]

        def step(t, g):
            if storage == "padded":
                C = cmat[pl.ds(g * 32, 32), :]
            else:  # compact (G*8, 64): row j = 4 blocks of 16 coefs
                src = cmat[pl.ds(g * 8, 8), :]
                C = jnp.concatenate(
                    [src[:, 16 * q : 16 * q + 16] for q in range(4)],
                    axis=0,
                )
            outm = _dot(C, R, precision=precision)
            tnew, inew = _hit_rows(outm, full=full)
            return _merge(t, tnew, inew)

        out[:, :] = _leaf_loop(
            iters, jnp.full((8, 128), T_MAX, jnp.float32), step
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("iters", "storage", "prec", "full")
)
def run_v4(jit_eps, rmat, cmat, iters, storage, prec, full=False):
    return pallas_run(v4_kernel(iters, storage, prec, full), 2)(
        rmat + jit_eps, cmat
    )


def probe_pad():
    """Compile a kernel whose (N,16) input fits 40MB only if unpadded."""
    n = 92160  # x16 f32 = 5.9 MB unpadded, 47 MB padded to 128 lanes

    def kern(c, o):
        o[:, :] = c[pl.ds(0, 8), :].astype(jnp.float32) * 2.0

    for limit_mb in (40, 64, 100, 120):
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
            print(f"pad-probe (92160,16) @ limit {limit_mb}MB: COMPILES",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"pad-probe (92160,16) @ limit {limit_mb}MB: FAILS ({msg})",
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


def stage_v4():
    probe_pad()
    probe_ceiling()
    rng, _planes, _tri, rmat, cpad = rand_fixture()
    ccmp = jnp.asarray(rng.uniform(-1, 1, (G * 8, 64)).astype(np.float32))
    timeit("padded  highest", run_v4, rmat, cpad, storage="padded",
           prec="highest")
    timeit("compact highest", run_v4, rmat, ccmp, storage="compact",
           prec="highest")
    timeit("compact highest full", run_v4, rmat, ccmp, storage="compact",
           prec="highest", full=True)


# --------------------------------------------------------------------------
# v5: bf16x3 (the production math)
# --------------------------------------------------------------------------

def v5_kernel(iters, full: bool):
    def kernel(rmat, ch_ref, cl_ref, out):
        Rh, Rl = split_bf16(rmat[:, :])

        def step(t, g):
            Ch = ch_ref[pl.ds(g * 32, 32), :]
            Cl = cl_ref[pl.ds(g * 32, 32), :]
            outm = _dot(Ch, Rh) + _dot(Ch, Rl) + _dot(Cl, Rh)
            tnew, inew = _hit_rows(outm, full=full)
            return _merge(t, tnew, inew)

        out[:, :] = _leaf_loop(
            iters, jnp.full((8, 128), T_MAX, jnp.float32), step
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("iters", "full"))
def run_v5(jit_eps, rmat, ch, cl, iters, full=False):
    return pallas_run(v5_kernel(iters, full), 3)(rmat + jit_eps, ch, cl)


def stage_v5():
    accuracy_check(kinds=("default", "bf16x3", "highest"), dense=True)
    rng, _planes, _tri, rmat, c = rand_fixture()
    ch, cl = split_bf16(c)
    timeit("bf16x3      ", run_v5, rmat, ch, cl)
    timeit("bf16x3 full ", run_v5, rmat, ch, cl, full=True)


# --------------------------------------------------------------------------
# v6: C-table storage layouts (two tables / transposed / interleaved)
# --------------------------------------------------------------------------

def v6_kernel_t1(iters, extract: str):
    """Transposed blocks (16, nblk*128); extract in {'static','select'}."""
    def kernel(rmat, cth_ref, ctl_ref, out):
        Rh, Rl = split_bf16(rmat[:, :])

        def step(t, g):
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
            return jnp.minimum(t, _hit_rows(outm)[0])

        out[:, :] = _leaf_loop(
            iters, jnp.full((8, 128), T_MAX, jnp.float32), step
        )

    return kernel


def v6_kernel_t2(iters):
    """Interleaved halves: one (G*32, 32) ref, [hi|lo] per row — the
    production layout (pallas_trace interleaved cmi)."""
    def kernel(rmat, c_ref, out):
        Rh, Rl = split_bf16(rmat[:, :])

        def step(t, g):
            Crow = c_ref[pl.ds(g * 32, 32), :]
            outm = (_dot(Crow[:, 0:16], Rh) + _dot(Crow[:, 0:16], Rl)
                    + _dot(Crow[:, 16:32], Rh))
            return jnp.minimum(t, _hit_rows(outm)[0])

        out[:, :] = _leaf_loop(
            iters, jnp.full((8, 128), T_MAX, jnp.float32), step
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("iters", "which", "extract"))
def run_v6(jit_eps, rmat, args, iters, which, extract="select"):
    if which == "v5":
        kern = v5_kernel(iters, full=False)
    elif which == "t1":
        kern = v6_kernel_t1(iters, extract)
    else:
        kern = v6_kernel_t2(iters)
    return pallas_run(kern, 1 + len(args))(rmat + jit_eps, *args)


def stage_v6():
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
    out_v5 = run_v6(jnp.float32(0.0), rmat, (ch, cl), iters=G, which="v5")
    out_t1 = run_v6(jnp.float32(0.0), rmat, (cth, ctl), iters=G, which="t1")
    out_t2 = run_v6(jnp.float32(0.0), rmat, (c2,), iters=G, which="t2")
    print("t1 == v5:", bool(jnp.all(out_t1 == out_v5)),
          " t2 == v5:", bool(jnp.all(out_t2 == out_v5)), flush=True)

    timeit("v5 (G*32,16) two tables ", run_v6, rmat, (ch, cl), which="v5")
    timeit("t1 transp blocks select ", run_v6, rmat, (cth, ctl), which="t1")
    timeit("t1 transp blocks static ", run_v6, rmat, (cth, ctl), which="t1",
           extract="static")
    timeit("t2 interleaved [hi|lo]  ", run_v6, rmat, (c2,), which="t2")


STAGES = {
    "v1": stage_v1, "v2": stage_v2, "v3": stage_v3,
    "v4": stage_v4, "v5": stage_v5, "v6": stage_v6,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="v5",
                    choices=sorted(STAGES) + ["all"])
    args = ap.parse_args()
    names = sorted(STAGES) if args.stage == "all" else [args.stage]
    for name in names:
        print(f"--- stage {name} ---", flush=True)
        STAGES[name]()


if __name__ == "__main__":
    main()
