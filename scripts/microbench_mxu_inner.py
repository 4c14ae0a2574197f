"""Microbenchmark: MXU-evaluated inner-node slab tests.

The slab plane distances are LINEAR in the per-ray features
S = [inv(3), oi(3)]:  tx1 = lo_x*inv_x - oi_x, etc.  So a visit's whole
(children x planes x rays) distance tensor is ONE matmul
W @ S with W rows prebuilt per node at pack time — the exact trick the
adopted MXU leaf path uses for Moller-Trumbore (_build_cmat).  The VPU
then only runs the min/max/compare chain on the matmul output, whose
rows are laid out so every quantity slice is a native (8,1024) tile at
arity 8.

Variants (same 32 children per iteration, full sort+push scalar glue):
  I  production VPU visit: 8 BVH4 nodes, per-child (8,128) slabs,
     shared reduce, 8x 4-sorts, 32 pushes
  J  MXU visit: 4 BVH8 nodes, one (192,16)@(16,1024) bf16x3 triple-dot,
     per-node (8,1024)-tile min/max, 4x 8-sorts, 32 pushes
  K  MXU visit: 8 BVH4 nodes (rows (4,1024) half-tiles), 8x 4-sorts
  L  J without sorts/pushes (vector+matmul part alone)
  M  I without sorts/pushes

Run on the real chip:  python scripts/microbench_mxu_inner.py
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
    LANES, SUBLANES, T_MAX, Vec3, _child_extract, _load_node_row,
    _slab_masked, _sortn, _split_bf16,
)

N_NODES = 512               # small so the lane-padded W tables fit VMEM
NCH = 32                    # children per iteration in every variant


def _tables():
    """qbox/qmeta for BVH4 (arity 4) + W/meta for BVH8 and BVH4-MXU."""
    rng = np.random.default_rng(1)
    mn4 = rng.uniform(-4, 3, size=(N_NODES, 4, 3)).astype(np.float32)
    mx4 = mn4 + rng.uniform(0.1, 1.0, size=(N_NODES, 4, 3)).astype(np.float32)
    qbox = np.zeros((N_NODES, 32), np.float32)
    for k in range(4):
        qbox[:, 6 * k : 6 * k + 3] = mn4[:, k]
        qbox[:, 6 * k + 3 : 6 * k + 6] = mx4[:, k]
    meta4 = np.zeros((N_NODES, 8), np.int32)
    meta4[:, :4] = rng.integers(-64, 64, size=(N_NODES, 4))
    meta4[:, 4:] = 1

    def w_table(arity):
        # rows n*(6*arity) + q*arity + k; features [inv(3), oi(3), pad..16]
        mn = rng.uniform(-4, 3, size=(N_NODES, arity, 3)).astype(np.float32)
        mx = mn + rng.uniform(0.1, 1.0, size=(N_NODES, arity, 3)).astype(
            np.float32)
        R = 6 * arity
        W = np.zeros((N_NODES * R, 16), np.float32)
        for n in range(N_NODES):
            for c in range(3):
                for k in range(arity):
                    lo = W[n * R + (2 * c) * arity + k]
                    lo[c] = mn[n, k, c]
                    lo[3 + c] = -1.0
                    hi = W[n * R + (2 * c + 1) * arity + k]
                    hi[c] = mx[n, k, c]
                    hi[3 + c] = -1.0
        hi16 = W.astype(np.float32)
        import ml_dtypes
        h = hi16.astype(ml_dtypes.bfloat16).astype(np.float32)
        l = (hi16 - h)
        Wi = np.zeros((N_NODES * R, 32), np.float32)
        Wi[:, :16] = h
        Wi[:, 16:] = l
        return Wi.astype(np.float32)

    w8 = w_table(8)
    w4 = w_table(4)
    meta8 = np.zeros((N_NODES, 16), np.int32)
    meta8[:, :8] = rng.integers(-64, 64, size=(N_NODES, 8))
    meta8[:, 8:] = 1
    return (jnp.asarray(qbox), jnp.asarray(meta4), jnp.asarray(w8),
            jnp.asarray(meta8), jnp.asarray(w4))


def _rays():
    rng = np.random.default_rng(0)
    return [jnp.asarray(rng.normal(size=(SUBLANES, LANES)), jnp.float32)
            for _ in range(6)]


def _run(name, body, scene_arrays, k_lo=50_000, k_hi=250_000, reps=3):
    n_scene = len(scene_arrays)

    def kernel(*refs):
        k_ref = refs[0]
        scene = refs[1 : 1 + n_scene]
        rays = refs[1 + n_scene : 7 + n_scene]
        out = refs[7 + n_scene]
        stack = refs[8 + n_scene]
        rsc = refs[9 + n_scene]
        o = Vec3(rays[0][:, :], rays[1][:, :], rays[2][:, :])
        d = Vec3(rays[3][:, :], rays[4][:, :], rays[5][:, :])
        inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
        oi = Vec3(o.x * inv.x, o.y * inv.y, o.z * inv.z)
        # one-time slab R-matrix: rows 0-2 inv, 3-5 -> oi, 6..15 zero
        feats = (inv.x, inv.y, inv.z, oi.x, oi.y, oi.z)
        for p, f in enumerate(feats):
            for r in range(SUBLANES):
                rsc[p : p + 1, r * LANES : (r + 1) * LANES] = f[r : r + 1, :]
        rsc[6:16, :] = jnp.zeros((10, SUBLANES * LANES), jnp.float32)
        Sh, Sl = _split_bf16(rsc[:, :])

        def step(i, carry):
            e, acc = carry
            e, acc = body(scene, stack, o, d, inv, oi, Sh, Sl, e, acc)
            e = jnp.abs(e) % N_NODES
            return e, acc

        e, acc = jax.lax.fori_loop(
            0, k_ref[0], step, (jnp.int32(0), jnp.float32(0.0))
        )
        out[0, 0] = acc + e.astype(jnp.float32)

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_scene + 6),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((512,), jnp.int32),
                        pltpu.VMEM((16, SUBLANES * LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    args = tuple(scene_arrays) + tuple(_rays())

    def timed(k):
        ks = jnp.asarray([k], jnp.int32)
        float(fn(ks, *args)[0, 0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(ks, *args)[0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(k_lo), timed(k_hi)
    ns = (t_hi - t_lo) / (k_hi - k_lo) * 1e9
    print(f"{name:56s} {ns:8.1f} ns/iter")
    return ns


# --------------------------------------------------------------------------
# variant bodies
# --------------------------------------------------------------------------

def _push(stack, sp, ms, es, arity):
    for k in reversed(range(arity)):
        ok = ms[k] < T_MAX
        stack[sp] = es[k]
        sp = sp + ok.astype(jnp.int32)
    return sp


def body_vpu4(with_scalar):
    def body(scene, stack, o, d, inv, oi, Sh, Sl, e, acc):
        qbox, qmeta = scene[0], scene[1]
        loaded = []
        for i in range(8):
            en = (e + i * 37) % N_NODES
            mn, mx = _load_node_row(qbox, en, False)
            m = qmeta[pl.ds(en, 1), :]
            loaded.append((mn, mx, m))
        vs = []
        for mn, mx, _m in loaded:
            for k in range(4):
                lo, hi = _child_extract(mn, mx, k, False)
                vs.append(_slab_masked(lo, hi, oi, inv, jnp.float32(T_MAX)))
        both = jnp.concatenate(vs, axis=0)
        red = jnp.min(both, axis=1)
        if not with_scalar:
            s = jnp.min(red)
            return e + 1 + (s < 0).astype(jnp.int32), acc + s
        sp = jnp.int32(0)
        for n in range(8):
            m = loaded[n][2]
            ms = [jnp.min(red[SUBLANES * (4 * n + k) : SUBLANES * (4 * n + k + 1)])
                  for k in range(4)]
            es = [m[0, k] for k in range(4)]
            ms, es = _sortn(ms, es)
            sp = _push(stack, sp, ms, es, 4)
        return e + 1 + sp, acc + jnp.float32(0.0)
    return body


def _mxu_quants(W, nodes, rows_per_node, Sh, Sl):
    crow = jnp.concatenate(
        [W[pl.ds(n * rows_per_node, rows_per_node), :] for n in nodes], axis=0
    )
    Ch = crow[:, 0:16].astype(jnp.bfloat16)
    Cl = crow[:, 16:32].astype(jnp.bfloat16)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return dot(Ch, Sh) + dot(Ch, Sl) + dot(Cl, Sh)


def _node_minmax(blk, arity):
    """blk: (6*arity, 1024) one node's quantity rows -> per-child packet
    minima (arity,) after mask."""
    a = arity
    tx1, tx2 = blk[0 * a : 1 * a], blk[1 * a : 2 * a]
    ty1, ty2 = blk[2 * a : 3 * a], blk[3 * a : 4 * a]
    tz1, tz2 = blk[4 * a : 5 * a], blk[5 * a : 6 * a]
    tmin = jnp.minimum(tx1, tx2)
    tmax = jnp.maximum(tx1, tx2)
    tmin = jnp.maximum(tmin, jnp.minimum(ty1, ty2))
    tmax = jnp.minimum(tmax, jnp.maximum(ty1, ty2))
    tmin = jnp.maximum(tmin, jnp.minimum(tz1, tz2))
    tmax = jnp.minimum(tmax, jnp.maximum(tz1, tz2))
    ok = (tmax >= tmin) & (tmax > 0.0)
    v = jnp.where(ok, tmin, T_MAX)
    return jnp.min(v, axis=1)          # (arity,)


def body_mxu(arity, npop, with_scalar):
    rows = 6 * arity

    def body(scene, stack, o, d, inv, oi, Sh, Sl, e, acc):
        W, meta = scene[2 + (0 if arity == 8 else 2)], (
            scene[3] if arity == 8 else scene[1])
        nodes = [(e + i * 37) % N_NODES for i in range(npop)]
        outm = _mxu_quants(W, nodes, rows, Sh, Sl)
        sp = jnp.int32(0)
        s = jnp.float32(0.0)
        for n in range(npop):
            vmin = _node_minmax(outm[rows * n : rows * (n + 1), :], arity)
            if not with_scalar:
                s = s + jnp.min(vmin)
                continue
            m = meta[pl.ds(nodes[n], 1), :]
            ms = [vmin[k] for k in range(arity)]
            es = [m[0, k] for k in range(arity)]
            ms, es = _sortn(ms, es)
            sp = _push(stack, sp, ms, es, arity)
        if not with_scalar:
            return e + 1 + (s < 0).astype(jnp.int32), acc + s
        return e + 1 + sp, acc

    return body


def main():
    print(f"devices: {jax.devices()}  (32 children/iter in all variants)")
    tables = _tables()
    out = {}
    out["I_vpu4_full"] = _run("I VPU 8x BVH4 + sorts + pushes",
                              body_vpu4(True), tables)
    out["J_mxu8_full"] = _run("J MXU 4x BVH8 + sorts + pushes",
                              body_mxu(8, 4, True), tables)
    out["K_mxu4_full"] = _run("K MXU 8x BVH4 + sorts + pushes",
                              body_mxu(4, 8, True), tables)
    out["M_vpu4_vec"] = _run("M VPU vector part only",
                             body_vpu4(False), tables)
    out["L_mxu8_vec"] = _run("L MXU BVH8 vector part only",
                             body_mxu(8, 4, False), tables)
    os.makedirs("metrics", exist_ok=True)
    with open("metrics/microbench_mxu_inner.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote metrics/microbench_mxu_inner.json")


if __name__ == "__main__":
    main()
