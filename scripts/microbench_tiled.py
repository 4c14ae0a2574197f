"""Microbenchmark: stacked-tile slab evaluation vs per-child (8,128) bodies.

microbench_bf16.py measured f32 issue throughput of ~0.35-0.56 ns/vreg on
wide tiles under ILP versus the ~1.06 ns/vreg serial rate the production
visit achieves (ROOFLINE.md "achieved issue").  This harness tests whether
the production wide-pop inner visit can harvest that by restructuring its
vector work: instead of npop*arity independent (8,128) _slab_masked bodies
(one instruction per vreg, scheduled by Mosaic), build (npop*arity*8, 128)
stacked plane tensors with explicit scalar splats and run ONE slab-test
instruction sequence over the whole tile (each instruction = 32 vregs,
issued back-to-back at the ALU rate).

Variants (all produce identical per-child packet-min distances):
  A  current production body: npop row loads + per-child slabs + shared
     lane reduce + per-node block mins (the _wide_inner_visit vector+scalar
     path minus stack pushes)
  B  stacked-tile: same loads/extracts, but 6 stacked (npop*arity*8, 128)
     plane tensors built from scalar splats; slab math on the big tiles
  C/D  slab math only (no block-min extraction) for A/B — isolates the
     arithmetic from the reduce.

Run on the real chip:  python scripts/microbench_tiled.py
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
    _slab_masked,
)

N_NODES = 4096
NPOP = 8
ARITY = 4
NCH = NPOP * ARITY


def _boxes():
    rng = np.random.default_rng(1)
    mn = rng.uniform(-4, 3, size=(N_NODES, ARITY, 3)).astype(np.float32)
    mx = mn + rng.uniform(0.1, 1.0, size=(N_NODES, ARITY, 3)).astype(np.float32)
    qbox = np.zeros((N_NODES, 32), np.float32)
    for k in range(ARITY):
        qbox[:, 6 * k : 6 * k + 3] = mn[:, k]
        qbox[:, 6 * k + 3 : 6 * k + 6] = mx[:, k]
    meta = np.zeros((N_NODES, 8), np.int32)
    meta[:, :ARITY] = rng.integers(-64, 64, size=(N_NODES, ARITY))
    meta[:, ARITY:] = 1
    return jnp.asarray(qbox), jnp.asarray(meta)


def _rays():
    rng = np.random.default_rng(0)
    return [jnp.asarray(rng.normal(size=(SUBLANES, LANES)), jnp.float32)
            for _ in range(6)]


def _run(name, body, scene_arrays, k_lo=50_000, k_hi=250_000, reps=3):
    def kernel(*refs):
        k_ref = refs[0]
        scene = refs[1:3]
        rays = refs[3:9]
        out = refs[9]
        o = Vec3(rays[0][:, :], rays[1][:, :], rays[2][:, :])
        d = Vec3(rays[3][:, :], rays[4][:, :], rays[5][:, :])
        inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
        oi = Vec3(o.x * inv.x, o.y * inv.y, o.z * inv.z)
        # loop-invariant stacked ray planes (hoisted, like the kernel would)
        invs = Vec3(*(jnp.tile(c, (NCH, 1)) for c in (inv.x, inv.y, inv.z)))
        ois = Vec3(*(jnp.tile(c, (NCH, 1)) for c in (oi.x, oi.y, oi.z)))

        def step(i, carry):
            e, acc = carry
            e, acc = body(scene, o, d, inv, oi, invs, ois, e, acc)
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
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
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
    print(f"{name:52s} {ns:8.1f} ns/iter")
    return ns


def _loads(scene, e):
    qbox, qmeta = scene
    loaded = []
    for i in range(NPOP):
        en = (e + i * 37) % N_NODES       # data-dependent distinct nodes
        mn, mx = _load_node_row(qbox, en, False)
        m = qmeta[pl.ds(en, 1), :]
        loaded.append((mn, mx, m))
    return loaded


def body_current(scene, o, d, inv, oi, invs, ois, e, acc):
    """Production _wide_inner_visit vector body + block-min extraction."""
    loaded = _loads(scene, e)
    vs = []
    for mn, mx, _m in loaded:
        for k in range(ARITY):
            lo, hi = _child_extract(mn, mx, k, False)
            vs.append(_slab_masked(lo, hi, oi, inv, jnp.float32(T_MAX)))
    both = jnp.concatenate(vs, axis=0)
    red = jnp.min(both, axis=1)
    s = jnp.float32(0.0)
    for c in range(NCH):
        s = s + jnp.min(red[SUBLANES * c : SUBLANES * (c + 1)])
    return e + 1 + (s < 0).astype(jnp.int32), acc + s


def _stacked_planes(loaded):
    """Six (NCH*8, 128) plane tensors from per-child scalar splats."""
    shape = (SUBLANES, LANES)
    planes = []
    for base in (0, 3):                       # lo planes, hi planes
        for c in range(3):                    # x, y, z
            blocks = []
            for mn, mx, _m in loaded:
                src = mn if base == 0 else mx
                for k in range(ARITY):
                    blocks.append(jnp.full(shape, src[0, 6 * k + base + c]))
            planes.append(jnp.concatenate(blocks, axis=0))
    return planes  # [lox, loy, loz, hix, hiy, hiz]


def _slab_stacked(planes, ois, invs, t_cut):
    lox, loy, loz, hix, hiy, hiz = planes
    tx1 = lox * invs.x - ois.x
    tx2 = hix * invs.x - ois.x
    tmin = jnp.minimum(tx1, tx2)
    tmax = jnp.maximum(tx1, tx2)
    ty1 = loy * invs.y - ois.y
    ty2 = hiy * invs.y - ois.y
    tmin = jnp.maximum(tmin, jnp.minimum(ty1, ty2))
    tmax = jnp.minimum(tmax, jnp.maximum(ty1, ty2))
    tz1 = loz * invs.z - ois.z
    tz2 = hiz * invs.z - ois.z
    tmin = jnp.maximum(tmin, jnp.minimum(tz1, tz2))
    tmax = jnp.minimum(tmax, jnp.maximum(tz1, tz2))
    ok = (tmax >= tmin) & (tmax > 0.0) & (tmin < t_cut)
    return jnp.where(ok, tmin, T_MAX)


def body_stacked(scene, o, d, inv, oi, invs, ois, e, acc):
    loaded = _loads(scene, e)
    planes = _stacked_planes(loaded)
    v = _slab_stacked(planes, ois, invs, jnp.float32(T_MAX))
    red = jnp.min(v, axis=1)
    s = jnp.float32(0.0)
    for c in range(NCH):
        s = s + jnp.min(red[SUBLANES * c : SUBLANES * (c + 1)])
    return e + 1 + (s < 0).astype(jnp.int32), acc + s


def body_current_noreduce(scene, o, d, inv, oi, invs, ois, e, acc):
    loaded = _loads(scene, e)
    vs = []
    for mn, mx, _m in loaded:
        for k in range(ARITY):
            lo, hi = _child_extract(mn, mx, k, False)
            vs.append(_slab_masked(lo, hi, oi, inv, jnp.float32(T_MAX)))
    both = jnp.concatenate(vs, axis=0)
    s = jnp.min(both)          # single fused global reduce keeps data live
    return e + 1 + (s < 0).astype(jnp.int32), acc + s


def body_stacked_noreduce(scene, o, d, inv, oi, invs, ois, e, acc):
    loaded = _loads(scene, e)
    planes = _stacked_planes(loaded)
    v = _slab_stacked(planes, ois, invs, jnp.float32(T_MAX))
    s = jnp.min(v)
    return e + 1 + (s < 0).astype(jnp.int32), acc + s


def _stacked_planes_chunk(loaded_chunk):
    shape = (SUBLANES, LANES)
    planes = []
    for base in (0, 3):
        for c in range(3):
            blocks = []
            for mn, mx, _m in loaded_chunk:
                src = mn if base == 0 else mx
                for k in range(ARITY):
                    blocks.append(jnp.full(shape, src[0, 6 * k + base + c]))
            planes.append(jnp.concatenate(blocks, axis=0))
    return planes


def make_body_chunked(nodes_per_chunk):
    rows = nodes_per_chunk * ARITY * SUBLANES

    def body(scene, o, d, inv, oi, invs, ois, e, acc):
        loaded = _loads(scene, e)
        invc = Vec3(invs.x[:rows], invs.y[:rows], invs.z[:rows])
        oic = Vec3(ois.x[:rows], ois.y[:rows], ois.z[:rows])
        s = jnp.float32(0.0)
        ci = 0
        for start in range(0, NPOP, nodes_per_chunk):
            chunk = loaded[start : start + nodes_per_chunk]
            planes = _stacked_planes_chunk(chunk)
            v = _slab_stacked(planes, oic, invc, jnp.float32(T_MAX))
            red = jnp.min(v, axis=1)
            for c in range(nodes_per_chunk * ARITY):
                s = s + jnp.min(red[SUBLANES * c : SUBLANES * (c + 1)])
            ci += 1
        return e + 1 + (s < 0).astype(jnp.int32), acc + s

    return body


def body_construct_only(scene, o, d, inv, oi, invs, ois, e, acc):
    loaded = _loads(scene, e)
    planes = _stacked_planes(loaded)
    s = jnp.float32(0.0)
    for p in planes:
        s = s + p[0, 0] + p[NCH * SUBLANES - 1, 7]
    return e + 1 + (s < 0).astype(jnp.int32), acc + s


def body_loads_only(scene, o, d, inv, oi, invs, ois, e, acc):
    loaded = _loads(scene, e)
    s = jnp.float32(0.0)
    for mn, mx, m in loaded:
        s = s + mn[0, 0] + mx[0, 5]
    return e + 1 + (s < 0).astype(jnp.int32), acc + s


def main():
    print(f"devices: {jax.devices()}  npop={NPOP} arity={ARITY}")
    qbox, qmeta = _boxes()
    scene = (qbox, qmeta)
    out = {}
    out["loads_only"] = _run("loads+extracts only (8 rows)", body_loads_only, scene)
    out["current"] = _run("A current per-child slabs + block mins",
                          body_current, scene)
    out["stacked"] = _run("B stacked (256,128) slabs + block mins",
                          body_stacked, scene)
    out["current_noreduce"] = _run("C per-child slabs, global reduce only",
                                   body_current_noreduce, scene)
    out["stacked_noreduce"] = _run("D stacked slabs, global reduce only",
                                   body_stacked_noreduce, scene)
    out["construct_only"] = _run("E plane construction only (192 splats)",
                                 body_construct_only, scene)
    out["chunk2"] = _run("F chunked (64,128) x4 slabs + block mins",
                         make_body_chunked(2), scene)
    out["chunk4"] = _run("G chunked (128,128) x2 slabs + block mins",
                         make_body_chunked(4), scene)
    out["chunk1"] = _run("H chunked (32,128) x8 slabs + block mins",
                         make_body_chunked(1), scene)
    os.makedirs("metrics", exist_ok=True)
    with open("metrics/microbench_tiled.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote metrics/microbench_tiled.json")


if __name__ == "__main__":
    main()
