"""Microbenchmark: do an inner visit and an MXU leaf visit OVERLAP?

The pop-8 visit accounting (metrics/profile_visits_pop8.json) shows every
traversal iteration costs ~0.93 us whether it is a wide inner visit
(8 nodes: slab VPU work + scalar sort/push) or an MXU leaf visit
(4 groups: triple-dot matmul + VPU winner/merge). The combined-iteration
design (pop inner nodes AND leaf groups every iteration, NULL-padded)
only wins if the hardware can overlap the two streams — the MXU matmul
and the two VPU dependency chains are independent within an iteration.

This harness times, with the microbench_inner methodology (marginal cost
of a data-dependent in-kernel loop):

    inner8          the wide inner visit alone (8 nodes, arity 4)
    leaf4_closest   the MXU closest leaf visit alone (4 groups)
    leaf4_occluded  the MXU any-hit leaf visit alone (4 groups)
    both_closest    inner8 + leaf4_closest in ONE iteration
    both_occluded   inner8 + leaf4_occluded in ONE iteration

If both ~= max(inner, leaf) the combined schedule halves traversal time;
if both ~= inner + leaf there is no ILP slack and the design is dead.
"""

from __future__ import annotations

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
    SUBLANES, LANES, T_MAX, Vec3, _load_node_row, _child_extract,
    _slab_masked, _sortn, _mxu_leaf_closest_n, _mxu_leaf_occluded_n,
    _split_bf16,
)

N_NODES = 4096
N_GROUPS = 512


def _rays():
    rng = np.random.default_rng(0)
    o = [jnp.asarray(rng.normal(size=(SUBLANES, LANES)), jnp.float32)
         for _ in range(3)]
    d = [jnp.asarray(rng.normal(size=(SUBLANES, LANES)), jnp.float32)
         for _ in range(3)]
    return o + d


def _boxes():
    rng = np.random.default_rng(1)
    mn = rng.uniform(-4, 3, size=(N_NODES, 4, 3)).astype(np.float32)
    mx = mn + rng.uniform(0.1, 1.0, size=(N_NODES, 4, 3)).astype(np.float32)
    qbox = np.zeros((N_NODES, 32), np.float32)
    for k in range(4):
        qbox[:, 6 * k : 6 * k + 3] = mn[:, k]
        qbox[:, 6 * k + 3 : 6 * k + 6] = mx[:, k]
    meta = np.zeros((N_NODES, 8), np.int32)
    meta[:, :4] = rng.integers(-64, 64, size=(N_NODES, 4))
    meta[:, 4:] = 1
    return jnp.asarray(qbox), jnp.asarray(meta)


def _cmat():
    rng = np.random.default_rng(2)
    c = rng.normal(size=(N_GROUPS * 32, 16)).astype(np.float32)
    hi, lo = _split_bf16(jnp.asarray(c))
    return jnp.concatenate([hi, lo], axis=1)      # (G*32, 32) bf16


def _rmats(rays):
    o = Vec3(*rays[:3])
    d = Vec3(*rays[3:])
    mx = o.y * d.z - o.z * d.y
    my = o.z * d.x - o.x * d.z
    mz = o.x * d.y - o.y * d.x
    feats = [d.x, d.y, d.z, mx, my, mz, o.x, o.y, o.z]
    R = jnp.stack([f.reshape(-1) for f in feats], axis=0)
    R = jnp.concatenate(
        [R, jnp.ones((1, SUBLANES * LANES), jnp.float32),
         jnp.zeros((6, SUBLANES * LANES), jnp.float32)], axis=0
    )
    return _split_bf16(R)


def _inner8(qbox, qmeta, oi, inv, t_cut, stack, e0, acc):
    """The wide inner visit body (8 nodes, data-chained like the kernel)."""
    loaded = []
    for i in range(8):
        e = (e0 + 37 * i) % N_NODES
        mn, mx = _load_node_row(qbox, e, False)
        m = qmeta[pl.ds(e, 1), :]
        loaded.append((mn, mx, m))
    vs = []
    for mn, mx, _m in loaded:
        for k in range(4):
            lo, hi = _child_extract(mn, mx, k, False)
            vs.append(_slab_masked(lo, hi, oi, inv, t_cut))
    both = jnp.concatenate(vs, axis=0)
    red = jnp.min(both, axis=1)
    sp = jnp.int32(8)
    for n in range(8):
        m = loaded[n][2]
        ms = [jnp.min(red[SUBLANES * (4 * n + k) : SUBLANES * (4 * n + k + 1)])
              for k in range(4)]
        es = [m[0, k] for k in range(4)]
        ms, es = _sortn(ms, es)
        for k in reversed(range(4)):
            ok = ms[k] < T_MAX
            stack[sp] = es[k]
            sp = sp + ok.astype(jnp.int32)
    return sp, acc + red[0]


def _loop_kernel(body, n_scene):
    def kernel(*refs):
        k_ref = refs[0]
        scene = refs[1 : 1 + n_scene]
        rays = refs[1 + n_scene : 7 + n_scene]
        out = refs[7 + n_scene]
        stack = refs[8 + n_scene]

        o = Vec3(rays[0][:, :], rays[1][:, :], rays[2][:, :])
        d = Vec3(rays[3][:, :], rays[4][:, :], rays[5][:, :])
        inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
        oi = Vec3(o.x * inv.x, o.y * inv.y, o.z * inv.z)
        shape = (SUBLANES, LANES)
        t0 = jnp.full(shape, T_MAX, jnp.float32)
        i0 = jnp.full(shape, -1, jnp.int32)
        z0 = jnp.zeros(shape, jnp.int32)

        def step(i, carry):
            e, t, idx, nd = carry
            e, t, idx, nd = body(scene, stack, o, d, inv, oi, e, t, idx, nd)
            return (jnp.abs(e) % N_NODES, t, idx, nd)

        e, t, idx, nd = jax.lax.fori_loop(
            0, k_ref[0], step, (jnp.int32(0), t0, i0, z0)
        )
        out[0, 0] = t[0, 0] + (e + idx[0, 0] + nd[0, 0]).astype(jnp.float32)

    return kernel


def _run(name, body, scene_arrays, k_lo=20_000, k_hi=120_000, reps=3):
    n_scene = len(scene_arrays)
    kernel = _loop_kernel(body, n_scene)
    specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_scene
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
    )
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((256,), jnp.int32)],
    )
    rays = _rays()

    def timed(k):
        ks = jnp.asarray([k], jnp.int32)
        float(fn(ks, *scene_arrays, *rays)[0, 0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(ks, *scene_arrays, *rays)[0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(k_lo), timed(k_hi)
    ns = (t_hi - t_lo) / (k_hi - k_lo) * 1e9
    print(f"{name:20s} {ns:8.1f} ns/iter", flush=True)
    return ns


def main():
    qbox, qmeta = _boxes()
    cmi = _cmat()
    Rh, Rl = _rmats(_rays())
    print(f"devices: {jax.devices()}", flush=True)

    def gs_of(e, n=4):
        return [(e + 11 * i) % N_GROUPS for i in range(n)]

    def body_inner(scene, stack, o, d, inv, oi, e, t, idx, nd):
        qbox, qmeta = scene
        sp, tacc = _inner8(qbox, qmeta, oi, inv, jnp.float32(T_MAX),
                           stack, e, jnp.float32(0))
        return e + sp + stack[0], t + tacc * 0.0, idx, nd

    def body_leaf_c(scene, stack, o, d, inv, oi, e, t, idx, nd):
        cmi, Rh, Rl = scene
        t, idx, nd, _ = _mxu_leaf_closest_n(
            cmi, Rh[:, :], Rl[:, :], gs_of(e), t, idx, nd, 8
        )
        return e + idx[0, 0] + 1, t, idx, nd

    def body_leaf_o(scene, stack, o, d, inv, oi, e, t, idx, nd):
        cmi, Rh, Rl = scene
        m2 = t * t
        nd = _mxu_leaf_occluded_n(cmi, Rh[:, :], Rl[:, :], gs_of(e), nd, m2)
        return e + nd[0, 0] + 1, t, idx, nd

    def body_both_c(scene, stack, o, d, inv, oi, e, t, idx, nd):
        qbox, qmeta, cmi, Rh, Rl = scene
        t, idx, nd, _ = _mxu_leaf_closest_n(
            cmi, Rh[:, :], Rl[:, :], gs_of(e), t, idx, nd, 8
        )
        sp, _ = _inner8(qbox, qmeta, oi, inv, jnp.float32(T_MAX),
                        stack, e + 1, jnp.float32(0))
        return e + sp + idx[0, 0] + stack[0], t, idx, nd

    def body_both_o(scene, stack, o, d, inv, oi, e, t, idx, nd):
        qbox, qmeta, cmi, Rh, Rl = scene
        m2 = t * t
        nd = _mxu_leaf_occluded_n(cmi, Rh[:, :], Rl[:, :], gs_of(e), nd, m2)
        sp, _ = _inner8(qbox, qmeta, oi, inv, jnp.float32(T_MAX),
                        stack, e + 1, jnp.float32(0))
        return e + sp + nd[0, 0] + stack[0], t, idx, nd

    def body_both_o6(scene, stack, o, d, inv, oi, e, t, idx, nd):
        qbox, qmeta, cmi, Rh, Rl = scene
        m2 = t * t
        nd = _mxu_leaf_occluded_n(cmi, Rh[:, :], Rl[:, :], gs_of(e, 6),
                                  nd, m2)
        sp, _ = _inner8(qbox, qmeta, oi, inv, jnp.float32(T_MAX),
                        stack, e + 1, jnp.float32(0))
        return e + sp + nd[0, 0] + stack[0], t, idx, nd

    def body_both_c6(scene, stack, o, d, inv, oi, e, t, idx, nd):
        qbox, qmeta, cmi, Rh, Rl = scene
        t, idx, nd, _ = _mxu_leaf_closest_n(
            cmi, Rh[:, :], Rl[:, :], gs_of(e, 6), t, idx, nd, 8
        )
        sp, _ = _inner8(qbox, qmeta, oi, inv, jnp.float32(T_MAX),
                        stack, e + 1, jnp.float32(0))
        return e + sp + idx[0, 0] + stack[0], t, idx, nd

    def body_both_o8(scene, stack, o, d, inv, oi, e, t, idx, nd):
        qbox, qmeta, cmi, Rh, Rl = scene
        m2 = t * t
        nd = _mxu_leaf_occluded_n(cmi, Rh[:, :], Rl[:, :], gs_of(e, 8),
                                  nd, m2)
        sp, _ = _inner8(qbox, qmeta, oi, inv, jnp.float32(T_MAX),
                        stack, e + 1, jnp.float32(0))
        return e + sp + nd[0, 0] + stack[0], t, idx, nd

    r = {}
    r["inner8"] = _run("inner8", body_inner, [qbox, qmeta])
    r["leaf4_closest"] = _run("leaf4_closest", body_leaf_c, [cmi, Rh, Rl])
    r["leaf4_occluded"] = _run("leaf4_occluded", body_leaf_o, [cmi, Rh, Rl])
    r["both_closest"] = _run("both_closest", body_both_c,
                             [qbox, qmeta, cmi, Rh, Rl])
    r["both_occluded"] = _run("both_occluded", body_both_o,
                              [qbox, qmeta, cmi, Rh, Rl])
    r["both_closest6"] = _run("both_closest6", body_both_c6,
                              [qbox, qmeta, cmi, Rh, Rl])
    r["both_occluded6"] = _run("both_occluded6", body_both_o6,
                               [qbox, qmeta, cmi, Rh, Rl])
    r["both_occluded8"] = _run("both_occluded8", body_both_o8,
                               [qbox, qmeta, cmi, Rh, Rl])
    for k in ("closest", "occluded"):
        s = r["inner8"] + r[f"leaf4_{k}"]
        m = max(r["inner8"], r[f"leaf4_{k}"])
        b = r[f"both_{k}"]
        ov = (s - b) / max(s - m, 1e-9)
        print(f"{k}: sum={s:.0f} max={m:.0f} both={b:.0f} "
              f"-> overlap harvested {100*ov:.0f}%", flush=True)


if __name__ == "__main__":
    main()
