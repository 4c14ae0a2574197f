"""Itemize the per-iteration SCALAR GLUE of the wide-pop inner visit.

Round-4 verdict #1: the production frame (228.5 ms) sits 53 ms above its
serial-issue floor (175.2 ms), attributed to ~300 ns/iteration of scalar
glue — SMEM stack pushes/pops, the per-node sort networks, the per-child
block-min extracts, and the width/kind lax.conds — of which only the
cond component (9-21 ns, metrics/microbench_cond.json) had ever been
measured in isolation. This harness itemizes the other three AT THE
PRODUCTION VISIT WIDTHS (npop=4/8, arity 4) and prices the candidate
replacement mechanisms.

Method: each variant runs K data-dependent iterations of one visit body
inside a Mosaic loop (iteration count pinned by construction — unlike an
end-to-end no-sort frame, whose t_cut pruning and therefore visit count
drift); per-iteration ns is the (K_hi-K_lo)/(t_hi-t_lo) marginal. The
FULL body replicates the production `_wide_inner_visit` exactly,
including the dual-stack push pattern (every child is stored to BOTH the
inner and leaf stacks with predicated pointer bumps —
ops/pallas_trace.py:1201-1207), which the older microbench_inner bodies
under-modeled with single-stack pushes.

Ablations (successive differences isolate each component):
  full       production body (loads, slab, reduce, block-mins, meta
             extracts, sort, dual-stack pushes)
  nosort     full minus the per-node 5-comparator sort networks
  nopush     full minus the 2*arity*npop SMEM stores + pointer bumps
             (child scalars folded into a checksum so nothing DCEs)
  nopush1    full with SINGLE-stack pushes (the older harness's model)
  noextract  loads + slab + shared reduce only; ONE scalar min total
             (prices block-min extracts + meta lane extracts + sort +
             pushes together when differenced against full)
  vec        pure vector work: slab + reduce, no scalar consumption
             (floor of the body)

Candidate replacements (same work, different mechanism):
  sel1stack  single two-ended stack: one store per child at a
             select(leaf, top_ptr, bottom_ptr) address — halves the
             SMEM store count
  rankpush   sort+push fused: per-child push DESTINATION computed from
             rank counts (6 shared pairwise compares, 3 masked adds per
             child), no sort network, no serial select chain
  ranksel    rankpush + single two-ended stack combined

Writes metrics/microbench_glue.json. Run on the real chip.
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
    SUBLANES, LANES, T_MAX, Vec3, _load_node_row, _child_extract,
    _slab_masked, _sortn,
)

N_NODES = 4096
ARITY = 4


def _rays():
    rng = np.random.default_rng(0)
    o = [jnp.asarray(rng.normal(size=(SUBLANES, LANES)), jnp.float32)
         for _ in range(3)]
    d = [jnp.asarray(rng.normal(size=(SUBLANES, LANES)), jnp.float32)
         for _ in range(3)]
    return o + d


def _boxes():
    rng = np.random.default_rng(1)
    mn = rng.uniform(-4, 3, size=(N_NODES, ARITY, 3)).astype(np.float32)
    mx = mn + rng.uniform(0.1, 1.0, size=(N_NODES, ARITY, 3)).astype(
        np.float32)
    qbox = np.zeros((N_NODES, 32), np.float32)
    for k in range(ARITY):
        qbox[:, 6 * k: 6 * k + 3] = mn[:, k]
        qbox[:, 6 * k + 3: 6 * k + 6] = mx[:, k]
    meta = np.zeros((N_NODES, 8), np.int32)
    # children: mix of inner (>=0) and leaf (<0) entries like a real tree
    meta[:, :ARITY] = rng.integers(-64, 64, size=(N_NODES, ARITY))
    meta[:, ARITY:] = 1
    return jnp.asarray(qbox), jnp.asarray(meta)


def _loop_kernel(body, n_scene=2):
    """Wrap `body(qbox, qmeta, istack, lstack, oi, inv, e) -> (e, acc)`
    in a data-dependent K-loop (next node index derives from the visit)."""

    def kernel(k_ref, *allrest):
        scene = allrest[:n_scene]
        rest = allrest[n_scene:]
        rays = rest[:6]
        out = rest[6]
        istack, lstack = rest[7], rest[8]
        o = Vec3(rays[0][:, :], rays[1][:, :], rays[2][:, :])
        d = Vec3(rays[3][:, :], rays[4][:, :], rays[5][:, :])
        inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
        oi = Vec3(o.x * inv.x, o.y * inv.y, o.z * inv.z)

        def step(i, carry):
            e, acc = carry
            e, dacc = body(*scene, istack, lstack, oi, inv, e)
            e = jnp.abs(e) % N_NODES
            return e, acc + dacc

        e, acc = jax.lax.fori_loop(
            0, k_ref[0], step, (jnp.int32(0), jnp.float32(0.0))
        )
        out[0, 0] = acc + e.astype(jnp.float32)

    return kernel


def _run(name, body, scene, k_lo=100_000, k_hi=400_000, reps=3,
         scene_spaces=None):
    spaces = scene_spaces or [pltpu.VMEM] * len(scene)
    fn = pl.pallas_call(
        _loop_kernel(body, n_scene=len(scene)),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=sp) for sp in spaces]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        ),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((512,), jnp.int32),
                        pltpu.SMEM((512,), jnp.int32)],
    )
    rays = _rays()
    # Per-call jitter on a ray plane: the tunnel dispatch cache survives
    # process restarts and returns cached results for identical
    # dispatches (docs/DESIGN.md section 9) — without this, a re-run of
    # the harness records zero marginals.
    import itertools
    ctr = itertools.count(1)

    def call(k):
        ks = jnp.asarray([k], jnp.int32)
        j = jnp.float32(next(ctr)) * 1e-7
        return float(fn(ks, *scene, rays[0] + j, *rays[1:])[0, 0])

    def timed(k):
        call(k)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            call(k)
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(k_lo), timed(k_hi)
    ns = (t_hi - t_lo) / (k_hi - k_lo) * 1e9
    print(f"{name:46s} {ns:8.1f} ns/iter", flush=True)
    return ns


# --------------------------------------------------------------------------
# Shared pieces
# --------------------------------------------------------------------------

def _load_and_slab(qbox, qmeta, oi, inv, e, npop):
    """npop node loads + slab evals + ONE shared lane reduction —
    the production visit's vector core (pinned-schedule version)."""
    loaded = []
    for i in range(npop):
        en = (e + 3 * i) % N_NODES
        mn, mx = _load_node_row(qbox, en, False)
        m = qmeta[pl.ds(en, 1), :]
        loaded.append((mn, mx, m))
    vs = []
    for mn, mx, _m in loaded:
        for k in range(ARITY):
            lo, hi = _child_extract(mn, mx, k, False)
            vs.append(_slab_masked(lo, hi, oi, inv, jnp.float32(T_MAX)))
    both = jnp.concatenate(vs, axis=0)       # (npop*ARITY*8, 128)
    red = jnp.min(both, axis=1)
    return loaded, red


def _child_scalars(loaded, red, n):
    """Block-min + meta-lane extracts for pop slot n (production form)."""
    m = loaded[n][2]
    base = ARITY * n
    ms = [
        jnp.min(red[SUBLANES * (base + k): SUBLANES * (base + k + 1)])
        for k in range(ARITY)
    ]
    es = [m[0, k] for k in range(ARITY)]
    return ms, es


# --------------------------------------------------------------------------
# Bodies
# --------------------------------------------------------------------------

def body_full(npop):
    """Production _wide_inner_visit (dual-stack pushes, sort networks)."""
    def body(qbox, qmeta, istack, lstack, oi, inv, e):
        loaded, red = _load_and_slab(qbox, qmeta, oi, inv, e, npop)
        isp = jnp.int32(8)
        lsp = jnp.int32(8)
        chk = jnp.int32(0)
        for n in reversed(range(npop)):
            ms, es = _child_scalars(loaded, red, n)
            ms, es = _sortn(ms, es)
            for k in reversed(range(ARITY)):
                ok = ms[k] < T_MAX
                leafc = es[k] < 0
                istack[isp] = es[k]
                isp = isp + (ok & jnp.logical_not(leafc)).astype(jnp.int32)
                lstack[lsp] = es[k]
                lsp = lsp + (ok & leafc).astype(jnp.int32)
            chk = chk + es[0]
        return e + isp + lsp + chk, jnp.float32(0.0)
    return body


def body_nosort(npop):
    def body(qbox, qmeta, istack, lstack, oi, inv, e):
        loaded, red = _load_and_slab(qbox, qmeta, oi, inv, e, npop)
        isp = jnp.int32(8)
        lsp = jnp.int32(8)
        chk = jnp.int32(0)
        for n in reversed(range(npop)):
            ms, es = _child_scalars(loaded, red, n)
            for k in reversed(range(ARITY)):
                ok = ms[k] < T_MAX
                leafc = es[k] < 0
                istack[isp] = es[k]
                isp = isp + (ok & jnp.logical_not(leafc)).astype(jnp.int32)
                lstack[lsp] = es[k]
                lsp = lsp + (ok & leafc).astype(jnp.int32)
            chk = chk + es[0]
        return e + isp + lsp + chk, jnp.float32(0.0)
    return body


def body_nopush(npop):
    """Sort kept; SMEM stores and pointer bumps replaced by a checksum
    (child scalars still consumed, so nothing dead-code-eliminates)."""
    def body(qbox, qmeta, istack, lstack, oi, inv, e):
        loaded, red = _load_and_slab(qbox, qmeta, oi, inv, e, npop)
        chk = jnp.int32(0)
        for n in reversed(range(npop)):
            ms, es = _child_scalars(loaded, red, n)
            ms, es = _sortn(ms, es)
            for k in reversed(range(ARITY)):
                ok = ms[k] < T_MAX
                chk = chk + jnp.where(ok, es[k], 0)
        return e + chk, jnp.float32(0.0)
    return body


def body_nopush1(npop):
    """Production sort + SINGLE-stack pushes (microbench_inner's model)."""
    def body(qbox, qmeta, istack, lstack, oi, inv, e):
        loaded, red = _load_and_slab(qbox, qmeta, oi, inv, e, npop)
        isp = jnp.int32(8)
        chk = jnp.int32(0)
        for n in reversed(range(npop)):
            ms, es = _child_scalars(loaded, red, n)
            ms, es = _sortn(ms, es)
            for k in reversed(range(ARITY)):
                ok = ms[k] < T_MAX
                istack[isp] = es[k]
                isp = isp + ok.astype(jnp.int32)
            chk = chk + es[0]
        return e + isp + chk, jnp.float32(0.0)
    return body


def body_noextract(npop):
    """Loads + slab + shared reduce; ONE scalar min consumes the vector."""
    def body(qbox, qmeta, istack, lstack, oi, inv, e):
        loaded, red = _load_and_slab(qbox, qmeta, oi, inv, e, npop)
        m0 = jnp.min(red)
        chk = loaded[0][2][0, 0]
        return e + 1 + chk + (m0 < 0).astype(jnp.int32), jnp.float32(0.0)
    return body


def body_vec(npop):
    """Slab + reduce only (no meta consumption beyond one lane)."""
    def body(qbox, qmeta, istack, lstack, oi, inv, e):
        vs = []
        for i in range(npop):
            en = (e + 3 * i) % N_NODES
            mn, mx = _load_node_row(qbox, en, False)
            for k in range(ARITY):
                lo, hi = _child_extract(mn, mx, k, False)
                vs.append(_slab_masked(lo, hi, oi, inv, jnp.float32(T_MAX)))
        both = jnp.concatenate(vs, axis=0)
        red = jnp.min(both, axis=1)
        m0 = jnp.min(red)
        return e + 1 + (m0 < 0).astype(jnp.int32), jnp.float32(0.0)
    return body


# --------------------------------------------------------------------------
# Candidate replacement mechanisms
# --------------------------------------------------------------------------

def body_sel1stack(npop):
    """Two-ended single stack: ONE store per child at a selected address
    (inner grows up from 8, leaves grow down from 500)."""
    def body(qbox, qmeta, istack, lstack, oi, inv, e):
        loaded, red = _load_and_slab(qbox, qmeta, oi, inv, e, npop)
        isp = jnp.int32(8)
        ltp = jnp.int32(500)
        chk = jnp.int32(0)
        for n in reversed(range(npop)):
            ms, es = _child_scalars(loaded, red, n)
            ms, es = _sortn(ms, es)
            for k in reversed(range(ARITY)):
                ok = ms[k] < T_MAX
                leafc = es[k] < 0
                dest = jnp.where(leafc, ltp, isp)
                istack[dest] = es[k]
                isp = isp + (ok & jnp.logical_not(leafc)).astype(jnp.int32)
                ltp = ltp - (ok & leafc).astype(jnp.int32)
            chk = chk + es[0]
        return e + isp + ltp + chk, jnp.float32(0.0)
    return body


def _rank_dests(ms, es, isp, ltp):
    """Fused sort+push destinations: far-to-near rank within each kind.

    6 shared pairwise compares; per child, its destination slot is the
    base pointer advanced by the number of same-kind valid children that
    push BEFORE it (farther ms, ties by child index). Invalid children
    are routed to dump slot 511."""
    ok = [ms[k] < T_MAX for k in range(ARITY)]
    leafc = [es[k] < 0 for k in range(ARITY)]
    inner = [ok[k] & jnp.logical_not(leafc[k]) for k in range(ARITY)]
    leaf = [ok[k] & leafc[k] for k in range(ARITY)]
    # gt[j][k]: child j pushes before child k (farther, ties by index)
    gt = {}
    for j in range(ARITY):
        for k in range(ARITY):
            if j == k:
                continue
            if j < k:
                gt[(j, k)] = ms[j] >= ms[k]
            else:
                gt[(j, k)] = ms[j] > ms[k]
    dests = []
    n_inner = jnp.int32(0)
    n_leaf = jnp.int32(0)
    for k in range(ARITY):
        ri = jnp.int32(0)
        rl = jnp.int32(0)
        for j in range(ARITY):
            if j == k:
                continue
            ri = ri + (gt[(j, k)] & inner[j]).astype(jnp.int32)
            rl = rl + (gt[(j, k)] & leaf[j]).astype(jnp.int32)
        d_in = isp + ri
        d_lf = ltp - rl
        dest = jnp.where(inner[k], d_in, jnp.where(leaf[k], d_lf, 511))
        dests.append(dest)
        n_inner = n_inner + inner[k].astype(jnp.int32)
        n_leaf = n_leaf + leaf[k].astype(jnp.int32)
    return dests, n_inner, n_leaf


def body_ranksel(npop):
    """Rank-destination pushes + two-ended single stack (no sort net)."""
    def body(qbox, qmeta, istack, lstack, oi, inv, e):
        loaded, red = _load_and_slab(qbox, qmeta, oi, inv, e, npop)
        isp = jnp.int32(8)
        ltp = jnp.int32(500)
        chk = jnp.int32(0)
        for n in reversed(range(npop)):
            ms, es = _child_scalars(loaded, red, n)
            dests, n_inner, n_leaf = _rank_dests(ms, es, isp, ltp)
            for k in range(ARITY):
                istack[dests[k]] = es[k]
            isp = isp + n_inner
            ltp = ltp - n_leaf
            chk = chk + es[0]
        return e + isp + ltp + chk, jnp.float32(0.0)
    return body


def body_rankdual(npop):
    """Rank destinations, dual stacks kept (isolates the sort-net saving
    from the store-count saving)."""
    def body(qbox, qmeta, istack, lstack, oi, inv, e):
        loaded, red = _load_and_slab(qbox, qmeta, oi, inv, e, npop)
        isp = jnp.int32(8)
        lsp = jnp.int32(8)
        chk = jnp.int32(0)
        for n in reversed(range(npop)):
            ms, es = _child_scalars(loaded, red, n)
            ok = [ms[k] < T_MAX for k in range(ARITY)]
            leafc = [es[k] < 0 for k in range(ARITY)]
            inner = [ok[k] & jnp.logical_not(leafc[k]) for k in range(ARITY)]
            leaf = [ok[k] & leafc[k] for k in range(ARITY)]
            gt = {}
            for j in range(ARITY):
                for k in range(ARITY):
                    if j == k:
                        continue
                    gt[(j, k)] = (ms[j] >= ms[k]) if j < k else (ms[j] > ms[k])
            n_inner = jnp.int32(0)
            n_leaf = jnp.int32(0)
            for k in range(ARITY):
                ri = jnp.int32(0)
                rl = jnp.int32(0)
                for j in range(ARITY):
                    if j == k:
                        continue
                    ri = ri + (gt[(j, k)] & inner[j]).astype(jnp.int32)
                    rl = rl + (gt[(j, k)] & leaf[j]).astype(jnp.int32)
                istack[jnp.where(inner[k], isp + ri, 511)] = es[k]
                lstack[jnp.where(leaf[k], lsp + rl, 511)] = es[k]
                n_inner = n_inner + inner[k].astype(jnp.int32)
                n_leaf = n_leaf + leaf[k].astype(jnp.int32)
            isp = isp + n_inner
            lsp = lsp + n_leaf
            chk = chk + es[0]
        return e + isp + lsp + chk, jnp.float32(0.0)
    return body


# --------------------------------------------------------------------------
# Extraction-strategy candidates (the measured dominant component):
# hoist the per-child 8-sublane-slice mins out of scalar land.
# --------------------------------------------------------------------------

def _child_scalars_x2(loaded, both, npop):
    """Two-stage grouped VECTOR reduce: (G*8,128) -> sublane-group min
    (G,128) -> lane min (G,), then one trivial element read per child."""
    G = npop * ARITY
    s1 = jnp.min(both.reshape(G, SUBLANES, LANES), axis=1)   # (G, 128)
    s2 = jnp.min(s1, axis=1)                                  # (G,)
    out = []
    for n in range(npop):
        m = loaded[n][2]
        ms = [s2[ARITY * n + k] for k in range(ARITY)]
        es = [m[0, k] for k in range(ARITY)]
        out.append((ms, es))
    return out


def body_full_x2(npop):
    """Production visit with the X2 vector-hoisted extraction."""
    def body(qbox, qmeta, istack, lstack, oi, inv, e):
        loaded = []
        for i in range(npop):
            en = (e + 3 * i) % N_NODES
            mn, mx = _load_node_row(qbox, en, False)
            m = qmeta[pl.ds(en, 1), :]
            loaded.append((mn, mx, m))
        vs = []
        for mn, mx, _m in loaded:
            for k in range(ARITY):
                lo, hi = _child_extract(mn, mx, k, False)
                vs.append(_slab_masked(lo, hi, oi, inv, jnp.float32(T_MAX)))
        both = jnp.concatenate(vs, axis=0)
        sc = _child_scalars_x2(loaded, both, npop)
        isp = jnp.int32(8)
        lsp = jnp.int32(8)
        chk = jnp.int32(0)
        for n in reversed(range(npop)):
            ms, es = sc[n]
            ms, es = _sortn(ms, es)
            for k in reversed(range(ARITY)):
                ok = ms[k] < T_MAX
                leafc = es[k] < 0
                istack[isp] = es[k]
                isp = isp + (ok & jnp.logical_not(leafc)).astype(jnp.int32)
                lstack[lsp] = es[k]
                lsp = lsp + (ok & leafc).astype(jnp.int32)
            chk = chk + es[0]
        return e + isp + lsp + chk, jnp.float32(0.0)
    return body


def body_x2_nosortpush(npop):
    """X2 extraction alone (scalars consumed by checksum)."""
    def body(qbox, qmeta, istack, lstack, oi, inv, e):
        loaded = []
        for i in range(npop):
            en = (e + 3 * i) % N_NODES
            mn, mx = _load_node_row(qbox, en, False)
            m = qmeta[pl.ds(en, 1), :]
            loaded.append((mn, mx, m))
        vs = []
        for mn, mx, _m in loaded:
            for k in range(ARITY):
                lo, hi = _child_extract(mn, mx, k, False)
                vs.append(_slab_masked(lo, hi, oi, inv, jnp.float32(T_MAX)))
        both = jnp.concatenate(vs, axis=0)
        sc = _child_scalars_x2(loaded, both, npop)
        chk = jnp.int32(0)
        acc = jnp.float32(0.0)
        for n in range(npop):
            ms, es = sc[n]
            for k in range(ARITY):
                acc = acc + ms[k]
                chk = chk + es[k]
        return e + chk + (acc < 0).astype(jnp.int32), jnp.float32(0.0)
    return body


def body_full_x4(npop):
    """Production visit, per-child FULL vector reduce (no shared concat:
    each child's own (8,128) plane reduced straight to a scalar)."""
    def body(qbox, qmeta, istack, lstack, oi, inv, e):
        loaded = []
        for i in range(npop):
            en = (e + 3 * i) % N_NODES
            mn, mx = _load_node_row(qbox, en, False)
            m = qmeta[pl.ds(en, 1), :]
            loaded.append((mn, mx, m))
        planes = []
        for mn, mx, _m in loaded:
            for k in range(ARITY):
                lo, hi = _child_extract(mn, mx, k, False)
                planes.append(
                    _slab_masked(lo, hi, oi, inv, jnp.float32(T_MAX))
                )
        isp = jnp.int32(8)
        lsp = jnp.int32(8)
        chk = jnp.int32(0)
        for n in reversed(range(npop)):
            m = loaded[n][2]
            ms = [jnp.min(planes[ARITY * n + k]) for k in range(ARITY)]
            es = [m[0, k] for k in range(ARITY)]
            ms, es = _sortn(ms, es)
            for k in reversed(range(ARITY)):
                ok = ms[k] < T_MAX
                leafc = es[k] < 0
                istack[isp] = es[k]
                isp = isp + (ok & jnp.logical_not(leafc)).astype(jnp.int32)
                lstack[lsp] = es[k]
                lsp = lsp + (ok & leafc).astype(jnp.int32)
            chk = chk + es[0]
        return e + isp + lsp + chk, jnp.float32(0.0)
    return body


# --------------------------------------------------------------------------
# Crossing-count attack probes: the extraction measurements above show the
# dominant glue is vector->scalar CROSSING latency (hoisted reduces that
# keep one crossing per child move nothing). These variants change the
# NUMBER of crossings per iteration.
# --------------------------------------------------------------------------

def body_full_xs(npop):
    """Production visit, child entries (es) read from an SMEM meta mirror
    instead of VMEM lane extracts — halves the crossings if VMEM lane
    reads cross and SMEM scalar loads do not."""
    def body(qbox, qmeta, meta_s, istack, lstack, oi, inv, e):
        loaded = []
        ens = []
        for i in range(npop):
            en = (e + 3 * i) % N_NODES
            mn, mx = _load_node_row(qbox, en, False)
            loaded.append((mn, mx))
            ens.append(en)
        vs = []
        for mn, mx in loaded:
            for k in range(ARITY):
                lo, hi = _child_extract(mn, mx, k, False)
                vs.append(_slab_masked(lo, hi, oi, inv, jnp.float32(T_MAX)))
        both = jnp.concatenate(vs, axis=0)
        red = jnp.min(both, axis=1)
        isp = jnp.int32(8)
        lsp = jnp.int32(8)
        chk = jnp.int32(0)
        for n in reversed(range(npop)):
            base = ARITY * n
            ms = [
                jnp.min(red[SUBLANES * (base + k): SUBLANES * (base + k + 1)])
                for k in range(ARITY)
            ]
            es = [meta_s[ens[n] * ARITY + k] for k in range(ARITY)]
            ms, es = _sortn(ms, es)
            for k in reversed(range(ARITY)):
                ok = ms[k] < T_MAX
                leafc = es[k] < 0
                istack[isp] = es[k]
                isp = isp + (ok & jnp.logical_not(leafc)).astype(jnp.int32)
                lstack[lsp] = es[k]
                lsp = lsp + (ok & leafc).astype(jnp.int32)
            chk = chk + es[0]
        return e + isp + lsp + chk, jnp.float32(0.0)
    return body


def body_xb(npop):
    """UNSORTED visit with the per-child hit decisions packed into TWO
    scalar crossings per ITERATION: per-child ok bits are computed in
    vector land and summed into two 16-bit masks; the scalar side
    unpacks each bit with shifts. es from the SMEM mirror. (Order is
    natural, not near-first — pricing the mechanism, not the schedule.)"""
    def body(qbox, qmeta, meta_s, istack, lstack, oi, inv, e):
        n_child = npop * ARITY
        loaded = []
        ens = []
        for i in range(npop):
            en = (e + 3 * i) % N_NODES
            mn, mx = _load_node_row(qbox, en, False)
            loaded.append((mn, mx))
            ens.append(en)
        vs = []
        for mn, mx in loaded:
            for k in range(ARITY):
                lo, hi = _child_extract(mn, mx, k, False)
                vs.append(_slab_masked(lo, hi, oi, inv, jnp.float32(T_MAX)))
        both = jnp.concatenate(vs, axis=0)         # (n_child*8, 128)
        s1 = jnp.min(both.reshape(n_child, SUBLANES, LANES), axis=1)
        okp = s1 < jnp.float32(T_MAX)              # (n_child, 128)
        row = jax.lax.broadcasted_iota(jnp.int32, (n_child, LANES), 0)
        w2 = jnp.int32(1) << (row % 16)
        mp = jnp.where(okp, w2, 0)
        m_lo = jnp.sum(jnp.max(jnp.where(row < 16, mp, 0), axis=1))
        m_hi = jnp.sum(jnp.max(jnp.where(row >= 16, mp, 0), axis=1))
        isp = jnp.int32(8)
        lsp = jnp.int32(8)
        chk = jnp.int32(0)
        for n in reversed(range(npop)):
            for k in reversed(range(ARITY)):
                c = ARITY * n + k
                src = m_lo if c < 16 else m_hi
                ok = ((src >> (c % 16)) & 1) > 0
                ek = meta_s[ens[n] * ARITY + k]
                leafc = ek < 0
                istack[isp] = ek
                isp = isp + (ok & jnp.logical_not(leafc)).astype(jnp.int32)
                lstack[lsp] = ek
                lsp = lsp + (ok & leafc).astype(jnp.int32)
            chk = chk + meta_s[ens[n] * ARITY]
        return e + isp + lsp + chk, jnp.float32(0.0)
    return body


def main():
    qbox, qmeta = _boxes()
    scene = (qbox, qmeta)
    meta_s = jnp.asarray(
        np.asarray(qmeta)[:, :ARITY].reshape(-1).astype(np.int32)
    )
    scene3 = (qbox, qmeta, meta_s)
    print(f"devices: {jax.devices()}", flush=True)

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes-only", action="store_true",
                    help="run only the crossing-count probes (xs/xb) "
                         "plus the full baseline")
    args = ap.parse_args()

    S3 = [pltpu.VMEM, pltpu.VMEM, pltpu.SMEM]
    out = {}
    for npop in (4, 8):
        res = {}
        res["full"] = _run(f"W{npop} full production visit",
                           body_full(npop), scene)
        res["full_xs"] = _run(f"W{npop} full, es from SMEM mirror",
                              body_full_xs(npop), scene3, scene_spaces=S3)
        res["xb"] = _run(f"W{npop} packed ok-mask, SMEM es, no sort",
                         body_xb(npop), scene3, scene_spaces=S3)
        if args.probes_only:
            res["components"] = {
                "xs_saving_ns": res["full"] - res["full_xs"],
                "xb_saving_ns": res["full"] - res["xb"],
            }
            print(json.dumps(res["components"], indent=2), flush=True)
            out[f"npop{npop}"] = res
            continue
        res["nosort"] = _run(f"W{npop} no sort network",
                             body_nosort(npop), scene)
        res["nopush"] = _run(f"W{npop} no stack pushes",
                             body_nopush(npop), scene)
        res["nopush1"] = _run(f"W{npop} single-stack pushes",
                              body_nopush1(npop), scene)
        res["noextract"] = _run(f"W{npop} no per-child extracts",
                                body_noextract(npop), scene)
        res["vec"] = _run(f"W{npop} vector work only",
                          body_vec(npop), scene)
        res["sel1stack"] = _run(f"W{npop} two-ended single stack",
                                body_sel1stack(npop), scene)
        res["ranksel"] = _run(f"W{npop} rank push + single stack",
                              body_ranksel(npop), scene)
        res["rankdual"] = _run(f"W{npop} rank push, dual stacks",
                               body_rankdual(npop), scene)
        res["full_x2"] = _run(f"W{npop} full, X2 grouped vector extract",
                              body_full_x2(npop), scene)
        res["x2_only"] = _run(f"W{npop} X2 extraction alone",
                              body_x2_nosortpush(npop), scene)
        res["full_x4"] = _run(f"W{npop} full, per-child full reduce",
                              body_full_x4(npop), scene)
        res["components"] = {
            "sort_networks_ns": res["full"] - res["nosort"],
            "stack_pushes_ns": res["full"] - res["nopush"],
            "dual_vs_single_stack_ns": res["full"] - res["nopush1"],
            "extracts_sort_push_ns": res["full"] - res["noextract"],
            "scalar_total_ns": res["full"] - res["vec"],
            "sel1stack_saving_ns": res["full"] - res["sel1stack"],
            "ranksel_saving_ns": res["full"] - res["ranksel"],
            "rankdual_saving_ns": res["full"] - res["rankdual"],
            "x2_saving_ns": res["full"] - res["full_x2"],
            "x4_saving_ns": res["full"] - res["full_x4"],
            "xs_saving_ns": res["full"] - res["full_xs"],
            "xb_saving_ns": res["full"] - res["xb"],
        }
        print(json.dumps(res["components"], indent=2), flush=True)
        out[f"npop{npop}"] = res

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metrics",
        "microbench_glue_probes.json" if args.probes_only
        else "microbench_glue.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
