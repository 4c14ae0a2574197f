"""Pallas TPU packet-traversal kernels (the production hot path).

TPU-native replacement for the reference's CUDA traversal kernels
(gpu/src/bvh.cu:288-392, one thread per ray with a register stack): here one
*grid step* owns a (8, 128) = 1024-ray packet whose state lives entirely in
vector registers, a single scalar traversal stack lives in SMEM, and all
geometry tests are dense (8, 128) VPU ops. The algorithm is identical to
ops/trace_bvh.py (which is the jittable reference implementation these
kernels are tested against).

Memory layout, driven by Mosaic's addressing rules (dynamic indexing is only
cheap on the second-minor dimension):

  - ``cbox`` (Ni, 16) f32 — for inner node i, BOTH children's AABBs packed in
    one row: [lmin.xyz, lmax.xyz, rmin.xyz, rmax.xyz, pad4]. One dynamic row
    fetch + 12 static lane extracts per visit instead of two node fetches.
    This is the "float_align" idea (gpu/include/vec.cuh:6-27) adapted to
    sublane addressing.
  - ``cmeta`` (Ni, 8) i32 — [enc_l, enc_r, ...]: child encoding. enc >= 0 is
    an inner-node row index; enc < 0 is a leaf holding triangle group
    ``-enc - 1``. Leaves therefore never occupy node rows (the reference
    stores leaves as nodes with tr_len > 0, cpu/include/bvh.h:17-22).
  - ``tri`` (G, 128) f32 — leaf triangle groups: L triangles x 12 floats
    [v0.xyz, e1.xyz, e2.xyz, n.xyz] per triangle (n = e1 x e2 precomputed,
    the quantity Moller-Trumbore needs; the reference recomputes it per test,
    cpu/src/raytracer.c:38-41). Degenerate padding slots have n == 0 so
    det == 0 and they can never hit.

bf16 compression of cbox (the hbvh_t analog, gpu/include/bvh.cuh:19-28) uses
conservative rounding from ops/bvh_flat.compress_bf16 semantics: min down,
max up, so culling stays exact.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh_flat import FlatBVH
from .intersect import EPSILON, INV_DIR_MAX

# Plain Python float (jnp scalars would be captured as constants by kernels).
T_MAX = 3.4028235e38
from .trace_brute import Hit, HitFull
from .vecmath import Vec3

LANES = 128
SUBLANES = 8
PACKET = LANES * SUBLANES            # rays per grid step
TRI_STRIDE = 12                      # floats per triangle in a group row
STACK_DEPTH = 96


def required_stack_depth(tree_depth: int, arity: int) -> int:
    """SMEM stack words guaranteed to hold the worst-case traversal.

    An arity-a kernel pops 1 entry and pushes <= a per inner visit, so the
    stack grows by at most (a-1) per level of descent of the *packed* tree,
    whose depth is ceil(binary_depth / log2(a)). Never shrinks below the
    round-1 default so common configs keep their compiled-kernel cache.
    (Fixes the unguarded fixed-96 stack flagged in ADVICE.md: deep trees
    from --max-depth 64 plus flatten_bvh's oversized-leaf subtrees could
    overflow and corrupt SMEM silently.)
    """
    levels = {2: 1, 4: 2, 8: 3}[arity]
    packed_depth = max(1, -(-int(tree_depth) // levels))
    return max(STACK_DEPTH, (arity - 1) * packed_depth + 2)
# Scene arrays (node rows + triangle groups) stay VMEM-resident across the
# whole grid; the compiler's default scoped-vmem limit (16 MB) is far below
# the v5e's physical VMEM, so raise it to admit dragon-class scenes
# (~200k triangles ~= 30 MB resident; measured capacity > 61 MB).
VMEM_LIMIT_BYTES = 100 * 1024 * 1024


@dataclasses.dataclass
class PackedBVH:
    """Host-side packed arrays ready for upload."""

    cbox: np.ndarray    # (Ni, 16) f32 (or bf16)
    cmeta: np.ndarray   # (Ni, 8) i32
    tri: np.ndarray     # (G, 128) f32
    leaf_size: int

    @property
    def n_inner(self) -> int:
        return int(self.cbox.shape[0])

    @property
    def n_groups(self) -> int:
        return int(self.tri.shape[0])


def pack_bvh(flat: FlatBVH, tri_verts: np.ndarray, bf16: bool = False) -> PackedBVH:
    """Pack a FlatBVH + original (T,3,3) triangle vertices for the kernels."""
    L = flat.leaf_size
    if L * TRI_STRIDE > LANES:
        raise ValueError(f"leaf_size {L} needs {L*TRI_STRIDE} lanes > {LANES}")

    count, a = flat.count, flat.a
    inner_old = np.nonzero(count == 0)[0]
    if inner_old.size == 0:
        # Tiny scene: the root itself is a leaf. Emit one synthetic inner
        # with BOTH children pointing at that leaf. (An "inverted AABB" is
        # NOT a never-hit sentinel under the ordered slab test — min/max
        # reordering turns it into an unconstrained interval — so the dead
        # child carries the real box and the same encoding; testing the
        # single leaf twice is idempotent for closest and any-hit alike.)
        cbox = np.zeros((1, 16), np.float32)
        cbox[0, 0:3] = flat.node_min[0]
        cbox[0, 3:6] = flat.node_max[0]
        cbox[0, 6:9] = flat.node_min[0]
        cbox[0, 9:12] = flat.node_max[0]
        cmeta = np.zeros((1, 8), np.int32)
        cmeta[0, 0] = -(a[0] // L) - 1
        cmeta[0, 1] = cmeta[0, 0]
    else:
        remap = np.full(flat.n_nodes, -1, np.int64)
        remap[inner_old] = np.arange(inner_old.size)
        assert remap[0] == 0, "root must be the first inner node"
        Ni = inner_old.size
        cbox = np.zeros((Ni, 16), np.float32)
        cmeta = np.zeros((Ni, 8), np.int32)
        cl = a[inner_old]                 # left child of each inner (right = cl+1)
        cbox[:, 0:3] = flat.node_min[cl]
        cbox[:, 3:6] = flat.node_max[cl]
        cbox[:, 6:9] = flat.node_min[cl + 1]
        cbox[:, 9:12] = flat.node_max[cl + 1]
        for k in (0, 1):
            ch = cl + k
            is_leaf = count[ch] > 0
            cmeta[:, k] = np.where(is_leaf, -(a[ch] // L) - 1, remap[ch])
            assert (is_leaf | (remap[ch] >= 0)).all()

    # Triangle group rows: slot s = g*L + j lives at lanes [12j, 12j+12) of
    # row g; pad slots (slot_map == -1) stay all-zero (n == 0 -> always miss).
    tv = np.asarray(tri_verts, np.float32)
    G = flat.n_slots // L
    sm = flat.slot_map
    safe = np.maximum(sm, 0)
    v0 = tv[safe, 0]
    e1 = tv[safe, 1] - v0
    e2 = tv[safe, 2] - v0
    n = np.cross(e1, e2)
    data = np.concatenate([v0, e1, e2, n], axis=1).astype(np.float32)  # (S, 12)
    data[sm < 0] = 0.0
    tri = np.zeros((G, LANES), np.float32)
    tri[:, : TRI_STRIDE * L] = data.reshape(G, L * TRI_STRIDE)

    if bf16:
        cbox = cbox_to_bf16(cbox)

    return PackedBVH(cbox=cbox, cmeta=cmeta, tri=tri, leaf_size=L)


def pack_bvh4(flat: FlatBVH, tri_verts: np.ndarray, bf16: bool = False) -> PackedBVH:
    """Pack a binary FlatBVH as a 4-wide (BVH4) node table.

    Each quad node row holds its four *grandchildren* boxes (binary levels
    collapsed in pairs), so one traversal iteration tests 4 boxes with a
    single shared cross-lane reduction — the reduce-to-scalar latency is the
    inner-visit bottleneck, and 4-wide halves the number of reductions per
    box tested vs the binary kernel (measured 31%/27% faster per pass at
    2-wide already; 4-wide continues the same trade).

      - qbox  (Nq, 32) f32: child k's [min.xyz, max.xyz] at lanes [6k, 6k+6).
      - qmeta (Nq, 8) i32: 4 child encodings (enc < 0: leaf group, enc >= 0:
        quad node) then 4 validity flags. Absent children are masked by the
        flag, NOT by an "inverted box": the ordered slab test turns an
        inverted box into an unconstrained interval that always hits.
      - tri rows identical to pack_bvh (leaf groups are unchanged).
    """
    L = flat.leaf_size
    count, a = flat.count, flat.a
    nmn, nmx = flat.node_min, flat.node_max
    binary = pack_bvh(flat, tri_verts, bf16=False)  # reuse tri rows
    tri = binary.tri

    def leaf_enc(i):
        return -(int(a[i]) // L) - 1

    entries_of = {}
    if count[0] > 0:
        order = [None]  # synthetic root
        entries_of[None] = [("leaf", 0)]
    else:
        qid = {0: 0}
        order = [0]
        queue = [0]
        while queue:
            i = queue.pop()
            entries = []
            for ch in (int(a[i]), int(a[i]) + 1):
                if count[ch] > 0:
                    entries.append(("leaf", ch))
                else:
                    for gc in (int(a[ch]), int(a[ch]) + 1):
                        if count[gc] > 0:
                            entries.append(("leaf", gc))
                        else:
                            entries.append(("inner", gc))
                            if gc not in qid:
                                qid[gc] = len(qid)
                                order.append(gc)
                                queue.append(gc)
            entries_of[i] = entries

    Nq = len(order)
    qbox = np.zeros((Nq, 32), np.float32)
    qmeta = np.zeros((Nq, 8), np.int32)
    for row, i in enumerate(order):
        for k, (kind, j) in enumerate(entries_of[i]):
            qbox[row, 6 * k : 6 * k + 3] = nmn[j]
            qbox[row, 6 * k + 3 : 6 * k + 6] = nmx[j]
            qmeta[row, 4 + k] = 1       # validity flag
            if kind == "leaf":
                qmeta[row, k] = leaf_enc(j)
            else:
                qmeta[row, k] = qid[j]

    if bf16:
        qbox = qbox_to_bf16(qbox)
    return PackedBVH(cbox=qbox, cmeta=qmeta, tri=tri, leaf_size=L)


def pack_bvh8(flat: FlatBVH, tri_verts: np.ndarray, bf16: bool = False) -> PackedBVH:
    """Pack a binary FlatBVH as an 8-wide (BVH8) node table.

    Three binary levels collapse into one node: up to 8 descendants per row,
    one shared cross-lane reduction culls and orders all of them (see
    pack_bvh4 — BVH8 halves traversal iterations again at the cost of a
    larger scalar sorting network per visit).

      - obox  (No, 64) f32: child k's [min.xyz, max.xyz] at lanes [6k, 6k+6).
      - ometa (No, 16) i32: 8 child encodings then 8 validity flags.
    """
    L = flat.leaf_size
    count, a = flat.count, flat.a
    nmn, nmx = flat.node_min, flat.node_max
    binary = pack_bvh(flat, tri_verts, bf16=False)
    tri = binary.tri

    def leaf_enc(i):
        return -(int(a[i]) // L) - 1

    def expand(i, depth):
        """Descendants of binary-inner i after collapsing `depth` levels."""
        out = []
        for ch in (int(a[i]), int(a[i]) + 1):
            if count[ch] > 0 or depth == 1:
                out.append(("leaf" if count[ch] > 0 else "inner", ch))
            else:
                out.extend(expand(ch, depth - 1))
        return out

    entries_of = {}
    if count[0] > 0:
        order = [None]
        entries_of[None] = [("leaf", 0)]
    else:
        oid = {0: 0}
        order = [0]
        queue = [0]
        while queue:
            i = queue.pop()
            entries = expand(i, 3)
            for kind, j in entries:
                if kind == "inner" and j not in oid:
                    oid[j] = len(oid)
                    order.append(j)
                    queue.append(j)
            entries_of[i] = entries

    No = len(order)
    obox = np.zeros((No, 64), np.float32)
    ometa = np.zeros((No, 16), np.int32)
    for row, i in enumerate(order):
        for k, (kind, j) in enumerate(entries_of[i]):
            obox[row, 6 * k : 6 * k + 3] = nmn[j]
            obox[row, 6 * k + 3 : 6 * k + 6] = nmx[j]
            ometa[row, 8 + k] = 1
            ometa[row, k] = leaf_enc(j) if kind == "leaf" else oid[j]

    if bf16:
        raise NotImplementedError("bf16 BVH8 rows not supported")
    return PackedBVH(cbox=obox, cmeta=ometa, tri=tri, leaf_size=L)


def qbox_to_bf16(qbox: np.ndarray) -> np.ndarray:
    """Conservative bf16 rounding for 4-wide box rows."""
    import ml_dtypes

    lo_cols = [c for k in range(4) for c in range(6 * k, 6 * k + 3)]
    hi_cols = [c for k in range(4) for c in range(6 * k + 3, 6 * k + 6)]
    qbox = np.ascontiguousarray(qbox, np.float32)
    bits = qbox.view(np.uint32) & np.uint32(0xFFFF0000)
    f = bits.view(np.float32)
    bump = bits + np.uint32(0x00010000)
    out = bits.copy()
    for c in lo_cols:
        out[:, c] = np.where(f[:, c] > qbox[:, c], bump[:, c], bits[:, c])
    for c in hi_cols:
        out[:, c] = np.where(f[:, c] < qbox[:, c], bump[:, c], bits[:, c])
    return out.view(np.float32).astype(ml_dtypes.bfloat16)


def cbox_to_bf16(cbox: np.ndarray) -> np.ndarray:
    """Conservative bf16 rounding of children-packed box rows: min planes
    down, max planes up (see ops/bvh_flat.compress_bf16)."""
    import ml_dtypes

    lo_cols = list(range(0, 3)) + list(range(6, 9))
    hi_cols = list(range(3, 6)) + list(range(9, 12))
    cbox = np.ascontiguousarray(cbox, np.float32)
    bits = cbox.view(np.uint32) & np.uint32(0xFFFF0000)
    f = bits.view(np.float32)
    bump = bits + np.uint32(0x00010000)
    out = bits.copy()
    # min planes: round down (truncation raises negatives; push them back)
    for c in lo_cols:
        out[:, c] = np.where(f[:, c] > cbox[:, c], bump[:, c], bits[:, c])
    # max planes: round up
    for c in hi_cols:
        out[:, c] = np.where(f[:, c] < cbox[:, c], bump[:, c], bits[:, c])
    return out.view(np.float32).astype(ml_dtypes.bfloat16)


def _extract3(row, base: int):
    return row[0, base], row[0, base + 1], row[0, base + 2]


def _slab_masked(lo, hi, o, inv, t_cut):
    """Per-lane pruned slab entry distance against a scalar AABB: tmin where
    the box can still improve the lane, T_MAX elsewhere. (8, 128) lanes."""
    tx1 = (lo[0] - o.x) * inv.x
    tx2 = (hi[0] - o.x) * inv.x
    tmin = jnp.minimum(tx1, tx2)
    tmax = jnp.maximum(tx1, tx2)
    ty1 = (lo[1] - o.y) * inv.y
    ty2 = (hi[1] - o.y) * inv.y
    tmin = jnp.maximum(tmin, jnp.minimum(ty1, ty2))
    tmax = jnp.minimum(tmax, jnp.maximum(ty1, ty2))
    tz1 = (lo[2] - o.z) * inv.z
    tz2 = (hi[2] - o.z) * inv.z
    tmin = jnp.maximum(tmin, jnp.minimum(tz1, tz2))
    tmax = jnp.minimum(tmax, jnp.maximum(tz1, tz2))
    ok = (tmax >= tmin) & (tmax > 0.0) & (tmin < t_cut)
    return jnp.where(ok, tmin, T_MAX)


def _slab(lo, hi, o, inv, t_cut):
    """Packet's pruned minimum entry distance (scalar) to a scalar AABB."""
    return jnp.min(_slab_masked(lo, hi, o, inv, t_cut))


def _slab_pair(crow, o, inv, t_cut):
    """Both children's pruned minimum entry distances with ONE cross-lane
    reduction.

    The reduce-to-scalar sits on the scalar unit's critical path (the push
    decision consumes it), so two sequential full reductions per inner visit
    dominate its cost; concatenating the children's masked distances along
    sublanes shares the expensive lane-direction reduction, leaving only two
    tiny sublane reductions.
    """
    vl = _slab_masked(_extract3(crow, 0), _extract3(crow, 3), o, inv, t_cut)
    vr = _slab_masked(_extract3(crow, 6), _extract3(crow, 9), o, inv, t_cut)
    both = jnp.concatenate([vl, vr], axis=0)       # (16, 128)
    red = jnp.min(both, axis=1)                    # (16,) lane reduce, shared
    ml = jnp.min(red[:SUBLANES])
    mr = jnp.min(red[SUBLANES:])
    return ml, mr


def _mt_scalar_tri(o: Vec3, d: Vec3, row, j: int):
    """Moller-Trumbore of the whole packet against triangle j of a group row.

    Scalar triangle data broadcast against (8,128) ray planes
    (cpu/src/raytracer.c:35-59 semantics: det = -dot(d, n), miss -> T_MAX).
    """
    base = TRI_STRIDE * j
    v0x, v0y, v0z = _extract3(row, base)
    e1x, e1y, e1z = _extract3(row, base + 3)
    e2x, e2y, e2z = _extract3(row, base + 6)
    nx, ny, nz = _extract3(row, base + 9)

    det = -(d.x * nx + d.y * ny + d.z * nz)
    invdet = 1.0 / det
    aox = o.x - v0x
    aoy = o.y - v0y
    aoz = o.z - v0z
    # dao = ao x d
    daox = aoy * d.z - aoz * d.y
    daoy = aoz * d.x - aox * d.z
    daoz = aox * d.y - aoy * d.x
    u = (e2x * daox + e2y * daoy + e2z * daoz) * invdet
    v = -(e1x * daox + e1y * daoy + e1z * daoz) * invdet
    t = (aox * nx + aoy * ny + aoz * nz) * invdet
    hit = (
        (jnp.abs(det) >= EPSILON)
        & (t > EPSILON)
        & (u >= 0.0)
        & (v >= 0.0)
        & ((u + v) <= 1.0)
    )
    return jnp.where(hit, t, T_MAX), det < 0.0


def _load_rays(ox, oy, oz, dx, dy, dz):
    o = Vec3(ox[:, :], oy[:, :], oz[:, :])
    d = Vec3(dx[:, :], dy[:, :], dz[:, :])
    lim = jnp.float32(INV_DIR_MAX)
    inv = Vec3(
        jnp.clip(1.0 / d.x, -lim, lim),
        jnp.clip(1.0 / d.y, -lim, lim),
        jnp.clip(1.0 / d.z, -lim, lim),
    )
    return o, d, inv


def _closest_kernel(L: int):
    def kernel(ox, oy, oz, dx, dy, dz, cbox, cmeta, tri, t_out, idx_out, nd_out, stack):
        o, d, inv = _load_rays(ox, oy, oz, dx, dy, dz)

        stack[0] = jnp.int32(0)  # root inner node

        def leaf(g, t, idx, nd):
            row = tri[pl.ds(g, 1), :].astype(jnp.float32)
            for j in range(L):
                tj, ndj = _mt_scalar_tri(o, d, row, j)
                better = tj < t
                t = jnp.where(better, tj, t)
                idx = jnp.where(better, g * L + j, idx)
                # nd carried as i32: Mosaic cannot carry i1 vectors in loops.
                nd = jnp.where(better, ndj.astype(jnp.int32), nd)
            return t, idx, nd

        def body(state):
            sp, t, idx, nd = state
            sp = sp - 1
            e = stack[sp]

            def do_leaf(args):
                sp, t, idx, nd = args
                t, idx, nd = leaf(-e - 1, t, idx, nd)
                return sp, t, idx, nd

            def do_inner(args):
                sp, t, idx, nd = args
                crow = cbox[pl.ds(e, 1), :].astype(jnp.float32)
                mrow = cmeta[pl.ds(e, 1), :]
                enc_l = mrow[0, 0]
                enc_r = mrow[0, 1]
                ml, mr = _slab_pair(crow, o, inv, t)
                left_near = ml <= mr
                near_e = jnp.where(left_near, enc_l, enc_r)
                far_e = jnp.where(left_near, enc_r, enc_l)
                near_hit = jnp.where(left_near, ml, mr) < T_MAX
                far_hit = jnp.where(left_near, mr, ml) < T_MAX

                # push far first so near pops first (cpu/src/bvh.c:344-356)
                stack[sp] = far_e
                sp = sp + far_hit.astype(jnp.int32)
                stack[sp] = near_e
                sp = sp + near_hit.astype(jnp.int32)
                return sp, t, idx, nd

            return jax.lax.cond(e < 0, do_leaf, do_inner, (sp, t, idx, nd))

        def cond(state):
            return state[0] > 0

        init = (
            jnp.int32(1),
            jnp.full((SUBLANES, LANES), T_MAX, jnp.float32),
            jnp.full((SUBLANES, LANES), -1, jnp.int32),
            jnp.zeros((SUBLANES, LANES), jnp.int32),
        )
        _, t, idx, nd = jax.lax.while_loop(cond, body, init)
        t_out[:, :] = t
        idx_out[:, :] = idx
        nd_out[:, :] = nd

    return kernel


def _occluded_kernel(L: int):
    def kernel(ox, oy, oz, dx, dy, dz, m2, cbox, cmeta, tri, out, stack):
        o, d, inv = _load_rays(ox, oy, oz, dx, dy, dz)
        max_dist2 = m2[:, :]
        t_limit = jnp.sqrt(max_dist2)  # d is unit for shadow rays

        stack[0] = jnp.int32(0)

        def body(state):
            sp, blocked, all_blocked = state
            sp = sp - 1
            e = stack[sp]

            def do_leaf(args):
                sp, blocked, all_blocked = args
                g = -e - 1
                row = tri[pl.ds(g, 1), :].astype(jnp.float32)
                for j in range(L):
                    tj, _ = _mt_scalar_tri(o, d, row, j)
                    hit = (tj < T_MAX) & (tj * tj < max_dist2)
                    blocked = jnp.maximum(blocked, hit.astype(jnp.int32))
                # `blocked` only grows at leaves, so the all-blocked early
                # exit (bvh_light_traverse's return, cpu/src/bvh.c:283-290)
                # needs this reduction only here — keeping it out of the
                # while condition, which would pay it every iteration.
                all_blocked = jnp.min(blocked)
                return sp, blocked, all_blocked

            def do_inner(args):
                sp, blocked, all_blocked = args
                crow = cbox[pl.ds(e, 1), :].astype(jnp.float32)
                mrow = cmeta[pl.ds(e, 1), :]
                t_cut = jnp.where(blocked > 0, jnp.float32(0.0), t_limit)
                ml, mr = _slab_pair(crow, o, inv, t_cut)
                # Near-first ordering: the reference pushes unordered
                # (cpu/src/bvh.c:298-313), but popping probable blockers
                # first lets lanes block sooner, collapsing their t_cut and
                # pruning later visits (~10% fewer in simulation).
                left_near = ml <= mr
                near_e = jnp.where(left_near, mrow[0, 0], mrow[0, 1])
                far_e = jnp.where(left_near, mrow[0, 1], mrow[0, 0])
                stack[sp] = far_e
                sp = sp + (jnp.where(left_near, mr, ml) < T_MAX).astype(jnp.int32)
                stack[sp] = near_e
                sp = sp + (jnp.where(left_near, ml, mr) < T_MAX).astype(jnp.int32)
                return sp, blocked, all_blocked

            return jax.lax.cond(e < 0, do_leaf, do_inner, (sp, blocked, all_blocked))

        def cond(state):
            sp, _, all_blocked = state
            return (sp > 0) & (all_blocked == 0)

        init = (
            jnp.int32(1),
            jnp.zeros((SUBLANES, LANES), jnp.int32),
            jnp.int32(0),
        )
        _, blocked, _ = jax.lax.while_loop(cond, body, init)
        out[:, :] = blocked

    return kernel


def _slab_quad(qrow, o, inv, t_cut):
    """Four children's pruned min entry distances, ONE cross-lane reduction."""
    vs = [
        _slab_masked(
            _extract3(qrow, 6 * k), _extract3(qrow, 6 * k + 3), o, inv, t_cut
        )
        for k in range(4)
    ]
    both = jnp.concatenate(vs, axis=0)        # (32, 128)
    red = jnp.min(both, axis=1)               # (32,) shared lane reduction
    return tuple(
        jnp.min(red[SUBLANES * k : SUBLANES * (k + 1)]) for k in range(4)
    )


def _slab_multi(row, o, inv, t_cut, n: int):
    """n children's pruned min entry distances with ONE cross-lane reduction."""
    vs = [
        _slab_masked(
            _extract3(row, 6 * k), _extract3(row, 6 * k + 3), o, inv, t_cut
        )
        for k in range(n)
    ]
    both = jnp.concatenate(vs, axis=0)
    red = jnp.min(both, axis=1)
    return tuple(
        jnp.min(red[SUBLANES * k : SUBLANES * (k + 1)]) for k in range(n)
    )


def _sortn(ms, es):
    """Ascending sort of (distance, encoding) pairs via Batcher networks."""
    nets = {
        2: ((0, 1),),
        4: ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)),
        8: ((0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
            (1, 2), (5, 6), (0, 4), (3, 7), (1, 5), (2, 6), (1, 4), (3, 6),
            (2, 4), (3, 5), (3, 4)),
    }
    n = len(ms)

    def cswap(i, j, ms, es):
        swap = ms[i] > ms[j]
        mi = jnp.where(swap, ms[j], ms[i])
        mj = jnp.where(swap, ms[i], ms[j])
        ei = jnp.where(swap, es[j], es[i])
        ej = jnp.where(swap, es[i], es[j])
        ms = [mi if k == i else (mj if k == j else ms[k]) for k in range(n)]
        es = [ei if k == i else (ej if k == j else es[k]) for k in range(n)]
        return ms, es

    for i, j in nets[n]:
        ms, es = cswap(i, j, ms, es)
    return ms, es


def _sort4(ms, es):
    """Ascending 4-sort of (distance, encoding) pairs via a 5-comparator
    network — scalar selects only."""

    def cswap(i, j, ms, es):
        swap = ms[i] > ms[j]
        mi = jnp.where(swap, ms[j], ms[i])
        mj = jnp.where(swap, ms[i], ms[j])
        ei = jnp.where(swap, es[j], es[i])
        ej = jnp.where(swap, es[i], es[j])
        ms = [mi if k == i else (mj if k == j else ms[k]) for k in range(4)]
        es = [ei if k == i else (ej if k == j else es[k]) for k in range(4)]
        return ms, es

    for i, j in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
        ms, es = cswap(i, j, ms, es)
    return ms, es


def _closest4_kernel(L: int, arity: int = 4):
    def kernel(ox, oy, oz, dx, dy, dz, qbox, qmeta, tri, t_out, idx_out, nd_out, stack):
        o, d, inv = _load_rays(ox, oy, oz, dx, dy, dz)
        stack[0] = jnp.int32(0)

        def leaf(g, t, idx, nd):
            row = tri[pl.ds(g, 1), :].astype(jnp.float32)
            for j in range(L):
                tj, ndj = _mt_scalar_tri(o, d, row, j)
                better = tj < t
                t = jnp.where(better, tj, t)
                idx = jnp.where(better, g * L + j, idx)
                nd = jnp.where(better, ndj.astype(jnp.int32), nd)
            return t, idx, nd

        def body(state):
            sp, t, idx, nd = state
            sp = sp - 1
            e = stack[sp]

            def do_leaf(args):
                sp, t, idx, nd = args
                t, idx, nd = leaf(-e - 1, t, idx, nd)
                return sp, t, idx, nd

            def do_inner(args):
                sp, t, idx, nd = args
                qrow = qbox[pl.ds(e, 1), :].astype(jnp.float32)
                mrow = qmeta[pl.ds(e, 1), :]
                ms = list(_slab_multi(qrow, o, inv, t, arity))
                # Absent children sort last and never push (validity flags).
                ms = [
                    jnp.where(mrow[0, arity + k] > 0, ms[k], jnp.float32(T_MAX))
                    for k in range(arity)
                ]
                es = [mrow[0, k] for k in range(arity)]
                ms, es = _sortn(ms, es)
                # push far-to-near so the nearest child pops first
                for k in reversed(range(arity)):
                    stack[sp] = es[k]
                    sp = sp + (ms[k] < T_MAX).astype(jnp.int32)
                return sp, t, idx, nd

            return jax.lax.cond(e < 0, do_leaf, do_inner, (sp, t, idx, nd))

        init = (
            jnp.int32(1),
            jnp.full((SUBLANES, LANES), T_MAX, jnp.float32),
            jnp.full((SUBLANES, LANES), -1, jnp.int32),
            jnp.zeros((SUBLANES, LANES), jnp.int32),
        )
        _, t, idx, nd = jax.lax.while_loop(lambda s: s[0] > 0, body, init)
        t_out[:, :] = t
        idx_out[:, :] = idx
        nd_out[:, :] = nd

    return kernel


def _occluded4_kernel(L: int, arity: int = 4):
    def kernel(ox, oy, oz, dx, dy, dz, m2, qbox, qmeta, tri, out, stack):
        o, d, inv = _load_rays(ox, oy, oz, dx, dy, dz)
        max_dist2 = m2[:, :]
        t_limit = jnp.sqrt(max_dist2)
        stack[0] = jnp.int32(0)

        def body(state):
            sp, blocked, all_blocked = state
            sp = sp - 1
            e = stack[sp]

            def do_leaf(args):
                sp, blocked, all_blocked = args
                g = -e - 1
                row = tri[pl.ds(g, 1), :].astype(jnp.float32)
                for j in range(L):
                    tj, _ = _mt_scalar_tri(o, d, row, j)
                    hit = (tj < T_MAX) & (tj * tj < max_dist2)
                    blocked = jnp.maximum(blocked, hit.astype(jnp.int32))
                all_blocked = jnp.min(blocked)
                return sp, blocked, all_blocked

            def do_inner(args):
                sp, blocked, all_blocked = args
                qrow = qbox[pl.ds(e, 1), :].astype(jnp.float32)
                mrow = qmeta[pl.ds(e, 1), :]
                t_cut = jnp.where(blocked > 0, jnp.float32(0.0), t_limit)
                ms = list(_slab_multi(qrow, o, inv, t_cut, arity))
                # Near-first (see the binary kernel's note): sort so probable
                # blockers pop first; invalid slots sort last and never push.
                ms = [
                    jnp.where(mrow[0, arity + k] > 0, ms[k], jnp.float32(T_MAX))
                    for k in range(arity)
                ]
                es = [mrow[0, k] for k in range(arity)]
                ms, es = _sortn(ms, es)
                for k in reversed(range(arity)):
                    stack[sp] = es[k]
                    sp = sp + (ms[k] < T_MAX).astype(jnp.int32)
                return sp, blocked, all_blocked

            return jax.lax.cond(
                e < 0, do_leaf, do_inner, (sp, blocked, all_blocked)
            )

        init = (
            jnp.int32(1),
            jnp.zeros((SUBLANES, LANES), jnp.int32),
            jnp.int32(0),
        )
        _, blocked, _ = jax.lax.while_loop(
            lambda s: (s[0] > 0) & (s[2] == 0), body, init
        )
        out[:, :] = blocked

    return kernel


ATTR_STRIDE = 9  # kd(3), ks(3), kr(3) per triangle in an attr row


def pack_attr(flat: FlatBVH, mat_idx, mats_kd, mats_ks, mats_kr) -> np.ndarray:
    """(G, 128) attribute rows: triangle j's [kd, ks, kr] at lanes [9j, 9j+9).

    Lets the closest-hit kernels resolve shading attributes with masked
    selects at leaf time instead of per-lane gathers afterwards (HitFull).
    Pad slots keep zeros (they can never win a hit anyway).
    """
    L = flat.leaf_size
    sm = flat.slot_map
    G = flat.n_slots // L
    safe = np.maximum(sm, 0)
    mi = np.asarray(mat_idx, np.int32)[safe]
    kd = np.asarray(mats_kd, np.float32)[mi]
    ks = np.asarray(mats_ks, np.float32)[mi]
    kr = np.asarray(mats_kr, np.float32)[mi]
    data = np.concatenate([kd, ks, kr], axis=1)          # (S, 9)
    data[sm < 0] = 0.0
    attr = np.zeros((G, LANES), np.float32)
    attr[:, : ATTR_STRIDE * L] = data.reshape(G, L * ATTR_STRIDE)
    return attr


def _attr_leaf_update(o, d, tri_row, arow, g, j, L, t, idx, nd, av):
    """One triangle test + attribute-tracking select updates."""
    tj, ndj = _mt_scalar_tri(o, d, tri_row, j)
    better = tj < t
    t = jnp.where(better, tj, t)
    idx = jnp.where(better, g * L + j, idx)
    nd = jnp.where(better, ndj.astype(jnp.int32), nd)
    scal = (
        *_extract3(tri_row, TRI_STRIDE * j + 9),       # unnormalized n
        *_extract3(arow, ATTR_STRIDE * j),             # kd
        *_extract3(arow, ATTR_STRIDE * j + 3),         # ks
        *_extract3(arow, ATTR_STRIDE * j + 6),         # kr
    )
    av = tuple(jnp.where(better, s, a) for s, a in zip(scal, av))
    return t, idx, nd, av


def _closest_attr_kernel(L: int, arity: int):
    """Closest hit + surface attributes (12 extra carried planes)."""

    def kernel(ox, oy, oz, dx, dy, dz, cbox, cmeta, tri, attr,
               t_out, idx_out, nd_out, *rest):
        outs = rest[:12]
        stack = rest[12]
        o, d, inv = _load_rays(ox, oy, oz, dx, dy, dz)
        stack[0] = jnp.int32(0)

        def leaf(g, t, idx, nd, av):
            tri_row = tri[pl.ds(g, 1), :].astype(jnp.float32)
            arow = attr[pl.ds(g, 1), :].astype(jnp.float32)
            for j in range(L):
                t, idx, nd, av = _attr_leaf_update(
                    o, d, tri_row, arow, g, j, L, t, idx, nd, av
                )
            return t, idx, nd, av

        def body(state):
            sp, t, idx, nd, av = state
            sp = sp - 1
            e = stack[sp]

            def do_leaf(args):
                sp, t, idx, nd, av = args
                t, idx, nd, av = leaf(-e - 1, t, idx, nd, av)
                return sp, t, idx, nd, av

            def do_inner(args):
                sp, t, idx, nd, av = args
                crow = cbox[pl.ds(e, 1), :].astype(jnp.float32)
                mrow = cmeta[pl.ds(e, 1), :]
                if arity >= 4:
                    ms = list(_slab_multi(crow, o, inv, t, arity))
                    ms = [
                        jnp.where(mrow[0, arity + k] > 0, ms[k], jnp.float32(T_MAX))
                        for k in range(arity)
                    ]
                    es = [mrow[0, k] for k in range(arity)]
                    ms, es = _sortn(ms, es)
                    for k in reversed(range(arity)):
                        stack[sp] = es[k]
                        sp = sp + (ms[k] < T_MAX).astype(jnp.int32)
                else:
                    ml, mr = _slab_pair(crow, o, inv, t)
                    left_near = ml <= mr
                    near_e = jnp.where(left_near, mrow[0, 0], mrow[0, 1])
                    far_e = jnp.where(left_near, mrow[0, 1], mrow[0, 0])
                    stack[sp] = far_e
                    sp = sp + (jnp.where(left_near, mr, ml) < T_MAX).astype(jnp.int32)
                    stack[sp] = near_e
                    sp = sp + (jnp.where(left_near, ml, mr) < T_MAX).astype(jnp.int32)
                return sp, t, idx, nd, av

            return jax.lax.cond(e < 0, do_leaf, do_inner, (sp, t, idx, nd, av))

        zero = jnp.zeros((SUBLANES, LANES), jnp.float32)
        init = (
            jnp.int32(1),
            jnp.full((SUBLANES, LANES), T_MAX, jnp.float32),
            jnp.full((SUBLANES, LANES), -1, jnp.int32),
            jnp.zeros((SUBLANES, LANES), jnp.int32),
            tuple(zero for _ in range(12)),
        )
        _, t, idx, nd, av = jax.lax.while_loop(lambda s: s[0] > 0, body, init)
        t_out[:, :] = t
        idx_out[:, :] = idx
        nd_out[:, :] = nd
        for ref, val in zip(outs, av):
            ref[:, :] = val

    return kernel


def _ray_specs(n: int):
    return [
        pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(n)
    ]


def _scene_specs():
    return [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # cbox
        pl.BlockSpec(memory_space=pltpu.VMEM),  # cmeta
        pl.BlockSpec(memory_space=pltpu.VMEM),  # tri
    ]


@functools.partial(
    jax.jit, static_argnames=("leaf_size", "interpret", "stack_depth")
)
def closest_tiles(
    cbox, cmeta, tri, o: Vec3, d: Vec3, leaf_size: int, interpret: bool = False,
    stack_depth: int = STACK_DEPTH,
) -> Hit:
    """Closest hit over tiled rays: planes shaped (ntiles*8, 128)."""
    rows = o.x.shape[0]
    assert o.x.shape == (rows, LANES) and rows % SUBLANES == 0
    ntiles = rows // SUBLANES
    grid = (ntiles,)
    out_shape = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
    ]
    arity = {16: 2, 32: 4, 64: 8}[cbox.shape[1]]
    t, idx, nd = pl.pallas_call(
        _closest4_kernel(leaf_size, arity) if arity >= 4
        else _closest_kernel(leaf_size),
        grid=grid,
        out_shape=out_shape,
        in_specs=_ray_specs(6) + _scene_specs(),
        out_specs=[
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * 3,
        scratch_shapes=[pltpu.SMEM((stack_depth,), jnp.int32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(o.x, o.y, o.z, d.x, d.y, d.z, cbox, cmeta, tri)
    return Hit(t=t, idx=idx, norm_dir=nd.astype(bool))


@functools.partial(
    jax.jit, static_argnames=("leaf_size", "interpret", "stack_depth")
)
def closest_tiles_full(
    cbox, cmeta, tri, attr, o: Vec3, d: Vec3, leaf_size: int,
    interpret: bool = False, stack_depth: int = STACK_DEPTH,
) -> HitFull:
    """Closest hit + surface attributes over tiled rays (no shading gathers
    needed afterwards — see HitFull)."""
    rows = o.x.shape[0]
    assert o.x.shape == (rows, LANES) and rows % SUBLANES == 0
    ntiles = rows // SUBLANES
    arity = {16: 2, 32: 4, 64: 8}[cbox.shape[1]]
    out_shape = (
        [jax.ShapeDtypeStruct((rows, LANES), jnp.float32)]
        + [jax.ShapeDtypeStruct((rows, LANES), jnp.int32)] * 2
        + [jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 12
    )
    block = pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    res = pl.pallas_call(
        _closest_attr_kernel(leaf_size, arity),
        grid=(ntiles,),
        out_shape=out_shape,
        in_specs=_ray_specs(6) + _scene_specs() + [
            pl.BlockSpec(memory_space=pltpu.VMEM)   # attr rows
        ],
        out_specs=[block] * 15,
        scratch_shapes=[pltpu.SMEM((stack_depth,), jnp.int32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(o.x, o.y, o.z, d.x, d.y, d.z, cbox, cmeta, tri, attr)
    t, idx, nd = res[0], res[1], res[2]
    a = res[3:]
    return HitFull(
        t=t, idx=idx, norm_dir=nd.astype(bool),
        n=Vec3(a[0], a[1], a[2]),
        kd=Vec3(a[3], a[4], a[5]),
        ks=Vec3(a[6], a[7], a[8]),
        kr=Vec3(a[9], a[10], a[11]),
    )


@functools.partial(
    jax.jit, static_argnames=("leaf_size", "interpret", "stack_depth")
)
def occluded_tiles(
    cbox, cmeta, tri, o: Vec3, d: Vec3, max_dist2, leaf_size: int,
    interpret: bool = False, stack_depth: int = STACK_DEPTH,
):
    """Any-hit occlusion over tiled rays: planes shaped (ntiles*8, 128)."""
    rows = o.x.shape[0]
    assert o.x.shape == (rows, LANES) and rows % SUBLANES == 0
    ntiles = rows // SUBLANES
    arity = {16: 2, 32: 4, 64: 8}[cbox.shape[1]]
    blocked = pl.pallas_call(
        _occluded4_kernel(leaf_size, arity) if arity >= 4
        else _occluded_kernel(leaf_size),
        grid=(ntiles,),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        in_specs=_ray_specs(7) + _scene_specs(),
        out_specs=pl.BlockSpec(
            (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SMEM((stack_depth,), jnp.int32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(o.x, o.y, o.z, d.x, d.y, d.z, max_dist2, cbox, cmeta, tri)
    return blocked.astype(bool)


def make_tracer(packed_dev, leaf_size: int, interpret: bool = False, ds=None,
                stack_depth: int = STACK_DEPTH):
    """(closest, occluded) over flat (R,) ray planes, R % 1024 == 0.

    packed_dev: (cbox, cmeta, tri[, attr]) device arrays from a PackedBVH.
    With the 4th `attr` array, closest returns HitFull (surface attributes
    resolved in-kernel — no shading gathers). Pass `ds` to extend with the
    dense sphere post-pass (ops/spheres.py). `stack_depth` should come from
    required_stack_depth(flat.depth, arity).
    """
    if len(packed_dev) == 4:
        cbox, cmeta, tri, attr = packed_dev
    else:
        cbox, cmeta, tri = packed_dev
        attr = None

    def closest(o: Vec3, d: Vec3):
        R = o.x.shape[0]
        assert R % PACKET == 0, R
        rows = R // LANES
        o2, d2 = o.reshape(rows, LANES), d.reshape(rows, LANES)
        if attr is not None:
            h = closest_tiles_full(
                cbox, cmeta, tri, attr, o2, d2,
                leaf_size=leaf_size, interpret=interpret,
                stack_depth=stack_depth,
            )
            return HitFull(
                t=h.t.reshape(R), idx=h.idx.reshape(R),
                norm_dir=h.norm_dir.reshape(R),
                n=h.n.reshape(R), kd=h.kd.reshape(R),
                ks=h.ks.reshape(R), kr=h.kr.reshape(R),
            )
        h = closest_tiles(
            cbox, cmeta, tri, o2, d2,
            leaf_size=leaf_size, interpret=interpret, stack_depth=stack_depth,
        )
        return Hit(
            t=h.t.reshape(R), idx=h.idx.reshape(R), norm_dir=h.norm_dir.reshape(R)
        )

    def occluded(o: Vec3, d: Vec3, max_dist2: jax.Array):
        R = o.x.shape[0]
        assert R % PACKET == 0, R
        rows = R // LANES
        blocked = occluded_tiles(
            cbox, cmeta, tri,
            o.reshape(rows, LANES), d.reshape(rows, LANES),
            max_dist2.reshape(rows, LANES),
            leaf_size=leaf_size, interpret=interpret, stack_depth=stack_depth,
        )
        return blocked.reshape(R)

    if ds is not None:
        from .spheres import wrap_tracer

        return wrap_tracer(ds, closest, occluded)
    return closest, occluded
