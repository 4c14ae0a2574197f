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


def required_stack_depth(tree_depth: int, arity: int, npop: int = 2) -> int:
    """SMEM stack words guaranteed to hold the worst-case traversal.

    An arity-a kernel pops 1 entry and pushes <= a per inner visit, so the
    stack grows by at most (a-1) per level of descent of the *packed* tree,
    whose depth is ceil(binary_depth / log2(a)). Never shrinks below the
    round-1 default so common configs keep their compiled-kernel cache.
    (Fixes the unguarded fixed-96 stack flagged in ADVICE.md: deep trees
    from --max-depth 64 plus flatten_bvh's oversized-leaf subtrees could
    overflow and corrupt SMEM silently.)

    The wide-pop schedule (npop > 2) keeps up to npop partial DFS
    frontiers in flight, so the per-level growth multiplies by npop; the
    +2 level slack covers the transient where a visit has popped npop
    entries from one level and pushed npop*a of the next. SMEM words are
    cheap (the chip holds >= 256 KB), so the bound is deliberately loose.
    """
    lv = {2: 1, 4: 2, 8: 3}[arity]
    packed_depth = max(1, -(-int(tree_depth) // lv))
    if npop > 2:
        return max(
            STACK_DEPTH, npop * (arity - 1) * (packed_depth + 2) + npop + 2
        )
    return max(STACK_DEPTH, (arity - 1) * packed_depth + 2)
# Scene arrays (node rows + triangle groups) stay VMEM-resident across the
# whole grid; the compiler's default scoped-vmem limit (16 MB) is far below
# the v5e's physical VMEM, so raise it to admit dragon-class scenes
# (~200k triangles ~= 30 MB resident; measured capacity > 61 MB).
VMEM_LIMIT_BYTES = 100 * 1024 * 1024
# Measured ceiling for RESIDENT packed scene rows (pipeline's auto-stream
# threshold): a 450k-triangle scene (126 MB of rows) compiles and traces
# resident on the v5e, 600k (169 MB) does not (round 4). This sits ABOVE
# VMEM_LIMIT_BYTES because Mosaic treats vmem_limit_bytes as advisory for
# whole-kernel operands; the two constants live together here so a bump of
# either is made consciously against the other (ADVICE r4).
RESIDENT_ROWS_CEILING_BYTES = 126 * 1024 * 1024
assert RESIDENT_ROWS_CEILING_BYTES >= VMEM_LIMIT_BYTES
# SMEM mirror of the node meta table (child entries + validity): scalar
# loads from SMEM are ~free while VMEM lane extracts are vector->scalar
# crossings (~16 ns serialized; metrics/microbench_glue_probes.json), so
# the dual/wide/fused/streamed kernels read child entries from this
# mirror when the table fits. Ceiling measured by probe on the v5e:
# a 960 KB SMEM input compiles and runs, 1024 KB does not (the chip
# holds ~1 MB of SMEM); budget leaves headroom for the traversal
# stacks and Mosaic's own scalars. Covers scenes to ~28k BVH4 nodes
# (dragon is 464 KB); larger tables fall back to VMEM lane extracts.
SMEM_META_LIMIT_BYTES = 896 * 1024


def _smem_meta_fits(cmeta) -> bool:
    return 4 * cmeta.shape[0] * cmeta.shape[1] <= SMEM_META_LIMIT_BYTES


def _smem_meta_setup(cmeta, smem_meta, arity: int, *, dual: bool,
                     stream: bool):
    """Resolve the smem_meta knob for one kernel wrapper.

    None = auto (on iff the flat meta table fits SMEM_META_LIMIT_BYTES
    and a kernel family that supports the mirror is selected). An
    EXPLICIT True past the measured budget fails loudly here instead of
    as an opaque Mosaic SMEM allocation error. Returns
    (smem_meta, extra_inputs, extra_specs)."""
    if smem_meta is None:
        smem_meta = _smem_meta_fits(cmeta)
    elif smem_meta:
        assert _smem_meta_fits(cmeta), (
            f"smem_meta=True but the meta table is "
            f"{4 * cmeta.shape[0] * cmeta.shape[1]} B > "
            f"SMEM_META_LIMIT_BYTES ({SMEM_META_LIMIT_BYTES}); the v5e "
            f"holds ~1 MB of SMEM (960 KB compiles, 1024 KB does not)"
        )
    smem_meta = bool(smem_meta) and arity >= 4 and (dual or stream)
    if not smem_meta:
        return False, [], []
    return True, [cmeta.reshape(-1)], [
        pl.BlockSpec(memory_space=pltpu.SMEM)
    ]


@dataclasses.dataclass
class PackedBVH:
    """Host-side packed arrays ready for upload."""

    cbox: np.ndarray    # (Ni, 16) f32 (or bf16 pairs viewed f32)
    cmeta: np.ndarray   # (Ni, 8) i32
    tri: np.ndarray     # (G, 128) f32
    leaf_size: int
    compressed: bool = False   # cbox holds bf16 (min|max) pairs (f32 view)
    cmat: "np.ndarray | None" = None  # (G*4L, 16) f32 MXU leaf C-matrices

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
    # One trailing all-zero NULL group (index G): a zero triangle has
    # det == 0, so it can never hit (closest candidates stay T_MAX,
    # any-hit never blocks); the streaming ring fetches it harmlessly on
    # padded pops.
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
    tri = np.zeros((G + 1, LANES), np.float32)
    tri[:G, : TRI_STRIDE * L] = data.reshape(G, L * TRI_STRIDE)

    if bf16:
        cbox = cbox_to_bf16(cbox)

    cmat = _build_cmat(v0, e1, e2, n, sm, G, L)
    return PackedBVH(cbox=cbox, cmeta=cmeta, tri=tri, leaf_size=L, cmat=cmat)


def _build_cmat(v0, e1, e2, n, sm, G: int, L: int) -> np.ndarray:
    """(G*4L, 16) leaf C-matrices for the MXU leaf path.

    Möller-Trumbore's four per-(ray, triangle) quantities are LINEAR in the
    per-ray feature vector R = [d(3), M=o x d(3), o(3), 1, pad(6)]:

        det   = (-n) . d
        t_num = n . o - (v0 . n)            (= (o - v0) . n)
        u_num = e2 . M - (e2 x v0) . d      (= e2 . ((o - v0) x d))
        v_num = (e1 x v0) . d - e1 . M      (= -e1 . ((o - v0) x d))

    so a whole leaf group's tests collapse into ONE (4L, 16) @ (16, 1024)
    matmul per packet visit — the MXU evaluates what the VPU's broadcast
    Möller-Trumbore (_mt_scalar_tri, cpu/src/raytracer.c:35-59 semantics)
    computes with ~50 vector ops per triangle. Row layout per group g
    (block q-major so the matmul output slices into native (8,128) vregs):
    rows [4L*g + L*q + j] for quantity q in (det, t_num, u_num, v_num) of
    triangle j. Degenerate padding slots stay all-zero: det == 0 -> miss.
    """
    c1 = np.cross(e1, v0)
    c2 = np.cross(e2, v0)
    S = v0.shape[0]
    C = np.zeros((4, S, 16), np.float32)
    C[0, :, 0:3] = -n
    C[1, :, 6:9] = n
    C[1, :, 9] = -np.sum(n.astype(np.float64) * v0, axis=1).astype(np.float32)
    C[2, :, 3:6] = e2
    C[2, :, 0:3] = -c2
    C[3, :, 3:6] = -e1
    C[3, :, 0:3] = c1
    C[:, sm < 0] = 0.0
    # (4, G, L, 16) -> (G, 4, L, 16) -> (G*4L, 16); one trailing all-zero
    # NULL group block (matches tri's NULL row: det == 0 -> never hits).
    out = np.zeros(((G + 1) * 4 * L, 16), np.float32)
    out[: G * 4 * L] = np.ascontiguousarray(
        C.reshape(4, G, L, 16).transpose(1, 0, 2, 3)
    ).reshape(G * 4 * L, 16)
    return out


def pack_bvh4(flat: FlatBVH, tri_verts: np.ndarray, bf16: bool = False) -> PackedBVH:
    """Pack a binary FlatBVH as a 4-wide (BVH4) node table.

    Each quad node row holds its four *grandchildren* boxes (binary levels
    collapsed in pairs), so one traversal iteration tests 4 boxes with a
    single shared cross-lane reduction — the reduce-to-scalar latency is the
    inner-visit bottleneck, and 4-wide halves the number of reductions per
    box tested vs the binary kernel (measured 31%/27% faster per pass at
    2-wide already; 4-wide continues the same trade).

      - qbox  (Nq+1, 32) f32: child k's [min.xyz, max.xyz] at lanes
        [6k, 6k+6). Absent children hold NaN boxes: every slab plane
        distance is NaN, all comparisons are false, so the child can never
        be pushed — robust regardless of the hardware's NaN min/max
        propagation because BOTH planes of every axis are NaN. (An
        "inverted box" would NOT work: the ordered slab test turns it into
        an unconstrained always-hit interval.) The extra LAST row is the
        NULL node — all children NaN — which the wide-pop kernels use to
        pad partial pops (visiting it pushes nothing).
      - qmeta (Nq+1, 8) i32: 4 child encodings (enc < 0: leaf group,
        enc >= 0: quad node) then 4 validity flags. The flags are redundant
        with the NaN boxes (kept for the single/dual-pop kernels, which
        predate them and mask by flag).
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
    # +1: trailing NULL node (all-NaN children) for wide-pop pad visits.
    qbox = np.full((Nq + 1, 32), np.nan, np.float32)
    qmeta = np.zeros((Nq + 1, 8), np.int32)
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
        # Compiled-TPU bf16 format: conservative (min|max) pairs in f32
        # lanes (pack_box_bf16_pairs) — consumable by the Mosaic kernels,
        # unlike a raw bf16-dtype table (16-bit dynamic-row-slice limit).
        qbox = pack_box_bf16_pairs(qbox, 4)
    return PackedBVH(
        cbox=qbox, cmeta=qmeta, tri=tri, leaf_size=L, compressed=bf16,
        cmat=binary.cmat,
    )


def pack_bvh8(flat: FlatBVH, tri_verts: np.ndarray, bf16: bool = False) -> PackedBVH:
    """Pack a binary FlatBVH as an 8-wide (BVH8) node table.

    Three binary levels collapse into one node: up to 8 descendants per row,
    one shared cross-lane reduction culls and orders all of them (see
    pack_bvh4 — BVH8 halves traversal iterations again at the cost of a
    larger scalar sorting network per visit).

      - obox  (No+1, 64) f32: child k's [min.xyz, max.xyz] at lanes
        [6k, 6k+6); absent children and the trailing NULL row hold NaN
        boxes (see pack_bvh4).
      - ometa (No+1, 16) i32: 8 child encodings then 8 validity flags.
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
    obox = np.full((No + 1, 64), np.nan, np.float32)
    ometa = np.zeros((No + 1, 16), np.int32)
    for row, i in enumerate(order):
        for k, (kind, j) in enumerate(entries_of[i]):
            obox[row, 6 * k : 6 * k + 3] = nmn[j]
            obox[row, 6 * k + 3 : 6 * k + 6] = nmx[j]
            ometa[row, 8 + k] = 1
            ometa[row, k] = leaf_enc(j) if kind == "leaf" else oid[j]

    if bf16:
        obox = pack_box_bf16_pairs(obox, 8)
    return PackedBVH(
        cbox=obox, cmeta=ometa, tri=tri, leaf_size=L, compressed=bf16,
        cmat=binary.cmat,
    )


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


def pack_box_bf16_pairs(box: np.ndarray, arity: int) -> np.ndarray:
    """bf16-compress wide box rows into f32-viewed (min, max) pairs.

    The compiled-TPU bf16 format (the hbvh_t analog the GPU reference ships,
    gpu/src/gpu.cu:176-185): child k's coordinate c becomes ONE f32 lane at
    [3k + c] whose high 16 bits are the bf16 min (rounded DOWN) and low 16
    bits the bf16 max (rounded UP) — conservative, so culling stays exact,
    unlike the reference's round-to-nearest __float22half2_rn. Keeping the
    row dtype f32 sidesteps Mosaic's 16-bit dynamic-row-slice limit; the
    kernel unpacks with two cheap bitwise ops per row
    (bf16 -> f32 widening is exact: bf16 bits == high half of f32 bits).

    Row width is preserved (lanes beyond 3*arity stay zero) so the packed
    table keeps the same arity signature as its f32 counterpart. VMEM
    footprint note: node rows lane-pad to 128 regardless, so this is a
    compute-format change, not a memory saving — docs/DESIGN.md.
    """
    box = np.ascontiguousarray(box, np.float32)
    n = box.shape[0]
    bits = box.view(np.uint32)
    trunc = bits & np.uint32(0xFFFF0000)
    f = trunc.view(np.float32)
    bump = trunc + np.uint32(0x00010000)
    out = np.zeros_like(box, np.uint32)
    for k in range(arity):
        for c in range(3):
            mn = box[:, 6 * k + c]
            mx = box[:, 6 * k + 3 + c]
            mn_b = np.where(
                f[:, 6 * k + c] > mn, bump[:, 6 * k + c], trunc[:, 6 * k + c]
            )
            mx_b = np.where(
                f[:, 6 * k + 3 + c] < mx,
                bump[:, 6 * k + 3 + c],
                trunc[:, 6 * k + 3 + c],
            )
            assert ((mn_b & np.uint32(0xFFFF)) == 0).all()
            assert ((mx_b & np.uint32(0xFFFF)) == 0).all()
            # Sanity: widened bf16 bounds still enclose the f32 box. NaN
            # children (absent slots / the NULL row) are exempt — canonical
            # f32 NaN truncates to bf16 NaN, preserving never-hits.
            dead = np.isnan(mn) | np.isnan(mx)
            assert (dead | (mn_b.view(np.float32) <= mn)).all()
            assert (dead | (mx_b.view(np.float32) >= mx)).all()
            assert np.isnan(mn_b.view(np.float32)[dead]).all()
            out[:, 3 * k + c] = mn_b | (mx_b >> np.uint32(16))
    return out.view(np.float32)


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


def _slab_masked(lo, hi, oi, inv, t_cut):
    """Per-lane pruned slab entry distance against a scalar AABB: tmin where
    the box can still improve the lane, T_MAX elsewhere. (8, 128) lanes.

    `oi` is the loop-invariant o*inv product hoisted by _load_rays: each
    plane distance becomes a single fused multiply-subtract (scalar box
    coordinate x vector inv, minus oi) instead of the unfusable
    (lo - o) * inv form — the slab test is the dominant vector work of an
    inner visit, so the fusion matters. Dead lanes (o = 1e30, inv clipped
    to +/-1e30) give oi = +/-inf and lo*inv finite, so every distance is
    +/-inf and `ok` stays false — no NaNs (inf - inf never occurs)."""
    tx1 = lo[0] * inv.x - oi.x
    tx2 = hi[0] * inv.x - oi.x
    tmin = jnp.minimum(tx1, tx2)
    tmax = jnp.maximum(tx1, tx2)
    ty1 = lo[1] * inv.y - oi.y
    ty2 = hi[1] * inv.y - oi.y
    tmin = jnp.maximum(tmin, jnp.minimum(ty1, ty2))
    tmax = jnp.minimum(tmax, jnp.maximum(ty1, ty2))
    tz1 = lo[2] * inv.z - oi.z
    tz2 = hi[2] * inv.z - oi.z
    tmin = jnp.maximum(tmin, jnp.minimum(tz1, tz2))
    tmax = jnp.minimum(tmax, jnp.maximum(tz1, tz2))
    ok = (tmax >= tmin) & (tmax > 0.0) & (tmin < t_cut)
    return jnp.where(ok, tmin, T_MAX)


def _slab(lo, hi, oi, inv, t_cut):
    """Packet's pruned minimum entry distance (scalar) to a scalar AABB."""
    return jnp.min(_slab_masked(lo, hi, oi, inv, t_cut))


def _slab_pair(crow, oi, inv, t_cut):
    """Both children's pruned minimum entry distances with ONE cross-lane
    reduction.

    The reduce-to-scalar sits on the scalar unit's critical path (the push
    decision consumes it), so two sequential full reductions per inner visit
    dominate its cost; concatenating the children's masked distances along
    sublanes shares the expensive lane-direction reduction, leaving only two
    tiny sublane reductions.
    """
    vl = _slab_masked(_extract3(crow, 0), _extract3(crow, 3), oi, inv, t_cut)
    vr = _slab_masked(_extract3(crow, 6), _extract3(crow, 9), oi, inv, t_cut)
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
    oi = Vec3(o.x * inv.x, o.y * inv.y, o.z * inv.z)
    return o, d, inv, oi


def _closest_kernel(L: int):
    def kernel(ox, oy, oz, dx, dy, dz, cbox, cmeta, tri, t_out, idx_out, nd_out, stack):
        o, d, inv, oi = _load_rays(ox, oy, oz, dx, dy, dz)

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
                ml, mr = _slab_pair(crow, oi, inv, t)
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
        o, d, inv, oi = _load_rays(ox, oy, oz, dx, dy, dz)
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
                ml, mr = _slab_pair(crow, oi, inv, t_cut)
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


def _load_node_row(qbox, e, compressed: bool):
    """Fetch node e's box row as (min_row, max_row) f32 views.

    compressed (pack_box_bf16_pairs format): ONE f32 row whose lanes hold
    (bf16 min | bf16 max) pairs; unpacked with two bitwise ops — bf16 bits
    are exactly the high half of the widened f32. Uncompressed: min and max
    share the row at different offsets (see _child_extract)."""
    row = qbox[pl.ds(e, 1), :]
    if compressed:
        bits = jax.lax.bitcast_convert_type(row, jnp.uint32)
        mn = jax.lax.bitcast_convert_type(
            bits & jnp.uint32(0xFFFF0000), jnp.float32
        )
        mx = jax.lax.bitcast_convert_type(
            bits << jnp.uint32(16), jnp.float32
        )
        return mn, mx
    row = row.astype(jnp.float32)
    return row, row


def _child_extract(mn_row, mx_row, k: int, compressed: bool):
    if compressed:
        return _extract3(mn_row, 3 * k), _extract3(mx_row, 3 * k)
    return _extract3(mn_row, 6 * k), _extract3(mx_row, 6 * k + 3)


def _slab_multi(mn_row, mx_row, oi, inv, t_cut, n: int, compressed: bool = False):
    """n children's pruned min entry distances with ONE cross-lane reduction."""
    vs = []
    for k in range(n):
        lo, hi = _child_extract(mn_row, mx_row, k, compressed)
        vs.append(_slab_masked(lo, hi, oi, inv, t_cut))
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


def _closest4_kernel(L: int, arity: int = 4, compressed: bool = False):
    def kernel(ox, oy, oz, dx, dy, dz, qbox, qmeta, tri, t_out, idx_out, nd_out, stack):
        o, d, inv, oi = _load_rays(ox, oy, oz, dx, dy, dz)
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
                mn_row, mx_row = _load_node_row(qbox, e, compressed)
                mrow = qmeta[pl.ds(e, 1), :]
                ms = list(
                    _slab_multi(mn_row, mx_row, oi, inv, t, arity, compressed)
                )
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


def _occluded4_kernel(L: int, arity: int = 4, compressed: bool = False):
    def kernel(ox, oy, oz, dx, dy, dz, m2, qbox, qmeta, tri, out, stack):
        o, d, inv, oi = _load_rays(ox, oy, oz, dx, dy, dz)
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
                mn_row, mx_row = _load_node_row(qbox, e, compressed)
                mrow = qmeta[pl.ds(e, 1), :]
                t_cut = jnp.where(blocked > 0, jnp.float32(0.0), t_limit)
                ms = list(
                    _slab_multi(
                        mn_row, mx_row, oi, inv, t_cut, arity, compressed
                    )
                )
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


# ---------------------------------------------------------------------------
# Dual-pop traversal (two-stack schedule)
# ---------------------------------------------------------------------------
#
# The per-visit bottleneck of the single-pop kernels is the reduce-to-scalar
# latency plus loop/cond machinery — vector slab work is cheap next to it
# (docs/DESIGN.md §3). Incoherent bounce packets keep MANY nodes pending on
# the stack, so two pending inner nodes can be visited per loop iteration
# with ONE shared cross-lane reduction over 2*arity children: per-visit
# latency cost is nearly halved exactly where the frame profile says the
# time goes (metrics/profile_frame.json: bounce passes are ~90% of the
# frame). Leaf groups go to a separate stack and are processed first —
# leaves shrink t (closest) or set blocked flags (any-hit), which only
# improves pruning for the inner visits that follow.


# ---------------------------------------------------------------------------
# MXU leaf evaluation
# ---------------------------------------------------------------------------
#
# The VPU scalar-broadcast Möller-Trumbore (_mt_scalar_tri) runs at ~100% of
# the VPU issue rate (~433 ns per 8-triangle leaf visit, measured in
# scripts/microbench_mxu_leaf.py --stage v2) — the formulation's ~50 vector ops per
# triangle ARE the cost. The MXU path instead evaluates the four linear
# MT quantities of all L triangles x 1024 rays as one (4L,16)@(16,1024)
# matmul (see _build_cmat). Two details make it fast AND accurate:
#
#  - LANE GROUPING: R's 1024 lanes are ordered ray-row-major (lane
#    r*128 + c = ray (r, c) of the packet's (8,128) planes), so the matmul
#    output statically slices into native (8,128) vregs per ray row with
#    sublane = triangle; the hit logic runs at full VPU rate and the
#    per-row results reassemble into (8,128) planes with plain concatenates
#    — zero relayouts.
#  - bf16x3: Mosaic's default f32 dot precision is bf16x1 (measured 9e-3
#    rel err, 73/1024 hit flips) and HIGHEST costs 345 ns/leaf (no win), so
#    the operands are pre-split into hi+lo bf16 halves and the three
#    significant cross products taken at native MXU rate:
#        C @ R ~= Ch@Rh + Ch@Rl + Cl@Rh      (residual Cl@Rl ~ 2^-16 rel)
#    Measured 2.2e-5 rel t error, zero hit flips, 227-274 ns per leaf
#    (scripts/microbench_mxu_leaf.py --stage v5) — ~1.6x the VPU leaf.
#  - INTERLEAVED STORAGE: Mosaic pads a (N, 16) bf16 table's minor dim to
#    128 lanes (8x its logical VMEM size — two separate half tables OOM
#    VMEM on car_boxed-class scenes). The halves are therefore interleaved
#    into ONE (4L*G, 32) array, rows [hi(16) | lo(16)], halving the padded
#    footprint at identical speed (247 vs 243 ns/leaf; truly lane-packed
#    transposed layouts force a contract-dim-0 dot that measures 3x slower
#    — scripts/microbench_mxu_leaf.py --stage v6).
#
# C's halves are split+interleaved once at upload (one bf16 array, 8 KB
# VMEM per group); R's halves once per packet. Requires leaf_size == 8
# (sublane = triangle).


def _split_bf16(x):
    """hi+lo bf16 decomposition of an f32 array (x ~= hi + lo exactly to
    ~2^-16 relative)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _rmat_init_const(rsc):
    """One-time constant rows of the R-matrix scratch: row 9 = 1 (the
    C-matrix's v0.n offset column), rows 10-15 = 0 (padding to K=16)."""
    one = jnp.ones((1, SUBLANES * LANES), jnp.float32)
    rsc[9:10, :] = one
    rsc[10:16, :] = jnp.zeros((6, SUBLANES * LANES), jnp.float32)


def _rmat_load(rsc, o: Vec3, d: Vec3):
    """Build R = [d, o x d, o, 1, 0..] in the (16, 1024) VMEM scratch and
    return its bf16 hi/lo halves.

    The (8,128) ray planes regroup to ray-row-major 1024-lane rows (lane
    r*128 + c = ray (r, c)) via 72 static (1,128) stores — Mosaic cannot
    lane-concatenate sublane-offset slices as values, but static strided
    stores are cheap and amortize over every leaf visit that follows.
    Call _rmat_init_const once beforehand (constant rows persist)."""
    mx = o.y * d.z - o.z * d.y
    my = o.z * d.x - o.x * d.z
    mz = o.x * d.y - o.y * d.x
    feats = (d.x, d.y, d.z, mx, my, mz, o.x, o.y, o.z)
    for p, f in enumerate(feats):
        for r in range(SUBLANES):
            rsc[p : p + 1, r * LANES : (r + 1) * LANES] = f[r : r + 1, :]
    return _split_bf16(rsc[:, :])


def _mxu_rows(outm, L: int = 8):
    """Per ray row r: (t-candidates, det) as (L,128) vregs, sublane = tri."""
    for r in range(SUBLANES):
        blk = outm[:, r * LANES : (r + 1) * LANES]
        det = blk[0:L, :]
        invdet = 1.0 / det
        tj = blk[L : 2 * L, :] * invdet
        u = blk[2 * L : 3 * L, :] * invdet
        v = blk[3 * L : 4 * L, :] * invdet
        hit = (
            (jnp.abs(det) >= EPSILON)
            & (tj > EPSILON)
            & (u >= 0.0)
            & (v >= 0.0)
            & ((u + v) <= 1.0)
        )
        yield jnp.where(hit, tj, T_MAX), det


def _mxu_winners(outm, L):
    """Per-group winner planes from a (4L, 1024) quantity block.

    Returns (tnew, jnew, ndnew) as (8, 128) planes. Within the leaf the
    smallest triangle index wins ties, matching the VPU sequential loop."""
    jio = jax.lax.broadcasted_iota(jnp.int32, (L, LANES), 0)
    trows, jrows, ndrows = [], [], []
    for tcand, det in _mxu_rows(outm, L):
        rmin = jnp.min(tcand, axis=0, keepdims=True)           # (1,128)
        jc = jnp.where(tcand <= rmin, jio, L)
        jmin = jnp.min(jc, axis=0, keepdims=True)
        ndc = jnp.where(jc <= jmin, (det < 0.0).astype(jnp.int32), 0)
        ndrows.append(jnp.max(ndc, axis=0, keepdims=True))
        trows.append(rmin)
        jrows.append(jmin)
    return (
        jnp.concatenate(trows, axis=0),                        # (8,128)
        jnp.concatenate(jrows, axis=0),
        jnp.concatenate(ndrows, axis=0),
    )


def _mxu_merge_winner(g, tnew, jnew, ndnew, t, idx, nd, L):
    """Strictly-closer merge of one group's winners into the running hit."""
    better = tnew < t
    t = jnp.where(better, tnew, t)
    idx = jnp.where(better, g * L + jnew, idx)
    nd = jnp.where(better, ndnew, nd)
    return t, idx, nd, better


def _mxu_attr_select(tri_row, arow, better, jnew, av, L):
    """Attribute-tracking selects driven by the MXU leaf's winner index."""
    for j in range(L):
        mj = better & (jnew == j)
        scal = (
            *_extract3(tri_row, TRI_STRIDE * j + 9),   # unnormalized n
            *_extract3(arow, ATTR_STRIDE * j),         # kd
            *_extract3(arow, ATTR_STRIDE * j + 3),     # ks
            *_extract3(arow, ATTR_STRIDE * j + 6),     # kr
        )
        av = tuple(jnp.where(mj, s, a) for s, a in zip(scal, av))
    return av


def _mxu_occl_merge(outm, blocked, max_dist2, L: int = 8):
    """Any-hit merge on the raw MT numerators — no division.

    The closest path must divide (winner t values are compared across
    triangles), but any-hit only needs booleans, and with D2 = det^2 > 0
    every test becomes a polynomial comparison (multiplying an inequality
    by det flips it exactly when det < 0, which det-scaling both sides
    absorbs):
        |det| >= EPS   <=>  D2 >= EPS^2
        t > EPS        <=>  tnum*det >  EPS * D2
        u >= 0         <=>  unum*det >= 0
        v >= 0         <=>  vnum*det >= 0
        u + v <= 1     <=>  unum*det + vnum*det <= D2
        t^2 < m2       <=>  tnum^2 < m2 * D2
    Dead lanes (o ~ 1e30) overflow tnum^2 to +inf, which fails the last
    test, so they can never block. Saves the reciprocal + three
    normalizing multiplies per 8-triangle row block (~25% of the
    occluded leaf's VPU post-processing)."""
    eps = jnp.float32(EPSILON)
    rows = []
    for r in range(SUBLANES):
        blk = outm[:, r * LANES : (r + 1) * LANES]
        det = blk[0:L, :]
        tnum = blk[L : 2 * L, :]
        unum = blk[2 * L : 3 * L, :]
        vnum = blk[3 * L : 4 * L, :]
        d2 = det * det
        pu = unum * det
        pv = vnum * det
        m2r = max_dist2[r : r + 1, :]                          # (1,128)
        hitrow = (
            (d2 >= eps * eps)
            & (tnum * det > eps * d2)
            & (pu >= 0.0)
            & (pv >= 0.0)
            & (pu + pv <= d2)
            & (tnum * tnum < m2r * d2)
        )
        rows.append(jnp.max(hitrow.astype(jnp.int32), axis=0, keepdims=True))
    return jnp.maximum(blocked, jnp.concatenate(rows, axis=0))


def _dual_inner_visit(qbox, qmeta, oi, inv, t_cut, istack, lstack, isp, lsp,
                      arity: int, compressed: bool = False, meta_s=None):
    """Visit the top one-or-two inner nodes; push their children.

    Returns updated (isp, lsp). When only one inner is pending, the second
    node's lanes are computed but masked invalid (the duplicate slab work
    is cheaper than a scalar branch on the hot path).

    meta_s, when given, is the SMEM mirror of qmeta (row-major flat i32);
    the child entries and validity flags are then SCALAR loads instead of
    VMEM lane extracts — each lane extract is a vector->scalar crossing
    (~16 ns serialized; 8 SMEM loads measured 12 ns total vs 142 ns for
    the same row via lane extracts, metrics/microbench_glue_probes.json /
    scripts/microbench_inner.py), and this visit makes 2*2*arity of them.
    """
    e1 = istack[isp - 1]
    two = isp >= 2
    e2 = istack[jnp.maximum(isp - 2, 0)]
    isp = isp - 1 - two.astype(jnp.int32)
    mn1, mx1 = _load_node_row(qbox, e1, compressed)
    mn2, mx2 = _load_node_row(qbox, e2, compressed)
    if meta_s is None:
        m1 = qmeta[pl.ds(e1, 1), :]
        m2 = qmeta[pl.ds(e2, 1), :]
        es1 = [m1[0, k] for k in range(arity)]
        es2 = [m2[0, k] for k in range(arity)]
        v1 = [m1[0, arity + k] for k in range(arity)]
        v2 = [m2[0, arity + k] for k in range(arity)]
    else:
        stride = qmeta.shape[1]
        b1, b2 = e1 * stride, e2 * stride
        es1 = [meta_s[b1 + k] for k in range(arity)]
        es2 = [meta_s[b2 + k] for k in range(arity)]
        v1 = [meta_s[b1 + arity + k] for k in range(arity)]
        v2 = [meta_s[b2 + arity + k] for k in range(arity)]
    vs = []
    for mn, mx in ((mn1, mx1), (mn2, mx2)):
        for k in range(arity):
            lo, hi = _child_extract(mn, mx, k, compressed)
            vs.append(_slab_masked(lo, hi, oi, inv, t_cut))
    both = jnp.concatenate(vs, axis=0)          # (2*arity*8, 128)
    red = jnp.min(both, axis=1)                 # ONE shared lane reduction
    ms = [
        jnp.min(red[SUBLANES * k : SUBLANES * (k + 1)])
        for k in range(2 * arity)
    ]
    ms1 = [
        jnp.where(v1[k] > 0, ms[k], jnp.float32(T_MAX))
        for k in range(arity)
    ]
    ms2 = [
        jnp.where(two & (v2[k] > 0), ms[arity + k], jnp.float32(T_MAX))
        for k in range(arity)
    ]
    ms1, es1 = _sortn(ms1, es1)
    ms2, es2 = _sortn(ms2, es2)
    # Node 1 was nearer (top of stack): push node 2's children first so
    # node 1's nearest child pops first. Within a node, far-to-near.
    for msx, esx in ((ms2, es2), (ms1, es1)):
        for k in reversed(range(arity)):
            ok = msx[k] < T_MAX
            leafc = esx[k] < 0
            istack[isp] = esx[k]
            isp = isp + (ok & jnp.logical_not(leafc)).astype(jnp.int32)
            lstack[lsp] = esx[k]
            lsp = lsp + (ok & leafc).astype(jnp.int32)
    return isp, lsp


def _wide_inner_visit(qbox, qmeta, oi, inv, t_cut, istack, lstack, isp, lsp,
                      npop: int, arity: int, compressed: bool = False,
                      count_dead: bool = False, sort: bool = True,
                      meta_s=None):
    """Visit the top `npop` pending inner nodes in one iteration.

    The wide-pop schedule: npop independent node visits share one
    (npop*arity*8, 128) slab evaluation and ONE lane-direction reduction,
    and their loads/extracts pipeline against each other's vector work —
    measured 147 ns/node at npop=4 and 107 ns/node at npop=8 versus
    225 ns/node for the dual-pop visit (scripts/microbench_inner.py).
    Partial pops are padded with the NULL node (last row, all-NaN boxes:
    every slab comparison is false, nothing is pushed), so there is no
    validity masking and no scalar branching on the pending count.

    count_dead=True (instrumentation only) additionally returns the number
    of REAL popped slots whose visit pushed nothing — the stale/fruitless
    visits a pop-time cull could at best skip (scripts/profile_visits.py).

    meta_s: optional SMEM mirror of qmeta (see _dual_inner_visit) — child
    entries become scalar loads instead of npop*arity vector->scalar lane
    extracts.
    """
    null_node = jnp.int32(qbox.shape[0] - 1)
    isp0 = isp
    loaded = []
    for i in range(npop):
        slot = jnp.maximum(isp0 - 1 - i, 0)
        e = jnp.where(i < isp0, istack[slot], null_node)
        mn, mx = _load_node_row(qbox, e, compressed)
        if meta_s is None:
            es_n = None
            m = qmeta[pl.ds(e, 1), :]
        else:
            stride = qmeta.shape[1]
            es_n = [meta_s[e * stride + k] for k in range(arity)]
            m = None
        loaded.append((mn, mx, m, es_n))
    isp = jnp.maximum(isp0 - npop, 0)
    vs = []
    for mn, mx, _m, _e in loaded:
        for k in range(arity):
            lo, hi = _child_extract(mn, mx, k, compressed)
            vs.append(_slab_masked(lo, hi, oi, inv, t_cut))
    both = jnp.concatenate(vs, axis=0)          # (npop*arity*8, 128)
    red = jnp.min(both, axis=1)                 # ONE shared lane reduction
    dead = jnp.int32(0)
    # Push far-to-near overall: the deepest-padded pop (furthest pending)
    # first, each node's children far-to-near, so pop i=0's nearest child
    # ends on top of the stack.
    for n in reversed(range(npop)):
        _mn, _mx, m, es_n = loaded[n]
        base = arity * n
        ms = [
            jnp.min(red[SUBLANES * (base + k) : SUBLANES * (base + k + 1)])
            for k in range(arity)
        ]
        es = es_n if es_n is not None else [m[0, k] for k in range(arity)]
        if sort:
            # Near-first pop order (children pushed far-to-near) prunes
            # later visits via t_cut. Any-hit callers may skip it: the
            # blocked result is order-independent, and the 5-comparator
            # scalar network is pure per-iteration glue there.
            ms, es = _sortn(ms, es)
        pushed = jnp.int32(0)
        for k in reversed(range(arity)):
            ok = ms[k] < T_MAX
            leafc = es[k] < 0
            istack[isp] = es[k]
            isp = isp + (ok & jnp.logical_not(leafc)).astype(jnp.int32)
            lstack[lsp] = es[k]
            lsp = lsp + (ok & leafc).astype(jnp.int32)
            if count_dead:
                pushed = pushed + ok.astype(jnp.int32)
        if count_dead:
            dead = dead + ((n < isp0) & (pushed == 0)).astype(jnp.int32)
    if count_dead:
        return isp, lsp, dead
    return isp, lsp


def _adaptive_inner_visit(qbox, qmeta, oi, inv, t_cut, istack, lstack,
                          isp, lsp, npop: int, arity: int,
                          compressed: bool = False, sort: bool = True,
                          meta_s=None):
    """Width-switched wide pop: visit the pending inner nodes at the
    narrowest power-of-two width {2, 4, .., npop} that covers them.

    The fixed-width schedule pads every iteration to npop NULL-node
    slots; the visit profile (metrics/profile_visits_pop8.json) shows the
    pending stack is usually far shallower than 8 (mean real pops ~2.5 on
    the coherent pass), so most of the pop8 slab work was padding. A
    scalar branch on the pending count costs two compares + a jump and
    replaces that padding with the matching narrower visit body. Every
    width is image-identical (same pushes, same order), so this is a pure
    schedule change."""
    def mk(n):
        def f(args):
            return _wide_inner_visit(
                qbox, qmeta, oi, inv, t_cut, istack, lstack,
                args[0], args[1], n, arity, compressed, sort=sort,
                meta_s=meta_s,
            )
        return f

    f24 = mk(2) if npop < 4 else (
        lambda args: jax.lax.cond(args[0] > 2, mk(4), mk(2), args)
    )
    if npop < 8:
        return f24((isp, lsp))
    if npop < 16:
        return jax.lax.cond(isp > 4, mk(8), f24, (isp, lsp))
    # npop=16 tier (round 5): built because the divergent bounces run
    # deep pending stacks (b3 pad fraction 4-6% at width 8,
    # profile_frame_fused.json) and a pinned-schedule probe retired
    # ~100 ns/node at W16 vs ~120 at W8 — but the END-TO-END A/B
    # REJECTED it (frame 225.1 vs 209.6 ms, dragon 154.1 vs 172.3M
    # rays/s: real pops pad too many of 16 slots; DESIGN 9e). The tier
    # stays available as a knob; the production default remains 8.
    f8 = lambda args: jax.lax.cond(args[0] > 4, mk(8), f24, args)
    return jax.lax.cond(isp > 8, mk(16), f8, (isp, lsp))


def _leaf_pops(lstack, lsp, nleaf: int):
    """Pop up to `nleaf` pending leaf groups; short pops repeat the last
    group (idempotent under the strict-< closest merge and the max-combine
    occluded merge)."""
    gs = []
    for i in range(nleaf):
        slot = jnp.maximum(lsp - 1 - i, 0)
        gs.append(-lstack[slot] - 1)
    return gs, jnp.maximum(lsp - nleaf, 0)


def default_nleaf(npop: int, L: int) -> int:
    """MXU leaf pop width: half an MXU pass (M = 4L * nleaf = 64 rows) at
    every pop width. For L=8 that is nleaf=2 — measured best at wide pop
    on the production frame (253.7 ms vs 264.5 at nleaf=4 and 306.6 at
    nleaf=8, metrics/bench_frame_b4_tsah_mxu_pop8_p02_{nl2,nl8}.json +
    r3 recheck): popping fewer leaf groups per visit wastes fewer padded
    NULL-group MXU rows than a full 128-row pass saves in issue count."""
    return max(2, 64 // (4 * L))


def pack_cmi4(cmat: np.ndarray, L: int = 8):
    """Lane-pack an interleaved leaf C-matrix table FOUR groups per
    128-lane row: group 4b+j's [hi(16) | lo(16)] occupies lanes
    [32j, 32j+32) of block b's 4L rows. Cuts the table's VMEM cost 4x
    (2 KB/group instead of 8 KB — rows always lane-pad to the 128
    tile), which is what admits dragon-class scenes (~30k groups) to
    the MXU leaf path at all. Consumed by _mxu_leaf_quants_n, which
    detects the layout by the static lane width. Input: the host
    (rows, 16) f32 C-matrix table (PackedBVH.cmat); output: a
    (ceil(groups/4)*4L, 128) bf16 array ready for upload."""
    import ml_dtypes

    GR = 4 * L
    cmat = np.ascontiguousarray(cmat, np.float32)
    rows = cmat.shape[0]
    assert rows % GR == 0, (rows, GR)
    G = rows // GR
    Gp = -(-G // 4) * 4
    hi = cmat.astype(ml_dtypes.bfloat16)
    lo = (cmat - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)

    def blocks(a):
        # (G, GR, 16) -> pad groups -> (Gp/4, GR, 4, 16)
        a = a.reshape(G, GR, 16)
        if Gp != G:
            a = np.concatenate(
                [a, np.zeros((Gp - G, GR, 16), a.dtype)], axis=0
            )
        return a.reshape(Gp // 4, 4, GR, 16).transpose(0, 2, 1, 3)

    bh, bl = blocks(hi), blocks(lo)
    out = np.zeros((Gp // 4, GR, 4, 32), hi.dtype)
    out[:, :, :, 0:16] = bh
    out[:, :, :, 16:32] = bl
    return out.reshape(Gp // 4 * GR, 128)


def _mxu_leaf_quants_n(cmi, Rh, Rl, gs, L: int = 8):
    """(4L*len(gs), 1024) MT quantities of several leaf groups via ONE
    triple-dot (M = 4L*n <= 128 rides a single MXU pass).

    Two cmi layouts, selected by the STATIC lane width:
      - (rows, 32): one group per 4L-row block, [hi(16) | lo(16)] lanes
        (the original interleave — 96 of 128 padded lanes wasted, 8 KB
        of VMEM per group).
      - (rows, 128): FOUR groups per 4L-row block, group j at lanes
        [32j, 32j+32) (pack_cmi4) — 2 KB of VMEM per group, which is
        what lets dragon-class scenes (~30k groups) keep MXU leaves
        resident at all. The per-group lane offset depends on g % 4, a
        traced value, so each group's [hi|lo] columns are picked by a
        4-way lax.switch over STATIC lane slices (~10-20 ns per the
        branch microbench) before the shared triple-dot."""
    GR = 4 * L

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if cmi.shape[1] == 32:
        crow = jnp.concatenate(
            [cmi[pl.ds(g * GR, GR), :] for g in gs], axis=0
        )
        Ch = crow[:, 0:16]
        Cl = crow[:, 16:32]
        return dot(Ch, Rh) + dot(Ch, Rl) + dot(Cl, Rh)

    chs, cls = [], []
    for g in gs:
        crow = cmi[pl.ds((g // 4) * GR, GR), :]
        j = g % 4
        ch = jax.lax.switch(
            j, [lambda c=crow, J=J: c[:, 32 * J : 32 * J + 16]
                for J in range(4)]
        )
        cl = jax.lax.switch(
            j, [lambda c=crow, J=J: c[:, 32 * J + 16 : 32 * J + 32]
                for J in range(4)]
        )
        chs.append(ch)
        cls.append(cl)
    Ch = jnp.concatenate(chs, axis=0)
    Cl = jnp.concatenate(cls, axis=0)
    return dot(Ch, Rh) + dot(Ch, Rl) + dot(Cl, Rh)


def _mxu_leaf_closest_n(cmi, Rh, Rl, gs, t, idx, nd, L):
    """n-group MXU closest-hit update; sequential strict-< merges keep
    duplicate (padded) pops idempotent. Returns (t, idx, nd, selects)
    with selects = [(g, better, jnew)] for the attribute pass."""
    GR = 4 * L
    outm = _mxu_leaf_quants_n(cmi, Rh, Rl, gs, L)
    selects = []
    for n, g in enumerate(gs):
        tn, jn, ndn = _mxu_winners(outm[GR * n : GR * (n + 1), :], L)
        t, idx, nd, better = _mxu_merge_winner(g, tn, jn, ndn, t, idx, nd, L)
        selects.append((g, better, jn))
    return t, idx, nd, selects


def _mxu_leaf_occluded_n(cmi, Rh, Rl, gs, blocked, max_dist2, L: int = 8):
    """n-group MXU any-hit update (duplicate pops are idempotent)."""
    GR = 4 * L
    outm = _mxu_leaf_quants_n(cmi, Rh, Rl, gs, L)
    for n in range(len(gs)):
        blocked = _mxu_occl_merge(outm[GR * n : GR * (n + 1), :],
                                  blocked, max_dist2, L)
    return blocked


def _visit_width(isp, npop: int, adaptive: bool):
    """Inner-visit slot width actually executed this iteration (counters
    instrumentation; mirrors _adaptive_inner_visit's switch)."""
    if not adaptive or npop <= 2:
        return jnp.int32(max(npop, 2))
    if npop >= 16:
        return jnp.where(
            isp > 8, jnp.int32(16),
            jnp.where(isp > 4, jnp.int32(8),
                      jnp.where(isp > 2, jnp.int32(4), jnp.int32(2))))
    if npop >= 8:
        return jnp.where(isp > 4, jnp.int32(8),
                         jnp.where(isp > 2, jnp.int32(4), jnp.int32(2)))
    return jnp.where(isp > 2, jnp.int32(4), jnp.int32(2))


def _run_closest_dual(qbox, qmeta, tri, attr, o, d, inv, oi, istack, lstack,
                      L: int, arity: int, n_attr: int, compressed: bool,
                      counters: bool = False, mxu=None, npop: int = 2,
                      nleaf: int = 2, adaptive: bool = False, meta_s=None):
    """Full multi-pop closest-hit traversal; returns (t, idx, nd, av).

    Shared between the standalone closest kernels and the fused frame
    kernel (which runs it once per bounce, reusing the same stacks).
    counters=True appends (inner_iters, leaf_iters, pad_slots, dead_pops,
    leaf_group_pops, inner_slots, leaf_slots) scalars to
    the return tuple (see _run_occluded_dual). mxu, when given, is
    (Rh, Rl, cmi) and switches leaf evaluation to the MXU path. npop > 2
    selects the wide-pop inner visit (NULL-padded); nleaf > 2 pops that
    many leaf groups per MXU leaf visit (duplicate-padded).

    (The measured-and-rejected combined and paired schedules were
    retired in round 4; DESIGN 9b keeps their findings and
    scripts/microbench_overlap.py the overlap measurement.)"""
    istack[0] = jnp.int32(0)

    def leafn(gs, t, idx, nd, av):
        """nleaf groups per visit on the MXU (one triple-dot for all)."""
        Rh, Rl, cmi = mxu
        t, idx, nd, selects = _mxu_leaf_closest_n(
            cmi, Rh, Rl, gs, t, idx, nd, L
        )
        if n_attr:
            for g, better, jnew in selects:
                tri_row = tri[pl.ds(g, 1), :].astype(jnp.float32)
                arow = attr[pl.ds(g, 1), :].astype(jnp.float32)
                av = _mxu_attr_select(tri_row, arow, better, jnew, av, L)
        return t, idx, nd, av

    def leaf(g, t, idx, nd, av):
        tri_row = tri[pl.ds(g, 1), :].astype(jnp.float32)
        if n_attr:
            arow = attr[pl.ds(g, 1), :].astype(jnp.float32)
            for j in range(L):
                t, idx, nd, av = _attr_leaf_update(
                    o, d, tri_row, arow, g, j, L, t, idx, nd, av
                )
        else:
            for j in range(L):
                tj, ndj = _mt_scalar_tri(o, d, tri_row, j)
                better = tj < t
                t = jnp.where(better, tj, t)
                idx = jnp.where(better, g * L + j, idx)
                nd = jnp.where(better, ndj.astype(jnp.int32), nd)
        return t, idx, nd, av

    def body(state):
        isp, lsp, t, idx, nd, av = state[:6]
        cnt = state[6:]

        def do_leaf(args):
            isp, lsp, t, idx, nd, av = args[:6]
            cnt = args[6:]
            lsp0 = lsp
            if mxu is not None and adaptive:
                # Width-switched leaf pops, same idea as the adaptive
                # inner visit: pop the narrowest width {b, 2b, 4b}
                # (b = the 64-row half-pass budget, nleaf=2 at L=8)
                # covering the pending count. Sequential strict-<
                # merges keep any width bit-identical to repeated
                # narrow pops.
                b = default_nleaf(npop, L)

                def lw(n):
                    def f(a):
                        lsp, t, idx, nd, av = a
                        gs, lsp = _leaf_pops(lstack, lsp, n)
                        t, idx, nd, av = leafn(gs, t, idx, nd, av)
                        return (lsp, t, idx, nd, av)
                    return f

                a0 = (lsp, t, idx, nd, av)
                f2 = lambda a: jax.lax.cond(
                    a[0] > b, lw(2 * b), lw(b), a
                )
                lsp, t, idx, nd, av = jax.lax.cond(
                    a0[0] > 2 * b, lw(4 * b), f2, a0
                )
            elif mxu is not None:
                # Pop nleaf groups per visit (duplicate pops when fewer
                # are pending — idempotent under the strict-< merge).
                gs, lsp = _leaf_pops(lstack, lsp, nleaf)
                t, idx, nd, av = leafn(gs, t, idx, nd, av)
            else:
                lsp = lsp - 1
                g = -lstack[lsp] - 1
                t, idx, nd, av = leaf(g, t, idx, nd, av)
            if counters:
                # NOTE: named leaf_w, not lw — `lw` is the adaptive
                # width-visit factory above in this same scope.
                if mxu is None:
                    pops = jnp.int32(1)
                    leaf_w = jnp.int32(1)
                elif adaptive:
                    b = default_nleaf(npop, L)
                    pops = jnp.minimum(lsp0, 4 * b)
                    leaf_w = jnp.where(
                        lsp0 > 2 * b, jnp.int32(4 * b),
                        jnp.where(lsp0 > b, jnp.int32(2 * b),
                                  jnp.int32(b)),
                    )
                else:
                    pops = jnp.minimum(lsp0, nleaf)
                    leaf_w = jnp.int32(nleaf)
                cnt = (cnt[0], cnt[1] + 1, cnt[2], cnt[3],
                       cnt[4] + pops, cnt[5], cnt[6] + leaf_w)
            return (isp, lsp, t, idx, nd, av) + cnt

        def do_inner(args):
            isp, lsp, t, idx, nd, av = args[:6]
            cnt = args[6:]
            if counters:
                w = _visit_width(isp, npop, adaptive)
                pad = w - jnp.minimum(isp, w)
                cnt = (cnt[0] + 1, cnt[1], cnt[2] + pad, cnt[3],
                       cnt[4], cnt[5] + w, cnt[6])
            if adaptive and npop > 2:
                isp, lsp = _adaptive_inner_visit(
                    qbox, qmeta, oi, inv, t, istack, lstack, isp, lsp,
                    npop, arity, compressed, meta_s=meta_s,
                )
            elif npop > 2:
                res_v = _wide_inner_visit(
                    qbox, qmeta, oi, inv, t, istack, lstack, isp, lsp,
                    npop, arity, compressed, count_dead=counters,
                    meta_s=meta_s,
                )
                if counters:
                    isp, lsp, dead_v = res_v
                    cnt = cnt[:3] + (cnt[3] + dead_v,) + cnt[4:]
                else:
                    isp, lsp = res_v
            else:
                isp, lsp = _dual_inner_visit(
                    qbox, qmeta, oi, inv, t, istack, lstack, isp, lsp,
                    arity, compressed, meta_s=meta_s,
                )
            return (isp, lsp, t, idx, nd, av) + cnt

        return jax.lax.cond(lsp > 0, do_leaf, do_inner, state)

    zero = jnp.zeros((SUBLANES, LANES), jnp.float32)
    init = (
        jnp.int32(1),
        jnp.int32(0),
        jnp.full((SUBLANES, LANES), T_MAX, jnp.float32),
        jnp.full((SUBLANES, LANES), -1, jnp.int32),
        jnp.zeros((SUBLANES, LANES), jnp.int32),
        tuple(zero for _ in range(n_attr)),
    ) + ((jnp.int32(0),) * 7 if counters else ())
    out = jax.lax.while_loop(
        lambda s: (s[0] > 0) | (s[1] > 0), body, init
    )
    t, idx, nd, av = out[2:6]
    if counters:
        return t, idx, nd, av, out[6:]
    return t, idx, nd, av


def _run_occluded_dual(qbox, qmeta, tri, o, d, inv, oi, max_dist2,
                       istack, lstack, L: int, arity: int, compressed: bool,
                       counters: bool = False, mxu=None, npop: int = 2,
                       nleaf: int = 2, adaptive: bool = False,
                       sort: bool = True, meta_s=None):
    """Full multi-pop any-hit traversal; returns blocked (i32 lanes).

    counters=True additionally returns (inner_iters, leaf_iters,
    pad_slots, dead_pops, leaf_group_pops, inner_slots, leaf_slots) scalars — debug instrumentation for visit accounting
    (scripts/profile_visits.py); keeps the production path free of the
    extra scalar adds. mxu, when given, is (Rh, Rl, cmi) and switches
    leaf evaluation to the MXU path. npop/nleaf as in
    _run_closest_dual.
    """
    t_limit = jnp.sqrt(max_dist2)
    istack[0] = jnp.int32(0)

    def body(state):
        isp, lsp, blocked, all_blocked = state[:4]
        cnt = state[4:]

        def do_leaf(args):
            isp, lsp, blocked, all_blocked = args[:4]
            cnt = args[4:]
            lsp0 = lsp
            if mxu is not None and adaptive:
                Rh, Rl, cmi = mxu
                b = default_nleaf(npop, L)

                def lw(n):
                    def f(a):
                        lsp, blocked = a
                        gs, lsp = _leaf_pops(lstack, lsp, n)
                        blocked = _mxu_leaf_occluded_n(
                            cmi, Rh, Rl, gs, blocked, max_dist2, L
                        )
                        return (lsp, blocked)
                    return f

                a0 = (lsp, blocked)
                f2 = lambda a: jax.lax.cond(
                    a[0] > b, lw(2 * b), lw(b), a
                )
                lsp, blocked = jax.lax.cond(a0[0] > 2 * b, lw(4 * b), f2, a0)
            elif mxu is not None:
                Rh, Rl, cmi = mxu
                gs, lsp = _leaf_pops(lstack, lsp, nleaf)
                blocked = _mxu_leaf_occluded_n(
                    cmi, Rh, Rl, gs, blocked, max_dist2, L
                )
            else:
                lsp = lsp - 1
                g = -lstack[lsp] - 1
                row = tri[pl.ds(g, 1), :].astype(jnp.float32)
                for j in range(L):
                    tj, _ = _mt_scalar_tri(o, d, row, j)
                    hit = (tj < T_MAX) & (tj * tj < max_dist2)
                    blocked = jnp.maximum(blocked, hit.astype(jnp.int32))
            all_blocked = jnp.min(blocked)
            if counters:
                # NOTE: named leaf_w, not lw — `lw` is the adaptive
                # width-visit factory above in this same scope.
                if mxu is None:
                    pops = jnp.int32(1)
                    leaf_w = jnp.int32(1)
                elif adaptive:
                    b = default_nleaf(npop, L)
                    pops = jnp.minimum(lsp0, 4 * b)
                    leaf_w = jnp.where(
                        lsp0 > 2 * b, jnp.int32(4 * b),
                        jnp.where(lsp0 > b, jnp.int32(2 * b),
                                  jnp.int32(b)),
                    )
                else:
                    pops = jnp.minimum(lsp0, nleaf)
                    leaf_w = jnp.int32(nleaf)
                cnt = (cnt[0], cnt[1] + 1, cnt[2], cnt[3],
                       cnt[4] + pops, cnt[5], cnt[6] + leaf_w)
            return (isp, lsp, blocked, all_blocked) + cnt

        def do_inner(args):
            isp, lsp, blocked, all_blocked = args[:4]
            cnt = args[4:]
            if counters:
                w = _visit_width(isp, npop, adaptive)
                pad = w - jnp.minimum(isp, w)
                cnt = (cnt[0] + 1, cnt[1], cnt[2] + pad, cnt[3],
                       cnt[4], cnt[5] + w, cnt[6])
            t_cut = jnp.where(blocked > 0, jnp.float32(0.0), t_limit)
            if adaptive and npop > 2:
                isp, lsp = _adaptive_inner_visit(
                    qbox, qmeta, oi, inv, t_cut, istack, lstack, isp, lsp,
                    npop, arity, compressed, sort=sort, meta_s=meta_s,
                )
            elif npop > 2:
                res_v = _wide_inner_visit(
                    qbox, qmeta, oi, inv, t_cut, istack, lstack, isp, lsp,
                    npop, arity, compressed, count_dead=counters, sort=sort,
                    meta_s=meta_s,
                )
                if counters:
                    isp, lsp, dead_v = res_v
                    cnt = cnt[:3] + (cnt[3] + dead_v,) + cnt[4:]
                else:
                    isp, lsp = res_v
            else:
                isp, lsp = _dual_inner_visit(
                    qbox, qmeta, oi, inv, t_cut, istack, lstack, isp, lsp,
                    arity, compressed, meta_s=meta_s,
                )
            return (isp, lsp, blocked, all_blocked) + cnt

        return jax.lax.cond(lsp > 0, do_leaf, do_inner, state)

    init = (
        jnp.int32(1),
        jnp.int32(0),
        jnp.zeros((SUBLANES, LANES), jnp.int32),
        jnp.int32(0),
    ) + ((jnp.int32(0),) * 7 if counters else ())
    out = jax.lax.while_loop(
        lambda s: ((s[0] > 0) | (s[1] > 0)) & (s[3] == 0), body, init
    )
    if counters:
        return out[2], out[4:]
    return out[2]


def _closest_dual_kernel(L: int, arity: int, n_attr: int = 0,
                         compressed: bool = False, counters: bool = False,
                         mxu: bool = False, npop: int = 2, nleaf: int = 2,
                         adaptive: bool = False, smem_meta: bool = False):
    """Multi-pop closest hit; with n_attr=12 also tracks surface attributes.

    mxu=True appends a cmi input after the scene arrays plus a (16, 1024)
    VMEM scratch and evaluates leaves on the MXU (see _mxu_leaf_closest_n).
    npop/nleaf select the wide-pop schedule (_wide_inner_visit).
    smem_meta=True appends a flat i32 SMEM mirror of qmeta as the last
    input; child-entry reads become scalar loads (see _dual_inner_visit)."""

    def kernel(*refs):
        nc = 1 if counters else 0
        nm = 1 if mxu else 0
        ns = 1 if smem_meta else 0
        if n_attr:
            (ox, oy, oz, dx, dy, dz, qbox, qmeta, tri, attr) = refs[:10]
            mxu_refs = refs[10:10 + nm]
            meta_s = refs[10 + nm] if smem_meta else None
            outs = refs[10 + nm + ns:13 + nm + ns + n_attr + nc]
            scratch = refs[13 + nm + ns + n_attr + nc:]
        else:
            (ox, oy, oz, dx, dy, dz, qbox, qmeta, tri) = refs[:9]
            attr = None
            mxu_refs = refs[9:9 + nm]
            meta_s = refs[9 + nm] if smem_meta else None
            outs = refs[9 + nm + ns:12 + nm + ns + nc]
            scratch = refs[12 + nm + ns + nc:]
        istack, lstack = scratch[:2]
        t_out, idx_out, nd_out = outs[:3]
        o, d, inv, oi = _load_rays(ox, oy, oz, dx, dy, dz)
        mxu_args = None
        if mxu:
            (cmi,) = mxu_refs
            rsc = scratch[2]
            _rmat_init_const(rsc)
            Rh, Rl = _rmat_load(rsc, o, d)
            mxu_args = (Rh, Rl, cmi)
        res = _run_closest_dual(
            qbox, qmeta, tri, attr, o, d, inv, oi, istack, lstack,
            L, arity, n_attr, compressed, counters=counters, mxu=mxu_args,
            npop=npop, nleaf=nleaf, adaptive=adaptive, meta_s=meta_s,
        )
        t, idx, nd, av = res[:4]
        t_out[:, :] = t
        idx_out[:, :] = idx
        nd_out[:, :] = nd
        for ref, val in zip(outs[3:3 + n_attr], av):
            ref[:, :] = val
        if counters:
            cnt = res[4]
            r = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)
            out_c = jnp.int32(0)
            for k in reversed(range(7)):
                out_c = jnp.where(r == k, cnt[k], out_c)
            outs[-1][:, :] = out_c

    return kernel


def _occluded_dual_kernel(L: int, arity: int, compressed: bool = False,
                          counters: bool = False, mxu: bool = False,
                          npop: int = 2, nleaf: int = 2,
                          adaptive: bool = False, sort: bool = True,
                          smem_meta: bool = False):
    def kernel(ox, oy, oz, dx, dy, dz, m2, qbox, qmeta, tri, *rest):
        cmi = None
        if mxu:
            cmi = rest[0]
            rest = rest[1:]
        meta_s = None
        if smem_meta:
            meta_s = rest[0]
            rest = rest[1:]
        out = rest[0]
        rest = rest[1:]
        o, d, inv, oi = _load_rays(ox, oy, oz, dx, dy, dz)
        mxu_args = None
        if mxu:
            istack, lstack, rsc = rest[-3:]
            _rmat_init_const(rsc)
            Rh, Rl = _rmat_load(rsc, o, d)
            mxu_args = (Rh, Rl, cmi)
        else:
            istack, lstack = rest[-2:]
        res = _run_occluded_dual(
            qbox, qmeta, tri, o, d, inv, oi, m2[:, :], istack, lstack,
            L, arity, compressed, counters=counters, mxu=mxu_args,
            npop=npop, nleaf=nleaf, adaptive=adaptive, sort=sort,
            meta_s=meta_s,
        )
        if counters:
            blocked, cnt = res
            out[:, :] = blocked
            r = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)
            out_c = jnp.int32(0)
            for k in reversed(range(7)):
                out_c = jnp.where(r == k, cnt[k], out_c)
            rest[0][:, :] = out_c
        else:
            out[:, :] = res

    return kernel


# ---------------------------------------------------------------------------
# HBM-streaming traversal (scenes larger than VMEM)
# ---------------------------------------------------------------------------
#
# VMEM-resident scenes cap at ~300k triangles (every 512-byte leaf group +
# attribute row resident; docs/DESIGN.md). The streaming variants keep the
# NODE tables in VMEM (they collapse 4:1 in the BVH4 packing and stay small)
# but leave the triangle/attribute rows in HBM (memory_space=HBM), fetched
# into an R-slot VMEM ring via async DMA in BLOCKS of STREAM_BLK consecutive
# leaf groups: sibling leaves get adjacent group ids from the DFS flatten,
# so one 2 KB block DMA typically serves several upcoming visits (round 2
# fetched one 512 B row at a time with exactly ONE outstanding DMA and lost
# 50x at 1M triangles). The leaf stack provides lookahead: each iteration
# prefetches the top pending leaves' blocks into idle slots, so DMAs overlap
# the interleaved inner visits' compute. Inner visits run the full
# production schedule (wide / adaptive pops) — node rows are resident.
# The MXU leaf path is deliberately NOT streamed: the C-matrix blocks are
# 8 KB/group lane-padded and the measured stream+MXU pass is SLOWER than
# stream+VPU (233.6 vs 225.3 ms on the 300k-triangle synthetic primary
# pass) — the extra DMA stall exceeds the epilogue savings. The reference's
# analog is simply "the GPU has enough HBM"; this is the TPU path to its
# synthetic millions-of-triangles scaling axis (cpu/src/main.c:115-131).
#
# Ring protocol (all bookkeeping is scalar state in the while-loop carry):
#   ring_b[r] — block id whose rows live in slot r (-1 empty)
#   ring_w[r] — 1 = DMA completed (waited), 0 = in flight
# Invariant: every started DMA is waited exactly once — at use, at
# eviction, or at the final drain.

STREAM_RING = 2      # VMEM ring slots per stream (round-4 sweep: R=2
                     # beats R=4 — 212.8 vs 220.4 ms at 300k, 490.8 vs
                     # 507.5 at 1M — because _ring_use/_ring_prefetch
                     # scan every slot per iteration and the scan IS the
                     # streaming tax; R=3 219.0, R=8 was 343 in round 3;
                     # metrics/bench_stream_ring_r4.json, *_1m_r4.json)
STREAM_KPRE = 2      # pending leaves prefetched per iteration
STREAM_BLK = 4       # consecutive leaf groups per DMA block


def _ring_sel(vals, r):
    """vals[r] for a tuple of scalars and a traced index r."""
    out = vals[0]
    for i in range(1, len(vals)):
        out = jnp.where(r == i, vals[i], out)
    return out


def _ring_set(vals, r, new):
    return tuple(jnp.where(r == i, new, v) for i, v in enumerate(vals))


def _slot_copies(hbms, rings, sems, R, blk, r):
    """Async-copy descriptors moving block `blk` into slot r.

    hbms/rings pair row streams (tri, attr?) with their (R*BLK, 128)
    rings. Stream s's slot-r semaphore is sems[s*R + r]."""
    B = STREAM_BLK
    return [
        pltpu.make_async_copy(
            hbm.at[pl.ds(blk * B, B), :],
            ring.at[pl.ds(r * B, B), :],
            sems.at[si * R + r],
        )
        for si, (hbm, ring) in enumerate(zip(hbms, rings))
    ]


def _slot_start(hbms, rings, sems, R, blk, r):
    for c in _slot_copies(hbms, rings, sems, R, blk, r):
        c.start()


def _slot_wait(hbms, rings, sems, R, blk, r):
    for c in _slot_copies(hbms, rings, sems, R, blk, r):
        c.wait()


def _ring_use(hbms, rings, sems, R, blk, ring_b, ring_w, clock):
    """Make block `blk` valid in some slot; returns
    (slot, ring_b, ring_w, clock, synced) — synced = 1 iff the block was
    absent from the ring and had to be fetched SYNCHRONOUSLY (start+wait
    with no compute in between: the un-hidden DMA case the prefetcher
    exists to avoid; counted by the stream counters mode)."""
    fr = jnp.int32(-1)
    for i in range(R):
        fr = jnp.where(ring_b[i] == blk, jnp.int32(i), fr)

    def use_found(args):
        ring_b, ring_w, clock = args

        def do_wait(_):
            _slot_wait(hbms, rings, sems, R, blk, fr)
            return jnp.int32(0)

        jax.lax.cond(_ring_sel(ring_w, fr) == 0, do_wait,
                     lambda _: jnp.int32(0), 0)
        return (fr, ring_b, _ring_set(ring_w, fr, jnp.int32(1)), clock,
                jnp.int32(0))

    def fetch(args):
        ring_b, ring_w, clock = args
        v = jax.lax.rem(clock, jnp.int32(R))
        bv = _ring_sel(ring_b, v)

        def retire(_):
            _slot_wait(hbms, rings, sems, R, bv, v)
            return jnp.int32(0)

        jax.lax.cond((bv >= 0) & (_ring_sel(ring_w, v) == 0), retire,
                     lambda _: jnp.int32(0), 0)
        _slot_start(hbms, rings, sems, R, blk, v)
        _slot_wait(hbms, rings, sems, R, blk, v)
        return (
            v,
            _ring_set(ring_b, v, blk),
            _ring_set(ring_w, v, jnp.int32(1)),
            clock + 1,
            jnp.int32(1),
        )

    return jax.lax.cond(fr >= 0, use_found, fetch, (ring_b, ring_w, clock))


def _ring_prefetch(hbms, rings, sems, R, lstack, lsp, kpre,
                   ring_b, ring_w, clock, protect_slot=None):
    """Start DMAs for the top pending leaves' blocks into idle slots.

    A slot is idle iff ring_w == 1 (waited data or empty); slots holding
    any of the current top-kpre blocks are protected from eviction. When
    the rotating victim is protected or busy the prefetch simply skips —
    the use path falls back to a synchronous fetch, so this is purely an
    overlap heuristic, never a correctness dependency."""
    B = STREAM_BLK
    tops = [
        jnp.where(
            i < lsp,
            (-lstack[jnp.maximum(lsp - 1 - i, 0)] - 1) // B,
            jnp.int32(-1),
        )
        for i in range(kpre)
    ]
    for i in range(kpre):
        bi = tops[i]
        inr = bi < 0  # absent (or duplicate block) -> no-op
        for j in range(i):
            inr = inr | (tops[j] == bi)
        for r_ in range(R):
            inr = inr | (ring_b[r_] == bi)
        v = jax.lax.rem(clock, jnp.int32(R))
        bv = _ring_sel(ring_b, v)
        protected = bv < -1
        for bj in tops:
            protected = protected | ((bv == bj) & (bj >= 0))
        can = (
            jnp.logical_not(inr)
            & (_ring_sel(ring_w, v) == 1)
            & jnp.logical_not(protected)
        )
        if protect_slot is not None:
            # Never evict the slot whose rows the caller is about to read
            # (the pre-eval prefetch position).
            can = can & (v != protect_slot)

        def start(args, bi=bi, v=v):
            ring_b, ring_w, clock = args
            _slot_start(hbms, rings, sems, R, bi, v)
            return (
                _ring_set(ring_b, v, bi),
                _ring_set(ring_w, v, jnp.int32(0)),
                clock + 1,
            )

        ring_b, ring_w, clock = jax.lax.cond(
            can, start, lambda a: a, (ring_b, ring_w, clock)
        )
    return ring_b, ring_w, clock


def _ring_drain(hbms, rings, sems, R, ring_b, ring_w):
    """Retire every in-flight prefetch so no DMA semaphore stays signaled."""
    for r in range(R):

        def retire(_, r=r):
            _slot_wait(hbms, rings, sems, R, ring_b[r], jnp.int32(r))
            return jnp.int32(0)

        jax.lax.cond((ring_w[r] == 0) & (ring_b[r] >= 0), retire,
                     lambda _: jnp.int32(0), 0)


def _closest_stream_kernel(L: int, arity: int, n_attr: int = 0,
                           compressed: bool = False, npop: int = 2,
                           adaptive: bool = False, counters: bool = False,
                           R: int = STREAM_RING, kpre: int = STREAM_KPRE,
                           smem_meta: bool = False):
    """Closest hit with HBM-streamed leaf rows (block-ring-buffered).

    Inner visits run the production wide/adaptive pop schedule on the
    VMEM-resident node tables; each leaf visit evaluates ONE group on the
    VPU (see the section comment for why the MXU leaf is not streamed).
    counters=True appends a per-tile i32 output whose sublanes hold
    (inner_iters, leaf_group_evals, sync_fetches, block_fills): fills =
    total started block DMAs (the final ring clock), syncs = fills that
    were start+wait with no compute in between — the stream roofline's
    overlap accounting (scripts/profile_stream.py)."""

    def kernel(*refs):
        nc = 1 if counters else 0
        ox, oy, oz, dx, dy, dz, qbox, qmeta, tri = refs[:9]
        p = 9
        attr = None
        if n_attr:
            attr = refs[p]
            p += 1
        meta_s = None
        if smem_meta:
            meta_s = refs[p]
            p += 1
        outs = refs[p:p + 3 + n_attr + nc]
        rest = refs[p + 3 + n_attr + nc:]
        istack, lstack = rest[0], rest[1]
        q = 2
        rings = [rest[q]]
        q += 1
        if n_attr:
            rings.append(rest[q])
            q += 1
        sems = rest[q]
        hbms = [tri] + ([attr] if n_attr else [])

        t_out, idx_out, nd_out = outs[:3]
        o, d, inv, oi = _load_rays(ox, oy, oz, dx, dy, dz)
        istack[0] = jnp.int32(0)

        def leaf_update(slot, g, off, t, idx, nd, av):
            row_i = slot * STREAM_BLK + off
            tri_row = rings[0][pl.ds(row_i, 1), :].astype(jnp.float32)
            if n_attr:
                arow = rings[1][pl.ds(row_i, 1), :].astype(jnp.float32)
                for j in range(L):
                    t, idx, nd, av = _attr_leaf_update(
                        o, d, tri_row, arow, g, j, L, t, idx, nd, av
                    )
            else:
                for j in range(L):
                    tj, ndj = _mt_scalar_tri(o, d, tri_row, j)
                    better = tj < t
                    t = jnp.where(better, tj, t)
                    idx = jnp.where(better, g * L + j, idx)
                    nd = jnp.where(better, ndj.astype(jnp.int32), nd)
            return t, idx, nd, av

        def body(state):
            isp, lsp, clock, ring_b, ring_w, t, idx, nd, av = state[:9]
            cnt = state[9:]

            def do_leaf(args):
                isp, lsp, clock, ring_b, ring_w, t, idx, nd, av = args[:9]
                cnt = args[9:]
                lsp = lsp - 1
                g = -lstack[lsp] - 1
                blk = g // STREAM_BLK
                slot, ring_b, ring_w, clock, synced = _ring_use(
                    hbms, rings, sems, R, blk, ring_b, ring_w, clock
                )
                if counters:
                    cnt = (cnt[0], cnt[1] + 1, cnt[2] + synced)
                # Prefetch BEFORE the eval: the next pending blocks' DMAs
                # get the whole leaf evaluation (~400 ns of vector work)
                # as lead time instead of issuing at the iteration tail
                # with zero compute before their wait.
                ring_b, ring_w, clock = _ring_prefetch(
                    hbms, rings, sems, R, lstack, lsp, kpre,
                    ring_b, ring_w, clock, protect_slot=slot,
                )
                t, idx, nd, av = leaf_update(
                    slot, g, g - blk * STREAM_BLK, t, idx, nd, av
                )
                # Same-block second pop: sibling leaves get adjacent
                # group ids from the DFS flatten, so the next pending
                # leaf very often lives in the block just fetched —
                # evaluate it in this iteration behind the SAME ring
                # lookup. Chain depth 2 is the measured optimum: depth 4
                # (the whole block) re-measured 229.6 vs 221.1 ms on the
                # 300k streamed pass — third/fourth same-block hits are
                # too rare to pay for two more compare+branch per leaf
                # iteration.
                g2 = jnp.where(
                    lsp > 0, -lstack[jnp.maximum(lsp - 1, 0)] - 1,
                    jnp.int32(-1),
                )

                def second(a):
                    lsp, t, idx, nd, av = a[:5]
                    c2 = a[5:]
                    t, idx, nd, av = leaf_update(
                        slot, g2, g2 - blk * STREAM_BLK, t, idx, nd, av
                    )
                    if counters:
                        c2 = (c2[0], c2[1] + 1, c2[2])
                    return (lsp - 1, t, idx, nd, av) + c2

                res2 = jax.lax.cond(
                    (g2 >= 0) & (g2 // STREAM_BLK == blk),
                    second, lambda a: a, (lsp, t, idx, nd, av) + cnt,
                )
                lsp, t, idx, nd, av = res2[:5]
                cnt = res2[5:]
                return (isp, lsp, clock, ring_b, ring_w, t, idx, nd,
                        av) + cnt

            def do_inner(args):
                isp, lsp, clock, ring_b, ring_w, t, idx, nd, av = args[:9]
                cnt = args[9:]
                if counters:
                    cnt = (cnt[0] + 1, cnt[1], cnt[2])
                if adaptive and npop > 2:
                    isp, lsp = _adaptive_inner_visit(
                        qbox, qmeta, oi, inv, t, istack, lstack, isp, lsp,
                        npop, arity, compressed, meta_s=meta_s,
                    )
                elif npop > 2:
                    isp, lsp = _wide_inner_visit(
                        qbox, qmeta, oi, inv, t, istack, lstack, isp, lsp,
                        npop, arity, compressed, meta_s=meta_s,
                    )
                else:
                    isp, lsp = _dual_inner_visit(
                        qbox, qmeta, oi, inv, t, istack, lstack, isp, lsp,
                        arity, compressed, meta_s=meta_s,
                    )
                ring_b, ring_w, clock = _ring_prefetch(
                    hbms, rings, sems, R, lstack, lsp, kpre,
                    ring_b, ring_w, clock,
                )
                return (isp, lsp, clock, ring_b, ring_w, t, idx, nd,
                        av) + cnt

            return jax.lax.cond(lsp > 0, do_leaf, do_inner, state)

        zero = jnp.zeros((SUBLANES, LANES), jnp.float32)
        init = (
            jnp.int32(1), jnp.int32(0), jnp.int32(0),
            tuple(jnp.int32(-1) for _ in range(R)),
            tuple(jnp.int32(1) for _ in range(R)),
            jnp.full((SUBLANES, LANES), T_MAX, jnp.float32),
            jnp.full((SUBLANES, LANES), -1, jnp.int32),
            jnp.zeros((SUBLANES, LANES), jnp.int32),
            tuple(zero for _ in range(n_attr)),
        ) + ((jnp.int32(0),) * 3 if counters else ())
        state = jax.lax.while_loop(
            lambda s: (s[0] > 0) | (s[1] > 0), body, init
        )
        _, _, clock, ring_b, ring_w, t, idx, nd, av = state[:9]
        _ring_drain(hbms, rings, sems, R, ring_b, ring_w)
        t_out[:, :] = t
        idx_out[:, :] = idx
        nd_out[:, :] = nd
        for ref, val in zip(outs[3:3 + n_attr], av):
            ref[:, :] = val
        if counters:
            cnt = state[9:]
            r = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)
            outs[-1][:, :] = jnp.where(
                r == 0, cnt[0], jnp.where(r == 1, cnt[1],
                                          jnp.where(r == 2, cnt[2],
                                                    jnp.where(r == 3, clock,
                                                              0)))
            )

    return kernel


def _occluded_stream_kernel(L: int, arity: int, compressed: bool = False,
                            npop: int = 2, adaptive: bool = False,
                            counters: bool = False,
                            R: int = STREAM_RING, kpre: int = STREAM_KPRE,
                            smem_meta: bool = False):
    """Any-hit occlusion with HBM-streamed leaf rows (block-ring).
    counters as in _closest_stream_kernel."""

    def kernel(ox, oy, oz, dx, dy, dz, m2, qbox, qmeta, tri, *rest):
        meta_s = None
        if smem_meta:
            meta_s = rest[0]
            rest = rest[1:]
        out = rest[0]
        rest = rest[1:]
        cnt_out = None
        if counters:
            cnt_out = rest[0]
            rest = rest[1:]
        istack, lstack, tri_ring, sems = rest
        rings = [tri_ring]
        hbms = [tri]
        o, d, inv, oi = _load_rays(ox, oy, oz, dx, dy, dz)
        max_dist2 = m2[:, :]
        t_limit = jnp.sqrt(max_dist2)
        istack[0] = jnp.int32(0)

        def body(state):
            isp, lsp, clock, ring_b, ring_w, blocked, all_blocked = state[:7]
            cnt = state[7:]

            def leaf_eval(slot, off, blocked):
                row_i = slot * STREAM_BLK + off
                row = rings[0][pl.ds(row_i, 1), :].astype(jnp.float32)
                for j in range(L):
                    tj, _ = _mt_scalar_tri(o, d, row, j)
                    hit = (tj < T_MAX) & (tj * tj < max_dist2)
                    blocked = jnp.maximum(blocked, hit.astype(jnp.int32))
                return blocked

            def do_leaf(args):
                isp, lsp, clock, ring_b, ring_w, blocked, all_blocked = args[:7]
                cnt = args[7:]
                lsp = lsp - 1
                g = -lstack[lsp] - 1
                blk = g // STREAM_BLK
                slot, ring_b, ring_w, clock, synced = _ring_use(
                    hbms, rings, sems, R, blk, ring_b, ring_w, clock
                )
                if counters:
                    cnt = (cnt[0], cnt[1] + 1, cnt[2] + synced)
                # Prefetch before the eval (see the closest kernel).
                ring_b, ring_w, clock = _ring_prefetch(
                    hbms, rings, sems, R, lstack, lsp, kpre,
                    ring_b, ring_w, clock, protect_slot=slot,
                )
                blocked = leaf_eval(slot, g - blk * STREAM_BLK, blocked)
                # Same-block second pop (depth 2 measured best; see the
                # closest kernel).
                g2 = jnp.where(
                    lsp > 0, -lstack[jnp.maximum(lsp - 1, 0)] - 1,
                    jnp.int32(-1),
                )

                def second(a):
                    lsp, blocked = a[:2]
                    c2 = a[2:]
                    blocked = leaf_eval(
                        slot, g2 - blk * STREAM_BLK, blocked
                    )
                    if counters:
                        c2 = (c2[0], c2[1] + 1, c2[2])
                    return (lsp - 1, blocked) + c2

                res2 = jax.lax.cond(
                    (g2 >= 0) & (g2 // STREAM_BLK == blk),
                    second, lambda a: a, (lsp, blocked) + cnt,
                )
                lsp, blocked = res2[:2]
                cnt = res2[2:]
                all_blocked = jnp.min(blocked)
                return (isp, lsp, clock, ring_b, ring_w, blocked,
                        all_blocked) + cnt

            def do_inner(args):
                isp, lsp, clock, ring_b, ring_w, blocked, all_blocked = args[:7]
                cnt = args[7:]
                if counters:
                    cnt = (cnt[0] + 1, cnt[1], cnt[2])
                t_cut = jnp.where(blocked > 0, jnp.float32(0.0), t_limit)
                if adaptive and npop > 2:
                    isp, lsp = _adaptive_inner_visit(
                        qbox, qmeta, oi, inv, t_cut, istack, lstack,
                        isp, lsp, npop, arity, compressed, meta_s=meta_s,
                    )
                elif npop > 2:
                    isp, lsp = _wide_inner_visit(
                        qbox, qmeta, oi, inv, t_cut, istack, lstack,
                        isp, lsp, npop, arity, compressed, meta_s=meta_s,
                    )
                else:
                    isp, lsp = _dual_inner_visit(
                        qbox, qmeta, oi, inv, t_cut, istack, lstack,
                        isp, lsp, arity, compressed, meta_s=meta_s,
                    )
                ring_b, ring_w, clock = _ring_prefetch(
                    hbms, rings, sems, R, lstack, lsp, kpre,
                    ring_b, ring_w, clock,
                )
                return (isp, lsp, clock, ring_b, ring_w, blocked,
                        all_blocked) + cnt

            return jax.lax.cond(lsp > 0, do_leaf, do_inner, state)

        init = (
            jnp.int32(1), jnp.int32(0), jnp.int32(0),
            tuple(jnp.int32(-1) for _ in range(R)),
            tuple(jnp.int32(1) for _ in range(R)),
            jnp.zeros((SUBLANES, LANES), jnp.int32),
            jnp.int32(0),
        ) + ((jnp.int32(0),) * 3 if counters else ())
        state = jax.lax.while_loop(
            lambda s: ((s[0] > 0) | (s[1] > 0)) & (s[6] == 0), body, init
        )
        _, _, clock, ring_b, ring_w, blocked, _ = state[:7]
        _ring_drain(hbms, rings, sems, R, ring_b, ring_w)
        out[:, :] = blocked
        if counters:
            cnt = state[7:]
            r = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)
            cnt_out[:, :] = jnp.where(
                r == 0, cnt[0], jnp.where(r == 1, cnt[1],
                                          jnp.where(r == 2, cnt[2],
                                                    jnp.where(r == 3, clock,
                                                              0)))
            )

    return kernel



ATTR_STRIDE = 9  # kd(3), ks(3), kr(3) per triangle in an attr row


def pack_attr(flat: FlatBVH, mat_idx, mats_kd, mats_ks, mats_kr) -> np.ndarray:
    """(G, 128) attribute rows: triangle j's [kd, ks, kr] at lanes [9j, 9j+9).

    Lets the closest-hit kernels resolve shading attributes with masked
    selects at leaf time instead of per-lane gathers afterwards (HitFull).
    Pad slots keep zeros (they can never win a hit anyway). The trailing
    all-zero row is the NULL group's (matches pack_bvh's tri layout).
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
    attr = np.zeros((G + 1, LANES), np.float32)
    attr[:G, : ATTR_STRIDE * L] = data.reshape(G, L * ATTR_STRIDE)
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


def _closest_attr_kernel(L: int, arity: int, compressed: bool = False):
    """Closest hit + surface attributes (12 extra carried planes)."""

    def kernel(ox, oy, oz, dx, dy, dz, cbox, cmeta, tri, attr,
               t_out, idx_out, nd_out, *rest):
        outs = rest[:12]
        stack = rest[12]
        o, d, inv, oi = _load_rays(ox, oy, oz, dx, dy, dz)
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
                mrow = cmeta[pl.ds(e, 1), :]
                if arity >= 4:
                    mn_row, mx_row = _load_node_row(cbox, e, compressed)
                    ms = list(
                        _slab_multi(
                            mn_row, mx_row, oi, inv, t, arity, compressed
                        )
                    )
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
                    crow = cbox[pl.ds(e, 1), :].astype(jnp.float32)
                    ml, mr = _slab_pair(crow, oi, inv, t)
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


# ---------------------------------------------------------------------------
# Fused whole-frame kernel (closest + shade + shadow + bounce, one launch)
# ---------------------------------------------------------------------------
#
# The pass-based frame runs 2 traversal kernels per bounce with XLA glue
# (shading math, reflection updates, ray-plane round-trips through HBM)
# between them, and every pass is a global barrier across all packets. The
# fused kernel runs the ENTIRE reference bounce loop
# (gpu/src/raytracer.cu:61-116) per packet in one launch: ray state lives
# in vector registers, the shading/reflection glue becomes in-kernel
# vector ops, and packets proceed through their bounces independently (no
# inter-pass barriers). Semantics are identical to ops/shade.trace_rays;
# tests/test_fused.py pins the interpret-mode image to the pass-based one.
# Spheres are first-class: a dense in-kernel sphere pass merges sphere
# hits after each BVH traversal (closest AND shadow segments) when
# num_spheres > 0 — see sphere_closest_merge / sphere_occluded_merge
# below (the pass-based path instead wraps tracers via ops/spheres.py).


def _frame_fused_kernel(L: int, arity: int, bounces: int, num_lights: int,
                        compressed: bool = False, mxu: bool = False,
                        npop: int = 2, nleaf: int = 2,
                        npop0: int = 0,
                        reverse_shadows: bool = True,
                        npops: "tuple | None" = None,
                        adaptive: bool = False,
                        num_spheres: int = 0,
                        counters: bool = False,
                        smem_meta: bool = False):
    """npop0, when nonzero and different from npop, unrolls bounce 0 with
    its own pop width: the coherent primary passes lose to wide pops (the
    pending-stack is usually shallower than npop, so slots pad), while
    the divergent later bounces gain — measured best at npop0=2,
    npop=8. npops, when given, generalizes this to a FULL per-bounce
    schedule: entry b is bounce b's pop width (the last entry covers any
    remaining bounces); the whole loop is then unrolled. reverse_shadows
    traces shadow segments from the light (one shared packet origin —
    see ops/shade.shade_hit's docstring for the exact window mapping and
    the measured win).

    counters=True (instrumentation) fully unrolls the bounce loop and
    emits one extra (8, 128) int32 output per packet holding the
    per-bounce executed-slot counters of the PRODUCTION fused path:
    row k (the 7-tuple of _run_closest_dual), lane 2b = bounce b's
    closest run, lane 2b+1 = bounce b's occluded runs summed over
    lights — so the roofline prices the fused frame from counted slots
    instead of the bounce-3 extrapolation (round-4 verdict item)."""
    EPS2 = float(EPSILON) * float(EPSILON)

    def kernel(ox, oy, oz, dx, dy, dz, qbox, qmeta, tri, attr, lamb,
               *rest):
        k = 0
        if num_spheres:
            sph = rest[k]
            k += 1
        nc = 1 if counters else 0
        if mxu:
            cmi = rest[k]
            k += 1
        else:
            cmi = None
        if smem_meta:
            meta_s = rest[k]
            k += 1
        else:
            meta_s = None
        if mxu:
            outs = rest[k:k + 3 + nc]
            (istack, lstack, rsc) = rest[k + 3 + nc:]
            _rmat_init_const(rsc)
        else:
            outs = rest[k:k + 3 + nc]
            (istack, lstack) = rest[k + 3 + nc:]
        r_out, g_out, b_out = outs[:3]
        c_out = outs[3] if counters else None
        shape = (SUBLANES, LANES)
        fone = jnp.ones(shape, jnp.float32)
        fzero = jnp.zeros(shape, jnp.float32)
        far = jnp.full(shape, 1e30, jnp.float32)
        lim = jnp.float32(INV_DIR_MAX)

        amb_row = lamb[pl.ds(num_lights, 1), :]
        amb = (amb_row[0, 0], amb_row[0, 1], amb_row[0, 2])

        def rsq(v):
            return jax.lax.rsqrt(jnp.maximum(v, 1e-30))

        def sphere_t(o, d, a_sp, srow):
            """Per-sphere batched solve of |o + t*d - c|^2 = r^2 — the
            exact formulation of ops/intersect.ray_sphere (guarded sqrt /
            denominator, nearest t > EPSILON in units of |d|, T_MAX on
            miss). Dead lanes (d == 0) report a_sp == 0 -> miss."""
            scx, scy, scz, sr = srow[0, 0], srow[0, 1], srow[0, 2], srow[0, 3]
            ocx, ocy, ocz = o.x - scx, o.y - scy, o.z - scz
            half_b = ocx * d.x + ocy * d.y + ocz * d.z
            c_sp = ocx * ocx + ocy * ocy + ocz * ocz - sr * sr
            disc = half_b * half_b - a_sp * c_sp
            sq = jnp.sqrt(jnp.maximum(disc, 1e-30))
            a_safe = jnp.where(a_sp > 1e-20, a_sp, fone)
            t0 = (-half_b - sq) / a_safe
            t1 = (-half_b + sq) / a_safe
            ts = jnp.where(t0 > jnp.float32(EPSILON), t0, t1)
            hit_s = (
                (disc >= 0.0)
                & (ts > jnp.float32(EPSILON))
                & (a_sp > 1e-20)
            )
            return jnp.where(hit_s, ts, jnp.float32(T_MAX)), c_sp

        def sphere_closest_merge(sph, o, d, t, nd, av):
            """Static unrolled dense sphere pass after the BVH leaf phase:
            merge each sphere's hit into (t, norm_dir, attributes) with
            strict-< selects — the in-kernel analog of
            ops/spheres.wrap_tracer + override_attrs (sphere normal is the
            unnormalized p - c; the shared rsq below unit-normalizes it
            exactly like the triangle raw normal)."""
            a_sp = d.x * d.x + d.y * d.y + d.z * d.z
            for s in range(num_spheres):
                srow = sph[pl.ds(s, 1), :]
                ts, c_sp = sphere_t(o, d, a_sp, srow)
                better = ts < t
                t = jnp.where(better, ts, t)
                # origin inside the sphere flips the normal, exactly like
                # the triangle det-sign flag (nd > 0 -> flip)
                nd = jnp.where(better, (c_sp < 0.0).astype(jnp.int32), nd)
                snx = o.x + d.x * ts - srow[0, 0]
                sny = o.y + d.y * ts - srow[0, 1]
                snz = o.z + d.z * ts - srow[0, 2]
                av = (
                    jnp.where(better, snx, av[0]),
                    jnp.where(better, sny, av[1]),
                    jnp.where(better, snz, av[2]),
                ) + tuple(
                    jnp.where(better, srow[0, 4 + j], av[3 + j])
                    for j in range(9)
                )
            return t, nd, av

        def sphere_occluded_merge(sph, so, sd, sm2, blocked):
            """Dense sphere any-hit for the shadow segments: blocked iff a
            sphere hit lies inside the segment window (t^2 < max_dist2 in
            units of the unit shadow direction), ops/spheres.wrap_tracer's
            occluded extension."""
            a_sp = sd.x * sd.x + sd.y * sd.y + sd.z * sd.z
            for s in range(num_spheres):
                srow = sph[pl.ds(s, 1), :]
                ts, _ = sphere_t(so, sd, a_sp, srow)
                sh = (ts < jnp.float32(T_MAX)) & (ts * ts < sm2)
                blocked = blocked | sh.astype(blocked.dtype)
            return blocked

        state0 = (
            ox[:, :], oy[:, :], oz[:, :], dx[:, :], dy[:, :], dz[:, :],
            fone, fone, fone,            # multiplier
            fzero, fzero, fzero,         # final color
            jnp.ones(shape, jnp.int32),  # alive
        )

        def make_bounce(npop, nleaf):
          def bounce(_, st):
            (pox, poy, poz, pdx, pdy, pdz,
             mx, my, mz, fx, fy, fz, alive_i) = st
            live = alive_i > 0
            # mask_dead_rays semantics: dead lanes stop steering the packet
            o = Vec3(jnp.where(live, pox, far), jnp.where(live, poy, far),
                     jnp.where(live, poz, far))
            d = Vec3(jnp.where(live, pdx, fzero), jnp.where(live, pdy, fzero),
                     jnp.where(live, pdz, fzero))
            inv = Vec3(jnp.clip(1.0 / d.x, -lim, lim),
                       jnp.clip(1.0 / d.y, -lim, lim),
                       jnp.clip(1.0 / d.z, -lim, lim))
            oi = Vec3(o.x * inv.x, o.y * inv.y, o.z * inv.z)

            mxu_c = (*_rmat_load(rsc, o, d), cmi) if mxu else None
            res_c = _run_closest_dual(
                qbox, qmeta, tri, attr, o, d, inv, oi, istack, lstack,
                L, arity, 12, compressed, mxu=mxu_c, npop=npop, nleaf=nleaf,
                adaptive=adaptive, counters=counters, meta_s=meta_s,
            )
            t, _, nd, av = res_c[:4]
            ccnt = res_c[4] if counters else None
            ocnt = (jnp.int32(0),) * 7 if counters else None
            if num_spheres:
                t, nd, av = sphere_closest_merge(sph, o, d, t, nd, av)
            is_hit = t < jnp.float32(T_MAX)
            # miss: final += multiplier * ambient, lane dies
            mw = (live & jnp.logical_not(is_hit)).astype(jnp.float32)
            fx = fx + mx * amb[0] * mw
            fy = fy + my * amb[1] * mw
            fz = fz + mz * amb[2] * mw
            live = live & is_hit

            # surface attributes (kernel-resolved, HitFull layout)
            ninv = rsq(av[0] * av[0] + av[1] * av[1] + av[2] * av[2])
            sgn = jnp.where(nd > 0, -1.0, 1.0) * ninv   # flipped unit normal
            nx, ny, nz = av[0] * sgn, av[1] * sgn, av[2] * sgn
            kd = (av[3], av[4], av[5])
            ks = (av[6], av[7], av[8])
            kr = (av[9], av[10], av[11])

            t_safe = jnp.where(is_hit, t, fone)
            px = pox + pdx * t_safe
            py = poy + pdy * t_safe
            pz = poz + pdz * t_safe

            cx = kd[0] * amb[0]
            cy = kd[1] * amb[1]
            cz = kd[2] * amb[2]

            for i in range(num_lights):
                lrow = lamb[pl.ds(i, 1), :]
                lp = (lrow[0, 0], lrow[0, 1], lrow[0, 2])
                kl = (lrow[0, 3], lrow[0, 4], lrow[0, 5])
                lvx, lvy, lvz = lp[0] - px, lp[1] - py, lp[2] - pz
                mag2 = lvx * lvx + lvy * lvy + lvz * lvz
                imag = rsq(mag2)
                lx, ly, lz = lvx * imag, lvy * imag, lvz * imag
                ndl = nx * lx + ny * ly + nz * lz
                # half vector with the reference's UNNORMALIZED view -d
                hx, hy, hz = lx - pdx, ly - pdy, lz - pdz
                ih = rsq(hx * hx + hy * hy + hz * hz)
                coeff = jnp.maximum(
                    0.0, (nx * hx + ny * hy + nz * hz) * ih
                )
                dterm = jnp.maximum(0.0, ndl)
                backface = (lvx * nx + lvy * ny + lvz * nz) < 0.0
                need = live & jnp.logical_not(backface)

                if reverse_shadows:
                    # light -> hit point (single shared packet origin);
                    # window (dist - EPS)^2, see shade_hit's docstring.
                    mag = mag2 * imag
                    so = Vec3(jnp.where(need, lp[0], far),
                              jnp.where(need, lp[1], far),
                              jnp.where(need, lp[2], far))
                    sd = Vec3(jnp.where(need, -lx, fzero),
                              jnp.where(need, -ly, fzero),
                              jnp.where(need, -lz, fzero))
                    sm2 = jnp.maximum(mag - jnp.float32(EPSILON), 0.0) ** 2
                else:
                    so = Vec3(jnp.where(need, px, far),
                              jnp.where(need, py, far),
                              jnp.where(need, pz, far))
                    sd = Vec3(jnp.where(need, lx, fzero),
                              jnp.where(need, ly, fzero),
                              jnp.where(need, lz, fzero))
                    sm2 = mag2
                sinv = Vec3(jnp.clip(1.0 / sd.x, -lim, lim),
                            jnp.clip(1.0 / sd.y, -lim, lim),
                            jnp.clip(1.0 / sd.z, -lim, lim))
                soi = Vec3(so.x * sinv.x, so.y * sinv.y, so.z * sinv.z)
                mxu_o = (*_rmat_load(rsc, so, sd), cmi) if mxu else None
                res_o = _run_occluded_dual(
                    qbox, qmeta, tri, so, sd, sinv, soi, sm2,
                    istack, lstack, L, arity, compressed, mxu=mxu_o,
                    npop=npop, nleaf=nleaf,
                    adaptive=adaptive, counters=counters, meta_s=meta_s,
                )
                if counters:
                    blocked, oc = res_o
                    ocnt = tuple(a + b for a, b in zip(ocnt, oc))
                else:
                    blocked = res_o
                if num_spheres:
                    blocked = sphere_occluded_merge(sph, so, sd, sm2, blocked)
                vis = (
                    jnp.logical_not(backface).astype(jnp.float32)
                    * (1.0 - blocked.astype(jnp.float32))
                )
                w = vis / jnp.maximum(mag2, 1e-30)
                cx = cx + kl[0] * (kd[0] * dterm + ks[0] * coeff) * w
                cy = cy + kl[1] * (kd[1] * dterm + ks[1] * coeff) * w
                cz = cz + kl[2] * (kd[2] * dterm + ks[2] * coeff) * w

            lw = live.astype(jnp.float32)
            fx = fx + mx * cx * lw
            fy = fy + my * cy * lw
            fz = fz + mz * cz * lw

            # early-exit check BEFORE the kr update (raytracer.cu:103-106)
            live = live & (mx * mx + my * my + mz * mz >= EPS2)
            mx, my, mz = mx * kr[0], my * kr[1], mz * kr[2]

            # reflection ray
            adn = 2.0 * jnp.abs(pdx * nx + pdy * ny + pdz * nz)
            rx, ry, rz = pdx + nx * adn, pdy + ny * adn, pdz + nz * adn
            ir = rsq(rx * rx + ry * ry + rz * rz)
            st_out = (px, py, pz, rx * ir, ry * ir, rz * ir,
                      mx, my, mz, fx, fy, fz, live.astype(jnp.int32))
            if counters:
                return st_out, ccnt, ocnt
            return st_out
          return bounce

        def sched_b(b):
            """(npop, nleaf) bounce b executes — mirrors the production
            dispatch below exactly."""
            if npops:
                w = npops[min(b, len(npops) - 1)]
                return w, (default_nleaf(w, L) if mxu else 2)
            if npop0 and npop0 != npop and bounces > 1 and b == 0:
                return npop0, (default_nleaf(npop0, L) if mxu else 2)
            return npop, nleaf

        if counters:
            # Instrumentation path: unroll every bounce (identical body
            # to the fori_loop production path — unrolling is a pure
            # schedule change) and collect each bounce's counter tuples.
            st = state0
            cnt_rows = []
            for b in range(bounces):
                st, ccnt, ocnt = make_bounce(*sched_b(b))(b, st)
                cnt_rows.append((ccnt, ocnt))
            r = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
            out_c = jnp.zeros((SUBLANES, LANES), jnp.int32)
            for b, (ccnt, ocnt) in enumerate(cnt_rows):
                for k in range(7):
                    out_c = jnp.where((r == k) & (lane == 2 * b),
                                      ccnt[k], out_c)
                    out_c = jnp.where((r == k) & (lane == 2 * b + 1),
                                      ocnt[k], out_c)
            c_out[:, :] = out_c
        else:
            bounce = make_bounce(npop, nleaf)
            if npops:
                st = state0
                for b in range(bounces):
                    w = npops[min(b, len(npops) - 1)]
                    st = make_bounce(
                        w, default_nleaf(w, L) if mxu else 2
                    )(b, st)
            elif npop0 and npop0 != npop and bounces > 1:
                b0 = make_bounce(npop0, default_nleaf(npop0, L) if mxu else 2)
                st = b0(0, state0)
                st = jax.lax.fori_loop(1, bounces, bounce, st)
            else:
                st = jax.lax.fori_loop(0, bounces, bounce, state0)
        r_out[:, :] = st[9]
        g_out[:, :] = st[10]
        b_out[:, :] = st[11]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "leaf_size", "bounces", "interpret", "stack_depth", "compressed",
        "npop", "nleaf", "npop0", "reverse_shadows", "npops",
        "adaptive", "counters", "smem_meta",
    ),
)
def frame_tiles(
    cbox, cmeta, tri, attr, lamb, o: Vec3, d: Vec3, *, bounces: int,
    leaf_size: int, interpret: bool = False, stack_depth: int = STACK_DEPTH,
    compressed: bool = False, cmat=None, npop: int = 2, nleaf: int = 0,
    npop0: int = 0, reverse_shadows: bool = True,
    npops: "tuple | None" = None, adaptive: bool = False, sph=None,
    counters: bool = False, smem_meta: "bool | None" = None,
) -> Vec3:
    """Fused whole-frame render over tiled rays -> unclamped color planes.

    smem_meta as in closest_tiles (None = auto; SMEM mirror of the node
    meta table for every bounce's closest and occluded traversals).

    `lamb` is a (num_lights + 1, 8) f32 table: rows 0..L-1 hold
    (light_pos.xyz, light_kl.rgb, 0, 0); the last row holds the ambient
    color. `sph`, when given, is the (num_spheres, 16) f32 table from
    pack_spheres — spheres are evaluated as a dense in-kernel pass after
    each BVH traversal. Matches ops/shade.trace_rays exactly (same masks,
    same reference quirks)."""
    rows = o.x.shape[0]
    assert o.x.shape == (rows, LANES) and rows % SUBLANES == 0
    ntiles = rows // SUBLANES
    arity = {16: 2, 32: 4, 64: 8}[cbox.shape[1]]
    assert arity >= 4, "fused frame kernel needs bvh_width >= 4"
    num_lights = int(lamb.shape[0]) - 1
    num_spheres = 0 if sph is None else int(sph.shape[0])
    mxu = cmat is not None and arity >= 4 and leaf_size in (4, SUBLANES)
    assert npop in (2, 4, 8, 16)
    smem_meta, smem_in, smem_specs = _smem_meta_setup(
        cmeta, smem_meta, arity, dual=True, stream=False
    )
    kernel = _frame_fused_kernel(
        leaf_size, arity, bounces, num_lights, compressed, mxu=mxu,
        npop=npop, nleaf=nleaf or (default_nleaf(npop, leaf_size) if mxu else 2),
        npop0=npop0,
        reverse_shadows=reverse_shadows, npops=npops, adaptive=adaptive,
        num_spheres=num_spheres, counters=counters, smem_meta=smem_meta,
    )
    extra_in = ([sph] if num_spheres else []) + ([cmat] if mxu else []) \
        + smem_in
    extra_specs = (
        [pl.BlockSpec(memory_space=pltpu.VMEM)] if num_spheres else []
    ) + (_MXU_SPECS if mxu else []) + smem_specs
    scratch = [
        pltpu.SMEM((stack_depth,), jnp.int32),
        pltpu.SMEM((stack_depth,), jnp.int32),
    ]
    if mxu:
        scratch = scratch + [_RMAT_SCRATCH]
    block = pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = [jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 3
    if counters:
        out_shape = out_shape + [
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        out_shape=out_shape,
        in_specs=_ray_specs(6) + _scene_specs(False) + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # attr
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lights + ambient
        ] + extra_specs,
        out_specs=[block] * len(out_shape),
        scratch_shapes=scratch,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(o.x, o.y, o.z, d.x, d.y, d.z, cbox, cmeta, tri, attr, lamb, *extra_in)
    if counters:
        # (ntiles, 7, 2*bounces): [t, k, 2b] = closest, [t, k, 2b+1] =
        # occluded-summed-over-lights, counter k as in _run_closest_dual.
        cnt = outs[3].reshape(ntiles, SUBLANES, LANES)[:, :7, :2 * bounces]
        return Vec3(*outs[:3]), cnt
    return Vec3(*outs[:3])


def pack_spheres(ds):
    """(num_spheres, 16) f32 sphere table for frame_tiles, or None.

    Per row: (cx, cy, cz, r, kd.rgb, ks.rgb, kr.rgb, 0, 0, 0). Material
    coefficients are resolved at pack time (sph_mat -> material tables),
    mirroring ops/spheres.override_attrs' lookups, so the kernel needs no
    per-lane gathers."""
    S = int(ds.sph_r.shape[0])
    if S == 0:
        return None
    mi = ds.sph_mat
    cols = [
        ds.sph_c.x, ds.sph_c.y, ds.sph_c.z, ds.sph_r,
        ds.kd.x[mi], ds.kd.y[mi], ds.kd.z[mi],
        ds.ks.x[mi], ds.ks.y[mi], ds.ks.z[mi],
        ds.kr.x[mi], ds.kr.y[mi], ds.kr.z[mi],
    ]
    tab = jnp.stack([jnp.asarray(c, jnp.float32) for c in cols], axis=-1)
    return jnp.pad(tab, ((0, 0), (0, 3)))


def pack_lights(ds) -> "jnp.ndarray":
    """(num_lights + 1, 8) f32 light/ambient table for frame_tiles."""
    L = ds.num_lights
    out = jnp.zeros((L + 1, 8), jnp.float32)
    if L:
        out = out.at[:L, 0].set(ds.lights_pos.x)
        out = out.at[:L, 1].set(ds.lights_pos.y)
        out = out.at[:L, 2].set(ds.lights_pos.z)
        out = out.at[:L, 3].set(ds.lights_kl.x)
        out = out.at[:L, 4].set(ds.lights_kl.y)
        out = out.at[:L, 5].set(ds.lights_kl.z)
    out = out.at[L, 0].set(ds.ambient.x)
    out = out.at[L, 1].set(ds.ambient.y)
    out = out.at[L, 2].set(ds.ambient.z)
    return out


def _ray_specs(n: int):
    return [
        pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(n)
    ]


_MXU_SPECS = [
    pl.BlockSpec(memory_space=pltpu.VMEM),  # cmi (interleaved [hi|lo])
]

# R-matrix build scratch for the MXU leaf path (see _rmat_load).
_RMAT_SCRATCH = pltpu.VMEM((16, SUBLANES * LANES), jnp.float32)


def _scene_specs(stream: bool = False):
    return [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # cbox
        pl.BlockSpec(memory_space=pltpu.VMEM),  # cmeta
        # Streaming: triangle rows stay in HBM, fetched per leaf visit.
        pl.BlockSpec(memory_space=pltpu.HBM if stream else pltpu.VMEM),
    ]


def _stream_scratch(n_rows: int, R: int = STREAM_RING):
    """Ring scratch for the streaming kernels: one (R*BLK, 128) f32 ring
    per row stream (tri, attr) — each slot holds a BLOCK of STREAM_BLK
    consecutive group rows — plus one DMA semaphore per (stream, slot)."""
    rings = [
        pltpu.VMEM((R * STREAM_BLK, LANES), jnp.float32)
        for _ in range(n_rows)
    ]
    return rings + [pltpu.SemaphoreType.DMA((n_rows * R,))]


def _pad_stream_rows(a):
    """Pad a (G, 128) HBM row table to a multiple of STREAM_BLK rows so
    block DMAs never read past the end (padding rows are never addressed
    by a real leaf, they only ride along in a trailing block fetch)."""
    extra = (-a.shape[0]) % STREAM_BLK
    return jnp.pad(a, ((0, extra), (0, 0))) if extra else a


@functools.partial(
    jax.jit,
    static_argnames=(
        "leaf_size", "interpret", "stack_depth", "dual", "compressed",
        "stream", "counters", "npop", "nleaf", "adaptive", "smem_meta",
    ),
)
def closest_tiles(
    cbox, cmeta, tri, o: Vec3, d: Vec3, leaf_size: int, interpret: bool = False,
    stack_depth: int = STACK_DEPTH, dual: bool = False,
    compressed: bool = False, stream: bool = False, counters: bool = False,
    cmat=None, npop: int = 2, nleaf: int = 0,
    adaptive: bool = False, smem_meta: "bool | None" = None,
):
    """Closest hit over tiled rays: planes shaped (ntiles*8, 128).

    smem_meta (None = auto by table size) mirrors the node meta table
    into SMEM so child-entry/validity reads are scalar loads instead of
    vector->scalar lane extracts — bit-identical traversal, applied to
    the dual/wide/adaptive AND streamed kernels when the table fits
    SMEM_META_LIMIT_BYTES (round 5, DESIGN 9e).

    counters=True also returns an (ntiles, 7) int32 array per packet:
    dual path — (inner_iters, leaf_iters, pad_slots, dead_pops,
    leaf_group_pops, inner_slots, leaf_slots) where *_slots sum the
    executed visit widths (adaptive-aware; the roofline's exact work
    units); streamed path — (inner_iters, leaf_group_evals,
    sync_fetches, block_fills, 0, 0, 0)."""
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
    assert not (compressed and arity < 4), "bf16 rows need bvh_width >= 4"
    assert not (stream and arity < 4), "streaming needs bvh_width >= 4"
    assert not (counters and not stream
                and not (dual and arity >= 4)), \
        "counters need the streamed or dual-pop kernels"
    assert npop in (2, 4, 8, 16) and (
        npop == 2 or (dual and arity >= 4)
    ), "wide-pop needs the dual-pop kernels (bvh_width >= 4)"
    if counters:
        out_shape.append(jax.ShapeDtypeStruct((rows, LANES), jnp.int32))
    # MXU leaves need the dual-pop NON-streamed kernels (leaf_size 8 or
    # 4, width >= 4); ineligible calls fall back to the VPU leaf. The
    # streamed MXU leaf was measured SLOWER than the streamed VPU leaf
    # (its 8 KB C-matrix block DMA stalls more than the epilogue saves),
    # so streaming always uses the VPU leaf.
    mxu = cmat is not None and dual and arity >= 4 and not stream \
        and leaf_size in (4, SUBLANES)
    smem_meta, smem_in, smem_specs = _smem_meta_setup(
        cmeta, smem_meta, arity, dual=dual, stream=stream
    )
    extra_in = []
    extra_specs = []
    if mxu:
        extra_in = [cmat]
        extra_specs = _MXU_SPECS
    extra_in = extra_in + smem_in
    extra_specs = extra_specs + smem_specs
    if stream:
        tri = _pad_stream_rows(tri)
        kernel = _closest_stream_kernel(
            leaf_size, arity, compressed=compressed, npop=npop,
            adaptive=adaptive, counters=counters, smem_meta=smem_meta,
        )
        scratch = (
            [pltpu.SMEM((stack_depth,), jnp.int32)] * 2 + _stream_scratch(1)
        )
    elif dual and arity >= 4:
        kernel = _closest_dual_kernel(
            leaf_size, arity, compressed=compressed, counters=counters,
            mxu=mxu, npop=npop, nleaf=nleaf or (default_nleaf(npop, leaf_size) if mxu else 2),
            adaptive=adaptive, smem_meta=smem_meta,
        )
        scratch = [
            pltpu.SMEM((stack_depth,), jnp.int32),
            pltpu.SMEM((stack_depth,), jnp.int32),
        ]
        if mxu:
            scratch = scratch + [_RMAT_SCRATCH]
    else:
        kernel = (
            _closest4_kernel(leaf_size, arity, compressed) if arity >= 4
            else _closest_kernel(leaf_size)
        )
        scratch = [pltpu.SMEM((stack_depth,), jnp.int32)]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=_ray_specs(6) + _scene_specs(stream) + extra_specs,
        out_specs=[
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * len(out_shape),
        scratch_shapes=scratch,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(o.x, o.y, o.z, d.x, d.y, d.z, cbox, cmeta, tri, *extra_in)
    t, idx, nd = outs[:3]
    hit = Hit(t=t, idx=idx, norm_dir=nd.astype(bool))
    if counters:
        cnt = outs[3].reshape(ntiles, SUBLANES, LANES)[:, :7, 0]
        return hit, cnt
    return hit


@functools.partial(
    jax.jit,
    static_argnames=(
        "leaf_size", "interpret", "stack_depth", "dual", "compressed",
        "stream", "npop", "nleaf", "adaptive", "smem_meta",
    ),
)
def closest_tiles_full(
    cbox, cmeta, tri, attr, o: Vec3, d: Vec3, leaf_size: int,
    interpret: bool = False, stack_depth: int = STACK_DEPTH,
    dual: bool = False, compressed: bool = False, stream: bool = False,
    cmat=None, npop: int = 2, nleaf: int = 0,
    adaptive: bool = False, smem_meta: "bool | None" = None,
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
    assert not (compressed and arity < 4), "bf16 rows need bvh_width >= 4"
    assert not (stream and arity < 4), "streaming needs bvh_width >= 4"
    assert npop in (2, 4, 8, 16) and (
        npop == 2 or (dual and arity >= 4)
    ), "wide-pop needs the dual-pop kernels (bvh_width >= 4)"
    # MXU leaves need the dual-pop NON-streamed kernels (see
    # closest_tiles); streaming always uses the VPU leaf.
    mxu = cmat is not None and dual and arity >= 4 and not stream \
        and leaf_size in (4, SUBLANES)
    smem_meta, smem_in, smem_specs = _smem_meta_setup(
        cmeta, smem_meta, arity, dual=dual, stream=stream
    )
    extra_in = []
    extra_specs = []
    if mxu:
        extra_in = [cmat]
        extra_specs = _MXU_SPECS
    extra_in = extra_in + smem_in
    extra_specs = extra_specs + smem_specs
    if stream:
        tri = _pad_stream_rows(tri)
        attr = _pad_stream_rows(attr)
        kernel = _closest_stream_kernel(
            leaf_size, arity, n_attr=12, compressed=compressed, npop=npop,
            adaptive=adaptive, smem_meta=smem_meta,
        )
        scratch = (
            [pltpu.SMEM((stack_depth,), jnp.int32)] * 2 + _stream_scratch(2)
        )
    elif dual and arity >= 4:
        kernel = _closest_dual_kernel(
            leaf_size, arity, n_attr=12, compressed=compressed, mxu=mxu,
            npop=npop, nleaf=nleaf or (default_nleaf(npop, leaf_size) if mxu else 2),
            adaptive=adaptive, smem_meta=smem_meta,
        )
        scratch = [
            pltpu.SMEM((stack_depth,), jnp.int32),
            pltpu.SMEM((stack_depth,), jnp.int32),
        ]
        if mxu:
            scratch = scratch + [_RMAT_SCRATCH]
    else:
        kernel = _closest_attr_kernel(leaf_size, arity, compressed)
        scratch = [pltpu.SMEM((stack_depth,), jnp.int32)]
    res = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        out_shape=out_shape,
        in_specs=_ray_specs(6) + _scene_specs(stream) + [
            pl.BlockSpec(memory_space=pltpu.HBM if stream else pltpu.VMEM)
        ] + extra_specs,
        out_specs=[block] * 15,
        scratch_shapes=scratch,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(o.x, o.y, o.z, d.x, d.y, d.z, cbox, cmeta, tri, attr, *extra_in)
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
    jax.jit,
    static_argnames=(
        "leaf_size", "interpret", "stack_depth", "dual", "compressed",
        "stream", "counters", "npop", "nleaf", "sort",
        "adaptive", "smem_meta",
    ),
)
def occluded_tiles(
    cbox, cmeta, tri, o: Vec3, d: Vec3, max_dist2, leaf_size: int,
    interpret: bool = False, stack_depth: int = STACK_DEPTH,
    dual: bool = False, compressed: bool = False, stream: bool = False,
    counters: bool = False, cmat=None, npop: int = 2, nleaf: int = 0,
    adaptive: bool = False, sort: bool = True,
    smem_meta: "bool | None" = None,
):
    """Any-hit occlusion over tiled rays: planes shaped (ntiles*8, 128).

    smem_meta as in closest_tiles (None = auto; SMEM mirror of the node
    meta table, bit-identical).

    sort=False pushes children UNSORTED (valid for any-hit: the blocked
    result is push-order-independent). Measured both ways in round 4:
    it wins on FORWARD shadow rays (-2/-8.5/-3.6% on b0/b1/b2,
    metrics/bench_occl_nosort.json) but LOSES on the production
    light-origin reversed-shadow frame (fused 246.0 vs 228.5 ms) —
    with one shared packet origin, near-first order finds the blocker
    early and triggers the all-blocked exit sooner, which outweighs the
    saved sort network. Default stays sorted; the knob remains for
    forward-shadow workloads (fast_light=False paths).

    counters=True also returns an (ntiles, 7) int32 array per packet:
    dual path — (inner_iters, leaf_iters, pad_slots, dead_pops,
    leaf_group_pops, inner_slots, leaf_slots) where *_slots sum the
    executed visit widths (adaptive-aware; the roofline's exact work
    units); streamed path — (inner_iters, leaf_group_evals,
    sync_fetches, block_fills, 0, 0, 0)."""
    rows = o.x.shape[0]
    assert o.x.shape == (rows, LANES) and rows % SUBLANES == 0
    ntiles = rows // SUBLANES
    arity = {16: 2, 32: 4, 64: 8}[cbox.shape[1]]
    assert not (compressed and arity < 4), "bf16 rows need bvh_width >= 4"
    assert not (stream and arity < 4), "streaming needs bvh_width >= 4"
    assert not (counters and not stream
                and not (dual and arity >= 4)), \
        "counters need the streamed or dual-pop kernels"
    assert npop in (2, 4, 8, 16) and (
        npop == 2 or (dual and arity >= 4)
    ), "wide-pop needs the dual-pop kernels (bvh_width >= 4)"
    # sort=False is only threaded through the wide-pop dual kernels; the
    # streamed kernel and the npop=2 _dual_inner_visit always sort. Fail
    # loudly rather than silently measuring the sorted schedule
    # (ADVICE r4: a sort=False caller on those paths got sorted timings).
    assert sort or (dual and arity >= 4 and npop > 2 and not stream), \
        "sort=False requires the wide-pop dual kernels (npop > 2, not stream)"
    out_shape = [jax.ShapeDtypeStruct((rows, LANES), jnp.int32)]
    if counters:
        out_shape.append(jax.ShapeDtypeStruct((rows, LANES), jnp.int32))
    # MXU leaves need the dual-pop NON-streamed kernels (see
    # closest_tiles); streaming always uses the VPU leaf.
    mxu = cmat is not None and dual and arity >= 4 and not stream \
        and leaf_size in (4, SUBLANES)
    smem_meta, smem_in, smem_specs = _smem_meta_setup(
        cmeta, smem_meta, arity, dual=dual, stream=stream
    )
    extra_in = []
    extra_specs = []
    if mxu:
        extra_in = [cmat]
        extra_specs = _MXU_SPECS
    extra_in = extra_in + smem_in
    extra_specs = extra_specs + smem_specs
    if stream:
        tri = _pad_stream_rows(tri)
        kernel = _occluded_stream_kernel(
            leaf_size, arity, compressed=compressed, npop=npop,
            adaptive=adaptive, counters=counters, smem_meta=smem_meta,
        )
        scratch = (
            [pltpu.SMEM((stack_depth,), jnp.int32)] * 2 + _stream_scratch(1)
        )
    elif dual and arity >= 4:
        kernel = _occluded_dual_kernel(
            leaf_size, arity, compressed=compressed, counters=counters,
            mxu=mxu, npop=npop, nleaf=nleaf or (default_nleaf(npop, leaf_size) if mxu else 2),
            adaptive=adaptive, sort=sort, smem_meta=smem_meta,
        )
        scratch = [
            pltpu.SMEM((stack_depth,), jnp.int32),
            pltpu.SMEM((stack_depth,), jnp.int32),
        ]
        if mxu:
            scratch = scratch + [_RMAT_SCRATCH]
    else:
        kernel = (
            _occluded4_kernel(leaf_size, arity, compressed) if arity >= 4
            else _occluded_kernel(leaf_size)
        )
        scratch = [pltpu.SMEM((stack_depth,), jnp.int32)]
    outs = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        out_shape=out_shape,
        in_specs=_ray_specs(7) + _scene_specs(stream) + extra_specs,
        out_specs=[pl.BlockSpec(
            (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        )] * len(out_shape),
        scratch_shapes=scratch,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(o.x, o.y, o.z, d.x, d.y, d.z, max_dist2, cbox, cmeta, tri, *extra_in)
    if counters:
        cnt = outs[1].reshape(ntiles, SUBLANES, LANES)[:, :7, 0]
        return outs[0].astype(bool), cnt
    return outs[0].astype(bool)


def make_tracer(packed_dev, leaf_size: int, interpret: bool = False, ds=None,
                stack_depth: int = STACK_DEPTH, dual: bool = False,
                compressed: bool = False, stream: bool = False,
                npop: int = 2,
                adaptive: bool = False):
    """(closest, occluded) over flat (R,) ray planes, R % 1024 == 0.

    packed_dev: (cbox, cmeta, tri[, attr][, cmi]) device arrays from a
    PackedBVH. With the `attr` array, closest returns HitFull (surface
    attributes resolved in-kernel — no shading gathers). With the trailing
    cmi interleaved-bf16 C-matrix table, leaves are evaluated on the MXU
    (dual-pop kernels only). Pass `ds` to extend with the dense sphere
    post-pass (ops/spheres.py). `stack_depth` should come from
    required_stack_depth(flat.depth, arity).
    """
    cmat = None
    if len(packed_dev) >= 5:
        cmat = packed_dev[-1]
        packed_dev = packed_dev[:-1]
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
                stack_depth=stack_depth, dual=dual, compressed=compressed,
                stream=stream, cmat=cmat, npop=npop,
                adaptive=adaptive,
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
            dual=dual, compressed=compressed, stream=stream, cmat=cmat,
            npop=npop, adaptive=adaptive,
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
            dual=dual, compressed=compressed, stream=stream, cmat=cmat,
            npop=npop, adaptive=adaptive,
        )
        return blocked.reshape(R)

    if ds is not None:
        from .spheres import wrap_tracer

        return wrap_tracer(ds, closest, occluded)
    return closest, occluded
