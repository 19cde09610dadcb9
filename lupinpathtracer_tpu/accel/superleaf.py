"""Superleaf (two-level wavefront) decomposition of the world BVH.

The reference walks its BVH with one independent thread per ray
(bvh_custom.wgsl:195-288). A TPU has no per-lane control flow or gathers,
so the world BVH is re-shaped into the structure the hardware can traverse:

- The tree is CUT into "superleaves": maximal subtrees covering at most
  `stride` triangles. Each superleaf's triangles are repacked into a
  fixed-stride, 128-aligned block of the world-triangle soup, so a
  (ray, superleaf) pair is one dense MXU intersection job
  (kernels/pallas_intersect.py) addressed purely by the superleaf id.
- A small TOP TREE is rebuilt over the superleaf AABBs (binned SAH,
  leaf size 1). It is condensed into a row table where each internal
  node's row holds BOTH children's AABBs and child references, so the
  traversal kernel fetches everything it needs for one step with a single
  exact one-hot matmul against the VMEM-resident table
  (kernels/pallas_bvh.py) — no gathers anywhere on the hot path.

AABBs in the row table are rounded OUTWARD to bfloat16 so the table can be
consumed by a bf16 one-hot matmul without losing conservativeness. Child
references are split into two 8-bit-exact factors (hi*256 + lo) because
bf16 cannot represent integers above 256 exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .bvh import BvhArrays, build_bvh

# Row-table column layout (see kernels/pallas_bvh.py). The top tree is
# EIGHT-WIDE: one row holds all 8 children of an internal node, because the
# traversal kernel's per-step cost is dominated by the (TOP_COLS, rows) @
# (rows, RB) one-hot fetch — an 8-ary collapse cuts internal rows ~7x AND
# node pops ~3x (v5e: the binary walk spent ~10 ms/round on ~25 lockstep
# steps of a (768, 2048) one-hot; the wide walk needs ~4 steps against a
# (128, 2048) one-hot). Child references are THREE 8-bit-exact bf16 factors
# (h2*65536 + hi*256 + lo), addressing up to 16.7M rows/leaves. Empty child
# slots carry an inverted (miss-everything) AABB.
TOP_FAN = 8
CH_STRIDE = 10  # per-child column group
CH_LO = slice(0, 3)  # within the group
CH_HI = slice(3, 6)
CH_ISLEAF = 6
CH_H2 = 7
CH_HI8 = 8
CH_LO8 = 9
TOP_COLS = TOP_FAN * CH_STRIDE  # 80


# Sub-superleaf granularity: each superleaf's triangle block is split into
# NSUB chunks with their own AABBs so the packet kernel can skip chunks no
# ray in the block wants (kernels/pallas_packet.py).
NSUB = 8


@dataclass
class Superleaves:
    """Host-side result of the decomposition."""

    order: np.ndarray  # (Tp,) i32: padded-soup position -> original tri id
    valid: np.ndarray  # (Tp,) bool: False on padding rows
    bvhpos_to_padded: np.ndarray  # (T,) i32: BVH-order position -> padded pos
    sl_count: int
    stride: int
    sl_tri_count: np.ndarray  # (n_sl,) i32 real tris per superleaf
    top_tab: np.ndarray  # (rows_pad, TOP_COLS) f32 (bf16-rounded payload)
    top_rows: int  # real internal rows (<= rows_pad)
    top_root_is_leaf: bool  # single-superleaf scene: no internal rows
    top_depth: int
    sl_lo: np.ndarray = None  # (n_sl, 3) superleaf AABBs (object space)
    sl_hi: np.ndarray = None
    # (n_sl, NSUB, 8) f32 [lo3, hi3, used, 0] sub-chunk AABBs; None unless
    # triangle bounds were provided to build_superleaves.
    sl_sub: np.ndarray = None


def _bf16_down(x: np.ndarray) -> np.ndarray:
    """Largest bf16 value <= x (round toward -inf)."""

    x = np.asarray(x, np.float32)
    b = x.view(np.uint32)
    trunc = (b & np.uint32(0xFFFF0000)).view(np.float32)
    # Truncation rounds toward zero: correct for x >= 0, may round UP for
    # x < 0 -> step one bf16 ulp toward -inf where trunc > x.
    need = trunc > x
    step = ((b & np.uint32(0xFFFF0000)) + np.uint32(0x00010000)).view(np.float32)
    neg = x < 0
    out = np.where(need & neg, step, trunc)
    # For positive x, trunc <= x always; need only holds for negatives.
    return out.astype(np.float32)


def _bf16_up(x: np.ndarray) -> np.ndarray:
    """Smallest bf16 value >= x (round toward +inf)."""

    return -_bf16_down(-np.asarray(x, np.float32))


def _subtree_ranges(bvh: BvhArrays) -> tuple[np.ndarray, np.ndarray]:
    """Per-node [begin, end) triangle range. Children partition the parent's
    range in both builders (accel/bvh.py, accel/native/builders.cpp), so the
    range of any subtree is contiguous."""

    n = bvh.first_or_begin.shape[0]
    begin = np.zeros(n, np.int64)
    end = np.zeros(n, np.int64)
    # Post-order accumulate with an explicit stack.
    stack = [(0, False)]
    while stack:
        node, processed = stack.pop()
        if bvh.tri_count[node] > 0:
            begin[node] = bvh.first_or_begin[node]
            end[node] = begin[node] + bvh.tri_count[node]
            continue
        l = int(bvh.first_or_begin[node])
        r = l + 1
        if processed:
            begin[node] = begin[l]
            end[node] = end[r]
        else:
            stack.append((node, True))
            stack.append((l, False))
            stack.append((r, False))
    return begin, end


def pick_stride(num_tris: int, max_top_rows: int = 1024) -> int:
    """Smallest power-of-two stride (>=256) keeping the top table small.

    The traversal kernel pays one (18, rows)@(rows, RB) one-hot fetch
    matmul per lockstep step (transposed so rays ride the lanes), so rows
    are cheap up to ~768; superleaf triangle tests still dominate beyond
    that. v5e sweep on arealights1 (456k tris): stride 1024 / 669 rows beat
    2048 / 335 by 8% and 512 / 1319 by 11% (with WF_Q=8)."""

    stride = 256
    while num_tris / stride > max_top_rows * 0.75:
        stride *= 2
    return stride


def build_superleaves(
    bvh: BvhArrays, num_tris: int, stride: int | None = None,
    tri_lo: np.ndarray | None = None, tri_hi: np.ndarray | None = None,
) -> Superleaves:
    if stride is None:
        stride = pick_stride(num_tris)
    # The packet kernel slices sub-chunks on the lane dimension; both the
    # stride and the chunk size must keep full-lane (128) alignment.
    assert stride % 128 == 0, f"superleaf stride {stride} not 128-aligned"

    begin, end = _subtree_ranges(bvh)

    # Cut: maximal subtrees with <= stride triangles (DFS, left first, so
    # superleaves come out in ascending tri-range order).
    sl_nodes: list[int] = []
    stack = [0]
    while stack:
        node = stack.pop()
        size = end[node] - begin[node]
        if size <= stride or bvh.tri_count[node] > 0:
            sl_nodes.append(node)
            continue
        l = int(bvh.first_or_begin[node])
        stack.append(l + 1)
        stack.append(l)
    n_sl = len(sl_nodes)

    # Repacked soup order: superleaf j's tris at [j*stride, j*stride+len).
    Tp = n_sl * stride
    order = np.zeros(Tp, np.int64)
    valid = np.zeros(Tp, bool)
    bvhpos_to_padded = np.zeros(num_tris, np.int64)
    counts = np.zeros(n_sl, np.int32)
    lo = np.empty((n_sl, 3), np.float32)
    hi = np.empty((n_sl, 3), np.float32)
    for j, node in enumerate(sl_nodes):
        b, e = int(begin[node]), int(end[node])
        c = e - b
        # A depth-capped mesh-BVH leaf can exceed the stride; writing it
        # would silently corrupt the NEXT superleaf's block. Fail loudly.
        assert c <= stride, (
            f"superleaf {j}: depth-capped BVH leaf holds {c} tris > "
            f"stride {stride}; raise sl_stride_opt"
        )
        counts[j] = c
        order[j * stride : j * stride + c] = bvh.order[b:e]
        valid[j * stride : j * stride + c] = True
        bvhpos_to_padded[b:e] = np.arange(j * stride, j * stride + c)
        # Padding rows repeat the subtree's first triangle id so downstream
        # tables stay in-range; `valid` masks them out of the W matrix.
        order[j * stride + c : (j + 1) * stride] = bvh.order[b]
        lo[j] = bvh.aabb_min[node]
        hi[j] = bvh.aabb_max[node]

    # Sub-chunk AABBs for the packet kernel's masked mini-visits. Padding
    # rows repeat the subtree's first triangle id, so their bounds only
    # conservatively inflate a chunk; fully-empty chunks carry an inverted
    # box + used = -1.
    sl_sub = None
    if tri_lo is not None:
        # Chunks stay >= 128 triangles AND a 128-multiple so the kernel's
        # lane-dim sub-slices keep full-lane alignment (stride=1152 would
        # otherwise give cs=144 and mis-tile the packet kernel's SPB
        # slicing): largest nsub <= NSUB with stride % (128 * nsub) == 0.
        nsub = max(
            n for n in range(1, min(NSUB, stride // 128) + 1)
            if stride % (128 * n) == 0
        )
        cs = stride // nsub
        lo_r = tri_lo[order].reshape(n_sl, nsub, cs, 3)
        hi_r = tri_hi[order].reshape(n_sl, nsub, cs, 3)
        vmask = valid.reshape(n_sl, nsub, cs)
        used = vmask.any(axis=2)
        big = np.float32(3e38)
        lo_m = np.where(vmask[..., None], lo_r, big).min(axis=2)
        hi_m = np.where(vmask[..., None], hi_r, -big).max(axis=2)
        sl_sub = np.zeros((n_sl, nsub, 8), np.float32)
        sl_sub[..., 0:3] = np.where(used[..., None], lo_m, big)
        sl_sub[..., 3:6] = np.where(used[..., None], hi_m, -big)
        sl_sub[..., 6] = np.where(used, 1.0, -1.0)

    # Top tree over superleaf AABBs.
    tab, rows, root_is_leaf, depth = build_top_table(lo, hi)
    if root_is_leaf:
        return Superleaves(
            order=order.astype(np.int32),
            valid=valid,
            bvhpos_to_padded=bvhpos_to_padded.astype(np.int32),
            sl_count=1,
            stride=stride,
            sl_tri_count=counts,
            top_tab=tab,
            top_rows=0,
            top_root_is_leaf=True,
            top_depth=1,
            sl_lo=lo,
            sl_hi=hi,
            sl_sub=sl_sub,
        )

    return Superleaves(
        order=order.astype(np.int32),
        valid=valid,
        bvhpos_to_padded=bvhpos_to_padded.astype(np.int32),
        sl_count=n_sl,
        stride=stride,
        sl_tri_count=counts,
        top_tab=tab,
        top_rows=rows,
        top_root_is_leaf=False,
        top_depth=depth,
        sl_lo=lo,
        sl_hi=hi,
        sl_sub=sl_sub,
    )


def build_top_table(lo: np.ndarray, hi: np.ndarray):
    """Condensed EIGHT-WIDE top-tree row table over N leaf AABBs.

    The binary SAH tree from accel/bvh.py is collapsed into TOP_FAN-ary
    nodes (repeatedly expanding the child subtree with the most leaves —
    the standard BVH2->BVH8 collapse), then condensed into rows holding all
    8 children's AABBs + refs. Returns (tab (rows_pad, TOP_COLS) f32 with
    bf16-representable bounds, rows, root_is_leaf, depth). Leaf references
    encode the index into the given AABB list — superleaf ids for
    single-level scenes, global (instance x mesh-superleaf) ids for the
    two-level path. `depth` is the WIDE depth (stack bound =
    (TOP_FAN-1)*depth + TOP_FAN + 1, see kernels/intersect.py)."""

    n = lo.shape[0]
    # max_leaf_size=1 MUST actually hold: a depth-capped fat leaf would
    # encode only its first entry's ref and silently drop the rest from
    # traversal. The mesh BVH's reference depth cap (25) does not apply
    # to this internal build — SAH on spatially skewed AABB sets (e.g.
    # exponentially spaced instances) peels one child per level and blows
    # past 25 long before the 2^24 encoding limit.
    top = build_bvh(lo, hi, max_leaf_size=1, max_depth=max(64, n))
    if n == 1:
        return np.zeros((128, TOP_COLS), np.float32), 0, True, 1
    assert n < (1 << 24), f"top table: {n} leaves exceeds the 3-factor encoding"
    assert (top.tri_count <= 1).all(), (
        "top build produced a fat leaf — entries would be dropped"
    )

    leaf_count = np.where(top.tri_count > 0, 1, 0).astype(np.int64)
    # Post-order subtree leaf counts (for the largest-first collapse).
    order_stack = [(0, False)]
    while order_stack:
        m, processed = order_stack.pop()
        if top.tri_count[m] > 0:
            continue
        l = int(top.first_or_begin[m])
        if processed:
            leaf_count[m] = leaf_count[l] + leaf_count[l + 1]
        else:
            order_stack.append((m, True))
            order_stack.append((l, False))
            order_stack.append((l + 1, False))

    def collapse(b: int) -> list[int]:
        """Children (binary node ids) of the wide node rooted at b.

        Hybrid expansion: an internal child whose WHOLE subtree fits in
        the remaining slots is dissolved (its leaves join this row);
        otherwise the LARGEST child is split for balance. Pure
        largest-first strands every small internal as a 2-3-child row
        (46% slot fill, 37k rows at a 100k-leaf field); pure
        smallest-first packs rows but leaves the big child as a spine
        (depth 6 -> 15). Row count drives top-tree traversal pops and the
        geo/refs table budgets that gate packet eligibility; depth drives
        the per-ray stack bound."""

        kids = [int(top.first_or_begin[b]), int(top.first_or_begin[b]) + 1]
        while len(kids) < TOP_FAN:
            slots = TOP_FAN - len(kids)
            best, best_n = -1, 0
            fit, fit_n = -1, None
            for i, k in enumerate(kids):
                if top.tri_count[k] != 0:
                    continue
                lc = int(leaf_count[k])
                if lc - 1 <= slots and (fit_n is None or lc < fit_n):
                    fit, fit_n = i, lc  # dissolves fully in this row
                if lc > best_n:
                    best, best_n = i, lc
            pick = fit if fit >= 0 else best
            if pick < 0:
                break
            k = kids.pop(pick)
            kids.append(int(top.first_or_begin[k]))
            kids.append(int(top.first_or_begin[k]) + 1)
        return kids

    # DFS over wide nodes; row ids in discovery order (root = 0).
    rows_list: list[list[int]] = []
    row_of: dict[int, int] = {}
    depth_of: dict[int, int] = {0: 1}
    stack = [0]
    depth = 1
    while stack:
        b = stack.pop()
        row_of[b] = len(rows_list)
        kids = collapse(b)
        rows_list.append(kids)
        d = depth_of[b]
        for k in kids:
            if top.tri_count[k] == 0:
                depth_of[k] = d + 1
                depth = max(depth, d + 1)
                stack.append(k)

    rows = len(rows_list)
    tab = np.zeros((rows, TOP_COLS), np.float32)
    # Empty slots: ISLEAF = -1 marks them; the kernel forces their slab t
    # to F32_MAX before ordering (an "inverted AABB" does NOT miss under
    # the slab formulation — t_near=-inf, t_far=+inf passes).
    for c in range(TOP_FAN):
        tab[:, c * CH_STRIDE + CH_LO.start : c * CH_STRIDE + CH_LO.stop] = 3e38
        tab[:, c * CH_STRIDE + CH_HI.start : c * CH_STRIDE + CH_HI.stop] = -3e38
        tab[:, c * CH_STRIDE + CH_ISLEAF] = -1.0
    # Vectorized fill (a per-(row, child) Python loop with scalar bf16
    # rounding dominated build time past ~100k leaves).
    ri = np.concatenate(
        [np.full(len(k), i, np.int64) for i, k in enumerate(rows_list)]
    )
    ci = np.concatenate(
        [np.arange(len(k), dtype=np.int64) for k in rows_list]
    )
    ch = np.concatenate([np.asarray(k, np.int64) for k in rows_list])
    lo_b = _bf16_down(top.aabb_min[ch])
    hi_b = _bf16_up(top.aabb_max[ch])
    is_leaf = top.tri_count[ch] > 0
    # -1 sentinel (the replaced per-child loop raised KeyError here): an
    # internal child missing from row_of must fail the build loudly — a
    # silently-zero child ref points back at the root and can cycle the
    # device-side traversal stack.
    row_of_arr = np.full(top.tri_count.shape[0], -1, np.int64)
    row_of_arr[np.fromiter(row_of.keys(), np.int64, len(row_of))] = (
        np.fromiter(row_of.values(), np.int64, len(row_of))
    )
    assert (is_leaf | (row_of_arr[ch] >= 0)).all(), (
        "internal top-tree child with no assigned row"
    )
    # Leaf-ref read clamped: internal children's first_or_begin is a node
    # id that may exceed the order table; the value is discarded by where.
    fob = np.minimum(
        top.first_or_begin[ch].astype(np.int64), top.order.shape[0] - 1
    )
    ref = np.where(is_leaf, top.order[fob].astype(np.int64), row_of_arr[ch])
    base = ci * CH_STRIDE
    for k in range(3):
        tab[ri, base + CH_LO.start + k] = lo_b[:, k]
        tab[ri, base + CH_HI.start + k] = hi_b[:, k]
    tab[ri, base + CH_ISLEAF] = np.where(is_leaf, 1.0, 0.0)
    tab[ri, base + CH_H2] = (ref // 65536).astype(np.float32)
    tab[ri, base + CH_HI8] = ((ref // 256) % 256).astype(np.float32)
    tab[ri, base + CH_LO8] = (ref % 256).astype(np.float32)

    rows_pad = max(128, -(-rows // 128) * 128)
    if rows_pad != rows:
        pad = np.zeros((rows_pad - rows, TOP_COLS), np.float32)
        # Padding rows are never selected (refs only ever point at real
        # rows); boxes stay at 0 -> degenerate.
        tab = np.concatenate([tab, pad], axis=0)
    return tab, rows, False, depth
