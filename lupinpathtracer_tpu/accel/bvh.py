"""Binned-SAH BVH builder (host, numpy).

TPU-native rebuild of the reference's per-mesh BLAS builder
(data_structures.rs:196-527: build_bvh / bvh_split / choose_split /
node_cost). Same algorithm family — binned SAH over centroid bounds with
half-area cost, iterative splitting, in-place triangle reordering so leaves
address contiguous ranges — but restructured for TPU traversal:

- The reference builds one BVH per mesh and walks TLAS->BLAS stacks per
  GPU thread. Here the default is ONE world-space BVH over instance-expanded
  triangles, so traversal needs no per-lane instance transforms (gathers of
  3x4 matrices per step would dominate on the VPU). Two-level traversal is
  kept for scenes where instancing makes expansion too large.
- Leaves are capped at a fixed size so the device traversal can gather a
  static-shaped block of triangles per leaf visit.
- Node layout is SoA (aabb_min/aabb_max/first-or-begin/count), the exact
  field semantics of the reference's 32-byte BvhNode (renderer.rs:225-237):
  count == 0 means internal node with children at (first, first+1).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BVH_MAX_DEPTH = 25  # renderer.rs:298
NUM_BINS = 8  # reference uses 5 (data_structures.rs:366); 8 is a better fit
# for vectorized host binning and costs the same asymptotically.


@dataclass
class BvhArrays:
    """SoA node arrays + the triangle permutation applied at build time."""

    aabb_min: np.ndarray  # (N,3) f32
    aabb_max: np.ndarray  # (N,3) f32
    first_or_begin: np.ndarray  # (N,) i32: first child if internal, tri begin if leaf
    tri_count: np.ndarray  # (N,) i32: 0 for internal nodes
    order: np.ndarray  # (T,) i32 permutation: new position -> old triangle index
    depth: int


def _half_area(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    d = np.maximum(hi - lo, 0.0)
    return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0]


def build_bvh(
    tri_lo: np.ndarray,
    tri_hi: np.ndarray,
    max_leaf_size: int = 4,
    max_depth: int = BVH_MAX_DEPTH,
) -> BvhArrays:
    """Build a binary binned-SAH BVH over triangle AABBs.

    tri_lo/tri_hi: (T,3) per-triangle bounds. Returns node arrays plus the
    triangle permutation (data_structures.rs reorders indices in place via
    swap_tris :502-527; we return the permutation and let the caller reorder
    its SoA triangle streams once).
    """

    tri_lo = np.asarray(tri_lo, np.float32)
    tri_hi = np.asarray(tri_hi, np.float32)
    T = tri_lo.shape[0]
    if T > 0:
        # Production path: native binned-SAH builder (accel/native). The
        # numpy implementation below is the reference/fallback.
        try:
            from . import native

            if native.available():
                nmin, nmax, nfirst, ncount, order, depth = native.build_bvh_native(
                    tri_lo, tri_hi, max_leaf_size, max_depth
                )
                return BvhArrays(
                    aabb_min=nmin,
                    aabb_max=nmax,
                    first_or_begin=nfirst,
                    tri_count=ncount,
                    order=order,
                    depth=depth,
                )
        except Exception:
            pass
    if T == 0:
        return BvhArrays(
            aabb_min=np.zeros((1, 3), np.float32),
            aabb_max=np.zeros((1, 3), np.float32),
            first_or_begin=np.zeros(1, np.int32),
            tri_count=np.zeros(1, np.int32),
            order=np.zeros(0, np.int32),
            depth=1,
        )

    centroids = (tri_lo + tri_hi) * 0.5
    order = np.arange(T, dtype=np.int64)

    cap = 2 * T + 1
    n_min = np.empty((cap, 3), np.float32)
    n_max = np.empty((cap, 3), np.float32)
    n_first = np.zeros(cap, np.int32)
    n_count = np.zeros(cap, np.int32)
    num_nodes = 1
    max_seen_depth = 1

    n_min[0] = tri_lo.min(axis=0)
    n_max[0] = tri_hi.max(axis=0)
    n_first[0] = 0
    n_count[0] = T

    # Iterative splitting with an explicit stack (bvh_split :237-325).
    stack = [(0, 0, T, 1)]  # (node, begin, end, depth)
    while stack:
        node, begin, end, depth = stack.pop()
        count = end - begin
        max_seen_depth = max(max_seen_depth, depth)
        if count <= max_leaf_size or depth >= max_depth:
            n_first[node] = begin
            n_count[node] = count
            continue

        idx = order[begin:end]
        cen = centroids[idx]
        lo = tri_lo[idx]
        hi = tri_hi[idx]

        # Binned SAH over refined centroid bounds (choose_split :366-466).
        c_lo = cen.min(axis=0)
        c_hi = cen.max(axis=0)
        extent = c_hi - c_lo
        axis = int(np.argmax(extent))
        if extent[axis] <= 0.0:
            # Degenerate: all centroids identical -> median split.
            mid = begin + count // 2
        else:
            scale = NUM_BINS / extent[axis]
            bins = np.minimum(
                ((cen[:, axis] - c_lo[axis]) * scale).astype(np.int32), NUM_BINS - 1
            )
            counts = np.bincount(bins, minlength=NUM_BINS)
            b_lo = np.full((NUM_BINS, 3), np.inf, np.float32)
            b_hi = np.full((NUM_BINS, 3), -np.inf, np.float32)
            for b in range(NUM_BINS):
                m = bins == b
                if counts[b]:
                    b_lo[b] = lo[m].min(axis=0)
                    b_hi[b] = hi[m].max(axis=0)
            # Prefix/suffix sweeps for left/right SAH cost (node_cost :468-475:
            # cost = half_area * tri_count).
            pre_lo = np.minimum.accumulate(b_lo, axis=0)
            pre_hi = np.maximum.accumulate(b_hi, axis=0)
            suf_lo = np.minimum.accumulate(b_lo[::-1], axis=0)[::-1]
            suf_hi = np.maximum.accumulate(b_hi[::-1], axis=0)[::-1]
            pre_cnt = np.cumsum(counts)
            left_cost = _half_area(pre_lo[:-1], pre_hi[:-1]) * pre_cnt[:-1]
            right_cost = _half_area(suf_lo[1:], suf_hi[1:]) * (T_node := count - pre_cnt[:-1])
            cost = left_cost + right_cost
            valid = (pre_cnt[:-1] > 0) & (T_node > 0)
            if not valid.any():
                mid = begin + count // 2
            else:
                cost = np.where(valid, cost, np.inf)
                best = int(np.argmin(cost))
                left_mask = bins <= best
                # Stable partition keeps construction deterministic.
                left_idx = idx[left_mask]
                right_idx = idx[~left_mask]
                order[begin : begin + left_idx.size] = left_idx
                order[begin + left_idx.size : end] = right_idx
                mid = begin + left_idx.size
        if mid == begin or mid == end:
            mid = begin + count // 2

        left = num_nodes
        right = num_nodes + 1
        num_nodes += 2
        n_first[node] = left
        n_count[node] = 0

        li = order[begin:mid]
        ri = order[mid:end]
        n_min[left] = tri_lo[li].min(axis=0)
        n_max[left] = tri_hi[li].max(axis=0)
        n_min[right] = tri_lo[ri].min(axis=0)
        n_max[right] = tri_hi[ri].max(axis=0)
        stack.append((right, mid, end, depth + 1))
        stack.append((left, begin, mid, depth + 1))

    return BvhArrays(
        aabb_min=n_min[:num_nodes].copy(),
        aabb_max=n_max[:num_nodes].copy(),
        first_or_begin=n_first[:num_nodes].copy(),
        tri_count=n_count[:num_nodes].copy(),
        order=order.astype(np.int32),
        depth=max_seen_depth,
    )


def tri_bounds(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray):
    """Per-triangle AABBs (base.rs compute_tri_bounds)."""

    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    return lo.astype(np.float32), hi.astype(np.float32)


def sah_cost(bvh: BvhArrays) -> float:
    """Mean SAH traversal cost estimate (for tests/diagnostics)."""

    root_area = _half_area(bvh.aabb_min[0], bvh.aabb_max[0])
    if root_area <= 0:
        return 0.0
    areas = _half_area(bvh.aabb_min, bvh.aabb_max) / root_area
    leaf = bvh.tri_count > 0
    return float((areas * np.where(leaf, bvh.tri_count, 1)).sum())
