"""TLAS builder: agglomerative clustering over instance world AABBs.

TPU-native rebuild of build_tlas (data_structures.rs:545-692): greedily pair
the two best SAH matches until one root remains, then reverse so the root is
index 0; leaf iff left == 0; asserts depth < 50.

The primary traversal path flattens instances into one world BVH
(scene/flatten.py), which vectorizes better on the VPU than the reference's
per-thread TLAS->BLAS walk; this builder provides the two-level structure
for scenes where instance expansion would be prohibitive (massive
instancing), and for API parity.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core import math3d

TLAS_MAX_DEPTH = 50  # renderer.rs:300


@dataclass
class TlasArrays:
    """SoA TlasNode fields (renderer.rs:239-247): left == 0 marks a leaf."""

    aabb_min: np.ndarray  # (N,3)
    aabb_max: np.ndarray  # (N,3)
    left: np.ndarray  # (N,) i32
    right: np.ndarray  # (N,) i32
    instance_idx: np.ndarray  # (N,) i32
    depth: int


def _half_area(lo, hi):
    d = np.maximum(hi - lo, 0.0)
    return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0]


def instance_world_aabbs(scene_cpu) -> tuple[np.ndarray, np.ndarray]:
    """World-space AABB per instance (transform_aabb, base.rs:1113-1134)."""

    los, his = [], []
    for inst in scene_cpu.instances:
        mesh = scene_cpu.meshes[inst.mesh_idx]
        if mesh.positions.shape[0] == 0:
            los.append(np.zeros(3, np.float32))
            his.append(np.zeros(3, np.float32))
            continue
        lo = mesh.positions.min(axis=0)
        hi = mesh.positions.max(axis=0)
        wlo, whi = math3d.transform_aabb(inst.frame, lo, hi)
        los.append(wlo)
        his.append(whi)
    return np.asarray(los, np.float32), np.asarray(his, np.float32)


def build_tlas(inst_lo: np.ndarray, inst_hi: np.ndarray) -> TlasArrays:
    """Agglomerative SAH clustering (data_structures.rs:545-641): repeatedly
    merge the pair with the smallest merged half-area. The reference scans
    for the best match per step (tlas_find_best_match :670-692); same
    strategy here with a vectorized inner scan."""

    n = inst_lo.shape[0]
    if n == 0:
        return TlasArrays(
            aabb_min=np.zeros((1, 3), np.float32),
            aabb_max=np.zeros((1, 3), np.float32),
            left=np.zeros(1, np.int32),
            right=np.zeros(1, np.int32),
            instance_idx=np.zeros(1, np.int32),
            depth=1,
        )

    # Node storage built leaf-first; reversed at the end so root = 0
    # (data_structures.rs:628-636).
    node_lo = [inst_lo[i].copy() for i in range(n)]
    node_hi = [inst_hi[i].copy() for i in range(n)]
    node_left = [0] * n
    node_right = [0] * n
    node_inst = list(range(n))

    active = list(range(n))  # indices into node arrays
    while len(active) > 1:
        lo_a = np.asarray([node_lo[i] for i in active])
        hi_a = np.asarray([node_hi[i] for i in active])
        best = (np.inf, 0, 1)
        for ai in range(len(active)):
            merged_lo = np.minimum(lo_a[ai], lo_a)
            merged_hi = np.maximum(hi_a[ai], hi_a)
            cost = _half_area(merged_lo, merged_hi)
            cost[ai] = np.inf
            bj = int(np.argmin(cost))
            if cost[bj] < best[0]:
                best = (float(cost[bj]), ai, bj)
        _, ai, bj = best
        i, j = active[ai], active[bj]
        node_lo.append(np.minimum(node_lo[i], node_lo[j]))
        node_hi.append(np.maximum(node_hi[i], node_hi[j]))
        node_left.append(i)
        node_right.append(j)
        node_inst.append(0)
        new = len(node_lo) - 1
        active = [a for a in active if a not in (i, j)] + [new]

    total = len(node_lo)
    # Reverse index mapping: node k -> total-1-k, so the root lands at 0.
    remap = lambda k: 0 if k == 0 else total - 1 - k  # noqa: E731

    aabb_min = np.zeros((total, 3), np.float32)
    aabb_max = np.zeros((total, 3), np.float32)
    left = np.zeros(total, np.int32)
    right = np.zeros(total, np.int32)
    inst = np.zeros(total, np.int32)
    for k in range(total):
        nk = total - 1 - k
        aabb_min[k] = node_lo[nk]
        aabb_max[k] = node_hi[nk]
        # children indices remapped; leaves keep left == 0
        if node_left[nk] == 0 and node_right[nk] == 0 and nk < n:
            left[k] = 0
            right[k] = 0
            inst[k] = node_inst[nk]
        else:
            left[k] = total - 1 - node_left[nk]
            right[k] = total - 1 - node_right[nk]

    depth = _compute_depth(left, right)
    assert depth < TLAS_MAX_DEPTH, "TLAS too deep (data_structures.rs:638)"
    return TlasArrays(
        aabb_min=aabb_min,
        aabb_max=aabb_max,
        left=left,
        right=right,
        instance_idx=inst,
        depth=depth,
    )


def _compute_depth(left, right) -> int:
    """compute_tlas_depth (data_structures.rs:643-668)."""

    depth = 0
    stack = [(0, 1)]
    seen = 0
    while stack:
        node, d = stack.pop()
        depth = max(depth, d)
        seen += 1
        assert seen <= 4 * len(left), "TLAS cycle"
        if left[node] != 0:
            stack.append((int(left[node]), d + 1))
            stack.append((int(right[node]), d + 1))
    return depth
