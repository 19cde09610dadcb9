"""TLAS builder structure tests (accel/tlas.py).

The builder mirrors the reference's agglomerative-clustering TLAS
(data_structures.rs:545-692). The production two-level traversal uses the
condensed top table (accel/superleaf.build_top_table) instead, but the
builder remains the API-parity construction of the reference's TlasNode
array; these tests pin its invariants."""

import numpy as np

from lupinpathtracer_tpu.accel import tlas as tlas_mod


def _random_boxes(rng, n):
    c = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    e = rng.uniform(0.1, 1.5, size=(n, 3)).astype(np.float32)
    return c - e, c + e


def test_tlas_structure(rng):
    n = 17
    lo, hi = _random_boxes(rng, n)
    t = tlas_mod.build_tlas(lo, hi)
    total = t.left.shape[0]
    assert total == 2 * n - 1
    assert t.depth < tlas_mod.TLAS_MAX_DEPTH

    # Walk from the root: every instance reached exactly once; every parent
    # AABB contains its children (left == 0 marks a leaf,
    # data_structures.rs:545-641).
    seen = []
    stack = [0]
    visited = 0
    while stack:
        k = stack.pop()
        visited += 1
        if t.left[k] == 0:
            seen.append(int(t.instance_idx[k]))
            continue
        for ch in (int(t.left[k]), int(t.right[k])):
            assert (t.aabb_min[k] <= t.aabb_min[ch] + 1e-5).all()
            assert (t.aabb_max[k] >= t.aabb_max[ch] - 1e-5).all()
            stack.append(ch)
    assert visited == total
    assert sorted(seen) == list(range(n))


def test_tlas_single_instance(rng):
    lo, hi = _random_boxes(rng, 1)
    t = tlas_mod.build_tlas(lo, hi)
    assert t.left.shape[0] == 1
    assert t.left[0] == 0 and t.instance_idx[0] == 0
