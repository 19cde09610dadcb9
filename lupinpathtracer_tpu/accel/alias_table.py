"""Alias tables for O(1) discrete sampling.

TPU-native rebuild of the reference's PBRT-4ed alias-table builder
(data_structures.rs:116-193) and the light scan (data_structures.rs:20-113).
Built on host with numpy; sampled on device with two uniforms + one gather
(see render/lights.py). Semantics match the reference exactly: for bin i,
keep i if u < alias_threshold else take bin.alias.
"""

from __future__ import annotations

import numpy as np


def build_alias_table(weights: np.ndarray):
    """Returns (prob, alias_threshold, alias) arrays, each len(weights).

    prob[i] is the normalized probability of outcome i; sampling draws a
    uniform bin then a uniform threshold test (data_structures.rs:116-193).
    Empty or all-zero weights return empty arrays.
    """

    weights = np.asarray(weights, np.float64).ravel()
    n = weights.size
    if n == 0:
        return (np.zeros(0, np.float32),) * 2 + (np.zeros(0, np.uint32),)
    total = weights.sum()
    if total == 0.0:
        return (np.zeros(0, np.float32),) * 2 + (np.zeros(0, np.uint32),)

    if n >= 4096:
        # Large tables (multi-megapixel environment maps) go through the
        # native builder; numpy below stays as reference/fallback.
        try:
            from . import native

            if native.available():
                return native.build_alias_table_native(weights.astype(np.float32))
        except Exception:
            pass

    prob = (weights / total).astype(np.float32)
    threshold = np.zeros(n, np.float32)
    alias = np.zeros(n, np.uint32)

    # Work lists over scaled probability estimates (prob * n), split into
    # under-full and over-full bins, matching the reference's Vec push/pop
    # order (LIFO) so tables are bit-identical. Implemented as preallocated
    # array stacks: the loop runs O(n) with scalar ops only (multi-megapixel
    # environment maps go through here).
    est = (prob.astype(np.float64) * n).astype(np.float32)
    under_mask = est < 1.0
    u_idx_arr = np.nonzero(under_mask)[0].astype(np.int64)
    o_idx_arr = np.nonzero(~under_mask)[0].astype(np.int64)
    # Stacks hold (estimate, index); initial content preserves push order 0..n.
    cap = n + 1
    u_est = np.empty(cap, np.float64)
    u_idx = np.empty(cap, np.int64)
    o_est = np.empty(cap, np.float64)
    o_idx = np.empty(cap, np.int64)
    u_top = u_idx_arr.size
    o_top = o_idx_arr.size
    u_est[:u_top] = est[u_idx_arr]
    u_idx[:u_top] = u_idx_arr
    o_est[:o_top] = est[o_idx_arr]
    o_idx[:o_top] = o_idx_arr

    while u_top and o_top:
        u_top -= 1
        o_top -= 1
        ue = float(u_est[u_top])
        ui = int(u_idx[u_top])
        oe = float(o_est[o_top])
        oi = int(o_idx[o_top])
        threshold[ui] = np.float32(ue)
        alias[ui] = oi
        excess = np.float32(np.float32(ue) + np.float32(oe) - np.float32(1.0))
        if excess < 1.0:
            u_est[u_top] = excess
            u_idx[u_top] = oi
            u_top += 1
        else:
            o_est[o_top] = excess
            o_idx[o_top] = oi
            o_top += 1

    # Float residue: bins whose estimate landed ~1.0 never alias
    # (data_structures.rs:177-190).
    if o_top:
        threshold[o_idx[:o_top]] = 1.0
        alias[o_idx[:o_top]] = 0
    if u_top:
        threshold[u_idx[:u_top]] = 1.0
        alias[u_idx[:u_top]] = 0

    return prob, threshold, alias


def sample_alias_table_host(prob, threshold, alias, u_bin, u_thresh):
    """Host-side sampling helper (mirrors pathtracer.wgsl:2770-2800); used by
    property tests. u_bin/u_thresh are uniforms in [0,1)."""

    n = prob.shape[0]
    idx = np.minimum((np.asarray(u_bin) * n).astype(np.int64), n - 1)
    take_alias = np.asarray(u_thresh) >= threshold[idx]
    return np.where(take_alias, alias[idx], idx).astype(np.int64)
