"""Pallas TPU wavefront two-level BVH traversal.

TPU-native replacement for the reference's per-thread BVH walk
(bvh_custom.wgsl:195-288). The reference gives every ray its own stack and
data-dependent loop on a SIMT GPU; a TPU has neither per-lane control flow
nor fast per-lane gathers, so the walk is decomposed into phases that map
onto the hardware (see accel/superleaf.py for the data structures):

Phase A (`top_traverse`) — masked wavefront traversal of the tiny top tree.
  The condensed row table (one row per internal node holding BOTH children's
  bf16 AABBs + child refs) lives in VMEM; a traversal step fetches a lane's
  row with an exact one-hot (RB, rows)@(rows, 18) bf16 matmul — the MXU *is*
  the gather unit. Each ray block runs its own while-loop (divergence is
  bounded per 1k-ray block, not globally), collects up to Q superleaf hits,
  and persists its stack/stack-pointer so traversal resumes next round with
  a tighter best_t.

Phase B (`pair_intersect`) — dense MXU intersection of (ray, superleaf)
  pairs. Pairs are grouped by superleaf (XLA argsort) into fixed blocks; the
  per-block superleaf id is a scalar-prefetch argument whose index_map picks
  the (4, 10, SP) slice of the padded-soup coefficient matrix, so each grid
  step is exactly the dense kernel of kernels/pallas_intersect.py run
  against one superleaf's triangle block.

The orchestration (rounds, pair building, per-ray reduction) lives in
kernels/intersect.py::closest_hit_wavefront.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.superleaf import (
    CH_H2,
    CH_HI,
    CH_HI8,
    CH_ISLEAF,
    CH_LO,
    CH_LO8,
    CH_STRIDE,
    TOP_COLS,
    TOP_FAN,
)

F32_MAX = 3.4028235e38

# Row-chunk bound for the top kernel's one-hot node fetch: (chunk, RB) bf16
# intermediates stay ~4 MB at RB=2048 (see _top_kernel.fetch_rows).
_FETCH_CHUNK = 1024
# Bin-chunk bound for the in-kernel demand histogram: (chunk, RB) i32
# compare intermediates stay ~8 MB (see _top_kernel's histogram).
_HIST_CHUNK = 1024


# ---------------------------------------------------------------------------
# Phase A: top-tree traversal
# ---------------------------------------------------------------------------


def _slab(rox, roy, roz, idx, idy, idz, fetch, base):
    """Ray/AABB slab test against fetched (TOP_COLS, RB) rows for the child
    group at column `base`; F32_MAX on miss (pathtracer.wgsl:2906-2918)."""

    lo_sl = CH_LO
    hi_sl = CH_HI
    lox = fetch[base + lo_sl.start]
    loy = fetch[base + lo_sl.start + 1]
    loz = fetch[base + lo_sl.start + 2]
    hix = fetch[base + hi_sl.start]
    hiy = fetch[base + hi_sl.start + 1]
    hiz = fetch[base + hi_sl.start + 2]
    tx1 = (lox - rox) * idx
    tx2 = (hix - rox) * idx
    ty1 = (loy - roy) * idy
    ty2 = (hiy - roy) * idy
    tz1 = (loz - roz) * idz
    tz2 = (hiz - roz) * idz
    t_far = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2), jnp.maximum(ty1, ty2)), jnp.maximum(tz1, tz2))
    t_near = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2), jnp.minimum(ty1, ty2)), jnp.minimum(tz1, tz2))
    ok = (t_far >= t_near) & (t_far > 0.0)
    return jnp.where(ok, t_near, F32_MAX)


def _decode_ref(fetch, base):
    """Child reference of the group at column `base`: >=0 internal row
    index, <0 encoded superleaf (-(sl+1)). Three 8-bit factors, each
    bf16-exact, address 16.7M rows."""

    rid = (
        fetch[base + CH_H2] * 65536.0
        + fetch[base + CH_HI8] * 256.0
        + fetch[base + CH_LO8]
    ).astype(jnp.int32)
    is_leaf = fetch[base + CH_ISLEAF] > 0.5
    return jnp.where(is_leaf, -rid - 1, rid)


def _top_kernel(
    tab_ref,
    rox_ref, roy_ref, roz_ref,
    rdx_ref, rdy_ref, rdz_ref,
    bt_ref,
    stack_in_ref, sp_in_ref,
    sl_ref, cnt_ref, stack_out_ref, sp_out_ref, *hist_aabb_refs,
    S, Q, NSLP,
):
    # NSLP == 0 disables the in-kernel histogram (output dropped entirely):
    # the (NSLP, RB) compare intermediates scale linearly with the global
    # superleaf count (~573 MB of VMEM at 70k instance-superleaves) — huge
    # two-level scenes take the caller's searchsorted fallback instead.
    if NSLP > 0:
        hist_ref, aabb_ref = hist_aabb_refs
    else:
        (aabb_ref,) = hist_aabb_refs
    def vec(ref):
        return ref[0].reshape(-1)  # (1, sub, 128) -> (RB,)

    rox, roy, roz = vec(rox_ref), vec(roy_ref), vec(roz_ref)
    rdx, rdy, rdz = vec(rdx_ref), vec(rdy_ref), vec(rdz_ref)
    best_t = vec(bt_ref)
    idx = 1.0 / rdx
    idy = 1.0 / rdy
    idz = 1.0 / rdz
    RB = rox.shape[0]
    ROWS = tab_ref.shape[1]
    tab = tab_ref[...]  # (TOP_COLS, ROWS) bf16 — transposed so the fetch
    # matmul is (18, ROWS) @ (ROWS, RB): rays ride the 128 lanes and the
    # MXU contracts over rows (the untransposed (RB, ROWS) @ (ROWS, 18)
    # form wastes 86% of the array on the 18-wide output).

    srow = jax.lax.broadcasted_iota(jnp.int32, (S, RB), 0)
    qrow = jax.lax.broadcasted_iota(jnp.int32, (Q, RB), 0)

    def fetch_rows(row):
        """Exact one-hot row fetch, (TOP_COLS, RB) = tab[:, row] per lane.
        The (ROWS, RB) one-hot intermediate scales with the tree size —
        28.9 MB at ~7k rows / RB=2048 (v5e scoped-VMEM OOM at 100k
        instance-superleaves) — so huge trees accumulate the fetch over
        row chunks bounded to ~4 MB each instead."""

        if ROWS <= _FETCH_CHUNK:
            col = jax.lax.broadcasted_iota(jnp.int32, (ROWS, RB), 0)
            oh = (col == row[None, :]).astype(jnp.bfloat16)
            return jnp.dot(tab, oh, preferred_element_type=jnp.float32)
        acc = jnp.zeros((tab.shape[0], RB), jnp.float32)
        for c0 in range(0, ROWS, _FETCH_CHUNK):
            ch = min(_FETCH_CHUNK, ROWS - c0)
            colc = c0 + jax.lax.broadcasted_iota(jnp.int32, (ch, RB), 0)
            oh = (colc == row[None, :]).astype(jnp.bfloat16)
            acc = acc + jnp.dot(
                tab[:, c0 : c0 + ch], oh, preferred_element_type=jnp.float32
            )
        return acc

    def cond(c):
        stack, sp, cnt, out, aabb = c
        return jnp.any((sp > 0) & (cnt < Q))

    def body_once(c):
        stack, sp, cnt, out, aabb = c
        # Mosaic restriction: no sub-32-bit broadcasts/reshapes — every mask
        # is folded into an i32 comparison (sentinel -1 matches nothing).
        active = (sp > 0) & (cnt < Q)
        spm1 = jnp.where(active, sp - 1, -1)
        node = jnp.sum(
            jnp.where(srow == spm1[None, :], stack, 0), axis=0
        )
        sp = jnp.where(active, spm1, sp)

        # Leaf pop: append the superleaf id to the output slots.
        em = active & (node < 0)
        sl = -node - 1
        cnt_slot = jnp.where(em, cnt, -1)
        out = jnp.where(qrow == cnt_slot[None, :], sl[None, :], out)
        cnt = cnt + em.astype(jnp.int32)

        # Internal pop: fetch the WIDE node's 8 child groups with one exact
        # one-hot matmul. Inactive lanes get row -1 (matches nothing);
        # Mosaic only supports 32-bit minor-dim broadcasts, so the mask
        # lives in the i32 compare.
        is_int = active & (node >= 0)
        row = jnp.where(is_int, node, -1)
        fetch = fetch_rows(row)

        ts = []
        refs = []
        for ci in range(TOP_FAN):
            base = ci * CH_STRIDE
            t_c = _slab(rox, roy, roz, idx, idy, idz, fetch, base)
            # Empty child slots carry ISLEAF = -1; force their t to
            # F32_MAX so `t < best_t` can never push/emit them (their
            # placeholder AABB does NOT slab-miss on its own).
            used = fetch[base + CH_ISLEAF] > -0.5
            ts.append(jnp.where(used, t_c, F32_MAX))
            refs.append(_decode_ref(fetch, base))
        # Sort the 8 (t, ref) pairs ascending by t per lane (Batcher
        # network) so leaves emit near-first and pushes go far-first —
        # best_t tightens fastest across rounds. Empty slots carry an
        # inverted AABB -> t = F32_MAX, sorted last, never hit.
        CES = [
            # sort [0..3], sort [4..7] (5 CEs each), then odd-even merge.
            (0, 1), (2, 3), (0, 2), (1, 3), (1, 2),
            (4, 5), (6, 7), (4, 6), (5, 7), (5, 6),
            (0, 4), (1, 5), (2, 6), (3, 7), (2, 4), (3, 5),
            (1, 2), (3, 4), (5, 6),
        ]
        for a, b in CES:
            swap = ts[a] > ts[b]
            ta = jnp.where(swap, ts[b], ts[a])
            tb = jnp.where(swap, ts[a], ts[b])
            ra = jnp.where(swap, refs[b], refs[a])
            rb = jnp.where(swap, refs[a], refs[b])
            ts[a], ts[b], refs[a], refs[b] = ta, tb, ra, rb

        # Pass 1 (near -> far): emit hit leaf children into free out slots.
        rem = []
        for ci in range(TOP_FAN):
            hit_c = is_int & (ts[ci] < best_t)
            em_c = hit_c & (refs[ci] < 0) & (cnt < Q)
            sl_c = -refs[ci] - 1
            cnt_slot = jnp.where(em_c, cnt, -1)
            out = jnp.where(qrow == cnt_slot[None, :], sl_c[None, :], out)
            cnt = cnt + em_c.astype(jnp.int32)
            rem.append(hit_c & ~em_c)
        # Pass 2 (far -> near): push internals and overflow leaves, so the
        # nearest child is popped first next iteration.
        for ci in range(TOP_FAN - 1, -1, -1):
            sp_c = jnp.where(rem[ci], sp, -1)
            stack = jnp.where(srow == sp_c[None, :], refs[ci][None, :], stack)
            sp = sp + rem[ci].astype(jnp.int32)
        # RAY_DEBUG_INFO.num_aabb_checks (pathtracer.wgsl:2945-2951,
        # bvh_custom.wgsl:53-55): TOP_FAN slab tests per internal pop —
        # the honest count for this node arity.
        aabb = aabb + jnp.where(is_int, TOP_FAN, 0)
        return stack, sp, cnt, out, aabb

    body = body_once

    init = (
        stack_in_ref[0],
        vec(sp_in_ref),
        jnp.zeros((RB,), jnp.int32),
        jnp.full((Q, RB), -1, jnp.int32),
        jnp.zeros((RB,), jnp.int32),
    )
    stack, sp, cnt, out, aabb = jax.lax.while_loop(cond, body, init)
    sl_ref[0] = out
    cnt_ref[0] = cnt.reshape(cnt_ref.shape[1:])
    stack_out_ref[0] = stack
    sp_out_ref[0] = sp.reshape(sp_out_ref.shape[1:])
    if NSLP > 0:
        # Per-block superleaf-demand histogram: replaces the caller's
        # O(QB log QB) searchsorted over the sorted keys (measured 9-16 ms
        # per round at QB=1M) with ~1 ms of VPU compares. hist[s] =
        # #(out == s); empties (-1) fall outside [0, NSLP). Bins are
        # chunked so the (chunk, RB) compare intermediate stays ~8 MB —
        # this is what lets the cap sit at 4096 bins instead of 1024
        # (terrain-class scenes have ~3k superleaves and were eating the
        # searchsorted fallback, prof_stride 2026-08-19).
        parts = []
        for c0 in range(0, NSLP, _HIST_CHUNK):
            ch = min(_HIST_CHUNK, NSLP - c0)
            bins = c0 + jax.lax.broadcasted_iota(jnp.int32, (ch, RB), 0)
            h = jnp.zeros((ch,), jnp.int32)
            for q in range(Q):
                h = h + jnp.sum(
                    (bins == out[q][None, :]).astype(jnp.int32), axis=1
                )
            parts.append(h)
        hist = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        hist_ref[0] = hist.reshape(hist_ref.shape[1:])
    aabb_ref[0] = aabb.reshape(aabb_ref.shape[1:])


def top_traverse(tab, ro, rd, best_t, stack, sp, *, S, Q, n_sl, ray_block=2048):
    """One round of top-tree traversal.

    tab: (rows_pad, TOP_COLS) bf16 (transposed for the kernel here);
    ro/rd: V3 over Bp rays (Bp a multiple of ray_block); best_t: (Bp,);
    stack: (S, Bp) i32; sp: (Bp,) i32.
    Returns (sl (Q, Bp) i32 with -1 empties, cnt (Bp,), stack', sp',
    cnt_sl (>=n_sl,) i32 — the global demand histogram over superleaves,
    aabb (Bp,) i32 — per-lane slab tests this round (debug counters))."""

    Bp = ro.x.shape[0]
    rows_pad = tab.shape[0]
    vmem_limit = None
    if rows_pad > 16384:
        # Huge top trees (~100k instance-superleaves): the resident tab
        # (TOP_COLS x rows bf16, ~5.4 MB at 33k rows) plus the (chunk, RB)
        # one-hot fetch intermediates overflow the DEFAULT 16 MB
        # scoped-VMEM budget (observed 18.17M at RB=2048 and still 16.69M
        # at RB=1024 on the instanced_100k repro, out_hw/repro_inst.log /
        # r5_seq1.log — the resident tab is the irreducible term). v5e has
        # 128 MB physical VMEM and the grid is sequential on one core, so
        # raising the scoped budget is the correct fix; halve the lane
        # block too to keep headroom for the compiler's own scratch.
        ray_block = min(ray_block, 1024)
        vmem_limit = 64 * 1024 * 1024
    RB = min(ray_block, Bp)
    assert Bp % RB == 0, (Bp, RB)
    n_rb = Bp // RB
    sub = RB // 128
    # In-kernel histogram only while its VPU cost (Q x n_sl x RB compares
    # per block) beats the caller's searchsorted fallback (measured 9-16 ms
    # per round at QB=1M); the (chunk, RB) compare intermediates are bin-
    # chunked (_HIST_CHUNK) so VMEM no longer bounds the bin count (the old
    # unchunked form OOM'd ~573 MB at 70k instance-superleaves, ADVICE r3
    # #1, and the 1024 gate it forced sent terrain-class scenes with ~3k
    # superleaves to the slow fallback). 4096 bins ~= 4.3G compares per
    # round at RB=2048/Q=8 — ~2 ms, still well under the fallback.
    with_hist = n_sl <= 4096
    NSLP = max(-(-n_sl // 128) * 128, 128) if with_hist else 0
    sub_h = NSLP // 128

    def shape3(x):
        return x.reshape(n_rb, sub, 128)

    stack_blocks = stack.reshape(S, n_rb, RB).transpose(1, 0, 2)

    vec_spec = pl.BlockSpec((1, sub, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    stack_spec = pl.BlockSpec((1, S, RB), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    sl_spec = pl.BlockSpec((1, Q, RB), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((n_rb, Q, RB), jnp.int32),
        jax.ShapeDtypeStruct((n_rb, sub, 128), jnp.int32),
        jax.ShapeDtypeStruct((n_rb, S, RB), jnp.int32),
        jax.ShapeDtypeStruct((n_rb, sub, 128), jnp.int32),
    ]
    out_specs = [sl_spec, vec_spec, stack_spec, vec_spec]
    if with_hist:
        out_shapes.append(jax.ShapeDtypeStruct((n_rb, sub_h, 128), jnp.int32))
        out_specs.append(pl.BlockSpec(
            (1, sub_h, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ))
    out_shapes.append(jax.ShapeDtypeStruct((n_rb, sub, 128), jnp.int32))
    out_specs.append(vec_spec)
    outs = pl.pallas_call(
        functools.partial(_top_kernel, S=S, Q=Q, NSLP=NSLP),
        grid=(n_rb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [vec_spec] * 7
        + [stack_spec, vec_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        tab.T,  # (TOP_COLS, rows_pad) — see _top_kernel layout note
        shape3(ro.x), shape3(ro.y), shape3(ro.z),
        shape3(rd.x), shape3(rd.y), shape3(rd.z),
        shape3(best_t),
        stack_blocks, shape3(sp),
    )
    if with_hist:
        sl, cnt, stack_o, sp_o, hist, aabb = outs
        cnt_sl = jnp.sum(hist.reshape(n_rb, NSLP), axis=0)
    else:
        sl, cnt, stack_o, sp_o, aabb = outs
        cnt_sl = None
    return (
        sl.transpose(1, 0, 2).reshape(Q, Bp),
        cnt.reshape(Bp),
        stack_o.transpose(1, 0, 2).reshape(S, Bp),
        sp_o.reshape(Bp),
        cnt_sl,
        aabb.reshape(Bp),
    )


# ---------------------------------------------------------------------------
# Phase B: (ray, superleaf) pair intersection
# ---------------------------------------------------------------------------


def _pair_kernel(pk_ref, msl_ref, *args, TB, PB, HAS_INST):
    """Dense closest hit of one work item: one contiguous, 128-aligned block
    of superleaf-sorted rays against one superleaf's triangle block.

    Identical math to pallas_intersect._kernel. The grid runs over work
    items (block, lo, hi packed into ONE i32 — see pair_intersect; SMEM is
    1 MB and six separate (n_items,) i32 tables OOM'd it at 100k
    instance-superleaves, out_hw/repro_inst.log): the ray block is picked
    by the packed block id, the W slice by the superleaf id, and lanes
    outside the superleaf's BLOCK-LOCAL sorted-position range [lo, hi) are
    masked out of the blended write — a block straddling a segment boundary
    is simply visited once per segment. Work items are block-monotone so
    each output block stays resident in VMEM across its visits. Ray
    features R = [d, o x d, o, 1] are built in-kernel from the six
    components (the (P, 10) matrix would otherwise round-trip HBM). The
    emitted triangle index is LOCAL to the superleaf's stride — the caller
    adds sl * SP (it already holds the per-pair sorted key)."""

    if HAS_INST:
        inst_ref, txf_ref = args[0], args[1]
        args = args[2:]
    (rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
     W_ref, eps_ref, t_ref, u_ref, v_ref, det_ref, idx_ref,
     scr_f_ref, scr_i_ref) = args

    k = pl.program_id(0)
    w = pk_ref[k]
    lo = (w >> 13) & 0x1FF
    hi = (w >> 22) & 0x1FF

    @pl.when(hi > lo)
    def _run():
        def vec(ref):
            return ref[0].reshape(-1)  # (1, sub, 128) block -> (PB,)

        rox, roy, roz = vec(rox_ref), vec(roy_ref), vec(roz_ref)
        rdx, rdy, rdz = vec(rdx_ref), vec(rdy_ref), vec(rdz_ref)
        if HAS_INST:
            # Per-item instance transform (two-level TLAS->BLAS analog,
            # bvh_custom.wgsl:30-35): rays move into mesh space; the
            # direction is NOT normalized so t stays world-scaled. The
            # transform table is per-INSTANCE (a per-item 12-float copy
            # overflows SMEM at large work-item counts) with a per-item
            # index; single-level scenes and huge-instance rounds (rays
            # pre-transformed by the caller) skip the multiply entirely.
            inst = inst_ref[k]
            m = [txf_ref[inst, j] for j in range(12)]
            tx = m[0] * rox + m[1] * roy + m[2] * roz + m[3]
            ty = m[4] * rox + m[5] * roy + m[6] * roz + m[7]
            tz = m[8] * rox + m[9] * roy + m[10] * roz + m[11]
            rox, roy, roz = tx, ty, tz
            dx = m[0] * rdx + m[1] * rdy + m[2] * rdz
            dy = m[4] * rdx + m[5] * rdy + m[6] * rdz
            dz = m[8] * rdx + m[9] * rdy + m[10] * rdz
            rdx, rdy, rdz = dx, dy, dz
        cx = roy * rdz - roz * rdy
        cy = roz * rdx - rox * rdz
        cz = rox * rdy - roy * rdx
        # (10, PB): stacking 1-D vectors along the MAJOR axis is a no-op
        # relayout (a (PB, 10) minor-axis stack is an unsupported Mosaic
        # shape cast), so the whole kernel runs transposed: triangles on
        # sublanes, pairs on lanes.
        RT = jnp.stack(
            [rdx, rdy, rdz, cx, cy, cz, rox, roy, roz,
             jnp.ones_like(rox)],
            axis=0,
        )
        PB = RT.shape[1]
        SP = W_ref.shape[2]
        eps = eps_ref[0]
        num_blocks = SP // TB
        trow = jax.lax.broadcasted_iota(jnp.int32, (TB, PB), 0)

        def body(k, carry):
            bt, bidx = carry
            off = k * TB
            Wblk = jnp.concatenate(
                [
                    W_ref[0, :, pl.ds(off, TB)],
                    W_ref[1, :, pl.ds(off, TB)],
                    W_ref[2, :, pl.ds(off, TB)],
                    W_ref[3, :, pl.ds(off, TB)],
                ],
                axis=1,
            )  # (10, 4TB)
            # Hand-rolled bf16 hi/lo 3-pass product (~2^-16 rel error —
            # fine for t/u/v): halves the MXU passes vs HIGHEST's bf16x6,
            # and Pallas does not lower Precision.HIGH.
            dims = (((0,), (0,)), ((), ()))

            def dot(a, b):
                return jax.lax.dot_general(
                    a, b, dims, preferred_element_type=jnp.float32
                )

            Whi = Wblk.astype(jnp.bfloat16)
            Wlo = (Wblk - Whi.astype(jnp.float32)).astype(jnp.bfloat16)
            Rhi = RT.astype(jnp.bfloat16)
            Rlo = (RT - Rhi.astype(jnp.float32)).astype(jnp.bfloat16)
            M = dot(Whi, Rhi) + dot(Whi, Rlo) + dot(Wlo, Rhi)  # (4TB, PB)
            det = M[0:TB]
            nu = M[TB : 2 * TB]
            nv = M[2 * TB : 3 * TB]
            nt = M[3 * TB : 4 * TB]
            d = 1.0 / det
            t = nt * d
            u = nu * d
            v = nv * d
            valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= eps)
            tt = jnp.where(valid, t, F32_MAX)

            blk_t = jnp.min(tt, axis=0)  # (PB,)
            at_min = tt <= blk_t[None, :]
            blk_idx = jnp.min(
                jnp.where(at_min, trow, 2**30), axis=0
            )
            # u/v/det of the winner are NOT extracted here: the 3 pick()
            # reductions over (TB, PB) were ~30% of the kernel's VPU work.
            # The winner's attributes are recomputed once per item below
            # from its local index (exact f32, one tiny one-hot matmul).
            upd = blk_t < bt
            return (
                jnp.where(upd, blk_t, bt),
                jnp.where(upd, blk_idx + off, bidx),
            )

        init = (
            jnp.full((PB,), F32_MAX),
            jnp.zeros((PB,), jnp.int32),
        )
        bt, bidx = jax.lax.fori_loop(0, num_blocks, body, init)

        # Winner recompute: one-hot fetch the winning triangle's 4x10
        # coefficient rows (f32 dot — Mosaic decomposes exactly) and
        # re-evaluate det/nu/nv at the single winning candidate per lane.
        # f32 here is MORE precise than the in-loop 3-pass bf16 product;
        # u/v are shading barycentrics and det only contributes its sign.
        srow_sp = jax.lax.broadcasted_iota(jnp.int32, (SP, PB), 0)
        ohw = (srow_sp == bidx[None, :]).astype(jnp.float32)  # (SP, PB)
        dims2 = (((1,), (0,)), ((), ()))

        def pick_rows(f):
            return jax.lax.dot_general(
                W_ref[f], ohw, dims2, preferred_element_type=jnp.float32
            )  # (10, PB)

        wdet = jnp.sum(pick_rows(0) * RT, axis=0)
        wnu = jnp.sum(pick_rows(1) * RT, axis=0)
        wnv = jnp.sum(pick_rows(2) * RT, axis=0)
        wnt = jnp.sum(pick_rows(3) * RT, axis=0)
        wd = 1.0 / wdet
        bu = wnu * wd
        bv = wnv * wd
        bdet = wdet
        # Candidate selection ran at 3-pass precision; the reported hit
        # distance is the exact f32 t OF the selected triangle (same
        # convention as pallas_packet._isect_core). Misses keep F32_MAX.
        bt = jnp.where(bt < F32_MAX, wnt * wd, bt)

        # Blend only the lanes whose BLOCK-LOCAL sorted position belongs to
        # this work item's superleaf segment; other lanes keep the value
        # written by the block's other visits (first-visit garbage on lanes
        # no item covers is masked by the caller's n_real cut). The local
        # position is a free iota — the old (1, sub, 128) global-position
        # operand cost one VMEM stream per grid step. Mosaic only folds
        # 1-D<->2-D casts into memory ops, so each 1-D accumulator takes a
        # store-adjacent reshape through VMEM scratch and comes back 2-D
        # for the blended write.
        sh = t_ref.shape[1:]
        pos2 = (
            jax.lax.broadcasted_iota(jnp.int32, sh, 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, sh, 1)
        )
        m2 = (pos2 >= lo) & (pos2 < hi)  # (sub, 128)

        def to2d_f(x):
            scr_f_ref[...] = x.reshape(sh)
            return scr_f_ref[...]

        def to2d_i(x):
            scr_i_ref[...] = x.reshape(sh)
            return scr_i_ref[...]

        t_ref[0] = jnp.where(m2, to2d_f(bt), t_ref[0])
        u_ref[0] = jnp.where(m2, to2d_f(bu), u_ref[0])
        v_ref[0] = jnp.where(m2, to2d_f(bv), v_ref[0])
        det_ref[0] = jnp.where(m2, to2d_f(bdet), det_ref[0])
        idx_ref[0] = jnp.where(m2, to2d_i(bidx), idx_ref[0])


def pair_intersect(blk, sl, lo, hi, ro, rd, W4, eps, *, SP, pair_block=256,
                   msl=None, inst=None, txf_tab=None, n_items_dyn=None):
    """Work-item pair intersection over superleaf-sorted rays.

    blk/sl/lo/hi: (n_items,) i32 work items — ray block id, superleaf id,
    and the [lo, hi) GLOBAL sorted-position range owned by that superleaf
    (lanes outside it are masked; lo == hi skips the item). blk must be
    nondecreasing so output blocks revisit consecutively. ro/rd: V3 of
    sorted per-pair ray components (P = n_pb * pair_block, n_pb = number of
    ray blocks); W4: (4, 10, n_sl*SP) padded-soup coefficient matrix.
    n_items_dyn: traced count of valid items — used as a DYNAMIC grid bound
    on TPU so the static tail costs nothing (a skipped step still costs
    ~1.5 us; the tail is ~90% of the static cap in typical rounds).
    Returns per sorted pair (t, u, v, det, LOCAL tri idx in [0, SP)); the
    caller adds sl * SP from its per-pair sorted key. Positions covered by
    no item hold garbage — cut by the caller.

    SMEM budget: (blk, block-local lo, hi) are packed into ONE i32 per
    item (13 | 9 | 9 bits) and `sl` never ships at all, so the per-item
    SMEM cost is 8 B (+4 with `inst`) instead of 24 — six separate tables
    blew the 1 MB SMEM budget at 100k instance-superleaves
    (out_hw/repro_inst.log: 2.32M used)."""

    n_items = blk.shape[0]
    PB = pair_block
    P = ro.x.shape[0]
    assert P % PB == 0
    n_pb = P // PB
    assert n_pb <= (1 << 13), (n_pb, "packed blk field is 13 bits")
    # Keep the (4*TB, PB) f32 intermediates at <=2 MB regardless of PB so
    # VMEM pressure is PB-invariant. TB must DIVIDE SP: for 128-aligned
    # non-power-of-two strides (e.g. sl_stride_opt=640) fall back to the
    # largest 128-multiple divisor under the cap instead of asserting.
    cap = min(SP, max(128, (1 << 17) // PB))
    TB = max(d for d in range(128, cap + 1, 128) if SP % d == 0)
    assert SP % TB == 0 and TB % 128 == 0
    sub = PB // 128
    if msl is None:
        msl = sl  # single-level: global superleaf IS the mesh superleaf
    has_inst = txf_tab is not None
    base = blk * PB
    lo_l = jnp.clip(lo - base, 0, PB)
    hi_l = jnp.clip(hi - base, 0, PB)
    packed = blk | (lo_l << 13) | (hi_l << 22)

    vec = lambda dt: jax.ShapeDtypeStruct((n_pb, sub, 128), dt)
    out_shapes = (
        vec(jnp.float32), vec(jnp.float32), vec(jnp.float32),
        vec(jnp.float32), vec(jnp.int32),
    )
    if has_inst:
        vec_spec = pl.BlockSpec(
            (1, sub, 128), lambda i, pk, ms, it, tx: (pk[i] & 0x1FFF, 0, 0),
            memory_space=pltpu.VMEM,
        )
        w_spec = pl.BlockSpec(
            (4, 10, SP), lambda i, pk, ms, it, tx: (0, 0, ms[i]),
            memory_space=pltpu.VMEM,
        )
        prefetch = (packed, msl, inst, txf_tab)
    else:
        vec_spec = pl.BlockSpec(
            (1, sub, 128), lambda i, pk, ms: (pk[i] & 0x1FFF, 0, 0),
            memory_space=pltpu.VMEM,
        )
        w_spec = pl.BlockSpec(
            (4, 10, SP), lambda i, pk, ms: (0, 0, ms[i]),
            memory_space=pltpu.VMEM,
        )
        prefetch = (packed, msl)

    interpret = jax.default_backend() != "tpu"
    # Interpret mode (CPU tests) has no dynamic-grid lowering; the static
    # cap is correct either way, just slower.
    grid = (n_items,) if interpret or n_items_dyn is None else (n_items_dyn,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=grid,
        in_specs=[vec_spec] * 6
        + [w_spec, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(vec_spec,) * 5,
        scratch_shapes=[
            pltpu.VMEM((sub, 128), jnp.float32),
            pltpu.VMEM((sub, 128), jnp.int32),
        ],
    )

    def shape3(x):
        return x.reshape(n_pb, sub, 128)

    t, u, v, det, idx = pl.pallas_call(
        functools.partial(_pair_kernel, TB=TB, PB=PB, HAS_INST=has_inst),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(*prefetch,
      shape3(ro.x), shape3(ro.y), shape3(ro.z),
      shape3(rd.x), shape3(rd.y), shape3(rd.z),
      W4, jnp.reshape(jnp.asarray(eps, jnp.float32), (1,)))
    return (
        t.reshape(P), u.reshape(P), v.reshape(P), det.reshape(P),
        idx.reshape(P),
    )


# ---------------------------------------------------------------------------
# Phase C: per-winner shading-attribute fetch
# ---------------------------------------------------------------------------


# Output row layout of _attr_kernel: interpolated/copied per-winner shading
# quantities, compact enough that the un-sort back to ray order fits ONE
# <=16-operand variadic sort (XLA TPU sort compile time explodes beyond
# ~16 operands; a raw 62-row unsort took >18 min to compile).
IA_N = slice(0, 3)        # n0*w + n1*u + n2*v (unnormalized)
IA_GN = slice(3, 6)       # geometric normal
IA_TU = 6                 # interpolated texcoord u
IA_TV = 7                 # interpolated texcoord v
IA_HAS_UV = 8
IA_VC = slice(9, 12)      # interpolated vertex color rgb
IA_VCA = 12               # interpolated vertex alpha
IA_DET_SIGN = 13
IA_MAT_ID = 14
IA_ROWS = 16              # rows 15 unused (pad to a sublane multiple)
IA_TAN = slice(16, 19)    # only emitted when the scene has normal maps
IA_BIT = slice(19, 22)
IA_ROWS_NM = 24


def _attr_kernel(pk_ref, sl_ref, *pre, PB, AWOUT, HAS_INST):
    """One-hot fetch + in-kernel interpolation of winner shading attributes.

    Work items mirror _pair_kernel: rays sorted by winning superleaf, one
    contiguous 128-aligned block per item with BLOCK-LOCAL [lo, hi) masking
    ((blk, lo, hi) packed into ONE i32, 13|9|9 bits — five separate
    (n_items,) tables cost 1.93 MB of the 1 MB SMEM at 100k
    instance-superleaves, out_hw/bench2.log). The item's (SP, ATTR_WIDTH)
    attribute slice is picked by the scalar-prefetched superleaf id; the
    fetch is an exact one-hot matmul (HIGHEST — bit-exact f32, same as
    pallas_intersect._kernel_attrs_body). Normals, texcoords and vertex
    colors are interpolated at the hit barycentrics HERE so only IA_ROWS
    compact rows ride the un-sort. Identity paths (single-level scenes and
    huge-instance rounds) ship NO per-item instance word: HAS_INST=False
    reads row 0 of the one-row identity tables."""

    from . import pallas_intersect as pk

    if HAS_INST:
        inst_ref, pre = pre[0], pre[1:]
    (nrm_ref, ovr_ref, li_ref, u_ref, v_ref, A_ref, attr_ref) = pre

    k = pl.program_id(0)
    w = pk_ref[k]
    lo = (w >> 13) & 0x1FF
    hi = (w >> 22) & 0x1FF

    @pl.when(hi > lo)
    def _run():
        li = li_ref[0].reshape(-1)  # (PB,) local tri index within superleaf
        hu = u_ref[0].reshape(-1)
        hv = v_ref[0].reshape(-1)
        A = A_ref[0]  # (SP, AW)
        SP = A.shape[0]
        srow = jax.lax.broadcasted_iota(jnp.int32, (SP, li.shape[0]), 0)
        onehot = (srow == li[None, :]).astype(jnp.float32)
        attrs = jax.lax.dot_general(
            A, onehot,
            (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (AW, PB)

        hw = 1.0 - hu - hv
        rows = [None] * AWOUT
        for c in range(3):
            rows[IA_N.start + c] = (
                attrs[pk.ATTR_N0.start + c] * hw
                + attrs[pk.ATTR_N1.start + c] * hu
                + attrs[pk.ATTR_N2.start + c] * hv
            )
            rows[IA_GN.start + c] = attrs[pk.ATTR_GN.start + c]
        rows[IA_TU] = (
            attrs[pk.ATTR_UV0.start] * hw
            + attrs[pk.ATTR_UV1.start] * hu
            + attrs[pk.ATTR_UV2.start] * hv
        )
        rows[IA_TV] = (
            attrs[pk.ATTR_UV0.start + 1] * hw
            + attrs[pk.ATTR_UV1.start + 1] * hu
            + attrs[pk.ATTR_UV2.start + 1] * hv
        )
        rows[IA_HAS_UV] = attrs[pk.ATTR_HAS_UV]
        for c in range(3):
            rows[IA_VC.start + c] = (
                attrs[pk.ATTR_C0.start + c] * hw
                + attrs[pk.ATTR_C1.start + c] * hu
                + attrs[pk.ATTR_C2.start + c] * hv
            )
        rows[IA_VCA] = (
            attrs[pk.ATTR_C0.start + 3] * hw
            + attrs[pk.ATTR_C1.start + 3] * hu
            + attrs[pk.ATTR_C2.start + 3] * hv
        )
        rows[IA_DET_SIGN] = attrs[pk.ATTR_DET_SIGN]
        rows[IA_MAT_ID] = attrs[pk.ATTR_MAT_ID]
        if AWOUT >= IA_ROWS_NM:
            for c in range(3):
                rows[IA_TAN.start + c] = attrs[pk.ATTR_TAN.start + c]
                rows[IA_BIT.start + c] = attrs[pk.ATTR_BIT.start + c]

        # Two-level: rotate mesh-space frames into world by the item's
        # instance normal matrix and override the per-instance material id
        # (ovr < 0 = single-level, matrix is identity). The rotated
        # geometric normal is renormalized; shading-normal/tangent
        # normalization happens at the consumer as in the single-level path.
        inst = inst_ref[k] if HAS_INST else 0
        ovr = ovr_ref[inst]
        two_l = ovr >= 0  # scalar marker: only two-level items rotate

        nm = [nrm_ref[inst, j] for j in range(9)]

        def rot(sl3, renorm=False):
            x, y, z = rows[sl3.start], rows[sl3.start + 1], rows[sl3.start + 2]
            rx = nm[0] * x + nm[1] * y + nm[2] * z
            ry = nm[3] * x + nm[4] * y + nm[5] * z
            rz = nm[6] * x + nm[7] * y + nm[8] * z
            if renorm:
                inv = jax.lax.rsqrt(
                    jnp.maximum(rx * rx + ry * ry + rz * rz, 1e-30)
                )
                # Keep single-level rows bit-exact: no renormalization.
                one = jnp.ones_like(inv)
                inv = jnp.where(two_l, inv, one)
                rx, ry, rz = rx * inv, ry * inv, rz * inv
            rows[sl3.start] = rx
            rows[sl3.start + 1] = ry
            rows[sl3.start + 2] = rz

        rot(IA_N)
        rot(IA_GN, renorm=True)
        if AWOUT >= IA_ROWS_NM:
            rot(IA_TAN)
            rot(IA_BIT)
        ovr_f = ovr.astype(jnp.float32)
        rows[IA_MAT_ID] = jnp.where(
            ovr >= 0, jnp.full_like(rows[IA_MAT_ID], 0.0) + ovr_f,
            rows[IA_MAT_ID],
        )
        zero = jnp.zeros_like(rows[0])
        out = jnp.stack([r if r is not None else zero for r in rows], axis=0)

        # lo/hi are block-local, so the lane iota is the position directly.
        pos = jax.lax.broadcasted_iota(jnp.int32, (AWOUT, PB), 1)
        m = (pos >= lo) & (pos < hi)
        attr_ref[0] = jnp.where(m, out, attr_ref[0])


def attr_fetch(blk, sl, lo, hi, li, hu, hv, A3, *, pair_block=256,
               with_tangents=False, inst=None, nrm_tab=None, ovr_tab=None,
               n_items_dyn=None):
    """blk/sl/lo/hi: work items as in pair_intersect; li: (P,) i32 local tri
    index per sorted ray; hu/hv: (P,) hit barycentrics; A3: (n_sl, SP, AW)
    packed attribute slices. Returns (IA_ROWS[_NM], P) interpolated
    attributes in sorted-ray order (uncovered positions = garbage; cut by
    the caller)."""

    n_items = blk.shape[0]
    PB = pair_block
    P = li.shape[0]
    assert P % PB == 0
    n_pb = P // PB
    assert n_pb <= (1 << 13), (n_pb, "packed blk field is 13 bits")
    assert PB <= 256, (PB, "packed lo/hi fields are 9 bits")
    AWOUT = IA_ROWS_NM if with_tangents else IA_ROWS
    sub = PB // 128
    has_inst = inst is not None
    if nrm_tab is None:
        nrm_tab = jnp.asarray(
            [[1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0]], jnp.float32
        )
    if ovr_tab is None:
        ovr_tab = jnp.full((nrm_tab.shape[0],), -1, jnp.int32)

    # SMEM budget: same packing as pair_intersect — (blk, block-local lo,
    # hi) in ONE i32 per item; the identity path (single-level / huge-
    # instance) ships no per-item instance word at all. Five separate
    # (n_items,) tables were 1.93 MB of the 1 MB SMEM at 100k
    # instance-superleaves (out_hw/bench2.log instanced100k skip).
    base = blk * PB
    lo_l = jnp.clip(lo - base, 0, PB)
    hi_l = jnp.clip(hi - base, 0, PB)
    packed = blk | (lo_l << 13) | (hi_l << 22)
    if has_inst:
        prefetch = (packed, sl, inst, nrm_tab, ovr_tab)
        idx_b = lambda i, pk_, s, it, nr, ov: (pk_[i] & 0x1FFF, 0, 0)
        idx_s = lambda i, pk_, s, it, nr, ov: (s[i], 0, 0)
    else:
        prefetch = (packed, sl, nrm_tab, ovr_tab)
        idx_b = lambda i, pk_, s, nr, ov: (pk_[i] & 0x1FFF, 0, 0)
        idx_s = lambda i, pk_, s, nr, ov: (s[i], 0, 0)

    vec_spec = pl.BlockSpec((1, sub, 128), idx_b, memory_space=pltpu.VMEM)
    interpret = jax.default_backend() != "tpu"
    grid = (n_items,) if interpret or n_items_dyn is None else (n_items_dyn,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=grid,
        in_specs=[
            vec_spec, vec_spec, vec_spec,
            pl.BlockSpec(
                (1, A3.shape[1], A3.shape[2]), idx_s,
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, AWOUT, PB), idx_b, memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _attr_kernel, PB=PB, AWOUT=AWOUT, HAS_INST=has_inst
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pb, AWOUT, PB), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(*prefetch,
      li.reshape(n_pb, sub, 128),
      hu.reshape(n_pb, sub, 128), hv.reshape(n_pb, sub, 128),
      A3)
    return out.transpose(1, 0, 2).reshape(AWOUT, P)
