"""Packet (per-block persistent) BVH traversal — the sort-free backend.

The sort-carried wavefront (kernels/intersect.py::_wf_round) moves every
ray through TWO O(QB log^2 QB) bitonic sorts and a separate top-traverse
dispatch per round; at 131k rays that is ~15 ms of sort traffic per round
regardless of how little real intersection work a round contains. This
kernel is the opposite trade, the TPU analog of the GPU's persistent-
threads traversal (the reference walks its BVH per thread,
bvh_custom.wgsl:195-288): rays are cut into fixed blocks of `PBK` lanes,
and each block walks the ENTIRE top tree to completion inside one Pallas
grid step with

- the wide-node stack in SMEM (scalar pops/pushes, one packed i32 per
  child reference),
- the 8 children of a popped row tested against all PBK rays at once on
  the VPU ((8, PBK) slab test folded to ONE vector->scalar bitmask per
  pop — per-child scalar extraction would serialize on the scalar unit),
- superleaf leaves intersected by DMA-ing the (4, 10, SP) triangle
  coefficient block from HBM into VMEM and running the same transposed
  MXU evaluation as kernels/pallas_bvh._pair_kernel,
- per-ray best state (t/u/v/det/tri) resident in VMEM scratch for the
  whole walk.

Nothing ever leaves the chip between rounds: no grouping sort, no
un-sort, no per-round HBM round-trip of ray/stack state. The price is
packet divergence: every ray in a block pays for the union of the
block's superleaf visits. Blocks of camera rays / regenerated wavefront
rays are coherent enough that the union stays small; the caller can fall
back to the sort-based wavefront for pathological batches.

Reference parity: traversal order and hit selection match
bvh_custom.wgsl:195-288 (closest hit, strict-< tie keeping) and the
triangle algebra is ray_tri_dst (pathtracer.wgsl:2922-2943) hoisted into
the per-triangle coefficient matrix (intersect.build_tri_matrix).
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
    TOP_FAN,
)
from ..core.vec3 import V3

F32_MAX = 3.4028235e38


def _pack_top(tab: jnp.ndarray):
    """Split the condensed row table into the two kernel-side tables.

    tab: (rows_pad, TOP_FAN*CH_STRIDE) f32 (accel/superleaf.build_top_table)
    ->  geo  (rows_pad, TOP_FAN, 8) f32: [lo.xyz, hi.xyz, isleaf, 0]
        refs (rows_pad, TOP_FAN)   i32: (child_ref << 1) | isleaf
    """

    rows_pad = tab.shape[0]
    t3 = tab.reshape(rows_pad, TOP_FAN, CH_STRIDE)
    geo = jnp.concatenate(
        [
            t3[:, :, CH_LO],
            t3[:, :, CH_HI],
            t3[:, :, CH_ISLEAF : CH_ISLEAF + 1],
            jnp.zeros((rows_pad, TOP_FAN, 1), jnp.float32),
        ],
        axis=2,
    )
    ref = (
        t3[:, :, CH_H2].astype(jnp.int32) * 65536
        + t3[:, :, CH_HI8].astype(jnp.int32) * 256
        + t3[:, :, CH_LO8].astype(jnp.int32)
    )
    is_leaf = (t3[:, :, CH_ISLEAF] > 0.5).astype(jnp.int32)
    refs = (ref << 1) | is_leaf
    return geo, refs


def _packet_kernel(
    geo_ref, refs_ref, rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
    act_ref, W_ref, eps_ref,
    t_ref, u_ref, v_ref, det_ref, idx_ref,
    stack_ref, wv_ref, bt_ref, bu_ref, bv_ref, bd_ref, bi_ref, sem_ref,
    *, SP, PBK, interpret,
):
    eps = eps_ref[0]

    def vec(ref):
        return ref[0].reshape(-1)  # (1, sub, 128) block -> (PBK,)

    rox, roy, roz = vec(rox_ref), vec(roy_ref), vec(roz_ref)
    rdx, rdy, rdz = vec(rdx_ref), vec(rdy_ref), vec(rdz_ref)
    active = vec(act_ref) > 0.0
    # Slab reciprocals: IEEE inf on zero components (intersect._ray_aabb_dst).
    ivx, ivy, ivz = 1.0 / rdx, 1.0 / rdy, 1.0 / rdz
    cx = roy * rdz - roz * rdy
    cy = roz * rdx - rox * rdz
    cz = rox * rdy - roy * rdx
    # Transposed ray features (10, PBK): rays ride the lanes (see
    # pallas_bvh._pair_kernel's layout note — a (PBK, 10) minor-axis stack
    # is an unsupported Mosaic relayout).
    RT = jnp.stack(
        [rdx, rdy, rdz, cx, cy, cz, rox, roy, roz, jnp.ones_like(rox)],
        axis=0,
    )

    bt_ref[...] = jnp.full((PBK,), F32_MAX)
    bu_ref[...] = jnp.zeros((PBK,), jnp.float32)
    bv_ref[...] = jnp.zeros((PBK,), jnp.float32)
    bd_ref[...] = jnp.zeros((PBK,), jnp.float32)
    bi_ref[...] = jnp.zeros((PBK,), jnp.int32)

    stack_ref[0] = 0  # root row, internal (leaf bit clear)
    any_active = jnp.any(active)

    iota_sp = jax.lax.broadcasted_iota(jnp.int32, (SP, PBK), 0)
    pow2 = 1 << jax.lax.broadcasted_iota(jnp.int32, (TOP_FAN, 1), 0)
    dims_t = (((0,), (0,)), ((), ()))  # contract dim 0 x dim 0
    dims_oh = (((1,), (0,)), ((), ()))

    def body(sp):
        pref = stack_ref[sp - 1]
        is_leaf = pref & 1
        ref = pref >> 1

        # ---- internal node: (8, PBK) slab test, one bitmask per pop ----
        # The row read is clamped so a leaf pop never reads a leaf id as a
        # row index; the result is discarded via the bits mask below.
        rref = jnp.where(is_leaf == 0, ref, 0)
        row = geo_ref[rref]  # (TOP_FAN, 8)
        bt = bt_ref[...]
        tx1 = (row[:, 0:1] - rox[None, :]) * ivx[None, :]
        tx2 = (row[:, 3:4] - rox[None, :]) * ivx[None, :]
        ty1 = (row[:, 1:2] - roy[None, :]) * ivy[None, :]
        ty2 = (row[:, 4:5] - roy[None, :]) * ivy[None, :]
        tz1 = (row[:, 2:3] - roz[None, :]) * ivz[None, :]
        tz2 = (row[:, 5:6] - roz[None, :]) * ivz[None, :]
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(tx1, tx2), jnp.minimum(ty1, ty2)),
            jnp.minimum(tz1, tz2),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(tx1, tx2), jnp.maximum(ty1, ty2)),
            jnp.maximum(tz1, tz2),
        )
        # Empty slots carry an inverted box that PASSES the slab test
        # (near=-huge / far=+huge) — mask on ISLEAF = -1
        # (superleaf.build_top_table's empty marker).
        hit8 = (
            (far >= near)
            & (far > 0.0)
            & (near < bt[None, :])
            & (row[:, 6:7] > -0.5)
            & active[None, :]
        )
        bits = jnp.sum(
            jnp.max(jnp.where(hit8, pow2, 0), axis=1), dtype=jnp.int32
        )
        bits = jnp.where(is_leaf == 0, bits, 0)

        sp2 = sp - 1
        for c in range(TOP_FAN):
            pushed = (bits >> c) & 1

            @pl.when(pushed == 1)
            def _push(c=c, sp2=sp2):
                stack_ref[sp2] = refs_ref[rref, c]

            sp2 = sp2 + pushed

        # ---- leaf: DMA the superleaf's coefficient block, MXU closest hit
        @pl.when(is_leaf == 1)
        def _leaf():
            if interpret:
                wv_ref[...] = W_ref[:, :, pl.ds(ref * SP, SP)]
            else:
                dma = pltpu.make_async_copy(
                    W_ref.at[:, :, pl.ds(ref * SP, SP)], wv_ref, sem_ref
                )
                dma.start()
                dma.wait()

            def ev(f):
                return jax.lax.dot_general(
                    wv_ref[f], RT, dims_t,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )  # (SP, PBK)

            det = ev(0)
            nu = ev(1)
            nv = ev(2)
            nt = ev(3)
            d = 1.0 / det
            tt = nt * d
            uu = nu * d
            vv = nv * d
            valid = (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) & (tt >= eps)
            tm = jnp.where(valid, tt, F32_MAX)
            tmin = jnp.min(tm, axis=0)  # (PBK,)
            at_min = (tm <= tmin[None, :]) & valid
            li = jnp.min(jnp.where(at_min, iota_sp, 2**30), axis=0)

            bt0 = bt_ref[...]
            upd = (tmin < bt0) & active
            # Winner u/v/det via an exact f32 one-hot fetch of the winning
            # triangle's coefficient rows (same scheme as _pair_kernel).
            ohw = (iota_sp == li[None, :]).astype(jnp.float32)

            def pick(f):
                return jax.lax.dot_general(
                    wv_ref[f], ohw, dims_oh,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )  # (10, PBK)

            wdet = jnp.sum(pick(0) * RT, axis=0)
            wnu = jnp.sum(pick(1) * RT, axis=0)
            wnv = jnp.sum(pick(2) * RT, axis=0)
            wd = 1.0 / wdet
            bt_ref[...] = jnp.where(upd, tmin, bt0)
            bu_ref[...] = jnp.where(upd, wnu * wd, bu_ref[...])
            bv_ref[...] = jnp.where(upd, wnv * wd, bv_ref[...])
            bd_ref[...] = jnp.where(upd, wdet, bd_ref[...])
            bi_ref[...] = jnp.where(upd, ref * SP + li, bi_ref[...])

        return sp2

    jax.lax.while_loop(lambda sp: (sp > 0) & any_active, body, jnp.int32(1))

    sub = PBK // 128

    def out(ref, val):
        ref[0] = val.reshape(sub, 128)

    out(t_ref, bt_ref[...])
    out(u_ref, bu_ref[...])
    out(v_ref, bv_ref[...])
    out(det_ref, bd_ref[...])
    out(idx_ref, bi_ref[...])


def packet_traverse(scene, ro: V3, rd: V3, eps, W4, *, PBK=256, active=None):
    """Closest hit over all rays via per-block packet traversal.

    Same contract as the sort-based composition in
    intersect.closest_hit_wavefront: returns (t, u, v, det, tri) with
    t = F32_MAX on miss, tri a padded-soup triangle index. Single-level
    scenes only (two-level instancing keeps the sort backend for now)."""

    assert not scene.two_level, "packet backend: single-level scenes only"
    assert not scene.top_root_is_leaf, "single-superleaf scenes are dense"
    B = ro.x.shape[0]
    SP = scene.sl_stride
    pad = (-B) % PBK
    Bp = B + pad

    def padv(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill) if pad else x

    if active is None:
        act = jnp.ones(Bp, jnp.float32)
        if pad:
            act = act.at[B:].set(0.0)
    else:
        act = padv(active.astype(jnp.float32), 0.0)
    rox, roy, roz = padv(ro.x), padv(ro.y), padv(ro.z)
    rdx, rdy, rdz = padv(rd.x), padv(rd.y, 1.0), padv(rd.z)

    geo, refs = _pack_top(scene.top_tab)
    S = (TOP_FAN - 1) * scene.top_depth + TOP_FAN + 2
    SMAX = S + TOP_FAN  # slack: leaves share the stack with internals

    n_blk = Bp // PBK
    sub = PBK // 128
    interpret = jax.default_backend() != "tpu"

    def shp(x):
        return x.reshape(n_blk, sub, 128)

    blk_spec = pl.BlockSpec(
        (1, sub, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shapes = tuple(
        jax.ShapeDtypeStruct((n_blk, sub, 128), dt)
        for dt in (jnp.float32,) * 4 + (jnp.int32,)
    )
    t, u, v, det, idx = pl.pallas_call(
        functools.partial(
            _packet_kernel, SP=SP, PBK=PBK, interpret=interpret
        ),
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # geo
            pl.BlockSpec(memory_space=pltpu.SMEM),   # refs (scalar reads)
        ]
        + [blk_spec] * 7
        + [
            pl.BlockSpec(memory_space=pltpu.ANY),    # W4 stays in HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),   # eps
        ],
        out_specs=(blk_spec,) * 5,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.SMEM((SMAX,), jnp.int32),
            pltpu.VMEM((4, 10, SP), jnp.float32),
            pltpu.VMEM((PBK,), jnp.float32),
            pltpu.VMEM((PBK,), jnp.float32),
            pltpu.VMEM((PBK,), jnp.float32),
            pltpu.VMEM((PBK,), jnp.float32),
            pltpu.VMEM((PBK,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(
        geo, refs,
        shp(rox), shp(roy), shp(roz), shp(rdx), shp(rdy), shp(rdz),
        shp(act), W4,
        jnp.reshape(jnp.asarray(eps, jnp.float32), (1,)),
    )

    def cut(a):
        return a.reshape(Bp)[:B]

    return cut(t), cut(u), cut(v), cut(det), cut(idx)
