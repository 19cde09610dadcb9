"""Pallas TPU kernel: fused dense ray/triangle closest-hit.

The MXU formulation of ray_tri_dst (see kernels/intersect.py
build_tri_matrix; reference algebra at pathtracer.wgsl:2922-2943) computes
det/nu/nv/nt for all ray-triangle pairs as four (RB,10)@(10,TB) matmuls.
The pure-jnp version must round-trip the (B,4T) pair matrix through HBM
(hundreds of MB per bounce); this kernel tiles rays over the grid, streams
triangle blocks from VMEM, runs the epilogue (t/u/v, validity, NaN-safe
compare) and the running argmin entirely on-chip, and writes only the
per-ray best-hit record. This is the TPU equivalent of the reference's
per-thread BVH walk for small scenes — zero divergence, MXU-resident.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import vec3 as v3


def _ray_matrix(ro, rd, pad):
    """(B,10) ray feature rows [d, o x d, o, 1] from V3 components, padded.
    Built once per intersect call; its minor dim is 10 (layout-padded) but
    it is a single small write that immediately feeds the MXU."""

    c = v3.cross(ro, rd)
    ones = jnp.ones_like(ro.x)
    cols = [rd.x, rd.y, rd.z, c.x, c.y, c.z, ro.x, ro.y, ro.z, ones]
    R = jnp.stack(cols, axis=-1)
    if pad:
        R = jnp.pad(R, ((0, pad), (0, 0)))
    return R

# Plain Python literals: jnp scalars at module scope would be captured as
# pallas kernel constants, which pallas_call rejects.
F32_MAX = 3.4028235e38
_BIG_I32 = 2**30

# Packed per-triangle shading attribute layout (columns of the A matrix the
# attrs kernel selects with an exact one-hot matmul). Kept in one place so
# flatten (producer) and render/materials (consumer) agree.
ATTR_N0 = slice(0, 3)
ATTR_N1 = slice(3, 6)
ATTR_N2 = slice(6, 9)
ATTR_GN = slice(9, 12)
ATTR_UV0 = slice(12, 14)
ATTR_UV1 = slice(14, 16)
ATTR_UV2 = slice(16, 18)
ATTR_HAS_UV = 18
ATTR_C0 = slice(19, 23)
ATTR_C1 = slice(23, 27)
ATTR_C2 = slice(27, 31)
ATTR_TAN = slice(31, 34)
ATTR_BIT = slice(34, 37)
ATTR_MAT_COLOR = slice(37, 41)
ATTR_MAT_EMISSION = slice(41, 44)
ATTR_MAT_SCATTERING = slice(44, 47)
ATTR_MAT_TYPE = 47
ATTR_MAT_ROUGHNESS = 48
ATTR_MAT_METALLIC = 49
ATTR_MAT_IOR = 50
ATTR_MAT_ANISO = 51
ATTR_MAT_TRDEPTH = 52
ATTR_MAT_TEX = slice(53, 58)
ATTR_DET_SIGN = 58
ATTR_MAT_ID = 59
ATTR_INST_ID = 60
ATTR_TRI_ID = 61
ATTR_WIDTH = 128  # padded to a lane multiple


def _kernel(R_ref, W_ref, eps_ref, t_ref, u_ref, v_ref, det_ref, idx_ref, *, TB):
    R = R_ref[...]  # (RB, 10)
    RB = R.shape[0]
    T = W_ref.shape[2]
    eps = eps_ref[0]
    num_blocks = T // TB

    lane = jax.lax.broadcasted_iota(jnp.int32, (RB, TB), 1)

    def body(i, carry):
        bt, bu, bv, bdet, bidx = carry
        off = i * TB
        w_det = W_ref[0, :, pl.ds(off, TB)]
        w_nu = W_ref[1, :, pl.ds(off, TB)]
        w_nv = W_ref[2, :, pl.ds(off, TB)]
        w_nt = W_ref[3, :, pl.ds(off, TB)]
        dot = functools.partial(
            jnp.dot,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        det = dot(R, w_det)  # (RB, TB)
        nu = dot(R, w_nu)
        nv = dot(R, w_nv)
        nt = dot(R, w_nt)
        d = 1.0 / det
        t = nt * d
        u = nu * d
        v = nv * d
        valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= eps)
        tt = jnp.where(valid, t, F32_MAX)

        blk_t = jnp.min(tt, axis=1)  # (RB,)
        at_min = tt <= blk_t[:, None]
        blk_idx = jnp.min(jnp.where(at_min, lane, _BIG_I32), axis=1)
        onehot = lane == blk_idx[:, None]

        def pick(x):
            return jnp.sum(jnp.where(onehot, x, 0.0), axis=1)

        blk_u = pick(u)
        blk_v = pick(v)
        blk_det = pick(det)

        upd = blk_t < bt
        return (
            jnp.where(upd, blk_t, bt),
            jnp.where(upd, blk_u, bu),
            jnp.where(upd, blk_v, bv),
            jnp.where(upd, blk_det, bdet),
            jnp.where(upd, blk_idx + off, bidx),
        )

    init = (
        jnp.full((RB,), F32_MAX),
        jnp.zeros((RB,), jnp.float32),
        jnp.zeros((RB,), jnp.float32),
        jnp.zeros((RB,), jnp.float32),
        jnp.zeros((RB,), jnp.int32),
    )
    bt, bu, bv, bdet, bidx = jax.lax.fori_loop(0, num_blocks, body, init)
    t_ref[0] = bt.reshape(t_ref.shape[1:])
    u_ref[0] = bu.reshape(u_ref.shape[1:])
    v_ref[0] = bv.reshape(v_ref.shape[1:])
    det_ref[0] = bdet.reshape(det_ref.shape[1:])
    idx_ref[0] = bidx.reshape(idx_ref.shape[1:])


def _kernel_attrs(
    R_ref, W_ref, A_ref, eps_ref, t_ref, u_ref, v_ref, det_ref, idx_ref,
    attr_ref, *, TB,
):
    """Closest hit + shading attribute fetch. Identical traversal to
    `_kernel`, plus a per-block one-hot (RB,TB)@(TB,ATTR_WIDTH) matmul that
    selects the winning triangle's packed attribute row — exact, because
    each row of the one-hot has at most a single 1."""

    R = R_ref[...]
    RB = R.shape[0]
    eps = eps_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (RB, TB), 1)

    t_ref[0] = jnp.full(t_ref.shape[1:], F32_MAX)  # miss default
    _kernel_attrs_body(
        R, W_ref, A_ref, eps, t_ref, u_ref, v_ref, det_ref, idx_ref,
        attr_ref, TB, lane,
    )


def _kernel_attrs_body(
    R, W_ref, A_ref, eps, t_ref, u_ref, v_ref, det_ref, idx_ref, attr_ref,
    TB, lane,
):
    RB = R.shape[0]
    T = W_ref.shape[2]
    num_blocks = T // TB

    def body(i, carry):
        bt, bu, bv, bdet, bidx, battr = carry
        off = i * TB
        dot = functools.partial(
            jnp.dot,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        # One fused (RB,10)@(10,4TB) matmul for all four numerators (a
        # single MXU dispatch beats four K=10 contractions).
        Wblk = jnp.concatenate(
            [
                W_ref[0, :, pl.ds(off, TB)],
                W_ref[1, :, pl.ds(off, TB)],
                W_ref[2, :, pl.ds(off, TB)],
                W_ref[3, :, pl.ds(off, TB)],
            ],
            axis=1,
        )
        M = dot(R, Wblk)
        det = M[:, 0:TB]
        nu = M[:, TB : 2 * TB]
        nv = M[:, 2 * TB : 3 * TB]
        nt = M[:, 3 * TB : 4 * TB]
        d = 1.0 / det
        t = nt * d
        u = nu * d
        v = nv * d
        valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= eps)
        tt = jnp.where(valid, t, F32_MAX)

        blk_t = jnp.min(tt, axis=1)
        at_min = tt <= blk_t[:, None]
        blk_idx = jnp.min(jnp.where(at_min, lane, _BIG_I32), axis=1)
        onehot = (lane == blk_idx[:, None]).astype(jnp.float32)

        def pick(x):
            return jnp.sum(jnp.where(onehot > 0.0, x, 0.0), axis=1)

        blk_u = pick(u)
        blk_v = pick(v)
        blk_det = pick(det)
        blk_attr = dot(onehot, A_ref[pl.ds(off, TB), :])  # (RB, ATTR_WIDTH)

        upd = blk_t < bt
        return (
            jnp.where(upd, blk_t, bt),
            jnp.where(upd, blk_u, bu),
            jnp.where(upd, blk_v, bv),
            jnp.where(upd, blk_det, bdet),
            jnp.where(upd, blk_idx + off, bidx),
            jnp.where(upd[:, None], blk_attr, battr),
        )

    init = (
        jnp.full((RB,), F32_MAX),
        jnp.zeros((RB,), jnp.float32),
        jnp.zeros((RB,), jnp.float32),
        jnp.zeros((RB,), jnp.float32),
        jnp.zeros((RB,), jnp.int32),
        jnp.zeros((RB, A_ref.shape[1]), jnp.float32),
    )
    bt, bu, bv, bdet, bidx, battr = jax.lax.fori_loop(0, num_blocks, body, init)
    t_ref[0] = bt.reshape(t_ref.shape[1:])
    u_ref[0] = bu.reshape(u_ref.shape[1:])
    v_ref[0] = bv.reshape(v_ref.shape[1:])
    det_ref[0] = bdet.reshape(det_ref.shape[1:])
    idx_ref[0] = bidx.reshape(idx_ref.shape[1:])
    # Transposed (ATTR_WIDTH, RB) so every attribute is a lane-major row.
    attr_ref[...] = battr.T


def dense_closest_hit_attrs_pallas(
    W4, A, ro, rd, eps, ray_block=1024, tri_block=256
):
    """Closest hit + packed attribute row per ray. A: (T, ATTR_WIDTH).
    (An alive_count live-prefix skip existed for stream compaction; the
    feature was measured ~30x slower and removed — integrators.py:81-85 —
    and its f32 SMEM round-trip was a latent >2^24 precision bug.)"""

    B = ro.x.shape[0]
    T = W4.shape[2]
    for cand in (tri_block, 128):
        if T >= cand or cand == 128:
            TB = cand
            break
    tpad = (-T) % TB
    A = A[:T]  # the scene's attr matrix may carry extra leaf-gather slack
    if tpad:
        W4 = jnp.pad(W4, ((0, 0), (0, 0), (0, tpad)))
        A = jnp.pad(A, ((0, tpad), (0, 0)))
    T = T + tpad
    assert A.shape == (T, A.shape[1]), (A.shape, T)
    # Pad the ray batch UP to a lane multiple before choosing the block
    # size: RB=min(ray_block, B) with an unaligned B made sub=RB//128
    # truncate and the output reshape fail (any B%128 != 0 batch, e.g. a
    # 12x12 smoke frame or a 2230x929 aspect-fit render). The reference
    # dispatches any ceil(W/4) x ceil(H/4) grid with no alignment
    # constraint (renderer.rs:835-837); neither do we.
    assert ray_block % 128 == 0, ray_block
    B128 = B + ((-B) % 128)
    RB = min(ray_block, B128)
    pad = (-B) % RB
    Bp = B + pad
    R = _ray_matrix(ro, rd, pad)
    eps_arr = jnp.reshape(jnp.asarray(eps, jnp.float32), (1,))

    n_rb = Bp // RB
    sub = RB // 128
    vec = lambda dt: jax.ShapeDtypeStruct((n_rb, sub, 128), dt)
    out_shapes = (
        vec(jnp.float32),
        vec(jnp.float32),
        vec(jnp.float32),
        vec(jnp.float32),
        vec(jnp.int32),
        jax.ShapeDtypeStruct((A.shape[1], Bp), jnp.float32),
    )
    vec_spec = pl.BlockSpec(
        (1, sub, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    attr_spec = pl.BlockSpec(
        (A.shape[1], RB), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    t, u, v, det, idx, attr = pl.pallas_call(
        functools.partial(_kernel_attrs, TB=TB),
        grid=(n_rb,),
        in_specs=[
            pl.BlockSpec((RB, 10), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(vec_spec,) * 5 + (attr_spec,),
        out_shape=out_shapes,
        interpret=jax.default_backend() != "tpu",
    )(R, W4, A, eps_arr)
    return (
        t.reshape(-1)[:B],
        u.reshape(-1)[:B],
        v.reshape(-1)[:B],
        det.reshape(-1)[:B],
        idx.reshape(-1)[:B],
        attr[:, :B],
    )


def dense_closest_hit_pallas(W4, ro, rd, eps, ray_block=1024, tri_block=512):
    """W4: (4, 10, T) coefficient matrix (T padded to tri_block); returns
    (t, u, v, det, idx) per ray with t == F32_MAX on miss."""

    B = ro.x.shape[0]
    T = W4.shape[2]
    # Pad triangles to a lane-aligned block count; zero columns yield
    # det = 0 -> NaN epilogue -> invalid, so padding never produces hits.
    for cand in (tri_block, 256, 128):
        if T >= cand or cand == 128:
            TB = cand
            break
    tpad = (-T) % TB
    if tpad:
        W4 = jnp.pad(W4, ((0, 0), (0, 0), (0, tpad)))
    T = T + tpad
    assert T % TB == 0, (T, TB)
    # See dense_closest_hit_attrs_pallas: pad B up to a lane multiple
    # before choosing RB so sub=RB//128 never truncates.
    assert ray_block % 128 == 0, ray_block
    B128 = B + ((-B) % 128)
    RB = min(ray_block, B128)
    pad = (-B) % RB
    Bp = B + pad
    R = _ray_matrix(ro, rd, pad)
    eps_arr = jnp.reshape(jnp.asarray(eps, jnp.float32), (1,))

    n_rb = Bp // RB
    sub = RB // 128  # (sub, 128) satisfies the (8, 128) tiling constraint
    out_shapes = (
        jax.ShapeDtypeStruct((n_rb, sub, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_rb, sub, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_rb, sub, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_rb, sub, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_rb, sub, 128), jnp.int32),
    )
    grid = (n_rb,)
    out_spec = pl.BlockSpec(
        (1, sub, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    t, u, v, det, idx = pl.pallas_call(
        functools.partial(_kernel, TB=TB),
        grid=grid,
        in_specs=[
            pl.BlockSpec((RB, 10), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole W4
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(out_spec,) * 5,
        out_shape=out_shapes,
        interpret=jax.default_backend() != "tpu",
    )(R, W4, eps_arr)
    t = t.reshape(-1)[:B]
    u = u.reshape(-1)[:B]
    v = v.reshape(-1)[:B]
    det = det.reshape(-1)[:B]
    idx = idx.reshape(-1)[:B]
    return t, u, v, det, idx
