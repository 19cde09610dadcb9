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

# Plain Python literals: jnp scalars at module scope would be captured as
# pallas kernel constants, which pallas_call rejects.
F32_MAX = 3.4028235e38
_BIG_I32 = 2**30


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


def dense_closest_hit_pallas(W4, ro, rd, eps, ray_block=1024, tri_block=512):
    """W4: (4, 10, T) coefficient matrix (T padded to tri_block); returns
    (t, u, v, det, idx) per ray with t == F32_MAX on miss."""

    B = ro.shape[0]
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
    RB = min(ray_block, B)
    pad = (-B) % RB
    if pad:
        ro = jnp.pad(ro, ((0, pad), (0, 0)))
        rd = jnp.pad(rd, ((0, pad), (0, 0)))
    Bp = B + pad
    R = jnp.concatenate(
        [rd, jnp.cross(ro, rd), ro, jnp.ones_like(ro[:, :1])], axis=-1
    )
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
