"""Pair-kernel ablation on arealights1 (TPU).

prof_round put pair_intersect at ~10 ms of the ~20 ms sort round
(1715 work items, 269k real pairs, SP=1024, TB=512, PB=256). This
isolates WHERE those 10 ms go by timing modified kernel copies:

  V0  baseline (pallas_bvh.pair_intersect as shipped)
  V1  selection-t via rsqrt(det^2) instead of the exact divide
  V2  no winner recompute (pick) — returns (t, tri) only
  V3  V1 + V2
  V4  TB = SP (one fori iteration, 4x bigger matmul blocks)
  V5  eval-only: no per-candidate validity/min at all (floor check)
  GRID n_items all-empty items (lo == hi) — pure grid-step overhead

All variants keep identical DMA/BlockSpec structure so deltas isolate
in-kernel compute. Inputs are one REAL round-1 state from the camera
batch (same construction as tools/prof_round.py).
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lupinpathtracer_tpu.core import rng as rng_mod, vec3 as v3
from lupinpathtracer_tpu.core.types import PathtraceDesc
from lupinpathtracer_tpu.io import yocto_json
from lupinpathtracer_tpu.kernels import intersect as isx
from lupinpathtracer_tpu.kernels import pallas_bvh as pb
from lupinpathtracer_tpu.render.camera import compute_camera_ray
from lupinpathtracer_tpu.render.renderer import _camera_args
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu

F32_MAX = 3.4028235e38
W, H = 512, 256
B = W * H

scene, cams = yocto_json.load_scene_yoctogl_v24(
    "/root/reference/test_scenes/arealights1/arealights1.json"
)
tpu = build_scene_tpu(scene)
desc = PathtraceDesc()
desc.camera_transform = cams[1].transform
desc.camera_params = cams[1].params
cam = _camera_args(desc)

gx = jnp.broadcast_to(jnp.arange(W)[None, :], (H, W)).reshape(-1)
gy = jnp.broadcast_to(jnp.arange(H)[:, None], (H, W)).reshape(-1)
pix = (gy * W + gx).astype(jnp.uint32)
state = rng_mod.init_state(pix, 0, 0, 0)
state, ox = rng_mod.next_f32(state)
state, oy = rng_mod.next_f32(state)
_, ro, rd = jax.jit(lambda: compute_camera_ray(
    cam["cam_transform"], cam["lens"], cam["film"], cam["aspect"],
    cam["focus"], cam["aperture"], False, gx.astype(jnp.int32),
    gy.astype(jnp.int32), (jnp.float32(W), jnp.float32(H)),
    ox - 0.5, oy - 0.5, state))()

SP = tpu.sl_stride
n_sl = tpu.sl_count
from lupinpathtracer_tpu.accel.superleaf import TOP_FAN
S = (TOP_FAN - 1) * tpu.top_depth + TOP_FAN + 2
Q = isx.WF_Q
PB = isx.WF_PAIR_BLOCK
QB = Q * B
W4 = jax.jit(lambda s: isx._wavefront_tri_matrix(s))(tpu)


def mat(x):
    return jax.tree.map(lambda a: jax.device_put(np.asarray(a)), x)


# One real round-1 state.
@jax.jit
def round1(ro, rd):
    init_stack = jnp.zeros((S, B), jnp.int32)
    init_sp = jnp.ones(B, jnp.int32)
    init_bt = jnp.full(B, F32_MAX)
    sl, cnt, _, _, cnt_sl, _ = pb.top_traverse(
        tpu.top_tab, ro, rd, init_bt, init_stack, init_sp, S=S, Q=Q,
        n_sl=n_sl)
    pair_sl = sl.reshape(-1)
    key = jnp.where(pair_sl >= 0, pair_sl, n_sl).astype(jnp.int32)
    sidx = jnp.arange(QB, dtype=jnp.int32)
    skey, s_sidx, srox, sroy, sroz, srdx, srdy, srdz = jax.lax.sort(
        (key, sidx,
         jnp.tile(ro.x, Q), jnp.tile(ro.y, Q), jnp.tile(ro.z, Q),
         jnp.tile(rd.x, Q), jnp.tile(rd.y, Q), jnp.tile(rd.z, Q)),
        num_keys=1)
    items = isx._wf_work_items(skey, n_sl, PB, cnt_sl)
    return (srox, sroy, sroz, srdx, srdy, srdz) + items


(srox, sroy, sroz, srdx, srdy, srdz, blk_k, sl_k, lo_k, hi_k, n_real,
 n_items) = mat(round1(mat(ro), mat(rd)))
print(f"n_items={int(n_items)} n_real={int(n_real)} QB={QB}", flush=True)

W4d = jax.device_put(np.asarray(W4))
eps = 1e-3
REPS = 10


def timeit(name, fn, *args):
    def loop(*a):
        def body(i, acc):
            out = fn(i, *a)
            return acc + jnp.sum(out[0].astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    f = jax.jit(loop)
    try:
        r = f(*args)
        r.block_until_ready()
        t0 = time.time()
        r = f(*args)
        r.block_until_ready()
        dt = (time.time() - t0) / REPS * 1000
        print(f"{name:58s} {dt:8.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:58s} FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)


def make_kernel(variant, TB, PBv):
    def kern(blk_ref, sl_ref, msl_ref, lo_ref, hi_ref, inst_ref, txf_ref,
             rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref, pos_ref,
             W_ref, eps_ref, t_ref, u_ref, v_ref, det_ref, idx_ref,
             scr_f_ref, scr_i_ref):
        k = pl.program_id(0)
        lo = lo_ref[k]
        hi = hi_ref[k]

        @pl.when(hi > lo)
        def _run():
            def vec(ref):
                return ref[0].reshape(-1)

            rox, roy, roz = vec(rox_ref), vec(roy_ref), vec(roz_ref)
            rdx, rdy, rdz = vec(rdx_ref), vec(rdy_ref), vec(rdz_ref)
            cx = roy * rdz - roz * rdy
            cy = roz * rdx - rox * rdz
            cz = rox * rdy - roy * rdx
            RT = jnp.stack(
                [rdx, rdy, rdz, cx, cy, cz, rox, roy, roz,
                 jnp.ones_like(rox)], axis=0)
            SPk = W_ref.shape[2]
            epsv = eps_ref[0]
            nb = SPk // TB
            trow = jax.lax.broadcasted_iota(jnp.int32, (TB, PBv), 0)
            dims = (((0,), (0,)), ((), ()))

            def dot(a, b):
                return jax.lax.dot_general(
                    a, b, dims, preferred_element_type=jnp.float32)

            Rhi = RT.astype(jnp.bfloat16)
            Rlo = (RT - Rhi.astype(jnp.float32)).astype(jnp.bfloat16)

            def body(kk, carry):
                bt, bidx = carry
                off = kk * TB
                Wblk = jnp.concatenate(
                    [W_ref[f, :, pl.ds(off, TB)] for f in range(4)], axis=1)
                Whi = Wblk.astype(jnp.bfloat16)
                Wlo = (Wblk - Whi.astype(jnp.float32)).astype(jnp.bfloat16)
                M = dot(Whi, Rhi) + dot(Whi, Rlo) + dot(Wlo, Rhi)
                det = M[0:TB]
                nu = M[TB:2 * TB]
                nv = M[2 * TB:3 * TB]
                nt = M[3 * TB:4 * TB]
                if variant == "V5":  # eval floor: cheapest possible select
                    blk_t = jnp.min(nt, axis=0)
                    return (jnp.minimum(bt, blk_t), bidx)
                if variant in ("V1", "V3"):
                    ad = jax.lax.rsqrt(det * det)
                    t = nt * ad
                    t = jnp.where(det < 0.0, -t, t)
                    valid = ((nu * det >= 0.0) & (nv * det >= 0.0)
                             & ((det - nu - nv) * det >= 0.0)
                             & (t >= epsv))
                else:
                    d = 1.0 / det
                    t = nt * d
                    u = nu * d
                    vv = nv * d
                    valid = ((u >= 0.0) & (vv >= 0.0) & (u + vv <= 1.0)
                             & (t >= epsv))
                tt = jnp.where(valid, t, F32_MAX)
                blk_t = jnp.min(tt, axis=0)
                at_min = tt <= blk_t[None, :]
                blk_idx = jnp.min(jnp.where(at_min, trow, 2 ** 30), axis=0)
                upd = blk_t < bt
                return (jnp.where(upd, blk_t, bt),
                        jnp.where(upd, blk_idx + off, bidx))

            init = (jnp.full((PBv,), F32_MAX), jnp.zeros((PBv,), jnp.int32))
            bt, bidx = jax.lax.fori_loop(0, nb, body, init)

            if variant in ("V0", "V1", "V4"):
                srow_sp = jax.lax.broadcasted_iota(jnp.int32, (SPk, PBv), 0)
                ohw = (srow_sp == bidx[None, :]).astype(jnp.float32)
                dims2 = (((1,), (0,)), ((), ()))

                def pick_rows(f):
                    return jax.lax.dot_general(
                        W_ref[f], ohw, dims2,
                        preferred_element_type=jnp.float32)

                wdet = jnp.sum(pick_rows(0) * RT, axis=0)
                wnu = jnp.sum(pick_rows(1) * RT, axis=0)
                wnv = jnp.sum(pick_rows(2) * RT, axis=0)
                wnt = jnp.sum(pick_rows(3) * RT, axis=0)
                wd = 1.0 / wdet
                bu, bv, bdet = wnu * wd, wnv * wd, wdet
                bt = jnp.where(bt < F32_MAX, wnt * wd, bt)
            else:
                bu = bv = bdet = jnp.zeros((PBv,), jnp.float32)

            m2 = (pos_ref[0] >= lo) & (pos_ref[0] < hi)
            sh = t_ref.shape[1:]
            gtri = bidx + sl_ref[k] * SPk

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
            idx_ref[0] = jnp.where(m2, to2d_i(gtri), idx_ref[0])

    return kern


def run_variant(variant, TB, PBv, blk, sl, lo, hi, rx, ry, rz, dx, dy, dz,
                n_it):
    n_items_s = blk.shape[0]
    P = rx.shape[0]
    n_pb = P // PBv
    sub = PBv // 128
    msl = sl
    inst = jnp.zeros((n_items_s,), jnp.int32)
    txf = jnp.asarray([[1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0, 0]],
                      jnp.float32)
    vec_spec = pl.BlockSpec(
        (1, sub, 128), lambda i, b, s, ms, l, h, it, tx: (b[i], 0, 0),
        memory_space=pltpu.VMEM)
    vs = lambda dt: jax.ShapeDtypeStruct((n_pb, sub, 128), dt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(n_it,),
        in_specs=[vec_spec] * 7 + [
            pl.BlockSpec((4, 10, SP),
                         lambda i, b, s, ms, l, h, it, tx: (0, 0, ms[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(vec_spec,) * 5,
        scratch_shapes=[pltpu.VMEM((sub, 128), jnp.float32),
                        pltpu.VMEM((sub, 128), jnp.int32)])

    def shape3(x):
        return x.reshape(n_pb, sub, 128)

    return pl.pallas_call(
        make_kernel(variant, TB, PBv),
        grid_spec=grid_spec,
        out_shape=(vs(jnp.float32),) * 4 + (vs(jnp.int32),),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(blk, sl, msl, lo, hi, inst, txf,
      shape3(rx), shape3(ry), shape3(rz), shape3(dx), shape3(dy), shape3(dz),
      shape3(jnp.arange(P, dtype=jnp.int32)),
      W4d, jnp.reshape(jnp.asarray(eps, jnp.float32), (1,)))


ray6 = (srox, sroy, sroz, srdx, srdy, srdz)
for variant, TB, PBv in (("V0", 512, 256), ("V1", 512, 256),
                         ("V2", 512, 256), ("V3", 512, 256),
                         ("V4", 1024, 256), ("V5", 512, 256)):
    if PBv != 256:
        continue
    timeit(f"[{variant}] TB={TB} PB={PBv}",
           lambda i, *a: run_variant(variant, TB, PBv, blk_k, sl_k, lo_k,
                                     jnp.minimum(hi_k + i * 0, hi_k), *a,
                                     n_items),
           *ray6)

# Pure grid overhead: same item count, every item empty (lo == hi).
timeit("[GRID] all-empty items (per-step overhead)",
       lambda i, *a: run_variant("V0", 512, 256, blk_k, sl_k, lo_k,
                                 jnp.minimum(lo_k, lo_k + i * 0), *a,
                                 n_items),
       *ray6)
print("done", flush=True)
