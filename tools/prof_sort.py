"""Amortized (fori-loop) phase timing of the sort-wavefront round.

tools/prof_round.py timed each phase as a separate jit call; the pair-
kernel ablation (prof_pair) showed that carries a ~5-10 ms dispatch floor
on the axon tunnel — its absolute numbers are NOT trustworthy. This
re-times every phase amortized (one jit, REPS iterations via
lax.fori_loop, iteration index perturbing an operand to defeat hoisting),
plus the FULL call, so round-5 optimization targets real costs.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("LUPIN_SKIP_PROBE", "1")
os.environ["LUPIN_NO_PACKET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

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
st0 = rng_mod.init_state(pix, 0, 0, 0)
st0, jx = rng_mod.next_f32(st0)
st0, jy = rng_mod.next_f32(st0)
_, ro, rd = jax.jit(lambda: compute_camera_ray(
    cam["cam_transform"], cam["lens"], cam["film"], cam["aspect"],
    cam["focus"], cam["aperture"], False, gx.astype(jnp.int32),
    gy.astype(jnp.int32), (jnp.float32(W), jnp.float32(H)),
    jx - 0.5, jy - 0.5, st0))()


def mat(x):
    return jax.tree.map(lambda a: jax.device_put(np.asarray(a)), x)


ro, rd = mat(ro), mat(rd)
SP = tpu.sl_stride
n_sl = tpu.sl_count
from lupinpathtracer_tpu.accel.superleaf import TOP_FAN
S = (TOP_FAN - 1) * tpu.top_depth + TOP_FAN + 2
Q = isx.WF_Q
PB = isx.WF_PAIR_BLOCK
QB = Q * B
REPS = 10


def timeit(name, fn, *args):
    def loop(*a):
        def body(i, acc):
            out = fn(i, *a)
            leaves = jax.tree_util.tree_leaves(out)
            return acc + jnp.sum(leaves[0].astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    f = jax.jit(loop)
    try:
        r = f(*args); r.block_until_ready()
        t0 = time.time()
        r = f(*args); r.block_until_ready()
        dt = (time.time() - t0) / REPS * 1000
        print(f"{name:58s} {dt:8.2f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{name:58s} FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)
        return None


# FULL sort-backend call (camera order; prof_opt got 20.91 in tile order).
timeit("[FULL] closest_hit_wavefront (sort, row-major cam)",
       lambda i, o, d: isx.closest_hit_wavefront(
           tpu, v3.V3(o.x + i * 0.0, o.y, o.z), d, 1e-3),
       ro, rd)

# Phase pieces with realistic intermediates.
init_stack = jnp.zeros((S, B), jnp.int32)
init_sp = jnp.ones(B, jnp.int32)
init_bt = jnp.full(B, F32_MAX)
timeit("[P1] top_traverse (round-1 state)",
       lambda i, o, d: pb.top_traverse(
           tpu.top_tab, v3.V3(o.x + i * 0.0, o.y, o.z), d, init_bt,
           init_stack, init_sp, S=S, Q=Q, n_sl=n_sl),
       ro, rd)

sl, cnt, _, _, cnt_sl, _ = mat(jax.jit(
    lambda o, d: pb.top_traverse(tpu.top_tab, o, d, init_bt, init_stack,
                                 init_sp, S=S, Q=Q, n_sl=n_sl))(ro, rd))


def group_sort(i, sl, o, d):
    pair_sl = sl.reshape(-1)
    key = jnp.where(pair_sl >= 0, pair_sl, n_sl).astype(jnp.int32) + i * 0
    sidx = jnp.arange(QB, dtype=jnp.int32)
    return jax.lax.sort(
        (key, sidx,
         jnp.tile(o.x, Q), jnp.tile(o.y, Q), jnp.tile(o.z, Q),
         jnp.tile(d.x, Q), jnp.tile(d.y, Q), jnp.tile(d.z, Q)),
        num_keys=1)


timeit("[P2] group sort 8 ops (QB)", group_sort, sl, ro, rd)
timeit("[P2b] group sort 2 ops (key+sidx only)",
       lambda i, sl: jax.lax.sort(
           (jnp.where(sl.reshape(-1) >= 0, sl.reshape(-1),
                      n_sl).astype(jnp.int32) + i * 0,
            jnp.arange(QB, dtype=jnp.int32)), num_keys=1),
       sl)

sres = mat(jax.jit(lambda sl, o, d: group_sort(0, sl, o, d))(sl, ro, rd))
skey, s_sidx, srox, sroy, sroz, srdx, srdy, srdz = sres

timeit("[P3] work items (cnt_sl cumsum path)",
       lambda i, sk, cs: isx._wf_work_items(sk, n_sl, PB, cs + i * 0),
       skey, cnt_sl)

items = mat(jax.jit(
    lambda sk, cs: isx._wf_work_items(sk, n_sl, PB, cs))(skey, cnt_sl))
blk_k, sl_k, lo_k, hi_k, n_real, n_items = items
W4 = jax.device_put(np.asarray(
    jax.jit(lambda s: isx._wavefront_tri_matrix(s))(tpu)))

timeit("[P4] pair_intersect",
       lambda i, *a: pb.pair_intersect(
           blk_k, sl_k, lo_k, jnp.minimum(hi_k + i * 0, hi_k),
           v3.V3(a[0], a[1], a[2]), v3.V3(a[3], a[4], a[5]),
           W4, 1e-3, SP=SP, pair_block=PB, n_items_dyn=n_items),
       srox, sroy, sroz, srdx, srdy, srdz)

pres = mat(jax.jit(lambda: pb.pair_intersect(
    blk_k, sl_k, lo_k, hi_k, v3.V3(srox, sroy, sroz),
    v3.V3(srdx, srdy, srdz), W4, 1e-3, SP=SP, pair_block=PB,
    n_items_dyn=n_items))())
t_, u_, v_, det_, gtri_ = pres

timeit("[P5] unsort 6 ops (QB)",
       lambda i, *a: jax.lax.sort((a[0] + i * 0, *a[1:]), num_keys=1),
       s_sidx, t_, u_, v_, det_, gtri_)
timeit("[P5b] unsort 3 ops (sidx, t, tri)",
       lambda i, *a: jax.lax.sort((a[0] + i * 0, *a[1:]), num_keys=1),
       s_sidx, t_, gtri_)


def fold(i, t, u, v, det, tri):
    perm = jax.lax.sort((s_sidx + i * 0, t, u, v, det, tri), num_keys=1)
    t_q = perm[1].reshape(Q, B)
    acc = jnp.full(B, F32_MAX)
    bu = jnp.zeros(B)
    for q in range(Q):
        wn = t_q[q] < acc
        acc = jnp.where(wn, t_q[q], acc)
        bu = jnp.where(wn, perm[2].reshape(Q, B)[q], bu)
    return acc, bu


timeit("[P5+6] unsort + fold (2 of 5 payloads)", fold,
       t_, u_, v_, det_, gtri_)

# Attr fetch on the resulting hits (the other big per-bounce cost).
h = mat(jax.jit(lambda o, d: isx.closest_hit_wavefront(
    tpu, o, d, 1e-3))(ro, rd))
timeit("[ATTR] wavefront_fetch_attrs (camera hits)",
       lambda i, hh: isx.wavefront_fetch_attrs(
           tpu, hh.replace(dst=hh.dst + i * 0.0)),
       h)
print("done", flush=True)
