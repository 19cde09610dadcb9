"""Sub-op decomposition of _wf_work_items + top_traverse RB sweep (TPU).

prof_sort (amortized): work items = 3.0 ms despite operating on (669,) /
(4765,) arrays; top_traverse = 4.6 ms. This isolates which tiny op eats
the 3 ms (cumsum? searchsorted method="sort"? cummax? the small gathers?)
and whether a bigger top ray_block amortizes the while-loop's scalar
overhead (iterations scale with blocks x max-pops).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("LUPIN_SKIP_PROBE", "1")

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
REPS = 20


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
        print(f"{name:58s} {dt:8.3f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{name:58s} FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)


init_stack = jnp.zeros((S, B), jnp.int32)
init_sp = jnp.ones(B, jnp.int32)
init_bt = jnp.full(B, F32_MAX)

# --- top_traverse ray_block sweep ---
for rb in (2048, 4096, 8192):
    timeit(f"[TOP] ray_block={rb}",
           lambda i, o, d, rb=rb: pb.top_traverse(
               tpu.top_tab, v3.V3(o.x + i * 0.0, o.y, o.z), d, init_bt,
               init_stack, init_sp, S=S, Q=Q, n_sl=n_sl, ray_block=rb),
           ro, rd)

# --- work-items sub-ops ---
sl, cnt, _, _, cnt_sl, _ = mat(jax.jit(
    lambda o, d: pb.top_traverse(tpu.top_tab, o, d, init_bt, init_stack,
                                 init_sp, S=S, Q=Q, n_sl=n_sl))(ro, rd))
skey = mat(jax.jit(lambda s: jax.lax.sort(
    (jnp.where(s.reshape(-1) >= 0, s.reshape(-1), n_sl).astype(jnp.int32),),
    num_keys=1)[0])(sl))

timeit("[WI] full _wf_work_items",
       lambda i, sk, cs: isx._wf_work_items(sk, n_sl, PB, cs + i * 0),
       skey, cnt_sl)

n_pb = QB // PB
W_CAP = n_pb + min(n_sl, QB)
karr_c = jnp.arange(W_CAP, dtype=jnp.int32)

timeit("[WI] cumsum(cnt_sl) -> seg_start",
       lambda i, cs: jnp.concatenate(
           [jnp.zeros(1, jnp.int32), jnp.cumsum(cs[:n_sl] + i * 0)]
       ).astype(jnp.int32),
       cnt_sl)

seg = mat(jax.jit(lambda cs: jnp.concatenate(
    [jnp.zeros(1, jnp.int32), jnp.cumsum(cs[:n_sl])]).astype(jnp.int32))(
    cnt_sl))


def mid(i, seg):
    seg = seg + i * 0
    cnt = seg[1:] - seg[:n_sl + 1 - 1]
    first_blk = seg[:n_sl] // PB
    last_blk = jnp.maximum(seg[1:] - 1, seg[:n_sl]) // PB
    n_items_s = jnp.where(cnt > 0, last_blk - first_blk + 1, 0)
    ioff = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(n_items_s)])
    return ioff


timeit("[WI] per-sl blocks + ioff cumsum", mid, seg)
ioff = mat(jax.jit(lambda s: mid(0, s))(seg))

timeit("[WI] searchsorted(ioff, karr, method=sort)",
       lambda i, io: jnp.searchsorted(
           io[1:] + i * 0, karr_c, side="right", method="sort"
       ).astype(jnp.int32),
       ioff)
s_k = mat(jax.jit(lambda io: jnp.minimum(jnp.searchsorted(
    io[1:], karr_c, side="right", method="sort").astype(jnp.int32),
    n_sl - 1))(ioff))

timeit("[WI] 4 gathers first_blk/seg/ioff by s_k",
       lambda i, sk, sg, io: (
           (sg[:n_sl] // PB)[sk + i * 0] + sg[sk] + sg[sk + 1] + io[sk]),
       s_k, seg, ioff)

timeit("[WI] cummax x2 over (W_CAP,)",
       lambda i, sk: (
           jax.lax.cummax(jnp.where(karr_c < 1000, sk + i * 0, -1)),
           jax.lax.cummax(jnp.where(karr_c < 1000, karr_c, -1))),
       s_k)
print("done", flush=True)
