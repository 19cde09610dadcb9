"""Phase decomposition of ONE sort-wavefront round on arealights1 (TPU).

BENCH_r04: a 131k-ray closest-hit call costs ~25 ms on the sort backend
(both camera and bounce batches) => ~5 Mrays/s per call, the structural
ceiling behind the 2.49 Mrays/s full-path number. The round is
  top_traverse -> 8-operand QB-sort -> work items -> pair_intersect
  -> 6-operand unsort -> per-ray min fold
(kernels/intersect.py::_wf_round). This times each phase ALONE with
realistic intermediates so round-5 optimization starts from a measured
split, not the r4 guess that "the sorts dominate". Incremental output.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

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

W, H = 512, 256
B = W * H  # 131072

scene, cams = yocto_json.load_scene_yoctogl_v24(
    "/root/reference/test_scenes/arealights1/arealights1.json"
)
tpu = build_scene_tpu(scene)
print(f"n_sl={tpu.sl_count} stride={tpu.sl_stride} depth={tpu.top_depth}",
      flush=True)

desc = PathtraceDesc()
desc.camera_transform = cams[1].transform
desc.camera_params = cams[1].params
cam = _camera_args(desc)


def make_rays():
    gx = jnp.broadcast_to(jnp.arange(W)[None, :], (H, W)).reshape(-1)
    gy = jnp.broadcast_to(jnp.arange(H)[:, None], (H, W)).reshape(-1)
    pix = (gy * W + gx).astype(jnp.uint32)
    state = rng_mod.init_state(pix, 0, 0, 0)
    state, ox = rng_mod.next_f32(state)
    state, oy = rng_mod.next_f32(state)
    return compute_camera_ray(
        cam["cam_transform"], cam["lens"], cam["film"], cam["aspect"],
        cam["focus"], cam["aperture"], False, gx.astype(jnp.int32),
        gy.astype(jnp.int32), (jnp.float32(W), jnp.float32(H)),
        ox - 0.5, oy - 0.5, state,
    )


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(jnp.abs(leaves[0].astype(jnp.float32))))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    s = float(jnp.sum(jnp.abs(leaves[0].astype(jnp.float32))))
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:52s} {dt:8.2f} ms  (chk {s:.4g})", flush=True)
    return dt, out


def mat(x):
    return jax.tree.map(
        lambda a: jax.device_put(np.asarray(a)), x
    )


state, ro, rd = jax.jit(lambda: make_rays())()
ro, rd = mat(ro), mat(rd)

# Bounce rays: diffuse scatter off the camera hits (divergent regime).
h = jax.jit(lambda s, o, d: isx.closest_hit_wavefront(s, o, d, 1e-3))(
    tpu, ro, rd)
pos = v3.V3(ro.x + rd.x * h.dst, ro.y + rd.y * h.dst, ro.z + rd.z * h.dst)
g = np.random.default_rng(1)
dn = g.normal(size=(3, B)).astype(np.float32)
dn[1] = np.abs(dn[1])
dn /= np.linalg.norm(dn, axis=0, keepdims=True)
bro = mat(v3.V3(pos.x, pos.y + 1e-3, pos.z))
brd = mat(v3.V3(*(jnp.asarray(dn[i]) for i in range(3))))
bact = mat(h.hit)

SP = tpu.sl_stride
n_sl = tpu.sl_count
from lupinpathtracer_tpu.accel.superleaf import TOP_FAN
S = (TOP_FAN - 1) * tpu.top_depth + TOP_FAN + 2
Q = isx.WF_Q
PB = isx.WF_PAIR_BLOCK
Bp = B  # already a multiple of WF_RAY_BLOCK
QB = Q * Bp
W4 = jax.jit(lambda s: isx._wavefront_tri_matrix(s))(tpu)
W4 = jax.device_put(np.asarray(W4))

print(f"S={S} Q={Q} PB={PB} QB={QB}", flush=True)

for tag, xro, xrd in (("camera", ro, rd), ("bounce", bro, brd)):
    print(f"--- {tag} rays ---", flush=True)
    # Reference: the full call.
    f_full = jax.jit(lambda s, o, d: isx.closest_hit_wavefront(s, o, d, 1e-3))
    timeit(f"[{tag}] FULL closest_hit_wavefront", f_full, tpu, xro, xrd)

    init_stack = jnp.zeros((S, Bp), jnp.int32)
    init_sp = jnp.ones(Bp, jnp.int32)
    init_bt = jnp.full(Bp, isx.F32_MAX)

    # Phase 1: top_traverse kernel alone (round-1 state).
    f_top = jax.jit(lambda tab, o, d, bt, st, sp: pb.top_traverse(
        tab, o, d, bt, st, sp, S=S, Q=Q, n_sl=n_sl))
    _, top_out = timeit(f"[{tag}] phase1 top_traverse", f_top,
                        tpu.top_tab, xro, xrd, init_bt, init_stack, init_sp)
    sl, cnt, stack1, sp1, cnt_sl, aabb = mat(top_out)

    # Phase 2: the grouping sort (8 operands over QB).
    def group_sort(sl, rox, roy, roz, rdx, rdy, rdz):
        pair_sl = sl.reshape(-1)
        key = jnp.where(pair_sl >= 0, pair_sl, n_sl).astype(jnp.int32)
        sidx = jnp.arange(QB, dtype=jnp.int32)
        return jax.lax.sort(
            (key, sidx,
             jnp.tile(rox, Q), jnp.tile(roy, Q), jnp.tile(roz, Q),
             jnp.tile(rdx, Q), jnp.tile(rdy, Q), jnp.tile(rdz, Q)),
            num_keys=1)

    f_sort = jax.jit(group_sort)
    _, sorted_out = timeit(f"[{tag}] phase2 group sort (8 ops, QB)", f_sort,
                           sl, xro.x, xro.y, xro.z, xrd.x, xrd.y, xrd.z)
    skey, s_sidx, srox, sroy, sroz, srdx, srdy, srdz = mat(sorted_out)

    # Phase 2b: key-only sort (what a packed single-operand sort would cost).
    def sort_small(sl):
        pair_sl = sl.reshape(-1)
        key = jnp.where(pair_sl >= 0, pair_sl, n_sl).astype(jnp.int32)
        sidx = jnp.arange(QB, dtype=jnp.int32)
        packed = key * (1 << 20) + sidx
        return jax.lax.sort((packed,), num_keys=1)

    timeit(f"[{tag}] phase2b packed 1-op sort (QB)", jax.jit(sort_small), sl)

    # Phase 3: work items.
    f_items = jax.jit(lambda skey, cnt_sl: isx._wf_work_items(
        skey, n_sl, PB, cnt_sl))
    _, items = timeit(f"[{tag}] phase3 work items", f_items, skey, cnt_sl)
    blk_k, sl_k, lo_k, hi_k, n_real, n_items = mat(items)

    # Phase 4: pair_intersect kernel alone.
    def f_pair(blk_k, sl_k, lo_k, hi_k, srox, sroy, sroz, srdx, srdy, srdz,
               W4, n_items):
        return pb.pair_intersect(
            blk_k, sl_k, lo_k, hi_k,
            v3.V3(srox, sroy, sroz), v3.V3(srdx, srdy, srdz),
            W4, 1e-3, SP=SP, pair_block=PB, n_items_dyn=n_items)

    _, pres = timeit(f"[{tag}] phase4 pair_intersect", jax.jit(f_pair),
                     blk_k, sl_k, lo_k, hi_k, srox, sroy, sroz,
                     srdx, srdy, srdz, W4, n_items)
    t, u, v, det, gtri = mat(pres)

    # Phase 5: unsort (6 operands over QB).
    def f_unsort(s_sidx, t, u, v, det, gtri):
        return jax.lax.sort((s_sidx, t, u, v, det, gtri), num_keys=1)

    timeit(f"[{tag}] phase5 unsort (6 ops, QB)", jax.jit(f_unsort),
           s_sidx, t, u, v, det, gtri)

    # Phase 6: min fold.
    def f_fold(t, u, v, det, gtri):
        t_q = t.reshape(Q, Bp)
        acc = jnp.full(Bp, isx.F32_MAX)
        for q in range(Q):
            acc = jnp.minimum(acc, t_q[q])
        return acc

    timeit(f"[{tag}] phase6 min fold", jax.jit(f_fold), t, u, v, det, gtri)

    # How many rounds does the full call take? Count pending after round 1.
    n_pend = int(jnp.sum((sp1 > 0).astype(jnp.int32)))
    emitted = int(jnp.sum(cnt))
    print(f"[{tag}] after round1: pending={n_pend} emitted={emitted} "
          f"avg_emit={emitted / Bp:.2f} n_items={int(n_items)}", flush=True)
print("done", flush=True)
