"""Per-iteration traversal profile of the REAL bench render (arealights1,
512x256, STANDARD, 8 spp, 8 bounces).

prof_glue (2026-08-19) split the 59.5 ms bench iteration into glue 1.35 ms
+ attr fetch 5.4 ms + traversal ~53 ms — i.e. the in-loop closest_hit
costs 2x the 26.7 ms prof_opt measured on a synthetic bounce batch. The
difference must be the RAY MIX: real iterations blend respawned camera
rays with deep-bounce rays, and when >LUPIN_WF_TAIL_C lanes are still
pending after round 1, closest_hit_wavefront pays a SECOND full sweep
(intersect.py stage-1 loop) before the compacted tail.

This tool:
  1. captures every iteration's (ro, rd, active) from the real
     pathtrace_spp run via jax.debug.callback (ordered),
  2. replays each captured state through closest_hit alone (one compile,
     amortized timing) -> the per-iteration traversal cost curve,
  3. drives _wf_round from the HOST on selected states -> full-round
     count + pending trajectory + per-round time,
  4. sweeps {LUPIN_WF_Q_DIV, LUPIN_WF_TAIL_C, LUPIN_WF_Q_TAIL} on the
     slowest captured state (fresh function objects per variant — jit
     caches traces per function, see prof_glue's [GLUE] bug).
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
from lupinpathtracer_tpu.core.types import PathtraceDesc, PathtraceType
from lupinpathtracer_tpu.core.vec3 import V3
from lupinpathtracer_tpu.io import yocto_json
from lupinpathtracer_tpu.kernels import intersect as isx
from lupinpathtracer_tpu.kernels import pallas_bvh as pb
from lupinpathtracer_tpu.render import integrators
from lupinpathtracer_tpu.render.renderer import _camera_args
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu
from lupinpathtracer_tpu.accel.superleaf import TOP_FAN

W, H = 512, 256
B = W * H
SPP = 8
BOUNCES = 8
EPS = 1e-3

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

gx = jnp.broadcast_to(jnp.arange(W)[None, :], (H, W)).reshape(-1).astype(jnp.int32)
gy = jnp.broadcast_to(jnp.arange(H)[:, None], (H, W)).reshape(-1).astype(jnp.int32)
pix = (gy * W + gx).astype(jnp.uint32)
res = (jnp.float32(W), jnp.float32(H))

# ---- 1. load captured states ---------------------------------------------
# Per-iteration ray states exist only at RUNTIME (pathtrace_spp's loop is
# a lax.while_loop) and the runtime escape hatch, debug.callback, does not
# compile on the axon remote-compile path (out_hw/prof_iter{3,4}.log) nor
# can tracers from the loop body be returned (prof_iter6's
# UnexpectedTracerError). tools/prof_iter_capture.py captures them on CPU
# (same shading/RNG math); this tool replays them on the TPU.
STATES = "out_hw/iter_states.npz"
if not os.path.exists(STATES):
    sys.exit(f"{STATES} missing — run tools/prof_iter_capture.py first "
             "(CPU, ~10-20 min)")
z = np.load(STATES)
captured = [
    tuple(z[k][i] for k in ("rox", "roy", "roz", "rdx", "rdy", "rdz", "act"))
    for i in range(z["rox"].shape[0])
]
print(f"loaded {len(captured)} iteration states "
      f"(actives: {[int(s[6].sum()) for s in captured]})", flush=True)

ctxW = integrators.make_ctx(tpu, jnp.float32(EPS))["W"]


def put(st):
    rox, roy, roz, rdx, rdy, rdz, act = (jax.device_put(a) for a in st)
    return V3(rox, roy, roz), V3(rdx, rdy, rdz), act


# ---- 2. replay timing ----------------------------------------------------
def mk_replay():
    def replay(sc, Wm, rox, roy, roz, rdx, rdy, rdz, act):
        h = isx.closest_hit(sc, V3(rox, roy, roz), V3(rdx, rdy, rdz),
                            jnp.float32(EPS), W=Wm, active=act,
                            coherent=False)
        return h.dst

    return replay


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    float(jnp.sum(jnp.abs(out)))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    s = float(jnp.sum(jnp.abs(jnp.where(jnp.isfinite(out), out, 0.0))))
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:56s} {dt:8.2f} ms  (chk {s:.4g})", flush=True)
    return dt


f_replay = jax.jit(mk_replay())
times = []
for k in range(len(captured)):
    ro, rd, act = put(captured[k])
    dt = timeit(f"[replay] iter {k:2d} n_active={int(act.sum()):6d}",
                f_replay, tpu, ctxW, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z,
                act, reps=2)
    times.append(dt)
worst = int(np.argmax(times[1:])) + 1  # skip the camera prologue
print(f"sum over iters = {sum(times):.1f} ms; worst iter = {worst} "
      f"({times[worst]:.2f} ms)", flush=True)

# ---- 3. host-driven rounds on selected states ---------------------------
S = (TOP_FAN - 1) * tpu.top_depth + TOP_FAN + 2
PB = isx.WF_PAIR_BLOCK


def mk_round(Q):
    def round_fn(sc, Wm, rox, roy, roz, rdx, rdy, rdz, c):
        return isx._wf_round(sc, Wm, jnp.float32(EPS), V3(rox, roy, roz),
                             V3(rdx, rdy, rdz), c, S=S, PB=PB, Q=Q)

    return round_fn


def host_rounds(k, Q):
    ro, rd, act = put(captured[k])
    Bp = B  # 131072 is already WF_RAY_BLOCK-aligned
    c = dict(
        stack=jnp.zeros((S, Bp), jnp.int32),
        sp=act.astype(jnp.int32),
        best_t=jnp.full(Bp, isx.F32_MAX),
        best_u=jnp.zeros(Bp, jnp.float32),
        best_v=jnp.zeros(Bp, jnp.float32),
        best_det=jnp.zeros(Bp, jnp.float32),
        best_tri=jnp.zeros(Bp, jnp.int32),
    )
    f = jax.jit(mk_round(Q))
    # warm
    _ = f(tpu, ctxW, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, c)
    float(jnp.sum(_["best_t"][:8]))
    rounds = 0
    pend = int(jnp.sum((c["sp"] > 0).astype(jnp.int32)))
    while pend > 0 and rounds < 12:
        t0 = time.time()
        c = f(tpu, ctxW, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, c)
        pend = int(jnp.sum((c["sp"] > 0).astype(jnp.int32)))
        dt = (time.time() - t0) * 1000
        rounds += 1
        print(f"  [iter {k} Q={Q}] round {rounds}: {dt:7.2f} ms "
              f"pending -> {pend}", flush=True)


for k in (1, worst):
    host_rounds(k, isx.WF_Q_DIVERGENT)

# ---- 4. env sweep on the worst state ------------------------------------
ro_w, rd_w, act_w = put(captured[worst])
VARIANTS = [
    dict(),  # base is now Q_DIV=8 (default flipped after prof_e2e)
    dict(LUPIN_WF_Q_DIV="4"),
    dict(LUPIN_WF_Q_DIV="16"),
    dict(LUPIN_WF_TAIL_C="8192"),
    dict(LUPIN_WF_TAIL_C="16384", LUPIN_WF_Q_TAIL="16"),
    dict(LUPIN_WF_Q_TAIL="64"),
]
for env in VARIANTS:
    olds = {k_: os.environ.get(k_) for k_ in env}
    os.environ.update(env)
    try:
        f_v = jax.jit(mk_replay())  # fresh function object => fresh trace
        tag = ",".join(f"{k_}={v_}" for k_, v_ in env.items()) or "base"
        timeit(f"[sweep iter {worst}] {tag}", f_v, tpu, ctxW,
               ro_w.x, ro_w.y, ro_w.z, rd_w.x, rd_w.y, rd_w.z, act_w,
               reps=3)
    except Exception as e:
        print(f"[sweep] {env} FAILED {type(e).__name__}: {e}", flush=True)
    finally:
        for k_, v_ in olds.items():
            if v_ is None:
                os.environ.pop(k_, None)
            else:
                os.environ[k_] = v_

print("done", flush=True)
