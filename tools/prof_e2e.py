"""End-to-end pathtrace_spp sweep over the round-5 perf levers on the
bench's arealights1 config (512x256, STANDARD, 8 spp, 8 bounces, cam 1).

Levers (all trace-time constants read from env, so each variant jits a
fresh function object — the jit cache keys on the function, not the env):
  LUPIN_SPP_STREAMS  — K concurrent sample streams (lane count x K,
                       iteration count / K; amortizes per-round fixed
                       phase floors, out_hw/prof_sort.log ~3 ms each)
  LUPIN_WF_TAIL_C    — straggler-compaction capacity: raising it converts
                       a second FULL 131k-lane round into one compacted
                       round (prof_glue: in-loop trace 52.8 ms/iter vs
                       26.7 ms isolated => ~2 full rounds today)
  LUPIN_WF_Q_DIV     — emission slots per divergent round (QB = Q x B
                       drives the sort/pair bandwidth term)

Prints one line per variant: full-dispatch ms + derived Mrays/s using the
honest traced-segment count.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("LUPIN_SKIP_PROBE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from lupinpathtracer_tpu.core import rng as rng_mod
from lupinpathtracer_tpu.core.types import PathtraceDesc, PathtraceType
from lupinpathtracer_tpu.io import yocto_json
from lupinpathtracer_tpu.render import integrators
from lupinpathtracer_tpu.render.renderer import _camera_args
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu

W, H = 512, 256
B = W * H
SPP = 8
BOUNCES = 8

scene, cams = yocto_json.load_scene_yoctogl_v24(
    "/root/reference/test_scenes/arealights1/arealights1.json"
)
tpu = build_scene_tpu(scene)
print(f"n_sl={tpu.sl_count} stride={tpu.sl_stride}", flush=True)

desc = PathtraceDesc()
desc.camera_transform = cams[1].transform
desc.camera_params = cams[1].params
cam = _camera_args(desc)

gx = jnp.broadcast_to(jnp.arange(W)[None, :], (H, W)).reshape(-1).astype(jnp.int32)
gy = jnp.broadcast_to(jnp.arange(H)[:, None], (H, W)).reshape(-1).astype(jnp.int32)
pix = (gy * W + gx).astype(jnp.uint32)
res = (jnp.float32(W), jnp.float32(H))


def mk_run(streams):
    def run(sc):
        ctx = integrators.make_ctx(sc, jnp.float32(1e-3))
        acc, n = integrators.pathtrace_spp(
            sc, ctx, pix, gx, gy, res, cam, False,
            jnp.uint32(1), jnp.uint32(0), SPP, int(PathtraceType.STANDARD),
            BOUNCES, jnp.float32(10.0), streams=streams,
        )
        return acc.x + acc.y + acc.z, jnp.sum(n.astype(jnp.float32))

    return run


VARIANTS = [
    dict(),
    dict(LUPIN_WF_TAIL_C="16384"),
    dict(LUPIN_WF_TAIL_C="16384", LUPIN_WF_Q_TAIL="16"),
    dict(LUPIN_WF_Q_DIV="2"),
    dict(LUPIN_WF_Q_DIV="8"),
    dict(LUPIN_SPP_STREAMS="2"),
    dict(LUPIN_SPP_STREAMS="4"),
    dict(LUPIN_SPP_STREAMS="4", LUPIN_WF_TAIL_C="16384"),
    dict(LUPIN_SPP_STREAMS="2", LUPIN_WF_TAIL_C="16384"),
]

base_chk = None
for env in VARIANTS:
    olds = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        K = int(env.get("LUPIN_SPP_STREAMS", "1"))
        f = jax.jit(mk_run(K))  # fresh function object => fresh trace
        out, n = f(tpu)
        chk = float(jnp.sum(out))
        n_traced = float(n)
        t0 = time.time()
        REPS = 3
        for _ in range(REPS):
            out, n = f(tpu)
        _ = float(jnp.sum(out))
        dt = (time.time() - t0) / REPS * 1000
        tag = ",".join(f"{k}={v}" for k, v in env.items()) or "base"
        mrays = n_traced / (dt / 1000) / 1e6
        drift = "" if base_chk is None else f" dchk={abs(chk - base_chk) / max(abs(base_chk), 1e-9):.2e}"
        if base_chk is None:
            base_chk = chk
        print(f"[e2e] {tag:48s} {dt:8.2f} ms  {mrays:6.2f} Mrays/s "
              f"(chk {chk:.6g}{drift})", flush=True)
    except Exception as e:
        print(f"[e2e] {env} FAILED {type(e).__name__}: {e}", flush=True)
    finally:
        for k, v in olds.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

print("done", flush=True)
