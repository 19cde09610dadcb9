"""CPU capture of per-iteration ray states for tools/prof_iter.py.

pathtrace_spp's iteration loop is a lax.while_loop (integrators.py:589),
so per-iteration ray states exist only at RUNTIME — they cannot be
returned as traced outputs (prof_iter6's UnexpectedTracerError), and the
runtime escape hatch, jax.debug.callback(ordered=True), does not compile
on the axon remote-compile path (prof_iter3/4's UNAVAILABLE). On CPU the
callback works; ray states are shading/RNG math, identical across
backends, so a CPU capture feeds the TPU replay exactly.

Writes out_hw/iter_states.npz: rox/roy/roz/rdx/rdy/rdz/act stacked
(n_iters, B) in iteration order, for the arealights1 cam1 bench config
(512x256, STANDARD, 8 spp, 8 bounces).
"""

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("LUPIN_SKIP_PROBE", "1")

import jax

jax.config.update("jax_platforms", "cpu")  # env var is silently re-forced

import jax.numpy as jnp
import numpy as np

from lupinpathtracer_tpu.core.types import PathtraceDesc, PathtraceType
from lupinpathtracer_tpu.io import yocto_json
from lupinpathtracer_tpu.kernels import intersect as isx
from lupinpathtracer_tpu.render import integrators
from lupinpathtracer_tpu.render.renderer import _camera_args
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu

W, H = 512, 256
SPP = 8
BOUNCES = 8
EPS = 1e-3

scene, cams = yocto_json.load_scene_yoctogl_v24(
    "/root/reference/test_scenes/arealights1/arealights1.json"
)
tpu = build_scene_tpu(scene)
print(f"n_sl={tpu.sl_count} stride={tpu.sl_stride} "
      f"backend={jax.default_backend()}", flush=True)

desc = PathtraceDesc()
desc.camera_transform = cams[1].transform
desc.camera_params = cams[1].params
cam = _camera_args(desc)

gx = jnp.broadcast_to(jnp.arange(W)[None, :], (H, W)).reshape(-1).astype(jnp.int32)
gy = jnp.broadcast_to(jnp.arange(H)[:, None], (H, W)).reshape(-1).astype(jnp.int32)
pix = (gy * W + gx).astype(jnp.uint32)
res = (jnp.float32(W), jnp.float32(H))

captured = []


def _save(rox, roy, roz, rdx, rdy, rdz, act):
    captured.append(
        tuple(np.asarray(a) for a in (rox, roy, roz, rdx, rdy, rdz, act))
    )
    print(f"  captured iter {len(captured)} "
          f"(active {int(np.asarray(act).sum())})", flush=True)


real_cha = isx.closest_hit_attrs


def capture_cha(sc, ro, rd, eps, W=None, active=None, coherent=True):
    act = active if active is not None else jnp.ones(ro.x.shape[0], bool)
    jax.debug.callback(_save, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, act,
                       ordered=True)
    return real_cha(sc, ro, rd, eps, W=W, active=active, coherent=coherent)


def run_capture(sc):
    ctx = integrators.make_ctx(sc, jnp.float32(EPS))
    acc, n = integrators.pathtrace_spp(
        sc, ctx, pix, gx, gy, res, cam, False,
        jnp.uint32(1), jnp.uint32(0), SPP, int(PathtraceType.STANDARD),
        BOUNCES, jnp.float32(10.0),
    )
    return acc.x + jnp.sum(n.astype(jnp.float32))


try:
    isx.closest_hit_attrs = capture_cha
    integrators.intersect.closest_hit_attrs = capture_cha
    chk = float(jnp.sum(jax.jit(run_capture)(tpu)))
finally:
    isx.closest_hit_attrs = real_cha
    integrators.intersect.closest_hit_attrs = real_cha

print(f"captured {len(captured)} iteration states (chk {chk:.4g})",
      flush=True)
out = {
    k: np.stack([s[i] for s in captured])
    for i, k in enumerate(("rox", "roy", "roz", "rdx", "rdy", "rdz", "act"))
}
os.makedirs("out_hw", exist_ok=True)
np.savez_compressed("out_hw/iter_states.npz", **out)
print("wrote out_hw/iter_states.npz", flush=True)
