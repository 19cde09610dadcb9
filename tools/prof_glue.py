"""Decompose the bench full-path iteration: traversal vs attr-fetch vs
shading GLUE (BSDF/light sampling, RNG, regen bookkeeping).

BENCH_r05 (partial): arealights1 full paths run at 2.28 Mrays/s =>
~57 ms per 131k-lane bounce iteration. prof_opt measured the divergent
sort closest-hit alone at 26.7 ms (Q=4, amortized). The remaining ~30 ms
is attr fetch + glue and has NEVER been measured — this tool splits it:

  [FULL]  pathtrace_spp, bench config exactly (STANDARD, 8 spp, 8 bounces)
  [GLUE]  same but closest_hit_attrs monkeypatched to an all-miss fake:
          control flow is then deterministic (each body iteration consumes
          exactly one sample => spp iterations), every masked lane-math op
          of the body still executes => per-iteration glue cost = T/spp.
  [ATTR]  wavefront_fetch_attrs alone on a real camera-hit batch,
          amortized via lax.fori_loop (scene passed as jit ARG — closing
          over it bakes 100+ MB of constants into the MLIR and trips the
          axon tunnel's HTTP body limit, the prof_sort [ATTR] failure).

Reference framing: the reference shades inline in the megakernel
(pathtracer.wgsl:737-933) so its "glue" is free ALU under latency hiding;
here glue is lockstep VPU lane math whose cost is real and must be known.
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
from lupinpathtracer_tpu.render import integrators
from lupinpathtracer_tpu.render.camera import compute_camera_ray
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
print(f"n_sl={tpu.sl_count} stride={tpu.sl_stride} depth={tpu.top_depth} "
      f"two_level={tpu.two_level}", flush=True)

desc = PathtraceDesc()
desc.camera_transform = cams[1].transform
desc.camera_params = cams[1].params
cam = _camera_args(desc)

gx = jnp.broadcast_to(jnp.arange(W)[None, :], (H, W)).reshape(-1).astype(jnp.int32)
gy = jnp.broadcast_to(jnp.arange(H)[:, None], (H, W)).reshape(-1).astype(jnp.int32)
pix = (gy * W + gx).astype(jnp.uint32)
res = (jnp.float32(W), jnp.float32(H))


def run_spp(sc):
    ctx = integrators.make_ctx(sc, jnp.float32(1e-3))
    acc, n_traced = integrators.pathtrace_spp(
        sc, ctx, pix, gx, gy, res, cam, False,
        jnp.uint32(1), jnp.uint32(0), SPP, int(PathtraceType.STANDARD),
        BOUNCES, jnp.float32(10.0),
    )
    return acc.x + acc.y + acc.z, jnp.sum(n_traced.astype(jnp.float32))


def timeit(name, fn, *args, reps=2):
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


# ---- [FULL] -------------------------------------------------------------
f_full = jax.jit(run_spp)
dt_full, (_, ntr) = timeit("[FULL] pathtrace_spp 8spp STANDARD", f_full, tpu)
n_traced = float(jax.jit(run_spp)(tpu)[1])
print(f"  n_traced={n_traced:.0f} segs/sample={n_traced / B / SPP:.2f}",
      flush=True)

# ---- [GLUE] fake all-miss trace ----------------------------------------
real_cha = isx.closest_hit_attrs


def fake_cha(sc, ro, rd, eps, W=None, active=None, coherent=True):
    n = ro.x.shape[0]
    z = jnp.zeros(n, jnp.float32)
    zv = V3(z, z, z)
    at = isx.InterpAttrs(
        n=V3(z, z, jnp.ones(n)), gn=V3(z, z, jnp.ones(n)), tu=z, tv=z,
        has_uv=jnp.zeros(n, bool), vc=V3(*(jnp.ones(n),) * 3),
        vca=jnp.ones(n), det_sign=jnp.ones(n),
        mat_id=jnp.zeros(n, jnp.int32),
        tan=zv if tpu.any_normal_maps else None,
        bit=zv if tpu.any_normal_maps else None,
    )
    return isx.miss((n,)), at, None


def fake_cha_entry(sc, ro, rd, eps, W=None, active=None, coherent=True):
    h, at, _ = fake_cha(sc, ro, rd, eps)
    return h, at


def run_spp_glue(sc):
    # distinct function OBJECT: jax.jit caches traces per function, so
    # jitting `run_spp` again would silently reuse the un-patched trace
    # (observed: [GLUE] chk == [FULL] chk on the first run of this tool).
    return run_spp(sc)


try:
    isx.closest_hit_attrs = fake_cha_entry
    integrators.intersect.closest_hit_attrs = fake_cha_entry
    f_glue = jax.jit(run_spp_glue)
    dt_glue, _ = timeit("[GLUE] all-miss fake trace (spp iterations)",
                        f_glue, tpu, reps=3)
    print(f"  glue per body iteration ~= {dt_glue / SPP:.2f} ms", flush=True)
finally:
    isx.closest_hit_attrs = real_cha
    integrators.intersect.closest_hit_attrs = real_cha

# ---- [ATTR] wavefront_fetch_attrs amortized -----------------------------
state0 = rng_mod.init_state(pix, 0, 0, 0)
state0, ox = rng_mod.next_f32(state0)
state0, oy = rng_mod.next_f32(state0)
_, ro0, rd0 = compute_camera_ray(
    cam["cam_transform"], cam["lens"], cam["film"], cam["aspect"],
    cam["focus"], cam["aperture"], False, gx, gy, res,
    ox - 0.5, oy - 0.5, state0,
)


def get_hit(sc):
    ctx = integrators.make_ctx(sc, jnp.float32(1e-3))
    return isx.closest_hit(sc, ro0, rd0, jnp.float32(1e-3), W=ctx["W"])


hit0 = jax.jit(get_hit)(tpu)
hit0 = jax.tree.map(lambda a: jax.device_put(np.asarray(a)), hit0)
REPS = 16


def attr_loop(sc, h):
    def body(i, acc):
        # data-depend the input on the carry to defeat CSE across reps
        h2 = h.replace(u=h.u + acc * 1e-30)
        at = isx.wavefront_fetch_attrs(sc, h2)
        return acc + jnp.sum(at.tu) + at.n.x[0]

    return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))


f_attr = jax.jit(attr_loop)
dt_attr, _ = timeit(f"[ATTR] wavefront_fetch_attrs x{REPS} (amortized)",
                    f_attr, tpu, hit0)
print(f"  attr fetch per call ~= {dt_attr / REPS:.2f} ms", flush=True)

est_iters = n_traced / B  # avg body iterations (segments) per lane
print(f"\nsummary: full={dt_full:.1f} ms over ~{est_iters:.1f} avg iters "
      f"=> {dt_full / est_iters:.1f} ms/iter; glue={dt_glue / SPP:.2f} "
      f"attr={dt_attr / REPS:.2f} => trace ~= "
      f"{dt_full / est_iters - dt_glue / SPP - dt_attr / REPS:.1f} ms/iter",
      flush=True)
print("done", flush=True)
