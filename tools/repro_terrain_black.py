"""Diagnose the black 960x540 terrain render (out_hw/terrain_render2.log:
mean=0.0000 despite rc=0). prof_stride shows the SORT closest-hit returns a
healthy checksum on this exact scene, so the suspects are (a) the packet
camera prologue at stride 4096 and (b) the shading path (attr fetch /
emission / light pdf) on TPU.

Steps:
  1. build the 2M-tri terrain (stride auto-pick),
  2. camera-ray closest_hit: packet vs sort — hit counts, t checksums,
  3. one 128x72 pathtrace_spp tile via default hybrid vs LUPIN_NO_PACKET=1
     — radiance means,
  4. wavefront_fetch_attrs emission sanity on the sort hits.
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
from lupinpathtracer_tpu.core.types import (
    BakedPathtraceParams, PathtraceDesc, PathtraceType,
)
from lupinpathtracer_tpu.io.synthetic import build_scene_terrain
from lupinpathtracer_tpu.kernels import intersect as isx
from lupinpathtracer_tpu.render import integrators, renderer
from lupinpathtracer_tpu.render.camera import compute_camera_ray
from lupinpathtracer_tpu.render.renderer import _camera_args
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu

W, H = 128, 72
B = W * H

t0 = time.time()
N_TRIS = int(os.environ.get("LUPIN_REPRO_NTRIS", 2_000_000))
scene, cams = build_scene_terrain(n_tris=N_TRIS, seed=0)
tpu = build_scene_tpu(scene)
print(f"build {time.time() - t0:.1f}s n_sl={tpu.sl_count} "
      f"stride={tpu.sl_stride} two_level={tpu.two_level}", flush=True)

desc = PathtraceDesc()
desc.camera_transform = cams[0].transform
desc.camera_params = cams[0].params
desc.pathtrace_type = PathtraceType.STANDARD
desc.advanced.max_radiance = 10.0
desc.accum_params.accumulate = True
cam = _camera_args(desc)

gx = jnp.broadcast_to(jnp.arange(W)[None, :], (H, W)).reshape(-1).astype(jnp.int32)
gy = jnp.broadcast_to(jnp.arange(H)[:, None], (H, W)).reshape(-1).astype(jnp.int32)
pix = (gy * W + gx).astype(jnp.uint32)
res = (jnp.float32(W), jnp.float32(H))


@jax.jit
def cam_rays(sc):
    state = rng_mod.init_state(pix, 0, 0, 0)
    state, ox = rng_mod.next_f32(state)
    state, oy = rng_mod.next_f32(state)
    state, ro, rd = compute_camera_ray(
        cam["cam_transform"], cam["lens"], cam["film"], cam["aspect"],
        cam["focus"], cam["aperture"], False, gx, gy, res,
        ox - 0.5, oy - 0.5, state,
    )
    return ro, rd


ro, rd = cam_rays(tpu)
ctxW = integrators.make_ctx(tpu, jnp.float32(1e-3))["W"]

# ---- 2. camera closest_hit per backend ----------------------------------
for tag, env in (("packet", {"LUPIN_FORCE_PACKET": "1"}),
                 ("sort", {"LUPIN_NO_PACKET": "1"})):
    olds = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        f = jax.jit(lambda s, o, d, Wm: isx.closest_hit(
            s, o, d, jnp.float32(1e-3), W=Wm, coherent=True))
        h = f(tpu, ro, rd, ctxW)
        nh = int(jnp.sum(h.hit.astype(jnp.int32)))
        chk = float(jnp.sum(jnp.where(h.hit, h.dst, 0.0)))
        print(f"[camera {tag}] hits={nh}/{B} t_chk={chk:.6g} "
              f"tri_chk={int(jnp.sum(jnp.where(h.hit, h.tri, 0)))}",
              flush=True)
    except Exception as e:
        print(f"[camera {tag}] FAILED {type(e).__name__}: {e}", flush=True)
    finally:
        for k, v in olds.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

# ---- 3. tiny pathtrace per backend ---------------------------------------
baked = BakedPathtraceParams(max_bounces=4, samples_per_pixel=2)
from lupinpathtracer_tpu.render.renderer import _render_pathtrace as _rp

for tag, env in (("hybrid", {}), ("sort-only", {"LUPIN_NO_PACKET": "1"})):
    olds = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    _rp.clear_cache()
    try:
        img = renderer.new_accumulation_buffer(W, H)
        desc.accum_params.counter = 0
        img = renderer.pathtrace_scene(tpu, img, desc, baked)
        a = np.asarray(img)
        print(f"[pathtrace {tag}] mean={a[..., :3].mean():.6f} "
              f"max={a.max():.4f} finite={bool(np.isfinite(a).all())}",
              flush=True)
    except Exception as e:
        print(f"[pathtrace {tag}] FAILED {type(e).__name__}: {e}", flush=True)
    finally:
        for k, v in olds.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        _rp.clear_cache()

# ---- 4. attr/emission sanity on sort hits --------------------------------
os.environ["LUPIN_NO_PACKET"] = "1"
try:
    from lupinpathtracer_tpu.render import materials as mats_mod

    def attr_probe(s, o, d, Wm):
        h = isx.closest_hit(s, o, d, jnp.float32(1e-3), W=Wm, coherent=True)
        attrs = isx.wavefront_fetch_attrs(s, h)
        em = mats_mod.get_emission(s, h, attrs=attrs)
        mat = jnp.where(h.hit, attrs.mat_id, -1)
        em_mag = jnp.where(h.hit, em.x + em.y + em.z, 0.0)
        return mat, jnp.sum(em_mag)

    mat, em_sum = jax.jit(attr_probe)(tpu, ro, rd, ctxW)
    mat = np.asarray(mat)
    print(f"[attrs] hit mats={sorted(set(mat[mat >= 0].tolist()))} "
          f"emission_sum={float(em_sum):.6g}", flush=True)
except Exception as e:
    print(f"[attrs] FAILED {type(e).__name__}: {e}", flush=True)
print("done", flush=True)
