"""Superleaf-stride sweep on the multi-M-tri envelope scene (TPU).

terrain2M benched at 0.23 Mrays/s through the sort wavefront
(BENCH 2026-08-19) with the auto-picked stride 4096 — pick_stride caps
top-table rows at ~768 (a sweep done at 456k tris, where the one-hot
top-fetch matmul dominated), which at 2M tris forces every superleaf
visit to pay 4096 triangle evaluations. This sweeps the stride on the
REAL scene so the auto-pick's extrapolation is measured, not assumed.
Output is incremental so a dead tunnel still leaves partial data.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lupinpathtracer_tpu.core import rng as rng_mod, vec3 as v3
from lupinpathtracer_tpu.core.types import PathtraceDesc
from lupinpathtracer_tpu.io.synthetic import build_scene_terrain
from lupinpathtracer_tpu.kernels import intersect as isx
from lupinpathtracer_tpu.render.camera import compute_camera_ray
from lupinpathtracer_tpu.render.renderer import _camera_args
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu

W, H = 512, 288
B = W * H

scene, cams = build_scene_terrain(n_tris=2_000_000, seed=0)
desc = PathtraceDesc()
desc.camera_transform = cams[0].transform
desc.camera_params = cams[0].params
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


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(jnp.abs(leaves[0].astype(jnp.float32))))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    s = float(jnp.sum(jnp.abs(leaves[0].astype(jnp.float32))))
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:56s} {dt:9.2f} ms  (chk {s:.4g})", flush=True)
    return dt, out


state, ro, rd = jax.jit(lambda: make_rays())()
_ = float(jnp.sum(ro.x))

import os

os.environ["LUPIN_NO_PACKET"] = "1"  # sweep the measured-winner backend

for stride in (1024, 2048, 4096):
    t0 = time.time()
    tpu = build_scene_tpu(scene, sl_stride_opt=stride)
    print(f"--- stride {stride}: n_sl={tpu.sl_count} depth={tpu.top_depth} "
          f"(build {time.time() - t0:.0f}s)", flush=True)
    f = jax.jit(lambda s, o, d: isx.closest_hit_wavefront(s, o, d, 1e-3))
    try:
        _, h = timeit(f"[s{stride}] sort closest-hit, camera rays", f, tpu,
                      ro, rd)
        # Diffuse bounce off the hits: the divergence-stressed round.
        pos = v3.V3(ro.x + rd.x * h.dst, ro.y + rd.y * h.dst,
                    ro.z + rd.z * h.dst)
        eo = v3.V3(pos.x, pos.y + 1e-3, pos.z)
        g = np.random.default_rng(1)
        dn = g.normal(size=(3, B)).astype(np.float32)
        dn[1] = np.abs(dn[1])
        dn /= np.linalg.norm(dn, axis=0, keepdims=True)
        ed = v3.V3(*(jnp.asarray(dn[i]) for i in range(3)))
        f2 = jax.jit(lambda s, o, d, a: isx.closest_hit_wavefront(
            s, o, d, 1e-3, active=a))
        timeit(f"[s{stride}] sort closest-hit, bounce rays", f2, tpu, eo, ed,
               h.hit)
    except Exception as e:
        print(f"    stride {stride} FAILED: {type(e).__name__}: {e}",
              flush=True)
