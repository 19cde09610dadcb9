"""TL_STREAM packet mode vs sort backend on an instanced field (TPU).

The packet kernel's HBM-streamed two-level mode (pallas_packet.py
body_stream: 4-slot meta ring, 3-stage DMA pipeline) has its own Mosaic
lowering — distinct from the SMEM-resident mode prof_packet.py exercises.
This times it on a 20k-instance field (sl_count > 16384 triggers streaming
naturally) against the sort wavefront, camera + diffuse-bounce rays.
Output is incremental so a dead tunnel still leaves partial data.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lupinpathtracer_tpu.core import rng as rng_mod
from lupinpathtracer_tpu.core.types import PathtraceDesc
from lupinpathtracer_tpu.io.synthetic import build_scene_instanced_field
from lupinpathtracer_tpu.kernels import intersect as isx
from lupinpathtracer_tpu.kernels import pallas_packet as pkt
from lupinpathtracer_tpu.render.camera import compute_camera_ray
from lupinpathtracer_tpu.render.renderer import _camera_args
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu

import os

W = int(os.environ.get("PROF_W", "512"))
H = int(os.environ.get("PROF_H", "288"))
N_INST = int(os.environ.get("PROF_INST", "20000"))

t0 = time.time()
scene, cams = build_scene_instanced_field(
    n_instances=N_INST, seed=0, tris_per_mesh=64
)
tpu = build_scene_tpu(scene)
print(f"build {time.time() - t0:.1f}s n_sl={tpu.sl_count} "
      f"stride={tpu.sl_stride} inst={tpu.num_instances} "
      f"stream={not pkt.smem_tables_fit(tpu)}", flush=True)
assert tpu.two_level and not pkt.smem_tables_fit(tpu), (
    "expected the TL_STREAM regime (sl_count > 16384)"
)

desc = PathtraceDesc()
desc.camera_transform = cams[0].transform
desc.camera_params = cams[0].params
cam = _camera_args(desc)


def make_rays(order):
    gx = (order % W).astype(jnp.int32)
    gy = (order // W).astype(jnp.int32)
    pix = order.astype(jnp.uint32)
    state = rng_mod.init_state(pix, 0, 0, 0)
    state, ox = rng_mod.next_f32(state)
    state, oy = rng_mod.next_f32(state)
    return compute_camera_ray(
        cam["cam_transform"], cam["lens"], cam["film"], cam["aspect"],
        cam["focus"], cam["aperture"], False, gx, gy,
        (jnp.float32(W), jnp.float32(H)), ox - 0.5, oy - 0.5, state)


def tile_order(ts):
    l = np.arange(W * H)
    per = ts * ts
    t = l // per
    ntx = W // ts
    gx = (t % ntx) * ts + (l % per % ts)
    gy = (t // ntx) * ts + (l % per // ts)
    return jnp.asarray(gy * W + gx, jnp.int32)


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
    print(f"{name:48s} {dt:9.2f} ms  (chk {s:.4g})", flush=True)
    return dt, out


state, ro, rd = jax.jit(make_rays)(tile_order(16))
_ = float(jnp.sum(ro.x))

need = tpu.msl_count * tpu.sl_stride
W4 = isx.build_tri_matrix(
    tpu.wt_v0[:, :need], tpu.wt_e1[:, :need], tpu.wt_e2[:, :need])

# Stream-mode packet FIRST (the fresh lowering; fail fast + loud).
# Scene/W4 as jit ARGUMENTS (closures bake them into the MLIR; HTTP 413).
f_p = jax.jit(lambda s, ro, rd, w: pkt.packet_traverse(s, ro, rd, 1e-3, w,
                                                       PBK=256))
try:
    t_p, out = timeit("stream packet PBK=256, camera (tiled)", f_p, tpu, ro,
                      rd, W4)
except Exception:
    import traceback
    traceback.print_exc()
    print("stream packet FAILED", flush=True)
    out = None

import os
os.environ["LUPIN_NO_PACKET"] = "1"
f_s = jax.jit(lambda s, ro, rd: isx.closest_hit_wavefront(s, ro, rd, 1e-3))
t_s, h_sort = timeit("sort backend, camera (tiled)", f_s, tpu, ro, rd)
del os.environ["LUPIN_NO_PACKET"]

if out is not None:
    agree = float(jnp.mean(((out[0] < 3e38) == h_sort.hit)
                           .astype(jnp.float32)))
    print(f"hit agreement stream-vs-sort: {agree:.6f}", flush=True)
