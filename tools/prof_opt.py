"""Round-5 optimization sweep on arealights1 (TPU).

prof_round (2026-08-19) decomposed one sort-wavefront round: pair kernel
~10 ms, grouping sort ~4 ms, unsort ~3.3 ms, top ~2 ms (after removing a
~5 ms per-call dispatch floor).  prof_packet showed packet camera-tiled
at 20.84 ms (PBK=256) vs sort 25.76.  This sweeps the ZERO-CODE-CHANGE
levers before kernel surgery:

  A. packet PBK in {256, 512, 1024} x {camera tiled, bounce} — is the
     packet kernel scalar-loop-bound (bigger blocks amortize pops)?
  B. bounce-ray coherence keys: none / morton+octant / prev-hit
     superleaf — what makes packet win the divergent regime?
  C. sort backend Q in {4, 8} (WF_Q monkeypatch) — QB is 4x oversized
     at avg_emit 2.05.

Timings amortize dispatch: each measurement is one jit call that loops
the op `REPS` times via lax.fori_loop carrying the outputs (defeats CSE).
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
from lupinpathtracer_tpu.kernels import pallas_packet as pp
from lupinpathtracer_tpu.render.camera import compute_camera_ray
from lupinpathtracer_tpu.render.renderer import _camera_args
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu

W, H = 512, 256
B = W * H

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


def make_rays(tiled=True):
    gx = jnp.broadcast_to(jnp.arange(W)[None, :], (H, W)).reshape(-1)
    gy = jnp.broadcast_to(jnp.arange(H)[:, None], (H, W)).reshape(-1)
    if tiled:  # 16x16 pixel tiles, row-major within and across
        tx, ty = gx // 16, gy // 16
        ox, oy = gx % 16, gy % 16
        order = jnp.argsort((ty * (W // 16) + tx) * 256 + oy * 16 + ox)
        gx, gy = gx[order], gy[order]
    pix = (gy * W + gx).astype(jnp.uint32)
    state = rng_mod.init_state(pix, 0, 0, 0)
    state, jx = rng_mod.next_f32(state)
    state, jy = rng_mod.next_f32(state)
    return compute_camera_ray(
        cam["cam_transform"], cam["lens"], cam["film"], cam["aspect"],
        cam["focus"], cam["aperture"], False, gx.astype(jnp.int32),
        gy.astype(jnp.int32), (jnp.float32(W), jnp.float32(H)),
        jx - 0.5, jy - 0.5, state,
    )


def mat(x):
    return jax.tree.map(lambda a: jax.device_put(np.asarray(a)), x)


REPS = 10


def timeit(name, make_fn, *args):
    """make_fn(i, *args) -> pytree; timed as one jit looping REPS times
    (iteration index perturbs an input so XLA cannot hoist the op)."""

    def loop(*a):
        def body(i, acc):
            out = make_fn(i, *a)
            leaves = jax.tree_util.tree_leaves(out)
            return acc + jnp.sum(leaves[0].astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    f = jax.jit(loop)
    r = f(*args)
    r.block_until_ready()
    t0 = time.time()
    r = f(*args)
    r.block_until_ready()
    dt = (time.time() - t0) / REPS * 1000
    print(f"{name:58s} {dt:8.2f} ms", flush=True)
    return dt


W4 = jax.jit(lambda s: isx._wavefront_tri_matrix(s))(tpu)
W4 = jax.device_put(np.asarray(W4))

state, ro_t, rd_t = jax.jit(lambda: make_rays(True))()
ro_t, rd_t = mat(ro_t), mat(rd_t)

# Bounce regime: diffuse scatter off camera hits (pixel order).
state, ro_r, rd_r = jax.jit(lambda: make_rays(False))()
h = jax.jit(lambda s, o, d: isx.closest_hit_wavefront(s, o, d, 1e-3))(
    tpu, ro_r, rd_r)
pos = v3.V3(ro_r.x + rd_r.x * h.dst, ro_r.y + rd_r.y * h.dst,
            ro_r.z + rd_r.z * h.dst)
g = np.random.default_rng(1)
dn = g.normal(size=(3, B)).astype(np.float32)
dn[1] = np.abs(dn[1])
dn /= np.linalg.norm(dn, axis=0, keepdims=True)
bro = mat(v3.V3(pos.x, pos.y + 1e-3, pos.z))
brd = mat(v3.V3(*(jnp.asarray(dn[i]) for i in range(3))))
prev_sl = mat(jnp.where(h.hit, h.tri // tpu.sl_stride, tpu.sl_count))

# --- A: packet PBK sweep ---------------------------------------------------
for pbk in (256, 512, 1024):
    try:
        timeit(
            f"[A] packet PBK={pbk} camera 16x16-tiled",
            lambda i, o, d: pp.packet_traverse(
                tpu, v3.V3(o.x + i * 0.0, o.y, o.z), d, 1e-3, W4, PBK=pbk
            ),
            ro_t, rd_t,
        )
        timeit(
            f"[A] packet PBK={pbk} bounce (pixel order)",
            lambda i, o, d: pp.packet_traverse(
                tpu, v3.V3(o.x + i * 0.0, o.y, o.z), d, 1e-3, W4, PBK=pbk
            ),
            bro, brd,
        )
    except Exception as e:
        print(f"[A] PBK={pbk} FAILED: {type(e).__name__}: {e}", flush=True)

# --- B: bounce coherence keys ----------------------------------------------
def with_key_sort(i, o, d, key):
    idx = jnp.arange(B, dtype=jnp.int32)
    _, sidx, sx, sy, sz, sdx, sdy, sdz = jax.lax.sort(
        (key, idx, o.x + i * 0.0, o.y, o.z, d.x, d.y, d.z), num_keys=1
    )
    t, u, v, det, tri = pp.packet_traverse(
        tpu, v3.V3(sx, sy, sz), v3.V3(sdx, sdy, sdz), 1e-3, W4, PBK=512
    )
    return jax.lax.sort((sidx, t, u, v, det, tri), num_keys=1)[1:]


try:
    timeit(
        "[B] packet PBK=512 bounce, morton+octant sort",
        lambda i, o, d: with_key_sort(
            i, o, d, pp._coherence_key(tpu, o, d, None)
        ),
        bro, brd,
    )
    timeit(
        "[B] packet PBK=512 bounce, prev-superleaf sort",
        lambda i, o, d, k: with_key_sort(i, o, d, k),
        bro, brd, prev_sl,
    )
    timeit(
        "[B] packet PBK=512 bounce, prevSL+octant sort",
        lambda i, o, d, k: with_key_sort(
            i, o, d,
            k * 8 + ((d.x < 0) + 2 * (d.y < 0) + 4 * (d.z < 0)).astype(
                jnp.int32
            ),
        ),
        bro, brd, prev_sl,
    )
except Exception as e:
    print(f"[B] FAILED: {type(e).__name__}: {e}", flush=True)

# --- C: sort backend Q sweep -----------------------------------------------
os.environ["LUPIN_NO_PACKET"] = "1"
for q in (8, 4):
    isx.WF_Q = q
    try:
        timeit(
            f"[C] sort backend Q={q} camera tiled",
            lambda i, o, d: isx.closest_hit_wavefront(
                tpu, v3.V3(o.x + i * 0.0, o.y, o.z), d, 1e-3
            ),
            ro_t, rd_t,
        )
        timeit(
            f"[C] sort backend Q={q} bounce",
            lambda i, o, d: isx.closest_hit_wavefront(
                tpu, v3.V3(o.x + i * 0.0, o.y, o.z), d, 1e-3
            ),
            bro, brd,
        )
    except Exception as e:
        print(f"[C] Q={q} FAILED: {type(e).__name__}: {e}", flush=True)
isx.WF_Q = 8
del os.environ["LUPIN_NO_PACKET"]
print("done", flush=True)
