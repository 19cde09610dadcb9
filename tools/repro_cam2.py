"""Bias hunt for the arealights1 cam2 full-workload FAIL.

A FRESH single-code 1000-spp render of cam2 (out_hw/full_arealights1_cam2
.log, sort-wavefront everywhere) fails the gate WORSE than the Franken
blend did (ds4 9.85% vs 5.6%, max_dist 17.2): the bright highlight
features (clamped reflections of the two emission-20 area lights on the
glossy spheres/bunnies) sit at DIFFERENT positions than the golden's —
full 0 <-> 10 pixel swaps at feature edges. Round-4's all-packet renders
of cam1 passed at the noise floor, so the suspect is a regression in the
sort path (or shared attr/shading code) between 14:05 and 21:43 Aug 19.

This tool compares, on cam2's EXACT center rays over the error bbox
(rows 130-410, cols 130-1060 at 1920x640):
  1. primary traversal: sort wavefront vs packet vs jnp stack walk
     (t / tri / u / v agreement),
  2. interpolated attrs: wavefront_fetch_attrs vs direct wt-table gathers
     (shading normal agreement),
  3. one specular bounce from the reference hits: bounce-ray traversal
     agreement across the same three backends.
"""

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("LUPIN_SKIP_PROBE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from lupinpathtracer_tpu.core import rng as rng_mod
from lupinpathtracer_tpu.core.types import PathtraceDesc
from lupinpathtracer_tpu.core.vec3 import V3
from lupinpathtracer_tpu.io import yocto_json
from lupinpathtracer_tpu.kernels import intersect as isx
from lupinpathtracer_tpu.render.camera import compute_camera_ray
from lupinpathtracer_tpu.render.renderer import _camera_args
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu

W, H = 1920, 640
Y0, Y1, X0, X1 = 130, 410, 130, 1060
EPS = 1e-3

scene, cams = yocto_json.load_scene_yoctogl_v24(
    "/root/reference/test_scenes/arealights1/arealights1.json"
)
tpu = build_scene_tpu(scene)
print(f"n_sl={tpu.sl_count} stride={tpu.sl_stride}", flush=True)

desc = PathtraceDesc()
desc.camera_transform = cams[2].transform
desc.camera_params = cams[2].params
cam = _camera_args(desc)

ys, xs = np.mgrid[Y0:Y1, X0:X1]
gy = jnp.asarray(ys.reshape(-1).astype(np.int32))
gx = jnp.asarray(xs.reshape(-1).astype(np.int32))
B = int(gx.shape[0])
pad = (-B) % 2048
if pad:
    gx = jnp.pad(gx, (0, pad))
    gy = jnp.pad(gy, (0, pad))
state = rng_mod.init_state(
    jnp.arange(gx.shape[0], dtype=jnp.uint32), jnp.uint32(1), jnp.uint32(7)
)
zero = jnp.zeros(gx.shape[0], jnp.float32)
res = (jnp.float32(W), jnp.float32(H))
state, ro, rd = compute_camera_ray(
    cam["cam_transform"], cam["lens"], cam["film"], cam["aspect"],
    cam["focus"], cam["aperture"], False, gx, gy, res, zero, zero, state,
)
print(f"rays: {B} (+{pad} pad)", flush=True)


def agree(name, ha, hb):
    A = lambda x: np.asarray(x)[:B]
    m = A(ha.hit) | A(hb.hit)
    hit_mism = int((A(ha.hit) != A(hb.hit)).sum())
    both = A(ha.hit) & A(hb.hit)
    tri_mism = int((A(ha.tri)[both] != A(hb.tri)[both]).sum())
    dt = np.abs(A(ha.dst)[both] - A(hb.dst)[both])
    du = np.abs(A(ha.u)[both] - A(hb.u)[both])
    print(f"[{name}] hit mismatch {hit_mism}/{int(m.sum())}  "
          f"tri mismatch {tri_mism}/{int(both.sum())}  "
          f"max|dt| {dt.max() if both.any() else 0:.3e}  "
          f"max|du| {du.max() if both.any() else 0:.3e}", flush=True)
    return both


def trace(backend):
    if backend == "stack":
        h = isx.closest_hit_bvh(tpu, ro, rd, jnp.float32(EPS))
        return isx._fixup_backside(tpu, h)
    old = dict(os.environ)
    try:
        if backend == "sort":
            os.environ["LUPIN_NO_PACKET"] = "1"
        else:
            os.environ["LUPIN_FORCE_PACKET"] = "1"
        # fresh trace per env (jit caches per function identity)
        def f(sc, rox, roy, roz, rdx, rdy, rdz):
            return isx.closest_hit(
                sc, V3(rox, roy, roz), V3(rdx, rdy, rdz), jnp.float32(EPS),
                coherent=(backend != "sort"),
            )
        h = jax.jit(f)(tpu, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z)
        jax.block_until_ready(h.dst)
        return h
    finally:
        os.environ.clear()
        os.environ.update(old)


h_ref = trace("stack")
print(f"stack-walk hits: {int(np.asarray(h_ref.hit)[:B].sum())}/{B}",
      flush=True)
h_sort = trace("sort")
h_pkt = trace("packet")
agree("primary sort vs stack", h_sort, h_ref)
agree("primary packet vs stack", h_pkt, h_ref)
agree("primary sort vs packet", h_sort, h_pkt)

# ---- 2. attrs: wavefront fetch vs direct gathers on the REF hits --------
ia = isx.wavefront_fetch_attrs(tpu, h_ref)
hit = np.asarray(h_ref.hit)[:B]
tri = np.asarray(h_ref.tri)[:B][hit]
u = np.asarray(h_ref.u)[:B][hit]
v = np.asarray(h_ref.v)[:B][hit]
w = 1.0 - u - v


def interp3(tab):
    return np.stack([np.asarray(tab[c])[tri] for c in range(3)])


n_ref = interp3(tpu.wt_n0) * w + interp3(tpu.wt_n1) * u + interp3(tpu.wt_n2) * v
n_got = np.stack(
    [np.asarray(ia.n.x)[:B], np.asarray(ia.n.y)[:B], np.asarray(ia.n.z)[:B]]
)[:, hit]
dn = np.abs(n_got - n_ref).max(axis=0)
print(f"[attrs] shading-normal max abs err {dn.max():.3e} "
      f"(>1e-4 on {(dn > 1e-4).sum()}/{hit.sum()} lanes)", flush=True)
mid = np.asarray(ia.mat_id)[:B][hit].astype(np.int64)
mref = np.asarray(tpu.wt_mat)[tri]
print(f"[attrs] mat_id mismatches {(mid != mref).sum()}/{hit.sum()}",
      flush=True)

# ---- 3. one specular bounce from the reference hits ----------------------
nx, ny, nz = n_got
nn = np.sqrt(nx * nx + ny * ny + nz * nz)
nn = np.where(nn > 0, nn, 1.0)
nx, ny, nz = nx / nn, ny / nn, nz / nn
dx = np.asarray(rd.x)[:B][hit]
dy = np.asarray(rd.y)[:B][hit]
dz = np.asarray(rd.z)[:B][hit]
dn2 = dx * nx + dy * ny + dz * nz
rx, ry, rz = dx - 2 * dn2 * nx, dy - 2 * dn2 * ny, dz - 2 * dn2 * nz
ox = np.asarray(ro.x)[:B][hit] + dx * np.asarray(h_ref.dst)[:B][hit]
oy = np.asarray(ro.y)[:B][hit] + dy * np.asarray(h_ref.dst)[:B][hit]
oz = np.asarray(ro.z)[:B][hit] + dz * np.asarray(h_ref.dst)[:B][hit]
Bb = ox.shape[0]
padb = (-Bb) % 2048


def pv(a, fill=0.0):
    return jnp.asarray(np.pad(a, (0, padb), constant_values=fill))


ro2 = V3(pv(ox), pv(oy), pv(oz))
rd2 = V3(pv(rx), pv(ry, 1.0), pv(rz))
ro_s, rd_s, B_s = ro, rd, B
ro, rd, B = ro2, rd2, Bb
hb_ref = trace("stack")
hb_sort = trace("sort")
hb_pkt = trace("packet")
both = agree("bounce sort vs stack", hb_sort, hb_ref)
agree("bounce packet vs stack", hb_pkt, hb_ref)

# Which bounce rays reach an EMISSIVE surface (the highlight makers)?
for name, hb in (("stack", hb_ref), ("sort", hb_sort), ("packet", hb_pkt)):
    t_ = np.asarray(hb.tri)[:B]
    h_ = np.asarray(hb.hit)[:B]
    m_ = np.asarray(tpu.wt_mat)[t_]
    em = np.asarray(tpu.mat_emission[0])[m_] > 0
    print(f"[bounce->light] {name}: {int((h_ & em).sum())} lanes hit "
          f"an emissive tri", flush=True)
print("done", flush=True)
