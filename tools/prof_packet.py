"""Packet vs sort-backend traversal on arealights1 (TPU).

Configs run in priority order; output is incremental so a dead tunnel
still leaves partial data.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from lupinpathtracer_tpu.io import yocto_json
from lupinpathtracer_tpu.render.renderer import _camera_args
from lupinpathtracer_tpu.core.types import PathtraceDesc
from lupinpathtracer_tpu.core import rng as rng_mod, vec3 as v3
from lupinpathtracer_tpu.render.camera import compute_camera_ray
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu
from lupinpathtracer_tpu.kernels import intersect as isx
from lupinpathtracer_tpu.kernels import pallas_packet as pkt

W, H = 512, 256
scene, cams = yocto_json.load_scene_yoctogl_v24(
    "/root/reference/test_scenes/arealights1/arealights1.json")
desc = PathtraceDesc()
desc.camera_transform = cams[1].transform
desc.camera_params = cams[1].params
cam = _camera_args(desc)


def make_rays(order):
    """order: (B,) pixel ids -> rays in that lane order."""
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
    """Tile-swizzled pixel order: lane l -> pixel inside ts x ts tiles."""
    l = np.arange(W * H)
    per = ts * ts
    t = l // per
    wtl = l % per
    ntx = W // ts
    gx = (t % ntx) * ts + (wtl % ts)
    gy = (t // ntx) * ts + (wtl // ts)
    return jnp.asarray(gy * W + gx, jnp.int32)


row_order = jnp.arange(W * H, dtype=jnp.int32)


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
    print(f"{name:52s} {dt:9.2f} ms  (chk {s:.4g})", flush=True)
    return dt, out


def bounce_rays(tpu, ro, rd, state):
    """Realistic secondary rays: diffuse bounce off the camera-ray hits."""
    h = isx.closest_hit_wavefront(tpu, ro, rd, 1e-3)
    at = isx.wavefront_fetch_attrs(tpu, h)
    pos = v3.V3(ro.x + rd.x * h.dst, ro.y + rd.y * h.dst, ro.z + rd.z * h.dst)
    n = v3.normalize(at.n)
    state, r1 = rng_mod.next_f32(state)
    state, r2 = rng_mod.next_f32(state)
    z = jnp.sqrt(jnp.maximum(r1, 0.0))
    rphi = 2 * np.pi * r2
    sq = jnp.sqrt(jnp.maximum(1 - r1, 0.0))
    lx = sq * jnp.cos(rphi)
    ly = sq * jnp.sin(rphi)
    up = v3.V3(jnp.zeros_like(n.x), jnp.ones_like(n.x), jnp.zeros_like(n.x))
    tdir = v3.normalize(v3.cross(up, n))
    bdir = v3.cross(n, tdir)
    d = v3.V3(
        tdir.x * lx + bdir.x * ly + n.x * z,
        tdir.y * lx + bdir.y * ly + n.y * z,
        tdir.z * lx + bdir.z * ly + n.z * z,
    )
    eps_o = v3.V3(pos.x + n.x * 1e-3, pos.y + n.y * 1e-3, pos.z + n.z * 1e-3)
    return eps_o, d, h.hit


def run_configs(tpu, tag):
    need = tpu.msl_count * tpu.sl_stride
    W4 = isx.build_tri_matrix(
        tpu.wt_v0[:, :need], tpu.wt_e1[:, :need], tpu.wt_e2[:, :need])

    state, ro, rd = jax.jit(lambda o: make_rays(o))(row_order)
    _ = float(jnp.sum(ro.x))
    state2, rot, rdt = jax.jit(lambda o: make_rays(o))(tile_order(16))
    _ = float(jnp.sum(rot.x))

    # Packet FIRST: it is the unknown (fresh Mosaic lowering); fail fast.
    # Scene/W4 are jit ARGUMENTS everywhere below — closed-over tables
    # become MLIR constants and blow the remote-compile body size
    # (HTTP 413 at 456k tris, observed 2026-08-19).
    f_p0 = jax.jit(lambda s, ro, rd, w: pkt.packet_traverse(
        s, ro, rd, 1e-3, w, PBK=256))
    try:
        timeit(f"[{tag}] packet PBK=256 smoke (row-major)", f_p0, tpu, ro, rd,
               W4, reps=2)
    except Exception as e:
        import traceback
        traceback.print_exc()
        print(f"    packet smoke FAILED: {type(e).__name__}: {e}", flush=True)

    import os
    os.environ["LUPIN_NO_PACKET"] = "1"
    f_sort = jax.jit(lambda s, ro, rd: isx.closest_hit_wavefront(s, ro, rd, 1e-3))
    t_sort, h_sort = timeit(f"[{tag}] sort backend, camera rays", f_sort, tpu, ro, rd)
    del os.environ["LUPIN_NO_PACKET"]

    for PBK in (128, 256):
        f_p = jax.jit(lambda s, ro, rd, w, PBK=PBK: pkt.packet_traverse(
            s, ro, rd, 1e-3, w, PBK=PBK))
        try:
            t_p, out = timeit(
                f"[{tag}] packet PBK={PBK}, row-major camera", f_p, tpu, ro, rd, W4)
            tt = out[0]
            agree = float(jnp.mean(
                ((tt < 3e38) == h_sort.hit).astype(jnp.float32)))
            print(f"    hit agreement vs sort: {agree:.6f}", flush=True)
            t_pt, _ = timeit(
                f"[{tag}] packet PBK={PBK}, 16x16-tiled camera", f_p, tpu, rot,
                rdt, W4)
        except Exception as e:
            print(f"    packet PBK={PBK} FAILED: {type(e).__name__}: {e}",
                  flush=True)

    # (The LUPIN_PACKET_EV_PREC knob and its A/B leg are gone: Mosaic
    # never lowered Precision.HIGH; the kernel now hand-rolls the bf16
    # hi/lo 3-pass product unconditionally — VERDICT r4 weak #7.)

    # Secondary (diffuse bounce) rays — the divergence stress test.
    f_b = jax.jit(lambda s, ro, rd, st: bounce_rays(s, ro, rd, st))
    eo, ed, hitm = f_b(tpu, rot, rdt, state2)
    _ = float(jnp.sum(eo.x))
    f_p2 = jax.jit(lambda s, ro, rd, w, act: pkt.packet_traverse(
        s, ro, rd, 1e-3, w, PBK=256, active=act))
    try:
        timeit(f"[{tag}] packet PBK=256, bounce rays (tiled px)", f_p2, tpu,
               eo, ed, W4, hitm)
    except Exception as e:
        print(f"    packet bounce FAILED: {type(e).__name__}: {e}", flush=True)
    import os
    os.environ["LUPIN_NO_PACKET"] = "1"
    f_s2 = jax.jit(lambda s, ro, rd, act: isx.closest_hit_wavefront(
        s, ro, rd, 1e-3, active=act))
    timeit(f"[{tag}] sort backend, bounce rays", f_s2, tpu, eo, ed, hitm)
    del os.environ["LUPIN_NO_PACKET"]


def run_fullpath_decomposition(tpu, tag):
    """Where does the packet full path lose its 2x traversal win?

    bench 2026-08-19: packet full path 5.42s vs sort 2.69s on arealights1
    even though packet wins camera-ray traversal 21 vs 44 ms. The
    integrator issues ONE 3-slot trace per bounce (continuation + NEE +
    dying-lane rays, ~B inactive of 3B) and, on two-level scenes, fetches
    attrs via the sort-based wavefront_fetch_attrs EVEN on the packet
    backend. This section times those pieces in the integrator's actual
    shapes so the fix is measured, not guessed."""

    import os

    need = tpu.msl_count * tpu.sl_stride
    W4 = isx.build_tri_matrix(
        tpu.wt_v0[:, :need], tpu.wt_e1[:, :need], tpu.wt_e2[:, :need])
    state2, rot, rdt = jax.jit(lambda o: make_rays(o))(tile_order(16))
    _ = float(jnp.sum(rot.x))
    f_b = jax.jit(lambda s, ro, rd, st: bounce_rays(s, ro, rd, st))
    eo, ed, hitm = f_b(tpu, rot, rdt, state2)
    _ = float(jnp.sum(eo.x))
    B = W * H

    # The integrator's 3-slot bounce batch: slot A = bounce rays (alive),
    # slot B = NEE rays from the hit points toward the scene's light pool
    # (active on hit lanes), slot C = mostly dead (RR-killed strategy
    # rays; ~10% active is generous).
    lx, ly, lz = 0.0, 1.6, 0.0  # arealights1 lights sit above the scene
    ldx = v3.normalize(v3.V3(lx - eo.x, ly - eo.y, lz - eo.z))
    actC = (jnp.arange(B) % 10) == 0
    ro3 = v3.V3(jnp.concatenate([eo.x] * 3), jnp.concatenate([eo.y] * 3),
                jnp.concatenate([eo.z] * 3))
    rd3 = v3.V3(jnp.concatenate([ed.x, ldx.x, ed.x]),
                jnp.concatenate([ed.y, ldx.y, ed.y]),
                jnp.concatenate([ed.z, ldx.z, ed.z]))
    act3 = jnp.concatenate([hitm, hitm, actC & hitm])

    f_p3 = jax.jit(lambda s, ro, rd, w, a: pkt.packet_traverse(
        s, ro, rd, 1e-3, w, PBK=256, active=a, ray_sort=False))
    f_p3s = jax.jit(lambda s, ro, rd, w, a: pkt.packet_traverse(
        s, ro, rd, 1e-3, w, PBK=256, active=a, ray_sort=True))
    try:
        timeit(f"[{tag}] packet 3-slot bounce batch (no sort)", f_p3, tpu,
               ro3, rd3, W4, act3)
        timeit(f"[{tag}] packet 3-slot bounce batch (raysort)", f_p3s, tpu,
               ro3, rd3, W4, act3)
    except Exception as e:
        print(f"    packet 3-slot FAILED: {type(e).__name__}: {e}",
              flush=True)
    # try/finally: a tunnel flap in the sort leg must not leak
    # LUPIN_NO_PACKET into later sections, nor abort run_configs
    # (ADVICE r4 #2).
    os.environ["LUPIN_NO_PACKET"] = "1"
    try:
        f_s3 = jax.jit(lambda s, ro, rd, a: isx.closest_hit_wavefront(
            s, ro, rd, 1e-3, active=a))
        t_s3, h3 = timeit(f"[{tag}] sort 3-slot bounce batch", f_s3, tpu,
                          ro3, rd3, act3)
        # The attr fetch the packet path ALSO pays on two-level scenes
        # (closest_hit_attrs falls back to wavefront_fetch_attrs there).
        f_at = jax.jit(lambda s, h: isx.wavefront_fetch_attrs(s, h))
        try:
            timeit(f"[{tag}] wavefront_fetch_attrs (3-slot hits)", f_at,
                   tpu, h3)
        except Exception as e:
            print(f"    fetch_attrs FAILED: {type(e).__name__}: {e}",
                  flush=True)
    except Exception as e:
        print(f"    sort 3-slot FAILED: {type(e).__name__}: {e}", flush=True)
    finally:
        del os.environ["LUPIN_NO_PACKET"]


print("=== stride default (1024) ===", flush=True)
tpu = build_scene_tpu(scene)
print(f"n_sl={tpu.sl_count} stride={tpu.sl_stride} depth={tpu.top_depth}",
      flush=True)
run_fullpath_decomposition(tpu, "s1024")
run_configs(tpu, "s1024")

print("=== stride 256 ===", flush=True)
tpu2 = build_scene_tpu(scene, sl_stride_opt=256)
print(f"n_sl={tpu2.sl_count} stride={tpu2.sl_stride} depth={tpu2.top_depth}",
      flush=True)
run_configs(tpu2, "s256")
