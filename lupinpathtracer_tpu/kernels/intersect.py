"""Ray-scene intersection kernels.

TPU-native rebuild of the reference's traversal layer
(bvh_custom.wgsl:7-300 + pathtracer.wgsl:2906-2961). Two backends, mirroring
the reference's SW/HW pipeline pair (renderer.rs:472-475) but selected by
scene size instead of driver features:

1. dense MXU path — Cramer's-rule ray/triangle intersection factors into a
   matmul: each ray becomes the 10-feature row R = [d, o x d, o, 1] and each
   triangle contributes four 10-vectors whose dot products with R are the
   determinant and the t/u/v numerators of pathtracer.wgsl:2922-2943
   (ray_tri_dst). The Pallas kernel (kernels/pallas_intersect.py) evaluates
   all pairs on the systolic array with an on-chip running argmin and can
   also return the winning triangle's packed shading attributes.

2. ``closest_hit_bvh`` — the world-BVH path for large scenes. The
   reference's per-thread TLAS->BLAS stacks (bvh_custom.wgsl:11-110,
   195-288) become one batched masked stack walk over the single world
   BVH: every lane pops its node, leaf lanes run a fixed-size triangle
   block test, internal lanes do the ordered near-first push with
   `dst < best_t` pruning — the same traversal order, as lane math.

All ray vectors are component-wise V3 batches (core/vec3.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core import vec3 as v3
from ..core.vec3 import V3

# Python literal, not jnp scalar: module-level jnp arrays get captured as
# pallas kernel constants (see pallas_intersect.py note).
F32_MAX = 3.4028235e38


@struct.dataclass
class HitInfo:
    """Batched hit record (pathtracer.wgsl:2953-2961). ``tri`` indexes the
    world-triangle soup (BVH order)."""

    hit: jnp.ndarray  # (B,) bool
    dst: jnp.ndarray  # (B,) f32
    u: jnp.ndarray  # (B,) f32
    v: jnp.ndarray  # (B,) f32
    tri: jnp.ndarray  # (B,) i32 world-triangle index
    backside: jnp.ndarray  # (B,) bool


def miss(batch_shape) -> HitInfo:
    z = jnp.zeros(batch_shape, jnp.float32)
    return HitInfo(
        hit=jnp.zeros(batch_shape, bool),
        dst=jnp.full(batch_shape, F32_MAX),
        u=z,
        v=z,
        tri=jnp.zeros(batch_shape, jnp.int32),
        backside=jnp.zeros(batch_shape, bool),
    )


def _use_pallas() -> bool:
    """Pallas path on TPU; the jnp formulation on CPU (interpret-mode Pallas
    is an order of magnitude slower there and tests run on CPU)."""

    return jax.default_backend() == "tpu"


# Sort-free packet traversal (kernels/pallas_packet.py); the sort-carried
# wavefront remains the debug-counter backend and the fallback for
# two-level scenes whose gsl/transform tables exceed the SMEM budget.
# Set LUPIN_NO_PACKET=1 to force the sort backend everywhere.
_GATE_LOGGED: set = set()


def packet_eligible(scene) -> bool:
    """Whether the packet kernel can take this scene at all (static
    capacity gates, independent of the probe's verdict).

    Two-level scenes whose gsl/transform tables exceed the SMEM-resident
    budget take the kernel's TL_STREAM mode (per-leaf HBM metadata DMA,
    pallas_packet.smem_tables_fit) — only the child-ref table stays in
    SMEM, so the remaining gate is on TOTAL instance-superleaves
    (~4.6 B/row of the ~1MB SMEM): LUPIN_PACKET_MAX_GSL, default 131072.
    Beyond it the scene falls back to the sort wavefront — LOGGED, never
    silent (VERDICT r3 weak #5)."""

    import os
    import sys

    if scene.top_root_is_leaf:
        return False
    max_gsl = int(os.environ.get("LUPIN_PACKET_MAX_GSL", "131072"))
    # Padded-soup triangle ids are gref*stride+lane in i32 (and the sort
    # backend's gtri encoding overflows identically), so a raised
    # LUPIN_PACKET_MAX_GSL must never admit ids past 2^31.
    max_gsl = min(max_gsl, (2**31 - 1) // max(int(scene.sl_stride), 1))
    if scene.sl_count > max_gsl:
        key = (int(scene.sl_count), int(scene.num_instances))
        if key not in _GATE_LOGGED:
            _GATE_LOGGED.add(key)
            print(
                f"# packet backend ineligible: {scene.sl_count} "
                f"instance-superleaves > LUPIN_PACKET_MAX_GSL={max_gsl} "
                f"(child-ref SMEM table); using the sort wavefront "
                f"({scene.num_instances} instances)",
                file=sys.stderr,
            )
        return False
    # Top-tree TABLE gates, measured on the actual row count (the gsl gate
    # alone underestimates: an imperfectly-filled 8-wide tree reached
    # 33664 rows at 100578 gsl). geo rides VMEM lane-padded to
    # (rows, TOP_FAN, 128) f32 — 137.9 MB at 33664 rows against the
    # 128 MB VMEM (out_hw/bench2.log); refs ride SMEM flat
    # (rows*TOP_FAN,) i32 against the 1 MB budget shared with the stack.
    from ..accel.superleaf import TOP_FAN

    rows = int(scene.top_tab.shape[0])
    geo_bytes = rows * TOP_FAN * 128 * 4
    refs_bytes = rows * TOP_FAN * 4
    geo_max = int(os.environ.get("LUPIN_PACKET_GEO_VMEM_MAX", 96_000_000))
    refs_max = int(os.environ.get("LUPIN_PACKET_REFS_SMEM_MAX", 768_000))
    if geo_bytes > geo_max or refs_bytes > refs_max:
        key = ("top_tab", rows)
        if key not in _GATE_LOGGED:
            _GATE_LOGGED.add(key)
            print(
                f"# packet backend ineligible: top tree {rows} rows -> "
                f"geo {geo_bytes / 1e6:.1f} MB VMEM (max {geo_max / 1e6:.0f}) "
                f"/ refs {refs_bytes / 1e3:.0f} KB SMEM "
                f"(max {refs_max / 1e3:.0f}); using the sort wavefront",
                file=sys.stderr,
            )
        return False
    return True


def _use_packet(scene, coherent: bool = True) -> bool:
    from . import pallas_packet

    if pallas_packet.env_on("LUPIN_NO_PACKET"):
        return False
    # Packet is the COHERENT-batch specialist (VERDICT r4 #5, decided from
    # the round-5 A/B): on camera-tiled batches it beats the sort wavefront
    # (17.1 vs 20.9 ms / 131k rays, prof_opt 2026-08-19) but on divergent
    # bounce batches it loses by ~7x (184-450 ms vs 25-31 ms, even with
    # morton/prev-superleaf coherence sorting). Callers mark their in-loop
    # bounce batches coherent=False; primary-visibility dispatches
    # (camera prologue, falsecolor/debug AOVs) keep the packet path.
    # LUPIN_FORCE_PACKET overrides for measurement.
    if not coherent and not pallas_packet.env_on("LUPIN_FORCE_PACKET"):
        return False
    if not packet_eligible(scene):
        return False

    # The probe runs eagerly in build_scene_tpu (host side — this function
    # is called during tracing, where a probe cannot execute). An unprobed
    # signature means no such scene was built this process; treat as OK —
    # the renderer's dispatch-time fallback (renderer.pathtrace_scene)
    # still catches a failure there.
    key = pallas_packet.scene_probe_key(scene)
    return pallas_packet._PROBE_OK.get(key) is not False


# ---------------------------------------------------------------------------
# Dense triangle coefficient matrix
# ---------------------------------------------------------------------------


def build_tri_matrix(v0T, e1T, e2T):
    """Per-triangle coefficient matrix W with shape (4, 10, T) from
    component-major (3, T) triangle tables.

    Row layout of the ray feature vector R = [d, o x d, o, 1]:
      det = R . [n, 0, 0, 0]                    n = e1 x e2
      nu  = R . [e2 x v0, -e2, 0, 0]            (u numerator)
      nv  = R . [-(e1 x v0), e1, 0, 0]          (v numerator)
      nt  = R . [0, 0, -n, n.v0]                (t numerator)
    so that t = nt/det, u = nu/det, v = nv/det — identical algebra to
    ray_tri_dst (pathtracer.wgsl:2922-2943), hoisted per-triangle.
    """

    v0 = v3.from_t3(v0T)
    e1 = v3.from_t3(e1T)
    e2 = v3.from_t3(e2T)
    n = v3.cross(e1, e2)
    c_e2v0 = v3.cross(e2, v0)
    c_e1v0 = v3.cross(e1, v0)
    ndotv0 = v3.dot(n, v0)
    T = v0.x.shape[0]
    z = jnp.zeros(T, v0.x.dtype)
    rows = [
        [n.x, n.y, n.z, z, z, z, z, z, z, z],
        [c_e2v0.x, c_e2v0.y, c_e2v0.z, -e2.x, -e2.y, -e2.z, z, z, z, z],
        [-c_e1v0.x, -c_e1v0.y, -c_e1v0.z, e1.x, e1.y, e1.z, z, z, z, z],
        [z, z, z, z, z, z, -n.x, -n.y, -n.z, ndotv0],
    ]
    return jnp.stack([jnp.stack(r, axis=0) for r in rows], axis=0)  # (4,10,T)


def scene_tri_matrix(scene) -> jnp.ndarray:
    """Dense coefficient matrix over the world triangle soup. Dense scenes
    trim to the real triangle count (the Pallas wrapper re-pads to its block
    size); superleaf scenes cover the full fixed-stride repacked soup
    (padding rows are degenerate -> det = 0 -> never valid)."""

    if scene.use_bvh and scene.sl_count > 0:
        # Two-level scenes: the soup covers MESH superleaves (instances
        # share them); single-level: msl_count == sl_count.
        n = scene.msl_count * scene.sl_stride
    else:
        n = scene.num_world_tris
    return build_tri_matrix(
        scene.wt_v0[:, :n], scene.wt_e1[:, :n], scene.wt_e2[:, :n]
    )


def ray_features(ro: V3, rd: V3) -> jnp.ndarray:
    """R = [d, o x d, o, 1] with shape (B, 10)."""

    c = v3.cross(ro, rd)
    ones = jnp.ones_like(ro.x)
    return jnp.stack(
        [rd.x, rd.y, rd.z, c.x, c.y, c.z, ro.x, ro.y, ro.z, ones], axis=-1
    )


def dense_tuv(R: jnp.ndarray, W4: jnp.ndarray, eps):
    """All-pairs t/u/v/det via (B,10)@(10,4T); invalid pairs at t = +inf
    (NaN-safe: degenerate padding triangles produce det = 0)."""

    T = W4.shape[2]
    M = jnp.dot(
        R,
        jnp.transpose(W4, (1, 0, 2)).reshape(10, 4 * T),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).reshape(-1, 4, T)
    det, nu, nv, nt = M[:, 0], M[:, 1], M[:, 2], M[:, 3]
    d = 1.0 / det
    t = nt * d
    u = nu * d
    v = nv * d
    valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= eps)
    return jnp.where(valid, t, F32_MAX), u, v, det


def closest_hit_dense_jnp(W4, ro: V3, rd: V3, eps, chunk: int | None = None):
    """Reference jnp implementation (CPU tests / verification)."""

    B = ro.x.shape[0]
    T = W4.shape[2]
    if chunk is None:
        chunk = max(512, min(B, (1 << 23) // max(4 * T, 1)))
    pad = (-B) % chunk
    R = ray_features(ro, rd)
    if pad:
        R = jnp.pad(R, ((0, pad), (0, 0)))
    Rf = R.reshape(-1, chunk, 10)

    def one_chunk(R):
        t, u, v, det = dense_tuv(R, W4, eps)
        best = jnp.argmin(t, axis=1)
        bi = jnp.arange(R.shape[0])
        return t[bi, best], u[bi, best], v[bi, best], det[bi, best], best.astype(
            jnp.int32
        )

    bt, bu, bv, bdet, btri = jax.lax.map(one_chunk, Rf)
    out = [a.reshape(-1)[:B] for a in (bt, bu, bv, bdet, btri)]
    return tuple(out)


# An unrolled per-triangle sweep was measured ~10x SLOWER than the Pallas
# MXU kernel even for 36 triangles (scalar broadcasts defeat fusion) and was
# removed; see git history / ROADMAP.md if the experiment needs reviving.


# ---------------------------------------------------------------------------
# Batched masked-stack BVH traversal (component-wise lane math)
# ---------------------------------------------------------------------------


def _ray_aabb_dst(ro: V3, inv_d: V3, lo: V3, hi: V3):
    """Slab test (pathtracer.wgsl:2906-2918); returns F32_MAX on miss."""

    tx1 = (lo.x - ro.x) * inv_d.x
    tx2 = (hi.x - ro.x) * inv_d.x
    ty1 = (lo.y - ro.y) * inv_d.y
    ty2 = (hi.y - ro.y) * inv_d.y
    tz1 = (lo.z - ro.z) * inv_d.z
    tz2 = (hi.z - ro.z) * inv_d.z
    t1x = jnp.minimum(tx1, tx2)
    t2x = jnp.maximum(tx1, tx2)
    t1y = jnp.minimum(ty1, ty2)
    t2y = jnp.maximum(ty1, ty2)
    t1z = jnp.minimum(tz1, tz2)
    t2z = jnp.maximum(tz1, tz2)
    dst_far = jnp.minimum(jnp.minimum(t2x, t2y), t2z)
    dst_near = jnp.maximum(jnp.maximum(t1x, t1y), t1z)
    did_hit = (dst_far >= dst_near) & (dst_far > 0.0)
    return jnp.where(did_hit, dst_near, F32_MAX)


def _ray_tri(ro: V3, rd: V3, tv0: V3, te1: V3, te2: V3, eps):
    """Per-lane ray_tri_dst (pathtracer.wgsl:2922-2943)."""

    n = v3.cross(te1, te2)
    rov0 = ro - tv0
    q = v3.cross(rov0, rd)
    det = v3.dot(rd, n)
    d = 1.0 / det
    u = d * -v3.dot(q, te2)
    v = d * v3.dot(q, te1)
    t = d * -v3.dot(n, rov0)
    valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= eps)
    return jnp.where(valid, t, F32_MAX), u, v, det


def closest_hit_bvh(scene, ro: V3, rd: V3, eps, with_counts: bool = False):
    """Masked wavefront traversal of the world BVH. Every live lane advances
    one node per iteration; the loop runs until every lane's stack is empty.
    Near-child-first ordered push with best-t pruning matches
    bvh_custom.wgsl:246-284."""

    B = ro.x.shape[0]
    S = scene.bvh_depth + 2
    K = scene.bvh_leaf_size
    inv_d = 1.0 / rd
    # Stack layout (S, B): component-major so every row is lane-dense (a
    # (B, S) stack would pad S -> 128 lanes and the pop would be a slow
    # per-lane 2-D gather). Pop = one-hot masked sum over the S rows; push =
    # masked row writes. S is ~27, so these are cheap full-lane VPU passes.
    rows = jnp.arange(S, dtype=jnp.int32)[:, None]

    def set_stack(stack, sp, val, push):
        return jnp.where((rows == sp[None, :]) & push[None, :], val[None, :], stack)

    def read_stack(stack, sp):
        return jnp.sum(jnp.where(rows == sp[None, :], stack, 0), axis=0)

    init = dict(
        stack=jnp.zeros((S, B), jnp.int32),
        sp=jnp.ones(B, jnp.int32),
        best_t=jnp.full(B, F32_MAX),
        best_u=jnp.zeros(B, jnp.float32),
        best_v=jnp.zeros(B, jnp.float32),
        best_det=jnp.zeros(B, jnp.float32),
        best_tri=jnp.zeros(B, jnp.int32),
        n_tri=jnp.zeros(B, jnp.int32),
        n_aabb=jnp.zeros(B, jnp.int32),
    )

    def cond(c):
        return jnp.any(c["sp"] > 0)

    def body(c):
        active = c["sp"] > 0
        sp = jnp.where(active, c["sp"] - 1, 0)
        node = read_stack(c["stack"], sp)
        count = scene.bvh_count[node]
        first = scene.bvh_first[node]
        is_leaf = active & (count > 0)
        is_int = active & (count == 0)

        best_t, best_u, best_v, best_det, best_tri = (
            c["best_t"],
            c["best_u"],
            c["best_v"],
            c["best_det"],
            c["best_tri"],
        )
        # Leaf: fixed-size triangle block (masked beyond tri_count).
        for k in range(K):
            ti = first + k
            tv0 = v3.gather(scene.wt_v0, ti)
            te1 = v3.gather(scene.wt_e1, ti)
            te2 = v3.gather(scene.wt_e2, ti)
            t, u, v, det = _ray_tri(ro, rd, tv0, te1, te2, eps)
            upd = is_leaf & (k < count) & (t < best_t)
            best_u = jnp.where(upd, u, best_u)
            best_v = jnp.where(upd, v, best_v)
            best_det = jnp.where(upd, det, best_det)
            best_tri = jnp.where(upd, ti, best_tri)
            best_t = jnp.where(upd, t, best_t)

        # Internal: ordered push of both children.
        lc = first
        rc = first + 1
        tl = _ray_aabb_dst(
            ro, inv_d, v3.gather(scene.bvh_min, lc), v3.gather(scene.bvh_max, lc)
        )
        tr = _ray_aabb_dst(
            ro, inv_d, v3.gather(scene.bvh_min, rc), v3.gather(scene.bvh_max, rc)
        )
        push_l = is_int & (tl < best_t)
        push_r = is_int & (tr < best_t)
        left_near = tl <= tr
        far = jnp.where(left_near, rc, lc)
        near = jnp.where(left_near, lc, rc)
        push_far = jnp.where(left_near, push_r, push_l)
        push_near = jnp.where(left_near, push_l, push_r)

        stack = set_stack(c["stack"], sp, far, push_far)
        sp = sp + push_far.astype(jnp.int32)
        stack = set_stack(stack, sp, near, push_near)
        sp = sp + push_near.astype(jnp.int32)

        # Debug counters (RAY_DEBUG_INFO, pathtracer.wgsl:2945-2951).
        n_tri = c["n_tri"] + jnp.where(is_leaf, jnp.minimum(count, K), 0)
        n_aabb = c["n_aabb"] + jnp.where(is_int, 2, 0)

        return dict(
            stack=stack,
            sp=sp,
            best_t=best_t,
            best_u=best_u,
            best_v=best_v,
            best_det=best_det,
            best_tri=best_tri,
            n_tri=n_tri,
            n_aabb=n_aabb,
        )

    c = jax.lax.while_loop(cond, body, init)
    hit = c["best_t"] < F32_MAX
    info = HitInfo(
        hit=hit,
        dst=c["best_t"],
        u=c["best_u"],
        v=c["best_v"],
        tri=c["best_tri"],
        backside=c["best_det"] > 0.0,
    )
    if with_counts:
        return info, (c["n_tri"], c["n_aabb"])
    return info


def closest_hit_brute_two_level(scene, ro: V3, rd: V3, eps, W, chunk=16):
    """Brute-force two-level closest hit: every (ray, global superleaf)
    pair evaluated by dense batched matmuls over gsl chunks (lax.map).

    O(B * n_gsl * SP) — strictly a REFERENCE for probe-sized batches
    (pallas_packet.probe_scene): unlike the sort wavefront it contains no
    Pallas kernel, so it compiles at ANY instance count (the sort backend's
    SMEM/VMEM tables scale with n_inst/n_sl and stop compiling around 10k
    instances on v5e). Same coefficient algebra as both real backends
    (build_tri_matrix), instance transform per bvh_custom.wgsl:30-35
    (direction unnormalized so t stays world-scaled). Ties broken toward
    the lowest global triangle id."""

    B = ro.x.shape[0]
    SP = scene.sl_stride
    n_gsl = scene.sl_count
    Wr = W.reshape(4, 10, scene.msl_count, SP)
    G = -(-n_gsl // chunk) * chunk
    n_ch = G // chunk

    def padg(x, fill):
        return jnp.pad(x, ((0, G - n_gsl),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    msl_ch = padg(scene.gsl_msl.astype(jnp.int32), 0).reshape(n_ch, chunk)
    inv_ch = padg(
        scene.inst_inv.reshape(-1, 12)[scene.gsl_inst], 0.0
    ).reshape(n_ch, chunk, 12)
    valid_ch = (jnp.arange(G, dtype=jnp.int32) < n_gsl).reshape(n_ch, chunk)
    gid_ch = jnp.arange(G, dtype=jnp.int32).reshape(n_ch, chunk)

    def body(args):
        msl_c, inv_c, val_c, gid_c = args
        # Mesh-space ray frame per (gsl, ray): (C, B) components.
        m = [inv_c[:, j : j + 1] for j in range(12)]
        ox = m[0] * ro.x + m[1] * ro.y + m[2] * ro.z + m[3]
        oy = m[4] * ro.x + m[5] * ro.y + m[6] * ro.z + m[7]
        oz = m[8] * ro.x + m[9] * ro.y + m[10] * ro.z + m[11]
        dx = m[0] * rd.x + m[1] * rd.y + m[2] * rd.z
        dy = m[4] * rd.x + m[5] * rd.y + m[6] * rd.z
        dz = m[8] * rd.x + m[9] * rd.y + m[10] * rd.z
        cx = oy * dz - oz * dy
        cy = oz * dx - ox * dz
        cz = ox * dy - oy * dx
        RT = jnp.stack(
            [dx, dy, dz, cx, cy, cz, ox, oy, oz, jnp.ones_like(ox)], axis=1
        )  # (C, 10, B)
        Wc = jnp.take(Wr, msl_c, axis=2)  # (4, 10, C, SP)
        vals = jnp.einsum(
            "frcs,crb->fcbs", Wc, RT,
            precision=jax.lax.Precision.HIGHEST,
        )  # (4, C, B, SP)
        det, nu, nv, nt = vals[0], vals[1], vals[2], vals[3]
        d = 1.0 / det
        tt, uu, vv = nt * d, nu * d, nv * d
        ok = (
            (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) & (tt >= eps)
            & val_c[:, None, None]
        )
        tm = jnp.where(ok, tt, F32_MAX)  # (C, B, SP)
        flat = tm.transpose(1, 0, 2).reshape(B, chunk * SP)
        k = jnp.argmin(flat, axis=1)  # first minimum = lowest (c, s)
        bt = jnp.take_along_axis(flat, k[:, None], axis=1)[:, 0]
        tri = gid_c[k // SP] * SP + (k % SP)
        return bt, tri

    bts, btris = jax.lax.map(body, (msl_ch, inv_ch, valid_ch, gid_ch))
    k = jnp.argmin(bts, axis=0)  # (B,) first minimal chunk on ties
    t = jnp.take_along_axis(bts, k[None], axis=0)[0]
    tri = jnp.take_along_axis(btris, k[None], axis=0)[0]
    return HitInfo(
        hit=t < F32_MAX, dst=t, u=jnp.zeros_like(t), v=jnp.zeros_like(t),
        tri=jnp.where(t < F32_MAX, tri, 0), backside=jnp.zeros_like(t) > 0,
    )


def count_traversal(scene, ro: V3, rd: V3, eps):
    """Per-ray tri/AABB check counts for one closest-hit query (the debug
    heatmap's data source). Dense mode tests every triangle by design."""

    B = ro.x.shape[0]
    if scene.instances_empty:
        z = jnp.zeros(B, jnp.int32)
        return z, z
    if scene.use_bvh:
        if scene.two_level or (_use_pallas() and scene.sl_count > 0):
            # Real wavefront counters (RAY_DEBUG_INFO analog,
            # pathtracer.wgsl:2945-2951): n_tri = triangles actually
            # evaluated by the MXU pair kernel for this ray (visited
            # superleaves x stride), n_aabb = top-tree slab tests. Same
            # semantics as the masked-stack walk's counters — both report
            # the tests their backend truly performs.
            _, (n_tri, n_aabb) = closest_hit_wavefront(
                scene, ro, rd, eps, with_counts=True
            )
            return n_tri, n_aabb
        _, (n_tri, n_aabb) = closest_hit_bvh(scene, ro, rd, eps, with_counts=True)
        return n_tri, n_aabb
    n_tri = jnp.full(B, scene.num_world_tris, jnp.int32)
    return n_tri, jnp.zeros(B, jnp.int32)


# ---------------------------------------------------------------------------
# Wavefront two-level traversal (TPU; see kernels/pallas_bvh.py)
# ---------------------------------------------------------------------------

WF_Q = 8  # superleaf hits collected per ray per round (v5e sweep: Q=8 +
# SP=1024 beat Q=4/SP=2048 by 11% on arealights1 — fewer rounds outweighs
# the larger sort)
WF_Q_DIVERGENT = 8  # divergent bounce batches. On an ISOLATED pure
# bounce batch Q=4 wins (26.7 vs 30.7 ms, prof_opt 2026-08-19), but the
# real integrator loop mixes respawned camera rays with deep bounce rays
# and iterates until the batch drains: end-to-end Q_DIV=8 measured 959 ms
# vs Q_DIV=4's 1014 ms on the arealights1 512x256 8spp pathtrace
# (out_hw/prof_e2e.log) — fewer stage-1 rounds on the mixed batch beat
# the smaller per-round sort. The e2e number is the one that ships.
WF_Q_TAIL = 32  # straggler rounds: few lanes x many remaining visits —
# a high Q drains a deep ray's whole line in 1-2 rounds while the sort
# stays small (QB_tail = C * Q_TAIL ~ Bp * 4 slots)
WF_RAY_BLOCK = 2048
WF_PAIR_BLOCK = 256
WF_TAIL_C = 2048  # straggler-compaction capacity: full rounds repeat until
# pending <= C, then the C-lane compacted tail drains the rest. Read via
# _wf_env so hardware sweeps can vary it without code edits (tools/
# prof_iter.py); values are trace-time constants, so changing the env
# requires a fresh jit (bench's _timed_env clears the cache).


def _wf_env(name, default):
    import os

    return int(os.environ.get(name, default))
INST_SMEM_MAX = 2048  # above this, per-instance tables no longer ride the
# attr kernel as SMEM scalar-prefetch operands (Mosaic pads (n, 9) f32 to
# (n, 128) — 51 MB vs the 1 MB SMEM budget at 100k instances); the
# instance rotation moves to an XLA tail (_rotate_attrs_by_instance)


def closest_hit_wavefront(
    scene, ro: V3, rd: V3, eps, W=None, active=None,
    with_counts: bool = False, coherent: bool = True,
):
    """TPU wavefront replacement for the masked-stack walk: rounds of
    {top-tree traversal -> MXU pair intersection -> per-ray min} until all
    stacks drain (bvh_custom.wgsl:195-288 reimagined for the MXU; see
    kernels/pallas_bvh.py).

    `active` (optional (B,) bool) marks lanes whose result is consumed:
    inactive lanes skip traversal entirely (empty stack -> miss) so a
    mostly-masked batch costs only the fixed sort floors."""

    from . import pallas_bvh as pb

    B = ro.x.shape[0]
    SP = scene.sl_stride
    # Superleaf tables exist for every scene (both backends are built); a
    # dense-trimmed W from the caller is rebuilt at the repacked-soup width
    # the kernels' (4, 10, SP) slicing requires. XLA CSEs / hoists this out
    # of bounce loops.
    W = _wavefront_tri_matrix(scene, W)

    if not with_counts and _use_packet(scene, coherent):
        from . import pallas_packet

        t, u, v, det, tri = pallas_packet.packet_traverse(
            scene, ro, rd, eps, W, active=active
        )
        return HitInfo(
            hit=t < F32_MAX, dst=t, u=u, v=v,
            tri=jnp.maximum(tri, 0), backside=det > 0.0,
        )

    pad = (-B) % WF_RAY_BLOCK
    Bp = B + pad

    def padv(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill) if pad else x

    rop = V3(padv(ro.x), padv(ro.y), padv(ro.z))
    rdp = V3(padv(rd.x), padv(rd.y, 1.0), padv(rd.z))
    PB = WF_PAIR_BLOCK

    if scene.top_root_is_leaf:
        # Single superleaf: every ray tests superleaf 0; one work item per
        # ray block, no sort.
        n_blk = -(-Bp // PB)
        ppad = n_blk * PB - Bp

        def padp(x, fill=0.0):
            return jnp.pad(x, (0, ppad), constant_values=fill) if ppad else x

        pro = V3(padp(rop.x), padp(rop.y), padp(rop.z))
        prd = V3(padp(rdp.x), padp(rdp.y, 1.0), padp(rdp.z))
        blk = jnp.arange(n_blk, dtype=jnp.int32)
        sl0 = jnp.zeros(n_blk, jnp.int32)
        # Two-level scenes keep the soup in MESH space: the instance
        # transform must ride along even in the one-superleaf shortcut
        # (same tables the multi-superleaf path passes at line ~833).
        msl_k, inst_k, txf_tab, _, _ = _item_instancing(scene, sl0)
        t, u, v, det, li = pb.pair_intersect(
            blk, sl0,
            blk * PB, blk * PB + PB,
            pro, prd, W, eps, SP=SP, pair_block=PB,
            msl=msl_k, inst=inst_k, txf_tab=txf_tab,
        )
        t, u, v, det, li = (a[:B] for a in (t, u, v, det, li))
        h = HitInfo(
            hit=t < F32_MAX, dst=t, u=u, v=v, tri=li, backside=det > 0.0
        )
        if with_counts:
            return h, (jnp.full(B, SP, jnp.int32), jnp.zeros(B, jnp.int32))
        return h

    # Wide-tree stack bound: popping at depth d leaves <= TOP_FAN-1 siblings
    # per ancestor level on the stack, plus this pop's <= TOP_FAN pushes.
    from ..accel.superleaf import TOP_FAN

    S = (TOP_FAN - 1) * scene.top_depth + TOP_FAN + 2

    Q_main = (
        _wf_env("LUPIN_WF_Q", WF_Q)
        if coherent
        else _wf_env("LUPIN_WF_Q_DIV", WF_Q_DIVERGENT)
    )

    real_lane = jnp.arange(Bp) < B
    if active is not None:
        real_lane = real_lane & padv(active, False)
    init = dict(
        stack=jnp.zeros((S, Bp), jnp.int32),  # root ref = row 0
        sp=real_lane.astype(jnp.int32),
        best_t=jnp.full(Bp, F32_MAX),
        best_u=jnp.zeros(Bp, jnp.float32),
        best_v=jnp.zeros(Bp, jnp.float32),
        best_det=jnp.zeros(Bp, jnp.float32),
        best_tri=jnp.zeros(Bp, jnp.int32),
    )
    if with_counts:
        init["n_tri"] = jnp.zeros(Bp, jnp.int32)
        init["n_aabb"] = jnp.zeros(Bp, jnp.int32)

    def full_round(c):
        return _wf_round(scene, W, eps, rop, rdp, c, S=S, PB=PB, Q=Q_main)

    # Stage 1: full-batch rounds while the straggler set is still large.
    # Stage 2: the few lanes with deep traversals (misses have no best-t to
    # prune with and can touch every superleaf on their line) are compacted
    # into a small buffer so their extra rounds cost a fraction of a full
    # sweep — the lockstep-tail fix the masked-stack walk never had.
    # C is deliberately SMALL: with the 8-wide top tree + Q=8 emission one
    # full round drains ~99.9% of lanes (measured: 86/131k pending on
    # arealights1), and the tail's dominant cost is the (S + 16) x C
    # gather/scatter of compacted state — C = 16k cost ~10 ms/round for 86
    # live lanes. A second full round (rare) is cheaper than a big buffer.
    C = min(Bp, _wf_env("LUPIN_WF_TAIL_C", WF_TAIL_C))
    if Bp > C:
        c = jax.lax.while_loop(
            lambda c: jnp.sum((c["sp"] > 0).astype(jnp.int32)) > C,
            full_round,
            init,
        )
    else:
        c = init  # Bp <= C: stage 1 is skipped, the tail covers everything

    arange_b = jnp.arange(Bp, dtype=jnp.int32)
    arange_c = jnp.arange(C, dtype=jnp.int32)

    def tail_round(c):
        pending = c["sp"] > 0
        n_pend = jnp.cumsum(pending.astype(jnp.int32))
        slot = jnp.where(pending, n_pend - 1, C)
        idx = jnp.zeros(C, jnp.int32).at[slot].set(arange_b, mode="drop")
        valid = arange_c < n_pend[-1]

        ro_c = v3.V3(rop.x[idx], rop.y[idx], rop.z[idx])
        rd_c = v3.V3(rdp.x[idx], rdp.y[idx], rdp.z[idx])
        keys_1d = [k for k in c if k != "stack"]
        cc = {k: c[k][idx] for k in keys_1d}
        cc["sp"] = jnp.where(valid, cc["sp"], 0)
        cc["stack"] = c["stack"][:, idx]
        cc = _wf_round(scene, W, eps, ro_c, rd_c, cc, S=S, PB=PB,
                       Q=_wf_env("LUPIN_WF_Q_TAIL", WF_Q_TAIL))

        back = jnp.where(valid, idx, Bp)  # invalid slots dropped
        out = dict(c)
        out["stack"] = c["stack"].at[:, back].set(cc["stack"], mode="drop")
        for k in keys_1d:
            out[k] = c[k].at[back].set(cc[k], mode="drop")
        return out

    c = jax.lax.while_loop(
        lambda c: jnp.any(c["sp"] > 0), tail_round, c
    )
    t = c["best_t"][:B]
    h = HitInfo(
        hit=t < F32_MAX,
        dst=t,
        u=c["best_u"][:B],
        v=c["best_v"][:B],
        tri=jnp.maximum(c["best_tri"][:B], 0),
        backside=c["best_det"][:B] > 0.0,
    )
    if with_counts:
        return h, (c["n_tri"][:B], c["n_aabb"][:B])
    return h


def _wf_work_items(skey, n_sl, PB, cnt_sl=None):
    """Work-item table from superleaf-sorted keys (empties keyed n_sl).

    Superleaf s covers sorted positions [seg_start[s], seg_start[s+1]) =
    blocks first_blk..last_blk; boundary blocks get one item per segment.
    Returns (blk, sl, lo, hi, n_real, n_items): block-monotone items sized
    to the static cap n_blocks + n_sl, with invalid tail items repeating the
    last valid block/superleaf (kernels skip them via lo == hi, and
    repeating the ids keeps resident blocks unchanged so write-back is
    idempotent). `n_items` is the traced count of VALID items — pass it to
    the kernels' dynamic grid so the (typically ~90% empty) static tail
    costs nothing: the measured fixed cost is ~1.5 us per grid step even
    when every DMA is skipped, which dominated the pair kernel at the old
    static cap.

    `cnt_sl` (>= n_sl,) — the per-superleaf demand histogram, produced for
    free by the top-traverse kernel — turns seg_start into a tiny cumsum;
    without it, compare_all searchsorted (the O(QB log QB) method="sort"
    merge costs 9-16 ms per round at QB = 1M)."""

    P = skey.shape[0]
    n_pb = P // PB
    if cnt_sl is not None:
        seg_start = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(cnt_sl[:n_sl])]
        ).astype(jnp.int32)
    else:
        # seg_start[s] = first sorted position with key >= s. method="sort"
        # (one merged sort, O((QB+n_sl) log)) — compare_all is O(n_sl * QB)
        # and regresses badly on many-superleaf two-level scenes, which are
        # exactly the ones that take this fallback now that the in-kernel
        # histogram is gated to n_sl <= 1024 (ADVICE r3 #4).
        qs = jnp.arange(n_sl + 1, dtype=jnp.int32)
        seg_start = jnp.searchsorted(
            skey, qs, side="left", method="sort"
        ).astype(jnp.int32)
    cnt_sl = seg_start[1:] - seg_start[:-1]  # (n_sl,)
    n_real = seg_start[n_sl]

    first_blk = seg_start[:n_sl] // PB
    last_blk = jnp.maximum(seg_start[1:] - 1, seg_start[:n_sl]) // PB
    n_items_s = jnp.where(cnt_sl > 0, last_blk - first_blk + 1, 0)
    ioff = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(n_items_s)]
    )
    total_items = ioff[n_sl]
    W_CAP = n_pb + min(n_sl, P)
    karr = jnp.arange(W_CAP, dtype=jnp.int32)
    # method="sort" (one merged sort): compare_all is O(n_sl * W_CAP) —
    # ~1.7e10 compares at 131k superleaves, on exactly the many-superleaf
    # scenes this path serves (same reasoning as seg_start above).
    s_k = jnp.searchsorted(
        ioff[1:], karr, side="right", method="sort"
    ).astype(jnp.int32)
    s_k = jnp.minimum(s_k, n_sl - 1)
    valid_k = karr < total_items
    blk_k = first_blk[s_k] + (karr - ioff[s_k])
    blk_k = jnp.maximum(
        jax.lax.cummax(jnp.where(valid_k, blk_k, -1)), 0
    )
    sl_k = jnp.maximum(jax.lax.cummax(jnp.where(valid_k, s_k, -1)), 0)
    lo_k = jnp.where(valid_k, seg_start[s_k], 0)
    hi_k = jnp.where(valid_k, seg_start[s_k + 1], 0)
    # >=1 so an all-empty round still launches a (skipped, lo==hi) step.
    n_items = jnp.maximum(total_items, 1).astype(jnp.int32)
    return blk_k, sl_k, lo_k, hi_k, n_real, n_items


@struct.dataclass
class InterpAttrs:
    """Per-ray shading attributes pre-interpolated at the hit barycentrics
    by the BVH wavefront's attr_fetch kernel (see pallas_bvh.IA_* layout).
    Plays the role the dense kernel's packed (ATTR_WIDTH, B) matrix plays
    for small scenes: per-material fields are reconstructed from mat_id by
    a static select-chain in render/materials (the material table is tiny),
    so nothing here needs a lane gather."""

    n: V3          # unnormalized interpolated shading normal
    gn: V3         # geometric normal
    tu: jnp.ndarray
    tv: jnp.ndarray
    has_uv: jnp.ndarray  # bool
    vc: V3         # interpolated vertex color
    vca: jnp.ndarray
    det_sign: jnp.ndarray
    mat_id: jnp.ndarray  # i32
    tan: V3 | None = None  # only when the scene has normal maps
    bit: V3 | None = None


def _item_instancing(scene, sl_k):
    """Per-work-item (mesh superleaf, instance index) plus the per-INSTANCE
    SMEM tables for the two-level path; Nones for single-level scenes
    (kernels substitute a one-row identity). Per-item data is only the i32
    index — SMEM is 1MB and a per-item 12-float copy overflows it at large
    work-item counts."""

    if not scene.two_level:
        return sl_k, None, None, None, None
    inst_k = scene.gsl_inst[sl_k]
    msl_k = scene.gsl_msl[sl_k]
    txf_tab = scene.inst_inv.reshape(-1, 12)
    nrm_tab = scene.inst_normal_mat.reshape(-1, 9)
    ovr_tab = scene.inst_mat.astype(jnp.int32)
    return msl_k, inst_k, txf_tab, nrm_tab, ovr_tab


def wavefront_fetch_attrs(scene, hit: HitInfo) -> InterpAttrs:
    """InterpAttrs for the BVH wavefront path — the analog of the dense
    kernel's in-kernel attr fetch.

    Rays are sorted by winning superleaf (misses keyed n_sl, sorted last),
    the winner's attribute row is one-hot-fetched and interpolated per work
    item from that superleaf's (SP, ATTR_WIDTH) slice, and the compact rows
    ride one variadic sort keyed on the original ray index back to ray
    order — replacing ~45 XLA lane gathers (~4-6 ms each at 131k rays)
    with two sorts and one MXU kernel. The row count is capped so the
    un-sort stays a single <=16-operand sort (XLA TPU sort compile time
    explodes beyond that); tangent frames ride a second small sort only
    when the scene has normal maps."""

    from . import pallas_bvh as pb
    from . import pallas_intersect as pk

    B = hit.tri.shape[0]
    SP = scene.sl_stride
    n_sl = scene.sl_count
    PB = WF_PAIR_BLOCK
    pad = (-B) % PB
    Bp = B + pad

    def padv(x, fill):
        return jnp.pad(x, (0, pad), constant_values=fill) if pad else x

    hitm = padv(hit.hit, False)
    tri = jnp.where(hitm, padv(hit.tri, 0), 0)
    key = jnp.where(hitm, tri // SP, n_sl).astype(jnp.int32)
    li = jnp.where(hitm, tri % SP, 0)
    ridx = jnp.arange(Bp, dtype=jnp.int32)
    skey, s_ridx, s_li, s_u, s_v = jax.lax.sort(
        (key, ridx, li, padv(hit.u, 0.0), padv(hit.v, 0.0)), num_keys=1
    )

    blk_k, sl_k, lo_k, hi_k, _, n_items = _wf_work_items(skey, n_sl, PB)
    msl_k, inst_k, _, nrm_tab, ovr_tab = _item_instancing(scene, sl_k)
    A3 = scene.wt_attr[: scene.msl_count * SP].reshape(
        scene.msl_count, SP, pk.ATTR_WIDTH
    )
    with_tan = bool(scene.any_normal_maps)
    # Per-instance tables ride the kernel as scalar-prefetch SMEM operands,
    # which Mosaic pads to (rows, 128) — (n_inst, 9) f32 is 51 MB of SMEM at
    # 100k instances against the 1 MB budget (observed OOM on v5e). Huge-
    # instance scenes run the kernel in mesh space (identity tables) and
    # apply the instance rotation + material override in XLA afterwards:
    # three lane gathers per batch, only on the scenes where SMEM residency
    # is impossible.
    huge_inst = scene.two_level and scene.num_instances > INST_SMEM_MAX
    if huge_inst:
        inst_k = nrm_tab = ovr_tab = None
    a = pb.attr_fetch(
        blk_k, msl_k, lo_k, hi_k, s_li, s_u, s_v, A3,
        pair_block=PB, with_tangents=with_tan, inst=inst_k,
        nrm_tab=nrm_tab, ovr_tab=ovr_tab, n_items_dyn=n_items,
    )  # (IA_ROWS[_NM], Bp) in sorted order

    base = jax.lax.sort(
        (s_ridx, *[a[i] for i in range(pb.IA_ROWS - 1)]), num_keys=1
    )[1:]

    def cut(x):
        x = jnp.where(hitm, x, 0.0)
        return x[:B] if pad else x

    r = [cut(x) for x in base]
    tan = bit = None
    if with_tan:
        tb = jax.lax.sort(
            (s_ridx, *[a[i] for i in range(pb.IA_TAN.start, pb.IA_BIT.stop)]),
            num_keys=1,
        )[1:]
        tb = [cut(x) for x in tb]
        tan = V3(tb[0], tb[1], tb[2])
        bit = V3(tb[3], tb[4], tb[5])

    ia = pb
    out = InterpAttrs(
        n=V3(r[ia.IA_N.start], r[ia.IA_N.start + 1], r[ia.IA_N.start + 2]),
        gn=V3(r[ia.IA_GN.start], r[ia.IA_GN.start + 1], r[ia.IA_GN.start + 2]),
        tu=r[ia.IA_TU],
        tv=r[ia.IA_TV],
        has_uv=r[ia.IA_HAS_UV] > 0.0,
        vc=V3(r[ia.IA_VC.start], r[ia.IA_VC.start + 1], r[ia.IA_VC.start + 2]),
        vca=r[ia.IA_VCA],
        det_sign=r[ia.IA_DET_SIGN],
        mat_id=r[ia.IA_MAT_ID].astype(jnp.int32),
        tan=tan,
        bit=bit,
    )
    if huge_inst:
        out = _rotate_attrs_by_instance(scene, hit, out)
    return out


def _rotate_attrs_by_instance(scene, hit: HitInfo, ia: InterpAttrs):
    """XLA tail of the huge-instance attr path: the attr kernel ran with
    identity instance tables (see wavefront_fetch_attrs), so the rows are
    still mesh-space. Reproduces exactly what _attr_kernel does in-kernel
    for two-level items: rotate n/gn/tan/bit by the winning instance's
    normal matrix (gn renormalized), override mat_id. Miss lanes hold
    zeros; rotating zeros keeps them zeros."""

    SP = scene.sl_stride
    gsl = jnp.where(hit.hit, hit.tri, 0) // SP
    inst = scene.gsl_inst[gsl]
    nm = scene.inst_normal_mat.reshape(-1, 9)[inst]  # (B, 9)

    def rot(v: V3, renorm=False) -> V3:
        rx = nm[:, 0] * v.x + nm[:, 1] * v.y + nm[:, 2] * v.z
        ry = nm[:, 3] * v.x + nm[:, 4] * v.y + nm[:, 5] * v.z
        rz = nm[:, 6] * v.x + nm[:, 7] * v.y + nm[:, 8] * v.z
        if renorm:
            inv = jax.lax.rsqrt(
                jnp.maximum(rx * rx + ry * ry + rz * rz, 1e-30)
            )
            rx, ry, rz = rx * inv, ry * inv, rz * inv
        return V3(rx, ry, rz)

    ovr = scene.inst_mat[inst]
    mat_id = jnp.where(hit.hit & (ovr >= 0), ovr, ia.mat_id)
    return InterpAttrs(
        n=rot(ia.n),
        gn=rot(ia.gn, renorm=True),
        tu=ia.tu,
        tv=ia.tv,
        has_uv=ia.has_uv,
        vc=ia.vc,
        vca=ia.vca,
        det_sign=ia.det_sign,
        mat_id=mat_id,
        tan=None if ia.tan is None else rot(ia.tan),
        bit=None if ia.bit is None else rot(ia.bit),
    )


def _wf_round(scene, W, eps, rop: V3, rdp: V3, c: dict, *, S, PB, Q=None):
    """One wavefront round over `Bp = rop.x.shape[0]` lanes: top-tree
    traversal -> pair grouping -> MXU pair intersection -> per-ray min.
    `c` carries stack/sp/best_*.

    Data-movement design (XLA 1-D gathers/scatters run at only ~90M
    elem/s on TPU while variadic sorts are flat in operand count): the ray
    components ride the grouping sort as payload operands, pair blocks are
    contiguous 128-aligned slices of the sorted order (segment boundaries
    are masked in-kernel via [lo, hi) work items instead of padding each
    segment), and results return to ray-slot order via a second variadic
    sort keyed on the original slot index. Zero large gathers per round."""

    from . import pallas_bvh as pb

    Bp = rop.x.shape[0]
    SP = scene.sl_stride
    n_sl = scene.sl_count
    if Q is None:
        Q = WF_Q
    QB = Q * Bp
    n_pb = QB // PB

    sl, cnt, stack, sp, cnt_sl, aabb = pb.top_traverse(
        scene.top_tab, rop, rdp, c["best_t"], c["stack"], c["sp"],
        S=S, Q=Q, n_sl=n_sl,
    )
    # ---- group by superleaf: one sort carrying the rays (empties last) ----
    pair_sl = sl.reshape(-1)  # (QB,) q-major: slot q*Bp + r holds ray r
    key = jnp.where(pair_sl >= 0, pair_sl, n_sl).astype(jnp.int32)
    sidx = jnp.arange(QB, dtype=jnp.int32)
    skey, s_sidx, srox, sroy, sroz, srdx, srdy, srdz = jax.lax.sort(
        (key, sidx,
         jnp.tile(rop.x, Q), jnp.tile(rop.y, Q), jnp.tile(rop.z, Q),
         jnp.tile(rdp.x, Q), jnp.tile(rdp.y, Q), jnp.tile(rdp.z, Q)),
        num_keys=1,
    )

    blk_k, sl_k, lo_k, hi_k, n_real, n_items = _wf_work_items(
        skey, n_sl, PB, cnt_sl
    )
    msl_k, inst_k, txf_tab, _, _ = _item_instancing(scene, sl_k)

    if scene.two_level and scene.num_instances > INST_SMEM_MAX:
        # The per-instance transform table can't ride the pair kernel as an
        # SMEM scalar-prefetch operand at this scale (Mosaic pads (n, 12)
        # f32 to (n, 128) — 51 MB vs the 1 MB budget at 100k instances).
        # Transform the sorted pair rays into mesh space HERE instead: one
        # (QB, 12) gather per round, and the kernel runs with the identity.
        gsl_p = jnp.minimum(skey, n_sl - 1)
        m12 = scene.inst_inv.reshape(-1, 12)[scene.gsl_inst[gsl_p]]
        m = [m12[:, j] for j in range(12)]
        ox = m[0] * srox + m[1] * sroy + m[2] * sroz + m[3]
        oy = m[4] * srox + m[5] * sroy + m[6] * sroz + m[7]
        oz = m[8] * srox + m[9] * sroy + m[10] * sroz + m[11]
        dx = m[0] * srdx + m[1] * srdy + m[2] * srdz
        dy = m[4] * srdx + m[5] * srdy + m[6] * srdz
        dz = m[8] * srdx + m[9] * srdy + m[10] * srdz
        srox, sroy, sroz, srdx, srdy, srdz = ox, oy, oz, dx, dy, dz
        inst_k, txf_tab = None, None

    # ---- MXU pair intersection over sorted, aligned ray blocks ----
    t, u, v, det, ltri = pb.pair_intersect(
        blk_k, sl_k, lo_k, hi_k,
        v3.V3(srox, sroy, sroz), v3.V3(srdx, srdy, srdz),
        W, eps, SP=SP, pair_block=PB, msl=msl_k, inst=inst_k,
        txf_tab=txf_tab, n_items_dyn=n_items,
    )
    t = jnp.where(jnp.arange(QB, dtype=jnp.int32) < n_real, t, F32_MAX)
    # The kernel emits stride-local winners; globalize with the per-pair
    # sorted key (= the item's superleaf — shipping sl per item to SMEM
    # was one of the six tables that OOM'd at 100k instance-superleaves).
    gtri = ltri + jnp.minimum(skey, n_sl - 1) * SP

    # ---- back to (Q, Bp) ray slots: un-sort by original slot index ----
    _, t_s, u_s, v_s, det_s, tri_s = jax.lax.sort(
        (s_sidx, t, u, v, det, gtri), num_keys=1
    )
    t_q = t_s.reshape(Q, Bp)
    u_q = u_s.reshape(Q, Bp)
    v_q = v_s.reshape(Q, Bp)
    det_q = det_s.reshape(Q, Bp)
    tri_q = tri_s.reshape(Q, Bp)

    # ---- per-ray min: Q+1 row compares, no scatters. Strict < keeps the
    # incumbent on ties (matches bvh_custom.wgsl:262 `dst < min_dst`).
    acc_t = c["best_t"]
    bu, bv, bdet, btri = c["best_u"], c["best_v"], c["best_det"], c["best_tri"]
    for q in range(Q):
        wn = t_q[q] < acc_t
        acc_t = jnp.where(wn, t_q[q], acc_t)
        bu = jnp.where(wn, u_q[q], bu)
        bv = jnp.where(wn, v_q[q], bv)
        bdet = jnp.where(wn, det_q[q], bdet)
        btri = jnp.where(wn, tri_q[q], btri)
    out = dict(
        stack=stack,
        sp=sp,
        best_t=acc_t,
        best_u=bu,
        best_v=bv,
        best_det=bdet,
        best_tri=btri,
    )
    if "n_tri" in c:
        # Real per-ray test counts (RAY_DEBUG_INFO): every emitted
        # superleaf visit evaluates the full stride of triangles.
        out["n_tri"] = c["n_tri"] + cnt * SP
        out["n_aabb"] = c["n_aabb"] + aabb
    return out




# ---------------------------------------------------------------------------
# Unified entry points
# ---------------------------------------------------------------------------


def _fixup_backside(scene, h: HitInfo) -> HitInfo:
    flip = scene.inst_det_sign[scene.wt_inst[h.tri]] < 0.0
    return h.replace(backside=jnp.where(flip, ~h.backside, h.backside))


def closest_hit(
    scene, ro: V3, rd: V3, eps, W: jnp.ndarray | None = None, active=None,
    coherent: bool = True,
) -> HitInfo:
    """ray_scene_intersection equivalent (bvh_custom.wgsl:7-110). `active`
    masks lanes out of the wavefront traversal (perf only — inactive lanes
    report miss; other backends ignore it). `coherent=False` marks a
    divergent bounce batch: the packet backend is skipped (see
    _use_packet)."""

    if scene.instances_empty:
        return miss(ro.x.shape)

    def apply_active(h: HitInfo) -> HitInfo:
        # Uniform semantics across backends: inactive lanes report miss
        # (the wavefront skips them entirely; others mask after the fact).
        if active is None:
            return h
        m = miss(ro.x.shape)
        return jax.tree.map(lambda a, b: jnp.where(active, a, b), h, m)

    if scene.use_bvh:
        if scene.two_level:
            # Object-space intersection: hit_backside already carries the
            # reference's sign convention — no world-transform det fixup.
            return apply_active(
                closest_hit_wavefront(
                    scene, ro, rd, eps, W=W, active=active, coherent=coherent
                )
            )
        if _use_pallas() and scene.sl_count > 0:
            return apply_active(_fixup_backside(
                scene,
                closest_hit_wavefront(
                    scene, ro, rd, eps, W=W, active=active, coherent=coherent
                ),
            ))
        return apply_active(
            _fixup_backside(scene, closest_hit_bvh(scene, ro, rd, eps))
        )
    if W is None:
        W = scene_tri_matrix(scene)
    if _use_pallas():
        from .pallas_intersect import dense_closest_hit_pallas

        t, u, v, det, idx = dense_closest_hit_pallas(W, ro, rd, eps)
    else:
        t, u, v, det, idx = closest_hit_dense_jnp(W, ro, rd, eps)
    h = HitInfo(hit=t < F32_MAX, dst=t, u=u, v=v, tri=idx, backside=det > 0.0)
    return apply_active(_fixup_backside(scene, h))


def _wavefront_tri_matrix(scene, W=None):
    """Coefficient matrix at the repacked-soup width the superleaf kernels
    slice by superleaf id (shared by both wavefront backends)."""

    need = scene.msl_count * scene.sl_stride
    if W is None or W.shape[2] != need:
        W = build_tri_matrix(
            scene.wt_v0[:, :need], scene.wt_e1[:, :need], scene.wt_e2[:, :need]
        )
    return W


def _packet_hit_attrs(scene, ro: V3, rd: V3, eps, W=None, active=None):
    """One packet-kernel call returning (HitInfo, InterpAttrs): traversal
    AND winner-attribute interpolation fused (pallas_packet._attr_phase) —
    no wavefront_fetch_attrs sorts."""

    from . import pallas_bvh as pb
    from . import pallas_packet

    W = _wavefront_tri_matrix(scene, W)
    t, u, v, det, tri, r = pallas_packet.packet_traverse(
        scene, ro, rd, eps, W, active=active, with_attrs=True
    )
    h = _fixup_backside(
        scene,
        HitInfo(
            hit=t < F32_MAX, dst=t, u=u, v=v,
            tri=jnp.maximum(tri, 0), backside=det > 0.0,
        ),
    )
    if active is not None:
        # Same inactive-lane semantics as closest_hit's apply_active: a
        # clean miss (in particular backside=False even when instance 0's
        # det-sign fixup would flip the tri=0 placeholder).
        m = miss(ro.x.shape)
        h = jax.tree.map(lambda a, b: jnp.where(active, a, b), h, m)
    tan = bit = None
    if scene.any_normal_maps:
        tan = V3(r[pb.IA_TAN.start], r[pb.IA_TAN.start + 1],
                 r[pb.IA_TAN.start + 2])
        bit = V3(r[pb.IA_BIT.start], r[pb.IA_BIT.start + 1],
                 r[pb.IA_BIT.start + 2])
    ia = InterpAttrs(
        n=V3(r[pb.IA_N.start], r[pb.IA_N.start + 1], r[pb.IA_N.start + 2]),
        gn=V3(r[pb.IA_GN.start], r[pb.IA_GN.start + 1], r[pb.IA_GN.start + 2]),
        tu=r[pb.IA_TU],
        tv=r[pb.IA_TV],
        has_uv=r[pb.IA_HAS_UV] > 0.0,
        vc=V3(r[pb.IA_VC.start], r[pb.IA_VC.start + 1], r[pb.IA_VC.start + 2]),
        vca=r[pb.IA_VCA],
        det_sign=r[pb.IA_DET_SIGN],
        mat_id=r[pb.IA_MAT_ID].astype(jnp.int32),
        tan=tan,
        bit=bit,
    )
    return h, ia


def closest_hit_attrs(
    scene, ro: V3, rd: V3, eps, W: jnp.ndarray | None = None, active=None,
    coherent: bool = True,
):
    """Dense-mode closest hit returning (HitInfo, attrs (AW, B) or None).

    The attrs rows are fetched in-kernel (one-hot MXU select), eliminating
    all per-hit shading gathers. BVH scenes return attrs=None and shade via
    gathers. `active` masks lanes out of wavefront traversal (see
    closest_hit); `coherent=False` skips the packet backend (see
    _use_packet)."""

    if scene.instances_empty:
        return closest_hit(scene, ro, rd, eps, W=W), None
    if scene.use_bvh and scene.two_level:
        # Mesh-space soup: the gather fallback has no world-space arrays,
        # so the wavefront attr kernel runs even in interpret mode.
        h = closest_hit(scene, ro, rd, eps, W=W, active=active,
                        coherent=coherent)
        return h, wavefront_fetch_attrs(scene, h)
    if not _use_pallas():
        return closest_hit(scene, ro, rd, eps, W=W, active=active,
                           coherent=coherent), None
    if scene.use_bvh:
        if scene.sl_count == 0:
            return closest_hit(scene, ro, rd, eps, W=W, active=active), None
        if _use_packet(scene, coherent):
            return _packet_hit_attrs(scene, ro, rd, eps, W=W, active=active)
        h = closest_hit(scene, ro, rd, eps, W=W, active=active,
                        coherent=coherent)
        return h, wavefront_fetch_attrs(scene, h)
    from .pallas_intersect import ATTR_DET_SIGN, dense_closest_hit_attrs_pallas

    if W is None:
        W = scene_tri_matrix(scene)
    t, u, v, det, idx, attr = dense_closest_hit_attrs_pallas(
        W, scene.wt_attr, ro, rd, eps
    )
    if active is not None:
        # Uniform semantics across backends: inactive lanes report miss
        # (and zeroed attrs, matching wavefront_fetch_attrs' cut()).
        t = jnp.where(active, t, F32_MAX)
        u = jnp.where(active, u, 0.0)
        v = jnp.where(active, v, 0.0)
        det = jnp.where(active, det, 0.0)
        idx = jnp.where(active, idx, 0)
        attr = jnp.where(active[None, :], attr, 0.0)
    backside = det > 0.0
    flip = attr[ATTR_DET_SIGN] < 0.0
    h = HitInfo(
        hit=t < F32_MAX,
        dst=t,
        u=u,
        v=v,
        tri=idx,
        backside=jnp.where(flip, ~backside, backside),
    )
    return h, attr
