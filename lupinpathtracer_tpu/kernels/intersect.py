"""Ray-scene intersection kernels (pure-JAX reference implementations).

TPU-native rebuild of the reference's traversal layer
(bvh_custom.wgsl:7-300 + pathtracer.wgsl:2906-2961). Two backends, mirroring
the reference's SW/HW pipeline pair (renderer.rs:472-475) but selected by
scene size instead of driver features:

1. ``closest_hit_dense`` — the MXU path. Cramer's-rule ray/triangle
   intersection factors into a single matmul: each ray becomes the
   10-feature row R = [d, o x d, o, 1] and each triangle contributes four
   10-vectors whose dot products with R are exactly the determinant and the
   t/u/v numerators of pathtracer.wgsl:2922-2943 (ray_tri_dst). One
   (B,10)@(10,4T) contraction at float32 precision evaluates every
   ray-triangle pair on the systolic array; a cheap VPU epilogue + min
   reduction picks the closest valid hit. This is the fastest possible
   formulation for small-to-medium scenes and has zero divergence.

2. ``closest_hit_bvh`` — the world-BVH path for large scenes. The
   reference's per-thread TLAS->BLAS stacks (bvh_custom.wgsl:11-110,
   195-288) become one batched masked stack walk over the single
   world-space BVH: every lane pops its node, leaf lanes run a fixed-size
   triangle block test, internal lanes do the ordered near-first push with
   `dst < best_t` pruning — the same traversal order, expressed as
   vectorized lane math with one-hot stack updates.

A Pallas fused version of (1) lives in kernels/pallas_intersect.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

F32_MAX = jnp.float32(3.4028235e38)


@struct.dataclass
class HitInfo:
    """Batched hit record (pathtracer.wgsl:2953-2961). ``tri`` indexes the
    world-triangle soup (BVH order); instance/mesh ids come from
    scene.wt_inst / scene.wt_tri gathers."""

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


# ---------------------------------------------------------------------------
# Dense MXU intersector
# ---------------------------------------------------------------------------


def build_tri_matrix(v0: jnp.ndarray, e1: jnp.ndarray, e2: jnp.ndarray):
    """Per-triangle coefficient matrix W with shape (10, 4, T).

    Row layout of the ray feature vector R = [d, o x d, o, 1]:
      det = R . [n, 0, 0, 0]                    n = e1 x e2
      nu  = R . [e2 x v0, -e2, 0, 0]            (u numerator)
      nv  = R . [-(e1 x v0), e1, 0, 0]          (v numerator)
      nt  = R . [0, 0, -n, n.v0]                (t numerator)
    so that t = nt/det, u = nu/det, v = nv/det — identical algebra to
    ray_tri_dst (pathtracer.wgsl:2922-2943), hoisted per-triangle.
    """

    n = jnp.cross(e1, e2)
    c_e2v0 = jnp.cross(e2, v0)
    c_e1v0 = jnp.cross(e1, v0)
    ndotv0 = jnp.sum(n * v0, axis=-1)
    T = v0.shape[0]
    zeros3 = jnp.zeros((T, 3), v0.dtype)
    zeros1 = jnp.zeros((T,), v0.dtype)
    ones0 = ndotv0
    w_det = jnp.concatenate([n, zeros3, zeros3, zeros1[:, None]], axis=-1)
    w_nu = jnp.concatenate([c_e2v0, -e2, zeros3, zeros1[:, None]], axis=-1)
    w_nv = jnp.concatenate([-c_e1v0, e1, zeros3, zeros1[:, None]], axis=-1)
    w_nt = jnp.concatenate([zeros3, zeros3, -n, ones0[:, None]], axis=-1)
    # (T, 4, 10) -> (10, 4, T)
    w = jnp.stack([w_det, w_nu, w_nv, w_nt], axis=1)
    return jnp.transpose(w, (2, 1, 0))


def ray_features(ro: jnp.ndarray, rd: jnp.ndarray) -> jnp.ndarray:
    """R = [d, o x d, o, 1] with shape (B, 10)."""

    return jnp.concatenate(
        [rd, jnp.cross(ro, rd), ro, jnp.ones_like(ro[..., :1])], axis=-1
    )


def dense_pairs(R: jnp.ndarray, W: jnp.ndarray):
    """All-pairs numerators: (B,10)@(10,4T) -> det/nu/nv/nt each (B, T)."""

    T = W.shape[2]
    M = jnp.dot(
        R,
        W.reshape(10, 4 * T),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).reshape(-1, 4, T)
    return M[:, 0], M[:, 1], M[:, 2], M[:, 3]


def dense_tuv(R: jnp.ndarray, W: jnp.ndarray, eps):
    """t/u/v/det with invalid pairs at t = +inf (NaN-safe: padded degenerate
    triangles produce det = 0 -> NaN numerators -> all compares false)."""

    det, nu, nv, nt = dense_pairs(R, W)
    d = 1.0 / det
    t = nt * d
    u = nu * d
    v = nv * d
    valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= eps)
    return jnp.where(valid, t, F32_MAX), u, v, det


def closest_hit_dense(
    W: jnp.ndarray, ro: jnp.ndarray, rd: jnp.ndarray, eps, chunk: int | None = None
) -> HitInfo:
    """Closest hit over a dense triangle set. Rays are processed in chunks
    sized to bound the (chunk, 4T) intermediate."""

    B = ro.shape[0]
    T = W.shape[2]
    if chunk is None:
        chunk = max(512, min(B, (1 << 23) // max(4 * T, 1)))
    pad = (-B) % chunk
    ro_p = jnp.pad(ro, ((0, pad), (0, 0)))
    rd_p = jnp.pad(rd, ((0, pad), (0, 0)))
    Rf = ray_features(ro_p, rd_p).reshape(-1, chunk, 10)

    def one_chunk(R):
        t, u, v, det = dense_tuv(R, W, eps)
        best = jnp.argmin(t, axis=1)
        bi = jnp.arange(R.shape[0])
        bt = t[bi, best]
        return bt, u[bi, best], v[bi, best], det[bi, best], best.astype(jnp.int32)

    bt, bu, bv, bdet, btri = jax.lax.map(one_chunk, Rf)
    bt = bt.reshape(-1)[:B]
    bu = bu.reshape(-1)[:B]
    bv = bv.reshape(-1)[:B]
    bdet = bdet.reshape(-1)[:B]
    btri = btri.reshape(-1)[:B]
    hit = bt < F32_MAX
    return HitInfo(hit=hit, dst=bt, u=bu, v=bv, tri=btri, backside=bdet > 0.0)


# ---------------------------------------------------------------------------
# Batched masked-stack BVH traversal
# ---------------------------------------------------------------------------


def _ray_aabb_dst(ro, inv_d, lo, hi):
    """Slab test (pathtracer.wgsl:2906-2918); returns F32_MAX on miss."""

    t_min = (lo - ro) * inv_d
    t_max = (hi - ro) * inv_d
    t1 = jnp.minimum(t_min, t_max)
    t2 = jnp.maximum(t_min, t_max)
    dst_far = jnp.min(t2, axis=-1)
    dst_near = jnp.max(t1, axis=-1)
    did_hit = (dst_far >= dst_near) & (dst_far > 0.0)
    return jnp.where(did_hit, dst_near, F32_MAX)


def _ray_tri(ro, rd, v0, e1, e2, eps):
    """Per-lane ray_tri_dst (pathtracer.wgsl:2922-2943)."""

    n = jnp.cross(e1, e2)
    rov0 = ro - v0
    q = jnp.cross(rov0, rd)
    det = jnp.sum(rd * n, axis=-1)
    d = 1.0 / det
    u = d * jnp.sum(-q * e2, axis=-1)
    v = d * jnp.sum(q * e1, axis=-1)
    t = d * jnp.sum(-n * rov0, axis=-1)
    valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= eps)
    return jnp.where(valid, t, F32_MAX), u, v, det


def closest_hit_bvh(
    scene, ro: jnp.ndarray, rd: jnp.ndarray, eps, with_counts: bool = False
):
    """Masked wavefront traversal of the world BVH. Every live lane advances
    one node per iteration; the loop runs until every lane's stack is empty.
    Near-child-first ordered push with best-t pruning matches
    bvh_custom.wgsl:246-284."""

    B = ro.shape[0]
    S = scene.bvh_depth + 2
    K = scene.bvh_leaf_size
    inv_d = 1.0 / rd
    lanes = jnp.arange(S, dtype=jnp.int32)[None, :]

    def set_stack(stack, sp, val, push):
        return jnp.where(
            (lanes == sp[:, None]) & push[:, None], val[:, None], stack
        )

    init = dict(
        stack=jnp.zeros((B, S), jnp.int32),
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
        node = jnp.take_along_axis(c["stack"], sp[:, None], axis=1)[:, 0]
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
            tv0 = scene.wt_v0[ti]
            te1 = scene.wt_e1[ti]
            te2 = scene.wt_e2[ti]
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
        tl = _ray_aabb_dst(ro, inv_d, scene.bvh_min[lc], scene.bvh_max[lc])
        tr = _ray_aabb_dst(ro, inv_d, scene.bvh_min[rc], scene.bvh_max[rc])
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

        # Debug counters (RAY_DEBUG_INFO, pathtracer.wgsl:2945-2951;
        # increments at bvh_custom.wgsl:53-55, 227-229, 242-244).
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


def count_traversal(scene, ro, rd, eps):
    """Per-ray tri/AABB check counts for one closest-hit query (the debug
    heatmap's data source). Dense mode tests every triangle by design."""

    B = ro.shape[0]
    if scene.instances_empty:
        z = jnp.zeros(B, jnp.int32)
        return z, z
    if scene.use_bvh:
        _, (n_tri, n_aabb) = closest_hit_bvh(scene, ro, rd, eps, with_counts=True)
        return n_tri, n_aabb
    n_tri = jnp.full(B, scene.num_world_tris, jnp.int32)
    return n_tri, jnp.zeros(B, jnp.int32)


# ---------------------------------------------------------------------------
# Unified entry point
# ---------------------------------------------------------------------------


def _use_pallas() -> bool:
    """Pallas path on TPU; the chunked jnp formulation on CPU (interpret-mode
    Pallas is an order of magnitude slower there and tests run on CPU)."""

    import jax

    return jax.default_backend() == "tpu"


def scene_tri_matrix(scene) -> jnp.ndarray:
    """Dense coefficient matrix over the (padded) world triangle soup, in the
    (4, 10, T) layout the Pallas kernel consumes."""

    # Only real triangles; the Pallas wrapper re-pads to its block size
    # (the scene's extra leaf-gather slack would double the block count).
    n = scene.num_world_tris
    w = build_tri_matrix(
        scene.wt_v0[:n], scene.wt_e1[:n], scene.wt_e2[:n]
    )  # (10,4,T)
    return jnp.transpose(w, (1, 0, 2))


def closest_hit(scene, ro, rd, eps, W: jnp.ndarray | None = None) -> HitInfo:
    """ray_scene_intersection equivalent (bvh_custom.wgsl:7-110): dispatches
    to the MXU-dense or BVH backend (static choice baked at flatten time) and
    fixes up hit_backside to the reference's object-space determinant sign."""

    if scene.instances_empty:
        return miss(ro.shape[:-1])
    if scene.use_bvh:
        h = closest_hit_bvh(scene, ro, rd, eps)
    else:
        if W is None:
            W = scene_tri_matrix(scene)
        if _use_pallas():
            from .pallas_intersect import dense_closest_hit_pallas

            t, u, v, det, idx = dense_closest_hit_pallas(W, ro, rd, eps)
            h = HitInfo(
                hit=t < F32_MAX, dst=t, u=u, v=v, tri=idx, backside=det > 0.0
            )
        else:
            h = closest_hit_dense(
                jnp.transpose(W, (1, 0, 2)), ro, rd, eps
            )
    flip = scene.inst_det_sign[scene.wt_inst[h.tri]] < 0.0
    return h.replace(backside=jnp.where(flip, ~h.backside, h.backside))


def closest_hit_attrs(scene, ro, rd, eps, W: jnp.ndarray | None = None):
    """Dense-mode closest hit returning (HitInfo, packed attrs (B, AW)).

    The attrs row is fetched in-kernel (one-hot MXU select), eliminating all
    per-hit shading gathers. Falls back to (closest_hit, None) when the
    scene traverses the BVH (attrs come from gathers there)."""

    if scene.instances_empty or scene.use_bvh or not _use_pallas():
        return closest_hit(scene, ro, rd, eps, W=W), None
    from .pallas_intersect import (
        ATTR_DET_SIGN,
        dense_closest_hit_attrs_pallas,
    )

    if W is None:
        W = scene_tri_matrix(scene)
    t, u, v, det, idx, attr = dense_closest_hit_attrs_pallas(
        W, scene.wt_attr, ro, rd, eps
    )
    backside = det > 0.0
    flip = attr[:, ATTR_DET_SIGN] < 0.0
    h = HitInfo(
        hit=t < F32_MAX,
        dst=t,
        u=u,
        v=v,
        tri=idx,
        backside=jnp.where(flip, ~backside, backside),
    )
    return h, attr
