"""Light sampling: emissive mesh lights + environment maps.

TPU-native rebuild of pathtracer.wgsl's light layer: sample_lights
(:2468-2514), sample_lights_pdf (:2516-2549), alias-table sampling
(:2610-2638), the lat-long environment mapping (:2579-2608) and environment
evaluation (:1386-1410). The geometric mesh-light pdf replaces the
reference's sequential multi-hit march (compute_instance_lights_pdf,
bvh_custom.wgsl:112-152) with one dense MXU pass over ALL light triangles:
every valid intersection contributes dist^2/(cos * area) — the exact sum the
march approximates (the march skips hits closer than 1 unit apart,
bvh_custom.wgsl:145; the dense sum has no such gap).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import rng as rng_mod
from ..core.rng import PI
from ..kernels import intersect
from ..kernels.texture import sample_texture
from .bsdf import dot, normalize


def _alias_pick(offset, size, prob_arr, thresh_arr, alias_arr, r_bin, r_thresh):
    """Batched alias-table sample: bin index within [0, size) then threshold
    test (pathtracer.wgsl:2610-2638)."""

    size_f = size.astype(jnp.float32)
    idx = jnp.minimum((r_bin * size_f).astype(jnp.int32), size - 1)
    gi = offset + idx
    take_alias = r_thresh >= thresh_arr[gi]
    return jnp.where(take_alias, alias_arr[gi], idx)


def env_dir_to_uv(scene, e: int, d):
    """dir_to_env_uv (pathtracer.wgsl:2579-2588): inverse-rotate then
    lat-long; u wrapped into [0,1)."""

    rot = scene.env_rot[e]  # (3,3) column basis
    td = normalize(d @ rot)  # M^T * d per lane
    u = jnp.arctan2(td[..., 2], td[..., 0]) / (2.0 * PI)
    v = jnp.arccos(jnp.clip(td[..., 1], -1.0, 1.0)) / PI
    u = jnp.where(u < 0.0, u + 1.0, u)
    u = jnp.where(u > 1.0, u - 1.0, u)
    return u, v


def env_uv_to_dir(scene, e: int, u, v):
    """env_uv_to_dir (pathtracer.wgsl:2598-2605)."""

    local = jnp.stack(
        [
            jnp.cos(u * 2.0 * PI) * jnp.sin(v * PI),
            jnp.cos(v * PI),
            jnp.sin(u * 2.0 * PI) * jnp.sin(v * PI),
        ],
        axis=-1,
    )
    rot = scene.env_rot[e]
    return normalize(local @ rot.T)


def sample_environment(scene, e: int, d):
    """One environment's emission along d (pathtracer.wgsl:1400-1410)."""

    em = scene.env_emission[e]
    ti = scene.env_tex[e]
    u, v = env_dir_to_uv(scene, e, d)
    tex = sample_texture(scene, jnp.broadcast_to(ti, u.shape), u, v)[..., :3]
    return em * tex


def sample_environments(scene, d):
    """Sum over all environments (pathtracer.wgsl:1386-1397)."""

    if scene.envs_empty:
        return jnp.zeros_like(d)
    out = jnp.zeros_like(d)
    for e in range(scene.num_envs):
        out = out + sample_environment(scene, e, d)
    return out


def sample_lights(scene, pos, outgoing, state):
    """Uniformly pick among mesh lights + envs, then sample a direction
    (pathtracer.wgsl:2468-2514). Consumes a fixed number of uniforms per
    lane (each lane is an independent PCG stream, so per-branch draw counts
    need not match the reference's serial stream)."""

    B = pos.shape[0]
    num_lights = 0 if scene.lights_empty else scene.num_lights
    num_envs = 0 if scene.envs_empty else scene.num_envs
    total = num_lights + num_envs
    if total == 0:
        return state, jnp.zeros_like(pos)

    state, pick = rng_mod.next_u32_range(state, total)
    pick = pick.astype(jnp.int32)
    state, r_bin = rng_mod.next_f32(state)
    state, r_thr = rng_mod.next_f32(state)
    state, ra, rb = rng_mod.next_vec2(state)

    out = jnp.zeros_like(pos)

    if num_lights > 0:
        li = jnp.clip(pick, 0, num_lights - 1)
        off = scene.light_alias_offset[li]
        size = scene.light_alias_size[li]
        tri = _alias_pick(
            off, size, scene.la_prob, scene.la_thresh, scene.la_alias, r_bin, r_thr
        )
        # Uniform triangle uv (pathtracer.wgsl:1672-1676) reusing (ra, rb).
        s = jnp.sqrt(ra)
        tu = 1.0 - s
        tv = rb * s
        gt = scene.light_tri_offset[li] + tri
        p = (
            scene.lt_v0[gt]
            + scene.lt_e1[gt] * tu[:, None]
            + scene.lt_e2[gt] * tv[:, None]
        )
        mesh_dir = normalize(p - pos)
        out = jnp.where((pick < num_lights)[:, None], mesh_dir, out)

    for e in range(num_envs):
        sel = pick == num_lights + e
        w = scene.tex_width[jnp.maximum(scene.env_tex[e], 0)]
        h = scene.tex_height[jnp.maximum(scene.env_tex[e], 0)]
        off = scene.env_alias_offset[e]
        size = w * h
        pix = _alias_pick(
            jnp.broadcast_to(off, (B,)),
            jnp.broadcast_to(size, (B,)),
            scene.ea_prob,
            scene.ea_thresh,
            scene.ea_alias,
            r_bin,
            r_thr,
        )
        cu = ((pix % w).astype(jnp.float32) + 0.5) / w.astype(jnp.float32)
        cv = ((pix // w).astype(jnp.float32) + 0.5) / h.astype(jnp.float32)
        tex_dir = env_uv_to_dir(scene, e, cu, cv)
        # Textureless env: uniform sphere (pathtracer.wgsl:2500-2503).
        z = 2.0 * rb - 1.0
        r = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
        phi = 2.0 * PI * ra
        sphere_dir = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
        env_dir = jnp.where(
            jnp.broadcast_to(scene.env_tex[e] >= 0, sel.shape)[:, None],
            tex_dir,
            sphere_dir,
        )
        out = jnp.where(sel[:, None], env_dir, out)

    return state, out


def compute_instance_lights_pdf(scene, pos, incoming, eps, Wl=None):
    """Geometric pdf over all mesh lights: dense all-hits sum
    (replaces bvh_custom.wgsl:112-152's per-light closest-hit march)."""

    if scene.lights_empty:
        return jnp.zeros(pos.shape[0], jnp.float32)
    if Wl is None:
        Wl = light_tri_matrix(scene)
    R = intersect.ray_features(pos, incoming)
    t, _, _, _ = intersect.dense_tuv(R, Wl, eps)
    valid = t < intersect.F32_MAX
    n = jnp.cross(scene.lt_e1, scene.lt_e2)  # (Tl,3); geom normal direction
    n_hat = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    cos_theta = jnp.abs(incoming @ n_hat.T)  # (B,Tl)
    area = scene.light_area[scene.lt_light]  # (Tl,)
    contrib = jnp.where(
        valid, (t * t) / jnp.maximum(cos_theta * area[None, :], 1e-20), 0.0
    )
    return jnp.sum(contrib, axis=-1)


def light_tri_matrix(scene):
    return intersect.build_tri_matrix(scene.lt_v0, scene.lt_e1, scene.lt_e2)


def sample_lights_pdf(scene, pos, incoming, eps, Wl=None):
    """pathtracer.wgsl:2516-2549."""

    num_lights = 0 if scene.lights_empty else scene.num_lights
    num_envs = 0 if scene.envs_empty else scene.num_envs
    total = num_lights + num_envs
    if total == 0:
        return jnp.zeros(pos.shape[0], jnp.float32)

    pdf = compute_instance_lights_pdf(scene, pos, incoming, eps, Wl)

    for e in range(num_envs):
        ti = scene.env_tex[e]
        w = scene.tex_width[jnp.maximum(ti, 0)]
        h = scene.tex_height[jnp.maximum(ti, 0)]
        u, v = env_dir_to_uv(scene, e, incoming)
        px = jnp.clip((u * w.astype(jnp.float32)).astype(jnp.int32), 0, w - 1)
        py = jnp.clip((v * h.astype(jnp.float32)).astype(jnp.int32), 0, h - 1)
        prob = scene.ea_prob[scene.env_alias_offset[e] + py * w + px]
        wf = w.astype(jnp.float32)
        hf = h.astype(jnp.float32)
        solid_angle = (
            (2.0 * PI / wf)
            * (PI / hf)
            * jnp.sin(PI * (py.astype(jnp.float32) + 0.5) / hf)
        )
        env_pdf = prob / jnp.maximum(solid_angle, 1e-20)
        sphere_pdf = jnp.full_like(env_pdf, 1.0 / (4.0 * PI))
        pdf = pdf + jnp.where(ti >= 0, env_pdf, sphere_pdf)

    return pdf / float(total)
