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

All direction/position batches are component-wise V3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng as rng_mod
from ..core import vec3 as v3
from ..core.rng import PI
from ..core.tables import sel_by_id
from ..core.vec3 import V3
from ..kernels import intersect
from ..kernels.texture import sample_texture

# Light-triangle count at or below which the geometric light pdf uses
# unrolled per-tri lane math instead of the dense matrix. integrators'
# make_ctx builds (or skips) the light-tri matrix by the SAME constant —
# the two decisions must agree or the matrix is built-and-dropped /
# rebuilt per call.
SMALL_LIGHT_TRIS = 32


def _alias_pick(offset, size, thresh_arr, alias_arr, r_bin, r_thresh):
    """Batched alias-table sample: bin index within [0, size) then threshold
    test (pathtracer.wgsl:2610-2638). Small concatenated tables (mesh
    lights) resolve by select-chain instead of lane gathers."""

    size_f = size.astype(jnp.float32)
    idx = jnp.minimum((r_bin * size_f).astype(jnp.int32), size - 1)
    gi = offset + idx
    take_alias = r_thresh >= sel_by_id(thresh_arr, gi)
    return jnp.where(take_alias, sel_by_id(alias_arr, gi), idx)


def env_dir_to_uv(scene, e: int, d: V3):
    """dir_to_env_uv (pathtracer.wgsl:2579-2588): inverse-rotate then
    lat-long; u wrapped into [0,1)."""

    rot = scene.env_rot[e]  # (3,3) column basis; inverse = dot with columns
    tx = rot[0, 0] * d.x + rot[1, 0] * d.y + rot[2, 0] * d.z
    ty = rot[0, 1] * d.x + rot[1, 1] * d.y + rot[2, 1] * d.z
    tz = rot[0, 2] * d.x + rot[1, 2] * d.y + rot[2, 2] * d.z
    td = v3.normalize(V3(tx, ty, tz))
    u = jnp.arctan2(td.z, td.x) / (2.0 * PI)
    v = jnp.arccos(jnp.clip(td.y, -1.0, 1.0)) / PI
    u = jnp.where(u < 0.0, u + 1.0, u)
    u = jnp.where(u > 1.0, u - 1.0, u)
    return u, v


def env_uv_to_dir(scene, e: int, u, v) -> V3:
    """env_uv_to_dir (pathtracer.wgsl:2598-2605)."""

    lx = jnp.cos(u * 2.0 * PI) * jnp.sin(v * PI)
    ly = jnp.cos(v * PI)
    lz = jnp.sin(u * 2.0 * PI) * jnp.sin(v * PI)
    rot = scene.env_rot[e]
    return v3.normalize(
        V3(
            rot[0, 0] * lx + rot[0, 1] * ly + rot[0, 2] * lz,
            rot[1, 0] * lx + rot[1, 1] * ly + rot[1, 2] * lz,
            rot[2, 0] * lx + rot[2, 1] * ly + rot[2, 2] * lz,
        )
    )


def sample_environment(scene, e: int, d: V3) -> V3:
    """One environment's emission along d (pathtracer.wgsl:1400-1410)."""

    em = scene.env_emission[e]
    ti = scene.env_tex[e]
    u, v = env_dir_to_uv(scene, e, d)
    rgb, _ = sample_texture(scene, jnp.broadcast_to(ti, u.shape), u, v)
    return rgb * V3(em[0], em[1], em[2])


def sample_environments(scene, d: V3) -> V3:
    """Sum over all environments (pathtracer.wgsl:1386-1397)."""

    out = v3.zeros(d.x.shape)
    if scene.envs_empty:
        return out
    for e in range(scene.num_envs):
        out = out + sample_environment(scene, e, d)
    return out


def sample_lights(scene, pos: V3, outgoing: V3, state):
    """Uniformly pick among mesh lights + envs, then sample a direction
    (pathtracer.wgsl:2468-2514). Consumes a fixed number of uniforms per
    lane (each lane is an independent PCG stream, so per-branch draw counts
    need not match the reference's serial stream)."""

    B = pos.x.shape[0]
    num_lights = 0 if scene.lights_empty else scene.num_lights
    num_envs = 0 if scene.envs_empty else scene.num_envs
    total = num_lights + num_envs
    if total == 0:
        return state, v3.zeros(B)

    state, pick = rng_mod.next_u32_range(state, total)
    pick = pick.astype(jnp.int32)
    state, r_bin = rng_mod.next_f32(state)
    state, r_thr = rng_mod.next_f32(state)
    state, ra, rb = rng_mod.next_vec2(state)

    out = v3.zeros(B)

    if num_lights > 0:
        li = jnp.clip(pick, 0, num_lights - 1)
        off = sel_by_id(scene.light_alias_offset, li)
        size = sel_by_id(scene.light_alias_size, li)
        tri = _alias_pick(off, size, scene.la_thresh, scene.la_alias, r_bin, r_thr)
        # Uniform triangle uv (pathtracer.wgsl:1672-1676) reusing (ra, rb).
        s = jnp.sqrt(ra)
        tu = 1.0 - s
        tv = rb * s
        gt = sel_by_id(scene.light_tri_offset, li) + tri

        def fetch(tab3):
            return V3(*(sel_by_id(tab3[c], gt) for c in range(3)))

        p = (
            fetch(scene.lt_v0)
            + fetch(scene.lt_e1) * tu
            + fetch(scene.lt_e2) * tv
        )
        mesh_dir = v3.normalize(p - pos)
        out = v3.where(pick < num_lights, mesh_dir, out)

    for e in range(num_envs):
        sel = pick == num_lights + e
        # Textureless env (STATIC gate): uniform sphere
        # (pathtracer.wgsl:2500-2503). Its alias segment has ONE entry —
        # picking into it with another texture's dimensions read out of
        # segment (correct only via XLA's OOB clamping) and burned a full
        # alias pick per lane for a value the select always discarded.
        if not scene.env_has_tex[e]:
            z = 2.0 * rb - 1.0
            r = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
            phi = 2.0 * PI * ra
            sphere_dir = V3(r * jnp.cos(phi), r * jnp.sin(phi), z)
            out = v3.where(sel, sphere_dir, out)
            continue
        w = scene.tex_width[jnp.maximum(scene.env_tex[e], 0)]
        h = scene.tex_height[jnp.maximum(scene.env_tex[e], 0)]
        off = scene.env_alias_offset[e]
        size = w * h
        pix = _alias_pick(
            jnp.broadcast_to(off, (B,)),
            jnp.broadcast_to(size, (B,)),
            scene.ea_thresh,
            scene.ea_alias,
            r_bin,
            r_thr,
        )
        cu = ((pix % w).astype(jnp.float32) + 0.5) / w.astype(jnp.float32)
        cv = ((pix // w).astype(jnp.float32) + 0.5) / h.astype(jnp.float32)
        tex_dir = env_uv_to_dir(scene, e, cu, cv)
        out = v3.where(sel, tex_dir, out)

    return state, out


def light_tri_matrix(scene):
    return intersect.build_tri_matrix(scene.lt_v0, scene.lt_e1, scene.lt_e2)


def compute_instance_lights_pdf(scene, pos: V3, incoming: V3, eps, Wl=None):
    """Geometric pdf over all mesh lights: dense all-hits sum
    (replaces bvh_custom.wgsl:112-152's per-light closest-hit march)."""

    B = pos.x.shape[0]
    if scene.lights_empty:
        return jnp.zeros(B, jnp.float32)

    Tl = scene.lt_v0.shape[1]
    if Tl <= SMALL_LIGHT_TRIS:
        # Few light triangles (the common case): unrolled per-tri lane math
        # avoids (B, Tl) minor-dim-padded intermediates entirely.
        pdf = jnp.zeros(B, jnp.float32)
        for i in range(Tl):
            tv0 = V3(scene.lt_v0[0, i], scene.lt_v0[1, i], scene.lt_v0[2, i])
            te1 = V3(scene.lt_e1[0, i], scene.lt_e1[1, i], scene.lt_e1[2, i])
            te2 = V3(scene.lt_e2[0, i], scene.lt_e2[1, i], scene.lt_e2[2, i])
            t, _, _, _ = intersect._ray_tri(pos, incoming, tv0, te1, te2, eps)
            valid = t < intersect.F32_MAX
            n = v3.cross(te1, te2)
            n_hat = v3.normalize(n)
            cos_theta = jnp.abs(v3.dot(incoming, n_hat))
            area = scene.light_area[scene.lt_light[i]]
            pdf = pdf + jnp.where(
                valid, (t * t) / jnp.maximum(cos_theta * area, 1e-20), 0.0
            )
        return pdf

    if Wl is None:
        Wl = light_tri_matrix(scene)
    R = intersect.ray_features(pos, incoming)
    # Per-tri geometric normal direction n = cross(e1, e2); abs makes the
    # reference's opposite orientation irrelevant (bvh_custom.wgsl:142).
    e1 = v3.from_t3(scene.lt_e1)
    e2 = v3.from_t3(scene.lt_e2)
    n = v3.cross(e1, e2)
    n_hat = v3.normalize(n)
    nT = jnp.stack([n_hat.x, n_hat.y, n_hat.z], axis=0)  # (3, Tl)
    area = scene.light_area[scene.lt_light]  # (Tl,)

    def block(Wb, nb, ab):
        t, _, _, _ = intersect.dense_tuv(R, Wb, eps)
        valid = t < intersect.F32_MAX
        cos_theta = jnp.abs(
            incoming.x[:, None] * nb[0][None, :]
            + incoming.y[:, None] * nb[1][None, :]
            + incoming.z[:, None] * nb[2][None, :]
        )
        contrib = jnp.where(
            valid, (t * t) / jnp.maximum(cos_theta * ab[None, :], 1e-20), 0.0
        )
        return jnp.sum(contrib, axis=-1)

    # Bound the all-pairs intermediate IN BOTH DIMENSIONS: large emissive
    # meshes (the reference handles any size via its per-light march,
    # bvh_custom.wgsl:112-152) stream through fixed triangle chunks under
    # lax.scan, and large RAY batches stream through fixed ray chunks
    # under lax.map — exact sum, O(RCH x CH) memory. (The r4 form chunked
    # only triangles: its (B, 4, CH) block was a 34 GB allocation at
    # 960x540 rays x 4096-tri chunks — out_hw/terrain_render.log OOM.)
    CH = 512
    RCH = 16384  # (RCH, 4, CH) f32 = 134 MB per step
    Tl = Wl.shape[2]
    if Tl <= CH and B <= RCH:
        return block(Wl, nT, area)
    tpad = (-Tl) % CH
    if tpad:
        # Padded triangles are degenerate (zero coefficient rows -> det=0,
        # never valid); pad areas with 1 to keep the division benign.
        Wl = jnp.pad(Wl, ((0, 0), (0, 0), (0, tpad)))
        nT = jnp.pad(nT, ((0, 0), (0, tpad)))
        area = jnp.pad(area, (0, tpad), constant_values=1.0)
    nch = (Tl + tpad) // CH
    Wc = jnp.moveaxis(Wl.reshape(4, 10, nch, CH), 2, 0)
    nc = jnp.moveaxis(nT.reshape(3, nch, CH), 1, 0)
    ac = area.reshape(nch, CH)

    rch = min(RCH, B)
    rpad = (-B) % rch
    nrc = (B + rpad) // rch

    def padr(x):
        return jnp.pad(x, (0, rpad)) if rpad else x

    rays = (
        padr(pos.x).reshape(nrc, rch), padr(pos.y).reshape(nrc, rch),
        padr(pos.z).reshape(nrc, rch),
        padr(incoming.x).reshape(nrc, rch), padr(incoming.y).reshape(nrc, rch),
        padr(incoming.z).reshape(nrc, rch),
    )

    def ray_chunk(rc):
        px, py, pz, ix, iy, iz = rc
        Rc = intersect.ray_features(V3(px, py, pz), V3(ix, iy, iz))

        def block_c(Wb, nb, ab):
            t, _, _, _ = intersect.dense_tuv(Rc, Wb, eps)
            valid = t < intersect.F32_MAX
            cos_theta = jnp.abs(
                ix[:, None] * nb[0][None, :]
                + iy[:, None] * nb[1][None, :]
                + iz[:, None] * nb[2][None, :]
            )
            contrib = jnp.where(
                valid, (t * t) / jnp.maximum(cos_theta * ab[None, :], 1e-20),
                0.0,
            )
            return jnp.sum(contrib, axis=-1)

        def scan_body(acc, xs):
            Wb, nb, ab = xs
            return acc + block_c(Wb, nb, ab), None

        out, _ = jax.lax.scan(
            scan_body, jnp.zeros(rch, jnp.float32), (Wc, nc, ac)
        )
        return out

    out = jax.lax.map(ray_chunk, rays)
    return out.reshape(-1)[:B]


def sample_lights_pdf(scene, pos: V3, incoming: V3, eps, Wl=None):
    """pathtracer.wgsl:2516-2549."""

    B = pos.x.shape[0]
    num_lights = 0 if scene.lights_empty else scene.num_lights
    num_envs = 0 if scene.envs_empty else scene.num_envs
    total = num_lights + num_envs
    if total == 0:
        return jnp.zeros(B, jnp.float32)

    pdf = compute_instance_lights_pdf(scene, pos, incoming, eps, Wl)

    for e in range(num_envs):
        # Textureless env (STATIC gate): uniform-sphere pdf — the dynamic
        # select previously read ea_prob out of the env's 1-entry segment.
        if not scene.env_has_tex[e]:
            pdf = pdf + 1.0 / (4.0 * PI)
            continue
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
        pdf = pdf + prob / jnp.maximum(solid_angle, 1e-20)

    return pdf / float(total)
