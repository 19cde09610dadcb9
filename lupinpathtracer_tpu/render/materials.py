"""Material point evaluation and shading normals.

TPU-native rebuild of get_material_point (pathtracer.wgsl:1267-1342),
compute_shading_normal (:1344-1384), tangent frames (:1692-1727), vertex
attribute fallbacks (:1729-1770) and the delta/volumetric predicates
(:1418-1441).

Two data paths feed a hit's attributes:
- dense Pallas path: the intersector returns the winning triangle's packed
  attribute matrix row, transposed to (ATTR_WIDTH, B) so each attribute is
  one lane-major (B,) row slice;
- BVH path: gathers from the component-major (k, Tw) world-triangle tables.
All vectors/colors are component-wise V3 batches (core/vec3.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core.types import MaterialType, MIN_ROUGHNESS
from ..core import vec3 as v3
from ..core.vec3 import V3
from ..kernels import pallas_intersect as pk
from ..kernels.intersect import InterpAttrs
from ..kernels.texture import sample_texture, srgb_to_linear


@struct.dataclass
class MaterialPoint:
    """Evaluated material sample (pathtracer.wgsl:1247-1261), batched."""

    mat_type: jnp.ndarray  # (B,) i32
    emission: V3
    color: V3
    opacity: jnp.ndarray  # (B,)
    roughness: jnp.ndarray  # (B,)
    metallic: jnp.ndarray  # (B,)
    ior: jnp.ndarray  # (B,)
    density: V3
    scattering: V3
    sc_anisotropy: jnp.ndarray  # (B,)
    tr_depth: jnp.ndarray  # (B,)


def _interp(a0, a1, a2, u, v):
    w = 1.0 - u - v
    return a0 * w + a1 * u + a2 * v


def _a_v3(attrs, sl) -> V3:
    return V3(attrs[sl.start], attrs[sl.start + 1], attrs[sl.start + 2])


def _a_v2(attrs, sl):
    return attrs[sl.start], attrs[sl.start + 1]


def _a_v4(attrs, sl):
    return (
        V3(attrs[sl.start], attrs[sl.start + 1], attrs[sl.start + 2]),
        attrs[sl.start + 3],
    )


from ..core.tables import sel_by_id as _sel_by_id  # noqa: E402 (shared helper)


def hit_texcoords(scene, hit, attrs=None):
    """Interpolated UVs + per-lane availability flag; returns (u, v, has)."""

    B = hit.u.shape[0]
    if not scene.any_uv:
        z = jnp.zeros(B, jnp.float32)
        return z, z, jnp.zeros(B, bool)
    if isinstance(attrs, InterpAttrs):
        return attrs.tu, attrs.tv, attrs.has_uv
    if attrs is not None:
        u0, v0 = _a_v2(attrs, pk.ATTR_UV0)
        u1, v1 = _a_v2(attrs, pk.ATTR_UV1)
        u2, v2 = _a_v2(attrs, pk.ATTR_UV2)
        has = attrs[pk.ATTR_HAS_UV] > 0
    else:
        t = hit.tri
        u0, v0 = scene.wt_uv0[0][t], scene.wt_uv0[1][t]
        u1, v1 = scene.wt_uv1[0][t], scene.wt_uv1[1][t]
        u2, v2 = scene.wt_uv2[0][t], scene.wt_uv2[1][t]
        has = scene.wt_has_uv[t] > 0
    return (
        _interp(u0, u1, u2, hit.u, hit.v),
        _interp(v0, v1, v2, hit.u, hit.v),
        has,
    )


def _mat_fields(scene, hit, attrs):
    """Per-lane material row (dense: packed attrs; wavefront: mat_id
    select-chain; fallback: gathers)."""

    if isinstance(attrs, InterpAttrs):
        mid = attrs.mat_id
        M = scene.num_materials

        def s(tab):
            return _sel_by_id(tab, mid, M)

        return dict(
            base_color=V3(
                s(scene.mat_color[0]), s(scene.mat_color[1]),
                s(scene.mat_color[2]),
            ),
            base_alpha=s(scene.mat_color[3]),
            emission=V3(*(s(scene.mat_emission[c]) for c in range(3))),
            scattering=V3(*(s(scene.mat_scattering[c]) for c in range(3))),
            mtype=s(scene.mat_type),
            roughness=s(scene.mat_roughness),
            metallic=s(scene.mat_metallic),
            ior=s(scene.mat_ior),
            aniso=s(scene.mat_sc_anisotropy),
            tr_depth=s(scene.mat_tr_depth),
            tex=[s(scene.mat_tex[k]) for k in range(5)],
        )
    if attrs is not None:
        color_rgb, color_a = _a_v4(attrs, pk.ATTR_MAT_COLOR)
        return dict(
            base_color=color_rgb,
            base_alpha=color_a,
            emission=_a_v3(attrs, pk.ATTR_MAT_EMISSION),
            scattering=_a_v3(attrs, pk.ATTR_MAT_SCATTERING),
            mtype=attrs[pk.ATTR_MAT_TYPE].astype(jnp.int32),
            roughness=attrs[pk.ATTR_MAT_ROUGHNESS],
            metallic=attrs[pk.ATTR_MAT_METALLIC],
            ior=attrs[pk.ATTR_MAT_IOR],
            aniso=attrs[pk.ATTR_MAT_ANISO],
            tr_depth=attrs[pk.ATTR_MAT_TRDEPTH],
            tex=[
                attrs[pk.ATTR_MAT_TEX.start + k].astype(jnp.int32)
                for k in range(5)
            ],
        )
    mat = scene.wt_mat[hit.tri]
    return dict(
        base_color=V3(
            scene.mat_color[0][mat], scene.mat_color[1][mat], scene.mat_color[2][mat]
        ),
        base_alpha=scene.mat_color[3][mat],
        emission=v3.gather(scene.mat_emission, mat),
        scattering=v3.gather(scene.mat_scattering, mat),
        mtype=scene.mat_type[mat],
        roughness=scene.mat_roughness[mat],
        metallic=scene.mat_metallic[mat],
        ior=scene.mat_ior[mat],
        aniso=scene.mat_sc_anisotropy[mat],
        tr_depth=scene.mat_tr_depth[mat],
        tex=[scene.mat_tex[k][mat] for k in range(5)],
    )


def get_material_point(scene, hit, attrs=None) -> MaterialPoint:
    mf = _mat_fields(scene, hit, attrs)
    u, v, has_uv = hit_texcoords(scene, hit, attrs)
    B = hit.u.shape[0]
    use_tex = scene.num_textures > 0 and scene.any_uv  # static gate

    def tex_sample(slot):
        # Texture fetches only apply when the mesh has texcoords
        # (pathtracer.wgsl:1285-1311). Slots no used material binds are
        # compiled out entirely (static tex_slot_used flag).
        if not use_tex or not scene.tex_slot_used[slot]:
            ones = jnp.ones(B, jnp.float32)
            return V3(ones, ones, ones), ones
        ti = jnp.where(has_uv, mf["tex"][slot], -1)
        return sample_texture(scene, ti, u, v, packed=True)

    color_rgb, color_a = tex_sample(0)
    if use_tex:
        color_rgb = srgb_to_linear(color_rgb)
    emission_rgb, _ = tex_sample(1)
    rm_rgb, _ = tex_sample(2)
    roughness_sample = rm_rgb.y  # green channel
    metallic_sample = rm_rgb.z  # blue channel
    scattering_rgb, _ = tex_sample(3)

    if scene.any_vert_colors:
        if isinstance(attrs, InterpAttrs):
            vert_rgb = attrs.vc
            vert_a = attrs.vca
            c0 = None  # already interpolated in-kernel
        elif attrs is not None:
            c0, a0 = _a_v4(attrs, pk.ATTR_C0)
            c1, a1 = _a_v4(attrs, pk.ATTR_C1)
            c2, a2 = _a_v4(attrs, pk.ATTR_C2)
        else:
            t = hit.tri
            c0 = v3.gather(scene.wt_c0, t)
            a0 = scene.wt_c0[3][t]
            c1 = v3.gather(scene.wt_c1, t)
            a1 = scene.wt_c1[3][t]
            c2 = v3.gather(scene.wt_c2, t)
            a2 = scene.wt_c2[3][t]
        if c0 is not None:
            w = 1.0 - hit.u - hit.v
            vert_rgb = c0 * w + c1 * hit.u + c2 * hit.v
            vert_a = _interp(a0, a1, a2, hit.u, hit.v)
    else:
        vert_rgb = v3.full(B, 1.0)
        vert_a = jnp.ones(B, jnp.float32)

    mtype = mf["mtype"]
    color = color_rgb * mf["base_color"] * vert_rgb
    opacity = color_a * mf["base_alpha"] * vert_a
    emission = emission_rgb * mf["emission"]
    roughness = roughness_sample * mf["roughness"]
    roughness = roughness * roughness
    tr_depth = mf["tr_depth"]
    if scene.any_volumetric:
        is_dense_medium = (
            (mtype == MaterialType.REFRACTIVE)
            | (mtype == MaterialType.VOLUMETRIC)
            | (mtype == MaterialType.SUBSURFACE)
        )
        density = v3.where(
            is_dense_medium,
            -v3.vlog(v3.vclip(color, 1e-4, 1.0)) / tr_depth,
            v3.zeros(B),
        )
    else:
        density = v3.zeros(B)
    scattering = scattering_rgb * mf["scattering"]
    metallic = metallic_sample * mf["metallic"]

    # Roughness cleanup rules (pathtracer.wgsl:1330-1339).
    clamped = (
        (mtype == MaterialType.MATTE)
        | (mtype == MaterialType.GLTFPBR)
        | (mtype == MaterialType.GLOSSY)
    )
    roughness = jnp.where(
        clamped,
        jnp.clip(roughness, MIN_ROUGHNESS, 1.0),
        jnp.where(
            mtype == MaterialType.VOLUMETRIC,
            0.0,
            jnp.where(roughness < MIN_ROUGHNESS, 0.0, roughness),
        ),
    )

    return MaterialPoint(
        mat_type=mtype,
        emission=emission,
        color=color,
        opacity=opacity,
        roughness=roughness,
        metallic=metallic,
        ior=mf["ior"],
        density=density,
        scattering=scattering,
        sc_anisotropy=mf["aniso"],
        tr_depth=tr_depth,
    )


def get_opacity(scene, hit, attrs=None) -> jnp.ndarray:
    """Opacity of a hit only — bit-identical to
    get_material_point(...).opacity (color-texture alpha x material
    color.w x vertex alpha, pathtracer.wgsl:1285-1316) without evaluating
    the other fields. The stochastic alpha skip tests nothing else, and on
    textured scenes the full material fetch costs ~4 texture slots x 4
    corner gathers per lane PER OPACITY RE-CAST over the 3-slot batch —
    this keeps it to the one slot the test reads."""

    B = hit.u.shape[0]
    if isinstance(attrs, InterpAttrs):
        base_alpha = _sel_by_id(
            scene.mat_color[3], attrs.mat_id, scene.num_materials
        )
        tex0 = _sel_by_id(scene.mat_tex[0], attrs.mat_id, scene.num_materials)
        vert_a = attrs.vca if scene.any_vert_colors else jnp.ones(B, jnp.float32)
    elif attrs is not None:
        base_alpha = attrs[pk.ATTR_MAT_COLOR.start + 3]
        tex0 = attrs[pk.ATTR_MAT_TEX.start].astype(jnp.int32)
        if scene.any_vert_colors:
            a0 = attrs[pk.ATTR_C0.start + 3]
            a1 = attrs[pk.ATTR_C1.start + 3]
            a2 = attrs[pk.ATTR_C2.start + 3]
            vert_a = _interp(a0, a1, a2, hit.u, hit.v)
        else:
            vert_a = jnp.ones(B, jnp.float32)
    else:
        mat = scene.wt_mat[hit.tri]
        base_alpha = scene.mat_color[3][mat]
        tex0 = scene.mat_tex[0][mat]
        if scene.any_vert_colors:
            t = hit.tri
            vert_a = _interp(
                scene.wt_c0[3][t], scene.wt_c1[3][t], scene.wt_c2[3][t],
                hit.u, hit.v,
            )
        else:
            vert_a = jnp.ones(B, jnp.float32)

    use_tex = scene.num_textures > 0 and scene.any_uv
    if use_tex and scene.tex_slot_used[0]:
        u, v, has_uv = hit_texcoords(scene, hit, attrs)
        ti = jnp.where(has_uv, tex0, -1)
        _, color_a = sample_texture(scene, ti, u, v, packed=True)
    else:
        color_a = jnp.ones(B, jnp.float32)
    return color_a * base_alpha * vert_a


def get_emission(scene, hit, attrs=None) -> V3:
    """Emission of a hit only — bit-identical to
    get_material_point(...).emission (emission texture x material emission,
    pathtracer.wgsl:1290-1295) without evaluating the other fields. Used for
    MIS/NEE strategy rays, which consume nothing else."""

    mf = _mat_fields(scene, hit, attrs)
    B = hit.u.shape[0]
    use_tex = scene.num_textures > 0 and scene.any_uv
    if not use_tex or not scene.tex_slot_used[1]:
        return mf["emission"]
    u, v, has_uv = hit_texcoords(scene, hit, attrs)
    ti = jnp.where(has_uv, mf["tex"][1], -1)
    emission_rgb, _ = sample_texture(scene, ti, u, v, packed=True)
    return emission_rgb * mf["emission"]


def geometric_normal(scene, hit, attrs=None) -> V3:
    """compute_tri_geom_normal (pathtracer.wgsl:2561-2576), baked per-tri."""

    if isinstance(attrs, InterpAttrs):
        return attrs.gn
    if attrs is not None:
        return _a_v3(attrs, pk.ATTR_GN)
    return v3.gather(scene.wt_gn, hit.tri)


def compute_shading_normal(scene, hit, attrs=None) -> V3:
    """compute_shading_normal (pathtracer.wgsl:1344-1384): interpolate baked
    world-space vertex normals; optional UV-tangent-frame normal mapping."""

    if isinstance(attrs, InterpAttrs):
        n = v3.normalize(attrs.n)  # interpolated in-kernel
    else:
        if attrs is not None:
            n0 = _a_v3(attrs, pk.ATTR_N0)
            n1 = _a_v3(attrs, pk.ATTR_N1)
            n2 = _a_v3(attrs, pk.ATTR_N2)
        else:
            t = hit.tri
            n0 = v3.gather(scene.wt_n0, t)
            n1 = v3.gather(scene.wt_n1, t)
            n2 = v3.gather(scene.wt_n2, t)
        w = 1.0 - hit.u - hit.v
        n = v3.normalize(n0 * w + n1 * hit.u + n2 * hit.v)

    if scene.any_normal_maps:  # statically absent without normal maps
        u, v2_, has_uv = hit_texcoords(scene, hit, attrs)
        if isinstance(attrs, InterpAttrs):
            ntex = jnp.where(
                has_uv,
                _sel_by_id(scene.mat_tex[4], attrs.mat_id, scene.num_materials),
                -1,
            )
            tangent = attrs.tan
            bitangent = attrs.bit
        elif attrs is not None:
            ntex = jnp.where(
                has_uv, attrs[pk.ATTR_MAT_TEX.start + 4].astype(jnp.int32), -1
            )
            tangent = _a_v3(attrs, pk.ATTR_TAN)
            bitangent = _a_v3(attrs, pk.ATTR_BIT)
        else:
            t = hit.tri
            ntex = jnp.where(has_uv, scene.mat_tex[4][scene.wt_mat[t]], -1)
            tangent = v3.gather(scene.wt_tan, t)
            bitangent = v3.gather(scene.wt_bit, t)
        use_nm = ntex >= 0
        nm_rgb, _ = sample_texture(scene, ntex, u, v2_, packed=True)
        n_tex = nm_rgb * 2.0 - 1.0
        # Orthonormal frame: t' = orthonormalize(t, n), b' = normalize(n x t')
        # with bitangent-handedness flip (pathtracer.wgsl:1368-1379).
        t_o = v3.normalize(tangent - n * v3.dot(tangent, n))
        b_o = v3.normalize(v3.cross(n, t_o))
        flip = v3.dot(b_o, bitangent) < 0.0
        n_tex = v3.where(flip, -n_tex, n_tex)
        mapped = v3.normalize(t_o * n_tex.x + b_o * n_tex.y + n * n_tex.z)
        n = v3.where(use_nm, mapped, n)

    return n


def is_mat_delta(mp: MaterialPoint):
    """pathtracer.wgsl:1418-1424."""

    r0 = mp.roughness == 0.0
    t = mp.mat_type
    return (
        ((t == MaterialType.REFLECTIVE) & r0)
        | ((t == MaterialType.REFRACTIVE) & r0)
        | ((t == MaterialType.TRANSPARENT) & r0)
        | (t == MaterialType.VOLUMETRIC)
    )


def is_mat_volumetric(mp: MaterialPoint):
    """pathtracer.wgsl:1426-1431."""

    t = mp.mat_type
    return (
        (t == MaterialType.REFRACTIVE)
        | (t == MaterialType.VOLUMETRIC)
        | (t == MaterialType.SUBSURFACE)
    )
