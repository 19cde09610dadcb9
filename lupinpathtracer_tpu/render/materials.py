"""Material point evaluation and shading normals.

TPU-native rebuild of get_material_point (pathtracer.wgsl:1267-1342),
compute_shading_normal (:1344-1384), tangent frames (:1692-1727), vertex
attribute fallbacks (:1729-1770) and the delta/volumetric predicates
(:1418-1441).

The reference chases index->vertex->instance->matrix chains per hit; here
every per-triangle quantity (world-space vertex normals, geometric normal,
UVs, vertex colors, tangent frame, material id) is baked into the
world-triangle soup at flatten time, so a hit shades with one gather per
attribute. Pre-transforming vertex normals by the inverse-transpose is
exact because barycentric interpolation commutes with the linear map.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core.types import MaterialType, MIN_ROUGHNESS
from ..kernels.texture import sample_texture, srgb_to_linear


@struct.dataclass
class MaterialPoint:
    """Evaluated material sample (pathtracer.wgsl:1247-1261), batched."""

    mat_type: jnp.ndarray  # (B,) i32
    emission: jnp.ndarray  # (B,3)
    color: jnp.ndarray  # (B,3)
    opacity: jnp.ndarray  # (B,)
    roughness: jnp.ndarray  # (B,)
    metallic: jnp.ndarray  # (B,)
    ior: jnp.ndarray  # (B,)
    density: jnp.ndarray  # (B,3)
    scattering: jnp.ndarray  # (B,3)
    sc_anisotropy: jnp.ndarray  # (B,)
    tr_depth: jnp.ndarray  # (B,)


def _interp2(a0, a1, a2, u, v):
    w = 1.0 - u - v
    return a0 * w[:, None] + a1 * u[:, None] + a2 * v[:, None]


def _normalize(v, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def hit_texcoords(scene, hit, attrs=None):
    """Interpolated UVs + per-lane availability flag."""

    B = hit.u.shape[0]
    if not scene.any_uv:
        return jnp.zeros((B, 2), jnp.float32), jnp.zeros(B, bool)
    if attrs is not None:
        from ..kernels import pallas_intersect as pk

        uv = _interp2(
            attrs[:, pk.ATTR_UV0],
            attrs[:, pk.ATTR_UV1],
            attrs[:, pk.ATTR_UV2],
            hit.u,
            hit.v,
        )
        return uv, attrs[:, pk.ATTR_HAS_UV] > 0
    t = hit.tri
    uv = _interp2(scene.wt_uv0[t], scene.wt_uv1[t], scene.wt_uv2[t], hit.u, hit.v)
    return uv, scene.wt_has_uv[t] > 0


def _mat_fields(scene, hit, attrs):
    """Per-lane material row: from the packed attrs when available (dense
    Pallas path), else via gathers (BVH path)."""

    if attrs is not None:
        from ..kernels import pallas_intersect as pk

        return dict(
            base_color=attrs[:, pk.ATTR_MAT_COLOR],
            emission=attrs[:, pk.ATTR_MAT_EMISSION],
            scattering=attrs[:, pk.ATTR_MAT_SCATTERING],
            mtype=attrs[:, pk.ATTR_MAT_TYPE].astype(jnp.int32),
            roughness=attrs[:, pk.ATTR_MAT_ROUGHNESS],
            metallic=attrs[:, pk.ATTR_MAT_METALLIC],
            ior=attrs[:, pk.ATTR_MAT_IOR],
            aniso=attrs[:, pk.ATTR_MAT_ANISO],
            tr_depth=attrs[:, pk.ATTR_MAT_TRDEPTH],
            tex=attrs[:, pk.ATTR_MAT_TEX].astype(jnp.int32),
        )
    mat = scene.wt_mat[hit.tri]
    return dict(
        base_color=scene.mat_color[mat],
        emission=scene.mat_emission[mat],
        scattering=scene.mat_scattering[mat],
        mtype=scene.mat_type[mat],
        roughness=scene.mat_roughness[mat],
        metallic=scene.mat_metallic[mat],
        ior=scene.mat_ior[mat],
        aniso=scene.mat_sc_anisotropy[mat],
        tr_depth=scene.mat_tr_depth[mat],
        tex=scene.mat_tex[mat],
    )


def get_material_point(scene, hit, attrs=None) -> MaterialPoint:
    mf = _mat_fields(scene, hit, attrs)
    uv, has_uv = hit_texcoords(scene, hit, attrs)

    u, v = uv[:, 0], uv[:, 1]
    use_tex = scene.num_textures > 0 and scene.any_uv  # static gate

    def tex_sample(slot):
        # Texture fetches only apply when the mesh has texcoords
        # (pathtracer.wgsl:1285-1311).
        if not use_tex:
            return jnp.ones((u.shape[0], 4), jnp.float32)
        ti = jnp.where(has_uv, mf["tex"][:, slot], -1)
        return sample_texture(scene, ti, u, v)

    color_sample = tex_sample(0)
    if use_tex:
        color_sample = jnp.concatenate(
            [srgb_to_linear(color_sample[:, :3]), color_sample[:, 3:4]], axis=-1
        )
    emission_sample = tex_sample(1)[:, :3]
    rm_sample = tex_sample(2)
    roughness_sample = rm_sample[:, 1]  # green channel
    metallic_sample = rm_sample[:, 2]  # blue channel
    scattering_sample = tex_sample(3)[:, :3]

    if scene.any_vert_colors:
        if attrs is not None:
            from ..kernels import pallas_intersect as pk

            vert_color = _interp2(
                attrs[:, pk.ATTR_C0],
                attrs[:, pk.ATTR_C1],
                attrs[:, pk.ATTR_C2],
                hit.u,
                hit.v,
            )
        else:
            t = hit.tri
            vert_color = _interp2(
                scene.wt_c0[t], scene.wt_c1[t], scene.wt_c2[t], hit.u, hit.v
            )
    else:
        vert_color = jnp.ones((u.shape[0], 4), jnp.float32)

    base_color = mf["base_color"]
    mtype = mf["mtype"]
    color = color_sample[:, :3] * base_color[:, :3] * vert_color[:, :3]
    opacity = color_sample[:, 3] * base_color[:, 3] * vert_color[:, 3]
    emission = emission_sample * mf["emission"]
    roughness = roughness_sample * mf["roughness"]
    roughness = roughness * roughness
    tr_depth = mf["tr_depth"]
    if scene.any_volumetric:
        is_dense_medium = (
            (mtype == MaterialType.REFRACTIVE)
            | (mtype == MaterialType.VOLUMETRIC)
            | (mtype == MaterialType.SUBSURFACE)
        )
        density = jnp.where(
            is_dense_medium[:, None],
            -jnp.log(jnp.clip(color, 1e-4, 1.0)) / tr_depth[:, None],
            0.0,
        )
    else:
        density = jnp.zeros_like(color)
    scattering = scattering_sample * mf["scattering"]
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


def geometric_normal(scene, hit):
    """compute_tri_geom_normal (pathtracer.wgsl:2561-2576), baked per-tri."""

    return scene.wt_gn[hit.tri]


def compute_shading_normal(scene, hit, attrs=None):
    """compute_shading_normal (pathtracer.wgsl:1344-1384): interpolate baked
    world-space vertex normals; optional UV-tangent-frame normal mapping."""

    if attrs is not None:
        from ..kernels import pallas_intersect as pk

        n = _normalize(
            _interp2(
                attrs[:, pk.ATTR_N0],
                attrs[:, pk.ATTR_N1],
                attrs[:, pk.ATTR_N2],
                hit.u,
                hit.v,
            )
        )
    else:
        t = hit.tri
        n = _normalize(
            _interp2(scene.wt_n0[t], scene.wt_n1[t], scene.wt_n2[t], hit.u, hit.v)
        )

    if scene.any_normal_maps:  # statically absent without normal maps
        from ..kernels import pallas_intersect as pk

        uv, has_uv = hit_texcoords(scene, hit, attrs)
        if attrs is not None:
            ntex = jnp.where(
                has_uv, attrs[:, pk.ATTR_MAT_TEX][:, 4].astype(jnp.int32), -1
            )
            tangent = attrs[:, pk.ATTR_TAN]
            bitangent = attrs[:, pk.ATTR_BIT]
        else:
            t = hit.tri
            ntex = jnp.where(has_uv, scene.mat_tex[scene.wt_mat[t]][:, 4], -1)
            tangent = scene.wt_tan[t]
            bitangent = scene.wt_bit[t]
        use_nm = ntex >= 0
        nm_sample = sample_texture(scene, ntex, uv[:, 0], uv[:, 1])[:, :3]
        n_tex = -1.0 + 2.0 * nm_sample
        # Orthonormal frame: t' = orthonormalize(t, n), b' = normalize(n x t')
        # with bitangent-handedness flip (pathtracer.wgsl:1368-1379).
        t_o = _normalize(tangent - n * jnp.sum(tangent * n, -1, keepdims=True))
        b_o = _normalize(jnp.cross(n, t_o))
        flip = jnp.sum(b_o * bitangent, -1) < 0.0
        n_tex = jnp.where(flip[:, None], -n_tex, n_tex)
        mapped = _normalize(
            t_o * n_tex[:, 0:1] + b_o * n_tex[:, 1:2] + n * n_tex[:, 2:3]
        )
        n = jnp.where(use_nm[:, None], mapped, n)

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
