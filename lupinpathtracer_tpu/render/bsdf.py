"""BSDF library: sample / eval / pdf triplets for all 8 material models.

TPU-native rebuild of the reference's Yocto/GL-derived shading code
(pathtracer.wgsl:1443-1555 fresnel+microfacet, :1789-1918 sampling,
:1951-2095 eval, :2097-2229 pdf, :2231-2404 delta variants, :1920-1949 +
:2406-2422 volumetrics). All vectors/colors are component-wise V3 batches
(see core/vec3.py — (B,3) arrays are a 42x bandwidth trap on TPU); the
per-material `switch` is a static select over only the material types the
scene uses. Division hazards in inactive branches are benign: results are
selected away and non-finite weights are culled by the integrators exactly
like the reference (pathtracer.wgsl:719).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.rng import PI
from ..core.types import MaterialType
from ..core import vec3 as v3
from ..core.vec3 import V3


def dot(a: V3, b: V3):
    return v3.dot(a, b)


def normalize(a: V3) -> V3:
    return v3.normalize(a)


def reflect(w: V3, n: V3) -> V3:
    """pathtracer.wgsl:2440-2443."""

    return -w + n * (2.0 * v3.dot(n, w))


def refract(w: V3, n: V3, inv_eta) -> V3:
    """pathtracer.wgsl:2445-2451; zero on total internal reflection."""

    cosine = v3.dot(n, w)
    k = 1.0 + inv_eta * inv_eta * (cosine * cosine - 1.0)
    out = -w * inv_eta + n * (inv_eta * cosine - jnp.sqrt(jnp.maximum(k, 0.0)))
    return v3.where(k < 0.0, v3.zeros(cosine.shape), out)


def same_hemisphere(normal: V3, outgoing: V3, incoming: V3):
    return v3.dot(normal, outgoing) * v3.dot(normal, incoming) >= 0.0


def basis_fromz(v: V3):
    """Pixar orthonormal basis (pathtracer.wgsl:2424-2434)."""

    z = v3.normalize(v)
    sign = jnp.where(z.z < 0.0, -1.0, 1.0)
    a = -1.0 / (sign + z.z)
    b = z.x * z.y * a
    x = V3(1.0 + sign * z.x * z.x * a, sign * b, -sign * z.x)
    y = V3(b, sign + z.y * z.y * a, -z.y)
    return x, y, z


def from_basis(x: V3, y: V3, z: V3, lx, ly, lz) -> V3:
    return x * lx + y * ly + z * lz


def flip_up(normal: V3, outgoing: V3) -> V3:
    """up_normal = dot(n, o) <= 0 ? -n : n."""

    return v3.where(v3.dot(normal, outgoing) <= 0.0, -normal, normal)


# ---------------------------------------------------------------------------
# Fresnel / microfacet (pathtracer.wgsl:1443-1555)
# ---------------------------------------------------------------------------


def reflectivity_to_eta(color: V3) -> V3:
    r = v3.vclip(color, 0.0, 0.99)
    s = v3.vsqrt(r)
    return (1.0 + s) / (1.0 - s)


def eta_to_reflectivity_s(eta):
    """Scalar eta variant (gltfpbr uses vec3f(ior))."""

    return ((eta - 1.0) * (eta - 1.0)) / ((eta + 1.0) * (eta + 1.0))


def fresnel_schlick_v(color: V3, normal: V3, out_dir: V3) -> V3:
    cosine = v3.dot(normal, out_dir)
    p = jnp.power(jnp.clip(1.0 - jnp.abs(cosine), 0.0, 1.0), 5.0)
    f = color + (1.0 - color) * p
    return v3.where(v3.all_zero(color), v3.zeros(cosine.shape), f)


def fresnel_dielectric(eta, normal: V3, outgoing: V3):
    cosw = jnp.abs(v3.dot(normal, outgoing))
    sin2 = 1.0 - cosw * cosw
    eta2 = eta * eta
    cos2t = 1.0 - sin2 / eta2
    t0 = jnp.sqrt(jnp.maximum(cos2t, 0.0))
    t1 = eta * t0
    t2 = eta * cosw
    rs = (cosw - t1) / (cosw + t1)
    rp = (t0 - t2) / (t0 + t2)
    f = (rs * rs + rp * rp) / 2.0
    return jnp.where(cos2t < 0.0, 1.0, f)  # total internal reflection


def fresnel_conductor(eta: V3, normal: V3, outgoing: V3) -> V3:
    """etak == 0 specialization (the only form the reference calls)."""

    cosw_raw = v3.dot(normal, outgoing)
    cosw = jnp.clip(cosw_raw, -1.0, 1.0)
    cos2 = cosw * cosw
    sin2 = jnp.clip(1.0 - cos2, 0.0, 1.0)

    def chan(e):
        e2 = e * e
        t0 = e2 - sin2
        a2b2 = jnp.abs(t0)  # = sqrt(t0^2): the etak==0 specialization
        t1 = a2b2 + cos2
        a = jnp.sqrt(jnp.maximum((a2b2 + t0) / 2.0, 0.0))
        t2 = 2.0 * a * cosw
        rs = (t1 - t2) / (t1 + t2)
        t3 = cos2 * a2b2 + sin2 * sin2
        t4 = t2 * sin2
        rp = rs * (t3 - t4) / (t3 + t4)
        return (rp + rs) / 2.0

    f = V3(chan(eta.x), chan(eta.y), chan(eta.z))
    return v3.where(cosw_raw <= 0.0, v3.zeros(cosw.shape), f)


def microfacet_distribution(roughness, normal: V3, halfway: V3):
    """GGX (pathtracer.wgsl:1506-1522)."""

    cosine = v3.dot(normal, halfway)
    r2 = roughness * roughness
    c2 = cosine * cosine
    denom = c2 * r2 + 1.0 - c2
    d = r2 / (PI * denom * denom)
    return jnp.where(cosine <= 0.0, 0.0, d)


def _microfacet_shadowing1(roughness, normal: V3, halfway: V3, direction: V3):
    cosine = v3.dot(normal, direction)
    cosineh = v3.dot(halfway, direction)
    r2 = roughness * roughness
    c2 = cosine * cosine
    g = 2.0 * jnp.abs(cosine) / (
        jnp.abs(cosine) + jnp.sqrt(jnp.maximum(c2 - r2 * c2 + r2, 0.0))
    )
    return jnp.where(cosine * cosineh <= 0.0, 0.0, g)


def microfacet_shadowing(roughness, normal, halfway, outgoing, incoming):
    return _microfacet_shadowing1(
        roughness, normal, halfway, outgoing
    ) * _microfacet_shadowing1(roughness, normal, halfway, incoming)


def sample_microfacet(roughness, normal: V3, rn_x, rn_y) -> V3:
    """GGX NDF sampling (pathtracer.wgsl:1878-1893)."""

    phi = 2.0 * PI * rn_x
    theta = jnp.arctan(roughness * jnp.sqrt(rn_y / jnp.maximum(1.0 - rn_y, 1e-12)))
    st = jnp.sin(theta)
    x, y, z = basis_fromz(normal)
    return v3.normalize(
        from_basis(x, y, z, jnp.cos(phi) * st, jnp.sin(phi) * st, jnp.cos(theta))
    )


def sample_microfacet_pdf(roughness, normal: V3, halfway: V3):
    cosine = v3.dot(normal, halfway)
    return jnp.where(
        cosine < 0.0, 0.0, microfacet_distribution(roughness, normal, halfway) * cosine
    )


def sample_hemisphere_cos(normal: V3, rn_x, rn_y) -> V3:
    """pathtracer.wgsl:2192-2199."""

    z = jnp.sqrt(rn_y)
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * PI * rn_x
    bx, by, bz = basis_fromz(normal)
    return v3.normalize(
        from_basis(bx, by, bz, r * jnp.cos(phi), r * jnp.sin(phi), z)
    )


def sample_hemisphere_cos_pdf(normal: V3, direction: V3):
    cosw = v3.dot(normal, direction)
    return jnp.where(cosw <= 0.0, 0.0, cosw / PI)


# ---------------------------------------------------------------------------
# Per-material sample / eval / pdf (smooth lobes)
# ---------------------------------------------------------------------------


def _sample_matte(mp, normal, outgoing, rnl, rx, ry):
    up = flip_up(normal, outgoing)
    return sample_hemisphere_cos(up, rx, ry)


def _sample_glossy(mp, normal, outgoing, rnl, rx, ry):
    up = flip_up(normal, outgoing)
    f = fresnel_dielectric(mp.ior, up, outgoing)
    halfway = sample_microfacet(mp.roughness, up, rx, ry)
    refl = reflect(outgoing, halfway)
    refl = v3.where(
        same_hemisphere(up, outgoing, refl), refl, v3.zeros(rnl.shape)
    )
    diff = sample_hemisphere_cos(up, rx, ry)
    return v3.where(rnl < f, refl, diff)


def _sample_reflective(mp, normal, outgoing, rnl, rx, ry):
    up = flip_up(normal, outgoing)
    halfway = sample_microfacet(mp.roughness, up, rx, ry)
    refl = reflect(outgoing, halfway)
    return v3.where(same_hemisphere(up, outgoing, refl), refl, v3.zeros(rnl.shape))


def _sample_transparent(mp, normal, outgoing, rnl, rx, ry):
    up = flip_up(normal, outgoing)
    halfway = sample_microfacet(mp.roughness, up, rx, ry)
    f = fresnel_dielectric(mp.ior, halfway, outgoing)
    refl = reflect(outgoing, halfway)
    refl = v3.where(same_hemisphere(up, outgoing, refl), refl, v3.zeros(rnl.shape))
    trans = -reflect(reflect(outgoing, halfway), up)
    trans = v3.where(
        same_hemisphere(up, outgoing, trans), v3.zeros(rnl.shape), trans
    )
    return v3.where(rnl < f, refl, trans)


def _sample_refractive(mp, normal, outgoing, rnl, rx, ry):
    entering = v3.dot(normal, outgoing) >= 0.0
    up = v3.where(entering, normal, -normal)
    halfway = sample_microfacet(mp.roughness, up, rx, ry)
    rel_ior = jnp.where(entering, mp.ior, 1.0 / mp.ior)
    f = fresnel_dielectric(rel_ior, halfway, outgoing)
    refl = reflect(outgoing, halfway)
    refl = v3.where(same_hemisphere(up, outgoing, refl), refl, v3.zeros(rnl.shape))
    trans = refract(outgoing, halfway, jnp.where(entering, 1.0 / mp.ior, mp.ior))
    trans = v3.where(
        same_hemisphere(up, outgoing, trans), v3.zeros(rnl.shape), trans
    )
    return v3.where(rnl < f, refl, trans)


def _gltf_reflectivity(mp) -> V3:
    r0 = eta_to_reflectivity_s(mp.ior)
    return V3(
        r0 * (1.0 - mp.metallic) + mp.color.x * mp.metallic,
        r0 * (1.0 - mp.metallic) + mp.color.y * mp.metallic,
        r0 * (1.0 - mp.metallic) + mp.color.z * mp.metallic,
    )


def _sample_gltfpbr(mp, normal, outgoing, rnl, rx, ry):
    up = flip_up(normal, outgoing)
    fs = fresnel_schlick_v(_gltf_reflectivity(mp), up, outgoing)
    f = v3.mean_comp(fs)
    halfway = sample_microfacet(mp.roughness, up, rx, ry)
    refl = reflect(outgoing, halfway)
    refl = v3.where(same_hemisphere(up, outgoing, refl), refl, v3.zeros(rnl.shape))
    diff = sample_hemisphere_cos(up, rx, ry)
    return v3.where(rnl < f, refl, diff)


_SMOOTH_SAMPLERS = {
    int(MaterialType.MATTE): _sample_matte,
    int(MaterialType.GLOSSY): _sample_glossy,
    int(MaterialType.REFLECTIVE): _sample_reflective,
    int(MaterialType.TRANSPARENT): _sample_transparent,
    int(MaterialType.REFRACTIVE): _sample_refractive,
    int(MaterialType.SUBSURFACE): _sample_refractive,
    int(MaterialType.GLTFPBR): _sample_gltfpbr,
}


def _smooth_types(types):
    if types is None:
        types = tuple(_SMOOTH_SAMPLERS.keys())
    return tuple(t for t in types if t != int(MaterialType.VOLUMETRIC))


def _dispatch_v3(table, types, mp, args):
    ts = _smooth_types(types)
    if not ts:
        return v3.zeros(mp.roughness.shape)
    out = table[ts[0]](mp, *args)
    for t in ts[1:]:
        out = v3.where(mp.mat_type == t, table[t](mp, *args), out)
    return out


def _dispatch_s(table, types, mp, args):
    ts = _smooth_types(types)
    if not ts:
        return jnp.zeros(mp.roughness.shape)
    out = table[ts[0]](mp, *args)
    for t in ts[1:]:
        out = jnp.where(mp.mat_type == t, table[t](mp, *args), out)
    return out


def sample_bsdfcos(mp, normal, outgoing, rnl, rx, ry, types=None) -> V3:
    """Dispatch (pathtracer.wgsl:2039-2056); zero for roughness==0 lanes.
    `types` (static) restricts compiled branches to the scene's materials."""

    out = _dispatch_v3(_SMOOTH_SAMPLERS, types, mp, (normal, outgoing, rnl, rx, ry))
    return v3.where(mp.roughness == 0.0, v3.zeros(rnl.shape), out)


def _eval_matte(mp, normal, outgoing, incoming):
    mask = v3.dot(normal, incoming) * v3.dot(normal, outgoing) <= 0.0
    f = mp.color * (jnp.abs(v3.dot(normal, incoming)) / PI)
    return v3.where(mask, v3.zeros(mask.shape), f)


def _eval_glossy(mp, normal, outgoing, incoming):
    mask = v3.dot(normal, incoming) * v3.dot(normal, outgoing) <= 0.0
    up = flip_up(normal, outgoing)
    f1 = fresnel_dielectric(mp.ior, up, outgoing)
    halfway = normalize(incoming + outgoing)
    f = fresnel_dielectric(mp.ior, halfway, incoming)
    d = microfacet_distribution(mp.roughness, up, halfway)
    g = microfacet_shadowing(mp.roughness, up, halfway, outgoing, incoming)
    absin = jnp.abs(v3.dot(up, incoming))
    spec = f * d * g / (4.0 * v3.dot(up, outgoing) * v3.dot(up, incoming)) * absin
    out = mp.color * ((1.0 - f1) / PI * absin) + spec
    return v3.where(mask, v3.zeros(mask.shape), out)


def _eval_reflective(mp, normal, outgoing, incoming):
    mask = v3.dot(normal, incoming) * v3.dot(normal, outgoing) <= 0.0
    up = flip_up(normal, outgoing)
    halfway = normalize(incoming + outgoing)
    f = fresnel_conductor(reflectivity_to_eta(mp.color), halfway, incoming)
    d = microfacet_distribution(mp.roughness, up, halfway)
    g = microfacet_shadowing(mp.roughness, up, halfway, outgoing, incoming)
    out = f * (
        d * g / (4.0 * v3.dot(up, outgoing) * v3.dot(up, incoming))
        * jnp.abs(v3.dot(up, incoming))
    )
    return v3.where(mask, v3.zeros(mask.shape), out)


def _eval_transparent(mp, normal, outgoing, incoming):
    up = flip_up(normal, outgoing)
    same = v3.dot(normal, incoming) * v3.dot(normal, outgoing) >= 0.0
    h_r = normalize(incoming + outgoing)
    f_r = fresnel_dielectric(mp.ior, h_r, outgoing)
    d_r = microfacet_distribution(mp.roughness, up, h_r)
    g_r = microfacet_shadowing(mp.roughness, up, h_r, outgoing, incoming)
    spec_s = (
        f_r * d_r * g_r / (4.0 * v3.dot(up, outgoing) * v3.dot(up, incoming))
        * jnp.abs(v3.dot(up, incoming))
    )
    spec = V3(spec_s, spec_s, spec_s)
    reflected = reflect(-incoming, up)
    h_t = normalize(reflected + outgoing)
    f_t = fresnel_dielectric(mp.ior, h_t, outgoing)
    d_t = microfacet_distribution(mp.roughness, up, h_t)
    g_t = microfacet_shadowing(mp.roughness, up, h_t, outgoing, reflected)
    trans = mp.color * (
        (1.0 - f_t) * d_t * g_t
        / (4.0 * v3.dot(up, outgoing) * v3.dot(up, reflected))
        * jnp.abs(v3.dot(up, reflected))
    )
    return v3.where(same, spec, trans)


def _eval_refractive(mp, normal, outgoing, incoming):
    entering = v3.dot(normal, outgoing) >= 0.0
    up = v3.where(entering, normal, -normal)
    rel_ior = jnp.where(entering, mp.ior, 1.0 / mp.ior)
    same = v3.dot(normal, incoming) * v3.dot(normal, outgoing) >= 0.0
    h_r = normalize(incoming + outgoing)
    f_r = fresnel_dielectric(rel_ior, h_r, outgoing)
    d_r = microfacet_distribution(mp.roughness, up, h_r)
    g_r = microfacet_shadowing(mp.roughness, up, h_r, outgoing, incoming)
    spec = (
        f_r * d_r * g_r
        / jnp.abs(4.0 * v3.dot(normal, outgoing) * v3.dot(normal, incoming))
        * jnp.abs(v3.dot(normal, incoming))
    )
    # transmission ([Walter 2007] eq. 21)
    sgn = jnp.where(entering, 1.0, -1.0)
    h_t = -normalize(incoming * rel_ior + outgoing) * sgn
    f_t = fresnel_dielectric(rel_ior, h_t, outgoing)
    d_t = microfacet_distribution(mp.roughness, up, h_t)
    g_t = microfacet_shadowing(mp.roughness, up, h_t, outgoing, incoming)
    denom = rel_ior * v3.dot(h_t, incoming) + v3.dot(h_t, outgoing)
    trans = (
        jnp.abs(
            v3.dot(outgoing, h_t) * v3.dot(incoming, h_t)
            / (v3.dot(outgoing, normal) * v3.dot(incoming, normal))
        )
        * (1.0 - f_t)
        * d_t
        * g_t
        / (denom * denom)
        * jnp.abs(v3.dot(normal, incoming))
    )
    out = jnp.where(same, spec, trans)
    return V3(out, out, out)


def _eval_gltfpbr(mp, normal, outgoing, incoming):
    mask = v3.dot(normal, incoming) * v3.dot(normal, outgoing) <= 0.0
    reflectivity = _gltf_reflectivity(mp)
    up = flip_up(normal, outgoing)
    f1 = fresnel_schlick_v(reflectivity, up, outgoing)
    halfway = normalize(incoming + outgoing)
    f = fresnel_schlick_v(reflectivity, halfway, incoming)
    d = microfacet_distribution(mp.roughness, up, halfway)
    g = microfacet_shadowing(mp.roughness, up, halfway, outgoing, incoming)
    absin = jnp.abs(v3.dot(up, incoming))
    diff = mp.color * (1.0 - mp.metallic) * (1.0 - f1) * (absin / PI)
    spec = f * (d * g / (4.0 * v3.dot(up, outgoing) * v3.dot(up, incoming)) * absin)
    return v3.where(mask, v3.zeros(mask.shape), diff + spec)


_SMOOTH_EVALS = {
    int(MaterialType.MATTE): _eval_matte,
    int(MaterialType.GLOSSY): _eval_glossy,
    int(MaterialType.REFLECTIVE): _eval_reflective,
    int(MaterialType.TRANSPARENT): _eval_transparent,
    int(MaterialType.REFRACTIVE): _eval_refractive,
    int(MaterialType.SUBSURFACE): _eval_refractive,
    int(MaterialType.GLTFPBR): _eval_gltfpbr,
}


def eval_bsdfcos(mp, normal, outgoing, incoming, types=None) -> V3:
    out = _dispatch_v3(_SMOOTH_EVALS, types, mp, (normal, outgoing, incoming))
    out = v3.where(mp.roughness == 0.0, v3.zeros(mp.roughness.shape), out)
    return v3.nan_to_zero(out)


def _pdf_matte(mp, normal, outgoing, incoming):
    mask = v3.dot(normal, incoming) * v3.dot(normal, outgoing) <= 0.0
    up = flip_up(normal, outgoing)
    return jnp.where(mask, 0.0, sample_hemisphere_cos_pdf(up, incoming))


def _pdf_glossy(mp, normal, outgoing, incoming):
    mask = v3.dot(normal, incoming) * v3.dot(normal, outgoing) <= 0.0
    up = flip_up(normal, outgoing)
    halfway = normalize(outgoing + incoming)
    f = fresnel_dielectric(mp.ior, up, outgoing)
    p = f * sample_microfacet_pdf(mp.roughness, up, halfway) / (
        4.0 * jnp.abs(v3.dot(outgoing, halfway))
    ) + (1.0 - f) * sample_hemisphere_cos_pdf(up, incoming)
    return jnp.where(mask, 0.0, p)


def _pdf_reflective(mp, normal, outgoing, incoming):
    mask = v3.dot(normal, incoming) * v3.dot(normal, outgoing) <= 0.0
    up = flip_up(normal, outgoing)
    halfway = normalize(outgoing + incoming)
    p = sample_microfacet_pdf(mp.roughness, up, halfway) / (
        4.0 * jnp.abs(v3.dot(outgoing, halfway))
    )
    return jnp.where(mask, 0.0, p)


def _pdf_transparent(mp, normal, outgoing, incoming):
    up = flip_up(normal, outgoing)
    same = v3.dot(normal, incoming) * v3.dot(normal, outgoing) >= 0.0
    h_r = normalize(incoming + outgoing)
    p_r = fresnel_dielectric(mp.ior, h_r, outgoing) * sample_microfacet_pdf(
        mp.roughness, up, h_r
    ) / (4.0 * jnp.abs(v3.dot(outgoing, h_r)))
    reflected = reflect(-incoming, up)
    h_t = normalize(reflected + outgoing)
    p_t = (
        (1.0 - fresnel_dielectric(mp.ior, h_t, outgoing))
        * sample_microfacet_pdf(mp.roughness, up, h_t)
        / (4.0 * jnp.abs(v3.dot(outgoing, h_t)))
    )
    return jnp.where(same, p_r, p_t)


def _pdf_refractive(mp, normal, outgoing, incoming):
    entering = v3.dot(normal, outgoing) >= 0.0
    up = v3.where(entering, normal, -normal)
    rel_ior = jnp.where(entering, mp.ior, 1.0 / mp.ior)
    same = v3.dot(normal, incoming) * v3.dot(normal, outgoing) >= 0.0
    h_r = normalize(incoming + outgoing)
    p_r = fresnel_dielectric(rel_ior, h_r, outgoing) * sample_microfacet_pdf(
        mp.roughness, up, h_r
    ) / (4.0 * jnp.abs(v3.dot(outgoing, h_r)))
    sgn = jnp.where(entering, 1.0, -1.0)
    h_t = -normalize(incoming * rel_ior + outgoing) * sgn
    denom = rel_ior * v3.dot(h_t, incoming) + v3.dot(h_t, outgoing)
    p_t = (
        (1.0 - fresnel_dielectric(rel_ior, h_t, outgoing))
        * sample_microfacet_pdf(mp.roughness, up, h_t)
        * jnp.abs(v3.dot(h_t, incoming))
        / (denom * denom)
    )
    return jnp.where(same, p_r, p_t)


def _pdf_gltfpbr(mp, normal, outgoing, incoming):
    mask = v3.dot(normal, incoming) * v3.dot(normal, outgoing) <= 0.0
    up = flip_up(normal, outgoing)
    halfway = normalize(outgoing + incoming)
    f = v3.mean_comp(fresnel_schlick_v(_gltf_reflectivity(mp), up, outgoing))
    p = f * sample_microfacet_pdf(mp.roughness, up, halfway) / (
        4.0 * jnp.abs(v3.dot(outgoing, halfway))
    ) + (1.0 - f) * sample_hemisphere_cos_pdf(up, incoming)
    return jnp.where(mask, 0.0, p)


_SMOOTH_PDFS = {
    int(MaterialType.MATTE): _pdf_matte,
    int(MaterialType.GLOSSY): _pdf_glossy,
    int(MaterialType.REFLECTIVE): _pdf_reflective,
    int(MaterialType.TRANSPARENT): _pdf_transparent,
    int(MaterialType.REFRACTIVE): _pdf_refractive,
    int(MaterialType.SUBSURFACE): _pdf_refractive,
    int(MaterialType.GLTFPBR): _pdf_gltfpbr,
}


def sample_bsdfcos_pdf(mp, normal, outgoing, incoming, types=None):
    out = _dispatch_s(_SMOOTH_PDFS, types, mp, (normal, outgoing, incoming))
    out = jnp.where(mp.roughness == 0.0, 0.0, out)
    return jnp.nan_to_num(out, nan=0.0, posinf=0.0, neginf=0.0)


# ---------------------------------------------------------------------------
# Delta lobes (pathtracer.wgsl:2231-2404)
# ---------------------------------------------------------------------------


_DELTA_TYPES = (
    int(MaterialType.REFLECTIVE),
    int(MaterialType.TRANSPARENT),
    int(MaterialType.REFRACTIVE),
    int(MaterialType.VOLUMETRIC),
)


def _delta_types(types):
    """Static restriction of the delta lobe set to the scene's materials —
    same specialization contract as _dispatch_v3 for the smooth lobes.
    (The reference's delta switch has NO subsurface case,
    pathtracer.wgsl:2231-2244 — a delta subsurface returns zero.)"""

    if types is None:
        return _DELTA_TYPES
    return tuple(t for t in _DELTA_TYPES if t in types)


def sample_delta(mp, normal, outgoing, rnl, types=None) -> V3:
    t = mp.mat_type
    ts = _delta_types(types)
    out = v3.zeros(rnl.shape)

    if int(MaterialType.REFLECTIVE) in ts or int(MaterialType.TRANSPARENT) in ts:
        up = flip_up(normal, outgoing)
        refl = reflect(outgoing, up)
        if int(MaterialType.REFLECTIVE) in ts:
            out = v3.where(t == MaterialType.REFLECTIVE, refl, out)
        if int(MaterialType.TRANSPARENT) in ts:
            f_tr = fresnel_dielectric(mp.ior, up, outgoing)
            trans = v3.where(rnl < f_tr, refl, -outgoing)
            out = v3.where(t == MaterialType.TRANSPARENT, trans, out)

    if int(MaterialType.REFRACTIVE) in ts:
        entering = v3.dot(normal, outgoing) >= 0.0
        up_r = v3.where(entering, normal, -normal)
        rel_ior = jnp.where(entering, mp.ior, 1.0 / mp.ior)
        f_re = fresnel_dielectric(rel_ior, up_r, outgoing)
        refr = v3.where(
            rnl < f_re,
            reflect(outgoing, up_r),
            refract(outgoing, up_r, 1.0 / rel_ior),
        )
        refr = v3.where(jnp.abs(mp.ior - 1.0) < 1e-3, -outgoing, refr)
        out = v3.where(t == MaterialType.REFRACTIVE, refr, out)

    if int(MaterialType.VOLUMETRIC) in ts:
        out = v3.where(t == MaterialType.VOLUMETRIC, -outgoing, out)
    return v3.where(mp.roughness != 0.0, v3.zeros(rnl.shape), out)


def eval_delta(mp, normal, outgoing, incoming, types=None) -> V3:
    t = mp.mat_type
    ts = _delta_types(types)
    prod = v3.dot(normal, incoming) * v3.dot(normal, outgoing)
    same_side = prod >= 0.0
    opp = prod <= 0.0
    out = v3.zeros(prod.shape)

    if int(MaterialType.REFLECTIVE) in ts or int(MaterialType.TRANSPARENT) in ts:
        up = flip_up(normal, outgoing)
        if int(MaterialType.REFLECTIVE) in ts:
            refl = fresnel_conductor(reflectivity_to_eta(mp.color), up, outgoing)
            refl = v3.where(opp, v3.zeros(prod.shape), refl)
            out = v3.where(t == MaterialType.REFLECTIVE, refl, out)
        if int(MaterialType.TRANSPARENT) in ts:
            f_tr = fresnel_dielectric(mp.ior, up, outgoing)
            trans = v3.where(
                same_side, V3(f_tr, f_tr, f_tr), mp.color * (1.0 - f_tr)
            )
            out = v3.where(t == MaterialType.TRANSPARENT, trans, out)

    if int(MaterialType.REFRACTIVE) in ts:
        entering = v3.dot(normal, outgoing) >= 0.0
        up_r = v3.where(entering, normal, -normal)
        rel_ior = jnp.where(entering, mp.ior, 1.0 / mp.ior)
        f_re = fresnel_dielectric(rel_ior, up_r, outgoing)
        refr_s = jnp.where(
            same_side, f_re, (1.0 / (rel_ior * rel_ior)) * (1.0 - f_re)
        )
        refr_s = jnp.where(
            jnp.abs(mp.ior - 1.0) < 1e-3, jnp.where(opp, 1.0, 0.0), refr_s
        )
        out = v3.where(
            t == MaterialType.REFRACTIVE, V3(refr_s, refr_s, refr_s), out
        )

    if int(MaterialType.VOLUMETRIC) in ts:
        pass_s = jnp.where(same_side, 0.0, 1.0)
        out = v3.where(
            t == MaterialType.VOLUMETRIC, V3(pass_s, pass_s, pass_s), out
        )
    return v3.where(mp.roughness != 0.0, v3.zeros(prod.shape), out)


def sample_delta_pdf(mp, normal, outgoing, incoming, types=None):
    t = mp.mat_type
    ts = _delta_types(types)
    prod = v3.dot(normal, incoming) * v3.dot(normal, outgoing)
    same_side = prod >= 0.0
    out = jnp.zeros(prod.shape)

    if int(MaterialType.REFLECTIVE) in ts:
        refl = jnp.where(prod <= 0.0, 0.0, 1.0)
        out = jnp.where(t == MaterialType.REFLECTIVE, refl, out)

    if int(MaterialType.TRANSPARENT) in ts:
        up = flip_up(normal, outgoing)
        f_tr = fresnel_dielectric(mp.ior, up, outgoing)
        trans = jnp.where(same_side, f_tr, 1.0 - f_tr)
        out = jnp.where(t == MaterialType.TRANSPARENT, trans, out)

    if int(MaterialType.REFRACTIVE) in ts:
        entering = v3.dot(normal, outgoing) >= 0.0
        up_r = v3.where(entering, normal, -normal)
        rel_ior = jnp.where(entering, mp.ior, 1.0 / mp.ior)
        f_re = fresnel_dielectric(rel_ior, up_r, outgoing)
        refr = jnp.where(same_side, f_re, 1.0 - f_re)
        refr = jnp.where(
            jnp.abs(mp.ior - 1.0) < 1e-3, jnp.where(prod < 0.0, 1.0, 0.0), refr
        )
        out = jnp.where(t == MaterialType.REFRACTIVE, refr, out)

    if int(MaterialType.VOLUMETRIC) in ts:
        passthrough = jnp.where(same_side, 0.0, 1.0)
        out = jnp.where(t == MaterialType.VOLUMETRIC, passthrough, out)
    return jnp.where(mp.roughness != 0.0, 0.0, out)


# ---------------------------------------------------------------------------
# Volumetric transmittance + Henyey-Greenstein phase
# ---------------------------------------------------------------------------


def sample_transmittance(density: V3, max_distance, rl, rd):
    """Channel-stratified exponential distance sampling
    (pathtracer.wgsl:1895-1901)."""

    channel = jnp.clip((rl * 3.0).astype(jnp.int32), 0, 2)
    dch = jnp.where(
        channel == 0, density.x, jnp.where(channel == 1, density.y, density.z)
    )
    distance = jnp.where(
        dch == 0.0, jnp.float32(3.4e38), -jnp.log(1.0 - rd) / jnp.maximum(dch, 1e-30)
    )
    return jnp.minimum(distance, max_distance)


def eval_transmittance(density: V3, distance) -> V3:
    return v3.vexp(-density * distance)


def sample_transmittance_pdf(density: V3, distance, max_distance):
    """pathtracer.wgsl:2406-2413."""

    inside = v3.sum_comp(density * v3.vexp(-density * distance)) / 3.0
    surface = v3.sum_comp(v3.vexp(-density * max_distance)) / 3.0
    return jnp.where(distance < max_distance, inside, surface)


def _hg_cos_theta(aniso, rn_y):
    iso = 1.0 - 2.0 * rn_y
    sq = (1.0 - aniso * aniso) / (1.0 + aniso - 2.0 * aniso * rn_y)
    aniso_ct = (1.0 + aniso * aniso - sq * sq) / (
        2.0 * jnp.where(aniso == 0, 1.0, aniso)
    )
    return jnp.where(jnp.abs(aniso) < 1e-3, iso, aniso_ct)


def sample_scattering(vol_density: V3, vol_aniso, outgoing, rx, ry):
    """HG phase sampling (pathtracer.wgsl:1903-1918); zero when density==0.
    (The scattering albedo does not affect the sampled direction — it is
    not a parameter here, matching sample_scattering_pdf.)"""

    cos_theta = _hg_cos_theta(vol_aniso, ry)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * PI * rx
    bx, by, bz = basis_fromz(-outgoing)
    out = from_basis(
        bx, by, bz, sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta
    )
    return v3.where(v3.all_zero(vol_density), v3.zeros(rx.shape), out)


def _hg_phase(aniso, cosine):
    denom = 1.0 + aniso * aniso - 2.0 * aniso * cosine
    return (1.0 - aniso * aniso) / (
        4.0 * PI * denom * jnp.sqrt(jnp.maximum(denom, 1e-20))
    )


def eval_scattering(vol_density, vol_scattering, vol_aniso, outgoing, incoming) -> V3:
    cosine = -v3.dot(outgoing, incoming)
    phase = _hg_phase(vol_aniso, cosine)
    out = vol_scattering * vol_density * phase
    return v3.where(v3.all_zero(vol_density), v3.zeros(cosine.shape), out)


def sample_scattering_pdf(vol_density, vol_aniso, outgoing, incoming):
    cosine = -v3.dot(outgoing, incoming)
    return jnp.where(v3.all_zero(vol_density), 0.0, _hg_phase(vol_aniso, cosine))


def mis_heuristic(this_pdf, other_pdf):
    """Power-2 heuristic (pathtracer.wgsl:935-938)."""

    return (this_pdf * this_pdf) / (this_pdf * this_pdf + other_pdf * other_pdf)
