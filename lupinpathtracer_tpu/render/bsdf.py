"""BSDF library: sample / eval / pdf triplets for all 8 material models.

TPU-native rebuild of the reference's Yocto/GL-derived shading code
(pathtracer.wgsl:1443-1555 fresnel+microfacet, :1789-1918 sampling,
:1951-2095 eval, :2097-2229 pdf, :2231-2404 delta variants, :1920-1949 +
:2406-2422 volumetrics). Everything is masked lane math over (B,) / (B,3)
arrays; the per-material `switch` becomes a select over material type —
all branches evaluate (they are cheap VPU arithmetic; traversal dominates)
and `jnp.where` picks the active one. Division hazards in inactive branches
are benign: results are selected away and non-finite weights are culled by
the integrators exactly like the reference (pathtracer.wgsl:719).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.rng import PI
from ..core.types import MaterialType


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def dotk(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def normalize(v, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def reflect(w, n):
    """pathtracer.wgsl:2440-2443."""

    return -w + 2.0 * dotk(n, w) * n


def refract(w, n, inv_eta):
    """pathtracer.wgsl:2445-2451; zero on total internal reflection."""

    cosine = dot(n, w)
    k = 1.0 + inv_eta * inv_eta * (cosine * cosine - 1.0)
    out = -w * inv_eta[..., None] + (inv_eta * cosine - jnp.sqrt(jnp.maximum(k, 0.0)))[
        ..., None
    ] * n
    return jnp.where((k < 0.0)[..., None], 0.0, out)


def same_hemisphere(normal, outgoing, incoming):
    return dot(normal, outgoing) * dot(normal, incoming) >= 0.0


def basis_fromz(v):
    """Pixar orthonormal basis (pathtracer.wgsl:2424-2434); returns (x, y, z)
    column vectors."""

    z = normalize(v)
    sign = jnp.where(z[..., 2] < 0.0, -1.0, 1.0)
    a = -1.0 / (sign + z[..., 2])
    b = z[..., 0] * z[..., 1] * a
    x = jnp.stack(
        [1.0 + sign * z[..., 0] * z[..., 0] * a, sign * b, -sign * z[..., 0]], axis=-1
    )
    y = jnp.stack([b, sign + z[..., 1] * z[..., 1] * a, -z[..., 1]], axis=-1)
    return x, y, z


def _from_basis(x, y, z, local):
    return (
        x * local[..., 0:1] + y * local[..., 1:2] + z * local[..., 2:3]
    )


def flip_up(normal, outgoing):
    """up_normal = dot(n, o) <= 0 ? -n : n."""

    return jnp.where(dotk(normal, outgoing) <= 0.0, -normal, normal)


# ---------------------------------------------------------------------------
# Fresnel / microfacet (pathtracer.wgsl:1443-1555)
# ---------------------------------------------------------------------------


def reflectivity_to_eta(color):
    r = jnp.clip(color, 0.0, 0.99)
    s = jnp.sqrt(r)
    return (1.0 + s) / (1.0 - s)


def eta_to_reflectivity(eta):
    return ((eta - 1.0) * (eta - 1.0)) / ((eta + 1.0) * (eta + 1.0))


def fresnel_schlick_v(color, normal, out_dir):
    cosine = dot(normal, out_dir)
    f = color + (1.0 - color) * jnp.power(
        jnp.clip(1.0 - jnp.abs(cosine), 0.0, 1.0), 5.0
    )[..., None]
    return jnp.where(jnp.all(color == 0.0, axis=-1, keepdims=True), 0.0, f)


def fresnel_dielectric(eta, normal, outgoing):
    cosw = jnp.abs(dot(normal, outgoing))
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


def fresnel_conductor(eta, etak, normal, outgoing):
    cosw_raw = dot(normal, outgoing)
    cosw = jnp.clip(cosw_raw, -1.0, 1.0)
    cos2 = cosw * cosw
    sin2 = jnp.clip(1.0 - cos2, 0.0, 1.0)[..., None]
    cos2 = cos2[..., None]
    cosw_k = cosw[..., None]
    eta2 = eta * eta
    etak2 = etak * etak
    t0 = eta2 - etak2 - sin2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * etak2, 0.0))
    t1 = a2b2 + cos2
    a = jnp.sqrt(jnp.maximum((a2b2 + t0) / 2.0, 0.0))
    t2 = 2.0 * a * cosw_k
    rs = (t1 - t2) / (t1 + t2)
    t3 = cos2 * a2b2 + sin2 * sin2
    t4 = t2 * sin2
    rp = rs * (t3 - t4) / (t3 + t4)
    f = (rp + rs) / 2.0
    return jnp.where((cosw_raw <= 0.0)[..., None], 0.0, f)


def microfacet_distribution(roughness, normal, halfway):
    """GGX (pathtracer.wgsl:1506-1522)."""

    cosine = dot(normal, halfway)
    r2 = roughness * roughness
    c2 = cosine * cosine
    denom = c2 * r2 + 1.0 - c2
    d = r2 / (PI * denom * denom)
    return jnp.where(cosine <= 0.0, 0.0, d)


def _microfacet_shadowing1(roughness, normal, halfway, direction):
    cosine = dot(normal, direction)
    cosineh = dot(halfway, direction)
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


def sample_microfacet(roughness, normal, rn_x, rn_y):
    """GGX NDF sampling (pathtracer.wgsl:1878-1893)."""

    phi = 2.0 * PI * rn_x
    theta = jnp.arctan(roughness * jnp.sqrt(rn_y / jnp.maximum(1.0 - rn_y, 1e-12)))
    st = jnp.sin(theta)
    local = jnp.stack([jnp.cos(phi) * st, jnp.sin(phi) * st, jnp.cos(theta)], axis=-1)
    x, y, z = basis_fromz(normal)
    return normalize(_from_basis(x, y, z, local))


def sample_microfacet_pdf(roughness, normal, halfway):
    cosine = dot(normal, halfway)
    return jnp.where(
        cosine < 0.0, 0.0, microfacet_distribution(roughness, normal, halfway) * cosine
    )


def sample_hemisphere_cos(normal, rn_x, rn_y):
    """pathtracer.wgsl:2192-2199."""

    z = jnp.sqrt(rn_y)
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * PI * rn_x
    local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    x, y, zb = basis_fromz(normal)
    return normalize(_from_basis(x, y, zb, local))


def sample_hemisphere_cos_pdf(normal, direction):
    cosw = dot(normal, direction)
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
    refl = jnp.where(
        same_hemisphere(up, outgoing, refl)[..., None], refl, 0.0
    )
    diff = sample_hemisphere_cos(up, rx, ry)
    return jnp.where((rnl < f)[..., None], refl, diff)


def _sample_reflective(mp, normal, outgoing, rnl, rx, ry):
    up = flip_up(normal, outgoing)
    halfway = sample_microfacet(mp.roughness, up, rx, ry)
    refl = reflect(outgoing, halfway)
    return jnp.where(same_hemisphere(up, outgoing, refl)[..., None], refl, 0.0)


def _sample_transparent(mp, normal, outgoing, rnl, rx, ry):
    up = flip_up(normal, outgoing)
    halfway = sample_microfacet(mp.roughness, up, rx, ry)
    f = fresnel_dielectric(mp.ior, halfway, outgoing)
    refl = reflect(outgoing, halfway)
    refl = jnp.where(same_hemisphere(up, outgoing, refl)[..., None], refl, 0.0)
    trans = -reflect(reflect(outgoing, halfway), up)
    trans = jnp.where(same_hemisphere(up, outgoing, trans)[..., None], 0.0, trans)
    return jnp.where((rnl < f)[..., None], refl, trans)


def _sample_refractive(mp, normal, outgoing, rnl, rx, ry):
    entering = dot(normal, outgoing) >= 0.0
    up = jnp.where(entering[..., None], normal, -normal)
    halfway = sample_microfacet(mp.roughness, up, rx, ry)
    rel_ior = jnp.where(entering, mp.ior, 1.0 / mp.ior)
    f = fresnel_dielectric(rel_ior, halfway, outgoing)
    refl = reflect(outgoing, halfway)
    refl = jnp.where(same_hemisphere(up, outgoing, refl)[..., None], refl, 0.0)
    trans = refract(outgoing, halfway, jnp.where(entering, 1.0 / mp.ior, mp.ior))
    trans = jnp.where(same_hemisphere(up, outgoing, trans)[..., None], 0.0, trans)
    return jnp.where((rnl < f)[..., None], refl, trans)


def _sample_gltfpbr(mp, normal, outgoing, rnl, rx, ry):
    up = flip_up(normal, outgoing)
    reflectivity = (
        eta_to_reflectivity(mp.ior)[..., None] * (1.0 - mp.metallic[..., None])
        + mp.color * mp.metallic[..., None]
    )
    fs = fresnel_schlick_v(reflectivity, up, outgoing)
    f = jnp.mean(fs, axis=-1)
    halfway = sample_microfacet(mp.roughness, up, rx, ry)
    refl = reflect(outgoing, halfway)
    refl = jnp.where(same_hemisphere(up, outgoing, refl)[..., None], refl, 0.0)
    diff = sample_hemisphere_cos(up, rx, ry)
    return jnp.where((rnl < f)[..., None], refl, diff)


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


def sample_bsdfcos(mp, normal, outgoing, rnl, rx, ry, types=None):
    """Dispatch (pathtracer.wgsl:2039-2056); zero for roughness==0 lanes.
    `types` (static) restricts compiled branches to material models present
    in the scene — the XLA analog of shader specialization."""

    ts = _smooth_types(types)
    if not ts:
        return jnp.zeros_like(outgoing)
    out = _SMOOTH_SAMPLERS[ts[0]](mp, normal, outgoing, rnl, rx, ry)
    for t in ts[1:]:
        out = jnp.where(
            (mp.mat_type == t)[..., None],
            _SMOOTH_SAMPLERS[t](mp, normal, outgoing, rnl, rx, ry),
            out,
        )
    if len(ts) > 1:
        out = jnp.where((mp.mat_type == ts[0])[..., None],
                        _SMOOTH_SAMPLERS[ts[0]](mp, normal, outgoing, rnl, rx, ry),
                        out)
    return jnp.where((mp.roughness == 0.0)[..., None], 0.0, out)


def _eval_matte(mp, normal, outgoing, incoming):
    mask = dot(normal, incoming) * dot(normal, outgoing) <= 0.0
    f = mp.color / PI * jnp.abs(dot(normal, incoming))[..., None]
    return jnp.where(mask[..., None], 0.0, f)


def _eval_glossy(mp, normal, outgoing, incoming):
    mask = dot(normal, incoming) * dot(normal, outgoing) <= 0.0
    up = flip_up(normal, outgoing)
    f1 = fresnel_dielectric(mp.ior, up, outgoing)
    halfway = normalize(incoming + outgoing)
    f = fresnel_dielectric(mp.ior, halfway, incoming)
    d = microfacet_distribution(mp.roughness, up, halfway)
    g = microfacet_shadowing(mp.roughness, up, halfway, outgoing, incoming)
    absin = jnp.abs(dot(up, incoming))
    spec = f * d * g / (4.0 * dot(up, outgoing) * dot(up, incoming)) * absin
    out = mp.color * ((1.0 - f1) / PI * absin)[..., None] + spec[..., None]
    return jnp.where(mask[..., None], 0.0, out)


def _eval_reflective(mp, normal, outgoing, incoming):
    mask = dot(normal, incoming) * dot(normal, outgoing) <= 0.0
    up = flip_up(normal, outgoing)
    halfway = normalize(incoming + outgoing)
    f = fresnel_conductor(
        reflectivity_to_eta(mp.color), jnp.zeros_like(mp.color), halfway, incoming
    )
    d = microfacet_distribution(mp.roughness, up, halfway)
    g = microfacet_shadowing(mp.roughness, up, halfway, outgoing, incoming)
    out = f * (
        d * g / (4.0 * dot(up, outgoing) * dot(up, incoming))
        * jnp.abs(dot(up, incoming))
    )[..., None]
    return jnp.where(mask[..., None], 0.0, out)


def _eval_transparent(mp, normal, outgoing, incoming):
    up = flip_up(normal, outgoing)
    same = dot(normal, incoming) * dot(normal, outgoing) >= 0.0
    # reflection side
    h_r = normalize(incoming + outgoing)
    f_r = fresnel_dielectric(mp.ior, h_r, outgoing)
    d_r = microfacet_distribution(mp.roughness, up, h_r)
    g_r = microfacet_shadowing(mp.roughness, up, h_r, outgoing, incoming)
    spec = (
        f_r * d_r * g_r / (4.0 * dot(up, outgoing) * dot(up, incoming))
        * jnp.abs(dot(up, incoming))
    )[..., None] * jnp.ones_like(mp.color)
    # transmission side
    reflected = reflect(-incoming, up)
    h_t = normalize(reflected + outgoing)
    f_t = fresnel_dielectric(mp.ior, h_t, outgoing)
    d_t = microfacet_distribution(mp.roughness, up, h_t)
    g_t = microfacet_shadowing(mp.roughness, up, h_t, outgoing, reflected)
    trans = mp.color * (
        (1.0 - f_t) * d_t * g_t / (4.0 * dot(up, outgoing) * dot(up, reflected))
        * jnp.abs(dot(up, reflected))
    )[..., None]
    return jnp.where(same[..., None], spec, trans)


def _eval_refractive(mp, normal, outgoing, incoming):
    entering = dot(normal, outgoing) >= 0.0
    up = jnp.where(entering[..., None], normal, -normal)
    rel_ior = jnp.where(entering, mp.ior, 1.0 / mp.ior)
    same = dot(normal, incoming) * dot(normal, outgoing) >= 0.0
    # reflection
    h_r = normalize(incoming + outgoing)
    f_r = fresnel_dielectric(rel_ior, h_r, outgoing)
    d_r = microfacet_distribution(mp.roughness, up, h_r)
    g_r = microfacet_shadowing(mp.roughness, up, h_r, outgoing, incoming)
    spec = (
        f_r * d_r * g_r
        / jnp.abs(4.0 * dot(normal, outgoing) * dot(normal, incoming))
        * jnp.abs(dot(normal, incoming))
    )
    # transmission ([Walter 2007] eq. 21)
    h_t = -normalize(rel_ior[..., None] * incoming + outgoing) * jnp.where(
        entering, 1.0, -1.0
    )[..., None]
    f_t = fresnel_dielectric(rel_ior, h_t, outgoing)
    d_t = microfacet_distribution(mp.roughness, up, h_t)
    g_t = microfacet_shadowing(mp.roughness, up, h_t, outgoing, incoming)
    denom = rel_ior * dot(h_t, incoming) + dot(h_t, outgoing)
    trans = (
        jnp.abs(
            dot(outgoing, h_t) * dot(incoming, h_t)
            / (dot(outgoing, normal) * dot(incoming, normal))
        )
        * (1.0 - f_t)
        * d_t
        * g_t
        / (denom * denom)
        * jnp.abs(dot(normal, incoming))
    )
    out = jnp.where(same, spec, trans)
    return out[..., None] * jnp.ones_like(mp.color)


def _eval_gltfpbr(mp, normal, outgoing, incoming):
    mask = dot(normal, incoming) * dot(normal, outgoing) <= 0.0
    reflectivity = (
        eta_to_reflectivity(mp.ior)[..., None] * (1.0 - mp.metallic[..., None])
        + mp.color * mp.metallic[..., None]
    )
    up = flip_up(normal, outgoing)
    f1 = fresnel_schlick_v(reflectivity, up, outgoing)
    halfway = normalize(incoming + outgoing)
    f = fresnel_schlick_v(reflectivity, halfway, incoming)
    d = microfacet_distribution(mp.roughness, up, halfway)
    g = microfacet_shadowing(mp.roughness, up, halfway, outgoing, incoming)
    absin = jnp.abs(dot(up, incoming))
    diff = mp.color * (1.0 - mp.metallic[..., None]) * (1.0 - f1) / PI * absin[..., None]
    spec = f * (d * g / (4.0 * dot(up, outgoing) * dot(up, incoming)) * absin)[..., None]
    return jnp.where(mask[..., None], 0.0, diff + spec)


_SMOOTH_EVALS = {
    int(MaterialType.MATTE): _eval_matte,
    int(MaterialType.GLOSSY): _eval_glossy,
    int(MaterialType.REFLECTIVE): _eval_reflective,
    int(MaterialType.TRANSPARENT): _eval_transparent,
    int(MaterialType.REFRACTIVE): _eval_refractive,
    int(MaterialType.SUBSURFACE): _eval_refractive,
    int(MaterialType.GLTFPBR): _eval_gltfpbr,
}


def eval_bsdfcos(mp, normal, outgoing, incoming, types=None):
    ts = _smooth_types(types)
    if not ts:
        return jnp.zeros_like(incoming)
    out = _SMOOTH_EVALS[ts[0]](mp, normal, outgoing, incoming)
    for t in ts[1:]:
        out = jnp.where(
            (mp.mat_type == t)[..., None],
            _SMOOTH_EVALS[t](mp, normal, outgoing, incoming),
            out,
        )
    if len(ts) > 1:
        out = jnp.where((mp.mat_type == ts[0])[..., None],
                        _SMOOTH_EVALS[ts[0]](mp, normal, outgoing, incoming),
                        out)
    out = jnp.where((mp.roughness == 0.0)[..., None], 0.0, out)
    return jnp.nan_to_num(out, nan=0.0, posinf=0.0, neginf=0.0)


def _pdf_matte(mp, normal, outgoing, incoming):
    mask = dot(normal, incoming) * dot(normal, outgoing) <= 0.0
    up = flip_up(normal, outgoing)
    return jnp.where(mask, 0.0, sample_hemisphere_cos_pdf(up, incoming))


def _pdf_glossy(mp, normal, outgoing, incoming):
    mask = dot(normal, incoming) * dot(normal, outgoing) <= 0.0
    up = flip_up(normal, outgoing)
    halfway = normalize(outgoing + incoming)
    f = fresnel_dielectric(mp.ior, up, outgoing)
    p = f * sample_microfacet_pdf(mp.roughness, up, halfway) / (
        4.0 * jnp.abs(dot(outgoing, halfway))
    ) + (1.0 - f) * sample_hemisphere_cos_pdf(up, incoming)
    return jnp.where(mask, 0.0, p)


def _pdf_reflective(mp, normal, outgoing, incoming):
    mask = dot(normal, incoming) * dot(normal, outgoing) <= 0.0
    up = flip_up(normal, outgoing)
    halfway = normalize(outgoing + incoming)
    p = sample_microfacet_pdf(mp.roughness, up, halfway) / (
        4.0 * jnp.abs(dot(outgoing, halfway))
    )
    return jnp.where(mask, 0.0, p)


def _pdf_transparent(mp, normal, outgoing, incoming):
    up = flip_up(normal, outgoing)
    same = dot(normal, incoming) * dot(normal, outgoing) >= 0.0
    h_r = normalize(incoming + outgoing)
    p_r = fresnel_dielectric(mp.ior, h_r, outgoing) * sample_microfacet_pdf(
        mp.roughness, up, h_r
    ) / (4.0 * jnp.abs(dot(outgoing, h_r)))
    reflected = reflect(-incoming, up)
    h_t = normalize(reflected + outgoing)
    p_t = (
        (1.0 - fresnel_dielectric(mp.ior, h_t, outgoing))
        * sample_microfacet_pdf(mp.roughness, up, h_t)
        / (4.0 * jnp.abs(dot(outgoing, h_t)))
    )
    return jnp.where(same, p_r, p_t)


def _pdf_refractive(mp, normal, outgoing, incoming):
    entering = dot(normal, outgoing) >= 0.0
    up = jnp.where(entering[..., None], normal, -normal)
    rel_ior = jnp.where(entering, mp.ior, 1.0 / mp.ior)
    same = dot(normal, incoming) * dot(normal, outgoing) >= 0.0
    h_r = normalize(incoming + outgoing)
    p_r = fresnel_dielectric(rel_ior, h_r, outgoing) * sample_microfacet_pdf(
        mp.roughness, up, h_r
    ) / (4.0 * jnp.abs(dot(outgoing, h_r)))
    h_t = -normalize(rel_ior[..., None] * incoming + outgoing) * jnp.where(
        entering, 1.0, -1.0
    )[..., None]
    denom = rel_ior * dot(h_t, incoming) + dot(h_t, outgoing)
    p_t = (
        (1.0 - fresnel_dielectric(rel_ior, h_t, outgoing))
        * sample_microfacet_pdf(mp.roughness, up, h_t)
        * jnp.abs(dot(h_t, incoming))
        / (denom * denom)
    )
    return jnp.where(same, p_r, p_t)


def _pdf_gltfpbr(mp, normal, outgoing, incoming):
    mask = dot(normal, incoming) * dot(normal, outgoing) <= 0.0
    up = flip_up(normal, outgoing)
    halfway = normalize(outgoing + incoming)
    reflectivity = (
        eta_to_reflectivity(mp.ior)[..., None] * (1.0 - mp.metallic[..., None])
        + mp.color * mp.metallic[..., None]
    )
    f = jnp.mean(fresnel_schlick_v(reflectivity, up, outgoing), axis=-1)
    p = f * sample_microfacet_pdf(mp.roughness, up, halfway) / (
        4.0 * jnp.abs(dot(outgoing, halfway))
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
    ts = _smooth_types(types)
    if not ts:
        return jnp.zeros_like(mp.roughness)
    out = _SMOOTH_PDFS[ts[0]](mp, normal, outgoing, incoming)
    for t in ts[1:]:
        out = jnp.where(
            mp.mat_type == t, _SMOOTH_PDFS[t](mp, normal, outgoing, incoming), out
        )
    if len(ts) > 1:
        out = jnp.where(mp.mat_type == ts[0],
                        _SMOOTH_PDFS[ts[0]](mp, normal, outgoing, incoming), out)
    out = jnp.where(mp.roughness == 0.0, 0.0, out)
    return jnp.nan_to_num(out, nan=0.0, posinf=0.0, neginf=0.0)


# ---------------------------------------------------------------------------
# Delta lobes (pathtracer.wgsl:2231-2404)
# ---------------------------------------------------------------------------


def sample_delta(mp, normal, outgoing, rnl):
    t = mp.mat_type
    up = flip_up(normal, outgoing)
    refl = reflect(outgoing, up)

    # transparent
    f_tr = fresnel_dielectric(mp.ior, up, outgoing)
    trans = jnp.where((rnl < f_tr)[..., None], refl, -outgoing)

    # refractive
    entering = dot(normal, outgoing) >= 0.0
    up_r = jnp.where(entering[..., None], normal, -normal)
    rel_ior = jnp.where(entering, mp.ior, 1.0 / mp.ior)
    f_re = fresnel_dielectric(rel_ior, up_r, outgoing)
    refr = jnp.where(
        (rnl < f_re)[..., None],
        reflect(outgoing, up_r),
        refract(outgoing, up_r, 1.0 / rel_ior),
    )
    refr = jnp.where((jnp.abs(mp.ior - 1.0) < 1e-3)[..., None], -outgoing, refr)

    out = jnp.zeros_like(outgoing)
    out = jnp.where((t == MaterialType.REFLECTIVE)[..., None], refl, out)
    out = jnp.where((t == MaterialType.TRANSPARENT)[..., None], trans, out)
    out = jnp.where((t == MaterialType.REFRACTIVE)[..., None], refr, out)
    out = jnp.where((t == MaterialType.VOLUMETRIC)[..., None], -outgoing, out)
    return jnp.where((mp.roughness != 0.0)[..., None], 0.0, out)


def eval_delta(mp, normal, outgoing, incoming):
    t = mp.mat_type
    up = flip_up(normal, outgoing)
    same_side = dot(normal, incoming) * dot(normal, outgoing) >= 0.0
    opp = dot(normal, incoming) * dot(normal, outgoing) <= 0.0

    refl = fresnel_conductor(
        reflectivity_to_eta(mp.color), jnp.zeros_like(mp.color), up, outgoing
    )
    refl = jnp.where(opp[..., None], 0.0, refl)

    f_tr = fresnel_dielectric(mp.ior, up, outgoing)
    trans = jnp.where(
        same_side[..., None],
        f_tr[..., None] * jnp.ones_like(mp.color),
        mp.color * (1.0 - f_tr)[..., None],
    )

    entering = dot(normal, outgoing) >= 0.0
    up_r = jnp.where(entering[..., None], normal, -normal)
    rel_ior = jnp.where(entering, mp.ior, 1.0 / mp.ior)
    f_re = fresnel_dielectric(rel_ior, up_r, outgoing)
    refr = jnp.where(
        same_side, f_re, (1.0 / (rel_ior * rel_ior)) * (1.0 - f_re)
    )[..., None] * jnp.ones_like(mp.color)
    refr = jnp.where(
        (jnp.abs(mp.ior - 1.0) < 1e-3)[..., None],
        jnp.where(opp, 1.0, 0.0)[..., None] * jnp.ones_like(mp.color),
        refr,
    )

    passthrough = jnp.where(same_side, 0.0, 1.0)[..., None] * jnp.ones_like(mp.color)

    out = jnp.zeros_like(mp.color)
    out = jnp.where((t == MaterialType.REFLECTIVE)[..., None], refl, out)
    out = jnp.where((t == MaterialType.TRANSPARENT)[..., None], trans, out)
    out = jnp.where((t == MaterialType.REFRACTIVE)[..., None], refr, out)
    out = jnp.where((t == MaterialType.VOLUMETRIC)[..., None], passthrough, out)
    return jnp.where((mp.roughness != 0.0)[..., None], 0.0, out)


def sample_delta_pdf(mp, normal, outgoing, incoming):
    t = mp.mat_type
    up = flip_up(normal, outgoing)
    same_side = dot(normal, incoming) * dot(normal, outgoing) >= 0.0
    opp_strict = dot(normal, incoming) * dot(normal, outgoing) < 0.0

    # reference: pdf = 0 when the hemisphere product <= 0, else 1.
    refl = jnp.where(dot(normal, incoming) * dot(normal, outgoing) <= 0.0, 0.0, 1.0)

    f_tr = fresnel_dielectric(mp.ior, up, outgoing)
    trans = jnp.where(same_side, f_tr, 1.0 - f_tr)

    entering = dot(normal, outgoing) >= 0.0
    up_r = jnp.where(entering[..., None], normal, -normal)
    rel_ior = jnp.where(entering, mp.ior, 1.0 / mp.ior)
    f_re = fresnel_dielectric(rel_ior, up_r, outgoing)
    refr = jnp.where(same_side, f_re, 1.0 - f_re)
    refr = jnp.where(
        jnp.abs(mp.ior - 1.0) < 1e-3, jnp.where(opp_strict, 1.0, 0.0), refr
    )

    passthrough = jnp.where(same_side, 0.0, 1.0)

    out = jnp.zeros_like(f_tr)
    out = jnp.where(t == MaterialType.REFLECTIVE, refl, out)
    out = jnp.where(t == MaterialType.TRANSPARENT, trans, out)
    out = jnp.where(t == MaterialType.REFRACTIVE, refr, out)
    out = jnp.where(t == MaterialType.VOLUMETRIC, passthrough, out)
    return jnp.where(mp.roughness != 0.0, 0.0, out)


# ---------------------------------------------------------------------------
# Volumetric transmittance + Henyey-Greenstein phase
# ---------------------------------------------------------------------------


def sample_transmittance(density, max_distance, rl, rd):
    """Channel-stratified exponential distance sampling
    (pathtracer.wgsl:1895-1901)."""

    channel = jnp.clip((rl * 3.0).astype(jnp.int32), 0, 2)
    dch = jnp.take_along_axis(density, channel[..., None], axis=-1)[..., 0]
    distance = jnp.where(
        dch == 0.0, jnp.float32(3.4e38), -jnp.log(1.0 - rd) / jnp.maximum(dch, 1e-30)
    )
    return jnp.minimum(distance, max_distance)


def eval_transmittance(density, distance):
    return jnp.exp(-density * distance[..., None])


def sample_transmittance_pdf(density, distance, max_distance):
    """pathtracer.wgsl:2406-2413."""

    inside = jnp.sum(density * jnp.exp(-density * distance[..., None]), axis=-1) / 3.0
    surface = jnp.sum(jnp.exp(-density * max_distance[..., None]), axis=-1) / 3.0
    return jnp.where(distance < max_distance, inside, surface)


def _hg_cos_theta(aniso, rn_y):
    iso = 1.0 - 2.0 * rn_y
    sq = (1.0 - aniso * aniso) / (1.0 + aniso - 2.0 * aniso * rn_y)
    aniso_ct = (1.0 + aniso * aniso - sq * sq) / (2.0 * jnp.where(aniso == 0, 1.0, aniso))
    return jnp.where(jnp.abs(aniso) < 1e-3, iso, aniso_ct)


def sample_scattering(vol_density, vol_scattering, vol_aniso, outgoing, rx, ry):
    """HG phase sampling (pathtracer.wgsl:1903-1918); zero when density==0."""

    cos_theta = _hg_cos_theta(vol_aniso, ry)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * PI * rx
    local = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
    x, y, z = basis_fromz(-outgoing)
    out = _from_basis(x, y, z, local)
    zero = jnp.all(vol_density == 0.0, axis=-1)
    return jnp.where(zero[..., None], 0.0, out)


def _hg_phase(aniso, cosine):
    denom = 1.0 + aniso * aniso - 2.0 * aniso * cosine
    return (1.0 - aniso * aniso) / (4.0 * PI * denom * jnp.sqrt(jnp.maximum(denom, 1e-20)))


def eval_scattering(vol_density, vol_scattering, vol_aniso, outgoing, incoming):
    cosine = -dot(outgoing, incoming)
    phase = _hg_phase(vol_aniso, cosine)
    out = vol_scattering * vol_density * phase[..., None]
    zero = jnp.all(vol_density == 0.0, axis=-1)
    return jnp.where(zero[..., None], 0.0, out)


def sample_scattering_pdf(vol_density, vol_aniso, outgoing, incoming):
    cosine = -dot(outgoing, incoming)
    zero = jnp.all(vol_density == 0.0, axis=-1)
    return jnp.where(zero, 0.0, _hg_phase(vol_aniso, cosine))


def mis_heuristic(this_pdf, other_pdf):
    """Power-2 heuristic (pathtracer.wgsl:935-938)."""

    return (this_pdf * this_pdf) / (
        this_pdf * this_pdf + other_pdf * other_pdf
    )
