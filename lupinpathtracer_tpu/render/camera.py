"""Camera ray generation (thin-lens perspective + orthographic).

TPU-native rebuild of compute_camera_ray (pathtracer.wgsl:505-542): same
film/aspect handling, disk-sampled depth of field, sub-pixel jitter, and the
final (1,1,-1) direction flip into the left-handed world, vectorized over a
pixel batch in component-wise V3 form. The camera transform is a (3,4)
affine frame (small; indexed scalars broadcast over lanes).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import rng as rng_mod
from ..core import vec3 as v3
from ..core.vec3 import V3


def compute_camera_ray(
    cam_transform,  # (3,4) f32
    lens,
    film,
    aspect,
    focus,
    aperture,
    is_orthographic: bool,  # static
    gx,
    gy,  # (B,) pixel ids
    resolution,  # (W, H) floats
    offset_x,
    offset_y,  # (B,) jitter in [-0.5, 0.5]
    state,  # (B,) rng
):
    res_x, res_y = resolution
    px = gx.astype(jnp.float32) + 0.5
    # The y flip uses the raw pixel id: pixel_coord.y = res.y - id.y + 0.5
    # (pathtracer.wgsl:508).
    py = res_y - gy.astype(jnp.float32) + 0.5
    u = (px + offset_x) / res_x
    v = (py + offset_y) / res_y

    film_w = jnp.where(aspect >= 1.0, film, film * aspect)
    film_h = jnp.where(aspect >= 1.0, film / aspect, film)

    state, dx, dy = rng_mod.next_in_disk(state)

    if is_orthographic:
        scale = 1.0 / lens
        qx = film_w * (0.5 - u) * scale
        qy = film_h * (0.5 - v) * scale
        e = V3(
            -qx + dx * aperture / 2.0,
            -qy + dy * aperture / 2.0,
            jnp.zeros_like(qx),
        )
        p = V3(-qx, -qy, jnp.full_like(qx, -focus))
        d = v3.normalize(p - e)
        d = V3(d.x, d.y, -d.z)
        ro, rd = e, d
    else:
        qx = film_w * (0.5 - u)
        qy = film_h * (0.5 - v)
        qz = jnp.full_like(qx, lens)
        qlen = jnp.sqrt(qx * qx + qy * qy + qz * qz)
        look = V3(-qx / qlen, -qy / qlen, -qz / qlen)
        lens_point = V3(
            dx * aperture / 2.0, dy * aperture / 2.0, jnp.zeros_like(dx)
        )
        fscale = focus / jnp.abs(look.z)
        focus_point = look * fscale
        d = v3.normalize(focus_point - lens_point)
        d = V3(d.x, d.y, -d.z)
        ro, rd = lens_point, d

    # transform_ray (pathtracer.wgsl:2746-2753) with a (3,4) frame.
    m = cam_transform
    ro_w = V3(
        m[0, 0] * ro.x + m[0, 1] * ro.y + m[0, 2] * ro.z + m[0, 3],
        m[1, 0] * ro.x + m[1, 1] * ro.y + m[1, 2] * ro.z + m[1, 3],
        m[2, 0] * ro.x + m[2, 1] * ro.y + m[2, 2] * ro.z + m[2, 3],
    )
    rd_w = v3.normalize(
        V3(
            m[0, 0] * rd.x + m[0, 1] * rd.y + m[0, 2] * rd.z,
            m[1, 0] * rd.x + m[1, 1] * rd.y + m[1, 2] * rd.z,
            m[2, 0] * rd.x + m[2, 1] * rd.y + m[2, 2] * rd.z,
        )
    )
    return state, ro_w, rd_w
