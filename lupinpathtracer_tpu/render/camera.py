"""Camera ray generation (thin-lens perspective + orthographic).

TPU-native rebuild of compute_camera_ray (pathtracer.wgsl:505-542): same
film/aspect handling, disk-sampled depth of field, sub-pixel jitter, and the
final (1,1,-1) direction flip into the left-handed world, vectorized over a
pixel batch. The camera transform is a (3,4) affine frame.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import rng as rng_mod


def compute_camera_ray(
    cam_transform,  # (3,4) f32
    lens,
    film,
    aspect,
    focus,
    aperture,
    is_orthographic: bool,  # static
    pixel_xy,  # (B,2) i32 (x, y)
    resolution,  # (2,) static-ish (W, H) floats
    offset_x,
    offset_y,  # (B,) jitter in [-0.5, 0.5]
    state,  # (B,) rng
):
    res_x, res_y = resolution
    px = pixel_xy[:, 0].astype(jnp.float32) + 0.5
    # The y flip uses the raw pixel id: pixel_coord.y = res.y - id.y + 0.5
    # (pathtracer.wgsl:508).
    py = res_y - pixel_xy[:, 1].astype(jnp.float32) + 0.5
    u = (px + offset_x) / res_x
    v = (py + offset_y) / res_y

    film_w = jnp.where(aspect >= 1.0, film, film * aspect)
    film_h = jnp.where(aspect >= 1.0, film / aspect, film)

    state, dx, dy = rng_mod.next_in_disk(state)

    if is_orthographic:
        scale = 1.0 / lens
        qx = film_w * (0.5 - u) * scale
        qy = film_h * (0.5 - v) * scale
        ex = -qx + dx * aperture / 2.0
        ey = -qy + dy * aperture / 2.0
        e = jnp.stack([ex, ey, jnp.zeros_like(ex)], axis=-1)
        p = jnp.stack([-qx, -qy, jnp.full_like(qx, -focus)], axis=-1)
        d = p - e
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        d = d * jnp.asarray([1.0, 1.0, -1.0])
        ro, rd = e, d
    else:
        qx = film_w * (0.5 - u)
        qy = film_h * (0.5 - v)
        qz = jnp.full_like(qx, lens)
        q = jnp.stack([qx, qy, qz], axis=-1)
        look_at = -q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        lens_point = jnp.stack(
            [dx * aperture / 2.0, dy * aperture / 2.0, jnp.zeros_like(dx)], axis=-1
        )
        focus_point = look_at * (focus / jnp.abs(look_at[:, 2:3]))
        d = focus_point - lens_point
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        d = d * jnp.asarray([1.0, 1.0, -1.0])
        ro, rd = lens_point, d

    # transform_ray (pathtracer.wgsl:2746-2753) with a (3,4) frame.
    lin = cam_transform[:, :3]
    ro_w = ro @ lin.T + cam_transform[:, 3]
    rd_w = rd @ lin.T
    rd_w = rd_w / jnp.linalg.norm(rd_w, axis=-1, keepdims=True)
    return state, ro_w, rd_w
