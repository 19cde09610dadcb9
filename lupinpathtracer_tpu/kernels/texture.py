"""Texture atlas sampling.

TPU-native rebuild of the reference's hardware texture path: WGPU
`binding_array<texture_2d>` + linear-repeat samplers
(pathtracer.wgsl:13-14, 1412-1416; wgpu_utils.rs:244-256). TPUs have no
samplers, so all textures live in one flat (P,4) pixel array with
offset/width/height tables and bilinear-repeat filtering is four gathers
plus lerps — pure VPU lane math over the ray batch.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_texture(scene, tex_idx: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Bilinear sample with repeat addressing; returns (B, 4).

    ``tex_idx`` may contain -1 (sentinel): those lanes return 1.0, matching
    call sites that guard with SENTINEL_IDX (pathtracer.wgsl:1293-1310).
    """

    present = tex_idx >= 0
    ti = jnp.maximum(tex_idx, 0)
    w = scene.tex_width[ti]
    h = scene.tex_height[ti]
    off = scene.tex_offset[ti]
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    # Texel centers at (i+0.5)/size; repeat wrap on the integer lattice.
    x = u * wf - 0.5
    y = v * hf - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = jnp.mod(x0f.astype(jnp.int32), w)
    y0 = jnp.mod(y0f.astype(jnp.int32), h)
    x1 = jnp.mod(x0 + 1, w)
    y1 = jnp.mod(y0 + 1, h)

    def fetch(yy, xx):
        return scene.tex_data[off + yy * w + xx]

    c00 = fetch(y0, x0)
    c10 = fetch(y0, x1)
    c01 = fetch(y1, x0)
    c11 = fetch(y1, x1)
    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    out = top * (1.0 - fy) + bot * fy
    return jnp.where(present[..., None], out, 1.0)


def texture_size(scene, tex_idx: jnp.ndarray):
    ti = jnp.maximum(tex_idx, 0)
    return scene.tex_width[ti], scene.tex_height[ti]


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    """pathtracer.wgsl:2814-2820."""

    return jnp.where(
        c < 0.04045,
        c / 12.92,
        jnp.power(jnp.maximum((c + 0.055) / 1.055, 0.0), 2.4),
    )
