"""Texture atlas sampling.

TPU-native rebuild of the reference's hardware texture path: WGPU
`binding_array<texture_2d>` + linear-repeat samplers
(pathtracer.wgsl:13-14, 1412-1416; wgpu_utils.rs:244-256). TPUs have no
samplers, so all textures live in one flat component-major (4, P) pixel
array with offset/size tables; bilinear-repeat filtering is four gathers
per channel plus lerps — pure VPU lane math over the ray batch. Returns
(rgb V3, alpha) tuples to keep everything in the lane-major layout.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import vec3 as v3
from ..core.vec3 import V3


def sample_texture(
    scene, tex_idx: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
    packed: bool = False,
):
    """Bilinear sample with repeat addressing; returns (V3 rgb, alpha (B,)).

    ``tex_idx`` may contain -1 (sentinel): those lanes return 1.0, matching
    call sites that guard with SENTINEL_IDX (pathtracer.wgsl:1293-1310).
    ``packed=True`` (material fetches) reads the RGBA8 u32 atlas when every
    material texture is 8-bit-exact — 4 corner gathers instead of 16,
    bit-identical values.
    """

    from ..core.tables import sel_by_id

    present = tex_idx >= 0
    ti = jnp.maximum(tex_idx, 0)
    w = sel_by_id(scene.tex_width, ti)
    h = sel_by_id(scene.tex_height, ti)
    off = sel_by_id(scene.tex_offset, ti)
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    # Texel centers at (i+0.5)/size; repeat wrap on the integer lattice.
    x = u * wf - 0.5
    y = v * hf - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    x0 = jnp.mod(x0f.astype(jnp.int32), w)
    y0 = jnp.mod(y0f.astype(jnp.int32), h)
    x1 = jnp.mod(x0 + 1, w)
    y1 = jnp.mod(y0 + 1, h)

    i00 = off + y0 * w + x0
    i10 = off + y0 * w + x1
    i01 = off + y1 * w + x0
    i11 = off + y1 * w + x1

    if packed and scene.mat_tex_ldr:
        atlas = scene.tex_data_u32
        p00, p10, p01, p11 = atlas[i00], atlas[i10], atlas[i01], atlas[i11]

        def chan(c):
            sh = jnp.uint32(8 * c)

            def dec(p):
                # Division (not reciprocal-multiply) keeps k/255 bit-equal
                # to the f32 atlas values.
                return ((p >> sh) & jnp.uint32(0xFF)).astype(jnp.float32) / 255.0

            top = dec(p00) * (1.0 - fx) + dec(p10) * fx
            bot = dec(p01) * (1.0 - fx) + dec(p11) * fx
            out = top * (1.0 - fy) + bot * fy
            return jnp.where(present, out, 1.0)

        return V3(chan(0), chan(1), chan(2)), chan(3)

    def chan(c):
        row = scene.tex_data[c]
        top = row[i00] * (1.0 - fx) + row[i10] * fx
        bot = row[i01] * (1.0 - fx) + row[i11] * fx
        out = top * (1.0 - fy) + bot * fy
        return jnp.where(present, out, 1.0)

    return V3(chan(0), chan(1), chan(2)), chan(3)


def srgb_to_linear(c):
    """pathtracer.wgsl:2814-2820; works on (B,) channels or V3."""

    if isinstance(c, V3):
        return V3(*(srgb_to_linear(x) for x in c))
    return jnp.where(
        c < 0.04045,
        c / 12.92,
        jnp.power(jnp.maximum((c + 0.055) / 1.055, 0.0), 2.4),
    )
