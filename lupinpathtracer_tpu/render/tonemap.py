"""Tonemapping: exposure, ACES-approx filmic, sRGB encode, aspect-fit.

TPU-native rebuild of the reference's tonemap pass (tonemapping.rs:12-223 +
shaders/tonemapping.wgsl). The reference draws a fullscreen triangle pair
with scale-based letterboxing; here the same mapping is a pure function on
the image array plus an aspect-fit resampler (bilinear, out-of-range black),
jit-compiled like everything else.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@dataclass
class TonemapDesc:
    """tonemapping.rs:106-133."""

    exposure: float = 0.0
    filmic: bool = False
    srgb: bool = True


def tonemap_filmic(color):
    """ACES-approx filmic curve (tonemapping.wgsl:64-71)."""

    hdr = color * 0.6
    ldr = (hdr * hdr * 2.51 + hdr * 0.03) / (hdr * hdr * 2.43 + hdr * 0.59 + 0.14)
    return jnp.maximum(ldr, 0.0)


def linear_to_srgb(color):
    """tonemapping.wgsl:73-79."""

    return jnp.where(
        color <= 0.0031308,
        color * 12.92,
        1.055 * jnp.power(jnp.maximum(color, 0.0), 1.0 / 2.4) - 0.055,
    )


@partial(jax.jit, static_argnames=("filmic", "srgb"))
def tonemap(image, exposure, filmic: bool, srgb: bool):
    """Pixelwise mapping (tonemapping.wgsl:50-62)."""

    color = jnp.maximum(image[..., :3], 0.0)
    color = jnp.where(exposure != 0.0, color * jnp.exp2(exposure), color)
    if filmic:
        color = tonemap_filmic(color)
    if srgb:
        color = linear_to_srgb(color)
    return color


@partial(jax.jit, static_argnames=("out_height", "out_width", "filmic", "srgb"))
def tonemap_and_fit_aspect(
    image, exposure, out_height: int, out_width: int, filmic: bool, srgb: bool
):
    """Letterboxed resample + tonemap (tonemapping.rs:155-223): the source is
    scaled uniformly to fit the destination; uncovered regions are black."""

    h, w = image.shape[:2]
    scale = min(out_width / w, out_height / h)
    fit_w = w * scale
    fit_h = h * scale
    x0 = (out_width - fit_w) / 2.0
    y0 = (out_height - fit_h) / 2.0

    xs = (jnp.arange(out_width, dtype=jnp.float32) + 0.5 - x0) / scale
    ys = (jnp.arange(out_height, dtype=jnp.float32) + 0.5 - y0) / scale
    in_x = (xs >= 0.0) & (xs < w)
    in_y = (ys >= 0.0) & (ys < h)

    xi = jnp.clip(xs - 0.5, 0.0, w - 1.0)
    yi = jnp.clip(ys - 0.5, 0.0, h - 1.0)
    x0i = jnp.floor(xi).astype(jnp.int32)
    y0i = jnp.floor(yi).astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)
    fx = (xi - x0i)[None, :, None]
    fy = (yi - y0i)[:, None, None]

    img = jnp.maximum(image[..., :3], 0.0)
    c00 = img[y0i[:, None], x0i[None, :]]
    c10 = img[y0i[:, None], x1i[None, :]]
    c01 = img[y1i[:, None], x0i[None, :]]
    c11 = img[y1i[:, None], x1i[None, :]]
    color = (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (
        c01 * (1 - fx) + c11 * fx
    ) * fy

    mask = (in_y[:, None] & in_x[None, :])[..., None]
    color = jnp.where(mask, color, 0.0)
    color = jnp.where(exposure != 0.0, color * jnp.exp2(exposure), color)
    if filmic:
        color = tonemap_filmic(color)
    if srgb:
        color = linear_to_srgb(color)
    return color
