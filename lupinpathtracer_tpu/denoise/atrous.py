"""Edge-avoiding à-trous wavelet denoiser.

TPU-native replacement for the reference's OIDN integration
(denoising.rs:4-499). OIDN is an x86/SYCL/CUDA library with no TPU port, so
the capability — "denoise a noisy accumulation buffer, optionally guided by
albedo/normal G-buffers" — is rebuilt as an edge-avoiding à-trous wavelet
filter (Dammertz et al. 2010), the standard real-time path-tracing denoiser.
The G-buffers come from the same falsecolor AOVs the reference feeds OIDN
(renderer.rs:844-870: ALBEDO and NORMALS).

Unlike the reference — which stalls the GPU and round-trips through OIDN
staging buffers (denoising.rs:256-258, 328-470) — this runs as one jitted
program on-device with zero host traffic.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@dataclass
class DenoiseDesc:
    """Mirrors the reference's DenoiseDesc quality knob (denoising.rs:210-219);
    iterations plays the role of OIDN's quality setting."""

    iterations: int = 5
    sigma_color: float = 0.35
    sigma_albedo: float = 0.25
    sigma_normal: float = 0.35


_KERNEL = (1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16)


def _pad_shift(img, dy, dx):
    h, w = img.shape[:2]
    ys = jnp.clip(jnp.arange(h) - dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) - dx, 0, w - 1)
    return img[ys[:, None], xs[None, :]]


@partial(jax.jit, static_argnames=("iterations",))
def denoise(
    color,
    albedo=None,
    normal=None,
    iterations: int = 5,
    sigma_color: float = 0.35,
    sigma_albedo: float = 0.25,
    sigma_normal: float = 0.35,
):
    """Denoise an (H,W,3) HDR image. albedo/normal are optional (H,W,3)
    guides (the reference also treats them as optional, denoising.rs:270-297)."""

    out = color
    for it in range(iterations):
        step = 1 << it
        accum = jnp.zeros_like(out)
        wsum = jnp.zeros(out.shape[:2] + (1,), out.dtype)
        for ky in range(5):
            for kx in range(5):
                dy = (ky - 2) * step
                dx = (kx - 2) * step
                kw = _KERNEL[ky] * _KERNEL[kx]
                c = _pad_shift(out, dy, dx)
                w = jnp.full(out.shape[:2], kw, out.dtype)
                dc = jnp.sum((c - out) ** 2, axis=-1)
                w = w * jnp.exp(-dc / (sigma_color * sigma_color))
                if albedo is not None:
                    da = jnp.sum(
                        (_pad_shift(albedo, dy, dx) - albedo) ** 2, axis=-1
                    )
                    w = w * jnp.exp(-da / (sigma_albedo * sigma_albedo))
                if normal is not None:
                    dn = jnp.sum(
                        (_pad_shift(normal, dy, dx) - normal) ** 2, axis=-1
                    )
                    w = w * jnp.exp(-dn / (sigma_normal * sigma_normal))
                accum = accum + c * w[..., None]
                wsum = wsum + w[..., None]
        out = accum / jnp.maximum(wsum, 1e-8)
    return out
