"""Counter-free PCG32 random number generation as batched lane math.

TPU-native rebuild of the reference's per-thread PCG RNG
(/root/reference/lupin/src/shaders/pathtracer.wgsl:1566-1686). Each "lane"
(one ray / one pixel sample) carries a uint32 state; every helper is pure and
returns ``(new_state, value)`` so the whole sampler pipeline stays inside a
single jitted program. All helpers broadcast over arbitrary batch shapes.

The generator matches the reference bit-for-bit (same multiplier/increment,
same output permutation, same u32->f32 mapping) so that sampling statistics —
and therefore converged renders — agree with the WGPU implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# numpy scalars, NOT jnp: module-level jnp arrays would be captured as
# pallas kernel constants (pallas_call rejects them); np scalars embed as
# immediates.
_PCG_MULT = np.uint32(747796405)
_PCG_INC = np.uint32(2891336453)
_U32_MAX_F = np.float32(4294967295.0)

PI = 3.14159265358979323846264338327950288


def as_u32(x):
    """Signed->unsigned reinterpret that lowers inside Pallas kernels.
    Mosaic rejects convert_element_type between i32/u32 and u32<->f32; a
    same-width bitcast is always available and value-identical for the
    wrap-around semantics the PCG math needs."""

    x = jnp.asarray(x)
    if x.dtype == jnp.uint32:
        return x
    if x.dtype == jnp.int32 and x.ndim >= 1:
        # Mosaic's tpu.bitcast only accepts vectors; scalar converts lower
        # fine through the scalar unit.
        return jax.lax.bitcast_convert_type(x, jnp.uint32)
    return x.astype(jnp.uint32)


def as_i32(x):
    """Unsigned->signed reinterpret (kernel-safe, see as_u32)."""

    x = jnp.asarray(x)
    if x.dtype == jnp.uint32 and x.ndim >= 1:
        return jax.lax.bitcast_convert_type(x, jnp.int32)
    return x.astype(jnp.int32)


def u32_to_f32(word):
    """Exact-enough u32 -> f32 (Mosaic has no unsigned->float cast):
    reinterpret as i32, convert, and add 2^32 back for the negative half.
    At most 1 ulp-of-2^32 from a direct conversion — used by BOTH the jnp
    and Pallas paths so their streams stay bit-identical."""

    w_i = jax.lax.bitcast_convert_type(word, jnp.int32)
    f = w_i.astype(jnp.float32)
    return jnp.where(w_i < 0, f + 4294967296.0, f)


def hash_u32(x):
    """Integer finalizer hash (pathtracer.wgsl:1573-1585)."""
    x = as_u32(x)
    x = x ^ (x >> 17)
    x = x * np.uint32(0xED5AD4BB)
    x = x ^ (x >> 11)
    x = x * np.uint32(0xAC4C1B51)
    x = x ^ (x >> 15)
    x = x * np.uint32(0x31848BAB)
    x = x ^ (x >> 14)
    return x


def init_state(pixel_idx, accum_counter, seed, sample_idx=0):
    """Seed per-lane streams (pathtracer.wgsl:1563-1570).

    The reference seeds once per thread and consumes one sequential stream
    across its SPP loop; we instead fold the sample index into the seed so
    each (pixel, sample) pair is an independent stream — required because
    samples run as one batched wavefront rather than a serial loop.
    """
    pixel_idx = as_u32(pixel_idx)
    accum = as_u32(accum_counter)
    seed = as_u32(seed)
    sample = as_u32(sample_idx)
    mixed = (
        (pixel_idx * np.uint32(19349663))
        ^ (accum * np.uint32(83492791))
        ^ (seed * np.uint32(73856093))
        ^ (sample * np.uint32(2654435769))
    )
    return hash_u32(mixed)


def next_u32(state):
    """One PCG step -> (state, uint32) (pathtracer.wgsl:1589-1595)."""
    state = state * _PCG_MULT + _PCG_INC
    word = ((state >> ((state >> 28) + np.uint32(4))) ^ state) * np.uint32(277803737)
    word = (word >> 22) ^ word
    return state, word


def next_f32(state):
    """Uniform in [0, 1) (pathtracer.wgsl:1598-1604)."""
    state, word = next_u32(state)
    return state, u32_to_f32(word) / _U32_MAX_F


def next_vec2(state):
    """Two uniforms, evaluated in fixed order (pathtracer.wgsl:1612-1618)."""
    state, a = next_f32(state)
    state, b = next_f32(state)
    return state, a, b


def next_u32_range(state, max_exclusive):
    """Uniform integer in [0, max) — max must be > 0 (pathtracer.wgsl:1607-1610)."""
    state, r = next_f32(state)
    if isinstance(max_exclusive, (int, np.integer)):
        # Static bound: np immediates (kernel-safe, no jaxpr constants).
        max_f = np.float32(max_exclusive)
        cap = np.int32(max_exclusive - 1)
    else:
        max_f = jnp.asarray(max_exclusive).astype(jnp.float32)
        cap = as_i32(max_exclusive) - np.int32(1)
    # f32 -> i32 -> reinterpret u32: Mosaic has no f32 -> u32 cast; the
    # value always fits in i32 (r < 1, so idx < max <= 2^31).
    idx = as_u32(jnp.minimum((r * max_f).astype(jnp.int32), cap))
    return state, idx


def next_in_disk(state):
    """Uniform point in the unit disk (pathtracer.wgsl:1629-1635)."""
    state, rx, ry = next_vec2(state)
    r = jnp.sqrt(ry)
    phi = 2.0 * PI * rx
    return state, jnp.cos(phi) * r, jnp.sin(phi) * r


def next_tri_uv(state):
    """Uniform barycentric uv on a triangle (pathtracer.wgsl:1672-1676)."""
    state, rx, ry = next_vec2(state)
    s = jnp.sqrt(rx)
    return state, 1.0 - s, ry * s


def next_sphere(state):
    """Uniform direction on the unit sphere (pathtracer.wgsl:2452-2458)."""
    state, rx, ry = next_vec2(state)
    z = 2.0 * ry - 1.0
    r = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    phi = 2.0 * PI * rx
    return state, jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
