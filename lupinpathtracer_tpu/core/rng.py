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

import jax.numpy as jnp

_PCG_MULT = jnp.uint32(747796405)
_PCG_INC = jnp.uint32(2891336453)
_U32_MAX_F = jnp.float32(4294967295.0)

PI = 3.14159265358979323846264338327950288


def hash_u32(x):
    """Integer finalizer hash (pathtracer.wgsl:1573-1585)."""
    x = jnp.asarray(x, jnp.uint32)
    x = x ^ (x >> 17)
    x = x * jnp.uint32(0xED5AD4BB)
    x = x ^ (x >> 11)
    x = x * jnp.uint32(0xAC4C1B51)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x31848BAB)
    x = x ^ (x >> 14)
    return x


def init_state(pixel_idx, accum_counter, seed, sample_idx=0):
    """Seed per-lane streams (pathtracer.wgsl:1563-1570).

    The reference seeds once per thread and consumes one sequential stream
    across its SPP loop; we instead fold the sample index into the seed so
    each (pixel, sample) pair is an independent stream — required because
    samples run as one batched wavefront rather than a serial loop.
    """
    pixel_idx = jnp.asarray(pixel_idx, jnp.uint32)
    accum = jnp.asarray(accum_counter, jnp.uint32)
    seed = jnp.asarray(seed, jnp.uint32)
    sample = jnp.asarray(sample_idx, jnp.uint32)
    mixed = (
        (pixel_idx * jnp.uint32(19349663))
        ^ (accum * jnp.uint32(83492791))
        ^ (seed * jnp.uint32(73856093))
        ^ (sample * jnp.uint32(2654435769))
    )
    return hash_u32(mixed)


def next_u32(state):
    """One PCG step -> (state, uint32) (pathtracer.wgsl:1589-1595)."""
    state = state * _PCG_MULT + _PCG_INC
    word = ((state >> ((state >> 28) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
    word = (word >> 22) ^ word
    return state, word


def next_f32(state):
    """Uniform in [0, 1) (pathtracer.wgsl:1598-1604)."""
    state, word = next_u32(state)
    return state, word.astype(jnp.float32) / _U32_MAX_F


def next_vec2(state):
    """Two uniforms, evaluated in fixed order (pathtracer.wgsl:1612-1618)."""
    state, a = next_f32(state)
    state, b = next_f32(state)
    return state, a, b


def next_u32_range(state, max_exclusive):
    """Uniform integer in [0, max) — max must be > 0 (pathtracer.wgsl:1607-1610)."""
    state, r = next_f32(state)
    max_f = jnp.asarray(max_exclusive).astype(jnp.float32)
    idx = jnp.minimum(
        (r * max_f).astype(jnp.uint32),
        jnp.asarray(max_exclusive, jnp.uint32) - jnp.uint32(1),
    )
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
