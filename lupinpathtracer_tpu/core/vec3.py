"""Component-wise 3-vectors: the TPU-native vector representation.

A batch of N 3-vectors stored as one f32[N,3] array gets the default TPU
layout {1,0:T(8,128)} — the minor dimension (3) is padded to 128 lanes, so
every materialized vector intermediate wastes 42x HBM bandwidth. On a GPU
each thread holds its vec3 in registers (the reference's WGSL code); the
TPU equivalent is structure-of-arrays: three (N,) f32 arrays, each laid out
densely across lanes. This module provides that as a tiny pytree type with
vector algebra, so the shading code reads like the reference's vec3f math
while every component stays a flat lane-major array.

(The same trap applies to RGB colors; V3 is used for those too.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class V3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- arithmetic (tuple's concat/repeat semantics intentionally replaced) --
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return V3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    def __rtruediv__(self, o):
        return V3(o / self.x, o / self.y, o / self.z)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)


def splat(v, like=None):
    """V3 from a python/np 3-tuple, optionally broadcast to `like`'s shape."""

    x, y, z = (jnp.asarray(c, jnp.float32) for c in v)
    if like is not None:
        shp = like.x.shape if isinstance(like, V3) else jnp.shape(like)
        x = jnp.broadcast_to(x, shp)
        y = jnp.broadcast_to(y, shp)
        z = jnp.broadcast_to(z, shp)
    return V3(x, y, z)


def zeros(shape):
    z = jnp.zeros(shape, jnp.float32)
    return V3(z, z, z)


def full(shape, val):
    c = jnp.full(shape, val, jnp.float32)
    return V3(c, c, c)


def from_rows(a):
    """(..., 3) array -> V3 (used only at API boundaries)."""

    return V3(a[..., 0], a[..., 1], a[..., 2])


def to_rows(v: V3):
    return jnp.stack([v.x, v.y, v.z], axis=-1)


def from_t3(a):
    """(3, ...) component-major array -> V3 (cheap row slices)."""

    return V3(a[0], a[1], a[2])


def dot(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: V3, b: V3) -> V3:
    return V3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def length(a: V3):
    return jnp.sqrt(dot(a, a))


def normalize(a: V3, eps=1e-20) -> V3:
    n = jnp.maximum(length(a), eps)
    return V3(a.x / n, a.y / n, a.z / n)


def where(mask, a, b) -> V3:
    """Per-lane select; mask is (N,)."""

    ax, ay, az = (a.x, a.y, a.z) if isinstance(a, V3) else (a, a, a)
    bx, by, bz = (b.x, b.y, b.z) if isinstance(b, V3) else (b, b, b)
    return V3(
        jnp.where(mask, ax, bx),
        jnp.where(mask, ay, by),
        jnp.where(mask, az, bz),
    )


def vmax(a: V3, b) -> V3:
    if isinstance(b, V3):
        return V3(
            jnp.maximum(a.x, b.x), jnp.maximum(a.y, b.y), jnp.maximum(a.z, b.z)
        )
    return V3(jnp.maximum(a.x, b), jnp.maximum(a.y, b), jnp.maximum(a.z, b))


def vmin(a: V3, b) -> V3:
    if isinstance(b, V3):
        return V3(
            jnp.minimum(a.x, b.x), jnp.minimum(a.y, b.y), jnp.minimum(a.z, b.z)
        )
    return V3(jnp.minimum(a.x, b), jnp.minimum(a.y, b), jnp.minimum(a.z, b))


def vabs(a: V3) -> V3:
    return V3(jnp.abs(a.x), jnp.abs(a.y), jnp.abs(a.z))


def vexp(a: V3) -> V3:
    return V3(jnp.exp(a.x), jnp.exp(a.y), jnp.exp(a.z))


def vlog(a: V3) -> V3:
    return V3(jnp.log(a.x), jnp.log(a.y), jnp.log(a.z))


def vclip(a: V3, lo, hi) -> V3:
    return V3(jnp.clip(a.x, lo, hi), jnp.clip(a.y, lo, hi), jnp.clip(a.z, lo, hi))


def vsqrt(a: V3) -> V3:
    return V3(jnp.sqrt(a.x), jnp.sqrt(a.y), jnp.sqrt(a.z))


def max_comp(a: V3):
    return jnp.maximum(a.x, jnp.maximum(a.y, a.z))


def sum_comp(a: V3):
    return a.x + a.y + a.z


def mean_comp(a: V3):
    return (a.x + a.y + a.z) / 3.0


def all_zero(a: V3):
    return (a.x == 0.0) & (a.y == 0.0) & (a.z == 0.0)


def any_nonzero(a: V3):
    return (a.x != 0.0) | (a.y != 0.0) | (a.z != 0.0)


def all_nonzero(a: V3):
    return (a.x != 0.0) & (a.y != 0.0) & (a.z != 0.0)


def is_finite(a: V3):
    return jnp.isfinite(a.x) & jnp.isfinite(a.y) & jnp.isfinite(a.z)


def nan_to_zero(a: V3) -> V3:
    def f(c):
        return jnp.nan_to_num(c, nan=0.0, posinf=0.0, neginf=0.0)

    return V3(f(a.x), f(a.y), f(a.z))


def gather(tableT, idx) -> V3:
    """Gather from a component-major (3, N) table at (B,) indices.

    NOTE: row-slice first, THEN 1-D gather. A fused 2-D gather
    (``tableT[k, idx]``) hits a ~70x slower scalar XLA:TPU lowering; the row
    slice is loop-invariant (hoisted) and the 1-D gather vectorizes."""

    return V3(tableT[0][idx], tableT[1][idx], tableT[2][idx])
