"""Dense Pallas kernels on unaligned ray batches (interpret mode on CPU).

Round-1 regression: RB=min(ray_block, B) with B % 128 != 0 made the output
reshape fail on the TPU backend (the reference dispatches any
ceil(W/4) x ceil(H/4) grid without alignment constraints,
renderer.rs:835-837). These tests call the Pallas wrappers directly so the
shape logic is exercised even on the CPU backend, for every awkward batch
size the renderer can produce (12x12 smoke frames, odd tiles, single rays,
batches straddling ray_block).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lupinpathtracer_tpu.core import vec3 as v3
from lupinpathtracer_tpu.io import builtin
from lupinpathtracer_tpu.kernels import intersect
from lupinpathtracer_tpu.kernels.pallas_intersect import (
    dense_closest_hit_attrs_pallas,
    dense_closest_hit_pallas,
)
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu


@pytest.fixture(scope="module")
def cornell_dense():
    scene, _ = builtin.build_scene_cornell_box()
    tpu = build_scene_tpu(scene)
    assert not tpu.use_bvh
    W = intersect.scene_tri_matrix(tpu)
    return tpu, W


def _rays(rng, B):
    # Origins inside the box volume; directions biased upward so even a
    # single ray reliably hits the ceiling (the box front is open).
    ro = v3.V3(
        jnp.asarray(rng.uniform(-0.6, 0.6, B), jnp.float32),
        jnp.asarray(rng.uniform(0.3, 1.2, B), jnp.float32),
        jnp.asarray(rng.uniform(-0.6, 0.6, B), jnp.float32),
    )
    d = rng.normal(size=(3, B)).astype(np.float32)
    d[1] = np.abs(d[1]) + 1.0
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    return ro, v3.V3(*(jnp.asarray(c) for c in d))


@pytest.mark.parametrize("B", [1, 100, 144, 1024, 1200])
def test_dense_pallas_unaligned_batches(cornell_dense, rng, B):
    tpu, W = cornell_dense
    ro, rd = _rays(rng, B)
    t, u, v, det, idx = dense_closest_hit_pallas(W, ro, rd, 1e-3)
    rt, ru, rv, rdet, ridx = intersect.closest_hit_dense_jnp(W, ro, rd, 1e-3)
    assert t.shape == (B,)
    np.testing.assert_allclose(np.asarray(t), np.asarray(rt), rtol=1e-5)
    hit = np.asarray(rt) < 1e30
    assert hit.any()  # rays inside the box always hit a wall
    np.testing.assert_array_equal(np.asarray(idx)[hit], np.asarray(ridx)[hit])


@pytest.mark.parametrize("B", [144, 1200])
def test_dense_attrs_pallas_unaligned_batches(cornell_dense, rng, B):
    tpu, W = cornell_dense
    ro, rd = _rays(rng, B)
    t, u, v, det, idx, attr = dense_closest_hit_attrs_pallas(
        W, tpu.wt_attr, ro, rd, 1e-3
    )
    rt, ru, rv, rdet, ridx = intersect.closest_hit_dense_jnp(W, ro, rd, 1e-3)
    assert t.shape == (B,) and attr.shape[1] == B
    np.testing.assert_allclose(np.asarray(t), np.asarray(rt), rtol=1e-5)
    hit = np.asarray(rt) < 1e30
    np.testing.assert_array_equal(np.asarray(idx)[hit], np.asarray(ridx)[hit])
