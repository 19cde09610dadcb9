"""Synthetic envelope-scene generators (io/synthetic.py).

The reference's scale envelope is multi-M-triangle scenes and up to 1M
instances (README.md:20-37, renderer.rs:317-319); these tests validate the
checked-in generators at small scale (structure, determinism, renderability)
— the multi-M bench config reuses the same code path at n_tris=2M.
"""

import numpy as np
import pytest

from lupinpathtracer_tpu.io.synthetic import (
    build_scene_instanced_field,
    build_scene_terrain,
)
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu
from lupinpathtracer_tpu.scene.scene import get_scene_stats, validate_scene


def test_terrain_structure_and_determinism():
    sc, cams = build_scene_terrain(n_tris=2048, seed=0)
    stats = get_scene_stats(sc)
    # Triangle budget is approximate (grid rounding + spheres + light quad)
    # but must be in the right ballpark and dominated by the terrain mesh.
    assert 2048 <= stats["num_tris_unique"] <= 2048 * 1.25
    assert stats["num_mesh_lights"] >= 1
    assert len(cams) == 1 and cams[0].transform.shape == (3, 4)

    sc2, _ = build_scene_terrain(n_tris=2048, seed=0)
    np.testing.assert_array_equal(
        sc.meshes[0].positions, sc2.meshes[0].positions
    )
    sc3, _ = build_scene_terrain(n_tris=2048, seed=1)
    assert not np.array_equal(sc.meshes[0].positions, sc3.meshes[0].positions)


def test_terrain_scales_quadratically():
    sc, _ = build_scene_terrain(n_tris=32768, seed=0)
    stats = get_scene_stats(sc)
    assert 32768 <= stats["num_tris_unique"] <= 32768 * 1.1


def test_terrain_takes_bvh_superleaf_path():
    sc, _ = build_scene_terrain(n_tris=2048, seed=0)
    st = build_scene_tpu(sc)
    assert st.use_bvh and st.sl_count > 1 and not st.top_root_is_leaf


def test_terrain_renders_lit_pixels():
    import jax.numpy as jnp

    from lupinpathtracer_tpu.core.types import (
        BakedPathtraceParams,
        PathtraceDesc,
    )
    from lupinpathtracer_tpu.render.renderer import render_progressive

    sc, cams = build_scene_terrain(n_tris=2048, seed=0)
    st = build_scene_tpu(sc)
    desc = PathtraceDesc()
    desc.camera_transform = cams[0].transform
    desc.camera_params = cams[0].params
    baked = BakedPathtraceParams(max_bounces=4, samples_per_pixel=2)
    img = render_progressive(st, desc, baked, 64, 36, 2)
    rgb = np.asarray(img)[..., :3]
    assert np.isfinite(rgb).all()
    # Camera sits above the terrain looking across it with an overhead key
    # light: most of the frame must be lit.
    assert (rgb.sum(-1) > 0).mean() > 0.4


def test_instanced_field_structure():
    sc, cams = build_scene_instanced_field(n_instances=64, seed=0)
    stats = get_scene_stats(sc)
    assert stats["num_instances"] == 64 + 2  # plane + light
    validate_scene(sc)
    st = build_scene_tpu(sc)
    assert st.use_bvh
    assert len(cams) == 1


def test_instanced_field_two_level_at_scale():
    # Enough instances that flatten picks the two-level path.
    sc, _ = build_scene_instanced_field(n_instances=512, seed=0)
    st = build_scene_tpu(sc)
    assert st.two_level


@pytest.mark.slow
def test_packet_parity_at_terrain_stride():
    """Packet kernel at the terrain2M bench config's exact specialization
    (SP=4096, NSUB=8 — pick_stride chooses 4096 for ~2.9M padded tris;
    every other parity test runs SP<=1024). Interpret mode pins the
    semantics of the 512-wide sub-chunk slices and the (18, 4096) DMA
    block shape before the hardware bench exercises them."""

    import jax.numpy as jnp

    from lupinpathtracer_tpu.kernels import intersect, pallas_packet

    sc, _ = build_scene_terrain(n_tris=32768, seed=0)
    st = build_scene_tpu(sc, sl_stride_opt=4096)
    assert st.use_bvh and st.sl_stride == 4096 and st.sl_count >= 4
    assert int(st.sl_sub.shape[1]) == 8  # NSUB at this stride

    ro, rd = pallas_packet._probe_rays(st, n=256)
    ref = intersect.closest_hit_bvh(st, ro, rd, 1e-4)
    W4 = intersect.scene_tri_matrix(st)
    t, u, v, det, tri = pallas_packet.packet_traverse(st, ro, rd, 1e-4, W4)

    hit = np.asarray(t) < intersect.F32_MAX
    np.testing.assert_array_equal(hit, np.asarray(ref.hit))
    h = np.asarray(ref.hit)
    assert h.any()  # probe rays are aimed at the scene
    np.testing.assert_allclose(
        np.asarray(t)[h], np.asarray(ref.dst)[h], rtol=1e-5, atol=1e-6
    )
    same = (np.asarray(tri) == np.asarray(ref.tri))[h]
    assert same.mean() > 0.95
