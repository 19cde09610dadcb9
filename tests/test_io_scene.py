"""IO + scene flattening tests against the reference's test_scenes corpus."""

import os

import numpy as np
import pytest

from lupinpathtracer_tpu.io import builtin, hdr, ply, yocto_json
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu
from lupinpathtracer_tpu.scene.scene import get_scene_stats, validate_scene

from conftest import REFERENCE_SCENES, reference_scene_path


def test_cornell_box_builder():
    scene, cams = builtin.build_scene_cornell_box()
    stats = get_scene_stats(scene)
    assert stats["num_meshes"] == 8
    assert stats["num_instances"] == 8
    assert stats["num_materials"] == 4
    assert stats["num_mesh_lights"] == 1
    assert stats["num_tris_instanced"] == 36
    assert len(cams) == 1
    assert cams[0].params.lens == pytest.approx(0.035)
    assert cams[0].transform[2, 3] == pytest.approx(-3.9)


def test_cornell_box_flatten():
    scene, _ = builtin.build_scene_cornell_box()
    tpu = build_scene_tpu(scene)
    assert tpu.num_world_tris == 36
    assert not tpu.use_bvh
    assert tpu.num_lights == 1
    # The light is the last instance, 2 triangles, area 0.5*0.5*... = 0.25 total
    assert int(tpu.light_tri_count[0]) == 2
    np.testing.assert_allclose(float(tpu.light_area[0]), 0.25, rtol=1e-5)


def test_ply_load_cornell_floor():
    mesh = ply.load_mesh_ply(
        os.path.join(REFERENCE_SCENES, "cornellbox/shapes/floor.ply")
    )
    assert mesh.positions.shape == (4, 3)
    assert mesh.indices.shape == (2, 3)


def test_ply_load_bunny():
    mesh = ply.load_mesh_ply(
        os.path.join(REFERENCE_SCENES, "materials1/shapes/bunny.ply")
    )
    assert mesh.positions.shape[0] > 1000
    assert mesh.indices.max() < mesh.positions.shape[0]
    assert mesh.normals is not None or True  # presence depends on the asset


@pytest.mark.parametrize("name", ["cornellbox", "materials1", "environments1"])
def test_load_yocto_scene(name):
    scene, cams = yocto_json.load_scene_yoctogl_v24(reference_scene_path(name))
    validate_scene(scene)
    assert len(cams) >= 1
    assert len(scene.instances) >= 1
    tpu = build_scene_tpu(scene)
    assert tpu.num_world_tris > 0


def test_hdr_roundtrip(tmp_path, rng):
    img = (rng.random((17, 23, 3)) * 10.0).astype(np.float32)
    path = tmp_path / "t.hdr"
    hdr.write_hdr(path, img)
    back = hdr.read_hdr(path)
    assert back.shape == img.shape
    # RGBE: 8-bit shared-exponent mantissa, truncated; error bounded by the
    # per-pixel exponent quantum (max channel / 128).
    quantum = img.max(axis=-1, keepdims=True) / 128.0
    assert np.all(np.abs(back - img) <= quantum + 1e-6)


def test_hdr_read_reference_golden():
    golden = os.path.join(REFERENCE_SCENES, "arealights1/render_cam1.hdr")
    img = hdr.read_hdr(golden)
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.shape[0] > 100 and img.shape[1] > 100
    assert np.isfinite(img).all()
    assert img.max() > 0.01


