"""Host-side scene data model.

TPU-native rebuild of the reference's SceneCPU (renderer.rs:61-75) and its
validation/stats helpers (data_structures.rs:876-953). Differences from the
reference, chosen for TPU idiom:

- Meshes own their optional attribute arrays directly (the reference keeps
  parallel `*_array` vectors indexed through MeshInfo because WGPU needs
  one storage buffer per attribute kind; a flat pytree has no such need).
- CPU texture pixels live in the scene object (the reference uploads
  wgpu::Textures separately); flattening builds a single atlas array.
- Instances store the forward (3,4) frame; inverse and normal matrices are
  derived at flatten time (the reference pre-stores the transpose-inverse
  for GPU-layout reasons, renderer.rs:115-121).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..core.types import Environment, Material, MaterialType
from ..core import math3d


@dataclass
class MeshCPU:
    """One mesh's SoA arrays. positions is (V,3) f32; indices is (T,3) u32;
    the attribute arrays are optional ((V,3) normals, (V,2) uv, (V,4) color)."""

    positions: np.ndarray
    indices: np.ndarray
    normals: np.ndarray | None = None
    texcoords: np.ndarray | None = None
    colors: np.ndarray | None = None

    def num_tris(self) -> int:
        return int(self.indices.shape[0])


@dataclass
class InstanceCPU:
    """Placed mesh (renderer.rs:115-121); frame is a (3,4) affine."""

    frame: np.ndarray = field(default_factory=math3d.frame_identity)
    mesh_idx: int = 0
    mat_idx: int = 0


@dataclass
class TextureCPU:
    """Decoded texture: data is (H,W,4) f32. LDR images hold raw unorm values
    (sRGB-encoded for color maps — conversion happens at sample time, matching
    pathtracer.wgsl:1294); HDR images hold linear radiance."""

    data: np.ndarray
    is_hdr: bool = False


@dataclass
class SceneCPU:
    meshes: list[MeshCPU] = field(default_factory=list)
    instances: list[InstanceCPU] = field(default_factory=list)
    materials: list[Material] = field(default_factory=list)
    environments: list[Environment] = field(default_factory=list)
    textures: list[TextureCPU] = field(default_factory=list)

    # -- builder helpers (push_asset pattern, loader.rs) --
    def add_mesh(self, mesh: MeshCPU) -> int:
        self.meshes.append(mesh)
        return len(self.meshes) - 1

    def add_material(self, mat: Material) -> int:
        self.materials.append(mat)
        return len(self.materials) - 1

    def add_instance(self, inst: InstanceCPU) -> int:
        self.instances.append(inst)
        return len(self.instances) - 1

    def add_texture(self, tex: TextureCPU) -> int:
        self.textures.append(tex)
        return len(self.textures) - 1


def validate_scene(scene: SceneCPU) -> None:
    """Consistency asserts (data_structures.rs:876-928)."""

    num_tex = len(scene.textures)
    for i, mesh in enumerate(scene.meshes):
        pos = np.asarray(mesh.positions)
        assert pos.ndim == 2 and pos.shape[1] == 3, f"mesh {i}: positions must be (V,3)"
        idx = np.asarray(mesh.indices)
        assert idx.ndim == 2 and idx.shape[1] == 3, f"mesh {i}: indices must be (T,3)"
        if idx.size:
            assert int(idx.max()) < pos.shape[0], f"mesh {i}: index out of range"
        for name in ("normals", "texcoords", "colors"):
            attr = getattr(mesh, name)
            if attr is not None:
                assert attr.shape[0] == pos.shape[0], (
                    f"mesh {i}: {name} count != vertex count"
                )
    for i, inst in enumerate(scene.instances):
        assert 0 <= inst.mesh_idx < len(scene.meshes), f"instance {i}: bad mesh_idx"
        assert 0 <= inst.mat_idx < len(scene.materials), f"instance {i}: bad mat_idx"
        assert inst.frame.shape == (3, 4), f"instance {i}: frame must be (3,4)"
    for i, mat in enumerate(scene.materials):
        for name in (
            "color_tex_idx",
            "emission_tex_idx",
            "roughness_tex_idx",
            "scattering_tex_idx",
            "normal_tex_idx",
        ):
            t = int(getattr(mat, name)) & 0xFFFFFFFF
            assert t == 0xFFFFFFFF or t < num_tex, f"material {i}: bad {name}"
    for i, env in enumerate(scene.environments):
        t = int(env.emission_tex_idx) & 0xFFFFFFFF
        assert t == 0xFFFFFFFF or t < num_tex, f"environment {i}: bad emission_tex"


def get_scene_stats(scene: SceneCPU) -> dict:
    """Scene statistics (data_structures.rs:940-953)."""

    num_tris_single = sum(m.num_tris() for m in scene.meshes)
    num_tris = sum(scene.meshes[i.mesh_idx].num_tris() for i in scene.instances)
    num_lights = 0
    for inst in scene.instances:
        em = scene.materials[inst.mat_idx].emission
        if np.any(np.asarray(em)[:3] != 0.0) and scene.meshes[inst.mesh_idx].num_tris():
            num_lights += 1
    return {
        "num_meshes": len(scene.meshes),
        "num_instances": len(scene.instances),
        "num_materials": len(scene.materials),
        "num_environments": len(scene.environments),
        "num_textures": len(scene.textures),
        "num_tris_unique": num_tris_single,
        "num_tris_instanced": num_tris,
        "num_mesh_lights": num_lights,
    }
