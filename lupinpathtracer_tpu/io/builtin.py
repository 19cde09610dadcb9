"""Built-in scenes: empty scene and the Yocto Cornell box.

TPU-native rebuild of lupin_loader/src/loader.rs:7-207 (build_scene_empty,
build_scene_cornell_box). Geometry/material/camera values are the Yocto/GL
Cornell-box constants the reference also hardcodes.
"""

from __future__ import annotations

import numpy as np

from ..core import math3d
from ..core.types import CameraParams, Material, SceneCamera
from ..scene.scene import InstanceCPU, MeshCPU, SceneCPU
from ..scene.scene import validate_scene


def build_scene_empty() -> tuple[SceneCPU, list[SceneCamera]]:
    scene = SceneCPU()
    validate_scene(scene)
    return scene, []


def _quad(scene: SceneCPU, verts, indices, mat_idx: int) -> None:
    mesh = scene.add_mesh(
        MeshCPU(
            positions=np.asarray(verts, np.float32),
            indices=np.asarray(indices, np.uint32).reshape(-1, 3),
        )
    )
    scene.add_instance(
        InstanceCPU(frame=math3d.frame_identity(), mesh_idx=mesh, mat_idx=mat_idx)
    )


def build_scene_cornell_box() -> tuple[SceneCPU, list[SceneCamera]]:
    scene = SceneCPU()

    white = scene.add_material(
        Material(color=np.array([0.725, 0.71, 0.68, 1.0], np.float32))
    )
    red = scene.add_material(
        Material(color=np.array([0.63, 0.065, 0.05, 1.0], np.float32))
    )
    green = scene.add_material(
        Material(color=np.array([0.14, 0.45, 0.091, 1.0], np.float32))
    )
    emissive = scene.add_material(
        Material(emission=np.array([17.0, 12.0, 4.0, 0.0], np.float32))
    )

    quad_idx = [0, 1, 2, 2, 3, 0]
    flipped_idx = [0, 2, 1, 2, 0, 3]

    _quad(  # Floor
        scene,
        [[-1, 0, 1], [1, 0, 1], [1, 0, -1], [-1, 0, -1]],
        quad_idx,
        white,
    )
    _quad(  # Ceiling
        scene,
        [[-1, 2, 1], [-1, 2, -1], [1, 2, -1], [1, 2, 1]],
        quad_idx,
        white,
    )
    _quad(  # Backwall
        scene,
        [[-1, 0, 1], [1, 0, 1], [1, 2, 1], [-1, 2, 1]],
        flipped_idx,
        white,
    )
    _quad(  # Rightwall
        scene,
        [[1, 0, -1], [1, 0, 1], [1, 2, 1], [1, 2, -1]],
        quad_idx,
        green,
    )
    _quad(  # Leftwall
        scene,
        [[-1, 0, 1], [-1, 0, -1], [-1, 2, -1], [-1, 2, 1]],
        quad_idx,
        red,
    )

    box_idx = [
        0, 2, 1, 2, 0, 3, 4, 6, 5, 6, 4, 7,
        8, 10, 9, 10, 8, 11, 12, 14, 13, 14, 12, 15,
        16, 18, 17, 18, 16, 19, 20, 22, 21, 22, 20, 23,
    ]
    _quad(  # Shortbox
        scene,
        [
            [0.53, 0.6, -0.75], [0.7, 0.6, -0.17], [0.13, 0.6, -0.0],
            [-0.05, 0.6, -0.57], [-0.05, 0.0, -0.57], [-0.05, 0.6, -0.57],
            [0.13, 0.6, -0.0], [0.13, 0.0, -0.0], [0.53, 0.0, -0.75],
            [0.53, 0.6, -0.75], [-0.05, 0.6, -0.57], [-0.05, 0.0, -0.57],
            [0.7, 0.0, -0.17], [0.7, 0.6, -0.17], [0.53, 0.6, -0.75],
            [0.53, 0.0, -0.75], [0.13, 0.0, -0.0], [0.13, 0.6, -0.0],
            [0.7, 0.6, -0.17], [0.7, 0.0, -0.17], [0.53, 0.0, -0.75],
            [0.7, 0.0, -0.17], [0.13, 0.0, -0.0], [-0.05, 0.0, -0.57],
        ],
        box_idx,
        white,
    )
    _quad(  # Tallbox
        scene,
        [
            [-0.53, 1.2, -0.09], [0.04, 1.2, 0.09], [-0.14, 1.2, 0.67],
            [-0.71, 1.2, 0.49], [-0.53, 0.0, -0.09], [-0.53, 1.2, -0.09],
            [-0.71, 1.2, 0.49], [-0.71, 0.0, 0.49], [-0.71, 0.0, 0.49],
            [-0.71, 1.2, 0.49], [-0.14, 1.2, 0.67], [-0.14, 0.0, 0.67],
            [-0.14, 0.0, 0.67], [-0.14, 1.2, 0.67], [0.04, 1.2, 0.09],
            [0.04, 0.0, 0.09], [0.04, 0.0, 0.09], [0.04, 1.2, 0.09],
            [-0.53, 1.2, -0.09], [-0.53, 0.0, -0.09], [-0.53, 0.0, -0.09],
            [0.04, 0.0, 0.09], [-0.14, 0.0, 0.67], [-0.71, 0.0, 0.49],
        ],
        box_idx,
        white,
    )
    _quad(  # Light
        scene,
        [
            [-0.25, 1.99, -0.25], [-0.25, 1.99, 0.25],
            [0.25, 1.99, 0.25], [0.25, 1.99, -0.25],
        ],
        flipped_idx,
        emissive,
    )

    validate_scene(scene)

    cam = SceneCamera(
        transform=np.array(
            [[1, 0, 0, 0], [0, 1, 0, 1.0], [0, 0, 1, -3.9]], np.float32
        ),
        params=CameraParams(
            is_orthographic=False,
            lens=0.035,
            aperture=0.0,
            focus=3.9,
            film=0.024,
            aspect=1.0,
        ),
    )
    return scene, [cam]
