"""lupinpathtracer_tpu — TPU-native physically-based path tracer.

Public API mirroring the reference's core crate surface (lupin/src/lib.rs):
scene building, accel construction + device upload, the pathtrace /
falsecolor / debug dispatches, tonemapping, and denoising.
"""

from .core.types import (
    AccumulationParams,
    AdvancedParams,
    BakedPathtraceParams,
    CameraParams,
    Environment,
    FalsecolorType,
    Material,
    MaterialType,
    PathtraceDesc,
    PathtraceType,
    SceneCamera,
    TileParams,
    get_num_tiles,
)
from .scene.scene import (
    InstanceCPU,
    MeshCPU,
    SceneCPU,
    TextureCPU,
    get_scene_stats,
    validate_scene,
)
from .scene.flatten import SceneTPU, build_scene_tpu
from .render.renderer import (
    new_accumulation_buffer,
    pathtrace_scene,
    pathtrace_scene_debug,
    pathtrace_scene_falsecolor,
    render_progressive,
)
from .render.tonemap import TonemapDesc, tonemap, tonemap_and_fit_aspect
from .denoise.atrous import DenoiseDesc, denoise

__all__ = [
    "AccumulationParams",
    "AdvancedParams",
    "BakedPathtraceParams",
    "CameraParams",
    "DenoiseDesc",
    "Environment",
    "FalsecolorType",
    "InstanceCPU",
    "Material",
    "MaterialType",
    "MeshCPU",
    "PathtraceDesc",
    "PathtraceType",
    "SceneCPU",
    "SceneCamera",
    "SceneTPU",
    "TextureCPU",
    "TileParams",
    "TonemapDesc",
    "build_scene_tpu",
    "denoise",
    "get_num_tiles",
    "get_scene_stats",
    "new_accumulation_buffer",
    "pathtrace_scene",
    "pathtrace_scene_debug",
    "pathtrace_scene_falsecolor",
    "render_progressive",
    "tonemap",
    "tonemap_and_fit_aspect",
    "validate_scene",
]

__version__ = "0.1.0"
