"""Shared enums, flags, and dispatch-time descriptor structs.

TPU-native rebuild of the reference's config surface: material/falsecolor/
integrator enums (pathtracer.wgsl:105-215), behavior flags
(renderer.rs:284-291), and the dispatch descriptors
PathtraceDesc/AccumulationParams/TileParams/CameraParams/AdvancedParams
(renderer.rs:644-766). The reference bakes MAX_BOUNCES/SAMPLES_PER_PIXEL
as WGSL override constants at pipeline build time (renderer.rs:451-468);
here they are static arguments of the jitted render step, which plays the
same role (one compiled executable per (bounces, spp) combination).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum

import numpy as np

SENTINEL_IDX = np.uint32(0xFFFFFFFF)

# Capacity constants mirroring renderer.rs:296-305. On TPU these are soft
# limits (arrays are flat and concatenated, so there is no binding_array cap);
# they are kept for validate_scene parity.
BVH_MAX_DEPTH = 25
TLAS_MAX_DEPTH = 50
MAX_MESHES = 15000
MAX_ENVS = 10
MAX_TEXTURES = 15000

MIN_ROUGHNESS = 0.03 * 0.03  # pathtracer.wgsl:1263
MAX_VOLUMES = 10  # pathtracer.wgsl:582
MAX_OPACITY_BOUNCES = 128  # pathtracer.wgsl:1264


class MaterialType(IntEnum):
    """Material model selector (renderer.rs:124-136, pathtracer.wgsl:105-112)."""

    MATTE = 0
    GLOSSY = 1
    REFLECTIVE = 2
    TRANSPARENT = 3
    REFRACTIVE = 4
    SUBSURFACE = 5
    VOLUMETRIC = 6
    GLTFPBR = 7


class PathtraceType(IntEnum):
    """Integrator selector (pathtracer.wgsl:211-215)."""

    STANDARD = 0
    MIS = 1
    NAIVE = 2
    DIRECT = 3


class FalsecolorType(IntEnum):
    """AOV selector (pathtracer.wgsl:198-209)."""

    ALBEDO = 0
    NORMALS = 1
    NORMALS_UNSIGNED = 2
    FRONTFACING = 3
    EMISSION = 4
    ROUGHNESS = 5
    METALLIC = 6
    OPACITY = 7
    MAT_TYPE = 8
    IS_DELTA = 9
    INSTANCE = 10
    TRI = 11


@dataclass
class Material:
    """Host-side material megastruct (renderer.rs:138-185), numpy scalars."""

    color: np.ndarray = field(default_factory=lambda: np.array([0, 0, 0, 1], np.float32))
    emission: np.ndarray = field(default_factory=lambda: np.zeros(4, np.float32))
    scattering: np.ndarray = field(default_factory=lambda: np.zeros(4, np.float32))
    mat_type: MaterialType = MaterialType.MATTE
    roughness: float = 0.0
    metallic: float = 0.0
    ior: float = 1.5
    sc_anisotropy: float = 0.0
    tr_depth: float = 0.01
    color_tex_idx: int = int(SENTINEL_IDX)
    emission_tex_idx: int = int(SENTINEL_IDX)
    roughness_tex_idx: int = int(SENTINEL_IDX)
    scattering_tex_idx: int = int(SENTINEL_IDX)
    normal_tex_idx: int = int(SENTINEL_IDX)


@dataclass
class Environment:
    """Environment light (renderer.rs:187-205); transform is a 4x4."""

    emission: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    emission_tex_idx: int = int(SENTINEL_IDX)
    transform: np.ndarray = field(default_factory=lambda: np.eye(4, dtype=np.float32))


@dataclass
class CameraParams:
    """Thin-lens / orthographic camera (renderer.rs:683-705)."""

    is_orthographic: bool = False
    lens: float = 0.05
    film: float = 0.036
    aspect: float = 1.5
    focus: float = 10000.0
    aperture: float = 0.0


@dataclass
class SceneCamera:
    """Camera transform (3,4 frame) + params (lupin_loader SceneCamera)."""

    transform: np.ndarray = field(default_factory=lambda: np.zeros((3, 4), np.float32))
    params: CameraParams = field(default_factory=CameraParams)


@dataclass
class AccumulationParams:
    """Progressive-rendering state (renderer.rs:644-649). When counter == 0
    the previous frame is ignored; otherwise blend weight is 1/counter
    (pathtracer.wgsl:279-285)."""

    accumulate: bool = False
    counter: int = 0


@dataclass
class TileParams:
    """Spatial tiling of one dispatch (renderer.rs:651-670). tile_size is in
    pixels here (the reference counts 4x4 workgroups; on TPU the natural
    granularity is pixels, default 400px matches its 100-workgroup default)."""

    enabled: bool = False
    tile_idx: int = 0
    tile_size: int = 400


@dataclass
class AdvancedParams:
    """Expert knobs (renderer.rs:739-755)."""

    max_radiance: float = 100.0
    rng_seed: int = 0
    ray_epsilon: float = 0.001


@dataclass
class BakedPathtraceParams:
    """Compile-time knobs (renderer.rs:451-468): changing them triggers a
    re-jit, mirroring the reference's pipeline rebuild."""

    max_bounces: int = 8
    samples_per_pixel: int = 5
    # Dispatch-time scene index/finiteness validation (renderer.rs:487-499).
    # XLA lane addressing is bounds-safe by construction, so the WGSL
    # bounds-check toggle maps to this host-side check (once per scene).
    with_runtime_checks: bool = True


@dataclass
class PathtraceDesc:
    """Per-dispatch descriptor (renderer.rs:707-737)."""

    accum_params: AccumulationParams = field(default_factory=AccumulationParams)
    tile_params: TileParams = field(default_factory=TileParams)
    camera_transform: np.ndarray = field(
        default_factory=lambda: np.concatenate(
            [np.eye(3, dtype=np.float32), np.zeros((3, 1), np.float32)], axis=1
        )
    )
    camera_params: CameraParams = field(default_factory=CameraParams)
    pathtrace_type: PathtraceType = PathtraceType.STANDARD
    # Flips a dense-eligible scene onto the wavefront BVH backend for this
    # dispatch (renderer.rs:764, :772 — both backends are always built).
    force_software_bvh: bool = False
    advanced: AdvancedParams = field(default_factory=AdvancedParams)


def get_num_tiles(width: int, height: int, tile_size: int) -> tuple[int, int]:
    """Number of tiles along x/y (renderer.rs:675-681)."""

    ts = max(1, int(tile_size))
    return (-(-width // ts), -(-height // ts))
