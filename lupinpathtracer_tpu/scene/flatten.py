"""Scene flattening: SceneCPU -> SceneTPU device pytree.

TPU-native rebuild of the reference's build_accel_structures_and_upload
(data_structures.rs:696-872) and scene bind-group assembly
(renderer.rs:1083-1282). The WGPU design uploads ~7 storage buffers *per
mesh* through `binding_array`s plus texture/sampler arrays; none of that
maps to XLA. Instead everything becomes a handful of flat, concatenated,
statically-shaped arrays:

- all mesh vertex streams concatenated, indices rebased to global vertex ids;
- instances expanded to a world-space triangle soup (v0/e1/e2 SoA) so the
  traversal kernels never gather per-instance transforms — the reference's
  TLAS->BLAS object-space walk (bvh_custom.wgsl:7-110) is replaced by ONE
  world BVH (or a dense MXU intersector for small scenes);
- all textures in one flat pixel atlas with offset/size tables (no hardware
  samplers on TPU; bilinear-repeat is done with gathers);
- lights, triangle alias tables and environment alias tables concatenated
  with offset tables (data_structures.rs:20-113).

The "empty buffer" workarounds of the reference (renderer.rs:51-58) become
static `*_empty` flags on the pytree plus 1-element placeholder arrays.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from ..accel import alias_table as alias_mod
from ..accel import bvh as bvh_mod
from ..core import math3d
from .scene import SceneCPU, validate_scene

# Scenes at or below this many world triangles use the dense MXU intersector
# (one (B,10)x(10,4T) matmul per batch); larger scenes traverse the world BVH.
DEFAULT_DENSE_MAX_TRIS = 2048


@struct.dataclass
class SceneTPU:
    # --- static metadata (compile-time constants) ---
    num_meshes: int = struct.field(pytree_node=False)
    num_instances: int = struct.field(pytree_node=False)
    num_materials: int = struct.field(pytree_node=False)
    num_envs: int = struct.field(pytree_node=False)
    num_lights: int = struct.field(pytree_node=False)
    num_textures: int = struct.field(pytree_node=False)
    num_world_tris: int = struct.field(pytree_node=False)  # unpadded count
    use_bvh: bool = struct.field(pytree_node=False)
    bvh_depth: int = struct.field(pytree_node=False)
    bvh_leaf_size: int = struct.field(pytree_node=False)
    # Superleaf decomposition (accel/superleaf.py): the soup is repacked to
    # sl_count fixed-stride blocks and a condensed top tree drives the
    # wavefront traversal kernel (kernels/pallas_bvh.py). Zero when dense.
    sl_count: int = struct.field(pytree_node=False)
    sl_stride: int = struct.field(pytree_node=False)
    # Two-level (TLAS->BLAS analog): sl_count counts GLOBAL
    # (instance x mesh-superleaf) entries while the soup/W/attr matrices
    # cover msl_count MESH superleaves; gsl_* map global -> (instance,
    # mesh superleaf). Single-level scenes: msl_count == sl_count and the
    # maps are identity/zero.
    two_level: bool = struct.field(pytree_node=False)
    msl_count: int = struct.field(pytree_node=False)
    top_depth: int = struct.field(pytree_node=False)
    top_root_is_leaf: bool = struct.field(pytree_node=False)
    has_alpha: bool = struct.field(pytree_node=False)
    envs_empty: bool = struct.field(pytree_node=False)
    lights_empty: bool = struct.field(pytree_node=False)
    instances_empty: bool = struct.field(pytree_node=False)
    # Static feature flags: the reference compiles one WGSL megakernel with
    # every material branch; under XLA we instead specialize the executable
    # to the material/attribute set the scene actually uses (the analog of
    # its override-constant pipeline bake, renderer.rs:451-468).
    present_mat_types: tuple = struct.field(pytree_node=False)
    any_uv: bool = struct.field(pytree_node=False)
    # Which of the 4 material texture slots (color/emission/roughness/
    # scattering) any used material binds — statically compiles unused
    # slots' atlas fetches out of get_material_point.
    tex_slot_used: tuple = struct.field(pytree_node=False)
    any_vert_normals: bool = struct.field(pytree_node=False)
    any_vert_colors: bool = struct.field(pytree_node=False)
    any_normal_maps: bool = struct.field(pytree_node=False)
    any_volumetric: bool = struct.field(pytree_node=False)
    any_delta: bool = struct.field(pytree_node=False)

    # --- mesh-level arrays (concatenated over meshes) ---
    verts_pos: jnp.ndarray  # (V,3) f32
    verts_normal: jnp.ndarray  # (V,3) f32 (zeros where absent)
    verts_uv: jnp.ndarray  # (V,2) f32
    verts_color: jnp.ndarray  # (V,4) f32 (ones where absent)
    tri_indices: jnp.ndarray  # (Tm,3) i32 global vertex ids
    mesh_has_normals: jnp.ndarray  # (Nm,) i32
    mesh_has_uv: jnp.ndarray  # (Nm,) i32
    mesh_has_color: jnp.ndarray  # (Nm,) i32

    # --- instances ---
    inst_inv: jnp.ndarray  # (I,3,4) f32 world->object
    inst_fwd: jnp.ndarray  # (I,3,4) f32 object->world
    inst_normal_mat: jnp.ndarray  # (I,3,3) f32 inverse-transpose linear part
    inst_mesh: jnp.ndarray  # (I,) i32
    inst_mat: jnp.ndarray  # (I,) i32
    # sign(det(linear part)): intersection runs in world space, so the
    # object-space determinant the reference uses for hit_backside
    # (bvh_custom.wgsl:106) differs by this sign when a transform mirrors
    # (the left-handed conversion C = diag(1,1,-1) always does).
    inst_det_sign: jnp.ndarray  # (I,) f32

    # --- world-space triangle soup (BVH-reordered, padded) ---
    # Everything a hit needs is baked per-triangle at flatten time so the
    # shading stage is one gather per attribute instead of the reference's
    # index->vertex->instance->matrix chain (pathtracer.wgsl:1729-1770).
    # All multi-component tables are COMPONENT-MAJOR (k, Tw): minor-dim-3
    # arrays get a 42x-padded TPU layout (see core/vec3.py), component-major
    # tables tile densely and gather to clean (B,) lanes.
    wt_v0: jnp.ndarray  # (3,Tw) f32
    wt_e1: jnp.ndarray  # (3,Tw) f32
    wt_e2: jnp.ndarray  # (3,Tw) f32
    wt_inst: jnp.ndarray  # (Tw,) i32
    wt_tri: jnp.ndarray  # (Tw,) i32 global triangle id into tri_indices
    wt_mat: jnp.ndarray  # (Tw,) i32 material id
    wt_n0: jnp.ndarray  # (3,Tw) world-space vertex normals (normal-matrix
    wt_n1: jnp.ndarray  # applied, unnormalized — interpolation commutes)
    wt_n2: jnp.ndarray
    wt_gn: jnp.ndarray  # (3,Tw) geometric normal (reference orientation)
    wt_uv0: jnp.ndarray  # (2,Tw)
    wt_uv1: jnp.ndarray
    wt_uv2: jnp.ndarray
    wt_has_uv: jnp.ndarray  # (Tw,) i32
    wt_c0: jnp.ndarray  # (4,Tw) vertex colors (ones when absent)
    wt_c1: jnp.ndarray
    wt_c2: jnp.ndarray
    wt_tan: jnp.ndarray  # (3,Tw) world tangent (for normal mapping)
    wt_bit: jnp.ndarray  # (3,Tw) world bitangent
    # Packed (Tw, ATTR_WIDTH) attribute matrix for the dense Pallas kernel's
    # in-kernel attribute fetch (one-hot MXU select). (1, ATTR_WIDTH) dummy
    # in BVH mode — large scenes fetch via gathers instead.
    wt_attr: jnp.ndarray

    # --- world BVH (single node when dense mode) ---
    bvh_min: jnp.ndarray  # (3,N) f32
    bvh_max: jnp.ndarray  # (3,N) f32
    bvh_first: jnp.ndarray  # (N,) i32
    bvh_count: jnp.ndarray  # (N,) i32
    # Condensed top-tree row table, bf16 (rows_pad, TOP_COLS); (1,1) dummy
    # in dense mode.
    top_tab: jnp.ndarray
    # Sub-chunk AABBs (n_sl, NSUB, 8) f32 [lo3, hi3, used, 0] for the packet
    # kernel's masked mini-visits; (1, NSUB, 8) dummy when unused.
    sl_sub: jnp.ndarray
    gsl_inst: jnp.ndarray  # (G,) i32 instance per global superleaf
    gsl_msl: jnp.ndarray  # (G,) i32 mesh superleaf per global superleaf
    # (G,16) f32 [msl, inst, inst_inv(12), 0, 0] — HBM-streamed per-leaf
    # metadata for the packet kernel's large-instance two-level mode;
    # (1,16) dummy on single-level scenes.
    gsl_meta: jnp.ndarray

    # --- materials SoA (component-major) ---
    mat_color: jnp.ndarray  # (4,M)
    mat_emission: jnp.ndarray  # (3,M)
    mat_scattering: jnp.ndarray  # (3,M)
    mat_type: jnp.ndarray  # (M,) i32
    mat_roughness: jnp.ndarray  # (M,)
    mat_metallic: jnp.ndarray  # (M,)
    mat_ior: jnp.ndarray  # (M,)
    mat_sc_anisotropy: jnp.ndarray  # (M,)
    mat_tr_depth: jnp.ndarray  # (M,)
    mat_tex: jnp.ndarray  # (5,M) i32, -1 = none: color/emission/roughness/scattering/normal

    # --- texture atlas ---
    tex_data: jnp.ndarray  # (4,P) f32 flattened pixels, component-major
    # Packed RGBA8 atlas (P,) u32 — bit-exact for 8-bit-sourced textures;
    # material fetches use it when every material-referenced texture is LDR
    # (mat_tex_ldr), cutting a bilinear fetch from 16 lane gathers to 4.
    tex_data_u32: jnp.ndarray
    mat_tex_ldr: bool = struct.field(pytree_node=False)
    tex_offset: jnp.ndarray  # (Nt,) i32
    tex_width: jnp.ndarray  # (Nt,) i32
    tex_height: jnp.ndarray  # (Nt,) i32

    # --- environments ---
    env_emission: jnp.ndarray  # (E,3)
    env_tex: jnp.ndarray  # (E,) i32 (-1 = none)
    env_rot: jnp.ndarray  # (E,3,3) rotation part of the env transform

    # --- lights + alias tables ---
    light_inst: jnp.ndarray  # (L,) i32
    light_area: jnp.ndarray  # (L,) f32 (object-space, as in data_structures.rs:57)
    la_prob: jnp.ndarray  # (A,) f32 concatenated per-light triangle tables
    la_thresh: jnp.ndarray  # (A,)
    la_alias: jnp.ndarray  # (A,) i32
    light_alias_offset: jnp.ndarray  # (L,) i32
    light_alias_size: jnp.ndarray  # (L,) i32
    ea_prob: jnp.ndarray  # (EA,) concatenated per-env pixel tables
    ea_thresh: jnp.ndarray  # (EA,)
    ea_alias: jnp.ndarray  # (EA,) i32
    env_alias_offset: jnp.ndarray  # (E,) i32

    # --- light triangles in world space (linear order, for NEE + pdf) ---
    lt_v0: jnp.ndarray  # (3,Tl)
    lt_e1: jnp.ndarray  # (3,Tl)
    lt_e2: jnp.ndarray  # (3,Tl)
    lt_light: jnp.ndarray  # (Tl,) i32 owning light index
    light_tri_offset: jnp.ndarray  # (L,) i32 into lt_* arrays
    light_tri_count: jnp.ndarray  # (L,) i32

    # Per-env "has a texture" as a STATIC tuple: render/lights.py gates
    # whole alias-table sampling blocks on it (a textureless env's alias
    # segment has one entry — picking into it with another texture's
    # dimensions reads out of segment and wastes a full pick per lane).
    env_has_tex: tuple = struct.field(pytree_node=False, default=())


def _pad_rows(a: np.ndarray, n: int) -> np.ndarray:
    if a.shape[0] >= n:
        return a
    pad = np.zeros((n - a.shape[0],) + a.shape[1:], a.dtype)
    return np.concatenate([a, pad], axis=0)


def _at_least_one(a: np.ndarray) -> np.ndarray:
    return a if a.shape[0] > 0 else np.zeros((1,) + a.shape[1:], a.dtype)


def build_scene_tpu(
    scene: SceneCPU,
    dense_max_tris: int = DEFAULT_DENSE_MAX_TRIS,
    bvh_leaf_size: int = 4,
    validate: bool = True,
    two_level: bool | None = None,
    sl_stride_opt: int | None = None,
) -> SceneTPU:
    """Flatten + build acceleration structures + move to device.

    two_level=None auto-enables the TLAS->BLAS analog (mesh-space
    superleaves shared across instances; see bvh_custom.wgsl:7-110) when
    instance expansion would multiply triangle memory >=4x; True/False
    force it. Two-level device memory scales with UNIQUE mesh triangles."""

    if validate:
        validate_scene(scene)

    nm = len(scene.meshes)
    ni = len(scene.instances)
    nmat = len(scene.materials)
    ne = len(scene.environments)
    nt = len(scene.textures)

    mesh_tris = [m.indices.shape[0] for m in scene.meshes]
    exp_tris = sum(mesh_tris[i.mesh_idx] for i in scene.instances)
    used_mesh_ids = sorted({i.mesh_idx for i in scene.instances})
    uniq_tris = sum(mesh_tris[m] for m in used_mesh_ids)
    if two_level is None:
        two_level = (
            exp_tris > dense_max_tris
            and ni > 0
            and exp_tris >= 4 * max(uniq_tris, 1)
        )
    two_level = bool(two_level) and ni > 0 and uniq_tris > 0

    # ---- mesh-level concatenation ----
    v_off = np.zeros(nm + 1, np.int64)
    t_off = np.zeros(nm + 1, np.int64)
    for i, m in enumerate(scene.meshes):
        v_off[i + 1] = v_off[i] + m.positions.shape[0]
        t_off[i + 1] = t_off[i] + m.indices.shape[0]
    V = int(v_off[-1])
    Tm = int(t_off[-1])

    verts_pos = np.zeros((max(V, 1), 3), np.float32)
    verts_normal = np.zeros((max(V, 1), 3), np.float32)
    verts_uv = np.zeros((max(V, 1), 2), np.float32)
    verts_color = np.ones((max(V, 1), 4), np.float32)
    tri_indices = np.zeros((max(Tm, 1), 3), np.int32)
    mesh_has_normals = np.zeros(max(nm, 1), np.int32)
    mesh_has_uv = np.zeros(max(nm, 1), np.int32)
    mesh_has_color = np.zeros(max(nm, 1), np.int32)

    for i, m in enumerate(scene.meshes):
        a, b = int(v_off[i]), int(v_off[i + 1])
        verts_pos[a:b] = m.positions
        if m.normals is not None:
            verts_normal[a:b] = m.normals[:, :3]
            mesh_has_normals[i] = 1
        if m.texcoords is not None:
            verts_uv[a:b] = m.texcoords
            mesh_has_uv[i] = 1
        if m.colors is not None:
            verts_color[a:b] = m.colors
            mesh_has_color[i] = 1
        ta, tb = int(t_off[i]), int(t_off[i + 1])
        tri_indices[ta:tb] = m.indices.astype(np.int64) + a

    # ---- instances ----
    inst_inv = np.zeros((max(ni, 1), 3, 4), np.float32)
    inst_fwd = np.zeros((max(ni, 1), 3, 4), np.float32)
    inst_nrm = np.zeros((max(ni, 1), 3, 3), np.float32)
    inst_mesh = np.zeros(max(ni, 1), np.int32)
    inst_mat = np.zeros(max(ni, 1), np.int32)
    inst_det_sign = np.ones(max(ni, 1), np.float32)
    if ni:
        # Batched equivalents of math3d.frame_inverse / normal_matrix /
        # det-sign: 3 np.linalg calls per instance dominated flatten past
        # ~100k instances. Matches the scalar helpers: inverse in f64,
        # cast f32, translation via the f32 inverse.
        frames_all = np.stack(
            [inst.frame for inst in scene.instances]
        ).astype(np.float32)
        inst_fwd[:ni] = frames_all
        a64 = frames_all[:, :, :3].astype(np.float64)
        inv64 = np.linalg.inv(a64)
        rinv = inv64.astype(np.float32)
        inst_inv[:ni, :, :3] = rinv
        inst_inv[:ni, :, 3] = -np.einsum(
            "iab,ib->ia", rinv, frames_all[:, :, 3]
        )
        inst_nrm[:ni] = np.transpose(inv64, (0, 2, 1)).astype(np.float32)
        inst_mesh[:ni] = [inst.mesh_idx for inst in scene.instances]
        inst_mat[:ni] = [inst.mat_idx for inst in scene.instances]
        inst_det_sign[:ni] = np.where(
            np.linalg.det(a64) < 0.0, -1.0, 1.0
        ).astype(np.float32)

    # ---- world-space triangle soup with baked per-tri shading attributes ----
    def _nrm(a):
        return a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-20)

    cols = {
        k: []
        for k in (
            "v0", "e1", "e2", "inst", "tri", "mat",
            "n0", "n1", "n2", "gn",
            "uv0", "uv1", "uv2", "has_uv",
            "c0", "c1", "c2", "tan", "bit",
        )
    }
    if two_level:
        # Mesh-space soup over UNIQUE meshes; instances become per-work-item
        # ray/normal transforms in the wavefront kernels. Material and
        # instance columns are per-instance and get overridden there.
        from .scene import InstanceCPU as _ICPU

        _ident = np.eye(3, 4, dtype=np.float32)
        soup_iter = [
            (m, _ICPU(frame=_ident, mesh_idx=m, mat_idx=0))
            for m in used_mesh_ids
        ]
    else:
        soup_iter = list(enumerate(scene.instances))
    for i, inst in soup_iter:
        m = scene.meshes[inst.mesh_idx]
        nt_mesh = m.indices.shape[0]
        if nt_mesh == 0:
            continue
        wp = math3d.transform_points(inst.frame, m.positions)
        tri = m.indices.astype(np.int64)
        v0 = wp[tri[:, 0]]
        v1 = wp[tri[:, 1]]
        v2 = wp[tri[:, 2]]
        cols["v0"].append(v0)
        cols["e1"].append(v1 - v0)
        cols["e2"].append(v2 - v0)
        cols["inst"].append(np.full(nt_mesh, i, np.int32))
        cols["tri"].append(
            (np.arange(nt_mesh, dtype=np.int64) + t_off[inst.mesh_idx]).astype(np.int32)
        )
        cols["mat"].append(np.full(nt_mesh, inst.mat_idx, np.int32))

        nrm_mat = math3d.normal_matrix(inst.frame)
        p0 = m.positions[tri[:, 0]]
        p1 = m.positions[tri[:, 1]]
        p2 = m.positions[tri[:, 2]]
        # compute_tri_geom_normal (pathtracer.wgsl:2561-2576): object-space
        # cross(v2-v0, v1-v0) through the inverse-transpose.
        gn = _nrm(_nrm(np.cross(p2 - p0, p1 - p0)) @ nrm_mat.T)
        cols["gn"].append(gn)
        if m.normals is not None:
            nw = m.normals[:, :3] @ nrm_mat.T  # unnormalized; interp commutes
            cols["n0"].append(nw[tri[:, 0]])
            cols["n1"].append(nw[tri[:, 1]])
            cols["n2"].append(nw[tri[:, 2]])
        else:
            cols["n0"].append(gn)
            cols["n1"].append(gn)
            cols["n2"].append(gn)
        if m.texcoords is not None:
            cols["uv0"].append(m.texcoords[tri[:, 0]])
            cols["uv1"].append(m.texcoords[tri[:, 1]])
            cols["uv2"].append(m.texcoords[tri[:, 2]])
            cols["has_uv"].append(np.ones(nt_mesh, np.int32))
            # Per-tri tangent frame (pathtracer.wgsl:1692-1727).
            t0 = m.texcoords[tri[:, 0]]
            t1 = m.texcoords[tri[:, 1]]
            t2 = m.texcoords[tri[:, 2]]
            p = p1 - p0
            q = p2 - p0
            sx = t1[:, 0] - t0[:, 0]
            sy = t2[:, 0] - t0[:, 0]
            tx = t1[:, 1] - t0[:, 1]
            ty = t2[:, 1] - t0[:, 1]
            div = sx * ty - sy * tx
            safe = np.where(div != 0.0, div, 1.0)[:, None]
            tan_l = np.where(
                (div != 0.0)[:, None],
                (ty[:, None] * p - tx[:, None] * q) / safe,
                np.array([1.0, 0.0, 0.0], np.float32),
            )
            bit_l = np.where(
                (div != 0.0)[:, None],
                (sx[:, None] * q - sy[:, None] * p) / safe,
                np.array([0.0, 1.0, 0.0], np.float32),
            )
            cols["tan"].append(_nrm(tan_l @ nrm_mat.T))
            cols["bit"].append(_nrm(bit_l @ nrm_mat.T))
        else:
            cols["uv0"].append(np.zeros((nt_mesh, 2), np.float32))
            cols["uv1"].append(np.zeros((nt_mesh, 2), np.float32))
            cols["uv2"].append(np.zeros((nt_mesh, 2), np.float32))
            cols["has_uv"].append(np.zeros(nt_mesh, np.int32))
            cols["tan"].append(_nrm(np.broadcast_to(nrm_mat.T[0], (nt_mesh, 3))))
            cols["bit"].append(_nrm(np.broadcast_to(nrm_mat.T[1], (nt_mesh, 3))))
        if m.colors is not None:
            cols["c0"].append(m.colors[tri[:, 0]])
            cols["c1"].append(m.colors[tri[:, 1]])
            cols["c2"].append(m.colors[tri[:, 2]])
        else:
            cols["c0"].append(np.ones((nt_mesh, 4), np.float32))
            cols["c1"].append(np.ones((nt_mesh, 4), np.float32))
            cols["c2"].append(np.ones((nt_mesh, 4), np.float32))

    def _cat(name, width, dtype=np.float32):
        if cols[name]:
            return np.concatenate(cols[name]).astype(dtype)
        shape = (0,) if width == 0 else (0, width)
        return np.zeros(shape, dtype)

    wt = {
        "v0": _cat("v0", 3), "e1": _cat("e1", 3), "e2": _cat("e2", 3),
        "inst": _cat("inst", 0, np.int32), "tri": _cat("tri", 0, np.int32),
        "mat": _cat("mat", 0, np.int32),
        "n0": _cat("n0", 3), "n1": _cat("n1", 3), "n2": _cat("n2", 3),
        "gn": _cat("gn", 3),
        "uv0": _cat("uv0", 2), "uv1": _cat("uv1", 2), "uv2": _cat("uv2", 2),
        "has_uv": _cat("has_uv", 0, np.int32),
        "c0": _cat("c0", 4), "c1": _cat("c1", 4), "c2": _cat("c2", 4),
        "tan": _cat("tan", 3), "bit": _cat("bit", 3),
    }
    wt_v0, wt_e1, wt_e2 = wt["v0"], wt["e1"], wt["e2"]
    Tw = wt_v0.shape[0]

    # ---- lights + alias tables (object-space areas, data_structures.rs:20-113) ----
    light_inst_l, light_area_l = [], []
    la_prob_l, la_thresh_l, la_alias_l = [], [], []
    light_alias_offset_l, light_alias_size_l = [], []
    lt_v0_l, lt_e1_l, lt_e2_l, lt_light_l = [], [], [], []
    light_tri_offset_l, light_tri_count_l = [], []
    a_cursor = 0
    t_cursor = 0
    for i, inst in enumerate(scene.instances):
        mat = scene.materials[inst.mat_idx]
        mesh = scene.meshes[inst.mesh_idx]
        if not np.any(np.asarray(mat.emission)[:3] != 0.0):
            continue
        if mesh.indices.shape[0] == 0:
            continue
        tri = mesh.indices.astype(np.int64)
        p0 = mesh.positions[tri[:, 0]]
        p1 = mesh.positions[tri[:, 1]]
        p2 = mesh.positions[tri[:, 2]]
        areas = 0.5 * np.linalg.norm(np.cross(p1 - p0, p2 - p0), axis=1)
        total = float(areas.sum())
        if total <= 0.0:
            continue
        prob, thresh, alias = alias_mod.build_alias_table(areas)
        light_idx = len(light_inst_l)
        light_inst_l.append(i)
        light_area_l.append(total)
        la_prob_l.append(prob)
        la_thresh_l.append(thresh)
        la_alias_l.append(alias.astype(np.int32))
        light_alias_offset_l.append(a_cursor)
        light_alias_size_l.append(prob.shape[0])
        a_cursor += prob.shape[0]
        # world-space light triangles, linear order
        wp0 = math3d.transform_points(inst.frame, p0)
        wp1 = math3d.transform_points(inst.frame, p1)
        wp2 = math3d.transform_points(inst.frame, p2)
        lt_v0_l.append(wp0.astype(np.float32))
        lt_e1_l.append((wp1 - wp0).astype(np.float32))
        lt_e2_l.append((wp2 - wp0).astype(np.float32))
        lt_light_l.append(np.full(tri.shape[0], light_idx, np.int32))
        light_tri_offset_l.append(t_cursor)
        light_tri_count_l.append(tri.shape[0])
        t_cursor += tri.shape[0]
    nl = len(light_inst_l)

    # ---- environment alias tables (sin-latitude weighting, :65-98) ----
    ea_prob_l, ea_thresh_l, ea_alias_l, env_alias_offset_l = [], [], [], []
    ea_cursor = 0
    env_emission = np.zeros((max(ne, 1), 3), np.float32)
    env_tex = np.full(max(ne, 1), -1, np.int32)
    env_rot = np.tile(np.eye(3, dtype=np.float32), (max(ne, 1), 1, 1))
    for e, env in enumerate(scene.environments):
        env_emission[e] = np.asarray(env.emission, np.float32)[:3]
        ti = int(env.emission_tex_idx) & 0xFFFFFFFF
        scale = env_emission[e]
        if ti != 0xFFFFFFFF:
            env_tex[e] = ti
            pix = scene.textures[ti].data  # (H,W,4) raw values
        else:
            pix = np.ones((1, 1, 4), np.float32)
        env_rot[e] = np.asarray(env.transform, np.float32)[:3, :3]
        h, w = pix.shape[:2]
        ys = (np.arange(h, dtype=np.float32) + 0.5) * np.pi / h
        pe = np.max(pix[..., :3] * scale[None, None, :], axis=-1)
        weights = pe * np.sin(ys)[:, None]
        if not np.any(scale > 0.0):
            weights = np.ones_like(weights)
        prob, thresh, alias = alias_mod.build_alias_table(weights.ravel())
        if prob.shape[0] == 0:  # all-zero emission texture: uniform fallback
            prob, thresh, alias = alias_mod.build_alias_table(
                np.ones(h * w, np.float32)
            )
        ea_prob_l.append(prob)
        ea_thresh_l.append(thresh)
        ea_alias_l.append(alias.astype(np.int32))
        env_alias_offset_l.append(ea_cursor)
        ea_cursor += prob.shape[0]

    # ---- world BVH + superleaf decomposition ----
    use_bvh = two_level or Tw > dense_max_tris
    sl_count = 0
    sl_stride = 0
    msl_count = 0
    top_depth = 1
    top_root_is_leaf = False
    top_tab = np.zeros((1, 1), np.float32)
    sl_sub_arr = np.zeros((1, 8, 8), np.float32)  # (1, NSUB, 8) dummy
    gsl_inst = np.zeros(1, np.int32)
    gsl_msl = np.zeros(1, np.int32)
    if two_level:
        # Two-level analog of the reference's TLAS->BLAS walk
        # (bvh_custom.wgsl:7-110; data_structures.rs:545-641): mesh-space
        # superleaves built ONCE per unique mesh, a condensed top tree over
        # every (instance x mesh-superleaf) world AABB, and per-work-item
        # ray transforms in the pair kernel (unnormalized direction keeps t
        # world-scaled, bvh_custom.wgsl:30-35).
        from ..accel import superleaf as sl_mod

        if sl_stride_opt:
            stride = sl_stride_opt
        else:
            stride = sl_mod.pick_stride(Tw)
            # The top table scales with G = sum over instances of their
            # mesh's superleaf count, NOT with unique mesh triangles:
            # grow the stride until the estimate fits the VMEM-resident
            # fast path (pick_stride(Tw) alone parked every large
            # instanced scene in the "raise the stride" warning below
            # instead of self-tuning).
            tri_of_inst = np.array(
                [mesh_tris[inst.mesh_idx] for inst in scene.instances],
                np.int64,
            )
            while stride < 8192:
                g_now = int(np.sum(-(-tri_of_inst // stride)))
                g_next = int(np.sum(-(-tri_of_inst // (stride * 2))))
                # Stop when the table fits — or when doubling no longer
                # shrinks it (instance-count-bound scenes of small meshes:
                # growing the stride only inflated gref*stride+lane
                # triangle ids toward i32 overflow for nothing).
                if g_now <= 262144 or g_next >= g_now:
                    break
                stride *= 2
        orders, valids = [], []
        msl_lo_l, msl_hi_l, msl_sub_l = [], [], []
        msl_of_mesh = {}
        off = 0
        cursor = 0
        for m in used_mesh_ids:
            ntm = mesh_tris[m]
            if ntm == 0:
                msl_of_mesh[m] = (cursor, 0)
                continue
            lo_m, hi_m = bvh_mod.tri_bounds(
                wt_v0[off : off + ntm],
                wt_v0[off : off + ntm] + wt_e1[off : off + ntm],
                wt_v0[off : off + ntm] + wt_e2[off : off + ntm],
            )
            tree_m = bvh_mod.build_bvh(lo_m, hi_m, max_leaf_size=bvh_leaf_size)
            sls_m = sl_mod.build_superleaves(
                tree_m, ntm, stride=stride, tri_lo=lo_m, tri_hi=hi_m
            )
            orders.append(sls_m.order.astype(np.int64) + off)
            valids.append(sls_m.valid)
            msl_lo_l.append(sls_m.sl_lo)
            msl_hi_l.append(sls_m.sl_hi)
            msl_sub_l.append(sls_m.sl_sub)
            msl_of_mesh[m] = (cursor, sls_m.sl_count)
            cursor += sls_m.sl_count
            off += ntm
        order = np.concatenate(orders)
        valid = np.concatenate(valids)
        for k in wt:
            wt[k] = wt[k][order]
        wt["e1"][~valid] = 0.0
        wt["e2"][~valid] = 0.0
        msl_count = cursor
        msl_lo = np.concatenate(msl_lo_l)
        msl_hi = np.concatenate(msl_hi_l)
        # Mesh-space sub-chunk AABBs, indexed by MESH superleaf (the packet
        # kernel tests them with instance-transformed rays).
        sl_sub_arr = np.concatenate(msl_sub_l)

        # Vectorized (instance x mesh-superleaf) expansion: a Python loop
        # over G pairs dominates flatten time past ~100k instances. The
        # 8-corner transform matches math3d.transform_aabb (base.rs:
        # 1113-1134); bf16 outward rounding in build_top_table keeps the
        # result conservative.
        frames = frames_all  # (ni, 3, 4) f32 — two_level implies ni > 0
        offs = np.array(
            [msl_of_mesh[inst.mesh_idx][0] for inst in scene.instances],
            np.int64,
        )
        cnts = np.array(
            [msl_of_mesh[inst.mesh_idx][1] for inst in scene.instances],
            np.int64,
        )
        g_inst = np.repeat(np.arange(ni, dtype=np.int64), cnts)
        G = int(g_inst.shape[0])
        start = np.cumsum(cnts) - cnts
        g_msl = offs[g_inst] + (np.arange(G, dtype=np.int64) - start[g_inst])
        A = frames[g_inst, :, :3]  # (G,3,3)
        tvec = frames[g_inst, :, 3]  # (G,3)
        corner_mask = np.array(
            [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
            np.float32,
        )  # (8,3)
        lo_g = msl_lo[g_msl]
        hi_g = msl_hi[g_msl]
        corners = (
            lo_g[:, None, :] * (1.0 - corner_mask)
            + hi_g[:, None, :] * corner_mask
        )  # (G,8,3)
        tc = np.einsum("gij,gcj->gci", A, corners) + tvec[:, None, :]
        g_lo = tc.min(axis=1).astype(np.float32)
        g_hi = tc.max(axis=1).astype(np.float32)
        # Child refs are three 8-bit bf16 factors -> 16.7M addressable
        # (renderer.rs:317-319's 1M-instance envelope fits). The VMEM-
        # resident row table is the practical per-dispatch bound: ~260k
        # internal rows = ~10 MB of the ~16 MB VMEM.
        assert 1 <= G < (1 << 24), (
            f"two-level top tree: {G} instance-superleaves exceeds the "
            "3-factor reference encoding"
        )
        # Padded-soup triangle ids are gref*stride + lane in i32 (both
        # traversal backends); an overflowing encoding returns hits with
        # silently wrong instance/attribute bindings (caught at 1M
        # instances x stride 8192).
        assert G * stride <= 2**31 - 1, (
            f"two-level triangle ids overflow i32: {G} instance-superleaves"
            f" x stride {stride}; pass a smaller sl_stride_opt"
        )
        if G > 262144:
            import warnings

            warnings.warn(
                f"two-level top table has {G} rows (~{G * 40 / 2 ** 20:.0f} MB)"
                " — beyond the VMEM-resident fast path; traversal will be"
                " slow. Raise the superleaf stride.",
                stacklevel=2,
            )
        gsl_inst = np.asarray(g_inst, np.int32)
        gsl_msl = np.asarray(g_msl, np.int32)
        top_tab, _rows, top_root_is_leaf, top_depth = sl_mod.build_top_table(
            np.asarray(g_lo, np.float32), np.asarray(g_hi, np.float32)
        )
        sl_count = G
        sl_stride = stride
        Tw_padded = order.shape[0]
        # No jnp masked-stack fallback for two-level: placeholders.
        bvh_min = np.zeros((1, 3), np.float32)
        bvh_max = np.zeros((1, 3), np.float32)
        bvh_first = np.zeros(1, np.int32)
        bvh_count = np.zeros(1, np.int32)
        bvh_depth = 1
    elif Tw > 0:
        # Superleaf tables are built for EVERY single-level scene — dense
        # scenes included — so both traversal backends exist and
        # PathtraceDesc.force_software_bvh can flip per dispatch, matching
        # the reference's build_sw_and_hw + per-dispatch pipeline selection
        # (data_structures.rs:694-699, renderer.rs:764, :772).
        from ..accel import superleaf as sl_mod

        lo, hi = bvh_mod.tri_bounds(wt_v0, wt_v0 + wt_e1, wt_v0 + wt_e2)
        tree = bvh_mod.build_bvh(lo, hi, max_leaf_size=bvh_leaf_size)
        sls = sl_mod.build_superleaves(
            tree, Tw, stride=sl_stride_opt, tri_lo=lo, tri_hi=hi
        )
        # Repack the soup into fixed-stride superleaf blocks (the wavefront
        # kernel addresses a superleaf's triangles purely by its id).
        order = sls.order.astype(np.int64)
        for k in wt:
            wt[k] = wt[k][order]
        # Degenerate the padding rows so they can never report a hit
        # (det = 0 -> invalid in every intersector).
        inval = ~sls.valid
        wt["e1"][inval] = 0.0
        wt["e2"][inval] = 0.0
        # Remap the legacy (CPU/jnp) traversal's leaf ranges into the
        # repacked soup: a SAH leaf is inside one superleaf, so its range
        # stays contiguous.
        leaf = tree.tri_count > 0
        bvh_first = tree.first_or_begin.copy()
        bvh_first[leaf] = sls.bvhpos_to_padded[tree.first_or_begin[leaf]]
        bvh_min, bvh_max = tree.aabb_min, tree.aabb_max
        bvh_count = tree.tri_count
        bvh_depth = tree.depth
        sl_count = sls.sl_count
        sl_stride = sls.stride
        msl_count = sls.sl_count
        # Identity maps: single-level scenes ARE their own mesh space.
        gsl_inst = np.zeros(max(sl_count, 1), np.int32)
        gsl_msl = np.arange(max(sl_count, 1), dtype=np.int32)
        top_depth = sls.top_depth
        top_root_is_leaf = sls.top_root_is_leaf
        top_tab = sls.top_tab
        if sls.sl_sub is not None:
            sl_sub_arr = sls.sl_sub
        Tw_padded = sls.order.shape[0]
    else:
        bvh_min = np.zeros((1, 3), np.float32)
        bvh_max = np.zeros((1, 3), np.float32)
        bvh_first = np.zeros(1, np.int32)
        bvh_count = np.array([Tw], np.int32)
        bvh_depth = 1
        Tw_padded = Tw

    # Pad the triangle soup: to a lane multiple for the dense MXU kernel, plus
    # slack so leaf-block gathers (begin + leaf_size) never run off the end.
    pad_to = max(((Tw_padded + 127) // 128) * 128, 128) + bvh_leaf_size
    for k in wt:
        wt[k] = _pad_rows(wt[k], pad_to)
    wt_v0, wt_e1, wt_e2 = wt["v0"], wt["e1"], wt["e2"]

    # ---- materials ----
    mat_color = np.zeros((max(nmat, 1), 4), np.float32)
    mat_color[:, 3] = 1.0
    mat_emission = np.zeros((max(nmat, 1), 3), np.float32)
    mat_scattering = np.zeros((max(nmat, 1), 3), np.float32)
    mat_type = np.zeros(max(nmat, 1), np.int32)
    mat_roughness = np.zeros(max(nmat, 1), np.float32)
    mat_metallic = np.zeros(max(nmat, 1), np.float32)
    mat_ior = np.full(max(nmat, 1), 1.5, np.float32)
    mat_aniso = np.zeros(max(nmat, 1), np.float32)
    mat_trd = np.full(max(nmat, 1), 0.01, np.float32)
    mat_tex = np.full((max(nmat, 1), 5), -1, np.int32)
    for i, mat in enumerate(scene.materials):
        mat_color[i] = np.asarray(mat.color, np.float32)
        mat_emission[i] = np.asarray(mat.emission, np.float32)[:3]
        mat_scattering[i] = np.asarray(mat.scattering, np.float32)[:3]
        mat_type[i] = int(mat.mat_type)
        mat_roughness[i] = mat.roughness
        mat_metallic[i] = mat.metallic
        mat_ior[i] = mat.ior
        mat_aniso[i] = mat.sc_anisotropy
        mat_trd[i] = mat.tr_depth
        for k, name in enumerate(
            (
                "color_tex_idx",
                "emission_tex_idx",
                "roughness_tex_idx",
                "scattering_tex_idx",
                "normal_tex_idx",
            )
        ):
            t = int(getattr(mat, name)) & 0xFFFFFFFF
            mat_tex[i, k] = -1 if t == 0xFFFFFFFF else t

    # ---- texture atlas ----
    tex_offset = np.zeros(max(nt, 1), np.int32)
    tex_w = np.ones(max(nt, 1), np.int32)
    tex_h = np.ones(max(nt, 1), np.int32)
    tex_is_ldr = np.zeros(max(nt, 1), bool)
    if nt:
        chunks = []
        cursor = 0
        for i, tex in enumerate(scene.textures):
            h, w = tex.data.shape[:2]
            tex_offset[i] = cursor
            tex_w[i] = w
            tex_h[i] = h
            d = tex.data.reshape(-1, 4).astype(np.float32)
            chunks.append(d)
            # 8-bit-exact in [0,1]: the packed u32 atlas reproduces it
            # bit-for-bit (PNG/JPG loads are k/255).
            q = np.round(d * 255.0)
            tex_is_ldr[i] = bool(
                (d >= 0.0).all() and (d <= 1.0).all()
                and np.array_equal(q / 255.0, d)
            )
            cursor += h * w
        tex_data = np.concatenate(chunks, axis=0)
    else:
        tex_data = np.ones((1, 4), np.float32)

    # ---- alpha usage (gates the stochastic alpha-skip loop) ----
    # Scanned once per USED material/mesh, not per instance: a full
    # texture-alpha .min() per instance made flatten O(instances x
    # texture pixels) on exactly the 100k-instance scenes this round
    # vectorized everything else for.
    has_alpha = False
    for mi in {inst.mat_idx for inst in scene.instances}:
        mat = scene.materials[mi]
        if float(np.asarray(mat.color)[3]) < 1.0:
            has_alpha = True
        t = int(mat.color_tex_idx) & 0xFFFFFFFF
        if (
            t != 0xFFFFFFFF and nt
            and float(scene.textures[t].data[..., 3].min()) < 1.0
        ):
            has_alpha = True
    for mi in {inst.mesh_idx for inst in scene.instances}:
        mesh = scene.meshes[mi]
        if mesh.colors is not None and float(mesh.colors[:, 3].min()) < 1.0:
            has_alpha = True

    # ---- packed attribute matrix (dense Pallas kernel's in-kernel fetch;
    # the BVH wavefront's attr_fetch reads the same rows per superleaf) ----
    if Tw > 0:
        from ..kernels import pallas_intersect as pk

        Tp = wt["v0"].shape[0]
        A = np.zeros((Tp, pk.ATTR_WIDTH), np.float32)
        A[:, pk.ATTR_N0] = wt["n0"]
        A[:, pk.ATTR_N1] = wt["n1"]
        A[:, pk.ATTR_N2] = wt["n2"]
        A[:, pk.ATTR_GN] = wt["gn"]
        A[:, pk.ATTR_UV0] = wt["uv0"]
        A[:, pk.ATTR_UV1] = wt["uv1"]
        A[:, pk.ATTR_UV2] = wt["uv2"]
        A[:, pk.ATTR_HAS_UV] = wt["has_uv"]
        A[:, pk.ATTR_C0] = wt["c0"]
        A[:, pk.ATTR_C1] = wt["c1"]
        A[:, pk.ATTR_C2] = wt["c2"]
        A[:, pk.ATTR_TAN] = wt["tan"]
        A[:, pk.ATTR_BIT] = wt["bit"]
        mid = wt["mat"].astype(np.int64)
        A[:, pk.ATTR_MAT_COLOR] = mat_color[mid]
        A[:, pk.ATTR_MAT_EMISSION] = mat_emission[mid]
        A[:, pk.ATTR_MAT_SCATTERING] = mat_scattering[mid]
        A[:, pk.ATTR_MAT_TYPE] = mat_type[mid]
        A[:, pk.ATTR_MAT_ROUGHNESS] = mat_roughness[mid]
        A[:, pk.ATTR_MAT_METALLIC] = mat_metallic[mid]
        A[:, pk.ATTR_MAT_IOR] = mat_ior[mid]
        A[:, pk.ATTR_MAT_ANISO] = mat_aniso[mid]
        A[:, pk.ATTR_MAT_TRDEPTH] = mat_trd[mid]
        A[:, pk.ATTR_MAT_TEX] = mat_tex[mid]
        if two_level:
            # Mesh-space soup: wt["inst"] holds MESH ids here, and the
            # object-space intersection already carries the reference's
            # backside sign (closest_hit bypasses the det fixup), so this
            # column is never consumed on the two-level path. Bake 1.0
            # instead of indexing the per-INSTANCE array with mesh ids —
            # that crashed flatten whenever a used mesh id >= num_instances.
            A[:, pk.ATTR_DET_SIGN] = 1.0
        else:
            A[:, pk.ATTR_DET_SIGN] = inst_det_sign[
                wt["inst"].astype(np.int64)
            ]
        A[:, pk.ATTR_MAT_ID] = wt["mat"]
        A[:, pk.ATTR_INST_ID] = wt["inst"]
        A[:, pk.ATTR_TRI_ID] = wt["tri"]
        wt_attr = A
    else:
        from ..kernels import pallas_intersect as pk

        wt_attr = np.zeros((1, pk.ATTR_WIDTH), np.float32)

    # ---- static feature flags over materials/meshes actually used ----
    from ..core.types import MaterialType as MT

    used_mats = {inst.mat_idx for inst in scene.instances}
    used_meshes = {inst.mesh_idx for inst in scene.instances}
    present_types = sorted(
        {int(scene.materials[m].mat_type) for m in used_mats}
    ) or [int(MT.MATTE)]
    any_uv = any(scene.meshes[m].texcoords is not None for m in used_meshes)
    any_vn = any(scene.meshes[m].normals is not None for m in used_meshes)
    any_vc = any(scene.meshes[m].colors is not None for m in used_meshes)
    any_nm = any_uv and any(
        (int(scene.materials[m].normal_tex_idx) & 0xFFFFFFFF) != 0xFFFFFFFF
        for m in used_mats
    )
    _slot_fields = (
        "color_tex_idx", "emission_tex_idx", "roughness_tex_idx",
        "scattering_tex_idx",
    )
    tex_slot_used = tuple(
        any(
            (int(getattr(scene.materials[m], f)) & 0xFFFFFFFF) != 0xFFFFFFFF
            for m in used_mats
        )
        for f in _slot_fields
    )
    # Every texture any used material binds (all 5 slots) is 8-bit-exact ->
    # material fetches take the packed-u32 path.
    _mat_tex_ids = {
        (int(getattr(scene.materials[m], f)) & 0xFFFFFFFF)
        for m in used_mats
        for f in _slot_fields + ("normal_tex_idx",)
    } - {0xFFFFFFFF}
    mat_tex_ldr = bool(_mat_tex_ids) and all(
        tex_is_ldr[t] for t in _mat_tex_ids
    )
    if mat_tex_ldr:
        q = np.clip(np.round(tex_data * 255.0), 0, 255).astype(np.uint32)
        tex_data_u32 = (
            q[:, 0] | (q[:, 1] << 8) | (q[:, 2] << 16) | (q[:, 3] << 24)
        )
    else:
        tex_data_u32 = np.zeros(1, np.uint32)
    vol_types = {int(MT.REFRACTIVE), int(MT.VOLUMETRIC), int(MT.SUBSURFACE)}
    any_vol = bool(vol_types & set(present_types))
    delta_types = {
        int(MT.REFLECTIVE),
        int(MT.REFRACTIVE),
        int(MT.TRANSPARENT),
        int(MT.VOLUMETRIC),
    }
    any_delta = bool(delta_types & set(present_types))

    def dev(x, dtype=None):
        a = np.asarray(x)
        if dtype is not None:
            a = a.astype(dtype)
        return jnp.asarray(a)

    def cat_or_zero(lst, dtype):
        if lst:
            return np.concatenate(lst).astype(dtype)
        return np.zeros(1, dtype)

    def cat_rows_or_zero(lst):
        if lst:
            return np.concatenate(lst).astype(np.float32)
        return np.zeros((1, 3), np.float32)

    # Per-global-superleaf streaming metadata for the packet kernel's
    # HBM-resident two-level mode (kernels/pallas_packet.py TL_STREAM):
    # one 64-byte row [msl, inst, inst_inv(12), 0, 0] DMA'd per leaf visit
    # instead of SMEM-resident gsl/transform tables, so the instance
    # envelope is not SMEM-bound (renderer.rs:317-319 allows 1M instances).
    # msl/inst ride as f32 (exact to 2^24 — matches the 3-factor child-ref
    # encoding's 16.7M cap).
    # Rows are padded to the 128-lane tile: Mosaic only DMAs lane-tile-
    # aligned extents along the minor dim, and the 16-wide row was the
    # exact rejection TL_STREAM hit on v5e ("Slice shape along dimension 1
    # must be aligned to tiling (128), but is 16" — out_hw/prof_stream.log,
    # VERDICT r4 #2; same class as the WROWS coefficient padding).
    if two_level:
        inv12 = inst_inv.reshape(-1, 12)
        gsl_meta = np.zeros((gsl_msl.shape[0], 128), np.float32)
        gsl_meta[:, 0] = gsl_msl
        gsl_meta[:, 1] = gsl_inst
        gsl_meta[:, 2:14] = inv12[gsl_inst]
    else:
        gsl_meta = np.zeros((1, 128), np.float32)

    scene_tpu = SceneTPU(
        num_meshes=nm,
        num_instances=ni,
        num_materials=nmat,
        num_envs=ne,
        num_lights=nl,
        num_textures=nt,
        num_world_tris=Tw,
        use_bvh=bool(use_bvh),
        bvh_depth=int(bvh_depth),
        bvh_leaf_size=int(bvh_leaf_size),
        sl_count=int(sl_count),
        sl_stride=int(sl_stride),
        two_level=bool(two_level),
        msl_count=int(msl_count),
        top_depth=int(top_depth),
        top_root_is_leaf=bool(top_root_is_leaf),
        has_alpha=bool(has_alpha),
        envs_empty=ne == 0,
        lights_empty=nl == 0,
        instances_empty=ni == 0 or Tw == 0,
        present_mat_types=tuple(present_types),
        any_uv=bool(any_uv),
        tex_slot_used=tex_slot_used,
        any_vert_normals=bool(any_vn),
        any_vert_colors=bool(any_vc),
        any_normal_maps=bool(any_nm),
        any_volumetric=bool(any_vol),
        any_delta=bool(any_delta),
        verts_pos=dev(verts_pos),
        verts_normal=dev(verts_normal),
        verts_uv=dev(verts_uv),
        verts_color=dev(verts_color),
        tri_indices=dev(tri_indices),
        mesh_has_normals=dev(mesh_has_normals),
        mesh_has_uv=dev(mesh_has_uv),
        mesh_has_color=dev(mesh_has_color),
        inst_inv=dev(inst_inv),
        inst_fwd=dev(inst_fwd),
        inst_normal_mat=dev(inst_nrm),
        inst_mesh=dev(inst_mesh),
        inst_mat=dev(inst_mat),
        inst_det_sign=dev(inst_det_sign),
        wt_v0=dev(wt["v0"].T),
        wt_e1=dev(wt["e1"].T),
        wt_e2=dev(wt["e2"].T),
        wt_inst=dev(wt["inst"]),
        wt_tri=dev(wt["tri"]),
        wt_mat=dev(wt["mat"]),
        wt_n0=dev(wt["n0"].T),
        wt_n1=dev(wt["n1"].T),
        wt_n2=dev(wt["n2"].T),
        wt_gn=dev(wt["gn"].T),
        wt_uv0=dev(wt["uv0"].T),
        wt_uv1=dev(wt["uv1"].T),
        wt_uv2=dev(wt["uv2"].T),
        wt_has_uv=dev(wt["has_uv"]),
        wt_c0=dev(wt["c0"].T),
        wt_c1=dev(wt["c1"].T),
        wt_c2=dev(wt["c2"].T),
        wt_tan=dev(wt["tan"].T),
        wt_bit=dev(wt["bit"].T),
        wt_attr=dev(wt_attr),
        bvh_min=dev(np.ascontiguousarray(bvh_min.T)),
        bvh_max=dev(np.ascontiguousarray(bvh_max.T)),
        bvh_first=dev(bvh_first, np.int32),
        bvh_count=dev(bvh_count, np.int32),
        top_tab=jnp.asarray(top_tab).astype(jnp.bfloat16),
        sl_sub=dev(sl_sub_arr),
        gsl_inst=dev(gsl_inst),
        gsl_msl=dev(gsl_msl),
        gsl_meta=dev(gsl_meta),
        mat_color=dev(mat_color.T),
        mat_emission=dev(mat_emission.T),
        mat_scattering=dev(mat_scattering.T),
        mat_type=dev(mat_type),
        mat_roughness=dev(mat_roughness),
        mat_metallic=dev(mat_metallic),
        mat_ior=dev(mat_ior),
        mat_sc_anisotropy=dev(mat_aniso),
        mat_tr_depth=dev(mat_trd),
        mat_tex=dev(mat_tex.T),
        tex_data=dev(np.ascontiguousarray(tex_data.T)),
        tex_data_u32=dev(tex_data_u32),
        mat_tex_ldr=bool(mat_tex_ldr),
        tex_offset=dev(tex_offset),
        tex_width=dev(tex_w),
        tex_height=dev(tex_h),
        env_emission=dev(env_emission),
        env_tex=dev(env_tex),
        env_has_tex=tuple(bool(t >= 0) for t in env_tex),
        env_rot=dev(env_rot),
        light_inst=dev(
            np.asarray(light_inst_l, np.int32) if nl else np.zeros(1, np.int32)
        ),
        light_area=dev(
            np.asarray(light_area_l, np.float32) if nl else np.ones(1, np.float32)
        ),
        la_prob=dev(cat_or_zero(la_prob_l, np.float32)),
        la_thresh=dev(cat_or_zero(la_thresh_l, np.float32)),
        la_alias=dev(cat_or_zero(la_alias_l, np.int32)),
        light_alias_offset=dev(
            np.asarray(light_alias_offset_l, np.int32) if nl else np.zeros(1, np.int32)
        ),
        light_alias_size=dev(
            np.asarray(light_alias_size_l, np.int32) if nl else np.ones(1, np.int32)
        ),
        ea_prob=dev(cat_or_zero(ea_prob_l, np.float32)),
        ea_thresh=dev(cat_or_zero(ea_thresh_l, np.float32)),
        ea_alias=dev(cat_or_zero(ea_alias_l, np.int32)),
        env_alias_offset=dev(
            np.asarray(env_alias_offset_l, np.int32) if ne else np.zeros(1, np.int32)
        ),
        lt_v0=dev(cat_rows_or_zero(lt_v0_l).T),
        lt_e1=dev(cat_rows_or_zero(lt_e1_l).T),
        lt_e2=dev(cat_rows_or_zero(lt_e2_l).T),
        lt_light=dev(cat_or_zero(lt_light_l, np.int32)),
        light_tri_offset=dev(
            np.asarray(light_tri_offset_l, np.int32) if nl else np.zeros(1, np.int32)
        ),
        light_tri_count=dev(
            np.asarray(light_tri_count_l, np.int32) if nl else np.zeros(1, np.int32)
        ),
    )
    from ..kernels.intersect import packet_eligible

    if sl_count > 0 and packet_eligible(scene_tpu):
        # Eager packet-backend probe at the ACTUAL scene's static shapes
        # (host side — kernels/intersect's _use_packet is consulted during
        # tracing, where a probe cannot execute). Runs for dense-eligible
        # scenes too: force_software_bvh can flip them onto the BVH path
        # per dispatch. On a backend where the kernel fails to lower — or
        # miscompiles into wrong results — renders of this scene fall back
        # to the sort backend instead of crashing or rendering wrong.
        from ..kernels import pallas_packet

        pallas_packet.probe_scene(scene_tpu)
    return scene_tpu
