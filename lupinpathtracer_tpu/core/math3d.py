"""Host-side 3D math on numpy arrays.

TPU-native rebuild of the reference's base math layer
(/root/reference/lupin/src/base.rs:61-1167). Instead of bespoke Vec/Mat
types we use plain numpy arrays: a *frame* is a (3, 4) affine matrix
(3x3 linear part | translation column), matching the reference's Mat3x4
semantics (base.rs:503-798). Device-side math is plain jnp on (..., 3)
arrays and lives with the kernels.
"""

from __future__ import annotations

import numpy as np

# Conversion to the renderer's left-handed coordinate system
# (lupin_loader/src/loader.rs:345-349): flips the z axis.
HANDEDNESS = np.diag([1.0, 1.0, -1.0]).astype(np.float32)


def frame_identity() -> np.ndarray:
    f = np.zeros((3, 4), np.float32)
    f[:, :3] = np.eye(3, dtype=np.float32)
    return f


def frame_from_cols(cols) -> np.ndarray:
    """Build a (3,4) frame from 4 column vectors (x, y, z axes, origin)."""
    return np.stack([np.asarray(c, np.float32) for c in cols], axis=1)


def frame_from_yocto(vals) -> np.ndarray:
    """Yocto JSON 'frame': 12 floats = x-axis, y-axis, z-axis, origin columns."""
    v = np.asarray(vals, np.float32).reshape(4, 3)
    return v.T.copy()


def frame_compose(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a ∘ b as affine transforms (base.rs Mat3x4 * Mat3x4)."""
    out = np.zeros((3, 4), np.float32)
    out[:, :3] = a[:, :3] @ b[:, :3]
    out[:, 3] = a[:, :3] @ b[:, 3] + a[:, 3]
    return out


def frame_inverse(a: np.ndarray) -> np.ndarray:
    """Inverse of an affine (3,4) transform (pathtracer.wgsl mat4x3f_inverse)."""
    rinv = np.linalg.inv(a[:, :3].astype(np.float64)).astype(np.float32)
    out = np.zeros((3, 4), np.float32)
    out[:, :3] = rinv
    out[:, 3] = -rinv @ a[:, 3]
    return out


def frame_to_mat4(a: np.ndarray) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[:3, :4] = a
    return m


def convert_camera_frame(frame: np.ndarray) -> np.ndarray:
    """Right->left handed camera conversion: C * M * C (loader.rs:402)."""
    c = frame_identity()
    c[:, :3] = HANDEDNESS
    return frame_compose(frame_compose(c, frame), c)


def convert_instance_frame(frame: np.ndarray) -> np.ndarray:
    """Right->left handed instance/env conversion: C * M (loader.rs:653)."""
    c = frame_identity()
    c[:, :3] = HANDEDNESS
    return frame_compose(c, frame)


def transform_points(frame: np.ndarray, pts: np.ndarray) -> np.ndarray:
    return pts @ frame[:, :3].T + frame[:, 3]


def transform_vectors(frame: np.ndarray, vecs: np.ndarray) -> np.ndarray:
    return vecs @ frame[:, :3].T


def normal_matrix(frame: np.ndarray) -> np.ndarray:
    """Inverse-transpose of the linear part, for transforming normals."""
    return np.linalg.inv(frame[:, :3].astype(np.float64)).T.astype(np.float32)


def aabb_empty() -> tuple[np.ndarray, np.ndarray]:
    return (
        np.full(3, np.inf, np.float32),
        np.full(3, -np.inf, np.float32),
    )


def transform_aabb(frame: np.ndarray, lo: np.ndarray, hi: np.ndarray):
    """Tight AABB of a transformed AABB (base.rs:1113-1134)."""
    xs = [lo[0], hi[0]]
    ys = [lo[1], hi[1]]
    zs = [lo[2], hi[2]]
    corners = np.array(
        [[x, y, z] for x in xs for y in ys for z in zs], np.float32
    )
    tc = transform_points(frame, corners)
    return tc.min(axis=0), tc.max(axis=0)


def srgb_to_linear(c: np.ndarray) -> np.ndarray:
    """sRGB -> linear (pathtracer.wgsl:2814-2820), vectorized on host."""
    c = np.asarray(c, np.float32)
    return np.where(c < 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4).astype(
        np.float32
    )


def linear_to_srgb(c: np.ndarray) -> np.ndarray:
    c = np.asarray(c, np.float32)
    return np.where(
        c <= 0.0031308, c * 12.92, 1.055 * np.power(np.maximum(c, 0.0), 1.0 / 2.4) - 0.055
    ).astype(np.float32)
