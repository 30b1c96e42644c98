"""SE(3) geometry: RPY / quaternion -> homogeneous transforms, batched pose chains.

Conventions match the reference:
  * RPY rotation uses the ZYX (yaw*pitch*roll) convention — the explicit matrix
    of reference scripts/3d_mapper.py:333-337 equals Rz(yaw)@Ry(pitch)@Rx(roll).
  * Quaternions are [x, y, z, w], assumed unit (reference 3d_mapper.py:346-364
    does not normalize; we preserve that).

Two API levels:
  * NumPy scalar builders (float64) — used by the golden oracle and by
    host-side precomputation.
  * JAX batched builders — whole ping sequences of poses as one einsum,
    feeding the device pipeline (SURVEY.md section 7 stage 1).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# NumPy (host / golden) versions
# ---------------------------------------------------------------------------

def rotation_from_rpy(rpy: np.ndarray) -> np.ndarray:
    """3x3 rotation from [roll, pitch, yaw] radians, ZYX convention
    (reference 3d_mapper.py:314-337)."""
    cr, sr = np.cos(rpy[0]), np.sin(rpy[0])
    cp, sp = np.cos(rpy[1]), np.sin(rpy[1])
    cy, sy = np.cos(rpy[2]), np.sin(rpy[2])
    return np.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ]
    )


def rotation_from_quaternion(q: np.ndarray) -> np.ndarray:
    """3x3 rotation from [x, y, z, w] quaternion (reference 3d_mapper.py:346-364;
    unnormalized on purpose — assumes unit input)."""
    x, y, z, w = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _homogeneous(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    T = np.eye(4, dtype=np.float64)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def pose_matrix_from_rpy(position: np.ndarray, rpy: np.ndarray) -> np.ndarray:
    """4x4 homogeneous transform from translation + RPY (reference :314-344)."""
    return _homogeneous(rotation_from_rpy(rpy), position)


def pose_matrix_from_quaternion(position: np.ndarray, q: np.ndarray) -> np.ndarray:
    """4x4 homogeneous transform from translation + quaternion (reference :366-380)."""
    return _homogeneous(rotation_from_quaternion(q), position)


def quaternion_from_rpy(rpy: np.ndarray) -> np.ndarray:
    """[x, y, z, w] quaternion from RPY radians (reference node inline
    conversion, scripts/3d_mapper_node.py:376-387)."""
    roll, pitch, yaw = rpy
    cy, sy = np.cos(yaw * 0.5), np.sin(yaw * 0.5)
    cp, sp = np.cos(pitch * 0.5), np.sin(pitch * 0.5)
    cr, sr = np.cos(roll * 0.5), np.sin(roll * 0.5)
    return np.array(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ]
    )


def rotations_from_quaternions_np(q: np.ndarray) -> np.ndarray:
    """Batched NumPy float64 (N, 4) xyzw quaternions -> (N, 3, 3) rotations
    (same formula as rotation_from_quaternion; float64 for golden parity —
    the host-side pose chains route through this)."""
    q = np.asarray(q, np.float64)
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.empty((len(q), 3, 3), np.float64)
    R[:, 0, 0] = 1 - 2 * (y * y + z * z)
    R[:, 0, 1] = 2 * (x * y - w * z)
    R[:, 0, 2] = 2 * (x * z + w * y)
    R[:, 1, 0] = 2 * (x * y + w * z)
    R[:, 1, 1] = 1 - 2 * (x * x + z * z)
    R[:, 1, 2] = 2 * (y * z - w * x)
    R[:, 2, 0] = 2 * (x * z - w * y)
    R[:, 2, 1] = 2 * (y * z + w * x)
    R[:, 2, 2] = 1 - 2 * (x * x + y * y)
    return R


# ---------------------------------------------------------------------------
# JAX batched versions (device)
# ---------------------------------------------------------------------------

def rotations_from_quaternions(q: jnp.ndarray) -> jnp.ndarray:
    """Batched [..., 4] xyzw quaternions -> [..., 3, 3] rotation matrices."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    one = jnp.ones_like(x)
    rows = [
        [one - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), one - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), one - 2 * (x * x + y * y)],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def pose_matrices_from_quaternions(
    positions: jnp.ndarray, quaternions: jnp.ndarray
) -> jnp.ndarray:
    """Batched [..., 3] positions + [..., 4] quaternions -> [..., 4, 4]."""
    R = rotations_from_quaternions(quaternions)
    batch = R.shape[:-2]
    top = jnp.concatenate([R, positions[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def compose_pose_chain(
    T_base_to_world: jnp.ndarray, T_sonar_to_base: jnp.ndarray
) -> jnp.ndarray:
    """Batched T_sonar_to_world = T_base_to_world @ T_sonar_to_base
    (reference 3d_mapper.py:519-521) over whole ping sequences."""
    return jnp.einsum("...ij,jk->...ik", T_base_to_world, T_sonar_to_base)
