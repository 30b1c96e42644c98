"""SE(3) geometry: NumPy builders vs JAX batched builders, convention checks."""

import numpy as np
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.geometry import (
    compose_pose_chain,
    pose_matrices_from_quaternions,
    pose_matrix_from_quaternion,
    pose_matrix_from_rpy,
    quaternion_from_rpy,
    rotation_from_quaternion,
    rotation_from_rpy,
)


def test_rpy_is_zyx_convention():
    # ZYX: R = Rz(yaw) @ Ry(pitch) @ Rx(roll) (reference 3d_mapper.py:333-337)
    rng = np.random.default_rng(1)
    for _ in range(20):
        r, p, y = rng.uniform(-np.pi, np.pi, 3)
        Rx = np.array(
            [[1, 0, 0], [0, np.cos(r), -np.sin(r)], [0, np.sin(r), np.cos(r)]]
        )
        Ry = np.array(
            [[np.cos(p), 0, np.sin(p)], [0, 1, 0], [-np.sin(p), 0, np.cos(p)]]
        )
        Rz = np.array(
            [[np.cos(y), -np.sin(y), 0], [np.sin(y), np.cos(y), 0], [0, 0, 1]]
        )
        np.testing.assert_allclose(
            rotation_from_rpy(np.array([r, p, y])), Rz @ Ry @ Rx, atol=1e-12
        )


def test_quaternion_round_trip():
    rng = np.random.default_rng(2)
    for _ in range(20):
        rpy = rng.uniform(-1.5, 1.5, 3)
        q = quaternion_from_rpy(rpy)
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-12)
        np.testing.assert_allclose(
            rotation_from_quaternion(q), rotation_from_rpy(rpy), atol=1e-12
        )


def test_identity_quaternion():
    T = pose_matrix_from_quaternion(np.array([1.0, 2.0, 3.0]), np.array([0, 0, 0, 1.0]))
    np.testing.assert_allclose(T[:3, :3], np.eye(3))
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3])


def test_batched_matches_scalar():
    rng = np.random.default_rng(3)
    n = 17
    pos = rng.uniform(-5, 5, (n, 3))
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    batched = np.asarray(pose_matrices_from_quaternions(jnp.array(pos), jnp.array(q)))
    for i in range(n):
        np.testing.assert_allclose(
            batched[i], pose_matrix_from_quaternion(pos[i], q[i]), atol=1e-12
        )


def test_compose_pose_chain():
    rng = np.random.default_rng(4)
    pos = rng.uniform(-2, 2, (5, 3))
    q = rng.normal(size=(5, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    T_mount = pose_matrix_from_rpy(np.array([0.0, 0.0, -0.5]), np.array([0, 1.5708, 0]))
    Tb = pose_matrices_from_quaternions(jnp.array(pos), jnp.array(q))
    chained = np.asarray(compose_pose_chain(Tb, jnp.array(T_mount)))
    for i in range(5):
        expect = pose_matrix_from_quaternion(pos[i], q[i]) @ T_mount
        np.testing.assert_allclose(chained[i], expect, atol=1e-12)
