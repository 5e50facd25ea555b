"""SO(3) ops vs scipy oracle + reference clamping semantics."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from empose_tpu.ops import so3
from empose_tpu.ops import quaternions as Q


def random_aa(rng, n, max_angle=np.pi - 0.2):
    axis = rng.randn(n, 3)
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    angle = rng.uniform(0.05, max_angle, (n, 1))
    return (axis * angle).astype(np.float32)


def test_exp_map_matches_scipy():
    rng = np.random.RandomState(0)
    aa = random_aa(rng, 64)
    R_ours = np.asarray(so3.so3_exponential_map(jnp.asarray(aa)))
    R_scipy = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=2e-6)


def test_log_map_roundtrip():
    rng = np.random.RandomState(1)
    aa = random_aa(rng, 64)
    R = so3.so3_exponential_map(jnp.asarray(aa))
    aa_back = np.asarray(so3.so3_log_map(R))
    np.testing.assert_allclose(aa_back, aa, atol=1e-4)


def test_exp_map_small_angle_clamp():
    # Reference clamps squared norm at 1e-4 -> angle floor of 1e-2.
    aa = jnp.zeros((2, 3), jnp.float32)
    R = np.asarray(so3.so3_exponential_map(aa))
    # At zero input the skew is zero so R = I regardless of the clamped angle.
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)


def test_hat_and_inverse():
    rng = np.random.RandomState(2)
    v = rng.randn(10, 3).astype(np.float32)
    h = so3.hat(jnp.asarray(v))
    assert bool(so3.is_skew_symmetric(h))
    np.testing.assert_allclose(np.asarray(so3.hat_inv(h)), v, atol=1e-6)


def test_rotation_angle():
    rng = np.random.RandomState(3)
    aa = random_aa(rng, 32)
    R = so3.so3_exponential_map(jnp.asarray(aa))
    angles = np.asarray(so3.so3_rotation_angle(R))
    np.testing.assert_allclose(angles, np.linalg.norm(aa, axis=1), atol=1e-4)


def test_local_to_global_two_joint_chain():
    rng = np.random.RandomState(4)
    aa = random_aa(rng, 2).reshape(1, 6)
    parents = [-1, 0]
    glob = np.asarray(so3.local_to_global(jnp.asarray(aa), parents, output_format="rotmat")).reshape(2, 3, 3)
    R0 = Rotation.from_rotvec(aa[0, :3]).as_matrix()
    R1 = Rotation.from_rotvec(aa[0, 3:]).as_matrix()
    np.testing.assert_allclose(glob[0], R0, atol=1e-5)
    np.testing.assert_allclose(glob[1], R0 @ R1, atol=1e-5)


def test_batched_leading_dims():
    rng = np.random.RandomState(5)
    aa = random_aa(rng, 24).reshape(2, 3, 4, 3)
    R = so3.so3_exponential_map(jnp.asarray(aa))
    assert R.shape == (2, 3, 4, 3, 3)
    flat = so3.so3_exponential_map(jnp.asarray(aa.reshape(-1, 3)))
    np.testing.assert_allclose(np.asarray(R).reshape(-1, 3, 3), np.asarray(flat), atol=1e-6)


# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------

def test_quat_from_aa_matches_scipy():
    rng = np.random.RandomState(6)
    aa = random_aa(rng, 32)
    q = np.asarray(Q.quat_from_aa(jnp.asarray(aa)))  # wxyz
    q_scipy = Rotation.from_rotvec(aa).as_quat()  # xyzw
    q_scipy = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=1)
    sign = np.sign(np.sum(q * q_scipy, axis=1, keepdims=True))
    np.testing.assert_allclose(q, q_scipy * sign, atol=1e-6)


def test_quat_to_rotmat_roundtrip():
    rng = np.random.RandomState(7)
    aa = random_aa(rng, 32)
    R = np.asarray(Q.quat_to_rotmat(Q.quat_from_aa(jnp.asarray(aa))))
    np.testing.assert_allclose(R, Rotation.from_rotvec(aa).as_matrix(), atol=1e-6)


def test_intrinsic_distance():
    rng = np.random.RandomState(8)
    aa1 = random_aa(rng, 16)
    axis = aa1 / np.linalg.norm(aa1, axis=1, keepdims=True)
    delta = 0.3
    aa2_rot = Rotation.from_rotvec(aa1) * Rotation.from_rotvec(axis * delta)
    aa2 = aa2_rot.as_rotvec().astype(np.float32)
    d = np.asarray(Q.rotation_intrinsic_distance_from_aa(jnp.asarray(aa1), jnp.asarray(aa2)))
    np.testing.assert_allclose(d, delta, atol=1e-4)


def test_fix_quaternions():
    rng = np.random.RandomState(9)
    aa = random_aa(rng, 8)[None].repeat(5, axis=0)  # (F=5, J=8, 3)
    q = Q.np_quat_from_aa(aa)
    q[2] *= -1  # introduce a sign flip
    q[3] *= -1
    fixed = Q.fix_quaternions(q)
    dots = np.sum(fixed[1:] * fixed[:-1], axis=-1)
    assert (dots >= 0).all()


def test_squad_endpoints_and_midpoint():
    rng = np.random.RandomState(10)
    aa = random_aa(rng, 4).astype(np.float64)
    q = Q.np_quat_from_aa(aa)
    q = Q.fix_quaternions(q[:, None])[:, 0]
    ts = np.arange(4.0)
    out = Q.squad(q, ts, ts)
    np.testing.assert_allclose(np.abs(np.sum(out * q, axis=1)), 1.0, atol=1e-8)
    # Two-knot squad degenerates to slerp.
    out_mid = Q.squad(q[:2], ts[:2], np.array([0.5]))
    slerp_mid = Q.np_slerp(q[0], q[1], np.array([0.5]))
    np.testing.assert_allclose(out_mid[0], slerp_mid[0], atol=1e-8)


def test_resample_rotations_identity_fps():
    rng = np.random.RandomState(11)
    poses = Q.np_quat_to_aa(Q.fix_quaternions(Q.np_quat_from_aa(rng.randn(10, 3, 3) * 0.3)))
    out = Q.resample_rotations(poses, 60.0, 60.0)
    assert out.shape == poses.shape
    # Knots must be reproduced exactly.
    R_in = Rotation.from_rotvec(poses.reshape(-1, 3)).as_matrix()
    R_out = Rotation.from_rotvec(out.reshape(-1, 3)).as_matrix()
    np.testing.assert_allclose(R_out, R_in, atol=1e-6)


def test_resample_rotations_half_fps_reproduces_knots():
    """120 -> 60 fps: every output knot coincides with an even input frame."""
    rng = np.random.RandomState(12)
    poses = Q.np_quat_to_aa(Q.fix_quaternions(Q.np_quat_from_aa(rng.randn(12, 2, 3) * 0.3)))
    out = Q.resample_rotations(poses, 120.0, 60.0)
    assert out.shape[0] == 6
    R_in = Rotation.from_rotvec(poses[::2].reshape(-1, 3)).as_matrix()
    R_out = Rotation.from_rotvec(out.reshape(-1, 3)).as_matrix()
    np.testing.assert_allclose(R_out, R_in, atol=1e-6)
