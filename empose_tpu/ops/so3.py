"""SO(3) operations in JAX: Rodrigues exp/log maps, hat operators, geodesic angles.

Functional re-design of the reference SO(3) module (reference:
empose/helpers/so3.py:41-242, itself vendored from pytorch3d). All functions
accept arbitrary leading batch dimensions, are jit/vmap/grad-safe (no
data-dependent Python control flow, no value asserts), and use the same
eps-clamping semantics as the reference so numerical outputs match to f32
precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_HI = lax.Precision.HIGHEST

HAT_INV_SKEW_SYMMETRIC_TOL = 1e-5


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Map vectors (..., 3) to skew-symmetric matrices (..., 3, 3).

    Reference: so3.py:205-242.
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = [
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def hat_inv(h: jnp.ndarray) -> jnp.ndarray:
    """Inverse hat operator: (..., 3, 3) skew-symmetric -> (..., 3).

    Unlike the reference (so3.py:194-196) no runtime skew-symmetry assert is
    performed — that check is incompatible with jit tracing; use
    ``is_skew_symmetric`` in tests instead.
    """
    x = h[..., 2, 1]
    y = h[..., 0, 2]
    z = h[..., 1, 0]
    return jnp.stack([x, y, z], axis=-1)


def is_skew_symmetric(h: jnp.ndarray, tol: float = HAT_INV_SKEW_SYMMETRIC_TOL) -> jnp.ndarray:
    """Host-side check equivalent of the reference's hat_inv assert."""
    ss_diff = jnp.max(jnp.abs(h + jnp.swapaxes(h, -1, -2)))
    return ss_diff <= tol


def so3_rotation_angle(R: jnp.ndarray, eps: float = 1e-4, cos_angle: bool = False) -> jnp.ndarray:
    """Rotation angle of (..., 3, 3) rotation matrices; reference so3.py:41-84."""
    rot_trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    rot_trace = jnp.clip(rot_trace, -1.0, 3.0)
    phi = 0.5 * (rot_trace - 1.0)
    if cos_angle:
        return phi
    return jnp.arccos(phi)


def so3_relative_angle(R1: jnp.ndarray, R2: jnp.ndarray, cos_angle: bool = False) -> jnp.ndarray:
    """Geodesic angle between rotation matrix batches; reference so3.py:13-38."""
    R12 = jnp.matmul(R1, jnp.swapaxes(R2, -1, -2), precision=_HI)
    return so3_rotation_angle(R12, cos_angle=cos_angle)


def so3_exponential_map(log_rot: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Rodrigues formula: angle-axis (..., 3) -> rotation matrices (..., 3, 3).

    Matches the reference clamping (reference: so3.py:87-131): the squared
    norm is clamped at ``eps`` before sqrt, which both handles the
    singularity at 0 and keeps gradients finite under jit.
    """
    nrms = jnp.sum(log_rot * log_rot, axis=-1)
    rot_angles = jnp.sqrt(jnp.clip(nrms, eps, None))
    inv = 1.0 / rot_angles
    fac1 = inv * jnp.sin(rot_angles)
    fac2 = inv * inv * (1.0 - jnp.cos(rot_angles))
    skews = hat(log_rot)
    eye = jnp.eye(3, dtype=log_rot.dtype)
    return (
        fac1[..., None, None] * skews
        + fac2[..., None, None] * jnp.matmul(skews, skews, precision=_HI)
        + eye
    )


# Short aliases used across the codebase (reference imports them as aa2rot/rot2aa).
aa2rot = so3_exponential_map


def so3_log_map(R: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> angle-axis (..., 3); reference so3.py:134-170."""
    phi = so3_rotation_angle(R)
    phi_sin = jnp.sin(phi)
    phi_denom = (
        jnp.clip(jnp.abs(phi_sin), eps, None) * jnp.sign(phi_sin)
        + (phi_sin == 0).astype(phi.dtype) * eps
    )
    log_rot_hat = (phi / (2.0 * phi_denom))[..., None, None] * (R - jnp.swapaxes(R, -1, -2))
    return hat_inv(log_rot_hat)


rot2aa = so3_log_map


def local_to_global(poses: jnp.ndarray, parents, output_format: str = "aa", input_format: str = "aa") -> jnp.ndarray:
    """Unroll a kinematic chain: relative joint rotations -> global rotations.

    Reference: empose/helpers/utils.py:165-199. ``parents`` must be a static
    Python sequence (it drives an unrolled loop under jit; the SMPL tree is a
    fixed 22/52-joint topology, so unrolling is cheap and lets XLA fuse the
    3x3 matmul chain).

    :param poses: (..., n_joints * dof) with dof 3 ('aa') or 9 ('rotmat').
    :param parents: parent index per joint, parents[0] == -1 for the root.
    :return: (..., n_joints * 3) for 'aa' or (..., n_joints * 9) for 'rotmat'.
    """
    assert output_format in ("aa", "rotmat")
    assert input_format in ("aa", "rotmat")
    dof = 3 if input_format == "aa" else 9
    n_joints = poses.shape[-1] // dof
    batch_shape = poses.shape[:-1]
    if input_format == "aa":
        local_oris = so3_exponential_map(poses.reshape(batch_shape + (n_joints, 3)))
    else:
        local_oris = poses.reshape(batch_shape + (n_joints, 3, 3))

    global_list = [None] * n_joints
    for j in range(n_joints):
        p = parents[j]
        if p < 0:
            global_list[j] = local_oris[..., j, :, :]
        else:
            global_list[j] = jnp.matmul(global_list[p], local_oris[..., j, :, :], precision=_HI)
    global_oris = jnp.stack(global_list, axis=-3)

    if output_format == "aa":
        return so3_log_map(global_oris).reshape(batch_shape + (n_joints * 3,))
    return global_oris.reshape(batch_shape + (n_joints * 9,))


def global_oris_from_pose(pose_root: jnp.ndarray, pose_body: jnp.ndarray, smpl_parents, angle_idxs) -> jnp.ndarray:
    """Global orientations (rotmat) of selected joints from root+body angle-axis pose.

    Reference: empose/helpers/utils.py:156-162.
    :param pose_root: (N, F, 3); :param pose_body: (N, F, J*3).
    :return: (N, F, len(angle_idxs)*9)
    """
    n, f = pose_root.shape[0], pose_root.shape[1]
    poses = jnp.concatenate([pose_root.reshape(n * f, -1), pose_body.reshape(n * f, -1)], axis=-1)
    pose_global = local_to_global(poses, smpl_parents, output_format="rotmat")
    oris_global = pose_global.reshape(n, f, -1, 3, 3)[:, :, jnp.asarray(angle_idxs)]
    return oris_global.reshape(n, f, -1)
