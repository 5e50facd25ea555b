"""Quaternion operations: conversions, continuity fixing, SQUAD resampling.

In-repo replacement for the external ``numpy-quaternion`` dependency of the
reference (used at reference: empose/helpers/utils.py:59-102,
empose/data/transforms.py:104-119, empose/eval/metrics.py:140-162,
scripts/preprocess_amass_3dpw.py:63-123).

Two flavors live here:
  * numpy host-side functions (``np_*``) for offline preprocessing/resampling
    where device execution buys nothing, and
  * JAX functions for everything on the device path (metrics, normalization).
Quaternions are stored as (..., 4) arrays in (w, x, y, z) order.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# JAX (device) ops
# ---------------------------------------------------------------------------

def quat_from_aa(aa: jnp.ndarray) -> jnp.ndarray:
    """Angle-axis (..., 3) -> unit quaternion (..., 4), wxyz."""
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sin(x)/x is stable around 0 via the standard small-angle guard.
    small = angle < 1e-8
    sinc = jnp.where(small, 0.5, jnp.sin(half) / jnp.where(small, 1.0, angle))
    w = jnp.cos(half)
    xyz = aa * sinc
    return jnp.concatenate([w, xyz], axis=-1)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) wxyz -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = w * w + x * x + y * y + z * z
    s = 2.0 / jnp.where(n > 0, n, 1.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    rows = [
        jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
        jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
        jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rotation_intrinsic_distance_from_aa(aa1: jnp.ndarray, aa2: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic geodesic distance (radians) between angle-axis rotations.

    Matches numpy-quaternion's ``rotation_intrinsic_distance`` as used by the
    reference metrics (reference: metrics.py:153-161): for quaternions q1, q2
    it is 2*|log(conj(q1) q2)| = 2*arccos(<q1, q2>) WITHOUT taking the
    absolute value of the dot product (the double-cover is NOT collapsed; the
    reference inherits this from the library, so we reproduce it for parity).
    """
    q1 = quat_from_aa(aa1)
    q2 = quat_from_aa(aa2)
    dot = jnp.sum(q1 * q2, axis=-1)
    return 2.0 * jnp.arccos(jnp.clip(dot, -1.0, 1.0))


# ---------------------------------------------------------------------------
# numpy (host) ops — offline resampling path
# ---------------------------------------------------------------------------

def np_quat_from_aa(aa: np.ndarray) -> np.ndarray:
    angle = np.linalg.norm(aa, axis=-1, keepdims=True)
    half = 0.5 * angle
    with np.errstate(invalid="ignore", divide="ignore"):
        sinc = np.where(angle < 1e-12, 0.5, np.sin(half) / np.where(angle < 1e-12, 1.0, angle))
    return np.concatenate([np.cos(half), aa * sinc], axis=-1)


def np_quat_to_aa(q: np.ndarray) -> np.ndarray:
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w = np.clip(q[..., :1], -1.0, 1.0)
    angle = 2.0 * np.arccos(w)
    s = np.sqrt(np.maximum(1.0 - w * w, 0.0))
    axis = np.where(s < 1e-12, 0.0, q[..., 1:] / np.where(s < 1e-12, 1.0, s))
    return axis * angle


def np_quat_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    aw, ax, ay, az = (a[..., i] for i in range(4))
    bw, bx, by, bz = (b[..., i] for i in range(4))
    return np.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def np_quat_conj(q: np.ndarray) -> np.ndarray:
    return q * np.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def np_quat_log(q: np.ndarray) -> np.ndarray:
    """Log of unit quaternion -> pure quaternion (0, theta/2 * axis)."""
    w = np.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vn = np.linalg.norm(v, axis=-1, keepdims=True)
    angle = np.arctan2(vn, w)
    fac = np.where(vn < 1e-12, 0.0, angle / np.where(vn < 1e-12, 1.0, vn))
    out = np.zeros_like(q)
    out[..., 1:] = v * fac
    return out


def np_quat_exp(q: np.ndarray) -> np.ndarray:
    """Exp of pure quaternion (0, v) -> unit quaternion."""
    v = q[..., 1:]
    vn = np.linalg.norm(v, axis=-1, keepdims=True)
    out = np.zeros_like(q)
    out[..., :1] = np.cos(vn)
    fac = np.where(vn < 1e-12, 1.0, np.sin(vn) / np.where(vn < 1e-12, 1.0, vn))
    out[..., 1:] = v * fac
    return out


def fix_quaternions(quats: np.ndarray) -> np.ndarray:
    """Enforce sign continuity along the time (first) axis.

    Reference: empose/helpers/utils.py:59-78 (itself from QuaterNet).
    :param quats: (F, N, 4). :return: same shape with flipped signs.
    """
    assert quats.ndim == 3 and quats.shape[-1] == 4
    result = quats.copy()
    dot_products = np.sum(quats[1:] * quats[:-1], axis=2)
    mask = dot_products < 0
    mask = (np.cumsum(mask, axis=0) % 2).astype(bool)
    result[1:][mask] *= -1
    return result


def np_slerp(q0: np.ndarray, q1: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Spherical linear interpolation between quaternion arrays; t in [0, 1]."""
    t = np.asarray(t)[..., None]
    dot = np.sum(q0 * q1, axis=-1, keepdims=True)
    dot = np.clip(dot, -1.0, 1.0)
    theta = np.arccos(dot)
    sin_theta = np.sin(theta)
    lin = np.abs(sin_theta) < 1e-7
    w0 = np.where(lin, 1.0 - t, np.sin((1.0 - t) * theta) / np.where(lin, 1.0, sin_theta))
    w1 = np.where(lin, t, np.sin(t * theta) / np.where(lin, 1.0, sin_theta))
    out = w0 * q0 + w1 * q1
    return out / np.linalg.norm(out, axis=-1, keepdims=True)


def squad(quats: np.ndarray, ts_in: np.ndarray, ts_out: np.ndarray) -> np.ndarray:
    """Spherical quadrangle (C1-continuous) interpolation of a quaternion track.

    Replaces numpy-quaternion's ``quaternion.squad`` used by the reference for
    rotation resampling (reference: utils.py:89-102,
    preprocess_amass_3dpw.py:72-78). Input quats must already be
    sign-continuous (apply ``fix_quaternions`` first).

    :param quats: (F, 4) unit quaternions at times ``ts_in`` (F,), increasing.
    :param ts_out: (G,) query times, clipped to the input range.
    :return: (G, 4) interpolated unit quaternions.
    """
    quats = np.asarray(quats, dtype=np.float64)
    ts_in = np.asarray(ts_in, dtype=np.float64)
    ts_out = np.clip(np.asarray(ts_out, dtype=np.float64), ts_in[0], ts_in[-1])
    f = quats.shape[0]
    if f == 1:
        return np.repeat(quats, len(ts_out), axis=0)

    # Inner control points a_i for each knot (endpoints use the knot itself).
    q_prev = quats[np.maximum(np.arange(f) - 1, 0)]
    q_next = quats[np.minimum(np.arange(f) + 1, f - 1)]
    q_inv = np_quat_conj(quats)
    log_next = np_quat_log(np_quat_mul(q_inv, q_next))
    log_prev = np_quat_log(np_quat_mul(q_inv, q_prev))
    inner = np_quat_mul(quats, np_quat_exp(-0.25 * (log_next + log_prev)))
    inner[0] = quats[0]
    inner[-1] = quats[-1]

    # Locate segments and normalized parameter tau per query.
    idx = np.clip(np.searchsorted(ts_in, ts_out, side="right") - 1, 0, f - 2)
    t0, t1 = ts_in[idx], ts_in[idx + 1]
    tau = np.where(t1 > t0, (ts_out - t0) / np.where(t1 > t0, t1 - t0, 1.0), 0.0)

    qa, qb = quats[idx], quats[idx + 1]
    aa, bb = inner[idx], inner[idx + 1]
    outer = np_slerp(qa, qb, tau)
    inner_interp = np_slerp(aa, bb, tau)
    return np_slerp(outer, inner_interp, 2.0 * tau * (1.0 - tau))


def resample_rotations(poses: np.ndarray, fps_in: float, fps_out: float) -> np.ndarray:
    """Resample an angle-axis motion track (F, J, 3) from fps_in to fps_out.

    Reference: empose/helpers/utils.py:81-102 (quat fix + per-joint SQUAD).
    """
    quats = np_quat_from_aa(poses)  # (F, J, 4)
    quats = fix_quaternions(quats)
    n_frames = quats.shape[0]
    assert n_frames > 1, "Need at least two quaternions to resample."
    duration = n_frames / fps_in
    ts_in = np.arange(0, duration, 1.0 / fps_in)[:n_frames]
    ts_out = np.arange(0, duration, 1.0 / fps_out)
    out = np.stack([squad(quats[:, j], ts_in, ts_out) for j in range(poses.shape[1])], axis=1)
    return np_quat_to_aa(out)
