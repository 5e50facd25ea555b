"""Metrics engine: MPJPE / PA-MPJPE / MPJAE (reference: empose/eval/metrics.py).

TPU-native redesign: the reference runs a per-sample numpy Procrustes loop on
the host (metrics.py:110-138) and converts rotations through the quaternion
package; here both the Procrustes alignment (vmapped SVD) and the angular
error run on-device in one jitted call per batch, with only the per-frame
error matrices accumulated on the host for aggregation.

Aggregation semantics match the reference exactly (metrics.py:289-330):
per-joint means over all frames, then mean over the evaluated joint subset;
std over the raw per-frame-per-joint error matrix.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from empose_tpu import constants as C
from empose_tpu.ops.so3 import local_to_global
from empose_tpu.ops.quaternions import rotation_intrinsic_distance_from_aa
from empose_tpu.bodymodel.smplh import smplh_fk

_HI = lax.Precision.HIGHEST

EUCL_EVAL_JOINTS = (
    "root", "l_hip", "r_hip", "spine1", "l_knee", "r_knee", "spine2", "l_ankle", "r_ankle",
    "spine3", "neck", "l_collar", "r_collar", "head", "l_shoulder", "r_shoulder",
    "l_elbow", "r_elbow", "l_wrist", "r_wrist",
)
ANGLE_EVAL_JOINTS = (
    "l_hip", "r_hip", "spine1", "l_knee", "r_knee", "spine2", "spine3",
    "neck", "l_collar", "r_collar", "head", "l_shoulder", "r_shoulder", "l_elbow", "r_elbow",
)

def _round_up_rows(n: int, bucket: int = 512) -> int:
    """Row-count bucket for jit shape reuse (power-of-two-ish growth)."""
    if n <= bucket:
        size = 64
        while size < n:
            size *= 2
        return size
    return ((n + bucket - 1) // bucket) * bucket


EUCL_IDXS = tuple(C.SMPL_JOINTS.index(j) for j in EUCL_EVAL_JOINTS)
# Pose vector has no root -> shift by -1 (reference metrics.py:92).
ANGLE_IDXS = tuple(C.SMPL_JOINTS.index(j) - 1 for j in ANGLE_EVAL_JOINTS)


def procrustes_align(X: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
    """Align Y to X with optimal rotation+scale+translation (one sample).

    Port of the classic MATLAB-procrustes math (reference metrics.py:19-66,
    compute_optimal_scale=True): returns Z, the transformed Y.
    :param X, Y: (J, 3).
    """
    muX = jnp.mean(X, axis=0)
    muY = jnp.mean(Y, axis=0)
    X0 = X - muX
    Y0 = Y - muY
    normX = jnp.sqrt(jnp.sum(X0 * X0))
    normY = jnp.sqrt(jnp.sum(Y0 * Y0))
    # Degenerate (all-points-equal) rows happen only for padded/masked
    # frames; guard the division so they yield finite garbage that the
    # masked accumulation can zero out (NaN would poison masked sums).
    X0 = X0 / jnp.where(normX > 0, normX, 1.0)
    Y0 = Y0 / jnp.where(normY > 0, normY, 1.0)
    A = jnp.matmul(X0.T, Y0, precision=_HI)
    U, s, Vt = jnp.linalg.svd(A, full_matrices=False)
    V = Vt.T
    detT = jnp.linalg.det(jnp.matmul(V, U.T, precision=_HI))
    V = V.at[:, -1].multiply(jnp.sign(detT))
    s = s.at[-1].multiply(jnp.sign(detT))
    T = jnp.matmul(V, U.T, precision=_HI)
    traceTA = jnp.sum(s)
    return normX * traceTA * jnp.matmul(Y0, T, precision=_HI) + muX


# ---------------------------------------------------------------------------
# Batched Procrustes via Horn's quaternion method.
#
# The SVD path above is the oracle; the hot batched path solves the same
# problem without a 3x3 SVD per frame: the det-corrected optimal rotation T
# maximizes tr(A T) over proper rotations, and Horn (1987) / Besl-McKay give
# tr(A R(q)) = q^T K(A) q for unit quaternions q with K the 4x4 symmetric
# matrix below — so T = R(argmax eigvec of K) and tr(s_corrected) = lambda_max
# EXACTLY (the reflection correction is built into restricting to proper
# rotations). The eigenproblem runs as a fixed-sweep cyclic Jacobi — pure
# branchless elementwise math over the batch, ~10x the batched-SVD lowering
# on TPU (measured: the 3x3 SVD cost ~19 ms per 4096 frames of the eval
# pass). Convention validated against det-corrected SVD on random,
# reflection-dominant, near-degenerate, and zero matrices (worst objective
# error 3.3e-6 in f64); EMPOSE_PROCRUSTES=svd falls back.
# ---------------------------------------------------------------------------

def _horn_rotation(A: jnp.ndarray):
    """Batched (rows, 3, 3) -> (T (rows, 3, 3), lam (rows,)) with T the
    proper rotation maximizing tr(A T) and lam that maximum (= the
    det-corrected singular-value sum of A)."""
    Sxx, Sxy, Sxz = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    Syx, Syy, Syz = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    Szx, Szy, Szz = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    K = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
        jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
    ], -2)                                                     # (rows, 4, 4)
    V = jnp.broadcast_to(jnp.eye(4, dtype=K.dtype), K.shape)
    # Fixed-sweep cyclic Jacobi (quadratic convergence; 8 sweeps is beyond
    # f32 machine precision for 4x4). Branchless: zero off-diagonals take a
    # zero rotation angle.
    for _ in range(8):
        for p, q in ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)):
            app, aqq, apq = K[..., p, p], K[..., q, q], K[..., p, q]
            tau = (aqq - app) / (2.0 * jnp.where(jnp.abs(apq) > 0, apq, 1.0))
            t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            t = jnp.where(jnp.abs(apq) > 1e-30, t, 0.0)
            c = (1.0 / jnp.sqrt(1.0 + t * t))[..., None]
            s = t[..., None] * c
            Kp, Kq = K[..., p, :], K[..., q, :]
            K = K.at[..., p, :].set(c * Kp - s * Kq)
            K = K.at[..., q, :].set(s * Kp + c * Kq)
            Kp, Kq = K[..., :, p], K[..., :, q]
            K = K.at[..., :, p].set(c * Kp - s * Kq)
            K = K.at[..., :, q].set(s * Kp + c * Kq)
            Vp, Vq = V[..., :, p], V[..., :, q]
            V = V.at[..., :, p].set(c * Vp - s * Vq)
            V = V.at[..., :, q].set(s * Vp + c * Vq)
    evals = jnp.stack([K[..., i, i] for i in range(4)], -1)     # (rows, 4)
    idx = jnp.argmax(evals, axis=-1)
    lam = jnp.take_along_axis(evals, idx[..., None], -1)[..., 0]
    q = jnp.take_along_axis(
        V, jnp.broadcast_to(idx[..., None, None], V.shape[:-1] + (1,)), -1)[..., 0]
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    T = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], -2)
    return T, lam


def procrustes_align_batched(X: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
    """Batched :func:`procrustes_align`: (rows, J, 3) pairs -> aligned Y.

    Same centering/normalization/scale math as the single-sample SVD
    oracle; the rotation+corrected-trace come from :func:`_horn_rotation`
    (or the vmapped SVD under EMPOSE_PROCRUSTES=svd)."""
    muX = jnp.mean(X, axis=-2, keepdims=True)
    muY = jnp.mean(Y, axis=-2, keepdims=True)
    X0 = X - muX
    Y0 = Y - muY
    normX = jnp.sqrt(jnp.sum(X0 * X0, axis=(-1, -2), keepdims=True))
    normY = jnp.sqrt(jnp.sum(Y0 * Y0, axis=(-1, -2), keepdims=True))
    X0 = X0 / jnp.where(normX > 0, normX, 1.0)
    Y0 = Y0 / jnp.where(normY > 0, normY, 1.0)
    A = jnp.einsum("...ja,...jb->...ab", X0, Y0, precision=_HI)
    T, lam = _horn_rotation(A)
    Z = jnp.einsum("...ja,...ab->...jb", Y0, T, precision=_HI)
    return normX * lam[..., None, None] * Z + muX


import os as _os_pa
_USE_HORN_PA = _os_pa.environ.get("EMPOSE_PROCRUSTES", "horn") != "svd"


def _procrustes_batch(kp_gt: jnp.ndarray, kp_hat: jnp.ndarray) -> jnp.ndarray:
    if _USE_HORN_PA:
        return procrustes_align_batched(kp_gt, kp_hat)
    return jax.vmap(procrustes_align)(kp_gt, kp_hat)


@jax.jit
def _eucl_dists(kp_gt: jnp.ndarray, kp_hat: jnp.ndarray):
    """(B, J, 3) -> per-joint Euclidean errors, raw and Procrustes-aligned."""
    diff = kp_gt - kp_hat
    eucl = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    kp_hat_pa = _procrustes_batch(kp_gt, kp_hat)
    diff_pa = kp_gt - kp_hat_pa
    eucl_pa = jnp.sqrt(jnp.sum(diff_pa * diff_pa, axis=-1))
    return eucl, eucl_pa


def _angle_dists(pose: jnp.ndarray, pose_hat: jnp.ndarray, parents) -> jnp.ndarray:
    """Angular geodesic error on GLOBAL orientations (reference metrics.py:230-239).

    :param pose: (B, J*3) body pose WITHOUT root (zero root is prepended).
    :return: (B, J) degrees.
    """
    b = pose.shape[0]
    dummy_root = jnp.zeros((b, 3), pose.dtype)
    pw = jnp.concatenate([dummy_root, pose], axis=-1)
    pw_hat = jnp.concatenate([dummy_root, pose_hat], axis=-1)
    glob = local_to_global(pw, parents)  # aa, (B, (J+1)*3)
    glob_hat = local_to_global(pw_hat, parents)
    aa = glob.reshape(b, -1, 3)[:, 1:]
    aa_hat = glob_hat.reshape(b, -1, 3)[:, 1:]
    rad = rotation_intrinsic_distance_from_aa(aa, aa_hat)
    return jnp.rad2deg(rad)


@jax.jit
def _raw_aa_angles(pose: jnp.ndarray, pose_hat: jnp.ndarray) -> jnp.ndarray:
    """Per-joint geodesic angles (degrees) from RAW angle-axis (B, J*3) —
    no kinematic unroll (reference _compute_angular_dist, metrics.py:140-162)."""
    b = pose.shape[0]
    return jnp.rad2deg(rotation_intrinsic_distance_from_aa(
        pose.reshape(b, -1, 3), pose_hat.reshape(b, -1, 3)))


@jax.jit
def _rotmat_angles(pose: jnp.ndarray, pose_hat: jnp.ndarray) -> jnp.ndarray:
    """Per-joint geodesic angles (degrees) from flattened rotmats (B, J*9)."""
    from empose_tpu.ops.so3 import so3_relative_angle
    b = pose.shape[0]
    r = pose.reshape(b, -1, 3, 3)
    r_hat = pose_hat.reshape(b, -1, 3, 3)
    return jnp.rad2deg(so3_relative_angle(r, r_hat))


# ---------------------------------------------------------------------------
# Device-resident sufficient statistics.
#
# The reference aggregation (metrics.py:289-330) only ever needs, per joint,
# the error SUM, the error SUM OF SQUARES, and the valid-frame COUNT:
#   mean  = mean_j(sum_j / n)                    (per-joint means, then subset mean)
#   std   = sqrt(E[e^2] - E[e]^2) over the (n x |subset|) raw error matrix.
# Accumulating those inside the jitted per-chunk program makes the whole eval
# pass device-resident: ONE host readback per sequence instead of ~10 blocking
# syncs per chunk (each a tunnel RTT). The host MetricsEngine above stays as
# the parity oracle (tests pin stats-path metrics against it).
# ---------------------------------------------------------------------------

N_EUCL_JOINTS = C.N_JOINTS + 1   # root + 21 body joints (reference metrics.py:82)
N_ANGLE_JOINTS = C.N_JOINTS      # body joints, root dropped (reference metrics.py:92)

# Same env gate as the model-side lane-major FK (nn/models.py): =0 reverts
# the stats path to row-major smplh_fk + local_to_global for attribution.
import os as _os_lanes
_USE_LANE_FK = _os_lanes.environ.get("EMPOSE_FK_LANES", "1") != "0"


def metric_stats_init(n_seqs: int = None) -> Dict[str, jnp.ndarray]:
    """Zeroed sufficient-statistics pytree (jit-carryable).

    :param n_seqs: None for pass-aggregate stats (scalar n, (J,) sums —
      the r04 serial path); an int for PER-SEQUENCE stats with a leading
      sequence axis ((n_seqs,) n, (n_seqs, J) sums — the batched eval pass,
      which flushes per-sequence rows from one readback).
    """
    lead = () if n_seqs is None else (n_seqs,)
    z = lambda *s: jnp.zeros(lead + s, jnp.float32)  # noqa: E731
    return {
        "n": z(),
        "eucl_sum": z(N_EUCL_JOINTS), "eucl_sq": z(N_EUCL_JOINTS),
        "pa_sum": z(N_EUCL_JOINTS), "pa_sq": z(N_EUCL_JOINTS),
        "ang_sum": z(N_ANGLE_JOINTS), "ang_sq": z(N_ANGLE_JOINTS),
    }


def _valid_mask_device(n: int, f: int, seq_lengths, frame_mask) -> jnp.ndarray:
    """(N, F) bool validity mask — device twin of MetricsEngine._valid_mask."""
    if seq_lengths is None:
        mask = jnp.ones((n, f), bool)
    else:
        mask = jnp.arange(f)[None, :] < seq_lengths[:, None]
    if frame_mask is not None:
        fm = frame_mask
        if fm.ndim == 3:
            fm = ~jnp.any(fm == 0, axis=-1)
        mask = mask & fm.astype(bool)
    return mask


def metric_stats_update(smpl, stats: Dict[str, jnp.ndarray], pose, shape, pose_hat,
                        shape_hat=None, seq_lengths=None, pose_root=None,
                        pose_root_hat=None, frame_mask=None,
                        per_sample: bool = False) -> Dict[str, jnp.ndarray]:
    """Jittable masked accumulation over one (N, F) window.

    Same inputs/semantics as :meth:`MetricsEngine.compute` (reference
    metrics.py:183-241): FK on GT and predicted params, per-joint Euclidean /
    Procrustes-aligned / global-orientation-geodesic errors, summed over the
    valid frames only.

    :param shape: (N, n_betas) per-sequence GT betas.
    :param shape_hat: (N, n_betas) predicted betas (chunk-0-frozen upstream),
      (N, F, n_betas) per-frame estimates (the trainer's valid pass), or
      None to reuse GT shape.
    :param per_sample: sum over FRAMES only, keeping the batch axis —
      ``stats`` must come from ``metric_stats_init(n)``. This is the batched
      eval pass's mode: per-sequence rows from one readback.
    """
    n, f = pose.shape[0], pose.shape[1]
    if shape_hat is None:
        shape_hat = shape
    mask2 = _valid_mask_device(n, f, seq_lengths, frame_mask)
    mask = mask2.reshape(n * f)

    rows = n * f

    def flat_shape(s):
        # (N, B) per-sequence or (N, F, B) per-frame (MetricsEngine.compute's
        # pad_shape twin, metrics.py host engine above).
        if s.ndim == 3:
            return s.reshape(rows, -1)
        return jnp.broadcast_to(s[:, None], (n, f, s.shape[-1])).reshape(rows, -1)

    p = pose.reshape(rows, -1)
    p_hat = pose_hat.reshape(rows, -1)
    s = flat_shape(shape)
    s_hat = flat_shape(shape_hat)
    if pose_root is None:
        r = jnp.zeros((rows, 3), p.dtype)
        r_hat = r
    else:
        r = pose_root.reshape(rows, 3)
        r_hat = pose_root_hat.reshape(rows, 3)

    if _USE_LANE_FK:
        # Lane-major body-subtree kinematics: ONE level-parallel compose per
        # side yields the world joints AND the identity-root global
        # orientations the angle metric needs — ~10x the row-major FK +
        # local_to_global pair on TPU (tile-padding waste; fk_lanes module
        # docstring). Pinned at HIGHEST precision; EMPOSE_FK_LANES=0 falls
        # back to the row-major path for attribution (the host MetricsEngine
        # oracle below always uses row-major).
        from empose_tpu.ops.fk_lanes import lane_metric_fk
        from empose_tpu.ops.so3 import so3_log_map
        jt = smpl.j_template[:N_EUCL_JOINTS]
        jsd = smpl.j_shapedirs[:N_EUCL_JOINTS]
        parents = tuple(int(x) for x in smpl.parents[:N_EUCL_JOINTS])
        kp, glob = lane_metric_fk(jt, jsd, parents, p, s, r)
        kp_hat, glob_hat = lane_metric_fk(jt, jsd, parents, p_hat, s_hat, r_hat)
        aa = so3_log_map(glob)
        aa_hat = so3_log_map(glob_hat)
        angles = jnp.rad2deg(rotation_intrinsic_distance_from_aa(aa, aa_hat))
    else:
        _, kp = smplh_fk(smpl, p, s, r, want_vertices=False)
        _, kp_hat = smplh_fk(smpl, p_hat, s_hat, r_hat, want_vertices=False)
        kp = kp[:, :N_EUCL_JOINTS]
        kp_hat = kp_hat[:, :N_EUCL_JOINTS]
        angles = _angle_dists(p, p_hat, C.SMPL_PARENTS)

    diff = kp - kp_hat
    eucl = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    kp_hat_pa = _procrustes_batch(kp, kp_hat)
    diff_pa = kp - kp_hat_pa
    eucl_pa = jnp.sqrt(jnp.sum(diff_pa * diff_pa, axis=-1))

    if per_sample:
        def acc(x):
            x = jnp.where(mask[:, None], x, 0.0)
            return jnp.sum(x.reshape(n, f, x.shape[-1]), axis=1)
        n_new = stats["n"] + jnp.sum(mask2.astype(jnp.float32), axis=1)
    else:
        def acc(x):
            return jnp.sum(jnp.where(mask[:, None], x, 0.0), axis=0)
        n_new = stats["n"] + jnp.sum(mask.astype(jnp.float32))

    return {
        "n": n_new,
        "eucl_sum": stats["eucl_sum"] + acc(eucl),
        "eucl_sq": stats["eucl_sq"] + acc(eucl * eucl),
        "pa_sum": stats["pa_sum"] + acc(eucl_pa),
        "pa_sq": stats["pa_sq"] + acc(eucl_pa * eucl_pa),
        "ang_sum": stats["ang_sum"] + acc(angles),
        "ang_sq": stats["ang_sq"] + acc(angles * angles),
    }


def metric_stats_merge(a: Dict, b: Dict) -> Dict:
    """Host-side f64 merge of two stats pytrees (overall = Σ per-sequence)."""
    return {k: np.asarray(a[k], np.float64) + np.asarray(b[k], np.float64) for k in a}


def metric_stats_select(stats: Dict, i: int) -> Dict:
    """Row ``i`` of a per-sequence stats pytree -> scalar-form stats."""
    return {k: np.asarray(v)[i] for k, v in stats.items()}


def metric_stats_reduce(stats: Dict) -> Dict:
    """Sum a per-sequence stats pytree over its leading axis (f64) ->
    scalar-form stats for the 'Overall average' row."""
    return {k: np.asarray(v, np.float64).sum(axis=0) for k, v in stats.items()}


def metrics_from_stats(stats: Dict) -> Dict[str, float]:
    """Aggregate sufficient statistics to the reference's metric dict.

    Exactly :meth:`MetricsEngine.get_metrics` semantics (reference
    metrics.py:289-330), computed from (Σe, Σe², n) in float64.
    """
    st = {k: np.asarray(v, np.float64) for k, v in stats.items()}
    n = float(st["n"])
    if n == 0:
        return {"MPJPE [mm]": 0.0, "MPJPE STD": 0.0, "PA-MPJPE [mm]": 0.0,
                "PA-MPJPE STD": 0.0, "MPJAE [deg]": 0.0, "MPJAE STD": 0.0}

    def agg(sum_j, sq_j, idxs):
        mean = float(np.mean(sum_j[idxs] / n))
        k = n * len(idxs)
        m1 = sum_j[idxs].sum() / k
        m2 = sq_j[idxs].sum() / k
        return mean, float(np.sqrt(max(m2 - m1 * m1, 0.0)))

    e_mean, e_std = agg(st["eucl_sum"], st["eucl_sq"], list(EUCL_IDXS))
    pa_mean, pa_std = agg(st["pa_sum"], st["pa_sq"], list(EUCL_IDXS))
    a_mean, a_std = agg(st["ang_sum"], st["ang_sq"], list(ANGLE_IDXS))
    return {
        "MPJPE [mm]": e_mean * 1000.0,
        "MPJPE STD": e_std * 1000.0,
        "PA-MPJPE [mm]": pa_mean * 1000.0,
        "PA-MPJPE STD": pa_std * 1000.0,
        "MPJAE [deg]": a_mean,
        "MPJAE STD": a_std,
    }


class MetricsEngine:
    """Accumulate per-frame errors across batches, aggregate at the end.

    API shape follows the reference engine (metrics.py:69-346) but all
    computation is batched/jitted.
    """

    def __init__(self, smpl_model):
        """:param smpl_model: SMPLHModel pytree (full mesh or any subset —
        only joints are used)."""
        # The model is a jit ARGUMENT of the fk calls; host-numpy leaves
        # (HOST-CONSTANTS RULE, bodymodel/smplh.py) would re-upload the full
        # tables every call — put them on device once (h2d only).
        self.smpl = jax.device_put(smpl_model)
        self.eucl_dists: List[np.ndarray] = []
        self.eucl_dists_pa: List[np.ndarray] = []
        self.angle_diffs: List[np.ndarray] = []
        self._stats_override = None
        self._fk = jax.jit(partial(smplh_fk, want_vertices=False))
        self._angles = jax.jit(partial(_angle_dists, parents=C.SMPL_PARENTS))

    def reset(self):
        self.eucl_dists = []
        self.eucl_dists_pa = []
        self.angle_diffs = []
        self._stats_override = None

    def set_stats(self, host_stats: Dict) -> None:
        """Inject device-accumulated sufficient statistics.

        Callers that run the stats path (one device sync per pass instead of
        per-chunk ``np.asarray``s — Trainer.evaluate_valid/evaluate_test)
        hand the aggregated pytree here so downstream ``get_metrics()``
        consumers stay unchanged. Cleared by :meth:`reset`.
        """
        self._stats_override = host_stats

    @staticmethod
    def _valid_mask(n, f, seq_lengths, frame_mask) -> np.ndarray:
        mask = np.arange(f)[None, :] < np.asarray(
            seq_lengths if seq_lengths is not None else np.full(n, f))[:, None]
        if frame_mask is not None:
            fm = np.asarray(frame_mask)
            if fm.ndim == 3:
                fm = ~np.any(fm == 0, axis=-1)
            mask = mask & fm.astype(bool)
        return mask

    def compute(self, pose, shape, pose_hat, shape_hat=None, seq_lengths=None,
                pose_root=None, pose_root_hat=None, frame_mask=None):
        """Reference metrics.py:183-241. pose: (N, F, 63) body pose (no root)."""
        pose = np.asarray(pose)
        n, f = pose.shape[0], pose.shape[1]
        if shape_hat is None:
            shape_hat = shape
        mask = self._valid_mask(n, f, seq_lengths, frame_mask)
        if mask.sum() == 0:
            return

        def flat(x):
            return np.asarray(x)[mask]

        def pad_shape(s):
            s = np.asarray(s)
            if s.ndim == 3:
                return s[mask]
            return np.broadcast_to(s[:, None], (n, f, s.shape[-1]))[mask]

        p = flat(pose)
        p_hat = flat(np.asarray(pose_hat))
        s = pad_shape(shape)
        s_hat = pad_shape(shape_hat)
        if pose_root is None:
            r = np.zeros((p.shape[0], 3), p.dtype)
            r_hat = r
        else:
            r = flat(np.asarray(pose_root))
            r_hat = flat(np.asarray(pose_root_hat))

        # Bucket the row count: the valid-frame count is data-dependent, and
        # an unpadded jit would recompile per distinct count (minutes each on
        # remote-compile TPU setups). Zero-padded rows are sliced off below.
        count = p.shape[0]
        bucket = _round_up_rows(count)

        def padr(x):
            return np.pad(x, [(0, bucket - count), (0, 0)])

        # device_put (async enqueue) instead of jnp.asarray (blocks one
        # tunnel RTT per array): the downstream np.asarray readback is the
        # only sync.
        d_p, d_s, d_r, d_ph, d_sh, d_rh = jax.device_put(
            (padr(p), padr(s), padr(r), padr(p_hat), padr(s_hat), padr(r_hat)))
        _, kp3d = self._fk(self.smpl, d_p, d_s, d_r)
        _, kp3d_hat = self._fk(self.smpl, d_ph, d_sh, d_rh)
        kp3d = kp3d[:, : C.N_JOINTS + 1]
        kp3d_hat = kp3d_hat[:, : C.N_JOINTS + 1]

        eucl, eucl_pa = _eucl_dists(kp3d, kp3d_hat)
        self.eucl_dists.append(np.asarray(eucl)[:count])
        self.eucl_dists_pa.append(np.asarray(eucl_pa)[:count])
        angles = self._angles(d_p, d_ph)
        self.angle_diffs.append(np.asarray(angles)[:count])

    def compute_joint_dist(self, joints, joints_hat, seq_lengths=None, frame_mask=None):
        """Positional metrics from precomputed joints (reference metrics.py:243-265)."""
        joints = np.asarray(joints)
        n, f = joints.shape[0], joints.shape[1]
        mask = self._valid_mask(n, f, seq_lengths, frame_mask)
        if mask.sum() == 0:
            return
        kp = joints[mask].reshape(-1, joints.shape[-1] // 3, 3)[:, : C.N_JOINTS + 1]
        kp_hat = np.asarray(joints_hat)[mask].reshape(kp.shape[0], -1, 3)[:, : C.N_JOINTS + 1]
        count = kp.shape[0]
        bucket = _round_up_rows(count)
        pad = [(0, bucket - count), (0, 0), (0, 0)]
        eucl, eucl_pa = _eucl_dists(jnp.asarray(np.pad(kp, pad)), jnp.asarray(np.pad(kp_hat, pad)))
        self.eucl_dists.append(np.asarray(eucl)[:count])
        self.eucl_dists_pa.append(np.asarray(eucl_pa)[:count])

    def compute_angle_dist(self, pose, pose_hat, seq_lengths=None, frame_mask=None, rep="aa"):
        """Angular metric only (reference metrics.py:267-287).

        :param rep: 'aa' (angle-axis, via the local->global unroll like
          ``compute``) or 'rotmat' (direct per-joint geodesic angles).
        """
        assert rep in ("aa", "rotmat")
        pose = np.asarray(pose)
        n, f = pose.shape[0], pose.shape[1]
        mask = self._valid_mask(n, f, seq_lengths, frame_mask)
        if mask.sum() == 0:
            return
        p = pose[mask]
        p_hat = np.asarray(pose_hat)[mask]
        count = p.shape[0]
        bucket = _round_up_rows(count)
        pad = [(0, bucket - count), (0, 0)]
        if rep == "rotmat":
            angles = _rotmat_angles(jnp.asarray(np.pad(p, pad)), jnp.asarray(np.pad(p_hat, pad)))
        else:
            angles = _raw_aa_angles(jnp.asarray(np.pad(p, pad)), jnp.asarray(np.pad(p_hat, pad)))
        self.angle_diffs.append(np.asarray(angles)[:count])

    def get_metrics(self, eucl_idxs_select: bool = True, angle_idxs_select: bool = True) -> Dict[str, float]:
        """Aggregate (reference metrics.py:289-330): means over joints-subset."""
        if self._stats_override is not None:
            # Injected sufficient statistics are always eval-subset sums;
            # the full-joint variants have no stats form.
            assert eucl_idxs_select and angle_idxs_select, \
                "stats-backed metrics only support the eval joint subsets"
            return metrics_from_stats(self._stats_override)
        if self.eucl_dists:
            eucl = np.concatenate(self.eucl_dists, axis=0)
            eucl_pa = np.concatenate(self.eucl_dists_pa, axis=0)
            idxs = list(EUCL_IDXS) if eucl_idxs_select else list(range(eucl.shape[1]))
            eucl_mean = float(np.mean(np.mean(eucl, axis=0)[idxs]))
            eucl_std = float(np.std(eucl[:, idxs]))
            eucl_pa_mean = float(np.mean(np.mean(eucl_pa, axis=0)[idxs]))
            eucl_pa_std = float(np.std(eucl_pa[:, idxs]))
        else:
            eucl_mean = eucl_std = eucl_pa_mean = eucl_pa_std = 0.0

        if self.angle_diffs:
            ang = np.concatenate(self.angle_diffs, axis=0)
            aidx = list(ANGLE_IDXS) if angle_idxs_select else list(range(ang.shape[1]))
            ang_mean = float(np.mean(np.mean(ang, axis=0)[aidx]))
            ang_std = float(np.std(ang[:, aidx]))
        else:
            ang_mean = ang_std = 0.0

        return {
            "MPJPE [mm]": eucl_mean * 1000.0,
            "MPJPE STD": eucl_std * 1000.0,
            "PA-MPJPE [mm]": eucl_pa_mean * 1000.0,
            "PA-MPJPE STD": eucl_pa_std * 1000.0,
            "MPJAE [deg]": ang_mean,
            "MPJAE STD": ang_std,
        }

    @staticmethod
    def to_pretty_string(metrics: Dict[str, float], model_name) -> str:
        from tabulate import tabulate
        headers = list(metrics.keys())
        values = [metrics[k] for k in headers]
        return tabulate([[model_name] + values], headers=["Model"] + headers)

    @staticmethod
    def to_log_dict(metrics: Dict[str, float], prefix: str = "") -> Dict[str, float]:
        return {
            f"metrics/{prefix}/mje mean": metrics["MPJPE [mm]"],
            f"metrics/{prefix}/mje pa mean": metrics["PA-MPJPE [mm]"],
            f"metrics/{prefix}/mae mean": metrics["MPJAE [deg]"],
        }
