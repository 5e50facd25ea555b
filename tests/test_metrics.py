"""Metrics engine vs brute-force numpy oracles."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from empose_tpu import constants as C
from empose_tpu.eval import metrics as ME


def np_procrustes(X, Y):
    """Independent numpy Procrustes with optimal scale (oracle)."""
    muX, muY = X.mean(0), Y.mean(0)
    X0, Y0 = X - muX, Y - muY
    normX = np.sqrt((X0 ** 2).sum())
    normY = np.sqrt((Y0 ** 2).sum())
    X0, Y0 = X0 / normX, Y0 / normY
    A = X0.T @ Y0
    U, s, Vt = np.linalg.svd(A, full_matrices=False)
    V = Vt.T
    detT = np.linalg.det(V @ U.T)
    V[:, -1] *= np.sign(detT)
    s[-1] *= np.sign(detT)
    T = V @ U.T
    return normX * s.sum() * (Y0 @ T) + muX


def test_procrustes_matches_oracle():
    rng = np.random.RandomState(0)
    X = rng.randn(20, 3).astype(np.float32)
    Y = rng.randn(20, 3).astype(np.float32)
    Z = np.asarray(ME.procrustes_align(jnp.asarray(X), jnp.asarray(Y)))
    np.testing.assert_allclose(Z, np_procrustes(X.astype(np.float64), Y.astype(np.float64)), atol=1e-4)


def test_procrustes_recovers_similarity_transform():
    rng = np.random.RandomState(1)
    X = rng.randn(15, 3).astype(np.float32)
    R = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix().astype(np.float32)
    Y = 2.0 * X @ R.T + np.asarray([1.0, -2.0, 0.5], np.float32)
    Z = np.asarray(ME.procrustes_align(jnp.asarray(X), jnp.asarray(Y)))
    np.testing.assert_allclose(Z, X, atol=1e-4)


def test_angle_dists_known_rotation():
    rng = np.random.RandomState(2)
    b, j = 4, C.N_JOINTS
    pose = (rng.randn(b, j * 3) * 0.2).astype(np.float32)
    # Perturb ONLY the first joint (l_hip, a root child): its global orientation
    # moves by exactly delta, and every DESCENDANT inherits a changed global
    # orientation too — but identical relative rotation, so the geodesic
    # distance of the first joint is delta.
    delta = 0.25
    pose_hat = pose.copy()
    r0 = Rotation.from_rotvec(pose[:, :3])
    r0_new = r0 * Rotation.from_rotvec(np.asarray([[0, 0, delta]] * b))
    pose_hat[:, :3] = r0_new.as_rotvec().astype(np.float32)
    d = np.asarray(ME._angle_dists(jnp.asarray(pose), jnp.asarray(pose_hat), C.SMPL_PARENTS))
    np.testing.assert_allclose(d[:, 0], np.rad2deg(delta), atol=1e-3)


def test_engine_accumulate_and_aggregate(smplh_model):
    engine = ME.MetricsEngine(smplh_model)
    rng = np.random.RandomState(3)
    n, f = 2, 4
    pose = (rng.randn(n, f, 63) * 0.2).astype(np.float32)
    shape = (rng.randn(n, 10) * 0.3).astype(np.float32)
    pose_hat = pose + rng.randn(n, f, 63).astype(np.float32) * 0.01
    root = (rng.randn(n, f, 3) * 0.2).astype(np.float32)

    engine.compute(pose, shape, pose_hat, None, np.asarray([f, f - 1]), root, root)
    m = engine.get_metrics()
    assert m["MPJPE [mm]"] > 0 and m["MPJAE [deg]"] > 0
    # Identical inputs -> exactly zero errors.
    engine.reset()
    engine.compute(pose, shape, pose, None, np.asarray([f, f]), root, root)
    m = engine.get_metrics()
    assert m["MPJPE [mm]"] < 1e-3
    assert m["MPJAE [deg]"] < 0.2  # arccos near 1 is noisy in f32


def test_engine_mask_excludes_frames(smplh_model):
    engine = ME.MetricsEngine(smplh_model)
    rng = np.random.RandomState(4)
    n, f = 1, 4
    pose = (rng.randn(n, f, 63) * 0.2).astype(np.float32)
    shape = np.zeros((n, 10), np.float32)
    pose_hat = pose.copy()
    pose_hat[:, 2] += 10.0  # corrupt frame 2
    marker_mask = np.ones((n, f, 12), np.float32)
    marker_mask[:, 2, 3] = 0.0  # frame 2 has a missing marker -> excluded
    engine.compute(pose, shape, pose_hat, None, np.asarray([f]), frame_mask=marker_mask)
    m = engine.get_metrics()
    assert m["MPJPE [mm]"] < 1e-3


def test_compute_joint_dist(smplh_model):
    engine = ME.MetricsEngine(smplh_model)
    rng = np.random.RandomState(5)
    joints = rng.randn(2, 3, 66).astype(np.float32)
    offset = 0.01
    joints_hat = joints + offset
    engine.compute_joint_dist(joints, joints_hat, np.asarray([3, 3]))
    m = engine.get_metrics()
    # Constant offset: raw MPJPE = sqrt(3)*offset*1000 mm; PA removes it.
    np.testing.assert_allclose(m["MPJPE [mm]"], np.sqrt(3) * offset * 1000, rtol=1e-3)
    assert m["PA-MPJPE [mm]"] < m["MPJPE [mm]"]


def test_compute_angle_dist_rotmat(smplh_model):
    engine = ME.MetricsEngine(smplh_model)
    rng = np.random.RandomState(6)
    n, f, j = 1, 3, 4
    aa = (rng.randn(n * f * j, 3) * 0.3).astype(np.float32)
    R = Rotation.from_rotvec(aa)
    delta = 0.2
    R_hat = R * Rotation.from_rotvec(np.asarray([[delta, 0, 0]] * (n * f * j)))
    pose = R.as_matrix().reshape(n, f, j * 9).astype(np.float32)
    pose_hat = R_hat.as_matrix().reshape(n, f, j * 9).astype(np.float32)
    engine.compute_angle_dist(pose, pose_hat, np.asarray([f]), rep="rotmat")
    m = engine.get_metrics(angle_idxs_select=False)
    np.testing.assert_allclose(m["MPJAE [deg]"], np.rad2deg(delta), rtol=1e-3)


@pytest.mark.slow
def test_metric_stats_rowmajor_fallback(smplh_model, monkeypatch):
    """EMPOSE_FK_LANES=0 metric path (row-major smplh_fk + local_to_global)
    == the default lane-major kinematics, same stats either way."""
    import jax
    rng = np.random.RandomState(21)
    smpl_dev = jax.device_put(smplh_model)
    n, f = 2, 3
    pose = (rng.randn(n, f, 63) * 0.2).astype(np.float32)
    shape = (rng.randn(n, 10) * 0.3).astype(np.float32)
    pose_hat = pose + rng.randn(n, f, 63).astype(np.float32) * 0.02
    root = (rng.randn(n, f, 3) * 0.2).astype(np.float32)
    root_hat = root + rng.randn(n, f, 3).astype(np.float32) * 0.01
    lengths = np.asarray([f, f - 1], np.int32)
    args = (jnp.asarray(pose), jnp.asarray(shape), jnp.asarray(pose_hat), None,
            jnp.asarray(lengths), jnp.asarray(root), jnp.asarray(root_hat))

    lane = jax.device_get(
        ME.metric_stats_update(smpl_dev, ME.metric_stats_init(), *args))
    monkeypatch.setattr(ME, "_USE_LANE_FK", False)
    row = jax.device_get(
        ME.metric_stats_update(smpl_dev, ME.metric_stats_init(), *args))
    for k in lane:
        np.testing.assert_allclose(lane[k], row[k], rtol=2e-4, atol=2e-4,
                                   err_msg=k)


def test_horn_procrustes_matches_svd():
    """Batched Horn-quaternion Procrustes == the vmapped det-corrected SVD
    path on random, reflection-dominant, and degenerate point sets — the
    aligned outputs agree elementwise, and degenerate inputs stay finite."""
    import jax
    rng = np.random.RandomState(3)
    X = rng.randn(64, 22, 3).astype(np.float32)
    Y = rng.randn(64, 22, 3).astype(np.float32)
    # Reflection-dominant pairs (negative-determinant cross-covariance):
    # the det correction must engage identically in both solvers.
    Y[32:48] = X[32:48] * np.asarray([1, 1, -1], np.float32)
    # Near-planar sets (rank-2 covariance).
    X[48:56, :, 2] = 0.0
    Y[48:56, :, 2] = 0.0
    Z_horn = np.asarray(ME.procrustes_align_batched(jnp.asarray(X), jnp.asarray(Y)))
    Z_svd = np.asarray(jax.vmap(ME.procrustes_align)(jnp.asarray(X), jnp.asarray(Y)))
    np.testing.assert_allclose(Z_horn, Z_svd, rtol=1e-3, atol=1e-4)

    # All-points-equal (zero-norm) rows: finite output, like the SVD guard.
    Xz = np.zeros((4, 22, 3), np.float32)
    Z = np.asarray(ME.procrustes_align_batched(jnp.asarray(Xz), jnp.asarray(Xz)))
    assert np.all(np.isfinite(Z))


def test_metric_stats_match_engine(smplh_model):
    """Device sufficient-statistics path == host MetricsEngine (the oracle).

    Same inputs through MetricsEngine.compute and metric_stats_update /
    metrics_from_stats, accumulated over two windows with masks, shape
    estimates, and root poses — every metric agrees to float32 tolerance.
    """
    import jax
    engine = ME.MetricsEngine(smplh_model)
    rng = np.random.RandomState(7)
    stats = ME.metric_stats_init()
    smpl_dev = jax.device_put(smplh_model)
    update = jax.jit(ME.metric_stats_update)

    for chunk in range(2):
        n, f = 2, 5
        pose = (rng.randn(n, f, 63) * 0.2).astype(np.float32)
        shape = (rng.randn(n, 10) * 0.3).astype(np.float32)
        shape_hat = shape + rng.randn(n, 10).astype(np.float32) * 0.05
        pose_hat = pose + rng.randn(n, f, 63).astype(np.float32) * 0.02
        root = (rng.randn(n, f, 3) * 0.2).astype(np.float32)
        root_hat = root + rng.randn(n, f, 3).astype(np.float32) * 0.01
        lengths = np.asarray([f, f - 2], np.int32)
        marker_mask = np.ones((n, f, 12), np.float32)
        marker_mask[0, 1, 4] = 0.0  # one frame excluded by sensor mask

        engine.compute(pose, shape, pose_hat, shape_hat, lengths, root, root_hat,
                       frame_mask=marker_mask)
        stats = update(smpl_dev, stats, jnp.asarray(pose), jnp.asarray(shape),
                       jnp.asarray(pose_hat), jnp.asarray(shape_hat),
                       jnp.asarray(lengths), jnp.asarray(root), jnp.asarray(root_hat),
                       jnp.asarray(marker_mask))

    m_engine = engine.get_metrics()
    m_stats = ME.metrics_from_stats(jax.device_get(stats))
    assert set(m_engine) == set(m_stats)
    for k in m_engine:
        np.testing.assert_allclose(m_stats[k], m_engine[k], rtol=2e-4, atol=2e-3,
                                   err_msg=k)


@pytest.mark.slow
def test_metric_stats_per_sample(smplh_model):
    """Per-sample stats (batched eval pass) are exact decompositions of the
    aggregate stats: reduce(per_sample) == aggregate update, and each
    selected row equals the aggregate stats of that sample alone."""
    import jax
    rng = np.random.RandomState(11)
    smpl_dev = jax.device_put(smplh_model)
    n, f = 3, 4
    pose = (rng.randn(n, f, 63) * 0.2).astype(np.float32)
    shape = (rng.randn(n, 10) * 0.3).astype(np.float32)
    pose_hat = pose + rng.randn(n, f, 63).astype(np.float32) * 0.02
    root = (rng.randn(n, f, 3) * 0.2).astype(np.float32)
    root_hat = root + rng.randn(n, f, 3).astype(np.float32) * 0.01
    lengths = np.asarray([f, f - 1, f - 3], np.int32)

    args = (jnp.asarray(pose), jnp.asarray(shape), jnp.asarray(pose_hat), None,
            jnp.asarray(lengths), jnp.asarray(root), jnp.asarray(root_hat))
    per = ME.metric_stats_update(smpl_dev, ME.metric_stats_init(n), *args,
                                 per_sample=True)
    agg = ME.metric_stats_update(smpl_dev, ME.metric_stats_init(), *args)

    per_h, agg_h = jax.device_get((per, agg))
    red = ME.metric_stats_reduce(per_h)
    for k in agg_h:
        np.testing.assert_allclose(red[k], np.asarray(agg_h[k], np.float64),
                                   rtol=1e-5, atol=1e-5, err_msg=k)

    # Row i == aggregate stats of sample i alone.
    for i in range(n):
        solo = ME.metric_stats_update(
            smpl_dev, ME.metric_stats_init(),
            jnp.asarray(pose[i:i + 1]), jnp.asarray(shape[i:i + 1]),
            jnp.asarray(pose_hat[i:i + 1]), None,
            jnp.asarray(lengths[i:i + 1]), jnp.asarray(root[i:i + 1]),
            jnp.asarray(root_hat[i:i + 1]))
        solo_h = jax.device_get(solo)
        row = ME.metric_stats_select(per_h, i)
        for k in solo_h:
            np.testing.assert_allclose(row[k], solo_h[k], rtol=1e-4, atol=1e-5,
                                       err_msg=f"sample {i} {k}")


def test_metric_stats_empty_and_degenerate():
    """Zero valid frames -> all-zero metrics, no NaN from the masked rows."""
    import jax
    stats = ME.metric_stats_init()
    m = ME.metrics_from_stats(jax.device_get(stats))
    assert all(v == 0.0 for v in m.values())
    # Degenerate Procrustes input (all points equal) stays finite.
    X = jnp.zeros((20, 3))
    Z = np.asarray(ME.procrustes_align(X, X))
    assert np.all(np.isfinite(Z))
