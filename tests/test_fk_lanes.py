"""Lane-major FK+sensor path (ops/fk_lanes.py) vs the row-major reference path.

The LGD loop's hot FK (reference models.py:471-483) runs lane-major on TPU;
these tests pin its agreement with the row-major implementation — forward
outputs, gradients, and the IEF model end-to-end with lanes on vs off.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from empose_tpu import constants as C
from empose_tpu.nn.models import SensorSMPL


def _random_inputs(rng, n, m=12):
    poses = (rng.randn(n, 66) * 0.2).astype(np.float32)
    shapes = (rng.randn(n, 10) * 0.2).astype(np.float32)
    q = rng.randn(n, m, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    offset_r = np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        -1).reshape(n, m, 3, 3).astype(np.float32)
    offset_t = (rng.randn(n, m, 3) * 0.02).astype(np.float32)
    return (jnp.asarray(poses), jnp.asarray(shapes),
            jnp.asarray(offset_r), jnp.asarray(offset_t))


@pytest.fixture(scope="module")
def sensor(smplh_model):
    return SensorSMPL(smplh_model)


def _row_major(sensor, poses, shapes, offset_r, offset_t):
    from jax import lax
    pos, ori, _, joints = sensor.markers_and_joints_row_major(poses, shapes)
    ori_corr = jnp.matmul(ori, offset_r, precision=lax.Precision.HIGHEST)
    pos_corr = pos + jnp.squeeze(
        jnp.matmul(ori, offset_t[..., None], precision=lax.Precision.HIGHEST), -1)
    return pos_corr, ori_corr, joints


def test_lanes_forward_matches_row_major(sensor):
    rng = np.random.RandomState(3)
    poses, shapes, offset_r, offset_t = _random_inputs(rng, 256)

    a = jax.jit(lambda *xs: _row_major(sensor, *xs))(poses, shapes, offset_r, offset_t)
    orr, ott = sensor.lane_fk.prepare_offsets(offset_r, offset_t)
    b = jax.jit(sensor.lane_fk)(poses, shapes, orr, ott)

    # Joints share no frame construction: near-exact.
    np.testing.assert_allclose(np.asarray(a[2]), np.asarray(b[2]), atol=2e-6)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-4)
    # Frame entries are f32-conditioning-limited on near-degenerate normals in
    # BOTH paths (each sits ~3e-5 p99.9 from a float64 oracle); allow the
    # mutual worst-case tail.
    d_ori = np.abs(np.asarray(a[1]) - np.asarray(b[1]))
    assert np.quantile(d_ori, 0.999) < 2e-4
    assert d_ori.max() < 5e-3


def test_raw_frames_matches_row_major(sensor):
    """The datagen entry point (pre-offset frames + normals + joints, with a
    nonzero root translation) — lane vs row-major."""
    rng = np.random.RandomState(9)
    poses, shapes, _, _ = _random_inputs(rng, 192)
    trans = jnp.asarray((rng.randn(192, 3) * 0.5).astype(np.float32))

    a = jax.jit(lambda p, s, t: sensor.markers_and_joints_row_major(p, s, t))(
        poses, shapes, trans)
    b = jax.jit(lambda p, s, t: sensor.lane_fk.raw_frames(p, s, t))(
        poses, shapes, trans)

    np.testing.assert_allclose(np.asarray(a[3]), np.asarray(b[3]), atol=2e-6)  # joints
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-4)  # pos
    for ai, bi, name in ((a[1], b[1], "frames"), (a[2], b[2], "normals")):
        d = np.abs(np.asarray(ai) - np.asarray(bi))
        assert np.quantile(d, 0.999) < 2e-4, name
        assert d.max() < 5e-3, name


def test_lanes_gradients_match_row_major(sensor):
    rng = np.random.RandomState(4)
    poses, shapes, offset_r, offset_t = _random_inputs(rng, 128)
    targets_p = jnp.asarray(rng.randn(128, 12, 3).astype(np.float32))
    targets_o = jnp.asarray(rng.randn(128, 12, 3, 3).astype(np.float32))

    def loss_row(p, s):
        mp, mo, _ = _row_major(sensor, p, s, offset_r, offset_t)
        return jnp.mean((mp - targets_p) ** 2) + jnp.mean((mo - targets_o) ** 2)

    orr, ott = sensor.lane_fk.prepare_offsets(offset_r, offset_t)

    def loss_lane(p, s):
        mp, mo, _ = sensor.lane_fk(p, s, orr, ott)
        return jnp.mean((mp - targets_p) ** 2) + jnp.mean((mo - targets_o) ** 2)

    ga = jax.jit(jax.grad(loss_row, argnums=(0, 1)))(poses, shapes)
    gb = jax.jit(jax.grad(loss_lane, argnums=(0, 1)))(poses, shapes)
    for x, y, name in zip(ga, gb, ("pose", "shape")):
        x, y = np.asarray(x), np.asarray(y)
        scale = np.abs(x).max()
        assert np.abs(x - y).max() / scale < 2e-3, name
        cos = float((x * y).sum() / (np.linalg.norm(x) * np.linalg.norm(y)))
        assert cos > 0.999999, name


def _oracle_f64(sensor, pose, shape, offr, oft):
    """Float64 numpy implementation of estimated_markers (same conventions)."""
    sub = sensor.sub
    tb = sensor.tables
    J = sub.n_joints
    parents = sub.parents
    W = np.asarray(sub.weights, np.float64)
    p = np.asarray(pose, np.float64)
    s = np.asarray(shape, np.float64)
    n = p.shape[0]
    aa = p.reshape(n, J, 3)
    ang = np.linalg.norm(aa + 1e-8, axis=-1, keepdims=True)
    u = aa / ang
    c = np.cos(ang)[..., None]
    si = np.sin(ang)[..., None]
    K = np.zeros((n, J, 3, 3))
    K[..., 0, 1], K[..., 0, 2] = -u[..., 2], u[..., 1]
    K[..., 1, 0], K[..., 1, 2] = u[..., 2], -u[..., 0]
    K[..., 2, 0], K[..., 2, 1] = -u[..., 1], u[..., 0]
    I = np.eye(3)
    R = I + si * K + (1 - c) * (K @ K)
    j_rest = np.asarray(sub.j_template, np.float64)[None] + np.einsum(
        "jdb,nb->njd", np.asarray(sub.j_shapedirs, np.float64), s)
    Rg = np.zeros((n, J, 3, 3))
    tg = np.zeros((n, J, 3))
    Rg[:, 0], tg[:, 0] = R[:, 0], j_rest[:, 0]
    for j in range(1, J):
        pa = parents[j]
        Rg[:, j] = Rg[:, pa] @ R[:, j]
        tg[:, j] = np.einsum("nab,nb->na", Rg[:, pa], j_rest[:, j] - j_rest[:, pa]) + tg[:, pa]
    tsk = tg - np.einsum("njab,njb->nja", Rg, j_rest)
    v_rest = np.asarray(sub.v_template, np.float64)[None] + np.einsum(
        "vdb,nb->nvd", np.asarray(sub.shapedirs, np.float64), s)
    pfeat = (R[:, 1:] - I).reshape(n, -1)
    v_posed = v_rest + (pfeat @ np.asarray(sub.posedirs, np.float64)).reshape(n, -1, 3)
    Rw = np.einsum("vj,njab->nvab", W, Rg)
    tw = np.einsum("vj,nja->nva", W, tsk)
    verts = np.einsum("nvab,nvb->nva", Rw, v_posed) + tw
    fr = np.asarray(tb.sub_faces_rows)
    vf = np.asarray(tb.vertex_faces)
    vs = verts[:, fr]
    fn = np.cross(vs[:, :, 1] - vs[:, :, 0], vs[:, :, 2] - vs[:, :, 0])
    valid = vf >= 0
    nr = (fn[:, np.maximum(vf, 0)] * valid[None, :, :, None]).sum(-2) \
        / valid.sum(-1)[None, :, None]
    ns = nr / np.linalg.norm(nr, axis=-1, keepdims=True)
    mk = verts[:, np.asarray(tb.marker_rows)]
    hp = verts[:, np.asarray(tb.helper_rows)]
    osf = hp - mk
    osf = osf / np.linalg.norm(osf, axis=-1, keepdims=True)
    third = np.cross(ns, osf)
    third = third / np.linalg.norm(third, axis=-1, keepdims=True)
    osf2 = np.cross(third, ns)
    osf2 = osf2 / np.linalg.norm(osf2, axis=-1, keepdims=True)
    frames = np.stack([osf2, third, ns], -1)
    oc = frames @ np.asarray(offr, np.float64)
    pc = mk + (frames @ np.asarray(oft, np.float64)[..., None])[..., 0]
    return pc, oc, tg


def test_both_paths_match_float64_oracle(sensor):
    """Lanes AND row-major sit at the same f32 distance from float64 truth —
    the lane layout costs no accuracy."""
    rng = np.random.RandomState(6)
    poses, shapes, offset_r, offset_t = _random_inputs(rng, 256)
    g_pc, g_oc, g_j = _oracle_f64(sensor, poses, shapes, offset_r, offset_t)

    a = jax.jit(lambda *xs: _row_major(sensor, *xs))(poses, shapes, offset_r, offset_t)
    orr, ott = sensor.lane_fk.prepare_offsets(offset_r, offset_t)
    b = jax.jit(sensor.lane_fk)(poses, shapes, orr, ott)

    for out, name in ((a, "row-major"), (b, "lanes")):
        d_pos = np.abs(np.asarray(out[0], np.float64) - g_pc)
        d_ori = np.abs(np.asarray(out[1], np.float64) - g_oc)
        d_j = np.abs(np.asarray(out[2], np.float64) - g_j)
        assert d_j.max() < 2e-6, name
        assert d_pos.max() < 1e-4, name
        assert np.quantile(d_ori, 0.999) < 2e-4, name
        assert d_ori.max() < 5e-3, name


def test_fk_precision_knob(sensor):
    """set_fk_precision rebinds the kinematics GEMM precision for fresh
    traces and restores cleanly (the bf16 serving mode's FK half)."""
    from empose_tpu.ops import fk_lanes

    rng = np.random.RandomState(7)
    poses, shapes, offset_r, offset_t = _random_inputs(rng, 64)
    orr, ott = sensor.lane_fk.prepare_offsets(offset_r, offset_t)

    a = jax.jit(lambda *xs: sensor.lane_fk(*xs))(poses, shapes, orr, ott)
    try:
        fk_lanes.set_fk_precision("default")
        assert fk_lanes._HI == jax.lax.Precision.DEFAULT
        # Fresh closure: precision binds at trace time.
        b = jax.jit(lambda *xs: sensor.lane_fk(*xs))(poses, shapes, orr, ott)
    finally:
        fk_lanes.set_fk_precision("highest")
    assert fk_lanes._HI == jax.lax.Precision.HIGHEST

    # On the CPU test mesh DEFAULT is still f32 so agreement is tight; the
    # bound is kept loose enough (mm-scale outputs, bf16 mantissa ~3 digits)
    # that a TPU run of this test would also pass.
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(a[2]), np.asarray(b[2]), atol=2e-2)


@pytest.mark.slow
def test_ief_forward_lanes_toggle(smplh_model):
    """The full LGD model produces near-identical outputs with lanes on/off."""
    from empose_tpu.config import Configuration
    from empose_tpu.nn.models import create_model

    cfg = Configuration.from_dict(dict(
        m_type="lgd", m_rnn_init=True, m_use_gradient=True, m_average_shape=True,
        m_estimate_shape=False, m_num_iterations=2, m_hidden_size=32, m_num_layers=1,
        m_rnn_hidden_size=16, m_rnn_num_layers=1, m_rnn_bidirectional=False,
        m_step_size=0.1, m_reprojection_loss_weight=0.01, m_fk_loss=0.1,
        m_pose_loss_weight=10.0, use_marker_pos=True, use_marker_ori=True,
        use_real_offsets=True, offset_noise_level=0, n_markers=6,
        window_size=8, lr=1e-3))

    rng = np.random.RandomState(5)
    n, f = 2, 8
    window = {
        "marker_pos": jnp.asarray(rng.randn(n, f, 36).astype(np.float32)),
        "marker_ori": jnp.asarray(rng.randn(n, f, 108).astype(np.float32)),
        "seq_lengths": jnp.asarray(np.full(n, f, np.int32)),
        "offset_t": jnp.asarray((rng.randn(n, 12, 3) * 0.02).astype(np.float32)),
        "offset_r": jnp.asarray(np.broadcast_to(
            np.eye(3, dtype=np.float32), (n, 12, 3, 3)).copy()),
    }

    outs = {}
    for lanes in (True, False):
        sensor = SensorSMPL(smplh_model)
        sensor.use_lanes = lanes
        model = create_model(cfg, sensor)
        params, state = model.init(jax.random.PRNGKey(0))
        out, _, _ = model.forward(params, state, window, train=False)
        outs[lanes] = out
    np.testing.assert_allclose(np.asarray(outs[True]["pose_hat"]),
                               np.asarray(outs[False]["pose_hat"]), atol=5e-4)
    np.testing.assert_allclose(np.asarray(outs[True]["joints_hat"]),
                               np.asarray(outs[False]["joints_hat"]), atol=5e-4)
