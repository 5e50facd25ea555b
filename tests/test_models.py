"""Full-model parity: JAX zoo vs torch oracle via the state-dict bridge."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from empose_tpu import constants as C
from empose_tpu.config import Configuration
from empose_tpu.checkpoint import mapping as M
from empose_tpu.data.virtual_sensors import subset_tables
from empose_tpu.nn import models as MZ
from tests.torch_ref.models import TorchFeedForwardResNet, TorchSimpleRNN, TorchIEF
from tests.torch_ref.smpl import TorchSMPLH


def sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def base_config(**kw):
    d = dict(m_type="resnet", m_estimate_shape=True, m_shape_hidden_size=16,
             m_hidden_size=24, m_num_layers=2, m_average_shape=False,
             use_marker_pos=True, use_marker_ori=True, n_markers=12,
             m_fk_loss=0.0, window_size=8, lr=1e-3)
    d.update(kw)
    return Configuration.from_dict(d)


def random_window(rng, n=2, f=5, n_markers=12):
    return {
        "marker_pos": jnp.asarray(rng.randn(n, f, n_markers * 3).astype(np.float32)),
        "marker_ori": jnp.asarray(rng.randn(n, f, n_markers * 9).astype(np.float32)),
        "seq_lengths": jnp.asarray(np.full(n, f, np.int32)),
        "offset_t": jnp.asarray(rng.randn(n, 12, 3).astype(np.float32) * 0.02),
        "offset_r": jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32), (n, 12, 3, 3)).copy()),
    }


@pytest.mark.parametrize("n_markers,avg", [(12, False), (6, True)])
def test_resnet_parity(n_markers, avg):
    torch.manual_seed(0)
    cfg = base_config(n_markers=n_markers, m_average_shape=avg)
    t_model = TorchFeedForwardResNet(cfg).eval()
    params, state = M.convert_feed_forward_resnet(sd_numpy(t_model), cfg)
    j_model = MZ.FeedForwardResNet(cfg)

    rng = np.random.RandomState(0)
    w = random_window(rng)
    out_j, _, _ = j_model.forward(params, state, w)
    out_t = t_model(torch.tensor(np.asarray(w["marker_pos"])), torch.tensor(np.asarray(w["marker_ori"])))
    np.testing.assert_allclose(np.asarray(out_j["pose_hat"]), out_t["pose_hat"].detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_j["root_ori_hat"]), out_t["root_ori_hat"].detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_j["shape_hat"]), out_t["shape_hat"].detach().numpy(), atol=2e-5)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_rnn_parity(bidirectional):
    torch.manual_seed(1)
    cfg = base_config(m_type="rnn", m_bidirectional=bidirectional, m_hidden_size=16,
                      m_learn_init_state=False, m_dropout=0.0)
    t_model = TorchSimpleRNN(cfg).eval()
    params, state = M.convert_simple_rnn(sd_numpy(t_model), cfg)
    j_model = MZ.SimpleRNN(cfg)

    rng = np.random.RandomState(1)
    w = random_window(rng, n=3, f=6)
    lengths = np.asarray([6, 4, 2], np.int32)
    w["seq_lengths"] = jnp.asarray(lengths)
    out_j, _, carry = j_model.forward(params, state, w)
    out_t = t_model(torch.tensor(np.asarray(w["marker_pos"])), torch.tensor(np.asarray(w["marker_ori"])),
                    torch.tensor(lengths), is_new_sequence=True)
    # Padded frames produce different values (torch pads with stale outputs
    # through the output head); compare valid frames only.
    for i, l in enumerate(lengths):
        np.testing.assert_allclose(np.asarray(out_j["pose_hat"])[i, :l],
                                   out_t["pose_hat"].detach().numpy()[i, :l], atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_j["shape_hat"])[i, :l],
                                   out_t["shape_hat"].detach().numpy()[i, :l], atol=2e-5)


def make_ief_pair(cfg, synthetic_smplh_npz, smplh_model):
    """Build a (torch oracle, jax model, params, state) quadruple."""
    t_smpl = TorchSMPLH(synthetic_smplh_npz, num_betas=10)
    req, tables = subset_tables(smplh_model.faces, C.VERTEX_IDS)
    t_model = TorchIEF(cfg, t_smpl, tables).eval()
    t_model.set_subset_rows(req)

    sensor = MZ.SensorSMPL(smplh_model)
    j_model = MZ.IterativeErrorFeedback(cfg, sensor)
    params, state = M.convert_ief(sd_numpy(t_model), cfg)
    return t_model, j_model, params, state


@pytest.mark.parametrize("use_gradient,rnn_init,n_markers", [
    (False, False, 12),
    (True, False, 6),
    (True, True, 12),
])
@pytest.mark.slow
def test_ief_parity(use_gradient, rnn_init, n_markers, synthetic_smplh_npz, smplh_model):
    torch.manual_seed(2)
    cfg = base_config(m_type="lgd", m_num_iterations=2, m_hidden_size=32, m_num_layers=1,
                      m_step_size=0.1, m_use_gradient=use_gradient, m_rnn_init=rnn_init,
                      m_rnn_hidden_size=16, m_rnn_num_layers=1, m_rnn_bidirectional=False,
                      m_no_batch_norm=False, m_average_shape=True, n_markers=n_markers,
                      m_reprojection_loss_weight=0.01)
    t_model, j_model, params, state = make_ief_pair(cfg, synthetic_smplh_npz, smplh_model)

    rng = np.random.RandomState(3)
    w = random_window(rng, n=2, f=3)
    out_j, _, _ = j_model.forward(params, state, w)
    out_t = t_model(torch.tensor(np.asarray(w["marker_pos"])), torch.tensor(np.asarray(w["marker_ori"])),
                    torch.tensor([3, 3]),
                    torch.tensor(np.asarray(w["offset_r"])), torch.tensor(np.asarray(w["offset_t"])))

    np.testing.assert_allclose(np.asarray(out_j["pose_hat"]),
                               out_t["pose_hat"].detach().numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out_j["shape_hat"]),
                               out_t["shape_hat"].detach().numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out_j["joints_hat"]),
                               out_t["joints_hat"].detach().numpy(), atol=5e-4)
    # Whole history must match, not just the final step.
    np.testing.assert_allclose(np.asarray(out_j["history"]["marker_pos"]),
                               out_t["history"]["marker_pos"].detach().numpy(), atol=5e-4)


@pytest.mark.slow
def test_ief_loss_matches_reference_semantics(synthetic_smplh_npz, smplh_model):
    """compute_loss over the history reproduces the torch-side loss."""
    import torch as th
    from tests.torch_ref.models import t_padded_loss, t_reconstruction_loss
    torch.manual_seed(4)
    cfg = base_config(m_type="lgd", m_num_iterations=1, m_hidden_size=16, m_num_layers=1,
                      m_use_gradient=False, m_average_shape=True,
                      m_reprojection_loss_weight=0.01, m_pose_loss_weight=1.0,
                      m_shape_loss_weight=1.0)
    t_model, j_model, params, state = make_ief_pair(cfg, synthetic_smplh_npz, smplh_model)

    rng = np.random.RandomState(5)
    n, f = 2, 3
    w = random_window(rng, n=n, f=f)
    batch = dict(w)
    batch["poses"] = jnp.asarray(rng.randn(n, f, 66).astype(np.float32) * 0.2)
    batch["shapes"] = jnp.asarray(rng.randn(n, 10).astype(np.float32) * 0.3)

    out_j, _, _ = j_model.forward(params, state, w)
    total, vals = j_model.compute_loss(batch, out_j)

    # Torch-side computation of the same quantities from the oracle history.
    out_t = t_model(th.tensor(np.asarray(w["marker_pos"])), th.tensor(np.asarray(w["marker_ori"])),
                    th.tensor([f, f]), th.tensor(np.asarray(w["offset_r"])),
                    th.tensor(np.asarray(w["offset_t"])))
    l1 = th.nn.L1Loss(reduction="none")
    lengths = th.tensor([f, f])
    poses_t = th.tensor(np.asarray(batch["poses"]))
    shapes_t = th.tensor(np.asarray(batch["shapes"])).unsqueeze(1).repeat(1, f, 1)
    hist = out_t["history"]
    n_hist = hist["pose"].shape[0]
    pose_l = sum(t_padded_loss(poses_t, hist["pose"][i], l1, lengths) for i in range(n_hist))
    shape_l = sum(t_padded_loss(shapes_t, hist["shape"][i], l1, lengths) for i in range(n_hist))
    sel = j_model.marker_idxs
    rec_l = 0.0
    inputs_t = t_model.prepare_inputs(th.tensor(np.asarray(w["marker_pos"])),
                                      th.tensor(np.asarray(w["marker_ori"])))
    pos_in = inputs_t[:, :, t_model.pos_d[0]:t_model.pos_d[1]].reshape(n, f, -1, 3)
    ori_in = inputs_t[:, :, t_model.ori_d[0]:t_model.ori_d[1]].reshape(n, f, -1, 9)
    for i in range(n_hist):
        rec_l = rec_l + t_reconstruction_loss(pos_in, hist["marker_pos"][i].reshape(n, f, -1, 3)[:, :, list(sel)], lengths)
        rec_l = rec_l + t_reconstruction_loss(ori_in, hist["marker_ori"][i].reshape(n, f, -1, 9)[:, :, list(sel)], lengths)
    expected = (pose_l + shape_l + 0.01 * rec_l) / n_hist
    np.testing.assert_allclose(float(total), float(expected), rtol=1e-4)


def test_rnn_streaming_matches_single_pass():
    torch.manual_seed(6)
    cfg = base_config(m_type="rnn", m_hidden_size=12, m_bidirectional=False)
    t_model = TorchSimpleRNN(cfg).eval()
    params, state = M.convert_simple_rnn(sd_numpy(t_model), cfg)
    j_model = MZ.SimpleRNN(cfg)

    rng = np.random.RandomState(7)
    w = random_window(rng, n=1, f=8)
    out_full, _, _ = j_model.forward(params, state, w)

    w1 = {k: (v[:, :4] if k in ("marker_pos", "marker_ori") else v) for k, v in w.items()}
    w1["seq_lengths"] = jnp.asarray([4])
    w2 = {k: (v[:, 4:] if k in ("marker_pos", "marker_ori") else v) for k, v in w.items()}
    w2["seq_lengths"] = jnp.asarray([4])
    o1, _, carry = j_model.forward(params, state, w1, carry=None)
    o2, _, _ = j_model.forward(params, state, w2, carry=carry)
    joined = np.concatenate([np.asarray(o1["pose_hat"]), np.asarray(o2["pose_hat"])], axis=1)
    np.testing.assert_allclose(joined, np.asarray(out_full["pose_hat"]), atol=1e-5)
