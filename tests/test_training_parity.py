"""Training-dynamics parity: gradients and optimizer behavior vs torch.

The strongest parity claim: for identical weights and batch, the JAX training
step produces the same parameter GRADIENTS as the reference's torch training
step — including the reference's quirk of accumulating the per-iteration
reconstruction-error backward passes into the parameter grads
(reference models.py:576 + train.py:137).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from empose_tpu import constants as C
from empose_tpu.config import Configuration
from empose_tpu.checkpoint import mapping as M
from empose_tpu.data.virtual_sensors import subset_tables
from empose_tpu.nn import models as MZ
from tests.torch_ref.models import (TorchIEF, TorchSimpleRNN, t_padded_loss,
                                    t_reconstruction_loss)
from tests.torch_ref.smpl import TorchSMPLH


def sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _ief_cfg(use_gradient):
    return Configuration.from_dict(dict(
        m_type="lgd", m_num_iterations=1, m_hidden_size=16, m_num_layers=1,
        m_step_size=0.1, m_use_gradient=use_gradient, m_rnn_init=False,
        m_no_batch_norm=True,  # BN train-mode stats would differ only in state
        m_average_shape=True, m_estimate_shape=False, n_markers=12,
        m_reprojection_loss_weight=0.01, m_pose_loss_weight=1.0, m_shape_loss_weight=1.0,
        use_marker_pos=True, use_marker_ori=True, window_size=3, lr=1e-3, m_fk_loss=0.0))


@pytest.mark.parametrize("use_gradient", [False, True])
@pytest.mark.slow
def test_ief_training_grads_match_torch(use_gradient, synthetic_smplh_npz, smplh_model):
    torch.manual_seed(0)
    cfg = _ief_cfg(use_gradient)

    t_smpl = TorchSMPLH(synthetic_smplh_npz, num_betas=10)
    req, tables = subset_tables(smplh_model.faces, C.VERTEX_IDS)
    t_model = TorchIEF(cfg, t_smpl, tables)
    t_model.set_subset_rows(req)
    t_model.train()

    sensor = MZ.SensorSMPL(smplh_model)
    j_model = MZ.IterativeErrorFeedback(cfg, sensor)
    params, state = M.convert_ief(sd_numpy(t_model), cfg)

    rng = np.random.RandomState(1)
    n, f = 2, 3
    batch = {
        "marker_pos": rng.randn(n, f, 36).astype(np.float32),
        "marker_ori": rng.randn(n, f, 108).astype(np.float32),
        "seq_lengths": np.full(n, f, np.int32),
        "offset_t": (rng.randn(n, 12, 3) * 0.02).astype(np.float32),
        "offset_r": np.broadcast_to(np.eye(3, dtype=np.float32), (n, 12, 3, 3)).copy(),
        "poses": (rng.randn(n, f, 66) * 0.2).astype(np.float32),
        "shapes": (rng.randn(n, 10) * 0.3).astype(np.float32),
    }

    # ---- torch side: full reference training step (zero_grad -> forward with
    # in-loop recon backwards -> loss backward).
    t_model.zero_grad()
    out_t = t_model(torch.tensor(batch["marker_pos"]), torch.tensor(batch["marker_ori"]),
                    torch.tensor([f, f]), torch.tensor(batch["offset_r"]),
                    torch.tensor(batch["offset_t"]))
    l1 = torch.nn.L1Loss(reduction="none")
    lengths = torch.tensor([f, f])
    poses_t = torch.tensor(batch["poses"])
    shapes_t = torch.tensor(batch["shapes"]).unsqueeze(1).repeat(1, f, 1)
    hist = out_t["history"]
    n_hist = hist["pose"].shape[0]
    inputs_t = t_model.prepare_inputs(torch.tensor(batch["marker_pos"]),
                                      torch.tensor(batch["marker_ori"]))
    pos_in = inputs_t[:, :, t_model.pos_d[0]:t_model.pos_d[1]].reshape(n, f, -1, 3)
    ori_in = inputs_t[:, :, t_model.ori_d[0]:t_model.ori_d[1]].reshape(n, f, -1, 9)
    pose_l = sum(t_padded_loss(poses_t, hist["pose"][i], l1, lengths) for i in range(n_hist))
    shape_l = sum(t_padded_loss(shapes_t, hist["shape"][i], l1, lengths) for i in range(n_hist))
    rec_l = sum(t_reconstruction_loss(pos_in, hist["marker_pos"][i].reshape(n, f, -1, 3), lengths)
                + t_reconstruction_loss(ori_in, hist["marker_ori"][i].reshape(n, f, -1, 9), lengths)
                for i in range(n_hist))
    total_t = (pose_l + shape_l + 0.01 * rec_l) / n_hist
    total_t.backward()
    torch_grads = {k: v.grad.detach().numpy() for k, v in t_model.named_parameters()
                   if v.grad is not None}

    # ---- JAX side: grad of compute_loss (+ the reference-quirk extra term).
    def loss_fn(p):
        out, _, _ = j_model.forward(p, state, batch, train=True)
        total, _ = j_model.compute_loss(batch, out)
        return total + j_model.reference_grad_extra_loss(out)

    grads = jax.grad(loss_fn)(params)

    # Compare a representative set of parameters across all four nets.
    checks = [
        ("pose_net_init.input_to_hidden.weight", grads["pose_net_init"]["input_to_hidden"]["w"], True),
        ("pose_net_iter.input_to_hidden.weight", grads["pose_net_iter"]["input_to_hidden"]["w"], True),
        ("shape_net_iter.hidden_to_output.bias", grads["shape_net_iter"]["hidden_to_output"]["b"], False),
        ("pose_net_iter.hidden_to_output.weight", grads["pose_net_iter"]["hidden_to_output"]["w"], True),
    ]
    for torch_key, jax_grad, transpose in checks:
        tg = torch_grads[torch_key]
        jg = np.asarray(jax_grad)
        if transpose:
            jg = jg.T
        np.testing.assert_allclose(jg, tg, atol=3e-4, err_msg=torch_key)


def test_ief_streaming_chunks_match_torch(synthetic_smplh_npz, smplh_model):
    """LGD with RNN init: 2 chunks with carried state == torch oracle streaming."""
    torch.manual_seed(3)
    cfg = Configuration.from_dict(dict(
        m_type="lgd", m_num_iterations=1, m_hidden_size=16, m_num_layers=1,
        m_step_size=0.1, m_use_gradient=True, m_rnn_init=True, m_rnn_hidden_size=8,
        m_rnn_num_layers=1, m_rnn_bidirectional=False, m_no_batch_norm=False,
        m_average_shape=True, m_estimate_shape=False, n_markers=12,
        m_reprojection_loss_weight=0.01, use_marker_pos=True, use_marker_ori=True,
        window_size=4, lr=1e-3, m_fk_loss=0.0))

    t_smpl = TorchSMPLH(synthetic_smplh_npz, num_betas=10)
    req, tables = subset_tables(smplh_model.faces, C.VERTEX_IDS)
    t_model = TorchIEF(cfg, t_smpl, tables).eval()
    t_model.set_subset_rows(req)

    sensor = MZ.SensorSMPL(smplh_model)
    j_model = MZ.IterativeErrorFeedback(cfg, sensor)
    params, state = M.convert_ief(sd_numpy(t_model), cfg)

    rng = np.random.RandomState(4)
    n, f = 1, 8
    mp = rng.randn(n, f, 36).astype(np.float32)
    mo = rng.randn(n, f, 108).astype(np.float32)
    off_t = (rng.randn(n, 12, 3) * 0.02).astype(np.float32)
    off_r = np.broadcast_to(np.eye(3, dtype=np.float32), (n, 12, 3, 3)).copy()

    outs_t = []
    for c in range(2):
        sl = slice(c * 4, (c + 1) * 4)
        o = t_model(torch.tensor(mp[:, sl]), torch.tensor(mo[:, sl]), torch.tensor([4]),
                    torch.tensor(off_r), torch.tensor(off_t), is_new_sequence=(c == 0))
        outs_t.append(o["pose_hat"].detach().numpy())
    full_t = np.concatenate(outs_t, axis=1)

    carry = None
    outs_j = []
    for c in range(2):
        sl = slice(c * 4, (c + 1) * 4)
        w = {"marker_pos": mp[:, sl], "marker_ori": mo[:, sl],
             "seq_lengths": np.asarray([4], np.int32), "offset_t": off_t, "offset_r": off_r}
        out, _, carry = j_model.forward(params, state, w, carry)
        outs_j.append(np.asarray(out["pose_hat"]))
    full_j = np.concatenate(outs_j, axis=1)
    np.testing.assert_allclose(full_j, full_t, atol=5e-4)


@pytest.mark.slow
def test_remat_matches_no_remat(synthetic_smplh_npz, smplh_model):
    """jax.checkpoint in the LGD loop changes memory, not values/grads."""
    import jax
    torch.manual_seed(9)
    base = dict(m_type="lgd", m_num_iterations=2, m_hidden_size=16, m_num_layers=1,
                m_step_size=0.1, m_use_gradient=True, m_rnn_init=False, m_no_batch_norm=True,
                m_average_shape=True, n_markers=12, m_reprojection_loss_weight=0.01,
                use_marker_pos=True, use_marker_ori=True, window_size=3, lr=1e-3, m_fk_loss=0.0)
    sensor = MZ.SensorSMPL(smplh_model)
    m1 = MZ.IterativeErrorFeedback(Configuration.from_dict(base), sensor)
    m2 = MZ.IterativeErrorFeedback(Configuration.from_dict(dict(base, remat=True)), sensor)
    params, state = m1.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(2)
    n, f = 2, 3
    batch = {
        "marker_pos": rng.randn(n, f, 36).astype(np.float32),
        "marker_ori": rng.randn(n, f, 108).astype(np.float32),
        "seq_lengths": np.full(n, f, np.int32),
        "offset_t": (rng.randn(n, 12, 3) * 0.02).astype(np.float32),
        "offset_r": np.broadcast_to(np.eye(3, dtype=np.float32), (n, 12, 3, 3)).copy(),
        "poses": (rng.randn(n, f, 66) * 0.2).astype(np.float32),
        "shapes": (rng.randn(n, 10) * 0.3).astype(np.float32),
    }

    def grads_of(model):
        def loss_fn(p):
            out, _, _ = model.forward(p, state, batch, train=True)
            total, _ = model.compute_loss(batch, out)
            return total
        return jax.grad(loss_fn)(params)

    g1 = jax.tree_util.tree_leaves(grads_of(m1))
    g2 = jax.tree_util.tree_leaves(grads_of(m2))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
