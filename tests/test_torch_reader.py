"""The dependency-free .pth reader vs real torch.save output."""

import numpy as np
import pytest
import torch

from empose_tpu.checkpoint.torch_reader import load_torch_checkpoint, load_state_dict


def test_zip_format_roundtrip(tmp_path):
    torch.manual_seed(0)
    model = torch.nn.Sequential(
        torch.nn.Linear(4, 8), torch.nn.BatchNorm1d(8), torch.nn.PReLU(),
        torch.nn.LSTM(8, 6, 2),
    )
    path = str(tmp_path / "model.pth")
    ckpt = {
        "iteration": 7,
        "epoch": 2,
        "model_state_dict": model.state_dict(),
        "train_loss": torch.tensor(1.25),
    }
    torch.save(ckpt, path)

    loaded = load_torch_checkpoint(path)
    assert loaded["iteration"] == 7 and loaded["epoch"] == 2
    sd = loaded["model_state_dict"]
    ref = model.state_dict()
    assert set(sd.keys()) == set(ref.keys())
    for k in ref:
        np.testing.assert_array_equal(np.asarray(sd[k]), ref[k].numpy())
    np.testing.assert_allclose(np.asarray(loaded["train_loss"]), 1.25)


def test_legacy_format_roundtrip(tmp_path):
    torch.manual_seed(1)
    model = torch.nn.Linear(5, 3)
    path = str(tmp_path / "legacy.pth")
    torch.save({"model_state_dict": model.state_dict()}, path,
               _use_new_zipfile_serialization=False)
    sd = load_state_dict(path)
    for k, v in model.state_dict().items():
        np.testing.assert_array_equal(sd[k], v.numpy())


def test_noncontiguous_and_dtypes(tmp_path):
    path = str(tmp_path / "t.pth")
    base = torch.arange(24, dtype=torch.float32).reshape(4, 6)
    obj = {
        "strided": base.t(),                      # non-contiguous
        "double": torch.randn(3, dtype=torch.float64),
        "long": torch.arange(5),
        "bool": torch.tensor([True, False, True]),
        "scalar": torch.tensor(3.5),
    }
    torch.save(obj, path)
    loaded = load_torch_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(loaded["strided"]), base.t().numpy())
    np.testing.assert_array_equal(np.asarray(loaded["double"]), obj["double"].numpy())
    np.testing.assert_array_equal(np.asarray(loaded["long"]), obj["long"].numpy())
    np.testing.assert_array_equal(np.asarray(loaded["bool"]), obj["bool"].numpy())
    assert float(np.asarray(loaded["scalar"])) == 3.5


def test_end_to_end_bridge_from_pth(tmp_path):
    """torch.save -> pure-python reader -> mapping -> JAX forward parity."""
    import jax.numpy as jnp
    from empose_tpu.config import Configuration
    from empose_tpu.checkpoint import mapping as M
    from empose_tpu.nn import models as MZ
    from tests.torch_ref.models import TorchFeedForwardResNet

    torch.manual_seed(2)
    cfg = Configuration.from_dict(dict(
        m_type="resnet", m_estimate_shape=True, m_shape_hidden_size=16, m_hidden_size=24,
        m_num_layers=2, use_marker_pos=True, use_marker_ori=True, n_markers=12,
        window_size=8, lr=1e-3))
    t_model = TorchFeedForwardResNet(cfg).eval()
    path = str(tmp_path / "model.pth")
    torch.save({"model_state_dict": t_model.state_dict()}, path)

    sd = load_state_dict(path)
    params, state = M.convert_feed_forward_resnet(sd, cfg)
    j_model = MZ.FeedForwardResNet(cfg)

    rng = np.random.RandomState(0)
    w = {
        "marker_pos": jnp.asarray(rng.randn(2, 5, 36).astype(np.float32)),
        "marker_ori": jnp.asarray(rng.randn(2, 5, 108).astype(np.float32)),
        "seq_lengths": jnp.asarray([5, 5]),
    }
    out_j, _, _ = j_model.forward(params, state, w)
    out_t = t_model(torch.tensor(np.asarray(w["marker_pos"])), torch.tensor(np.asarray(w["marker_ori"])))
    np.testing.assert_allclose(np.asarray(out_j["pose_hat"]), out_t["pose_hat"].detach().numpy(), atol=2e-5)
