"""Export bridge (JAX -> torch .pth): round-trip and torch-consumability.

The writer must be the exact inverse of the reader's mapping for every
released architecture, and a torch user must be able to consume the file
with a plain strict ``load_state_dict`` (reference eval/helpers.py:131-137).
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from empose_tpu.config import Configuration
from empose_tpu.checkpoint.mapping import convert_model
from empose_tpu.checkpoint.torch_reader import load_state_dict
from empose_tpu.checkpoint.torch_writer import export_model, save_torch_checkpoint
import __graft_entry__ as GE

from tests.test_e2e_checkpoint_bridge import VARIANTS, small_variant_config


@pytest.mark.parametrize("kind,n_markers", VARIANTS)
def test_export_roundtrip_all_released_variants(kind, n_markers, tmp_path):
    """export -> .pth -> dependency-free reader -> convert_model is the
    identity on (params, state) for all 8 released architectures."""
    cfg = small_variant_config(kind, n_markers)
    model, _ = GE._build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(n_markers))

    path = str(tmp_path / "model.pth")
    save_torch_checkpoint(path, params, state, cfg)

    sd = load_state_dict(path)  # the torch-free reader
    params2, state2 = convert_model(sd, cfg)

    for tree, tree2, what in ((params, params2, "params"), (state, state2, "state")):
        leaves = jax.tree_util.tree_leaves_with_path(tree)
        leaves2 = dict(jax.tree_util.tree_leaves_with_path(tree2))
        assert len(leaves) == len(leaves2), what
        for key, leaf in leaves:
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(leaves2[key]),
                err_msg=f"{what}{jax.tree_util.keystr(key)}")


def test_native_checkpoint_wins_over_exported_pth(tmp_path, assets_env, monkeypatch):
    """When an experiment has BOTH a native checkpoint and an exported
    model.pth, load_model uses the native one — an interop snapshot must not
    shadow later training progress."""
    from empose_tpu.checkpoint.native import save_params_state
    from empose_tpu.eval.harness import load_model

    cfg = small_variant_config("rnn", 12)
    model, _ = GE._build_model(cfg)
    params_old, state_old = model.init(jax.random.PRNGKey(0))
    params_new, state_new = model.init(jax.random.PRNGKey(1))

    exp = tmp_path / "experiments" / "880001-RNN-test"
    os.makedirs(exp)
    cfg.to_json(str(exp / "config.json"))
    # Exported snapshot at "step N" ...
    save_torch_checkpoint(str(exp / "model.pth"), params_old, state_old, cfg)
    # ... then training advances the native checkpoint.
    save_params_state(str(exp / "checkpoint_model"), params_new, state_new)
    monkeypatch.setenv("EM_EXPERIMENTS", str(tmp_path / "experiments"))

    _, params, _, _, _, _ = load_model("880001")
    leaf_new = jax.tree_util.tree_leaves(params_new)[0]
    leaf = jax.tree_util.tree_leaves(params)[0]
    np.testing.assert_array_equal(np.asarray(leaf), np.asarray(leaf_new))


def test_dp_devices_requires_multi_stream():
    """--dp_devices with a single stream is a user error, not a silent no-op."""
    import argparse
    from scripts.serve import main as serve_main
    with pytest.raises(SystemExit, match="streams"):
        serve_main(argparse.Namespace(model_id="whatever", chunk=4, streams=1,
                                      dp_devices=8))


def test_exported_pth_loads_into_torch_model(tmp_path):
    """A torch user consumes the export with strict load_state_dict and gets
    the same forward outputs as the JAX model."""
    from tests.torch_ref.models import TorchSimpleRNN

    cfg = small_variant_config("rnn", 12)
    model, _ = GE._build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(3))

    path = str(tmp_path / "model.pth")
    save_torch_checkpoint(path, params, state, cfg, extra={"global_step": 7})

    checkpoint = torch.load(path, weights_only=False)
    assert checkpoint["global_step"] == 7
    t_model = TorchSimpleRNN(cfg)
    t_model.load_state_dict(checkpoint["model_state_dict"], strict=True)
    t_model.eval()

    rng = np.random.RandomState(0)
    n, f = 2, 8
    mp = rng.randn(n, f, 36).astype(np.float32)
    mo = rng.randn(n, f, 108).astype(np.float32)
    sl = np.full(n, f, np.int64)

    out_t = t_model(torch.tensor(mp), torch.tensor(mo), torch.tensor(sl),
                    is_new_sequence=True)
    window = {"marker_pos": jnp.asarray(mp), "marker_ori": jnp.asarray(mo),
              "seq_lengths": jnp.asarray(sl.astype(np.int32))}
    out_j, _, _ = model.forward(params, state, window, train=False)
    np.testing.assert_allclose(np.asarray(out_j["pose_hat"]),
                               out_t["pose_hat"].detach().numpy(), atol=2e-5)
