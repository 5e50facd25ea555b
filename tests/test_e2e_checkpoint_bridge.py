"""End-to-end checkpoint bridge for ALL 8 released architectures.

For every released model family x sensor count (reference README.md:63-74),
this builds the torch oracle, saves a real ``model.pth`` + ``config.json``
into a fake experiment dir, runs the actual ``scripts/evaluate_real.py`` CLI
against the synthetic real recordings, and asserts (a) per-chunk pose parity
between the bridged JAX model and the torch oracle on the identical windowed
inputs, and (b) overall MPJPE/PA-MPJPE/MPJAE parity between the CLI output
and a torch-oracle eval through the same MetricsEngine. Any regression in the
``.pth`` parse -> name mapping -> model reconstruct -> windowed streaming ->
metrics chain fails loudly here (reference eval/helpers.py:131-162 +
README.md:63-74 is the machinery these 8 checkpoints exercise).

Widths are reduced; everything the bridge must MAP is structural (layer
counts, rnn-init vs MLP-init, bidirectionality, shape nets, BN placement,
6- vs 12-marker input sizing), and the structure here is the released one.
"""

import argparse
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from empose_tpu import constants as C
from empose_tpu.config import Configuration

VARIANTS = [
    ("resnet", 6), ("resnet", 12),        # 1614876822 / 1614876778
    ("rnn", 6), ("rnn", 12),              # 1614861176 / 1614855569
    ("lgd_nornn", 6), ("lgd_nornn", 12),  # 1615631965 / 1614785570
    ("lgd_rnn", 6), ("lgd_rnn", 12),      # 1615631737 / 1615200973
]

WINDOW = 16


def small_variant_config(kind: str, n_markers: int) -> Configuration:
    """Released structural flags (test_released_configs.variant_config), small widths."""
    base = dict(use_marker_pos=True, use_marker_ori=True, use_real_offsets=True,
                offset_noise_level=0, n_markers=n_markers, window_size=WINDOW, lr=5e-4,
                eval_window_size=WINDOW)
    if kind == "resnet":
        base.update(m_type="resnet", m_hidden_size=24, m_num_layers=2,
                    m_estimate_shape=True, m_shape_hidden_size=16, m_average_shape=True)
    elif kind == "rnn":
        base.update(m_type="rnn", m_bidirectional=True, m_hidden_size=16, m_num_layers=2,
                    m_estimate_shape=True, m_shape_hidden_size=16, m_average_shape=True)
    elif kind == "lgd_nornn":
        base.update(m_type="lgd", m_hidden_size=16, m_num_layers=2, m_num_iterations=2,
                    m_use_gradient=True, m_average_shape=True,
                    m_reprojection_loss_weight=0.01, m_fk_loss=0.1)
    else:
        base.update(m_type="ief", m_hidden_size=16, m_num_layers=2, m_num_iterations=2,
                    m_use_gradient=True, m_average_shape=True, m_rnn_init=True,
                    m_rnn_hidden_size=16, m_rnn_num_layers=2,
                    m_reprojection_loss_weight=0.01, m_fk_loss=0.1,
                    m_pose_loss_weight=10.0)
    return Configuration.from_dict(base)


def build_torch_oracle(cfg, assets_dir):
    from empose_tpu.bodymodel.smplh import load_smplh
    from empose_tpu.data.virtual_sensors import subset_tables
    from tests.torch_ref.models import TorchFeedForwardResNet, TorchSimpleRNN, TorchIEF
    from tests.torch_ref.smpl import TorchSMPLH

    if cfg.m_type == "resnet":
        return TorchFeedForwardResNet(cfg).eval()
    if cfg.m_type == "rnn":
        return TorchSimpleRNN(cfg).eval()
    model_path = os.path.join(assets_dir, "smpl_models", "smplh_amass", "neutral", "model.npz")
    npz = dict(np.load(model_path))
    smplh = load_smplh(model_path)
    t_smpl = TorchSMPLH(npz, num_betas=10)
    req, tables = subset_tables(smplh.faces, C.VERTEX_IDS)
    t_model = TorchIEF(cfg, t_smpl, tables).eval()
    t_model.set_subset_rows(req)
    return t_model


def torch_forward(t_model, cfg, chunk, is_new: bool):
    mp = torch.tensor(np.asarray(chunk["marker_pos"]))
    mo = torch.tensor(np.asarray(chunk["marker_ori"]))
    sl = torch.tensor(np.asarray(chunk["seq_lengths"]))
    if cfg.m_type == "resnet":
        return t_model(mp, mo)
    if cfg.m_type == "rnn":
        return t_model(mp, mo, sl, is_new_sequence=is_new)
    mm = chunk.get("marker_masks")
    return t_model(mp, mo, sl,
                   torch.tensor(np.asarray(chunk["offset_r"])),
                   torch.tensor(np.asarray(chunk["offset_t"])),
                   marker_masks=None if mm is None else torch.tensor(np.asarray(mm)),
                   is_new_sequence=is_new)


@pytest.mark.parametrize("kind,n_markers", VARIANTS)
@pytest.mark.slow
def test_released_variant_pth_to_cli_parity(kind, n_markers, assets_env, tmp_path, monkeypatch):
    exp_dir = str(tmp_path / "experiments")
    os.makedirs(exp_dir)
    monkeypatch.setenv("EM_EXPERIMENTS", exp_dir)
    assets_dir = assets_env

    torch.manual_seed(sum(ord(c) for c in kind) + n_markers)
    cfg = small_variant_config(kind, n_markers)
    t_model = build_torch_oracle(cfg, assets_dir)

    # Fake experiment dir with a REAL torch-format checkpoint, exactly the
    # released layout (reference eval/helpers.py:131-145).
    mid = f"77{abs(hash((kind, n_markers))) % 10 ** 6:06d}"
    model_dir = os.path.join(exp_dir, f"{mid}-{kind}{n_markers}")
    os.makedirs(model_dir)
    torch.save({"model_state_dict": t_model.state_dict(), "iteration": 0, "epoch": 0},
               os.path.join(model_dir, "model.pth"))
    cfg.to_json(os.path.join(model_dir, "config.json"))

    # --- The actual CLI (parse -> map -> reconstruct -> stream -> metrics).
    from scripts.evaluate_real import main as eval_main
    args = argparse.Namespace(model_id=mid, cross_subject=False, window_size=WINDOW)
    overall_cli = eval_main(args)
    assert np.isfinite(overall_cli["MPJPE [mm]"])

    # --- Torch-oracle eval over the IDENTICAL windowed inputs, with per-chunk
    # pose parity against the bridged JAX model.
    from empose_tpu.data.batches import collate_real
    from empose_tpu.data.datasets import Loader, RealDataset
    from empose_tpu.data.transforms import normalize_root
    from empose_tpu.eval.harness import EvalSession, load_model, pad_time, window_generator, _round_up
    from empose_tpu.eval.metrics import MetricsEngine

    model, params, state, config, _, sensor = load_model(mid)
    session = EvalSession(model, params, state, sensor)
    loader = Loader(RealDataset(C.data_dir_real()), 1, collate_real, shuffle=False)
    me_t = MetricsEngine(sensor.full)

    for batch in loader:
        device_batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "ids"}
        normed = normalize_root(device_batch)
        host = {k: np.asarray(v) for k, v in normed.items()}
        carry = model.initial_carry()
        first_shape_t = None
        for c, (chunk, _) in enumerate(window_generator(host, WINDOW)):
            if np.all(np.asarray(chunk["seq_lengths"]) == 0):
                # Fully-padded tail chunk (collate buckets the time axis).
                # The JAX side masks it to zero metric weight; torch's
                # pack_padded_sequence rejects zero lengths outright.
                continue
            out_j, _, carry = session.forward_chunk(chunk, carry)
            out_t = torch_forward(t_model, cfg, chunk, is_new=(c == 0))
            pose_t = out_t["pose_hat"].detach().numpy()
            np.testing.assert_allclose(np.asarray(out_j["pose_hat"]), pose_t, atol=2e-3,
                                       err_msg=f"{kind}-{n_markers} chunk {c} pose_hat")

            shape_t = out_t.get("shape_hat")
            if c == 0:
                first_shape_t = None if shape_t is None else shape_t.detach().numpy()[:, 0]
            me_t.compute(
                pose=np.asarray(chunk["poses"])[:, :, 3:], shape=np.asarray(chunk["shapes"]),
                pose_hat=pose_t, shape_hat=first_shape_t,
                seq_lengths=np.asarray(chunk["seq_lengths"]),
                pose_root=np.asarray(chunk["poses"])[:, :, :3],
                pose_root_hat=out_t["root_ori_hat"].detach().numpy(),
                frame_mask=np.asarray(chunk["marker_masks"]))

    overall_t = me_t.get_metrics()
    # Metric-level tolerance: the atol=2e-3 rad pose slack above maps to
    # ~1-2 mm of joint position through ~1 m of kinematic leverage.
    for key in ("MPJPE [mm]", "PA-MPJPE [mm]", "MPJAE [deg]"):
        np.testing.assert_allclose(overall_cli[key], overall_t[key], rtol=0.02, atol=0.5,
                                   err_msg=f"{kind}-{n_markers} {key}")
