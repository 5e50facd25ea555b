"""End-to-end: training loop, checkpoint resume, evaluate_real harness."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from empose_tpu import constants as C
from empose_tpu.config import Configuration


def tiny_train_config(**kw):
    d = dict(m_type="resnet", m_estimate_shape=True, m_shape_hidden_size=8,
             m_hidden_size=16, m_num_layers=1, use_marker_pos=True, use_marker_ori=True,
             use_real_offsets=True, offset_noise_level=0, n_markers=12,
             window_size=16, bs_train=2, bs_eval=2, n_epochs=3, lr=1e-3,
             print_every=2, eval_every=10**9, seed=123, eval_window_size=None)
    d.update(kw)
    return Configuration.from_dict(d)


@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory, assets_dir):
    """Train a tiny model once; every test in this module reuses it."""
    exp_dir = str(tmp_path_factory.mktemp("exp"))
    envs = {"SMPL_MODELS": os.path.join(assets_dir, "smpl_models"),
            "EM_DATA_REAL": os.path.join(assets_dir, "data_real"),
            "EM_DATA_SYNTH": os.path.join(assets_dir, "data_synth"),
            "EM_EXPERIMENTS": exp_dir}
    old = {k: os.environ.get(k) for k in envs}
    os.environ.update(envs)
    try:
        from scripts.train import main as train_main
        cfg = tiny_train_config(experiment_id="111000")
        model_dir, trainer = train_main(cfg, max_steps=3)
        assert trainer.global_step == 3
        trainer.save(os.path.join(model_dir, "checkpoint"))
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return exp_dir


def test_train_steps_and_checkpoint(assets_env, trained_dir, monkeypatch):
    monkeypatch.setenv("EM_EXPERIMENTS", trained_dir)
    from empose_tpu.utils.experiments import get_model_dir
    model_dir = get_model_dir(trained_dir, "111000")
    assert os.path.exists(os.path.join(model_dir, "config.json"))
    assert os.path.exists(os.path.join(model_dir, "cmd.txt"))
    assert os.path.exists(os.path.join(model_dir, "code.zip"))
    assert os.path.isdir(os.path.join(model_dir, "checkpoint"))
    assert os.path.isdir(os.path.join(model_dir, "checkpoint_model"))


@pytest.mark.slow
def test_steps_per_call_bit_identical(assets_env, monkeypatch, tmp_path):
    """Host-loop unrolling (steps_per_call > 1) runs K steps as one scanned
    device program; the PRNG chain and per-step jaxpr are identical, so on
    the CPU test platform training is BIT-identical to the single-step
    driver (on TPU the scan context may fuse the step differently — equal
    up to rounding; see Trainer.train_step_chunk)."""
    monkeypatch.setenv("EM_EXPERIMENTS", str(tmp_path))
    import jax
    from scripts.train import main as train_main

    results = {}
    for k_unroll, exp_id in ((1, "222001"), (4, "222004")):
        cfg = tiny_train_config(experiment_id=exp_id, print_every=10**9,
                                steps_per_call=k_unroll, n_epochs=3)
        _, trainer = train_main(cfg, max_steps=6)
        assert trainer.global_step == 6
        results[k_unroll] = jax.device_get(trainer.params)

    for a, b in zip(jax.tree.leaves(results[1]), jax.tree.leaves(results[4])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_flag_binds_precision_knobs(assets_env):
    """--bf16 engages the validated serving-precision mode (NN + kinematics
    GEMMs at Precision.DEFAULT) through the Trainer constructor."""
    from jax import lax
    import __graft_entry__ as GE
    from empose_tpu.nn import layers as L
    from empose_tpu.ops import fk_lanes as FK
    from empose_tpu.train.loop import Trainer

    old_nn, old_fk = L._HI, FK._HI
    try:
        cfg = GE._flagship_config(tiny=True)
        cfg.bf16 = True
        Trainer(cfg, seed=1)
        assert L._HI == lax.Precision.DEFAULT
        assert FK._HI == lax.Precision.DEFAULT
    finally:
        L._HI, FK._HI = old_nn, old_fk


@pytest.mark.slow
def test_steps_per_call_mixed_time_buckets(assets_env, tmp_path):
    """Both loaders bucket the TIME axis per batch (round_up(max len, 32)),
    so consecutive batches can share a batch size but differ in frame
    count — fit() must cut the chunk there instead of crashing np.stack."""
    import __graft_entry__ as GE
    from empose_tpu.train.loop import Trainer, fit

    cfg = GE._flagship_config(tiny=True)
    cfg.steps_per_call = 4
    cfg.print_every = 10**9
    cfg.eval_every = 10**9
    cfg.n_epochs = 1
    trainer = Trainer(cfg, seed=5)

    rng = np.random.RandomState(0)
    batches = [GE._tiny_batch(rng, n=2, f=8) for _ in range(2)] \
        + [GE._tiny_batch(rng, n=2, f=16) for _ in range(2)] \
        + [GE._tiny_batch(rng, n=2, f=8)]
    batches = [{k: np.asarray(v) for k, v in b.items()} for b in batches]

    last = fit(trainer, batches, None, None, str(tmp_path / "exp"))
    assert trainer.global_step == 5
    assert np.isfinite(last["total_loss"])


def test_resume_roundtrip(assets_env, trained_dir, monkeypatch):
    monkeypatch.setenv("EM_EXPERIMENTS", trained_dir)
    from empose_tpu.train.loop import Trainer
    from empose_tpu.utils.experiments import get_model_dir
    model_dir = get_model_dir(trained_dir, "111000")
    cfg = Configuration.from_json(os.path.join(model_dir, "config.json"))
    t2 = Trainer(cfg)
    assert t2.global_step == 0
    t2.restore(os.path.join(model_dir, "checkpoint"))
    assert t2.global_step == 3
    # Params identical after restore.
    from empose_tpu.train.loop import Trainer as _T
    import jax
    leaves = jax.tree_util.tree_leaves(t2.params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_restore_legacy_per_leaf_adam_checkpoint(assets_env, trained_dir, monkeypatch, tmp_path):
    """Checkpoints written before the optimizer switched to optax.flatten
    hold PER-LEAF adam trees; Trainer.restore must load them and ravel into
    the flat layout (train/loop.py::_flatten_legacy_opt_state) so old runs
    stay resumable."""
    monkeypatch.setenv("EM_EXPERIMENTS", trained_dir)
    import jax
    import optax
    from empose_tpu.checkpoint import native as ckpt
    from empose_tpu.train.loop import Trainer
    from empose_tpu.utils.experiments import get_model_dir
    from jax.flatten_util import ravel_pytree

    model_dir = get_model_dir(trained_dir, "111000")
    cfg = Configuration.from_json(os.path.join(model_dir, "config.json"))
    t = Trainer(cfg, seed=7)

    # Write a legacy-layout checkpoint: per-leaf adam state with nonzero
    # moments (run one legacy update so mu/nu are distinguishable).
    legacy_opt = optax.adam(cfg.lr)
    legacy_state = legacy_opt.init(t.params)
    grads = jax.tree.map(lambda p: np.ones_like(np.asarray(p)) * 0.01, t.params)
    _, legacy_state = legacy_opt.update(grads, legacy_state, t.params)
    legacy_ckpt = t.train_state_dict()
    legacy_ckpt["opt_state"] = legacy_state
    legacy_ckpt["global_step"] = 5
    path = str(tmp_path / "legacy_checkpoint")
    ckpt.save_train_state(path, legacy_ckpt)

    t2 = Trainer(cfg, seed=99)  # different seed: everything must come from disk
    t2.restore(path)
    assert t2.global_step == 5
    # The restored flat moments equal the raveled legacy moments bitwise.
    flat_mu = np.asarray(t2.opt_state[0].mu)
    want_mu = np.asarray(ravel_pytree(legacy_state[0].mu)[0])
    np.testing.assert_array_equal(flat_mu, want_mu)
    flat_nu = np.asarray(t2.opt_state[0].nu)
    want_nu = np.asarray(ravel_pytree(legacy_state[0].nu)[0])
    np.testing.assert_array_equal(flat_nu, want_nu)
    assert int(t2.opt_state[0].count) == 1
    # And the restored trainer can actually take a step.
    from empose_tpu.data.batches import collate_amass
    from empose_tpu.data.datasets import EMRSequenceDataset, Loader
    ds = EMRSequenceDataset(os.path.join(C.data_dir_synth(), "amass_emr"),
                            window_size=cfg.window_size, window_mode="beginning")
    loader = Loader(ds, cfg.bs_train, collate_amass, shuffle=False)
    vals = t2.train_step(next(iter(loader)))
    assert np.isfinite(float(vals["total_loss"]))


def test_evaluate_real_cli(assets_env, trained_dir, monkeypatch):
    monkeypatch.setenv("EM_EXPERIMENTS", trained_dir)
    import argparse
    from scripts.evaluate_real import main as eval_main
    args = argparse.Namespace(model_id="111000", cross_subject=False, window_size=None)
    overall = eval_main(args)
    assert overall["MPJPE [mm]"] > 0
    assert np.isfinite(overall["MPJPE [mm]"])

    # --precision default (bf16 fast mode): identical on the CPU mesh, and
    # the knobs must be restorable afterward.
    from empose_tpu.nn import layers as L
    from empose_tpu.ops import fk_lanes as FK
    try:
        fast = eval_main(argparse.Namespace(model_id="111000", cross_subject=False,
                                            window_size=None, precision="default"))
    finally:
        L.set_nn_precision("highest")
        FK.set_fk_precision("highest")
    assert abs(fast["MPJPE [mm]"] - overall["MPJPE [mm]"]) < 1e-6


def test_evaluate_real_visualize_artifacts(assets_env, trained_dir, monkeypatch):
    """--visualize N writes npz + OBJ artifacts (the reference only prints
    'not yet implemented', reference evaluate_real.py:90-92)."""
    monkeypatch.setenv("EM_EXPERIMENTS", trained_dir)
    import argparse
    from scripts.evaluate_real import main as eval_main
    from empose_tpu.utils.experiments import get_model_dir
    args = argparse.Namespace(model_id="111000", cross_subject=False, window_size=None,
                              visualize=0)
    eval_main(args)
    viz = os.path.join(get_model_dir(trained_dir, "111000"), "visualize")
    files = sorted(os.listdir(viz))
    npzs = [f for f in files if f.endswith(".npz")]
    objs = [f for f in files if f.endswith(".obj")]
    assert len(npzs) == 1 and len(objs) == 2
    with np.load(os.path.join(viz, npzs[0])) as z:
        assert z["joints_hat"].shape == z["joints_gt"].shape
        assert z["verts_hat"].shape == z["verts_gt"].shape
        assert z["verts_hat"].shape[1:] == (z["faces"].max() + 1, 3)
        for k in ("joints_hat", "verts_hat", "pose_hat"):
            assert np.isfinite(z[k]).all(), k
    # OBJ is loadable: starts with vertex lines, face indices are 1-based.
    with open(os.path.join(viz, objs[0])) as f:
        first = f.readline().split()
    assert first[0] == "v" and len(first) == 4


@pytest.mark.slow
def test_evaluate_real_suppression_study(assets_env, trained_dir, monkeypatch):
    """--suppression_length drives the sensor-dropout robustness study through
    the CLI (reference wires suppression noise into validation,
    noise_functions.py:31-33); deterministic per chunk, metrics stay finite
    and the run differs from the clean one."""
    monkeypatch.setenv("EM_EXPERIMENTS", trained_dir)
    import argparse
    from scripts.evaluate_real import main as eval_main
    clean = eval_main(argparse.Namespace(model_id="111000", cross_subject=False,
                                         window_size=16))
    sup1 = eval_main(argparse.Namespace(model_id="111000", cross_subject=False,
                                        window_size=16, suppression_length=0.5,
                                        suppression_markers=3))
    sup2 = eval_main(argparse.Namespace(model_id="111000", cross_subject=False,
                                        window_size=16, suppression_length=0.5,
                                        suppression_markers=3))
    assert np.isfinite(sup1["MPJPE [mm]"])
    # Deterministic chunk-indexed keys: repeated runs draw identical noise.
    assert sup1["MPJPE [mm]"] == sup2["MPJPE [mm]"]
    # Dropping 3 of 12 sensors for half of every window must change the result.
    assert abs(sup1["MPJPE [mm]"] - clean["MPJPE [mm]"]) > 1e-6


def test_evaluate_real_cross_subject(assets_env, trained_dir, monkeypatch):
    monkeypatch.setenv("EM_EXPERIMENTS", trained_dir)
    import argparse
    from scripts.evaluate_real import main as eval_main
    args = argparse.Namespace(model_id="111000", cross_subject=True, window_size=None)
    overall = eval_main(args)
    assert np.isfinite(overall["MPJPE [mm]"])


def test_streaming_eval_windowed_vs_full(assets_env, trained_dir, monkeypatch):
    """Windowed streaming eval == full-sequence eval for a stateless model."""
    monkeypatch.setenv("EM_EXPERIMENTS", trained_dir)
    from empose_tpu.eval.harness import EvalSession, evaluate_real_sequences, load_model
    from empose_tpu.data.datasets import RealDataset, Loader
    from empose_tpu.data.batches import collate_real

    model, params, state, cfg, model_dir, sensor = load_model("111000")
    ds = RealDataset(C.data_dir_real())
    loader = Loader(ds, 1, collate_real, shuffle=False)
    session = EvalSession(model, params, state, sensor)
    rows_full, overall_full = evaluate_real_sequences(session, loader, None, pad_multiple=32)
    rows_win, overall_win = evaluate_real_sequences(session, loader, 32)
    np.testing.assert_allclose(overall_win["MPJPE [mm]"], overall_full["MPJPE [mm]"], rtol=1e-3)


@pytest.mark.slow
def test_device_metrics_match_host_oracle(assets_env, trained_dir, monkeypatch):
    """Device-resident stats eval (default) == host-MetricsEngine eval (oracle).

    Windowed run: multiple chunks per sequence exercise the stats carry AND
    the chunk-0 shape freeze (111000 estimates shape); full-sequence run
    exercises the pad_multiple path. Every per-sequence row and the overall
    row agree to float32 accumulation tolerance."""
    monkeypatch.setenv("EM_EXPERIMENTS", trained_dir)
    from empose_tpu.eval.harness import EvalSession, evaluate_real_sequences, load_model
    from empose_tpu.data.datasets import RealDataset, Loader
    from empose_tpu.data.batches import collate_real

    model, params, state, cfg, model_dir, sensor = load_model("111000")
    ds = RealDataset(C.data_dir_real())
    loader = Loader(ds, 1, collate_real, shuffle=False)
    session = EvalSession(model, params, state, sensor)
    for ws, pad in ((16, 256), (None, 32)):
        # Three-way pin: batched whole-pass program (default, r05) ==
        # serial per-sequence stats loop (r04) == host MetricsEngine (oracle).
        rows_dev, overall_dev = evaluate_real_sequences(session, loader, ws, pad_multiple=pad)
        rows_ser, overall_ser = evaluate_real_sequences(session, loader, ws, pad_multiple=pad,
                                                        serial=True)
        rows_host, overall_host = evaluate_real_sequences(session, loader, ws, pad_multiple=pad,
                                                          host_metrics=True)
        assert [r[0] for r in rows_dev] == [r[0] for r in rows_host]
        assert [r[0] for r in rows_ser] == [r[0] for r in rows_host]
        for rd, rs, rh in zip(rows_dev, rows_ser, rows_host):
            np.testing.assert_allclose(rd[1:], rh[1:], rtol=5e-4, atol=5e-3, err_msg=rd[0])
            np.testing.assert_allclose(rs[1:], rh[1:], rtol=5e-4, atol=5e-3, err_msg=rd[0])
            np.testing.assert_allclose(rd[1:], rs[1:], rtol=5e-4, atol=5e-3, err_msg=rd[0])
        for k in overall_host:
            np.testing.assert_allclose(overall_dev[k], overall_host[k], rtol=5e-4, atol=5e-3,
                                       err_msg=k)
            np.testing.assert_allclose(overall_ser[k], overall_host[k], rtol=5e-4, atol=5e-3,
                                       err_msg=k)


@pytest.mark.slow
def test_batched_eval_mixed_length_corpus(assets_env):
    """Batched whole-pass eval over sequences of DIFFERENT lengths ==
    serial == host oracle: the common-frame padding + per-sequence masks
    must not leak pad frames into any row."""
    import jax
    from empose_tpu.bodymodel.smplh import load_smplh
    from empose_tpu.eval.harness import EvalSession, evaluate_real_sequences
    from empose_tpu.nn.models import SensorSMPL, create_model

    cfg = Configuration.from_dict(dict(
        m_type="rnn", m_hidden_size=16, m_num_layers=1, m_estimate_shape=True,
        m_shape_hidden_size=8, m_average_shape=True, use_marker_pos=True,
        use_marker_ori=True, n_markers=12, window_size=8, lr=1e-3))
    sensor = SensorSMPL(load_smplh())
    model = create_model(cfg, sensor)
    params, state = model.init(jax.random.PRNGKey(1))
    session = EvalSession(model, params, state, sensor)

    rng = np.random.RandomState(9)
    m = 12
    seqs = []
    for i, f in enumerate((40, 17, 33)):  # deliberately unequal lengths
        seqs.append({
            "ids": [f"mixed_{i}"],
            "poses": np.asarray(rng.randn(1, f, 66) * 0.2, np.float32),
            "shapes": np.asarray(rng.randn(1, 10) * 0.2, np.float32),
            "trans": np.asarray(rng.randn(1, f, 3) * 0.1, np.float32),
            "seq_lengths": np.full(1, f, np.int32),
            "marker_pos": np.asarray(rng.randn(1, f, m * 3), np.float32),
            "marker_ori": np.asarray(rng.randn(1, f, m * 9), np.float32),
            "marker_nor": np.asarray(rng.randn(1, f, m * 3), np.float32),
            "marker_masks": np.ones((1, f, m), np.float32),
            "offset_t": np.asarray(rng.randn(1, m, 3) * 0.02, np.float32),
            "offset_r": np.broadcast_to(np.eye(3, dtype=np.float32),
                                        (1, m, 3, 3)).copy(),
        })

    for ws in (8, None):
        rows_b, overall_b = evaluate_real_sequences(session, seqs, ws,
                                                    pad_multiple=16)
        rows_s, _ = evaluate_real_sequences(session, seqs, ws,
                                            pad_multiple=16, serial=True)
        rows_h, overall_h = evaluate_real_sequences(session, seqs, ws,
                                                    pad_multiple=16,
                                                    host_metrics=True)
        assert [r[0] for r in rows_b] == [r[0] for r in rows_h]
        for rb, rs, rh in zip(rows_b, rows_s, rows_h):
            np.testing.assert_allclose(rb[1:], rh[1:], rtol=5e-4, atol=5e-3,
                                       err_msg=f"{ws} {rb[0]}")
            np.testing.assert_allclose(rs[1:], rh[1:], rtol=5e-4, atol=5e-3,
                                       err_msg=f"{ws} {rb[0]}")
        for k in overall_h:
            np.testing.assert_allclose(overall_b[k], overall_h[k], rtol=5e-4,
                                       atol=5e-3, err_msg=k)


@pytest.mark.slow
def test_trainer_eval_metrics_match_host_engine(assets_env, trained_dir, monkeypatch):
    """Trainer.evaluate_valid/evaluate_test device-stats metrics == the host
    MetricsEngine oracle (the loops they replaced in r05).

    The valid oracle replays the exact pre-r05 per-batch engine.compute loop;
    the test oracle is the CLI's host-metrics pass over the same loader +
    window (identical chunking/freeze logic, different driver).
    """
    monkeypatch.setenv("EM_EXPERIMENTS", trained_dir)
    import jax
    from empose_tpu.train.loop import Trainer
    from empose_tpu.data import transforms as T
    from empose_tpu.data.datasets import EMRSequenceDataset, RealDataset, Loader
    from empose_tpu.data.batches import collate_amass, collate_real
    from empose_tpu.eval.harness import EvalSession, evaluate_real_sequences
    from empose_tpu.eval.metrics import MetricsEngine

    cfg = tiny_train_config()
    trainer = Trainer(cfg, seed=5)
    me = MetricsEngine(trainer.smplh)

    vds = EMRSequenceDataset(os.path.join(C.data_dir_synth(), "amass_emr"),
                             window_size=16, window_mode="middle")
    valid_loader = Loader(vds, 2, collate_amass, shuffle=False)
    trainer.evaluate_valid(valid_loader, me)
    m_stats = me.get_metrics()

    me_oracle = MetricsEngine(trainer.smplh)
    eval_base = jax.random.PRNGKey(8004)
    for b_idx, host_batch in enumerate(valid_loader):
        k = jax.random.fold_in(eval_base, b_idx)
        batch = jax.device_put({k2: v for k2, v in host_batch.items() if k2 != "ids"})
        out, vals, _ = trainer._eval_forward(trainer.params, trainer.state, batch, k)
        normed = T.normalize_root(batch)
        me_oracle.compute(
            np.asarray(normed["poses"])[:, :, 3:], host_batch["shapes"],
            np.asarray(out["pose_hat"]),
            None if out.get("shape_hat") is None else np.asarray(out["shape_hat"]),
            host_batch["seq_lengths"],
            np.asarray(normed["poses"])[:, :, :3], np.asarray(out["root_ori_hat"]))
    m_host = me_oracle.get_metrics()
    for k in m_host:
        np.testing.assert_allclose(m_stats[k], m_host[k], rtol=5e-4, atol=5e-3,
                                   err_msg=f"valid {k}")

    tds = RealDataset(C.data_dir_real())
    test_loader = Loader(tds, 1, collate_real, shuffle=False)
    me.reset()
    trainer.evaluate_test(test_loader, me, 16)
    m_test = me.get_metrics()
    session = EvalSession(trainer.model, trainer.params, trainer.state, trainer.sensor)
    _, overall_host = evaluate_real_sequences(session, test_loader, 16,
                                              host_metrics=True)
    for k in overall_host:
        np.testing.assert_allclose(m_test[k], overall_host[k], rtol=5e-4, atol=5e-3,
                                   err_msg=f"test {k}")


def test_train_ief_with_gradient(assets_env, trained_dir, monkeypatch):
    """The full LGD model trains (grad through FK + refinement loop)."""
    monkeypatch.setenv("EM_EXPERIMENTS", trained_dir)
    from empose_tpu.train.loop import Trainer
    from empose_tpu.data.datasets import EMRSequenceDataset, Loader
    from empose_tpu.data.batches import collate_amass

    cfg = tiny_train_config(m_type="lgd", m_num_iterations=1, m_use_gradient=True,
                            m_rnn_init=True, m_rnn_hidden_size=8, m_rnn_num_layers=1,
                            m_average_shape=True, m_hidden_size=16, m_num_layers=1,
                            window_size=8, bs_train=2)
    trainer = Trainer(cfg)
    ds = EMRSequenceDataset(os.path.join(C.data_dir_synth(), "amass_emr"), window_size=8,
                            window_mode="beginning")
    loader = Loader(ds, 2, collate_amass, shuffle=False)
    batch = next(iter(loader))
    v1 = trainer.train_step(batch)
    v2 = trainer.train_step(batch)
    assert np.isfinite(float(v1["total_loss"]))
    assert np.isfinite(float(v2["total_loss"]))


def test_convert_checkpoint_tool(assets_env, trained_dir, monkeypatch, tmp_path):
    """torch model.pth in an experiment dir -> native checkpoint_model."""
    import torch
    import json
    from empose_tpu.config import Configuration
    from tests.torch_ref.models import TorchFeedForwardResNet

    monkeypatch.setenv("EM_EXPERIMENTS", str(tmp_path))
    cfg = tiny_train_config()
    exp_dir = tmp_path / "222000-ResNet-test"
    exp_dir.mkdir()
    Configuration.from_dict(vars(cfg) if not isinstance(cfg, Configuration) else cfg.__dict__)\
        .to_json(str(exp_dir / "config.json"))
    torch.manual_seed(0)
    t_model = TorchFeedForwardResNet(cfg)
    torch.save({"model_state_dict": t_model.state_dict()}, str(exp_dir / "model.pth"))

    from tools.convert_checkpoint import main as convert_main
    out = convert_main("222000")
    assert os.path.isdir(out)

    # Native checkpoint now loads through the standard eval path; outputs
    # match the torch-format path.
    from empose_tpu.eval.harness import load_model
    _, p1, s1, _, _, _ = load_model("222000")
    os.rename(str(exp_dir / "model.pth"), str(exp_dir / "model.pth.bak"))
    _, p2, s2, _, _, _ = load_model("222000")
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_model_and_eval_data_partitions(assets_env, trained_dir, monkeypatch):
    monkeypatch.setenv("EM_EXPERIMENTS", trained_dir)
    from empose_tpu.eval.harness import load_model_and_eval_data
    session, loader, config = load_model_and_eval_data("111000", partition="test_real")
    batch = next(iter(loader))
    assert "marker_pos" in batch
    session, loader, config = load_model_and_eval_data("111000", partition="valid")
    batch = next(iter(loader))
    assert "joints_gt" in batch


@pytest.mark.slow
def test_forward_chunk_packing_matches_direct_forward(assets_env, trained_dir, monkeypatch):
    """EvalSession packs root|pose|shape into ONE device->host transfer; the
    unpacked host arrays must equal a direct model.forward call bit-for-bit."""
    monkeypatch.setenv("EM_EXPERIMENTS", trained_dir)
    from empose_tpu.eval.harness import (EvalSession, load_model, pad_time,
                                         preprocess_real_chunk, window_generator)
    from empose_tpu.data.datasets import RealDataset, Loader
    from empose_tpu.data.batches import collate_real

    model, params, state, cfg, _, sensor = load_model("111000")
    loader = Loader(RealDataset(C.data_dir_real()), 1, collate_real, shuffle=False)
    batch = next(iter(loader))
    session = EvalSession(model, params, state, sensor)
    chunk, _ = next(window_generator(pad_time(batch, 32), 32))
    out, vals, _ = session.forward_chunk(chunk, model.initial_carry())

    device_chunk = {k: jnp.asarray(v) for k, v in chunk.items() if k != "ids"}
    ref_chunk = preprocess_real_chunk(sensor, device_chunk)
    ref_out, _, _ = model.forward(params, state, ref_chunk, model.initial_carry(), train=False)
    _, ref_vals = model.compute_loss(ref_chunk, ref_out)
    for k in ("root_ori_hat", "pose_hat", "shape_hat"):
        if ref_out.get(k) is None:
            assert k not in out
        else:
            np.testing.assert_array_equal(out[k], np.asarray(ref_out[k]), err_msg=k)
    assert set(vals) == set(ref_vals)
    for k in ref_vals:
        # jit-fused vs eager reduction order: allow float32 ulp noise.
        np.testing.assert_allclose(vals[k], np.asarray(ref_vals[k]), rtol=1e-5, err_msg=k)


def test_eval_time_suppression_noise(assets_env, trained_dir, monkeypatch):
    """Robustness eval: sensor dropout at eval changes the metrics."""
    monkeypatch.setenv("EM_EXPERIMENTS", trained_dir)
    from empose_tpu.eval.harness import EvalSession, evaluate_real_sequences, load_model
    from empose_tpu.data.datasets import RealDataset, Loader
    from empose_tpu.data.batches import collate_real
    from empose_tpu.data.noise import marker_suppression_noise_fn

    model, params, state, cfg, _, sensor = load_model("111000")
    ds = RealDataset(C.data_dir_real())
    loader = Loader(ds, 1, collate_real, shuffle=False)

    clean = EvalSession(model, params, state, sensor)
    _, overall_clean = evaluate_real_sequences(clean, loader, 32)

    noisy = EvalSession(model, params, state, sensor,
                        noise_fn=marker_suppression_noise_fn(0.9, 4, 0.0, 12))
    _, overall_noisy = evaluate_real_sequences(noisy, loader, 32)
    assert overall_noisy["MPJPE [mm]"] != overall_clean["MPJPE [mm]"]
    assert np.isfinite(overall_noisy["MPJPE [mm]"])
