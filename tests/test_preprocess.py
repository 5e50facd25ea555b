"""Offline datagen CLI: AMASS npz tree + 3DPW pkl -> EMR corpora."""

import os
import pickle

import numpy as np
import pytest

from empose_tpu.bodymodel.synthetic import smooth_random_poses


@pytest.fixture(scope="module")
def fake_amass_tree(tmp_path_factory, assets_dir):
    root = tmp_path_factory.mktemp("amass_raw")
    rng = np.random.RandomState(0)
    # Two subjects x two motions at 120 fps + one denylisted file.
    for subj in ("SubjectA", "SubjectB"):
        d = root / subj
        d.mkdir()
        for i in range(2):
            nf = 30 + 10 * i
            np.savez(d / f"motion{i}_poses.npz",
                     poses=smooth_random_poses(rng, nf, 156, 0.3),
                     betas=rng.randn(16), trans=smooth_random_poses(rng, nf, 3, 0.2),
                     mocap_framerate=np.asarray(120.0), gender="neutral")
        np.savez(d / "subject_shape.npz", betas=rng.randn(16))  # must be skipped
    np.savez(root / "SubjectA" / "MTR03_poses.npz",  # denylisted
             poses=np.zeros((5, 156)), betas=np.zeros(16), trans=np.zeros((5, 3)),
             mocap_framerate=np.asarray(120.0), gender="neutral")
    return str(root)


def test_amass_conversion(fake_amass_tree, assets_env, tmp_path):
    from scripts.preprocess_amass_3dpw import convert_amass_to_emr, get_all_amass_file_ids
    from empose_tpu.data.emr import EMRReader

    ids = get_all_amass_file_ids(fake_amass_tree)
    assert len(ids) == 4  # denylist + shape.npz excluded
    assert all("shape" not in i and "MTR03" not in i for i in ids)

    out = str(tmp_path / "amass_emr" / "corpus.emr")
    n = convert_amass_to_emr(out, fake_amass_tree)
    assert n == 4
    r = EMRReader(out)
    assert len(r) == 4
    meta = r.meta(0)
    poses = r.read(0, "poses")
    joints = r.read(0, "joints")
    # 120 fps -> 60 fps halves the frame count (approximately).
    assert meta["n_frames"] == poses.shape[0]
    assert 12 <= poses.shape[0] <= 16
    assert poses.shape[1] == 66
    assert joints.shape == (poses.shape[0], 66)
    assert r.read(0, "betas").shape == (10,)


def test_3dpw_conversion(assets_env, tmp_path):
    from scripts.preprocess_amass_3dpw import convert_3dpw_to_emr
    from empose_tpu.data.emr import EMRReader

    rng = np.random.RandomState(1)
    d = tmp_path / "3dpw_raw"
    d.mkdir()
    seq = {
        "poses_60Hz": [smooth_random_poses(rng, 20, 72, 0.3), smooth_random_poses(rng, 20, 72, 0.3)],
        "betas": [rng.randn(10), rng.randn(10)],
        "trans_60Hz": [smooth_random_poses(rng, 20, 3, 0.2), smooth_random_poses(rng, 20, 3, 0.2)],
        "genders": ["f", "m"],
    }
    with open(d / "seq1.pkl", "wb") as f:
        pickle.dump(seq, f)

    out = str(tmp_path / "3dpw_emr" / "corpus.emr")
    n = convert_3dpw_to_emr(out, str(d))
    assert n == 2  # one record per subject
    r = EMRReader(out)
    assert r.meta(0)["gender"] == "female"
    assert r.meta(1)["gender"] == "male"
    assert r.read(0, "poses").shape == (20, 66)
    assert r.read(1, "joints").shape == (20, 66)


def test_resampled_corpus_loads_into_training_pipeline(fake_amass_tree, assets_env, tmp_path):
    from scripts.preprocess_amass_3dpw import convert_amass_to_emr
    from empose_tpu.data.datasets import EMRBatchLoader
    out = str(tmp_path / "amass_emr" / "corpus.emr")
    convert_amass_to_emr(out, fake_amass_tree)
    loader = EMRBatchLoader(out, batch_size=2, window_size=8, shuffle=False)
    batch = next(iter(loader))
    assert batch["poses"].shape[0] == 2
    assert np.isfinite(batch["joints_gt"]).all()


def test_bulk_synthesize(assets_env, tmp_path):
    from empose_tpu import constants as C
    from tools.bulk_synthesize import synthesize_corpus
    from empose_tpu.data.emr import EMRReader
    out = str(tmp_path / "materialized.emr")
    n = synthesize_corpus(os.path.join(C.data_dir_synth(), "amass_emr"), out,
                          window=16, batch=2, seed=1)
    assert n >= 3
    r = EMRReader(out)
    rec0_pos = r.read(0, "marker_pos")
    assert rec0_pos.shape[-1] == 36
    assert np.isfinite(rec0_pos).all()
    assert r.read(0, "offset_r").shape == (12, 3, 3)
    # Full training-batch field set present.
    assert set(r.fields(0)) >= {"marker_pos", "marker_ori", "marker_nor", "joints",
                                "poses", "trans", "betas", "offset_t", "offset_r"}
    assert r.read(0, "betas").shape == (10,)


def test_bulk_synthesize_seed_controls_windows(assets_env, tmp_path):
    from empose_tpu import constants as C
    from tools.bulk_synthesize import synthesize_corpus
    from empose_tpu.data.emr import EMRReader
    corpus = os.path.join(C.data_dir_synth(), "amass_emr")
    out1 = str(tmp_path / "m1.emr")
    out2 = str(tmp_path / "m2.emr")
    synthesize_corpus(corpus, out1, window=16, batch=2, seed=1)
    synthesize_corpus(corpus, out2, window=16, batch=2, seed=2)
    r1, r2 = EMRReader(out1), EMRReader(out2)
    diffs = [not np.allclose(r1.read(i, "poses"), r2.read(i, "poses"))
             for i in range(len(r1))]
    assert any(diffs)  # different seeds -> different window crops somewhere


def test_bulk_synthesize_dp_mesh(assets_env, tmp_path):
    """Bulk datagen over the 8-device mesh produces the same record shapes."""
    from empose_tpu import constants as C
    from tools.bulk_synthesize import synthesize_corpus
    from empose_tpu.data.emr import EMRReader
    out = str(tmp_path / "materialized_dp.emr")
    n = synthesize_corpus(os.path.join(C.data_dir_synth(), "amass_emr"), out,
                          window=16, batch=2, seed=1, dp_devices=8)
    r = EMRReader(out)
    assert len(r) == n
    assert np.isfinite(r.read(0, "marker_pos")).all()
