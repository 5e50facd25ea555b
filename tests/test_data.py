"""Data layer: EMR corpus, datasets, collation, device transforms, noise."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from empose_tpu import constants as C
from empose_tpu.config import Configuration
from empose_tpu.data import batches as B
from empose_tpu.data import datasets as D
from empose_tpu.data import transforms as T
from empose_tpu.data.emr import EMRReader, EMRWriter
from empose_tpu.nn.models import SensorSMPL


def test_emr_roundtrip(tmp_path):
    path = str(tmp_path / "test.emr")
    rng = np.random.RandomState(0)
    arrs = [rng.randn(10, 4).astype(np.float32), rng.randn(7, 2, 3).astype(np.float32)]
    with EMRWriter(path) as w:
        w.add_record({"id": "a", "n_frames": 10}, {"x": arrs[0]})
        w.add_record({"id": "b", "n_frames": 7}, {"y": arrs[1]})
    r = EMRReader(path)
    assert len(r) == 2
    assert r.meta(0)["id"] == "a"
    np.testing.assert_array_equal(r.read(0, "x"), arrs[0])
    np.testing.assert_array_equal(r.read(1, "y", 2, 5), arrs[1][2:5])
    r.close()


def test_real_dataset_and_collate(assets_env):
    ds = D.RealDataset(C.data_dir_real())
    assert len(ds) >= 2
    s = ds[0]
    assert s.n_markers == 12
    batch = B.collate_real([ds[0], ds[1]])
    n, f = batch["poses"].shape[0], batch["poses"].shape[1]
    assert n == 2 and f % 32 == 0
    assert batch["marker_pos"].shape == (2, f, 36)
    assert batch["marker_ori"].shape == (2, f, 108)
    # Missing markers are zero-filled.
    masks = batch["marker_masks"]
    mp = batch["marker_pos"].reshape(2, f, 12, 3)
    assert np.all(mp[masks == 0.0] == 0.0)


def test_normalize_real_markers_consistency(assets_env):
    """After normalization, frame-0 markers with zero trans should be the
    sensor readings expressed in the root frame — orthogonality of the
    rotation is preserved."""
    ds = D.RealDataset(C.data_dir_real(), normalize=False)
    s = ds[0]
    pos0 = s.marker_pos.copy()
    s.normalize_markers()
    assert s.marker_pos.shape == pos0.shape
    ori = s.marker_ori.reshape(s.n_frames, 12, 3, 3)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), ori.shape)
    np.testing.assert_allclose(np.einsum("fmab,fmcb->fmac", ori, ori), eye, atol=1e-4)


def test_emr_sequence_dataset_windows(assets_env):
    ds = D.EMRSequenceDataset(os.path.join(C.data_dir_synth(), "amass_emr"),
                              window_size=16, window_mode="random",
                              rng=np.random.RandomState(4313))
    s = ds[0]
    assert s.n_frames == 16
    assert s.poses.shape == (16, 66)
    batch = B.collate_amass([ds[i] for i in range(2)])
    assert batch["poses"].shape[1] % 32 == 0


def test_prefetch_iter_early_break_stops_producer():
    """Abandoning a prefetching loader early must not leak a producer thread
    blocked on q.put forever (datasets.py::_prefetch_iter)."""
    import threading
    import time as _time

    produced = []

    def slow_gen():
        for i in range(100):
            produced.append(i)
            yield i

    before = threading.active_count()
    it = D._prefetch_iter(slow_gen(), prefetch=2)
    assert next(it) == 0
    it.close()  # what GC does when a 'for ... in loader: break' drops it
    deadline = _time.time() + 5.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"
    # The producer ran at most 1 consumed + prefetch ahead + 1 in-flight.
    assert len(produced) <= 4


def test_normalize_root_device(assets_env, smplh_model):
    rng = np.random.RandomState(0)
    batch = {
        "poses": jnp.asarray(rng.randn(2, 5, 66).astype(np.float32) * 0.3),
        "trans": jnp.asarray(rng.randn(2, 5, 3).astype(np.float32)),
        "shapes": jnp.asarray(rng.randn(2, 10).astype(np.float32)),
        "seq_lengths": jnp.asarray([5, 5]),
    }
    out = T.normalize_root(batch)
    assert np.allclose(np.asarray(out["trans"]), 0.0)
    # Frame-0 root orientation becomes (numerically) identity.
    root0 = np.asarray(out["poses"])[:, 0, :3]
    assert np.abs(root0).max() < 1e-2  # exp-map clamp floor is 1e-2 rad


@pytest.mark.parametrize("noise_level", [-1, 0, 1, 2, 3])
def test_sample_markers_with_offsets_levels(assets_env, smplh_model, noise_level):
    sensor = SensorSMPL(smplh_model)
    bank = T.OffsetBank.from_offset_files(list(D.get_all_offset_files().values()))
    rng = np.random.RandomState(1)
    n, f = 2, 3
    batch = {
        "poses": jnp.asarray(rng.randn(n, f, 66).astype(np.float32) * 0.3),
        "trans": jnp.zeros((n, f, 3), jnp.float32),
        "shapes": jnp.asarray(rng.randn(n, 10).astype(np.float32) * 0.3),
        "seq_lengths": jnp.asarray([f, f]),
    }
    batch = T.smpl_fk_markers(sensor, batch)
    out = T.sample_markers_with_offsets(batch, bank, jax.random.PRNGKey(0), noise_level,
                                        randomize=noise_level >= 0)
    assert out["marker_pos"].shape == (n, f, 36)
    assert out["marker_ori"].shape == (n, f, 108)
    assert out["offset_t"].shape == (n, 12, 3)
    assert out["offset_r"].shape == (n, 12, 3, 3)

    ms = np.asarray(batch["marker_pos_vertex"]).reshape(n, f, 12, 3)
    ori = np.asarray(batch["marker_ori_vertex"]).reshape(n, f, 12, 3, 3)
    got = np.asarray(out["marker_pos"]).reshape(n, f, 12, 3)
    if noise_level in (2, 3):
        # Zero translational offsets -> marker positions untouched.
        np.testing.assert_allclose(got, ms, atol=1e-6)
    if noise_level == 3:
        # Identity rotation offsets -> orientations untouched.
        np.testing.assert_allclose(np.asarray(out["marker_ori"]).reshape(n, f, 12, 3, 3), ori, atol=1e-6)
    if noise_level == -1:
        # Mean offsets applied deterministically given the subject choice.
        off_t = np.asarray(out["offset_t"])
        expect = ms + np.einsum("nfmab,nmb->nfma", ori, off_t)
        np.testing.assert_allclose(got, expect, atol=1e-5)


@pytest.mark.slow
def test_end_to_end_preprocess_fn(assets_env, smplh_model):
    sensor = SensorSMPL(smplh_model)
    bank = T.OffsetBank.from_offset_files(list(D.get_all_offset_files().values()))
    cfg = Configuration.from_dict(dict(
        use_real_offsets=True, offset_noise_level=0, spherical_noise_length=0.1,
        spherical_noise_strength=0.2, noise_num_markers=1, suppression_noise_length=0.0,
        suppression_noise_value=0.0, n_markers=12))
    pre = T.make_preprocess_fn(sensor, bank, cfg, randomize_if_configured=True)

    rng = np.random.RandomState(2)
    n, f = 2, 10
    batch = {
        "poses": jnp.asarray(rng.randn(n, f, 66).astype(np.float32) * 0.3),
        "trans": jnp.asarray(rng.randn(n, f, 3).astype(np.float32)),
        "shapes": jnp.asarray(rng.randn(n, 10).astype(np.float32) * 0.3),
        "seq_lengths": jnp.asarray([f, f]),
    }
    out = pre(batch, jax.random.PRNGKey(7), mode="all")
    for k in ("marker_pos", "marker_ori", "marker_nor", "joints_gt", "offset_t", "offset_r"):
        assert k in out, k
    # Jit the whole pipeline (the real deployment path).
    jitted = jax.jit(lambda b, k: pre(b, k, mode="all"))
    out2 = jitted(batch, jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(out["marker_pos"]), np.asarray(out2["marker_pos"]), atol=1e-5)


def test_suppression_noise(assets_env):
    from empose_tpu.data.noise import marker_suppression_noise_fn
    fn = marker_suppression_noise_fn(0.5, 1, 0.0, 12)
    rng = np.random.RandomState(3)
    n, f = 3, 8
    batch = {
        "marker_pos": jnp.asarray(rng.randn(n, f, 36).astype(np.float32)),
        "marker_ori": jnp.asarray(rng.randn(n, f, 108).astype(np.float32)),
        "marker_nor": jnp.asarray(rng.randn(n, f, 36).astype(np.float32)),
    }
    out = fn(batch, jax.random.PRNGKey(0))
    mp = np.asarray(out["marker_pos"]).reshape(n, f, 12, 3)
    # Exactly one marker over window_len frames per entry is zeroed.
    zeroed = np.all(mp == 0.0, axis=-1)
    assert zeroed.sum() == n * int(0.5 * f)


def test_spherical_noise(assets_env):
    from empose_tpu.data.noise import spherical_marker_noise_fn
    fn = spherical_marker_noise_fn(0.5, 0.5, 2)
    rng = np.random.RandomState(4)
    n, f = 2, 8
    orig = rng.randn(n, f, 36).astype(np.float32)
    batch = {"marker_pos": jnp.asarray(orig)}
    out = fn(batch, jax.random.PRNGKey(1))
    diff = np.asarray(out["marker_pos"]) - orig
    changed_frames = np.any(diff.reshape(n, f, 12, 3) != 0, axis=(-1, -2))
    assert changed_frames.sum() > 0
    # At most num_markers markers per frame changed.
    per_marker = np.any(diff.reshape(n, f, 12, 3) != 0, axis=-1)
    assert per_marker.sum(-1).max() <= 2


def test_slice_window(assets_env):
    ds = D.RealDataset(C.data_dir_real())
    batch = B.collate_real([ds[0]])
    w = B.slice_window(batch, 4, 12)
    assert w["poses"].shape[1] == 8
    assert w["seq_lengths"][0] == 8
    assert w["offset_t"].shape == batch["offset_t"].shape


def test_native_emr_batcher_matches_python(assets_env):
    import os as _os
    from empose_tpu.data.emr import EMRReader, NativeEMRBatcher
    path = _os.path.join(C.data_dir_synth(), "amass_emr", "corpus.emr")
    reader = EMRReader(path)
    batcher = NativeEMRBatcher(reader)
    indices = [0, 1, 0]
    starts = [0, 3, 5]
    frames = [8, 8, 4]
    got = batcher.gather_windows("poses", indices, starts, frames, 8)
    assert got.shape == (3, 8, 66)
    for k, (i, s, f) in enumerate(zip(indices, starts, frames)):
        expect = reader.read(i, "poses", s, s + f)
        np.testing.assert_array_equal(got[k, :f], expect)
    assert np.all(got[2, 4:] == 0.0)
    betas = batcher.gather_fixed("betas", indices)
    np.testing.assert_array_equal(betas[0], reader.read(0, "betas"))
    batcher.close()


def test_emr_batch_loader(assets_env):
    import os as _os
    from empose_tpu.data.datasets import EMRBatchLoader
    loader = EMRBatchLoader(_os.path.join(C.data_dir_synth(), "amass_emr"),
                            batch_size=2, window_size=16, shuffle=True, seed=0)
    batch = next(iter(loader))
    assert batch["poses"].shape[0] == 2
    assert batch["poses"].shape[1] % 32 == 0
    assert batch["shapes"].shape == (2, 10)
    assert batch["joints_gt"].shape[-1] == 66
    assert (batch["seq_lengths"] <= 16).all()


@pytest.mark.parametrize("noise_level,randomize", [(-1, False), (-1, True), (0, True),
                                                   (1, True), (2, True), (3, True)])
@pytest.mark.slow
def test_fused_datagen_matches_two_step(assets_env, smplh_model, noise_level, randomize):
    """The fused lane-major datagen (FK + offset application in one
    lane-domain program, transforms.py::smpl_fk_markers_with_offsets) must be
    value- AND gradient-equivalent to the row-major two-step chain
    smpl_fk_markers -> sample_markers_with_offsets: same key splits, same
    draw shapes, same outputs up to f32 reassociation."""
    sensor = SensorSMPL(smplh_model)
    assert sensor.use_lanes, "lane FK must be on for the fused path"
    bank = T.OffsetBank.from_offset_files(list(D.get_all_offset_files().values()))
    rng = np.random.RandomState(11)
    n, f = 2, 4
    batch = {
        "poses": jnp.asarray(rng.randn(n, f, 66).astype(np.float32) * 0.3),
        "trans": jnp.asarray(rng.randn(n, f, 3).astype(np.float32)),
        "shapes": jnp.asarray(rng.randn(n, 10).astype(np.float32) * 0.3),
        "seq_lengths": jnp.asarray([f, f]),
    }
    key = jax.random.PRNGKey(5)

    def two_step(b):
        b = T.smpl_fk_markers(sensor, b)
        return T.sample_markers_with_offsets(b, bank, key, noise_level, randomize)

    def fused(b):
        return T.smpl_fk_markers_with_offsets(sensor, b, bank, key, noise_level, randomize)

    out_a, out_b = two_step(batch), fused(batch)
    for k in ("marker_pos", "marker_ori", "marker_nor", "joints_gt", "offset_t", "offset_r"):
        np.testing.assert_allclose(np.asarray(out_b[k]), np.asarray(out_a[k]),
                                   atol=3e-6, rtol=1e-5, err_msg=k)

    # Gradient parity through the fused chain (the train step differentiates
    # datagen outputs only via stop-gradient-free consumers; still, the VJPs
    # must agree for safety under future fusions).
    ct_pos = jnp.asarray(rng.randn(*out_a["marker_pos"].shape).astype(np.float32))
    ct_ori = jnp.asarray(rng.randn(*out_a["marker_ori"].shape).astype(np.float32))

    def loss(fn, poses):
        o = fn(dict(batch, poses=poses))
        return jnp.sum(o["marker_pos"] * ct_pos) + jnp.sum(o["marker_ori"] * ct_ori)

    g_a = jax.grad(lambda p: loss(two_step, p))(batch["poses"])
    g_b = jax.grad(lambda p: loss(fused, p))(batch["poses"])
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_a), atol=5e-5, rtol=5e-4)
