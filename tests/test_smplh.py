"""SMPL-H FK parity: JAX f32 vs independent torch f64 oracle."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from empose_tpu import constants as C
from empose_tpu.bodymodel.smplh import smplh_fk, smplh_fk_normalized_root, SMPLLayer
from tests.torch_ref.smpl import TorchSMPLH


@pytest.fixture(scope="module")
def oracle(synthetic_smplh_npz):
    return TorchSMPLH(synthetic_smplh_npz, num_betas=10)


def _random_inputs(rng, n):
    poses_body = (rng.randn(n, 63) * 0.3).astype(np.float32)
    betas = (rng.randn(n, 10) * 0.5).astype(np.float32)
    poses_root = (rng.randn(n, 3) * 0.5).astype(np.float32)
    trans = (rng.randn(n, 3) * 0.2).astype(np.float32)
    return poses_body, betas, poses_root, trans


def test_fk_matches_torch_oracle(smplh_model, oracle):
    rng = np.random.RandomState(0)
    poses_body, betas, poses_root, trans = _random_inputs(rng, 4)

    v_j, j_j = smplh_fk(smplh_model, jnp.asarray(poses_body), jnp.asarray(betas),
                        jnp.asarray(poses_root), jnp.asarray(trans))

    t = lambda x: torch.tensor(x, dtype=torch.float64)
    hands = torch.zeros((4, 90), dtype=torch.float64)
    v_t, j_t = oracle(t(poses_root), t(poses_body), t(betas), hands, t(trans))

    np.testing.assert_allclose(np.asarray(j_j), j_t.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(v_j), v_t.numpy(), atol=5e-5)


def test_fk_default_root_trans_and_beta_broadcast(smplh_model, oracle):
    rng = np.random.RandomState(1)
    poses_body, betas, _, _ = _random_inputs(rng, 3)
    betas1 = betas[:1]

    v_j, j_j = smplh_fk(smplh_model, jnp.asarray(poses_body), jnp.asarray(betas1))

    t = lambda x: torch.tensor(x, dtype=torch.float64)
    hands = torch.zeros((3, 90), dtype=torch.float64)
    zeros3 = torch.zeros((3, 3), dtype=torch.float64)
    v_t, j_t = oracle(zeros3, t(poses_body), t(np.repeat(betas1, 3, 0)), hands, zeros3)
    np.testing.assert_allclose(np.asarray(j_j), j_t.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(v_j), v_t.numpy(), atol=5e-5)


def test_fk_excess_betas_truncated(smplh_model):
    rng = np.random.RandomState(2)
    poses_body, betas, poses_root, trans = _random_inputs(rng, 2)
    betas16 = np.concatenate([betas, rng.randn(2, 6).astype(np.float32)], axis=1)
    v1, j1 = smplh_fk(smplh_model, jnp.asarray(poses_body), jnp.asarray(betas))
    v2, j2 = smplh_fk(smplh_model, jnp.asarray(poses_body), jnp.asarray(betas16))
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j2), atol=1e-7)


def test_subset_fk_equals_full_rows(smplh_model):
    rng = np.random.RandomState(3)
    poses_body, betas, poses_root, trans = _random_inputs(rng, 3)
    rows = np.asarray(C.VERTEX_IDS)
    sub = smplh_model.subset(rows)
    v_full, j_full = smplh_fk(smplh_model, jnp.asarray(poses_body), jnp.asarray(betas),
                              jnp.asarray(poses_root), jnp.asarray(trans))
    v_sub, j_sub = smplh_fk(sub, jnp.asarray(poses_body), jnp.asarray(betas),
                            jnp.asarray(poses_root), jnp.asarray(trans))
    np.testing.assert_allclose(np.asarray(j_sub), np.asarray(j_full), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_sub), np.asarray(v_full)[:, rows], atol=1e-5)


@pytest.mark.slow
def test_normalized_root_first_frame_identity(smplh_model):
    rng = np.random.RandomState(4)
    poses_body, betas, poses_root, trans = _random_inputs(rng, 5)
    _, j_norm = smplh_fk_normalized_root(smplh_model, jnp.asarray(poses_body), jnp.asarray(betas),
                                         jnp.asarray(poses_root), jnp.asarray(trans))
    # Frame 0 must equal FK with zero root/trans.
    _, j_zero = smplh_fk(smplh_model, jnp.asarray(poses_body[:1]), jnp.asarray(betas[:1]))
    np.testing.assert_allclose(np.asarray(j_norm)[0], np.asarray(j_zero)[0], atol=1e-5)


def test_layer_jit_and_window_arg(smplh_model):
    layer = SMPLLayer(smplh_model)
    rng = np.random.RandomState(5)
    poses_body, betas, poses_root, trans = _random_inputs(rng, 4)
    v1, j1 = layer.fk(jnp.asarray(poses_body), jnp.asarray(betas), jnp.asarray(poses_root), jnp.asarray(trans))
    v2, j2 = layer.fk(jnp.asarray(poses_body), jnp.asarray(betas), jnp.asarray(poses_root),
                      jnp.asarray(trans), window_size=2)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=0)
    j_only = layer.fk_joints(jnp.asarray(poses_body), jnp.asarray(betas), jnp.asarray(poses_root), jnp.asarray(trans))
    np.testing.assert_allclose(np.asarray(j_only), np.asarray(j1), atol=1e-6)
