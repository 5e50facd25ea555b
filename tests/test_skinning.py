"""Pallas fused-LBS kernel vs XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from empose_tpu.ops import skinning as SK
from empose_tpu.bodymodel.smplh import smplh_fk


def test_pallas_lbs_matches_xla():
    rng = np.random.RandomState(0)
    n, v, j = 2, 700, 52  # v deliberately not a TILE_V multiple
    weights = rng.rand(v, j).astype(np.float32)
    weights /= weights.sum(1, keepdims=True)
    from scipy.spatial.transform import Rotation
    R = Rotation.random(n * j, random_state=1).as_matrix().astype(np.float32).reshape(n, j, 3, 3)
    t = rng.randn(n, j, 3).astype(np.float32)
    v_posed = rng.randn(n, v, 3).astype(np.float32)

    ref = np.asarray(SK.lbs_apply_xla(jnp.asarray(weights), jnp.asarray(R), jnp.asarray(t),
                                      jnp.asarray(v_posed)))
    lbs = SK.PallasLBS(weights)
    got = np.asarray(lbs(jnp.asarray(R), jnp.asarray(t), jnp.asarray(v_posed), interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_smplh_fk_with_pallas_lbs(smplh_model):
    rng = np.random.RandomState(1)
    poses_body = (rng.randn(2, 63) * 0.3).astype(np.float32)
    betas = (rng.randn(2, 10) * 0.5).astype(np.float32)
    v_ref, j_ref = smplh_fk(smplh_model, jnp.asarray(poses_body), jnp.asarray(betas))

    lbs = SK.PallasLBS(np.asarray(smplh_model.weights))
    lbs_interp = lambda R, t, vp: lbs(R, t, vp, interpret=True)
    v_pal, j_pal = smplh_fk(smplh_model, jnp.asarray(poses_body), jnp.asarray(betas),
                            lbs_fn=lbs_interp)
    np.testing.assert_allclose(np.asarray(j_pal), np.asarray(j_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_ref), atol=2e-5)
