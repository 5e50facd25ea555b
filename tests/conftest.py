"""Test harness: force a virtual 8-device CPU mesh before JAX initializes."""

import os
import sys

# Tests run on a virtual 8-device CPU mesh (override with
# EMPOSE_TEST_PLATFORM=axon to run against the real TPU). NOTE: the ambient
# environment's sitecustomize registers the TPU PJRT plugin at interpreter
# startup and jax caches JAX_PLATFORMS at import, so the env var alone is NOT
# enough — jax.config.update below is what actually forces the platform.
_platform = os.environ.get("EMPOSE_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running integration tests (>=20 s on the 1-CPU CI host). "
        "`pytest -m 'not slow'` is the fast smoke tier for iteration; the "
        "FULL suite stays the merge gate.")


@pytest.fixture(scope="session")
def synthetic_smplh_npz():
    from empose_tpu.bodymodel.synthetic import make_synthetic_smplh
    return make_synthetic_smplh(seed=0)


@pytest.fixture(scope="session")
def smplh_model(synthetic_smplh_npz, tmp_path_factory):
    """Synthetic SMPL-H loaded through the real npz loader path."""
    import jax.numpy as jnp
    from empose_tpu.bodymodel.smplh import load_smplh
    path = tmp_path_factory.mktemp("smpl") / "model.npz"
    np.savez(path, **synthetic_smplh_npz)
    return load_smplh(str(path))


@pytest.fixture(scope="session")
def assets_dir(tmp_path_factory):
    """Full synthetic asset tree (smpl model, offsets, real npz, corpora)."""
    root = tmp_path_factory.mktemp("assets")
    from tools.make_synthetic_assets import generate_all
    generate_all(str(root), n_real_sequences=2, n_amass_sequences=3, n_frames=40, seed=11)
    return str(root)


@pytest.fixture()
def assets_env(assets_dir, monkeypatch):
    monkeypatch.setenv("SMPL_MODELS", os.path.join(assets_dir, "smpl_models"))
    monkeypatch.setenv("EM_DATA_REAL", os.path.join(assets_dir, "data_real"))
    monkeypatch.setenv("EM_DATA_SYNTH", os.path.join(assets_dir, "data_synth"))
    monkeypatch.setenv("EM_EXPERIMENTS", os.path.join(assets_dir, "experiments"))
    return assets_dir
