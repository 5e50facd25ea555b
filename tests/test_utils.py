"""Utility modules: scalar logging, experiment dirs, profiling timers."""

import json
import os

import numpy as np
import jax


def test_scalar_writer_jsonl(tmp_path):
    from empose_tpu.utils.logging import ScalarWriter
    w = ScalarWriter(str(tmp_path))
    w.add_scalar("loss/train", 1.5, 10)
    w.add_scalars({"a": 1.0, "b": 2.0}, 11, prefix="x/")
    w.close()
    lines = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    assert lines[0] == {**lines[0], "tag": "loss/train", "value": 1.5, "step": 10}
    assert {l["tag"] for l in lines} == {"loss/train", "x/a", "x/b"}


def test_experiment_dir_conventions(tmp_path):
    from empose_tpu.utils import experiments as U
    d = U.create_model_dir(str(tmp_path), 1234567890, "ResNet-2x256")
    assert os.path.isdir(d) and "1234567890-ResNet-2x256" in d
    assert U.get_model_dir(str(tmp_path), 1234567890) == d
    assert U.get_model_dir(str(tmp_path), 42) is None
    # Duplicate creation refused (reference utils.py:48-49).
    import pytest
    with pytest.raises(ValueError):
        U.create_model_dir(str(tmp_path), 1234567890, "ResNet-2x256")
    # zip_files avoids clobbering.
    f = tmp_path / "x.py"
    f.write_text("pass")
    z1 = U.zip_files([str(f)], str(tmp_path / "code.zip"))
    z2 = U.zip_files([str(f)], str(tmp_path / "code.zip"))
    assert z1 != z2 and os.path.exists(z1) and os.path.exists(z2)


def test_count_parameters():
    from empose_tpu.utils.experiments import count_parameters
    tree = {"a": np.zeros((3, 4)), "b": [np.zeros(5), np.zeros((2, 2))]}
    assert count_parameters(tree) == 12 + 5 + 4


def test_profiling_timer():
    from empose_tpu.utils.profiling import Timings
    t = Timings()
    x = jax.numpy.ones((8, 8))
    with t.measure("op", block_on=x):
        y = x * 2
    assert "op" in t.ema and t.ema["op"] >= 0
    assert "op:" in t.summary()


def test_compilation_cache_env(tmp_path, monkeypatch):
    from empose_tpu.utils.cache import enable_compilation_cache
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "cc"))
    d = enable_compilation_cache()
    assert d == str(tmp_path / "cc") and os.path.isdir(d)
