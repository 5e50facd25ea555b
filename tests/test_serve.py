"""Streaming predictor: chunked push/flush == offline windowed forward."""

import numpy as np
import pytest

import jax

from empose_tpu.config import Configuration
from empose_tpu.serve import StreamingPredictor
import __graft_entry__ as GE


@pytest.fixture(scope="module")
def rnn_setup():
    cfg = Configuration.from_dict(dict(
        m_type="rnn", m_bidirectional=False, m_hidden_size=16, m_num_layers=1,
        m_estimate_shape=True, m_shape_hidden_size=8, m_average_shape=False,
        use_marker_pos=True, use_marker_ori=True, n_markers=12, window_size=8, lr=1e-3))
    model, _ = GE._build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    return model, params, state


def test_streaming_matches_offline(rnn_setup):
    model, params, state = rnn_setup
    predictor = StreamingPredictor(model, params, state, chunk_size=4)
    rng = np.random.RandomState(0)
    f = 12
    pos = rng.randn(f, 36).astype(np.float32)
    ori = rng.randn(f, 108).astype(np.float32)

    # Stream frame by frame.
    outs = []
    for t in range(f):
        o = predictor.push(pos[t:t + 1], ori[t:t + 1])
        if o is not None:
            outs.append(o)
    streamed = np.concatenate([o["pose_body"] for o in outs])
    assert streamed.shape == (12, 63)

    # Offline single window (unidirectional LSTM: streaming == full pass).
    import jax.numpy as jnp
    window = {"marker_pos": jnp.asarray(pos[None]), "marker_ori": jnp.asarray(ori[None]),
              "seq_lengths": jnp.asarray([f]),
              "offset_t": jnp.asarray(predictor.offset_t),
              "offset_r": jnp.asarray(predictor.offset_r)}
    out_full, _, _ = model.forward(params, state, window)
    np.testing.assert_allclose(streamed, np.asarray(out_full["pose_hat"])[0], atol=1e-5)


def test_flush_and_reset(rnn_setup):
    model, params, state = rnn_setup
    predictor = StreamingPredictor(model, params, state, chunk_size=4)
    rng = np.random.RandomState(1)
    o = predictor.push(rng.randn(3, 36).astype(np.float32), rng.randn(3, 108).astype(np.float32))
    assert o is None  # buffer below chunk size
    o = predictor.flush()
    assert o is not None and o["pose_body"].shape == (3, 63)
    assert "shape" in o and o["shape"].shape == (3, 10)
    # Shape frozen to first estimate.
    assert np.allclose(o["shape"][0], o["shape"][-1])
    predictor.reset()
    assert predictor.flush() is None


def test_streaming_lgd_with_carry(rnn_setup):
    """LGD-RNN predictor: chunked streaming == manual chunked forward with carry."""
    cfg = Configuration.from_dict(dict(
        m_type="lgd", m_rnn_init=True, m_use_gradient=True, m_average_shape=True,
        m_num_iterations=1, m_hidden_size=16, m_num_layers=1, m_rnn_hidden_size=8,
        m_rnn_num_layers=1, m_rnn_bidirectional=False,
        use_marker_pos=True, use_marker_ori=True, use_real_offsets=True,
        n_markers=12, window_size=4, lr=1e-3))
    model, _ = GE._build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(1))
    predictor = StreamingPredictor(model, params, state, chunk_size=4)

    rng = np.random.RandomState(2)
    f = 8
    pos = rng.randn(f, 36).astype(np.float32)
    ori = rng.randn(f, 108).astype(np.float32)
    out = predictor.push(pos, ori)
    assert out["pose_body"].shape == (8, 63)
    assert out["shape"].shape == (8, 10)

    # Manual two-chunk forward with carried state.
    import jax.numpy as jnp
    carry = model.initial_carry()
    manual = []
    for c in range(2):
        sl = slice(c * 4, (c + 1) * 4)
        w = {"marker_pos": jnp.asarray(pos[None, sl]), "marker_ori": jnp.asarray(ori[None, sl]),
             "seq_lengths": jnp.asarray([4]),
             "offset_t": jnp.asarray(predictor.offset_t),
             "offset_r": jnp.asarray(predictor.offset_r)}
        o, _, carry = model.forward(params, state, w, carry)
        manual.append(np.asarray(o["pose_hat"])[0])
    np.testing.assert_allclose(out["pose_body"], np.concatenate(manual), atol=1e-5)
