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


def _lgd_setup(seed=1):
    cfg = Configuration.from_dict(dict(
        m_type="lgd", m_rnn_init=True, m_use_gradient=True, m_average_shape=True,
        m_num_iterations=1, m_hidden_size=16, m_num_layers=1, m_rnn_hidden_size=8,
        m_rnn_num_layers=1, m_rnn_bidirectional=False,
        use_marker_pos=True, use_marker_ori=True, use_real_offsets=True,
        n_markers=12, window_size=4, lr=1e-3))
    model, _ = GE._build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(seed))
    return model, params, state


@pytest.mark.slow
def test_multi_stream_matches_single_streams(rnn_setup):
    """MultiStreamPredictor: 3 interleaved sessions == 3 independent
    single-stream predictors, frame for frame — including a mid-session reset
    and per-stream mounting offsets."""
    from empose_tpu.serve import MultiStreamPredictor
    model, params, state = _lgd_setup(seed=3)
    rng = np.random.RandomState(7)
    S, chunk = 3, 4
    n_frames = [12, 8, 12]
    feeds = [(rng.randn(n, 36).astype(np.float32), rng.randn(n, 108).astype(np.float32))
             for n in n_frames]
    offsets = [((rng.randn(12, 3) * 0.02).astype(np.float32),
                np.broadcast_to(np.eye(3, dtype=np.float32), (12, 3, 3)).copy())
               for _ in range(S)]

    multi = MultiStreamPredictor(model, params, state, n_streams=S, chunk_size=chunk)
    singles = []
    for i in range(S):
        multi.set_offsets(i, *offsets[i])
        singles.append(StreamingPredictor(model, params, state, chunk_size=chunk,
                                          offset_t=offsets[i][0], offset_r=offsets[i][1]))

    got = {i: [] for i in range(S)}
    want = {i: [] for i in range(S)}
    reset_at = {1: 4}  # stream 1 restarts after 4 frames
    fed = [0] * S
    for t in range(max(n_frames)):
        for i in range(S):
            if fed[i] >= n_frames[i]:
                continue
            if reset_at.get(i) == fed[i]:
                multi.reset(i)
                singles[i].reset()
            pos, ori = feeds[i][0][fed[i]:fed[i] + 1], feeds[i][1][fed[i]:fed[i] + 1]
            multi.push(i, pos, ori)
            o = singles[i].push(pos, ori)
            if o is not None:
                want[i].append(o["pose_body"])
            fed[i] += 1
        for sid, out in multi.step().items():
            got[sid].append(out["pose_body"])

    # Drain tails identically.
    for sid, out in multi.step(flush_ids=list(range(S))).items():
        got[sid].append(out["pose_body"])
    for i in range(S):
        o = singles[i].flush()
        if o is not None:
            want[i].append(o["pose_body"])

    for i in range(S):
        g = np.concatenate(got[i]) if got[i] else np.zeros((0, 63))
        w = np.concatenate(want[i]) if want[i] else np.zeros((0, 63))
        assert g.shape == w.shape, i
        np.testing.assert_allclose(g, w, atol=1e-5, err_msg=f"stream {i}")


def test_multi_stream_idle_streams_untouched(rnn_setup):
    """A stream that never receives frames stays bit-identical to a fresh one:
    zero-length windows freeze its carry."""
    from empose_tpu.serve import MultiStreamPredictor
    model, params, state = _lgd_setup(seed=4)
    rng = np.random.RandomState(8)
    multi = MultiStreamPredictor(model, params, state, n_streams=2, chunk_size=4)
    # Feed only stream 0 for two chunks.
    multi.push(0, rng.randn(8, 36).astype(np.float32), rng.randn(8, 108).astype(np.float32))
    outs = multi.step()
    outs2 = multi.step()
    assert set(outs) == {0} and set(outs2) == {0}
    # Now stream 1 starts: must match a fresh single-stream predictor.
    pos = rng.randn(4, 36).astype(np.float32)
    ori = rng.randn(4, 108).astype(np.float32)
    multi.push(1, pos, ori)
    got = multi.step()[1]["pose_body"]
    single = StreamingPredictor(model, params, state, chunk_size=4)
    want = single.push(pos, ori)["pose_body"]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_multi_stream_flush_drains_fully(rnn_setup):
    """flush([i]) drains a buffer LARGER than the chunk size completely —
    step(flush_ids) alone serves at most one chunk per call."""
    from empose_tpu.serve import MultiStreamPredictor
    model, params, state = rnn_setup
    rng = np.random.RandomState(12)
    chunk, n = 4, 11  # 2 full chunks + 3-frame tail in one push
    pos = rng.randn(n, 36).astype(np.float32)
    ori = rng.randn(n, 108).astype(np.float32)

    multi = MultiStreamPredictor(model, params, state, n_streams=2, chunk_size=chunk)
    multi.push(0, pos, ori)
    outs = multi.flush([0])
    assert multi.pending(0) == 0
    got = outs[0]["pose_body"]
    assert got.shape == (n, 63)

    single = StreamingPredictor(model, params, state, chunk_size=chunk)
    parts = [o for o in [single.push(pos, ori), single.flush()] if o is not None]
    want = np.concatenate([o["pose_body"] for o in parts])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_streaming_offset_reassignment(rnn_setup):
    """Reassigning predictor.offset_t/offset_r mid-session takes effect on
    the next chunk (offsets are device-cached behind a dirty flag)."""
    model, params, state = _lgd_setup(seed=5)
    rng = np.random.RandomState(13)
    chunk = 4
    pos = rng.randn(2 * chunk, 36).astype(np.float32)
    ori = rng.randn(2 * chunk, 108).astype(np.float32)
    new_t = (rng.randn(12, 3) * 0.05).astype(np.float32)
    new_r = np.broadcast_to(np.eye(3, dtype=np.float32), (12, 3, 3)).copy()

    # Mutated mid-session: default offsets for chunk 1, new ones for chunk 2.
    a = StreamingPredictor(model, params, state, chunk_size=chunk)
    out1 = a.push(pos[:chunk], ori[:chunk])
    a.offset_t = new_t
    a.offset_r = new_r
    out2 = a.push(pos[chunk:], ori[chunk:])

    # Control with the same offsets from the start: chunk 2 must match the
    # mutated predictor (same carry lineage), chunk 1 must NOT (different
    # offsets there).
    b = StreamingPredictor(model, params, state, chunk_size=chunk)
    ref1 = b.push(pos[:chunk], ori[:chunk])
    np.testing.assert_allclose(out1["pose_body"], ref1["pose_body"], atol=1e-6)
    assert not np.allclose(out2["pose_body"],
                           b.push(pos[chunk:], ori[chunk:])["pose_body"], atol=1e-5)


def test_multi_stream_mesh_sharded(rnn_setup):
    """MultiStreamPredictor over an 8-device DP mesh == unsharded, stream
    for stream — the serving-side extension of the training DP story."""
    from empose_tpu.parallel import mesh as M
    from empose_tpu.serve import MultiStreamPredictor
    model, params, state = _lgd_setup(seed=6)
    rng = np.random.RandomState(14)
    S, chunk, rounds = 8, 4, 3
    feeds = [(rng.randn(rounds * chunk, 36).astype(np.float32),
              rng.randn(rounds * chunk, 108).astype(np.float32)) for _ in range(S)]

    mesh = M.make_mesh(8)
    sharded = MultiStreamPredictor(model, params, state, n_streams=S,
                                   chunk_size=chunk, mesh=mesh)
    plain = MultiStreamPredictor(model, params, state, n_streams=S, chunk_size=chunk)

    with pytest.raises(ValueError, match="divisible"):
        MultiStreamPredictor(model, params, state, n_streams=S + 1,
                             chunk_size=chunk, mesh=mesh)

    for r in range(rounds):
        for i in range(S):
            pos = feeds[i][0][r * chunk:(r + 1) * chunk]
            ori = feeds[i][1][r * chunk:(r + 1) * chunk]
            sharded.push(i, pos, ori)
            plain.push(i, pos, ori)
        got, want = sharded.step(), plain.step()
        assert set(got) == set(want) == set(range(S))
        for i in range(S):
            np.testing.assert_allclose(got[i]["pose_body"], want[i]["pose_body"],
                                       atol=1e-5, err_msg=f"round {r} stream {i}")
        if r == 0:
            # The carry really lives sharded across the mesh.
            leaf = jax.tree_util.tree_leaves(sharded.carry)[0]
            assert len(leaf.sharding.device_set) == 8

    # Mid-session reset of one stream propagates through the sharded carry.
    sharded.reset(3)
    plain.reset(3)
    for i in range(S):
        sharded.push(i, feeds[i][0][:chunk], feeds[i][1][:chunk])
        plain.push(i, feeds[i][0][:chunk], feeds[i][1][:chunk])
    got, want = sharded.step(), plain.step()
    for i in range(S):
        np.testing.assert_allclose(got[i]["pose_body"], want[i]["pose_body"],
                                   atol=1e-5, err_msg=f"post-reset stream {i}")


@pytest.mark.slow
def test_multi_stream_mesh_lstm_kernel(rnn_setup, monkeypatch):
    """The weight-resident LSTM kernel under the DP-sharded serving trace:
    its custom_partitioning rule (ops/lstm_kernel.py) runs the kernel on each
    device's stream shard, so the sharded predictor with the kernel engaged
    must match the unsharded scan path stream for stream."""
    from empose_tpu.nn import layers as L
    from empose_tpu.parallel import mesh as M
    from empose_tpu.serve import MultiStreamPredictor

    monkeypatch.setattr(L, "LSTM_KERNEL", "interpret")
    monkeypatch.setattr(L, "LSTM_KERNEL_MIN_BATCH", 2)

    model, params, state = _lgd_setup(seed=7)
    rng = np.random.RandomState(21)
    S, chunk, rounds = 16, 4, 2  # 2 streams per device: clears the (patched) gate
    mesh = M.make_mesh(8)
    sharded = MultiStreamPredictor(model, params, state, n_streams=S,
                                   chunk_size=chunk, mesh=mesh)
    plain = MultiStreamPredictor(model, params, state, n_streams=S,
                                 chunk_size=chunk)
    assert sharded._kernel_ok_sharded

    for r in range(rounds):  # round 2 exercises the carried state
        for i in range(S):
            pos = rng.randn(chunk, 36).astype(np.float32)
            ori = rng.randn(chunk, 108).astype(np.float32)
            sharded.push(i, pos, ori)
            plain.push(i, pos, ori)
        got = sharded.step()  # traces (r=0) WITH the kernel, sharded
        with L.lstm_kernel_disabled():  # reference: scan path, unsharded
            want = plain.step()
        for i in range(S):
            np.testing.assert_allclose(got[i]["pose_body"], want[i]["pose_body"],
                                       atol=1e-5,
                                       err_msg=f"round {r} stream {i}")
    leaf = jax.tree_util.tree_leaves(sharded.carry)[0]
    assert len(leaf.sharding.device_set) == 8  # not forced to replicate


@pytest.mark.parametrize("dp_devices", [1, 2])
def test_serve_cli_multi_stream(rnn_setup, assets_env, monkeypatch, capsys, tmp_path,
                                dp_devices):
    """scripts/serve.py --streams N: per-stream records in, per-stream
    records out, interleaved — unsharded and over a 2-device DP mesh."""
    import io
    import json
    import argparse
    import os
    from empose_tpu.checkpoint.native import save_params_state
    from empose_tpu.config import Configuration

    model, params, state = rnn_setup
    # Fake experiment dir the CLI can load.
    exp = tmp_path / "700001-RNN-test"
    exp.mkdir()
    cfg = Configuration.from_dict(dict(
        m_type="rnn", m_bidirectional=False, m_hidden_size=16, m_num_layers=1,
        m_estimate_shape=True, m_shape_hidden_size=8, m_average_shape=False,
        use_marker_pos=True, use_marker_ori=True, n_markers=12, window_size=8, lr=1e-3))
    cfg.to_json(str(exp / "config.json"))
    save_params_state(str(exp / "checkpoint_model"), params, state)
    monkeypatch.setenv("EM_EXPERIMENTS", str(tmp_path))

    rng = np.random.RandomState(9)
    lines = []
    for t in range(4):
        for sid in (0, 1):
            lines.append(json.dumps({
                "stream": sid,
                "marker_pos": rng.randn(36).astype(float).tolist(),
                "marker_ori": rng.randn(108).astype(float).tolist()}))
    # Out-of-range stream ids must be dropped with a warning, not crash the
    # server (positive overflow) or alias stream S-1 (negative indexing).
    for sid in (-1, 2):
        lines.append(json.dumps({
            "stream": sid,
            "marker_pos": rng.randn(36).astype(float).tolist(),
            "marker_ori": rng.randn(108).astype(float).tolist()}))
    monkeypatch.setattr("sys.stdin", io.StringIO("\n".join(lines) + "\n"))

    from scripts.serve import main as serve_main
    serve_main(argparse.Namespace(model_id="700001", chunk=4, streams=2,
                                  dp_devices=dp_devices))
    captured = capsys.readouterr()
    assert captured.err.count("dropping record") == 2
    out_lines = [json.loads(l) for l in captured.out.strip().splitlines()
                 if l.startswith("{")]
    by_stream = {}
    for rec in out_lines:
        by_stream.setdefault(rec["stream"], []).append(rec)
    assert set(by_stream) == {0, 1}
    for sid, recs in by_stream.items():
        assert [r["frame"] for r in recs] == list(range(4))
        assert all(len(r["pose_body"]) == 63 for r in recs)


def test_serve_cli_precision_flag(rnn_setup, assets_env, monkeypatch, capsys, tmp_path):
    """--precision default (bf16 serving mode) binds both knobs, restores
    cleanly, and produces outputs matching the parity mode (identical on the
    CPU test mesh, where DEFAULT is still f32)."""
    import io
    import json
    import argparse
    from empose_tpu.checkpoint.native import save_params_state
    from empose_tpu.nn import layers as L
    from empose_tpu.ops import fk_lanes as FK

    model, params, state = rnn_setup
    exp = tmp_path / "700002-RNN-test"
    exp.mkdir()
    cfg = Configuration.from_dict(dict(
        m_type="rnn", m_bidirectional=False, m_hidden_size=16, m_num_layers=1,
        m_estimate_shape=True, m_shape_hidden_size=8, m_average_shape=False,
        use_marker_pos=True, use_marker_ori=True, n_markers=12, window_size=8, lr=1e-3))
    cfg.to_json(str(exp / "config.json"))
    save_params_state(str(exp / "checkpoint_model"), params, state)
    monkeypatch.setenv("EM_EXPERIMENTS", str(tmp_path))

    rng = np.random.RandomState(11)
    lines = [json.dumps({"marker_pos": rng.randn(36).astype(float).tolist(),
                         "marker_ori": rng.randn(108).astype(float).tolist()})
             for _ in range(4)]
    from scripts.serve import main as serve_main

    outs = {}
    try:
        for prec in ("highest", "default"):
            monkeypatch.setattr("sys.stdin", io.StringIO("\n".join(lines) + "\n"))
            serve_main(argparse.Namespace(model_id="700002", chunk=4, streams=1,
                                          precision=prec))
            outs[prec] = [json.loads(l) for l in
                          capsys.readouterr().out.strip().splitlines()
                          if l.startswith("{")]
            if prec == "default":
                assert L._HI == jax.lax.Precision.DEFAULT
                assert FK._HI == jax.lax.Precision.DEFAULT
    finally:
        L.set_nn_precision("highest")
        FK.set_fk_precision("highest")

    assert len(outs["highest"]) == len(outs["default"]) == 4
    a = np.array([r["pose_body"] for r in outs["highest"]])
    b = np.array([r["pose_body"] for r in outs["default"]])
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.slow
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
