"""Streaming inference: low-latency pose estimation over live sensor feeds.

The reference only supports offline batch evaluation; this module packages
the streaming-window machinery (fixed-shape chunks + carried RNN state, the
same mechanics as eval) behind a push API for deployment:

    predictor = StreamingPredictor.from_experiment(model_id)
    predictor.reset()
    while sensors_alive:
        poses = predictor.push(marker_pos_frames, marker_ori_frames)

Frames are buffered into fixed ``chunk_size`` windows so exactly ONE XLA
program serves the whole session; ``flush()`` drains the (padded) tail.
Measured end-to-end (tools/bench_serve.py, released LGD-RNN-6, chunk 16, one
tunneled v5e chip): p50 32 ms / p99 57 ms per chunk — 8.4x real-time headroom
at the 60 fps sensor rate, ~2 ms added latency per frame. The per-chunk
exchange is one packed upload + one packed download; on a tunneled device
those hops cost network RTT, which is why outputs are concatenated in-program
(3 downloads -> 1 halved the p50 here; a locally-attached chip sits well
below these numbers).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _make_run(model, pos_d: int, sink) -> "jax.stages.Wrapped":
    """The per-chunk device program shared by both predictor classes:
    unpack the ONE upload (pos|ori), forward, concatenate the outputs into
    the ONE download (root|pose[|shape]). Records the actual root/pose
    widths on ``sink`` at trace time (like eval/harness.py's EvalSession)
    so the host-side unpack never hardcodes the 3/63 layout."""

    def run(params, state, pos_ori, lengths, offset_t, offset_r, carry):
        window = {
            "marker_pos": pos_ori[..., :pos_d],
            "marker_ori": pos_ori[..., pos_d:],
            "seq_lengths": lengths,
            "offset_t": offset_t,
            "offset_r": offset_r,
        }
        out, _, new_carry = model.forward(params, state, window, carry, train=False)
        parts = [out["root_ori_hat"], out["pose_hat"]]
        if out.get("shape_hat") is not None:
            parts.append(out["shape_hat"])
        sink._w_root = int(out["root_ori_hat"].shape[-1])
        sink._w_pose = int(out["pose_hat"].shape[-1])
        return jnp.concatenate(parts, axis=-1), new_carry

    return jax.jit(run)


def _unpack_rows(sink, rows: np.ndarray) -> Dict[str, np.ndarray]:
    """Split a (K, root|pose[|shape]) download by the trace-recorded widths."""
    r, p = sink._w_root, sink._w_pose
    out = {"root_ori": rows[:, :r], "pose_body": rows[:, r:r + p]}
    if rows.shape[-1] > r + p:
        out["shape"] = rows[:, r + p:]
    return out


class StreamingPredictor:
    def __init__(self, model, params, state, chunk_size: int = 16,
                 offset_t: Optional[np.ndarray] = None, offset_r: Optional[np.ndarray] = None,
                 n_raw_markers: int = 12):
        """:param offset_t/offset_r: per-subject mounting offsets (M, 3)/(M, 3, 3);
        identity/zero when unknown (matching RealBatch defaults, reference
        data.py:229-233)."""
        self.model = model
        self.params = params
        self.state = state
        self.chunk = chunk_size
        self.m = n_raw_markers
        self._offset_t = np.zeros((1, self.m, 3), np.float32) if offset_t is None else \
            np.asarray(offset_t, np.float32)[None]
        self._offset_r = np.broadcast_to(np.eye(3, dtype=np.float32), (1, self.m, 3, 3)).copy() \
            if offset_r is None else np.asarray(offset_r, np.float32)[None]
        # Session-resident device constants: on a tunneled/remote device every
        # host<->device hop costs ~network-RTT, so the per-chunk exchange is
        # squeezed to ONE packed upload (pos|ori) and ONE packed download
        # (root|pose[|shape]) — measured ~2x end-to-end latency cut at chunk 16.
        # Re-uploaded (dirty flag) when the offsets are reassigned mid-session.
        self._offsets_dirty = True
        self._offset_t_dev = None
        self._offset_r_dev = None
        self._full_lengths = jnp.full((1,), chunk_size, jnp.int32)
        self._w_root, self._w_pose = 3, 63  # overwritten at trace time
        self._run = _make_run(model, self.m * 3, self)
        self.reset()

    @property
    def offset_t(self) -> np.ndarray:
        return self._offset_t

    @offset_t.setter
    def offset_t(self, value: np.ndarray) -> None:
        self._offset_t = np.asarray(value, np.float32).reshape(1, self.m, 3)
        self._offsets_dirty = True

    @property
    def offset_r(self) -> np.ndarray:
        return self._offset_r

    @offset_r.setter
    def offset_r(self, value: np.ndarray) -> None:
        self._offset_r = np.asarray(value, np.float32).reshape(1, self.m, 3, 3)
        self._offsets_dirty = True

    @classmethod
    def from_experiment(cls, model_id, chunk_size: int = 16, **kw) -> "StreamingPredictor":
        from empose_tpu.eval.harness import load_model
        model, params, state, config, _, _ = load_model(model_id)
        return cls(model, params, state, chunk_size, **kw)

    def reset(self) -> None:
        """Start a new sequence (is_new_sequence=True in reference terms)."""
        self.carry = self.model.initial_carry()
        self._buf_pos: list = []
        self._buf_ori: list = []
        self.first_shape: Optional[np.ndarray] = None

    def _infer_chunk(self, pos: np.ndarray, ori: np.ndarray, n_valid: int):
        # device_put (async enqueue), not jnp.asarray (which blocks one
        # tunnel RTT): the chunk then costs a single sync — the download.
        pos_ori = jax.device_put(np.concatenate([pos, ori], axis=-1)[None])
        lengths = self._full_lengths if n_valid == self.chunk \
            else jax.device_put(np.asarray([n_valid], np.int32))
        if self._offsets_dirty:
            self._offset_t_dev = jax.device_put(self._offset_t)
            self._offset_r_dev = jax.device_put(self._offset_r)
            self._offsets_dirty = False
        packed, self.carry = self._run(self.params, self.state, pos_ori, lengths,
                                       self._offset_t_dev, self._offset_r_dev, self.carry)
        packed = np.asarray(packed)[0, :n_valid]  # the ONE download per chunk
        out = _unpack_rows(self, packed)
        if "shape" in out:
            if self.first_shape is None:
                # Shape frozen to the first chunk's estimate, matching the
                # reference streaming eval (evaluate_real.py:63-68).
                self.first_shape = out["shape"][0]
            out["shape"] = np.broadcast_to(self.first_shape, out["shape"].shape)
        return out

    def push(self, marker_pos: np.ndarray, marker_ori: np.ndarray) -> Optional[Dict[str, np.ndarray]]:
        """Feed frames; returns outputs for each COMPLETED chunk (or None).

        :param marker_pos: (K, M*3); :param marker_ori: (K, M*9).
        """
        self._buf_pos.extend(np.asarray(marker_pos, np.float32).reshape(-1, self.m * 3))
        self._buf_ori.extend(np.asarray(marker_ori, np.float32).reshape(-1, self.m * 9))
        outs = []
        while len(self._buf_pos) >= self.chunk:
            pos = np.stack(self._buf_pos[: self.chunk])
            ori = np.stack(self._buf_ori[: self.chunk])
            del self._buf_pos[: self.chunk]
            del self._buf_ori[: self.chunk]
            outs.append(self._infer_chunk(pos, ori, self.chunk))
        if not outs:
            return None
        return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}

    def flush(self) -> Optional[Dict[str, np.ndarray]]:
        """Drain buffered frames (right-padded to the chunk size)."""
        n = len(self._buf_pos)
        if n == 0:
            return None
        # Pad by repeating the last valid frame: per-sequence shape averaging
        # (m_average_shape, reference models.py:529-535) runs over ALL frames
        # of the window, so zero padding would pollute the estimate — and a
        # polluted first chunk would freeze a wrong session shape.
        pos = np.stack(self._buf_pos + [self._buf_pos[-1]] * (self.chunk - n))
        ori = np.stack(self._buf_ori + [self._buf_ori[-1]] * (self.chunk - n))
        self._buf_pos.clear()
        self._buf_ori.clear()
        return self._infer_chunk(pos, ori, n)


class MultiStreamPredictor:
    """Serve MANY independent sensor streams from ONE device program.

    Each stream is a live session (its own RNN carry, mounting offsets and
    frozen shape estimate); every :meth:`step` runs a single batched XLA call
    over all ``n_streams`` rows. Streams that have a full chunk buffered
    contribute it; the rest run with ``seq_lengths=0`` — the masked LSTM scan
    freezes their state on zero-length windows, so an idle stream is
    bit-identical to not having been stepped at all. Per-stream output parity
    with :class:`StreamingPredictor` is pinned by ``tests/test_serve.py``.

    At the measured batch-64 throughput (~675k frames/s for the released
    LGD-RNN-6) one v5e chip sustains thousands of 60 fps streams; the
    batched call amortizes the host<->device round-trip that dominates
    single-stream latency on a tunneled device.

    Per-stream sequence reset is exact for every model family: a fresh
    sequence means a zero LSTM state (``rnn_layer_init(learn_init_state=
    False)`` default — zeros; with the learned-init quirk the carry is
    recomputed from frame 0 every window anyway, reference layers.py:121-131,
    so a reset is a no-op there).
    """

    def __init__(self, model, params, state, n_streams: int, chunk_size: int = 16,
                 n_raw_markers: int = 12, mesh=None):
        """:param mesh: optional ``jax.sharding.Mesh`` — shards the STREAM
        axis over its devices (pure DP, same pattern as training:
        parallel/mesh.py). Parameters/state are replicated once here; the
        per-step upload is device_put with the stream axis sharded, and XLA
        propagates that sharding through the whole program, so one serving
        host drives a full ICI slice. Requires ``n_streams`` divisible by
        the mesh size (streams are live sessions — no wrap-around padding)."""
        self.model = model
        self.S = n_streams
        self.chunk = chunk_size
        self.m = n_raw_markers
        self.mesh = mesh
        if mesh is not None:
            from empose_tpu.parallel.mesh import batch_sharding, replicate
            n_dev = mesh.size
            if n_streams % n_dev:
                raise ValueError(
                    f"n_streams={n_streams} must be divisible by the mesh "
                    f"size {n_dev} (streams are live sessions and cannot be "
                    f"wrap-around padded)")
            self._stream_sharding = batch_sharding(mesh)
            params = replicate(params, mesh)
            state = replicate(state, mesh)
            from empose_tpu.nn.layers import LSTM_KERNEL_MIN_BATCH
            self._kernel_ok_sharded = (n_streams // n_dev) >= LSTM_KERNEL_MIN_BATCH
        else:
            self._kernel_ok_sharded = True  # lstm_apply's own gate decides
        self.params = params
        self.state = state
        self._offset_t = np.zeros((n_streams, self.m, 3), np.float32)
        self._offset_r = np.broadcast_to(
            np.eye(3, dtype=np.float32), (n_streams, self.m, 3, 3)).copy()
        self._offsets_dirty = True
        self._offset_t_dev = None
        self._offset_r_dev = None
        self._w_root, self._w_pose = 3, 63  # overwritten at trace time
        self._run = _make_run(model, self.m * 3, self)
        self.carry = model.initial_carry()
        self._bufs = [([], []) for _ in range(n_streams)]
        self._first_shape: list = [None] * n_streams

    @classmethod
    def from_experiment(cls, model_id, n_streams: int, chunk_size: int = 16,
                        **kw) -> "MultiStreamPredictor":
        from empose_tpu.eval.harness import load_model
        model, params, state, config, _, _ = load_model(model_id)
        return cls(model, params, state, n_streams, chunk_size, **kw)

    # ------------------------------------------------------------------
    def set_offsets(self, i: int, offset_t: np.ndarray, offset_r: np.ndarray) -> None:
        """Per-subject mounting offsets for stream ``i`` ((M, 3), (M, 3, 3))."""
        self._offset_t[i] = np.asarray(offset_t, np.float32)
        self._offset_r[i] = np.asarray(offset_r, np.float32)
        self._offsets_dirty = True

    def reset(self, i: int) -> None:
        """Start a new sequence on stream ``i`` (others are untouched)."""
        self._bufs[i] = ([], [])
        self._first_shape[i] = None
        if self.carry is not None:
            self.carry = jax.tree_util.tree_map(
                lambda a: a.at[:, i].set(0.0), self.carry)

    def push(self, i: int, marker_pos: np.ndarray, marker_ori: np.ndarray) -> None:
        """Buffer frames for stream ``i`` ((K, M*3), (K, M*9)); no device work."""
        bp, bo = self._bufs[i]
        bp.extend(np.asarray(marker_pos, np.float32).reshape(-1, self.m * 3))
        bo.extend(np.asarray(marker_ori, np.float32).reshape(-1, self.m * 9))

    def pending(self, i: int) -> int:
        return len(self._bufs[i][0])

    def step(self, flush_ids=()) -> Dict[int, Dict[str, np.ndarray]]:
        """ONE batched device call serving every ready stream.

        Streams with >= chunk_size buffered frames contribute a full chunk
        (same chunking as the single-stream predictor); streams listed in
        ``flush_ids`` contribute their partial buffer (padded by repeating
        the last frame, like :meth:`StreamingPredictor.flush`); all other
        streams run with length 0 and are untouched.

        :return: {stream_id: {"root_ori", "pose_body"[, "shape"]}} for every
          stream that contributed frames.
        """
        flush_ids = set(flush_ids)
        lengths = np.zeros(self.S, np.int32)
        packed_in = np.zeros((self.S, self.chunk, self.m * 12), np.float32)
        for i in range(self.S):
            bp, bo = self._bufs[i]
            k = self.chunk if len(bp) >= self.chunk else (
                len(bp) if i in flush_ids else 0)
            if k == 0:
                continue
            lengths[i] = k
            pos = np.stack(bp[:k] + [bp[k - 1]] * (self.chunk - k))
            ori = np.stack(bo[:k] + [bo[k - 1]] * (self.chunk - k))
            del bp[:k]
            del bo[:k]
            packed_in[i] = np.concatenate([pos, ori], axis=-1)
        if not lengths.any():
            return {}

        put = (lambda x: jax.device_put(x, self._stream_sharding)) \
            if self.mesh is not None else jax.device_put  # async (no RTT block)
        if self._offsets_dirty:
            self._offset_t_dev = put(self._offset_t)
            self._offset_r_dev = put(self._offset_r)
            self._offsets_dirty = False
        if self.mesh is not None and not self._kernel_ok_sharded:
            # The weight-resident LSTM kernel is gated on PER-DEVICE batch
            # (its custom_partitioning rule runs it on each device's stream
            # shard); below the gate the wavefront/scan paths are faster —
            # bind those instead (the choice binds at trace time, hence the
            # guard on every call: only the first one traces).
            from empose_tpu.nn.layers import lstm_kernel_disabled
            with lstm_kernel_disabled():
                packed, self.carry = self._run(
                    self.params, self.state, put(packed_in), put(lengths),
                    self._offset_t_dev, self._offset_r_dev, self.carry)
        else:
            packed, self.carry = self._run(
                self.params, self.state, put(packed_in), put(lengths),
                self._offset_t_dev, self._offset_r_dev, self.carry)
        packed = np.asarray(packed)  # the ONE download for all streams

        outs: Dict[int, Dict[str, np.ndarray]] = {}
        for i in np.nonzero(lengths)[0]:
            rows = packed[i, : lengths[i]]
            out = _unpack_rows(self, rows)
            if "shape" in out:
                if self._first_shape[i] is None:
                    # Frozen to the stream's first chunk, reference
                    # evaluate_real.py:63-68.
                    self._first_shape[i] = out["shape"][0]
                out["shape"] = np.broadcast_to(self._first_shape[i], out["shape"].shape)
            outs[int(i)] = out
        return outs

    def flush(self, ids) -> Dict[int, Dict[str, np.ndarray]]:
        """FULLY drain the listed streams' buffers (any number of frames).

        ``step(flush_ids=...)`` serves at most one chunk per stream per call
        (its one-batched-call contract); this loops it until the listed
        buffers are empty — e.g. after a multi-frame ``push`` larger than the
        chunk size — concatenating the per-stream outputs in order.
        """
        ids = list(ids)
        outs: Dict[int, list] = {}
        while True:
            got = self.step(flush_ids=[i for i in ids if self.pending(i)])
            for i, out in got.items():
                outs.setdefault(i, []).append(out)
            if not any(self.pending(i) for i in ids):
                break
        return {i: {k: np.concatenate([o[k] for o in parts]) for k in parts[0]}
                for i, parts in outs.items()}
