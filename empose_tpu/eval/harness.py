"""Evaluation harness: model loading, windowed streaming eval, metric loops.

Reference: empose/eval/helpers.py:30-200 + scripts/evaluate_real.py:24-101.
TPU-native specifics:
  * chunks are padded to the window size so every chunk of a sequence reuses
    ONE compiled program (the reference eats variable shapes; XLA cannot);
  * LSTM streaming state is an explicit carry threaded between chunks;
  * the per-chunk pipeline (FK for GT joints -> forward -> losses) is jitted
    as a single program.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from empose_tpu import constants as C
from empose_tpu.config import Configuration
from empose_tpu.bodymodel.smplh import load_smplh, smplh_fk
from empose_tpu.checkpoint.mapping import convert_model
from empose_tpu.checkpoint.torch_reader import load_state_dict
from empose_tpu.data import batches as B
from empose_tpu.data.datasets import EMRSequenceDataset, Loader, RealDataset
from empose_tpu.eval.metrics import MetricsEngine
from empose_tpu.nn.models import SensorSMPL, create_model, IterativeErrorFeedback
from empose_tpu.utils import experiments as U


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def pad_time(batch: Dict, target_f: int) -> Dict:
    """Right-pad all time-major arrays to target_f frames (host numpy)."""
    time_keys = ("poses", "trans", "joints_gt", "marker_pos", "marker_ori", "marker_nor", "marker_masks")
    out = {}
    for k, v in batch.items():
        if k in time_keys and v is not None and hasattr(v, "shape") and v.ndim >= 2:
            v = np.asarray(v)
            f = v.shape[1]
            if f < target_f:
                pad = [(0, 0)] * v.ndim
                pad[1] = (0, target_f - f)
                v = np.pad(v, pad)
        out[k] = v
    return out


def window_generator(batch: Dict, window_size: Optional[int]) -> Iterator[Tuple[Dict, int]]:
    """Slice a (host numpy) batch into fixed windows, padding the tail.

    Reference eval/helpers.py:30-48. Yields (window, true_frames).
    """
    seq_len = batch["poses"].shape[1]
    if window_size is None:
        yield batch, seq_len
        return
    n_windows = seq_len // window_size + int(seq_len % window_size > 0)
    for i in range(n_windows):
        sf = i * window_size
        ef = min((i + 1) * window_size, seq_len)
        # slice_window clips per-sample TRUE lengths into the chunk; do not
        # overwrite with the chunk span — collate pads sequences to a bucket
        # multiple, and counting pad frames as valid distorts masked losses.
        w = B.slice_window(batch, sf, ef)
        yield pad_time(w, window_size), ef - sf


def preprocess_real_chunk(sensor: SensorSMPL, chunk: Dict) -> Dict:
    """Device preprocessing for a REAL chunk: FK for GT joints only.

    The reference runs the full synth pipeline here and discards the synth
    markers for real batches (transforms.py:44 + data.py:304-309); we skip
    the dead work and only compute joints_gt.
    """
    poses = chunk["poses"]
    n, f = poses.shape[0], poses.shape[1]
    flat = poses.reshape(n * f, -1)
    shapes = jnp.repeat(chunk["shapes"], f, axis=0)
    _, joints = smplh_fk(sensor.full, flat[:, 3:], shapes, poses_root=flat[:, :3],
                         trans=chunk["trans"].reshape(n * f, 3), want_vertices=False)
    out = dict(chunk)
    out["joints_gt"] = joints[:, : C.N_JOINTS + 1].reshape(n, f, -1)
    return out


class EvalSession:
    """Jit-cached per-chunk eval pipeline for one model.

    :param noise_fn: optional f(chunk, key) applied to the sensor INPUTS per
      chunk — eval-time sensor-fault injection for robustness studies (the
      paper's suppression ablations; reference noise_functions.py:31-33 wires
      suppression noise into validation). Keys are deterministic per chunk
      index, the functional equivalent of the reference's reset_rng.
    """

    def __init__(self, model, params, state, sensor: SensorSMPL, noise_fn=None):
        self.model = model
        self.params = params
        self.state = state
        self.sensor = sensor
        self.noise_fn = noise_fn
        self._chunk_counter = 0

        # Trace-time side channel: loss-val names + packed-output split points
        # (both static per model). Filled on the first trace.
        self._val_names: list = []
        self._splits: list = []

        def run_chunk(params, state, chunk, carry, key):
            if noise_fn is not None:
                chunk = noise_fn(chunk, key)
            chunk = preprocess_real_chunk(sensor, chunk)
            out, _, new_carry = model.forward(params, state, chunk, carry, train=False)
            _, loss_vals = model.compute_loss(chunk, out)
            # Pack outputs/losses so the host pays exactly TWO d2h transfers
            # per chunk (on a tunneled device each hop costs network RTT).
            parts = [out["root_ori_hat"], out["pose_hat"]]
            if out.get("shape_hat") is not None:
                parts.append(out["shape_hat"])
            if not self._val_names:  # runs at trace time only
                self._val_names.extend(sorted(loss_vals))
            if not self._splits:  # separate guard: run_chunk_stats fills it too
                r, p = out["root_ori_hat"].shape[-1], out["pose_hat"].shape[-1]
                self._splits.extend([r, r + p, out.get("shape_hat") is not None])
            packed = jnp.concatenate(parts, axis=-1)
            vals = jnp.stack([loss_vals[k] for k in sorted(loss_vals)])
            return packed, vals, new_carry

        self._run_chunk = jax.jit(run_chunk)
        self._noise_base_key = jax.random.PRNGKey(8004)

        def run_chunk_stats(params, state, chunk, carry, key, stats, frozen_shape, is_first):
            """run_chunk + device-resident metric accumulation (VERDICT r3 #1).

            Fuses the FK/Procrustes/MPJAE error computation of the host
            MetricsEngine (reference metrics.py:183-241) into the chunk
            program and folds the per-joint (Σe, Σe², n) into ``stats``, so
            the eval loop syncs ONCE per sequence instead of ~10x per chunk.
            ``frozen_shape`` threads the chunk-0 shape estimate (reference
            evaluate_real.py:63-68) as a device carry; ``is_first`` selects
            between freezing it from this chunk and reusing the carry.
            """
            if noise_fn is not None:
                chunk = noise_fn(chunk, key)
            chunk = preprocess_real_chunk(sensor, chunk)
            out, _, new_carry = model.forward(params, state, chunk, carry, train=False)
            parts = [out["root_ori_hat"], out["pose_hat"]]
            shape_hat = out.get("shape_hat")
            if shape_hat is not None:
                parts.append(shape_hat)
                frozen = jnp.where(is_first, shape_hat[:, 0], frozen_shape)
            else:
                frozen = frozen_shape
            if not self._splits:  # runs at trace time only
                r, p = out["root_ori_hat"].shape[-1], out["pose_hat"].shape[-1]
                self._splits.extend([r, r + p, shape_hat is not None])
            from empose_tpu.eval.metrics import metric_stats_update
            stats = metric_stats_update(
                sensor.full, stats,
                pose=chunk["poses"][:, :, 3:], shape=chunk["shapes"],
                pose_hat=out["pose_hat"],
                shape_hat=(frozen if shape_hat is not None else None),
                seq_lengths=chunk["seq_lengths"],
                pose_root=chunk["poses"][:, :, :3],
                pose_root_hat=out["root_ori_hat"],
                frame_mask=chunk.get("marker_masks"))
            return jnp.concatenate(parts, axis=-1), stats, frozen, new_carry

        self._run_chunk_stats = jax.jit(run_chunk_stats)

        def run_pass(params, state, batch, window):
            """ONE XLA program for a whole real-data eval pass: ALL sequences
            batched on the leading axis, root normalization, the windowed
            forward as a ``lax.scan`` (LSTM carries threaded through the scan
            carry), and per-sequence metric sufficient statistics — so a pass
            costs ONE dispatch and ONE host sync total (the r04 serial loop
            paid a host round-trip per chunk upload + one sync per sequence).
            Fixed shapes per (n_seqs, frames, window) corpus signature; jit
            retraces per distinct signature.

            Two phases: (1) the scan streams ONLY the model forward (the part
            that needs sequential carries) and collects the predicted full
            pose per chunk; (2) the whole pass's FK / Procrustes / MPJAE
            statistics run as ONE batched update over all N*F rows — the
            metric math costs ~3x the forward per frame, and batching it
            across chunks measurably beats per-chunk updates (FK/angles scale
            ~2.2x for 4x rows on the chip). Identical sums either way (frame
            sums decompose over chunks).

            ALL chunks (including chunk 0) run inside one scan over a ZERO
            initial carry, so the model forward is traced/compiled ONCE:
            ``carry=None`` is equivalent to zeros for every model here —
            ``lstm_apply`` materializes zeros for a None init state, and
            learn-init-state models discard the carry each window anyway
            (the reference quirk, layers.py:121-131 / nn/models.py RNN
            forward). The carry STRUCTURE comes from ``jax.eval_shape`` of
            the chunk forward, so no model-specific API is needed.
            """
            from empose_tpu.data.transforms import normalize_root
            from empose_tpu.eval.metrics import metric_stats_init, metric_stats_update

            batch = normalize_root(batch)
            n, f = batch["poses"].shape[0], batch["poses"].shape[1]
            c = f // window
            seq_lengths = batch["seq_lengths"]
            # Only the keys the FORWARD consumes are chunked — (N, C*W, ...)
            # -> (C, N, W, ...) is a device-side reshape, no per-chunk host
            # slicing or re-upload. GT poses stay whole for phase 2.
            in_keys = ("marker_pos", "marker_ori", "marker_nor", "marker_masks")
            chunks = {k: jnp.moveaxis(
                batch[k].reshape((n, c, window) + batch[k].shape[2:]), 1, 0)
                for k in in_keys if batch.get(k) is not None}
            static_keys = {k: batch[k] for k in ("shapes", "offset_t", "offset_r")
                           if k in batch}

            def chunk_fwd(carry, chunk_t, idx):
                chunk = dict(static_keys)
                chunk.update(chunk_t)
                chunk["seq_lengths"] = jnp.clip(
                    seq_lengths - idx * window, 0, window).astype(jnp.int32)
                out, _, new_carry = model.forward(params, state, chunk, carry,
                                                  train=False)
                pose_full = jnp.concatenate(
                    [out["root_ori_hat"], out["pose_hat"]], axis=-1)  # (N, W, 66)
                shape_hat = out.get("shape_hat")
                return new_carry, pose_full, shape_hat

            first = {k: v[0] for k, v in chunks.items()}
            carry_sds, _, shape_sds = jax.eval_shape(chunk_fwd, None, first, 0)
            has_shape = shape_sds is not None
            carry0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), carry_sds)

            def body(carry, xs):
                chunk_t, idx = xs
                new_carry, pose_full, shape_hat = chunk_fwd(carry, chunk_t, idx)
                shape0 = shape_hat[:, 0] if has_shape else jnp.zeros((0,))
                return new_carry, (pose_full, shape0)

            _, (pose_all, shape0_all) = lax.scan(
                body, carry0, (chunks, jnp.arange(c)))       # (C, N, W, 66)
            pose_hat = jnp.moveaxis(pose_all, 1, 0).reshape(n, f, -1)  # (N, F, 66)
            # Chunk-0 shape freeze (reference evaluate_real.py:63-68).
            frozen = shape0_all[0] if has_shape else jnp.zeros_like(batch["shapes"])

            stats = metric_stats_update(
                sensor.full, metric_stats_init(n),
                pose=batch["poses"][:, :, 3:], shape=batch["shapes"],
                pose_hat=pose_hat[:, :, 3:],
                shape_hat=(frozen if has_shape else None),
                seq_lengths=seq_lengths,
                pose_root=batch["poses"][:, :, :3],
                pose_root_hat=pose_hat[:, :, :3],
                frame_mask=batch.get("marker_masks"),
                per_sample=True)
            return stats, frozen

        self._run_pass = jax.jit(run_pass, static_argnums=(3,))

    def forward_chunk(self, chunk: Dict, carry, host: bool = True):
        """:return: (outputs dict, loss-val dict, carry).

        ``host=True`` (default) converts outputs/loss-vals to host numpy —
        each conversion BLOCKS on the chunk's compute (a tunnel round-trip
        here). ``host=False`` returns device arrays so a caller that only
        aggregates (e.g. Trainer.evaluate_test) can defer the sync to one
        batched ``device_get`` per pass."""
        # device_put (async enqueue), not jnp.asarray (blocks ~one tunnel
        # RTT): the upload overlaps the previous chunk's compute.
        device_chunk = jax.device_put({k: v for k, v in chunk.items() if k != "ids"})
        key = jax.random.fold_in(self._noise_base_key, self._chunk_counter)
        self._chunk_counter += 1
        packed, vals, new_carry = self._run_chunk(self.params, self.state, device_chunk, carry, key)
        if host:
            packed = np.asarray(packed)
        s0, s1, has_shape = self._splits
        out = {"root_ori_hat": packed[..., :s0], "pose_hat": packed[..., s0:s1]}
        if has_shape:
            out["shape_hat"] = packed[..., s1:]
        vals_out = np.asarray(vals) if host else vals
        return out, dict(zip(self._val_names, vals_out)), new_carry

    def forward_chunk_stats(self, chunk: Dict, carry, stats, frozen_shape, is_first: bool):
        """Fully async chunk step: returns DEVICE (packed outputs, stats,
        frozen shape, carry) — no host sync at all. The caller flushes
        ``stats`` once per sequence (``jax.device_get``) and unpacks
        ``packed`` via :meth:`unpack_outputs` only when it needs poses
        (visualization)."""
        device_chunk = jax.device_put({k: v for k, v in chunk.items() if k != "ids"})
        key = jax.random.fold_in(self._noise_base_key, self._chunk_counter)
        self._chunk_counter += 1
        return self._run_chunk_stats(self.params, self.state, device_chunk, carry,
                                     key, stats, frozen_shape, is_first)

    def unpack_outputs(self, packed: np.ndarray) -> Dict[str, np.ndarray]:
        """Split a packed output array back into the named outputs."""
        s0, s1, has_shape = self._splits
        out = {"root_ori_hat": packed[..., :s0], "pose_hat": packed[..., s0:s1]}
        if has_shape:
            out["shape_hat"] = packed[..., s1:]
        return out


def load_model(model_id, experiment_dir: Optional[str] = None):
    """Reconstruct a model from its experiment dir (reference eval/helpers.py:148-164)."""
    experiment_dir = experiment_dir or C.experiment_dir()
    model_dir = U.get_model_dir(experiment_dir, model_id)
    if model_dir is None:
        raise FileNotFoundError(f"No experiment dir for model id {model_id} in {experiment_dir}")
    config = Configuration.from_json(os.path.join(model_dir, "config.json"))

    smplh = load_smplh()
    sensor = SensorSMPL(smplh)
    model = create_model(config, sensor)

    ckpt_file = os.path.join(model_dir, "model.pth")
    native_ckpt = os.path.join(model_dir, "checkpoint_model")
    # The NATIVE checkpoint wins when both exist: it is the live training
    # artifact, while a model.pth next to it is a torch-interop snapshot
    # (tools/export_torch.py) that would otherwise silently shadow later
    # training progress. Torch-imported experiments have only model.pth.
    if os.path.isdir(native_ckpt):
        from empose_tpu.checkpoint.native import restore_params_state
        params, state = restore_params_state(native_ckpt, model)
    elif os.path.exists(ckpt_file):
        sd = load_state_dict(ckpt_file)
        params, state = convert_model(sd, config)
    else:
        raise FileNotFoundError(f"No model.pth or native checkpoint_model in {model_dir}")

    import sys as _sys
    print(f"Model created with {U.count_parameters(params)} trainable parameters", file=_sys.stderr)
    return model, params, state, config, model_dir, sensor


def export_visualization(sensor: SensorSMPL, seq_id: str, host_batch: Dict,
                         pose_full_hat: np.ndarray, shape_hat: Optional[np.ndarray],
                         out_dir: str) -> str:
    """Dump predicted-vs-GT skeleton + mesh artifacts for ONE sequence.

    The reference's ``--visualize`` flag only prints "not yet implemented"
    (reference evaluate_real.py:90-92); this produces the artifact: an npz
    with GT/predicted joints and vertices over the whole sequence, plus
    Wavefront OBJ meshes of the first frame for direct inspection.

    :param pose_full_hat: (F, 66) predicted root+body pose (angle-axis).
    :param shape_hat: (10,) predicted betas or None (GT betas reused).
    :return: path of the written npz.
    """
    os.makedirs(out_dir, exist_ok=True)
    true_len = int(np.asarray(host_batch["seq_lengths"])[0])
    poses_gt = np.asarray(host_batch["poses"])[0, :true_len]         # (F, 66)
    shape_gt = np.asarray(host_batch["shapes"])[0]                   # (10,)
    pose_hat = np.asarray(pose_full_hat)[:true_len]
    betas_hat = shape_gt if shape_hat is None else np.asarray(shape_hat).reshape(-1)

    def fk(poses, betas):
        # Chunked: full-mesh LBS materializes (F, 6890, 3, 3) intermediates —
        # a real-length recording (thousands of frames) in one call would OOM
        # the device (the reference chunks its FK the same way, smpl.py:124-147).
        vs, js = [], []
        for s in range(0, poses.shape[0], 512):
            p = poses[s:s + 512]
            v, j = smplh_fk(sensor.full, jnp.asarray(p[:, 3:]),
                            jnp.broadcast_to(jnp.asarray(betas)[None], (p.shape[0], betas.shape[-1])),
                            poses_root=jnp.asarray(p[:, :3]), want_vertices=True)
            vs.append(np.asarray(v))
            js.append(np.asarray(j[:, : C.N_JOINTS + 1]))
        return np.concatenate(vs), np.concatenate(js)

    verts_gt, joints_gt = fk(poses_gt, shape_gt)
    verts_hat, joints_hat = fk(pose_hat, betas_hat)
    faces = np.asarray(sensor.full.faces)

    npz_path = os.path.join(out_dir, f"{seq_id}.npz")
    np.savez_compressed(
        npz_path, joints_gt=joints_gt, joints_hat=joints_hat,
        verts_gt=verts_gt, verts_hat=verts_hat, faces=faces,
        poses_gt=poses_gt, pose_hat=pose_hat, shape_gt=shape_gt, shape_hat=betas_hat,
        parents=np.asarray(C.SMPL_PARENTS[: C.N_JOINTS + 1]))

    def write_obj(path, verts, faces):
        with open(path, "w") as f:
            for v in verts:
                f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
            for a, b, c in faces + 1:  # OBJ is 1-indexed
                f.write(f"f {a} {b} {c}\n")

    write_obj(os.path.join(out_dir, f"{seq_id}_frame0_gt.obj"), verts_gt[0], faces)
    write_obj(os.path.join(out_dir, f"{seq_id}_frame0_pred.obj"), verts_hat[0], faces)
    print(f"Visualization artifacts written to {out_dir}")
    return npz_path


def _normalized_host_batch(batch: Dict) -> Dict:
    """Sequence-level root normalization before chunking (the chunk origin
    depends on the sequence start; reference evaluate_real.py:50)."""
    from empose_tpu.data.transforms import normalize_root
    device_batch = jax.device_put(  # async upload (see forward_chunk)
        {k: v for k, v in batch.items() if k != "ids"})
    normed = normalize_root(device_batch)
    host_batch = {k: (np.asarray(v) if hasattr(v, "shape") else v) for k, v in normed.items()}
    host_batch["ids"] = batch["ids"]
    return host_batch


def _select_sample(batch: Dict, j: int) -> Dict:
    """Single-sequence view (batch axis kept, length 1) of a collated batch."""
    out = {}
    for k, v in batch.items():
        if k == "ids":
            out[k] = [batch["ids"][j]]
        elif v is not None and hasattr(v, "shape"):
            out[k] = np.asarray(v)[j:j + 1]
        else:
            out[k] = v
    return out


def evaluate_real_sequences(session: EvalSession, loader, window_size: Optional[int],
                            pad_multiple: int = 256, visualize_index: int = -1,
                            visualize_dir: Optional[str] = None,
                            host_metrics: bool = False, serial: bool = False):
    """Per-sequence + overall metric rows (reference evaluate_real.py:41-101).

    Default path: ALL sequences batched into ONE jitted whole-pass program
    (windowed ``lax.scan``, per-sequence device-resident metric statistics,
    one dispatch + one host sync per pass). ``serial=True`` runs the r04
    per-sequence chunk loop (one sync per sequence) — also auto-selected
    when a noise_fn is installed (per-chunk key schedule) or visualization
    is requested. ``host_metrics=True`` runs the original host
    ``MetricsEngine`` loop — the parity oracle (all three pinned against
    each other in tests).

    :param visualize_index: if >= 0, dump skeleton/mesh artifacts for the
      sequence with this index via :func:`export_visualization`.
    :return: (rows, overall_metrics)
    """
    if host_metrics:
        return _evaluate_real_sequences_host(session, loader, window_size, pad_multiple,
                                             visualize_index, visualize_dir)
    if serial or visualize_index >= 0 or session.noise_fn is not None:
        return _evaluate_real_sequences_serial(session, loader, window_size, pad_multiple,
                                               visualize_index, visualize_dir)
    return _evaluate_real_sequences_batched(session, loader, window_size, pad_multiple)


def _evaluate_real_sequences_batched(session: EvalSession, loader,
                                     window_size: Optional[int],
                                     pad_multiple: int = 256):
    """Whole-pass batched eval: one dispatch, one host sync (r05).

    All sequences are padded to a common frame count (rounded up to the
    window), stacked on the batch axis, uploaded ONCE, and evaluated by
    ``EvalSession._run_pass`` — the jitted program that normalizes, chunks
    on device, scans the windowed forward with threaded carries, and
    accumulates per-sequence metric sufficient statistics. Rows and the
    overall average flush from a single readback. Per-sequence results
    equal the serial path's (pinned in test_train_eval); the overall row
    is the identical f64 merge of per-sequence stats.
    """
    from empose_tpu.eval.metrics import (metric_stats_init, metric_stats_reduce,
                                         metric_stats_select, metrics_from_stats)
    corpus = build_eval_corpus(loader, window_size, pad_multiple)
    if corpus is None:
        overall = metrics_from_stats(metric_stats_init())
        return [["Overall average"] + [overall[k] for k in overall]], overall
    ids, lengths, stacked, window = corpus
    for sid, n in zip(ids, lengths):  # reference evaluate_real.py:48 contract
        print(f"Evaluate {sid} ({n} frames)")

    device_batch = jax.device_put(stacked)
    stats, _frozen = session._run_pass(session.params, session.state,
                                       device_batch, window)
    host_stats = jax.device_get(stats)  # the ONE sync of the whole pass

    rows = []
    for i, sid in enumerate(ids):
        m = metrics_from_stats(metric_stats_select(host_stats, i))
        rows.append([sid] + [m[k] for k in m])
    overall = metrics_from_stats(metric_stats_reduce(host_stats))
    rows.append(["Overall average"] + [overall[k] for k in overall])
    return rows, overall


def build_eval_corpus(loader, window_size: Optional[int], pad_multiple: int = 256):
    """Host-side corpus assembly for the batched whole-pass program.

    Gathers every sequence from ``loader``, pads all to a common frame count
    (rounded up to the window), and stacks them on the batch axis — the
    exact input of ``EvalSession._run_pass``. Exposed so callers that
    evaluate the SAME corpus repeatedly (train-time eval cadence, benches)
    can upload it once and reuse the device batch across passes.

    :return: (ids, true_lengths, stacked host dict, window) or None if the
      loader is empty.
    """
    seqs = []
    for batch in loader:
        for j in range(len(batch["ids"])):
            seqs.append(_select_sample(batch, j))
    if not seqs:
        return None
    f_max = max(b["poses"].shape[1] for b in seqs)
    step = window_size if window_size is not None else pad_multiple
    f_pad = _round_up(f_max, step)
    window = window_size if window_size is not None else f_pad
    padded = [pad_time(b, f_pad) for b in seqs]
    stacked = {k: np.concatenate([np.asarray(p[k]) for p in padded])
               for k in padded[0] if k != "ids"}
    ids = [b["ids"][0] for b in seqs]
    lengths = [int(b["seq_lengths"][0]) for b in seqs]
    return ids, lengths, stacked, window


def _evaluate_real_sequences_serial(session: EvalSession, loader,
                                    window_size: Optional[int],
                                    pad_multiple: int = 256, visualize_index: int = -1,
                                    visualize_dir: Optional[str] = None):
    """Serial per-sequence stats loop (r04): one host sync per sequence.

    Kept for noise-fn runs (per-chunk key schedule), visualization (needs
    the packed pose outputs), and as a pinned intermediate between the
    batched pass and the host oracle.
    """
    from empose_tpu.eval.metrics import (metric_stats_init, metric_stats_merge,
                                         metrics_from_stats)
    rows = []
    overall_stats = None
    for seq_idx, batch in enumerate(loader):
        seq_id = batch["ids"][0]
        true_len = int(batch["seq_lengths"][0])
        print(f"Evaluate {seq_id} ({true_len} frames)")  # reference evaluate_real.py:48
        host_batch = _normalized_host_batch(batch)
        if window_size is None:
            host_batch = pad_time(host_batch, _round_up(host_batch["poses"].shape[1], pad_multiple))

        carry = session.model.initial_carry()
        stats = metric_stats_init()
        frozen = np.zeros_like(host_batch["shapes"])
        viz_packed = []
        for c, (chunk, _) in enumerate(window_generator(host_batch, window_size)):
            packed, stats, frozen, carry = session.forward_chunk_stats(
                chunk, carry, stats, frozen, c == 0)
            if seq_idx == visualize_index:
                viz_packed.append(packed)

        host_stats = jax.device_get(stats)  # the ONE sync of this sequence
        overall_stats = (host_stats if overall_stats is None
                         else metric_stats_merge(overall_stats, host_stats))

        if seq_idx == visualize_index and viz_packed:
            pose_chunks = []
            for packed in viz_packed:
                out = session.unpack_outputs(np.asarray(packed))
                pose_chunks.append(np.concatenate(
                    [out["root_ori_hat"][0], out["pose_hat"][0]], axis=-1))
            has_shape = session._splits[2]
            export_visualization(
                session.sensor, seq_id, host_batch,
                np.concatenate(pose_chunks, axis=0),
                np.asarray(frozen)[0] if has_shape else None,
                visualize_dir or "visualize")

        metrics = metrics_from_stats(host_stats)
        rows.append([seq_id] + [metrics[k] for k in metrics])

    overall = metrics_from_stats(overall_stats if overall_stats is not None
                                 else metric_stats_init())
    rows.append(["Overall average"] + [overall[k] for k in overall])
    return rows, overall


def _evaluate_real_sequences_host(session: EvalSession, loader, window_size: Optional[int],
                                  pad_multiple: int = 256, visualize_index: int = -1,
                                  visualize_dir: Optional[str] = None):
    """Host-MetricsEngine eval loop — the parity oracle for the stats path."""
    me_all = MetricsEngine(session.sensor.full)
    me_ind = MetricsEngine(session.sensor.full)
    rows = []

    for seq_idx, batch in enumerate(loader):
        seq_id = batch["ids"][0]
        true_len = int(batch["seq_lengths"][0])
        print(f"Evaluate {seq_id} ({true_len} frames)")  # reference evaluate_real.py:48
        host_batch = _normalized_host_batch(batch)
        if window_size is None:
            host_batch = pad_time(host_batch, _round_up(host_batch["poses"].shape[1], pad_multiple))

        me_ind.reset()
        carry = session.model.initial_carry()
        first_shape = None
        viz_pose_chunks = []
        for c, (chunk, n_frames) in enumerate(window_generator(host_batch, window_size)):
            out, loss_vals, carry = session.forward_chunk(chunk, carry)
            shape_hat = out.get("shape_hat")
            if c == 0:
                first_shape = None if shape_hat is None else np.asarray(shape_hat)[:, 0]
            shape_for_metrics = first_shape
            if seq_idx == visualize_index:
                viz_pose_chunks.append(np.concatenate(
                    [np.asarray(out["root_ori_hat"])[0], np.asarray(out["pose_hat"])[0]], axis=-1))

            seq_lengths = np.asarray(chunk["seq_lengths"])
            me_args = dict(
                pose=np.asarray(chunk["poses"])[:, :, 3:], shape=np.asarray(chunk["shapes"]),
                pose_hat=np.asarray(out["pose_hat"]), shape_hat=shape_for_metrics,
                seq_lengths=seq_lengths,
                pose_root=np.asarray(chunk["poses"])[:, :, :3],
                pose_root_hat=np.asarray(out["root_ori_hat"]),
                frame_mask=np.asarray(chunk["marker_masks"]),
            )
            me_all.compute(**me_args)
            me_ind.compute(**me_args)

        if seq_idx == visualize_index and viz_pose_chunks:
            export_visualization(
                session.sensor, seq_id, host_batch,
                np.concatenate(viz_pose_chunks, axis=0),
                None if first_shape is None else first_shape[0],
                visualize_dir or "visualize")

        metrics = me_ind.get_metrics()
        rows.append([seq_id] + [metrics[k] for k in metrics])

    overall = me_all.get_metrics()
    rows.append(["Overall average"] + [overall[k] for k in overall])
    return rows, overall


def print_metric_table(rows, model_id) -> str:
    from tabulate import tabulate
    headers = ["MPJPE [mm]", "MPJPE STD", "PA-MPJPE [mm]", "PA-MPJPE STD", "MPJAE [deg]", "MPJAE STD"]
    numbered = [[i] + r for i, r in enumerate(rows)]
    s = tabulate(numbered, headers=["Nr", f"E2E {model_id}"] + headers)
    print(s)
    return s


def load_model_and_eval_data(model_id, partition: str = "test_real",
                             batch_size: Optional[int] = None,
                             experiment_dir: Optional[str] = None):
    """Model + matching eval loader for a partition (reference eval/helpers.py:167-200).

    :param partition: 'valid' (3DPW corpus, middle windows), 'test_real'
      (EM-POSE real), or 'test_real_0715' (hold-out subject).
    :return: (EvalSession, loader, config)
    """
    assert partition in ("valid", "test_real", "test_real_0715")
    model, params, state, config, model_dir, sensor = load_model(model_id, experiment_dir)
    session = EvalSession(model, params, state, sensor)

    if partition == "valid":
        from empose_tpu.data.batches import collate_amass
        ds = EMRSequenceDataset(os.path.join(C.data_dir_synth(), "3dpw_emr"),
                                window_size=config.window_size, window_mode="middle")
        loader = Loader(ds, batch_size or 6, collate_amass, shuffle=False)
    else:
        from empose_tpu.data.batches import collate_real
        data_dir = C.data_dir_real()
        if partition == "test_real_0715":
            data_dir = os.path.join(data_dir, "hold_out")
        ds = RealDataset(data_dir)
        loader = Loader(ds, batch_size or 1, collate_real, shuffle=False)
    return session, loader, config
