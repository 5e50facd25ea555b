"""Training driver: one fused XLA program per step (datagen + fwd + bwd + adam).

Reference: scripts/train.py:37-246. The reference's hot loop does host->GPU
copy, 4 sequential preprocess callables, forward, backward, optimizer step as
separate kernel launches; here the ENTIRE step — root normalization, SMPL FK,
virtual-sensor synthesis, offset/noise augmentation, model forward, losses,
gradients, Adam update — compiles into one jitted program. Multi-chip scaling
is batch-DP via sharding annotations (see empose_tpu/parallel/mesh.py): the
batch is sharded over the mesh, parameters replicated, and XLA inserts the
gradient all-reduce.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import optax

from empose_tpu import constants as C
from empose_tpu.bodymodel.smplh import load_smplh
from empose_tpu.checkpoint import native as ckpt
from empose_tpu.data import transforms as T
from empose_tpu.data.datasets import get_all_offset_files
from empose_tpu.eval.harness import EvalSession, pad_time, window_generator, _round_up
from empose_tpu.eval.metrics import MetricsEngine
from empose_tpu.nn import layers as L
from empose_tpu.nn.models import IterativeErrorFeedback, SensorSMPL, create_model
from empose_tpu.parallel import mesh as M
from empose_tpu.utils import experiments as U
from empose_tpu.utils.logging import ScalarWriter, StepTimer


def _flatten_legacy_opt_state(opt_state):
    """Convert a pre-flatten per-leaf adam state into the optax.flatten
    layout (single raveled mu/nu): same structure as
    ``optax.flatten(optax.adam(lr)).init(params)`` because flatten() ravels
    params with ``ravel_pytree`` — the identical leaf order used here."""
    from jax.flatten_util import ravel_pytree

    def conv(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=s.count, mu=ravel_pytree(s.mu)[0], nu=ravel_pytree(s.nu)[0])
        return s
    return jax.tree_util.tree_map(
        conv, opt_state,
        is_leaf=lambda s: isinstance(s, optax.ScaleByAdamState))


class Trainer:
    def __init__(self, config, seed: Optional[int] = None, match_reference_grads: bool = True):
        self.config = config
        prec = getattr(config, "matmul_precision", "highest") or "highest"
        if getattr(config, "bf16", False):
            if prec not in ("highest", "default"):
                # --bf16 is a legacy alias for --matmul_precision default;
                # combining it with a DIFFERENT explicit precision is
                # ambiguous — refuse rather than silently pick one.
                raise ValueError(
                    f"--bf16 conflicts with --matmul_precision {prec}: "
                    "--bf16 means --matmul_precision default; pass one or the other")
            prec = "default"  # legacy alias
        if prec != "highest":
            # Fast training precisions for the NN GEMMs + lane-major
            # kinematics GEMMs ('default' = bf16 inputs on the MXU, measured
            # sub-0.04mm MPJPE shift and ~21% faster steps; 'high' = 3-pass
            # bf16, near-f32-exact — every MODEL-level and gradient torch-
            # parity test passes on-chip at the 5e-5 tolerances, only the 4
            # strictest primitive tests (atol 1e-6..2e-5) exceed theirs by
            # <= 2.6e-5; -20% step time at bs64 x w256, see README).
            # 3x3 rotation algebra stays f32 either way. Module-level knobs —
            # same as EMPOSE_NN_PRECISION/EMPOSE_FK_PRECISION.
            L.set_nn_precision(prec)
            from empose_tpu.ops.fk_lanes import set_fk_precision
            set_fk_precision(prec)
        self.seed = int(seed if seed is not None else (config.seed or time.time()))
        self.rng_key = jax.random.PRNGKey(self.seed)

        self.smplh = load_smplh()
        self.sensor = SensorSMPL(self.smplh)
        offset_files = list(get_all_offset_files().values())
        self.bank = T.OffsetBank.from_offset_files(offset_files)
        self.model = create_model(config, self.sensor)
        self.pre_train = T.make_preprocess_fn(self.sensor, self.bank, config, True)
        self.pre_eval = T.make_preprocess_fn(self.sensor, self.bank, config, False)
        self.match_reference_grads = match_reference_grads

        k_init, self.rng_key = jax.random.split(self.rng_key)
        # Jitted init: one XLA program instead of hundreds of eager PRNG
        # dispatches (each a tunnel round-trip on a remote device); params
        # are bitwise-identical to the eager init.
        self.params, self.state = jax.jit(self.model.init)(k_init)
        # flatten(): run the elementwise Adam math over ONE raveled vector
        # instead of ~100 small per-leaf arrays. Inside the fused step each
        # tiny-array op carries fixed per-op overhead on TPU; flattening cut
        # the measured update from ~3.6 ms to ~0.3 ms at 5.7M params
        # (tools/profile_train.py). Per-element math is unchanged — losses
        # and the bitwise resume property are identical. Checkpoints written
        # before this switch hold per-leaf adam trees; restore() detects and
        # ravels them (_flatten_legacy_opt_state).
        self.opt = optax.flatten(optax.adam(config.lr))
        self.opt_state = self.opt.init(self.params)
        self.global_step = 0
        self.epoch = 0
        self.best_test_loss = float("inf")

        # Mesh / sharding (1-device mesh == plain jit).
        n_dp = max(1, int(getattr(config, "dp_devices", 1)))
        self.mesh = M.make_mesh(n_dp) if n_dp > 1 else None
        self._build_train_step()
        self._eval_forward = None

    # ------------------------------------------------------------------
    def _build_train_step(self):
        model, pre, opt = self.model, self.pre_train, self.opt
        is_ief = isinstance(model, IterativeErrorFeedback)
        match_ref = self.match_reference_grads

        def step(params, state, opt_state, batch, key):
            k_pre, k_model = jax.random.split(key)
            batch = pre(batch, k_pre, mode="all")
            # DP padding correction: pads carry seq_lengths == 0 and contribute
            # exactly 0 to every masked loss, but the batch mean divides by the
            # padded count — rescale so the mean is over REAL samples only.
            lengths = batch["seq_lengths"]
            n_real = jnp.maximum(jnp.sum(lengths > 0), 1).astype(jnp.float32)
            pad_scale = lengths.shape[0] / n_real

            def loss_fn(p):
                out, new_state, _ = model.forward(p, state, batch, train=True, key=k_model)
                total, vals = model.compute_loss(batch, out)
                total = total * pad_scale
                vals = {k2: v * pad_scale for k2, v in vals.items()}
                loss_for_grad = total
                if is_ief and match_ref:
                    # Reproduce the reference's extra per-iteration recon-error
                    # parameter gradients (see models.reference_grad_extra_loss).
                    loss_for_grad = total + model.reference_grad_extra_loss(out) * pad_scale
                return loss_for_grad, (vals, new_state)

            grads, (vals, new_state) = jax.grad(loss_fn, has_aux=True)(params)
            updates, new_opt_state = opt.update(grads, opt_state)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_state, new_opt_state, vals

        # Host-loop unrolling (config.steps_per_call > 1): K steps chain
        # inside ONE program via lax.scan — one upload, one dispatch, the
        # PRNG key chained in the carry with the same split order as the
        # single-step path, so losses are bit-identical step for step. This
        # amortizes the per-dispatch host cost (a round-trip on a tunneled
        # device) over K on-chip steps.
        def step_n(params, state, opt_state, key, batches):
            def body(carry, batch):
                params, state, opt_state, key = carry
                key, k = jax.random.split(key)
                p2, s2, o2, vals = step(params, state, opt_state, batch, k)
                return (p2, s2, o2, key), vals

            (params, state, opt_state, key), vals = lax.scan(
                body, (params, state, opt_state, key), batches)
            return params, state, opt_state, key, vals

        if self.mesh is not None:
            rep = M.replicated(self.mesh)
            bsh = M.batch_sharding(self.mesh)
            bsh_k = M.batch_sharding(self.mesh, leading_axes=1)
            self._train_step = jax.jit(
                step,
                in_shardings=(rep, rep, rep, bsh, rep),
                out_shardings=(rep, rep, rep, rep),
                donate_argnums=(0, 1, 2),
            )
            self._train_step_n = jax.jit(
                step_n,
                in_shardings=(rep, rep, rep, rep, bsh_k),
                out_shardings=(rep, rep, rep, rep, rep),
                donate_argnums=(0, 1, 2, 3),
            )
            self.params = M.replicate(self.params, self.mesh)
            self.state = M.replicate(self.state, self.mesh)
            self.opt_state = M.replicate(self.opt_state, self.mesh)
        else:
            self._train_step = jax.jit(step, donate_argnums=(0, 1, 2))
            self._train_step_n = jax.jit(step_n, donate_argnums=(0, 1, 2, 3))

    # ------------------------------------------------------------------
    def _kernel_gate_ctx(self, per_device):
        """Suspend the training LSTM kernel when the PER-DEVICE batch is
        below its gate: the kernel's custom_partitioning rule runs it on
        each device's batch shard, so the per-device batch is what the gate
        was measured against — below it the scan/wavefront paths win
        (trace-time choice; mirrors serve.py's _kernel_ok_sharded guard)."""
        import contextlib
        if per_device is not None and per_device < L.LSTM_TRAIN_KERNEL_MIN_BATCH:
            return L.lstm_kernel_disabled()
        return contextlib.nullcontext()

    def train_step(self, host_batch: Dict) -> Dict[str, float]:
        self.rng_key, k = jax.random.split(self.rng_key)
        per_device = None
        if self.mesh is not None:
            host_batch = M.pad_batch_to_devices(host_batch, self.mesh.devices.size)
            batch = M.shard_batch(host_batch, self.mesh)
            per_device = batch["seq_lengths"].shape[0] // self.mesh.devices.size
        else:
            # device_put, not jnp.asarray: on the tunneled runtime asarray
            # BLOCKS until the h2d completes (~24ms RTT floor) while
            # device_put enqueues asynchronously, so the upload overlaps the
            # previous step's execution (measured, tools note in README).
            batch = jax.device_put(
                {k2: v for k2, v in host_batch.items() if k2 != "ids"})
        with self._kernel_gate_ctx(per_device):
            self.params, self.state, self.opt_state, vals = self._train_step(
                self.params, self.state, self.opt_state, batch, k)
        self.global_step += 1
        return vals

    # ------------------------------------------------------------------
    def train_step_chunk(self, host_batches) -> Dict:
        """Run K training steps as ONE device program (lax.scan over stacked
        batches, PRNG key chained in the carry with the same split order as
        :meth:`train_step`) while paying the host/dispatch cost once. The
        per-step math is the same jaxpr; results are bit-identical to K
        single steps on CPU (pinned in test_train_eval) and equivalent up
        to XLA fusion-order rounding on TPU (the scan context can fuse the
        step differently). Each steps_per_call setting is itself fully
        deterministic. Returns the loss dict with a leading K axis (device
        arrays; callers flush lazily).

        All batches in the chunk must share shapes (fit() cuts chunks on
        shape changes, e.g. a short final batch)."""
        k_steps = len(host_batches)
        if k_steps == 1:
            # Scalar (not length-1) leaves; fit()'s flush handles both.
            return self.train_step(host_batches[0])

        self.rng_key = jnp.asarray(self.rng_key)
        per_device = None
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            host_batches = [M.pad_batch_to_devices(b, n_dev) for b in host_batches]
            per_device = host_batches[0]["seq_lengths"].shape[0] // n_dev
            stacked = {k2: np.stack([b[k2] for b in host_batches])
                       for k2 in host_batches[0] if k2 != "ids"}
            batches = {k2: jax.device_put(
                v, M.batch_sharding(self.mesh, leading_axes=1))
                for k2, v in stacked.items()}
        else:
            # Async upload (see train_step): overlaps the previous chunk.
            batches = jax.device_put({
                k2: np.stack([b[k2] for b in host_batches])
                for k2 in host_batches[0] if k2 != "ids"})

        with self._kernel_gate_ctx(per_device):
            (self.params, self.state, self.opt_state, self.rng_key,
             vals) = self._train_step_n(self.params, self.state,
                                        self.opt_state, self.rng_key, batches)
        self.global_step += k_steps
        return vals

    # ------------------------------------------------------------------
    def _build_eval_forward(self):
        model, pre = self.model, self.pre_eval

        def eval_fwd(params, state, batch, key):
            batch = pre(batch, key, mode="all")
            out, _, _ = model.forward(params, state, batch, train=False)
            total, vals = model.compute_loss(batch, out)
            slim = {k: out.get(k) for k in ("pose_hat", "root_ori_hat", "shape_hat")}
            return slim, vals, batch["joints_gt"]

        self._eval_forward = jax.jit(eval_fwd)

        # Device-resident metric accumulation for the trainer's eval passes:
        # fold the FK/Procrustes/MPJAE sufficient statistics into one jitted
        # update per batch/chunk (zero host syncs; the pass flushes ONCE into
        # MetricsEngine.set_stats). This is the same treatment the parity
        # CLI's loop got in r04 — previously these passes paid ~8 blocking
        # np.asarray readbacks per chunk through MetricsEngine.compute.
        from empose_tpu.eval.metrics import metric_stats_update
        smpl_dev = jax.device_put(self.smplh)

        def stats_upd(stats, batch, pose_hat, root_ori_hat, shape_hat,
                      frame_mask, *, normalize):
            poses = T.normalize_root(batch)["poses"] if normalize else batch["poses"]
            return metric_stats_update(
                smpl_dev, stats, pose=poses[:, :, 3:], shape=batch["shapes"],
                pose_hat=pose_hat, shape_hat=shape_hat,
                seq_lengths=batch["seq_lengths"],
                pose_root=poses[:, :, :3], pose_root_hat=root_ori_hat,
                frame_mask=frame_mask)

        self._eval_stats_update = jax.jit(stats_upd, static_argnames=("normalize",))

    def evaluate_valid(self, loader, metrics_engine: Optional[MetricsEngine] = None) -> Dict[str, float]:
        """Synthetic validation pass (reference eval/helpers.py:51-111).

        Eval PRNG is a FIXED stream (folded from a constant base per batch),
        the functional equivalent of the reference's reset_rng at eval start
        (noise_functions.py:130-136): repeated passes see identical draws, so
        eval losses are comparable across training.

        Metrics accumulate as device-resident sufficient statistics (one
        jitted update per batch, ZERO per-batch host syncs) and flush into
        ``metrics_engine.set_stats`` at the end — a pass costs O(1) syncs
        total (the loss flush + the stats flush). Metrics == the engine's
        host path (pinned in test_train_eval).
        """
        if self._eval_forward is None:
            self._build_eval_forward()
        me = metrics_engine
        stats = None
        if me is not None:
            me.reset()
            from empose_tpu.eval.metrics import metric_stats_init
            stats = metric_stats_init()
        # Loss scalars stay ON DEVICE for the whole pass and flush in one
        # batched device_get at the end — a float() per loss name per batch
        # is a device->host sync each (a tunnel round-trip here), the same
        # fix the train loop's pending-scalars queue applies (see fit()).
        pending, n_samples = [], 0
        eval_base = jax.random.PRNGKey(8004)
        for b_idx, host_batch in enumerate(loader):
            k = jax.random.fold_in(eval_base, b_idx)
            batch = jax.device_put(  # async upload (see train_step)
                {k2: v for k2, v in host_batch.items() if k2 != "ids"})
            out, vals, _ = self._eval_forward(self.params, self.state, batch, k)
            bs = host_batch["poses"].shape[0]
            pending.append((vals, bs))
            n_samples += bs
            if me is not None:
                stats = self._eval_stats_update(
                    stats, batch, out["pose_hat"], out["root_ori_hat"],
                    out.get("shape_hat"), None, normalize=True)
        if me is not None:
            me.set_stats(jax.device_get(stats))
        agg: Dict[str, float] = {}
        for vals, bs in zip(jax.device_get([v for v, _ in pending]),
                            [b for _, b in pending]):
            for name, v in vals.items():
                agg[name] = agg.get(name, 0.0) + float(v) * bs
        return {k2: v / max(n_samples, 1) for k2, v in agg.items()}

    def evaluate_test(self, loader, metrics_engine: Optional[MetricsEngine] = None,
                      window_size: Optional[int] = None) -> Dict[str, float]:
        """Real-data test pass with streaming windows.

        Like :meth:`evaluate_valid`, metric-bearing passes accumulate
        device-resident sufficient statistics (one extra async dispatch per
        chunk, ZERO per-chunk host syncs) and flush once into
        ``metrics_engine.set_stats`` — the r04 CLI treatment, now on the
        train-time eval path too.
        """
        from empose_tpu.data.transforms import normalize_root
        if self._eval_forward is None:
            self._build_eval_forward()  # builds _eval_stats_update too
        session = EvalSession(self.model, self.params, self.state, self.sensor)
        stats = None
        if metrics_engine is not None:
            metrics_engine.reset()
            from empose_tpu.eval.metrics import metric_stats_init
            stats = metric_stats_init()
        # Per-chunk loss scalars stay on device; one batched device_get per
        # PASS at the end (same treatment as evaluate_valid / fit()).
        pending, n_samples = [], 0
        for host_batch in loader:
            device_batch = jax.device_put(  # async upload (see train_step)
                {k2: v for k2, v in host_batch.items() if k2 != "ids"})
            normed = normalize_root(device_batch)
            hb = {k2: np.asarray(v) for k2, v in normed.items()}
            if window_size is None:
                hb = pad_time(hb, _round_up(hb["poses"].shape[1], 256))
            carry = self.model.initial_carry()
            first_shape = None
            chunk_vals, n_chunks = [], 0
            for c, (chunk, _) in enumerate(window_generator(hb, window_size)):
                # host=False: outputs/loss-vals stay device arrays — no host
                # sync anywhere in the chunk loop.
                out, vals, carry = session.forward_chunk(chunk, carry, host=False)
                chunk_vals.append(vals)
                n_chunks += 1
                shape_hat = out.get("shape_hat")
                if c == 0 and metrics_engine is not None:
                    # Chunk-0 shape freeze as a LAZY device slice.
                    first_shape = None if shape_hat is None else shape_hat[:, 0]
                if metrics_engine is not None:
                    device_chunk = jax.device_put({
                        k2: chunk[k2] for k2 in
                        ("poses", "shapes", "seq_lengths", "marker_masks")})
                    stats = self._eval_stats_update(
                        stats, device_chunk, out["pose_hat"], out["root_ori_hat"],
                        first_shape, device_chunk["marker_masks"], normalize=False)
            bs = host_batch["poses"].shape[0]
            pending.append((chunk_vals, n_chunks, bs))
            n_samples += bs
        if metrics_engine is not None:
            metrics_engine.set_stats(jax.device_get(stats))
        agg: Dict[str, float] = {}
        flat = jax.device_get([v for cv, _, _ in pending for v in cv])
        pos = 0
        for chunk_vals, n_chunks, bs in pending:
            for vals in flat[pos:pos + len(chunk_vals)]:
                for name, v in vals.items():
                    agg[name] = agg.get(name, 0.0) + float(v) / max(n_chunks, 1) * bs
            pos += len(chunk_vals)
        return {k2: v / max(n_samples, 1) for k2, v in agg.items()}

    # ------------------------------------------------------------------
    def train_state_dict(self) -> Dict:
        return {
            "params": self.params, "state": self.state, "opt_state": self.opt_state,
            "global_step": self.global_step, "epoch": self.epoch,
            "best_test_loss": self.best_test_loss, "rng_key": self.rng_key,
        }

    def save(self, path: str) -> None:
        """Write the full train state to ``path`` and a slim params/BN-state
        checkpoint to ``path + '_model'`` for inference-side loading."""
        ckpt.save_train_state(path, self.train_state_dict())
        ckpt.save_params_state(path + "_model", self.params, self.state)

    def restore(self, path: str) -> None:
        try:
            restored = ckpt.restore_train_state(path, self.train_state_dict())
        except Exception as orig:
            # Legacy checkpoint written before the optimizer switched to
            # optax.flatten (one raveled mu/nu vector): its opt_state holds
            # per-leaf adam trees. Restore against the legacy template and
            # ravel — flatten() uses ravel_pytree's leaf order, so raveling
            # mu/nu over the params structure reproduces its state exactly.
            # A genuinely corrupt/incompatible checkpoint fails this retry
            # too; chain the ORIGINAL failure so it isn't masked by a
            # confusing second structure-mismatch error.
            tmpl = self.train_state_dict()
            tmpl["opt_state"] = optax.adam(self.config.lr).init(self.params)
            try:
                restored = ckpt.restore_train_state(path, tmpl)
                restored["opt_state"] = _flatten_legacy_opt_state(restored["opt_state"])
            except Exception:  # retry failure stays chained as __context__
                raise RuntimeError(
                    f"Checkpoint restore from {path!r} failed against both the "
                    "current (flattened-Adam) and the legacy (per-leaf Adam) "
                    "train-state layouts; the checkpoint is corrupt or from an "
                    "incompatible model/config.") from orig
        self.params = restored["params"]
        self.state = restored["state"]
        self.opt_state = restored["opt_state"]
        self.global_step = int(restored["global_step"])
        self.epoch = int(restored["epoch"])
        self.best_test_loss = float(restored["best_test_loss"])
        self.rng_key = restored["rng_key"]


def fit(trainer: Trainer, train_loader, valid_loader, test_loader, model_dir: str,
        writer: Optional[ScalarWriter] = None, max_steps: Optional[int] = None) -> Dict:
    """Full training schedule (reference train.py:130-246)."""
    config = trainer.config
    me = MetricsEngine(trainer.smplh)
    checkpoint_dir = os.path.join(model_dir, "checkpoint")
    timer = StepTimer()
    last_vals = {}

    # Per-step loss scalars stay ON DEVICE between prints: a float() per
    # step is a device->host readback that drains the dispatch queue every
    # step (in this environment that is a tunnel round-trip — measured 65 ms
    # end-to-end per 4.9 ms on-chip step). Steps chain through the donated
    # train state; scalars flush in one batched device_get at print/eval/
    # checkpoint boundaries, so the chip runs print_every steps back-to-back.
    pending = []  # [(last_global_step, device loss dict w/ leading K, K)]

    def flush():
        nonlocal last_vals
        if not pending:
            return
        host = jax.device_get([v for _, v, _ in pending])
        for (gs_last, _, k_steps), hv in zip(pending, host):
            arrs = {k: np.atleast_1d(np.asarray(v)) for k, v in hv.items()}
            for j in range(k_steps):
                last_vals = {k: float(v[j]) for k, v in arrs.items()}
                if writer:
                    gs = gs_last - (k_steps - 1 - j)
                    writer.add_scalars(last_vals, gs, prefix="train/")
                    writer.add_scalar("lr", config.lr, gs)
        pending.clear()

    # Host-loop unrolling: up to steps_per_call batches run as ONE device
    # program (Trainer.train_step_chunk — bit-identical to K single steps).
    # Chunks are cut so print/eval/max_steps fire at exactly the same
    # global steps as steps_per_call=1, and on batch-shape changes (the
    # short final batch of an epoch can't stack with full ones).
    unroll = max(int(getattr(config, "steps_per_call", 1) or 1), 1)
    eval_mod = max(config.eval_every - 1, 1)
    print_mod = max(config.print_every - 1, 1)
    chunk = []
    steps_in_window = 0  # steps executed since the last timer reset

    def run_chunk():
        nonlocal steps_in_window
        if not chunk:
            return
        k_steps = len(chunk)
        vals = trainer.train_step_chunk(chunk)
        pending.append((trainer.global_step, vals, k_steps))
        steps_in_window += k_steps
        chunk.clear()

    def batch_shapes(b):
        # Full per-key shapes: both loaders bucket the TIME axis per batch
        # (round_up(max length, 32), batches.py/datasets.py), so equal batch
        # sizes can still carry different frame counts and must not stack.
        return {k: np.shape(v) for k, v in b.items() if k != "ids"}

    for epoch in range(trainer.epoch, config.n_epochs):
        trainer.epoch = epoch
        for i, batch in enumerate(train_loader):
            if chunk and batch_shapes(batch) != batch_shapes(chunk[0]):
                run_chunk()
            chunk.append(batch)
            gs_after = trainer.global_step + len(chunk)
            at_print = i % print_mod == 0
            at_eval = gs_after % eval_mod == 0
            at_max = max_steps is not None and gs_after >= max_steps
            if len(chunk) >= unroll or at_print or at_eval or at_max:
                run_chunk()

            if at_print:
                flush()
                per_step = timer.reset() / max(steps_in_window, 1)
                steps_in_window = 0
                loss_string = " ".join(f"{k}: {v:.6f}" for k, v in last_vals.items())
                print(f"[TRAIN {i + 1:05d} | {epoch + 1:03d}] {loss_string} "
                      f"elapsed: {per_step:.3f} secs")

            if at_eval:
                flush()
                valid_losses = trainer.evaluate_valid(valid_loader, me)
                valid_metrics = me.get_metrics()
                test_losses = trainer.evaluate_test(test_loader, me, config.eval_window_size)
                test_metrics = me.get_metrics()
                print(f"[VALID {i + 1:05d} | {epoch + 1:03d}] " +
                      " ".join(f"{k}: {v:.6f}" for k, v in valid_losses.items()))
                print(f"[TEST  {i + 1:05d} | {epoch + 1:03d}] " +
                      " ".join(f"{k}: {v:.6f}" for k, v in test_losses.items()), end="")

                current = test_losses.get("total_loss", float("inf"))
                if current < trainer.best_test_loss:
                    print(" ***")
                    trainer.best_test_loss = current
                    trainer.save(checkpoint_dir)
                else:
                    print()
                print(MetricsEngine.to_pretty_string(valid_metrics, "VALID"))
                print(MetricsEngine.to_pretty_string(test_metrics, "TEST"))
                if writer:
                    writer.add_scalars(valid_losses, trainer.global_step, prefix="valid/")
                    writer.add_scalars(test_losses, trainer.global_step, prefix="test/")
                    writer.add_scalars(MetricsEngine.to_log_dict(valid_metrics, "valid"), trainer.global_step)
                    writer.add_scalars(MetricsEngine.to_log_dict(test_metrics, "test"), trainer.global_step)
                # Eval wall time must not be billed to the next print
                # window's per-step average.
                timer.reset()
                steps_in_window = 0

            if max_steps is not None and trainer.global_step >= max_steps:
                flush()
                if not os.path.isdir(checkpoint_dir):
                    trainer.save(checkpoint_dir)
                return last_vals
    # Always leave a usable checkpoint, even if eval never fired (the
    # reference saves only on eval improvements, train.py:190-205, which can
    # end a run with no checkpoint at all).
    run_chunk()
    flush()
    if not os.path.isdir(checkpoint_dir):
        trainer.save(checkpoint_dir)
    return last_vals
