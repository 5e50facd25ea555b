"""Data-parallel training over the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from empose_tpu.parallel import mesh as M


def test_mesh_and_shard_batch():
    mesh = M.make_mesh(8)
    batch = {"poses": np.zeros((8, 4, 66), np.float32), "seq_lengths": np.full(8, 4, np.int32),
             "ids": ["a"] * 8}
    sharded = M.shard_batch(batch, mesh)
    assert "ids" not in sharded
    assert sharded["poses"].sharding.spec == jax.sharding.PartitionSpec("dp")


def test_pad_batch_to_devices():
    batch = {"poses": np.arange(5 * 4 * 66, dtype=np.float32).reshape(5, 4, 66),
             "seq_lengths": np.asarray([4, 3, 2, 4, 1], np.int32)}
    out = M.pad_batch_to_devices(batch, 8)
    assert out["poses"].shape[0] == 8
    # Padding repeats the leading samples (no all-zero garbage sequences)
    # but zeroes their lengths so they carry no loss weight.
    np.testing.assert_array_equal(out["poses"][5:], batch["poses"][:3])
    assert list(out["seq_lengths"][5:]) == [0, 0, 0]
    assert list(out["seq_lengths"][:5]) == [4, 3, 2, 4, 1]


@pytest.mark.slow
def test_padded_dp_step_exact_batch_mean(assets_env):
    """A non-divisible batch (5 samples) padded onto the 8-device mesh yields
    the same losses and updated params as the unpadded batch on one device:
    pads get seq_lengths == 0 (zero weight in every masked loss) and the
    trainer rescales the batch mean by n_padded/n_real (train/loop.py), so
    batch-mean semantics are exact for every batch size."""
    import __graft_entry__ as GE
    from empose_tpu.train.loop import Trainer

    rng = np.random.RandomState(3)
    batch5 = {k: np.asarray(v) for k, v in GE._tiny_batch(rng, n=5, f=8).items()}

    # Same seed -> identical init params/state/rng on both trainers.
    t1 = Trainer(GE._flagship_config(tiny=True), seed=11)
    config_dp = GE._flagship_config(tiny=True)
    config_dp.dp_devices = 8
    t8 = Trainer(config_dp, seed=11)

    v1 = t1.train_step({k: v.copy() for k, v in batch5.items()})
    v8 = t8.train_step({k: v.copy() for k, v in batch5.items()})

    for k in v1:
        np.testing.assert_allclose(float(v1[k]), float(v8[k]), rtol=2e-4, err_msg=k)
    # Adam's first-step update is ~sign(grad)*lr, so f32 reassociation noise
    # on near-zero grads (8-way psum vs single-device sum order) can flip an
    # element by up to 2*lr = 1e-3; everything beyond that bound would be a
    # real semantic difference (e.g. pads leaking into BN stats or losses).
    for a, b in zip(jax.tree_util.tree_leaves(t1.params),
                    jax.tree_util.tree_leaves(t8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


@pytest.mark.slow
def test_dp_train_step_chunk_matches_single_steps(assets_env):
    """Host-loop unrolling under the DP mesh: one scanned 3-step program on
    8 devices matches three single DP steps (same key chain, same batches)."""
    import __graft_entry__ as GE
    from empose_tpu.train.loop import Trainer

    rng = np.random.RandomState(5)
    batches = [{k: np.asarray(v) for k, v in GE._tiny_batch(rng, n=8, f=8).items()}
               for _ in range(3)]

    config = GE._flagship_config(tiny=True)
    config.dp_devices = 8
    t_single = Trainer(config, seed=21)
    t_chunk = Trainer(config, seed=21)

    vals_single = [t_single.train_step({k: v.copy() for k, v in b.items()})
                   for b in batches]
    vals_chunk = t_chunk.train_step_chunk(
        [{k: v.copy() for k, v in b.items()} for b in batches])

    assert t_chunk.global_step == t_single.global_step == 3
    for j, vs in enumerate(vals_single):
        for k in vs:
            np.testing.assert_allclose(float(vals_chunk[k][j]), float(vs[k]),
                                       rtol=2e-4, err_msg=f"step {j} {k}")
    for a, b in zip(jax.tree_util.tree_leaves(t_single.params),
                    jax.tree_util.tree_leaves(t_chunk.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_dryrun_multichip_entrypoint():
    """The driver contract: full DP train step on an 8-device mesh."""
    import __graft_entry__ as GE
    GE.dryrun_multichip(8)


@pytest.mark.slow
def test_dp_step_matches_single_device():
    """Gradient all-reduce from shardings == single-device step (same batch)."""
    import optax
    import __graft_entry__ as GE
    from empose_tpu.data import transforms as T

    config = GE._flagship_config(tiny=True)
    model, sensor = GE._build_model(config)
    bank = GE._in_memory_bank()
    pre = T.make_preprocess_fn(sensor, bank, config, randomize_if_configured=False)

    params, state = model.init(jax.random.PRNGKey(0))
    # SGD, not Adam: Adam's first-step update is ~sign(grad)*lr, which
    # amplifies f32 reassociation noise on near-zero grads into full flips.
    opt = optax.sgd(1e-3)
    opt_state = opt.init(params)

    def step(params, state, opt_state, batch, key):
        k_pre, k_model = jax.random.split(key)
        batch = pre(batch, k_pre, mode="all")

        def loss_fn(p):
            out, new_state, _ = model.forward(p, state, batch, train=True, key=k_model)
            total, vals = model.compute_loss(batch, out)
            return total, (vals, new_state)

        grads, (vals, new_state) = jax.grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), vals

    rng = np.random.RandomState(0)
    batch_np = {k: np.asarray(v) for k, v in GE._tiny_batch(rng, n=8, f=8).items()}
    key = jax.random.PRNGKey(7)

    # Single device.
    p1, v1 = jax.jit(step)(params, state, opt_state, batch_np, key)

    # 8-device DP.
    mesh = M.make_mesh(8)
    rep, bsh = M.replicated(mesh), M.batch_sharding(mesh)
    step_dp = jax.jit(step, in_shardings=(rep, rep, rep, bsh, rep))
    p8, v8 = step_dp(M.replicate(params, mesh), M.replicate(state, mesh),
                     M.replicate(opt_state, mesh), M.shard_batch(batch_np, mesh), key)

    np.testing.assert_allclose(float(v1["total_loss"]), float(v8["total_loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(p1)
    l8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_multihost_dp_step_two_processes():
    """Multi-host (DCN) path exercised for real: two OS processes, 2 CPU
    devices each, jax.distributed via parallel.mesh.init_distributed, one
    fused DP training step with the batch sharded over the GLOBAL 4-device
    mesh. The gradient all-reduce crosses the process boundary (gloo on
    CPU; DCN on a real slice). Each worker asserts the DP loss matches a
    single-process full-batch step (tools/multihost_worker.py)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tools", "multihost_worker.py")
    # A fresh OS-assigned port: a hardcoded one collides across concurrent
    # pytest sessions (and with its own TIME_WAIT on rapid reruns).
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    # The worker forces its own platform/device-count before importing jax.
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, worker, str(pid), "2", str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
        assert "MULTIHOST DP OK" in out, out
