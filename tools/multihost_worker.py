"""Multi-host (DCN) worker: one FULL data-parallel training step, 2+ processes.

Run once per process (``python tools/multihost_worker.py <pid> <nproc> <port>``);
together the processes form a 2-devices-per-process CPU slice, initialize the
distributed runtime through ``empose_tpu.parallel.mesh.init_distributed``, and
drive ONE fused training step (on-device datagen + LGD forward + grads + adam)
with the batch sharded over the GLOBAL mesh — the gradient all-reduce crosses
the process boundary (gloo on CPU; DCN on a real multi-host TPU slice).

The step's loss is checked against the same step computed single-process on
the full batch, so the test pins cross-host DP numerics, not just liveness.
The reference has no distributed execution at all (SURVEY §2.3; reference
configuration.py:23 is a single torch device) — this exercises the
TPU-native addition end to end. Driven by tests/test_parallel.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(process_id: int, num_processes: int, port: int) -> None:
    # Platform forcing must precede ANY backend init (see __graft_entry__).
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from empose_tpu.parallel.mesh import init_distributed
    init_distributed(f"localhost:{port}", num_processes=num_processes,
                     process_id=process_id)
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == num_processes * n_local, (n_global, n_local)

    import numpy as np
    import __graft_entry__ as GE
    from empose_tpu.parallel import mesh as M

    config = GE._flagship_config(tiny=True)
    model, sensor = GE._build_model(config)
    step, opt_init = GE.make_train_step(model, sensor, config)

    # Deterministic identical init on every process.
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = opt_init(params)
    key = jax.random.PRNGKey(1)

    rng = np.random.RandomState(0)
    full_batch = {k: np.asarray(v) for k, v in
                  GE._tiny_batch(rng, n=n_global * 2, f=8).items()}

    # Single-process reference on the full batch (local device, no mesh).
    *_, ref_vals = jax.jit(step)(params, state, opt_state, full_batch, key)
    ref_loss = float(ref_vals["total_loss"])

    # Global mesh spanning BOTH processes; batch sharded, params replicated.
    mesh = M.make_mesh()
    rep, bsh = M.replicated(mesh), M.batch_sharding(mesh)

    def globalize(tree, sharding):
        def put(x):
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.tree_util.tree_map(put, tree)

    g_params = globalize(params, rep)
    g_state = globalize(state, rep)
    g_opt = globalize(opt_state, rep)
    g_key = globalize(key, rep)
    per_proc = full_batch["poses"].shape[0] // num_processes
    lo, hi = process_id * per_proc, (process_id + 1) * per_proc
    g_batch = {k: jax.make_array_from_process_local_data(bsh, v[lo:hi])
               for k, v in full_batch.items()}

    step_jit = jax.jit(step, in_shardings=(rep, rep, rep, bsh, rep),
                       out_shardings=(rep, rep, rep, rep))
    new_params, _, _, vals = step_jit(g_params, g_state, g_opt, g_batch, g_key)
    dp_loss = float(jax.device_get(vals["total_loss"]))

    assert np.isfinite(dp_loss), dp_loss
    # DP batch-mean == full-batch mean up to collective reduction order.
    assert abs(dp_loss - ref_loss) < 1e-4 * max(1.0, abs(ref_loss)), (
        dp_loss, ref_loss)
    # Params actually moved (the update applied on every process's shard).
    # Fully-replicated global arrays are host-readable from any process.
    delta = sum(float(np.sum(np.abs(np.asarray(jax.device_get(a))
                                    - np.asarray(jax.device_get(b)))))
                for a, b in zip(jax.tree_util.tree_leaves(new_params),
                                jax.tree_util.tree_leaves(params)))
    assert delta > 0.0
    print(f"MULTIHOST DP OK pid={process_id} loss={dp_loss:.6f} "
          f"ref={ref_loss:.6f} devices={n_global}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
