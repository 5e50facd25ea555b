"""Component-level backward attribution for the fused training step.

tools/profile_train.py splits the step into datagen / forward / backward /
adam; this tool splits the BACKWARD further, timing each component's
forward and forward+grad at the training shapes so the grad-only cost falls
out by subtraction:

  * lane-major FK + sensor synthesis (ops/fk_lanes.py) — called N+1 times
    per step by the LGD loop, plus its vjp pullbacks;
  * the (bi)LSTM init RNN (differentiable Pallas kernel pair at
    batch >= gate, masked scan otherwise);
  * the pair-fused iter MLPs;
  * the full model for reference.

Every measurement chains calls through a data dependency (see
profile_train.py's note: on the tunneled runtime, independent same-input
calls bill per-dispatch costs that chained calls pipeline away).

Usage: python tools/profile_backward.py [--batch 64] [--window 256]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# One timing harness for both profilers — a methodology fix must hit both or
# their numbers stop being comparable.
from tools.profile_train import timeit_chain
from bench import _xla_flops


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--window", type=int, default=256)
    p.add_argument("--precision", default="highest",
                   choices=("highest", "high", "default"),
                   help="NN/FK matmul precision — the scripts/train.py knob; "
                        "attribute the backward at the precision the step-time "
                        "headline actually runs.")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from empose_tpu.utils.cache import enable_compilation_cache, force_synchronous_dispatch
    enable_compilation_cache()
    force_synchronous_dispatch()
    import __graft_entry__ as GE
    from empose_tpu.nn import layers as L

    if args.precision != "highest":
        from empose_tpu.ops.fk_lanes import set_fk_precision
        L.set_nn_precision(args.precision)
        set_fk_precision(args.precision)

    config = GE._flagship_config(tiny=False)
    config.bs_train, config.window_size = args.batch, args.window
    model, sensor = GE._build_model(config)
    params, state = model.init(jax.random.PRNGKey(0))

    n, f = args.batch, args.window
    nf = n * f
    rng = np.random.RandomState(0)

    def couple(tree, scalar):
        eps = (scalar * 1e-30).astype(jnp.float32)
        return jax.tree.map(
            lambda x: x + eps.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree)

    rows = []

    # ---- lane FK + sensors (the LGD loop's inner function) ----------------
    pose0 = jnp.asarray(rng.randn(nf, 66).astype(np.float32) * 0.2)
    shape0 = jnp.asarray(rng.randn(nf, 10).astype(np.float32) * 0.2)
    orr = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (nf, 12, 3, 3))
    ott = jnp.asarray(rng.randn(nf, 12, 3).astype(np.float32) * 0.02)
    orr_l, ott_l = sensor.lane_fk.prepare_offsets(orr, ott)

    def fk(pose, shape):
        mp, mo, j = sensor.lane_fk(pose, shape, orr_l, ott_l)
        return jnp.sum(mp * mp) + jnp.sum(mo) + jnp.sum(j * j)

    @jax.jit
    def fk_fwd(p):
        return couple(p, fk(p, shape0))
    rows.append(("lane FK+sensors fwd (x1)", timeit_chain(fk_fwd, pose0), _xla_flops(fk_fwd, pose0)))

    @jax.jit
    def fk_grad(p):
        g = jax.grad(fk)(p, shape0)
        return p - 1e-30 * g
    rows.append(("lane FK+sensors fwd+grad (x1)", timeit_chain(fk_grad, pose0), _xla_flops(fk_grad, pose0)))

    # ---- init LSTM (kernel pair at batch >= gate) --------------------------
    dof = 36 + 108 if config.n_markers == 12 else 18 + 54
    x = jnp.asarray(rng.randn(n, f, dof).astype(np.float32))
    lengths = jnp.full((n,), f, jnp.int32)

    def lstm(p, xx):
        out, _ = L.rnn_layer_apply(p, xx, lengths, None,
                                   num_layers=config.m_rnn_num_layers,
                                   hidden_size=config.m_rnn_hidden_size,
                                   dropout_p=0.0, train=True, key=None)
        return out

    @jax.jit
    def lstm_fwd(xx):
        return couple(xx, jnp.sum(lstm(params["rnn"], xx)))
    rows.append(("init LSTM fwd", timeit_chain(lstm_fwd, x), _xla_flops(lstm_fwd, x)))

    @jax.jit
    def lstm_grad(pr):
        g = jax.grad(lambda q: jnp.sum(lstm(q, x)))(pr)
        return jax.tree.map(lambda a, b: a - 1e-30 * b, pr, g)
    rows.append(("init LSTM fwd+grad", timeit_chain(lstm_grad, params["rnn"]), _xla_flops(lstm_grad, params["rnn"])))

    # ---- pair-fused iter MLPs (x1; the loop runs them N times) ------------
    iter_dim = dof + 66 + 10 + (66 + 10 if config.m_use_gradient else 0)
    xi = jnp.asarray(rng.randn(nf, iter_dim).astype(np.float32))
    bn_mask = jnp.ones((nf,), jnp.float32)

    def mlps(pp, xx):
        a, b, _, _ = L.mlp_pair_apply(pp["pose_net_iter"], pp["shape_net_iter"],
                                      state["pose_net_iter"], state["shape_net_iter"],
                                      xx, skip_connection=model.skip_connections,
                                      dropout_p=0.0, train=True, key_a=None, key_b=None,
                                      bn_mask=bn_mask)
        return jnp.sum(a) + jnp.sum(b)

    @jax.jit
    def mlp_fwd(xx):
        return couple(xx, mlps(params, xx))
    rows.append(("iter MLP pair fwd (x1)", timeit_chain(mlp_fwd, xi), _xla_flops(mlp_fwd, xi)))

    mlp_params = {k: params[k] for k in ("pose_net_iter", "shape_net_iter")}

    @jax.jit
    def mlp_grad(pp):
        g = jax.grad(mlps)(pp, xi)
        return jax.tree.map(lambda a, b: a - 1e-30 * b, pp, g)
    rows.append(("iter MLP pair fwd+grad (x1)", timeit_chain(mlp_grad, mlp_params), _xla_flops(mlp_grad, mlp_params)))

    # ---- full model fwd / fwd+grad (context) -------------------------------
    batch = GE._tiny_batch(rng, n=n, f=f)
    from empose_tpu.data import transforms as T
    pre = T.make_preprocess_fn(sensor, GE._in_memory_bank(), config,
                               randomize_if_configured=True)
    gen = jax.jit(lambda b, k: pre(b, k, mode="all"))(batch, jax.random.PRNGKey(3))
    k_model = jax.random.PRNGKey(4)

    def full_loss(p):
        out, _, _ = model.forward(p, state, gen, train=True, key=k_model)
        total, _ = model.compute_loss(gen, out)
        extra = getattr(model, "reference_grad_extra_loss", None)
        if extra is not None:
            total = total + extra(out)
        return total

    @jax.jit
    def full_fwd(p):
        return couple(p, full_loss(p))
    rows.append(("FULL model fwd+loss", timeit_chain(full_fwd, params), _xla_flops(full_fwd, params)))

    @jax.jit
    def full_grad(p):
        g = jax.grad(full_loss)(p)
        return jax.tree.map(lambda a, b: a - 1e-30 * b, p, g)
    rows.append(("FULL model fwd+grad", timeit_chain(full_grad, params), _xla_flops(full_grad, params)))

    print(f"batch {n} x window {f} ({nf} frames), N={config.m_num_iterations} "
          f"LGD iterations, precision={args.precision}")
    for name, ms, flops in rows:
        # Achieved TFLOP/s per XLA's own cost model of the lowered program —
        # turns the floor subtraction into per-component occupancy numbers.
        eff = f"  {flops / 1e9:7.1f} GFLOP  {flops / (ms * 1e9):6.2f} TFLOP/s" if flops else ""
        print(f"  {name:34s} {ms:8.2f} ms{eff}")


if __name__ == "__main__":
    main()
