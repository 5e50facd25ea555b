"""Per-component timing of the flagship LGD forward on the real TPU.

Times each stage of the inference path as its own jit so the 33ms forward's
budget is attributable: init-RNN, FK+sensor forward, recon value_and_grad,
iter-MLP pair, and the full composed forward. Run on the chip:

    python tools/profile_forward.py [--batch 8] [--window 256]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from empose_tpu.utils.profiling import timeit_ms as timeit


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--window", type=int, default=256)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from empose_tpu.utils.cache import enable_compilation_cache, force_synchronous_dispatch
    enable_compilation_cache()
    force_synchronous_dispatch()
    import __graft_entry__ as GE
    from bench import bench_config, make_window
    from empose_tpu.nn import layers as L

    config = bench_config()
    model, sensor = GE._build_model(config)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    n, f = args.batch, args.window
    w = {k: jnp.asarray(v) for k, v in make_window(rng, n, f).items()}
    x = model.prepare_inputs(w)
    nf = n * f

    # --- full forward ------------------------------------------------------
    def full(params, state, w):
        out, _, c = model.forward(params, state, w, train=False)
        return out["pose_hat"], out["root_ori_hat"], out["shape_hat"], out["joints_hat"], c
    t_full = timeit(jax.jit(full), params, state, w)

    # --- init RNN + heads ---------------------------------------------------
    def init_rnn(params, x, lengths):
        lstm_out, carry = L.rnn_layer_apply(
            params["rnn"], x, lengths, None,
            num_layers=config.m_rnn_num_layers, hidden_size=config.m_rnn_hidden_size)
        ph, sh = L.linear_pair_apply(params["pose_net_init"], params["shape_net_init"], lstm_out)
        return ph, sh, carry
    t_rnn = timeit(jax.jit(init_rnn), params, x, w["seq_lengths"])

    # --- FK + sensor synthesis (one eval) ------------------------------------
    offset_r_flat = jnp.broadcast_to(w["offset_r"][:, None], (n, f) + w["offset_r"].shape[1:]).reshape(nf, -1, 3, 3)
    offset_t_flat = jnp.broadcast_to(w["offset_t"][:, None], (n, f) + w["offset_t"].shape[1:]).reshape(nf, -1, 3)
    pose0 = jnp.asarray(rng.randn(nf, 66).astype(np.float32) * 0.2)
    shape0 = jnp.asarray(rng.randn(nf, 10).astype(np.float32) * 0.2)

    def fk(pose, shape):
        return sensor.estimated_markers(pose, shape, offset_r_flat, offset_t_flat)
    t_fk = timeit(jax.jit(fk), pose0, shape0)

    # --- recon value_and_grad (one eval) -------------------------------------
    inputs_flat = x.reshape(nf, -1)

    def recon(pose, shape):
        mp, mo, _ = fk(pose, shape)
        return model._recon_error(inputs_flat, mp, mo, n, f, w["seq_lengths"], None)
    vg = jax.jit(jax.value_and_grad(recon, argnums=(0, 1)))
    t_vg = timeit(vg, pose0, shape0)

    # --- one iter-MLP pair ----------------------------------------------------
    iter_in = jnp.asarray(rng.randn(nf, model.input_iter_size).astype(np.float32))

    def iter_pair(params, state, iter_in):
        pd, sd, _, _ = L.mlp_pair_apply(
            params["pose_net_iter"], params["shape_net_iter"],
            state["pose_net_iter"], state["shape_net_iter"], iter_in)
        return pd, sd
    t_iter = timeit(jax.jit(iter_pair), params, state, iter_in)

    # --- unfused iter-MLP pair for comparison ---------------------------------
    def iter_unfused(params, state, iter_in):
        pd, _ = L.mlp_apply(params["pose_net_iter"], state["pose_net_iter"], iter_in)
        sd, _ = L.mlp_apply(params["shape_net_iter"], state["shape_net_iter"], iter_in)
        return pd, sd
    t_iter_un = timeit(jax.jit(iter_unfused), params, state, iter_in)

    N = config.m_num_iterations
    accounted = t_rnn + N * (t_vg + t_iter) + t_fk
    print(f"batch={n} window={f} (frames/call={nf})")
    print(f"full forward        : {t_full:8.3f} ms   ({nf / t_full * 1e3:,.0f} frames/s)")
    print(f"init RNN + heads    : {t_rnn:8.3f} ms   ({t_rnn / t_full * 100:5.1f}%)")
    print(f"FK+sensor (1 eval)  : {t_fk:8.3f} ms   ({t_fk / t_full * 100:5.1f}%)")
    print(f"recon val+grad (x{N}) : {t_vg:8.3f} ms   ({N * t_vg / t_full * 100:5.1f}%)")
    print(f"iter-MLP pair  (x{N}) : {t_iter:8.3f} ms   ({N * t_iter / t_full * 100:5.1f}%)")
    print(f"iter-MLP unfused    : {t_iter_un:8.3f} ms   (fusion delta {t_iter_un - t_iter:+.3f} ms)")
    print(f"sum of parts        : {accounted:8.3f} ms   vs full {t_full:8.3f} ms")


if __name__ == "__main__":
    main()
