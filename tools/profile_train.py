"""Per-stage timing of the fused training step on the real TPU.

Attributes the train-step budget (reference hot loop, train.py:133-225) by
timing each stage as its own jit: on-device datagen (the preprocess chain),
the LGD forward + loss, the gradient pass, the Adam update, and the full
fused step. Run on the chip:

    python tools/profile_train.py [--batch 64] [--window 256]
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
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--window", type=int, default=256)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from empose_tpu.utils.cache import enable_compilation_cache, force_synchronous_dispatch
    enable_compilation_cache()
    force_synchronous_dispatch()
    import __graft_entry__ as GE

    config = GE._flagship_config(tiny=False)
    config.bs_train, config.window_size = args.batch, args.window
    model, sensor = GE._build_model(config)
    step, opt_init = GE.make_train_step(model, sensor, config)

    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = opt_init(params)
    batch = GE._tiny_batch(np.random.RandomState(0), n=args.batch, f=args.window)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(7)

    from empose_tpu.data import transforms as T
    pre = T.make_preprocess_fn(sensor, GE._in_memory_bank(), config,
                               randomize_if_configured=True)

    k_pre, k_model = jax.random.split(key)

    # --- datagen: the full preprocess chain (FK + sensors + offsets + noise)
    t_pre = timeit(jax.jit(lambda b, k: pre(b, k, mode="all")), batch, k_pre)

    gen = jax.jit(lambda b, k: pre(b, k, mode="all"))(batch, k_pre)
    gen = jax.tree.map(lambda x: x, gen)

    # --- forward + loss only (no grads)
    def fwd_loss(p, s, b, k):
        out, _, _ = model.forward(p, s, b, train=True, key=k)
        total, _ = model.compute_loss(b, out)
        return total
    t_fwd = timeit(jax.jit(fwd_loss), params, state, gen, k_model)

    # --- forward + backward (value_and_grad)
    def loss_for_grad(p, s, b, k):
        out, new_state, _ = model.forward(p, s, b, train=True, key=k)
        total, _ = model.compute_loss(b, out)
        extra = getattr(model, "reference_grad_extra_loss", None)
        if extra is not None:
            total = total + extra(out)
        return total
    t_grad = timeit(jax.jit(jax.grad(loss_for_grad)), params, state, gen, k_model)

    # --- Adam update alone
    opt = optax.adam(config.lr)
    grads = jax.jit(jax.grad(loss_for_grad))(params, state, gen, k_model)
    def adam(g, o, p):
        upd, o2 = opt.update(g, o)
        return optax.apply_updates(p, upd), o2
    t_adam = timeit(jax.jit(adam), grads, opt_state, params)

    # --- full fused step
    jstep = jax.jit(step)
    t_step = timeit(jstep, params, state, opt_state, batch, key)

    n_frames = args.batch * args.window
    print(f"batch {args.batch} x window {args.window} ({n_frames} frames)")
    print(f"  datagen (preprocess chain)   {t_pre:7.2f} ms")
    print(f"  forward + loss               {t_fwd:7.2f} ms")
    print(f"  forward + backward (grad)    {t_grad:7.2f} ms   (backward ~= {t_grad - t_fwd:.2f})")
    print(f"  adam update                  {t_adam:7.2f} ms")
    print(f"  FULL fused step              {t_step:7.2f} ms   ({n_frames / t_step * 1e3:,.0f} frames/s)")
    print(f"  sum of isolated stages       {t_pre + t_grad + t_adam:7.2f} ms")


if __name__ == "__main__":
    main()
