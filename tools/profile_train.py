"""Per-stage timing of the fused training step on the real TPU.

Attributes the train-step budget (reference hot loop, train.py:133-225) by
timing each stage as its own jit: on-device datagen (the preprocess chain),
the LGD forward + loss, the gradient pass, the Adam update, and the full
fused step. Run on the chip:

    python tools/profile_train.py [--batch 64] [--window 256]

Every stage is timed as a CHAIN: each call's inputs depend on the previous
call's outputs (a 1e-30-scaled coupling where the natural carry doesn't
exist), so the calls pipeline on-device and the measurement is the stage's
compute time — NOT the per-dispatch cost of unconsumed outputs, which on the
tunneled runtime inflates independent same-input calls severalfold.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit_chain(step_fn, carry, iters=20, warmup=3, repeats=3):
    """Best-of-``repeats`` mean ms/call of ``carry = step_fn(carry)``."""
    import jax
    carry = step_fn(carry)          # compile
    jax.block_until_ready(carry)
    for _ in range(warmup):
        carry = step_fn(carry)
    jax.block_until_ready(carry)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = step_fn(carry)
        jax.block_until_ready(carry)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--window", type=int, default=256)
    p.add_argument("--remat", action="store_true",
                   help="Rematerialize the FK+sensor block in the backward "
                        "(the trainer's --remat flag) to measure its "
                        "time/memory crossover at this shape.")
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
    if args.remat:
        config.remat = True
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

    def couple(tree, scalar):
        """Inject a data dependency on ``scalar`` without changing values."""
        eps = (scalar * 1e-30).astype(jnp.float32)
        return jax.tree.map(
            lambda x: x + eps.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree)

    # --- datagen: the full preprocess chain (FK + sensors + offsets + noise)
    @jax.jit
    def pre_step(k):
        gen = pre(batch, k, mode="all")
        # Next key depends on this call's output -> the chain is real.
        return jax.random.fold_in(k, gen["marker_pos"].ravel()[0].astype(jnp.int32) & 0x7FFF)
    t_pre = timeit_chain(pre_step, k_pre)

    gen = jax.jit(lambda b, k: pre(b, k, mode="all"))(batch, k_pre)

    # --- forward + loss only (no grads)
    def fwd_loss(p, b, k):
        out, _, _ = model.forward(p, state, b, train=True, key=k)
        total, _ = model.compute_loss(b, out)
        return total

    @jax.jit
    def fwd_step(p):
        return couple(p, fwd_loss(p, gen, k_model))
    t_fwd = timeit_chain(fwd_step, params)

    # --- forward + backward (grad)
    def loss_for_grad(p, b, k):
        out, new_state, _ = model.forward(p, state, b, train=True, key=k)
        total, _ = model.compute_loss(b, out)
        extra = getattr(model, "reference_grad_extra_loss", None)
        if extra is not None:
            total = total + extra(out)
        return total

    @jax.jit
    def grad_step(p):
        g = jax.grad(loss_for_grad)(p, gen, k_model)
        return jax.tree.map(lambda a, b: a - 1e-30 * b, p, g)
    t_grad = timeit_chain(grad_step, params)

    # --- Adam update alone (natural carry: params + opt state)
    opt = optax.flatten(optax.adam(config.lr))  # matches train/loop.py; opt_state above is flat too
    grads = jax.jit(jax.grad(loss_for_grad))(params, gen, k_model)

    @jax.jit
    def adam_step(carry):
        p, o = carry
        upd, o2 = opt.update(grads, o)
        return optax.apply_updates(p, upd), o2
    t_adam = timeit_chain(adam_step, (params, opt_state))

    # --- full fused step (natural carry: the whole train state)
    jstep = jax.jit(step)

    @jax.jit
    def full_step(carry):
        p, s, o, k = carry
        k, k2 = jax.random.split(k)
        p, s, o, _ = jstep(p, s, o, batch, k2)
        return p, s, o, k
    t_step = timeit_chain(full_step, (params, state, opt_state, key))

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
