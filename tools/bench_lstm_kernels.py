"""Micro-benchmark: LSTM stack implementations on the real chip.

Compares, for the released init-RNN shape (2x512 stack), the three
unidirectional inference paths at a given batch/window:
  scan       nn.layers layer-by-layer masked scan
  kernel     ops/lstm_kernel.lstm_stack_pallas (weight-resident, layer-serial)
  wavefront  ops/lstm_kernel.lstm_stack_pallas_wavefront (weight-resident,
             software-pipelined: all per-step matmuls independent)

Usage: python tools/bench_lstm_kernels.py [--batch 8 64] [--window 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, nargs="+", default=[8, 64])
    p.add_argument("--window", type=int, default=256)
    p.add_argument("--hidden", type=int, default=512)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--input", type=int, default=144)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--precision", default="highest",
                   choices=("highest", "high", "default"),
                   help="NN matmul precision: the scan obeys it via "
                        "set_nn_precision; the kernels take it directly "
                        "(HIGH runs their 3-pass bf16 path).")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from empose_tpu.utils.cache import (enable_compilation_cache,
                                        force_synchronous_dispatch)
    enable_compilation_cache()
    force_synchronous_dispatch()

    from empose_tpu.nn import layers as L
    from empose_tpu.ops.lstm_kernel import (lstm_stack_pallas,
                                            lstm_stack_pallas_wavefront)
    from empose_tpu.utils.precision import resolve as resolve_precision

    L.set_nn_precision(args.precision)
    prec = resolve_precision(args.precision)

    f, h, nl = args.window, args.hidden, args.layers
    params = L.lstm_init(jax.random.PRNGKey(0), args.input, h, nl)
    cells = [layer["fwd"] for layer in params["layers"]]

    def scan_fwd(x, mask, h0, c0):
        xt = x
        hs, cs = [], []
        for l, cell in enumerate(cells):
            xt, (hF, cF) = L._lstm_cell_scan(cell, xt, mask, h0[l], c0[l])
            hs.append(hF)
            cs.append(cF)
        return xt, jnp.stack(hs), jnp.stack(cs)

    def kernel_fwd(x, mask, h0, c0):
        outs, (hF, cF) = lstm_stack_pallas(cells, x, mask, h0, c0,
                                           precision=prec)
        return outs, hF, cF

    def wavefront_fwd(x, mask, h0, c0):
        outs, (hF, cF) = lstm_stack_pallas_wavefront(cells, x, mask, h0, c0,
                                                     precision=prec)
        return outs, hF, cF

    impls = {"scan": scan_fwd, "kernel": kernel_fwd, "wavefront": wavefront_fwd}

    for n in args.batch:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(f, n, args.input).astype(np.float32))
        mask = jnp.ones((f, n), jnp.float32)
        h0 = jnp.zeros((nl, n, h), jnp.float32)
        c0 = jnp.zeros((nl, n, h), jnp.float32)

        print(f"batch={n} window={f} stack={nl}x{h}")
        for name, fn in impls.items():
            jfn = jax.jit(fn)
            out = jfn(x, mask, h0, c0)
            jax.block_until_ready(out[0])
            best = float("inf")
            for _ in range(args.repeats):
                start = time.perf_counter()
                o = out
                for _ in range(args.iters):
                    # Chain through the final state so steps can't overlap
                    # out of order, matching the streaming-inference pattern.
                    o = jfn(x, mask, o[1], o[2])
                jax.block_until_ready(o[0])
                best = min(best, time.perf_counter() - start)
            ms = best / args.iters * 1e3
            print(f"  {name:10s} {ms:8.3f} ms/call   {n * f / ms * 1e3:12.0f} frames/s")


if __name__ == "__main__":
    main()
