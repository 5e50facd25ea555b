"""Measure the `--remat` crossover: step time + transient HBM, with/without.

`--remat` wraps the LGD loop's FK+sensor block in `jax.checkpoint`
(nn/models.py:550-554): the loop otherwise holds N+1 full FK activation sets
for the backward, so long-window training is memory-bound there. This tool
records, for each (batch, window) regime, the fused-step wall-clock and
XLA's own transient-memory accounting of the lowered program — the two
sides of the FLOPs-for-memory trade — so the README's remat guidance is a
measurement, not an assertion.

Usage: python tools/measure_remat.py [--regimes 64x256,128x256,64x512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--regimes", default="64x256",
                   help="Comma-separated BSxWINDOW list, e.g. 64x256,128x256.")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--precision", default="highest")
    args = p.parse_args()

    from empose_tpu.utils.cache import enable_compilation_cache, force_synchronous_dispatch
    enable_compilation_cache()
    force_synchronous_dispatch()
    from bench import run_train_step_tpu

    rows = []
    for spec in args.regimes.split(","):
        bs, w = (int(x) for x in spec.lower().split("x"))
        for remat in (False, True):
            ms, _, mem, _ = run_train_step_tpu(iters=args.iters, bs=bs, window=w,
                                               precision=args.precision,
                                               remat=remat, want_memory=True)
            rows.append({"bs": bs, "window": w, "remat": remat,
                         "precision": args.precision,
                         "step_ms": round(ms, 2),
                         "memory": mem})
            print(f"bs{bs} x w{w} remat={remat}: {ms:.2f} ms, mem={mem}", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
