"""Streaming-serving latency benchmark: per-chunk p50/p95/p99 on the chip.

Measures the deploy-path latency of ``StreamingPredictor`` (the push API used
by ``scripts/serve.py``) for the flagship LGD-RNN-6 at a given chunk size:
frames arrive one at a time; every ``chunk`` frames one XLA program fires and
the wall-clock from last-frame-pushed to poses-returned is recorded. Also
reports the real-time margin vs the 60 fps sensor rate (CONSTANTS.fps).

    python tools/bench_serve.py [--chunk 16] [--n 200]

With ``--streams S`` it benchmarks ``MultiStreamPredictor`` instead: all S
sessions receive a chunk, ONE batched call serves them, and the report adds
the aggregate frame rate and the max number of 60 fps sessions the chip
sustains at that latency.

    python tools/bench_serve.py --streams 64 [--chunk 16] [--n 100]
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
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--n", type=int, default=200, help="number of timed chunks")
    p.add_argument("--streams", type=int, default=1,
                   help="benchmark MultiStreamPredictor with S batched sessions")
    args = p.parse_args()

    from empose_tpu.utils.cache import enable_compilation_cache, force_synchronous_dispatch
    enable_compilation_cache()
    force_synchronous_dispatch()
    import jax
    import __graft_entry__ as GE
    from empose_tpu.serve import StreamingPredictor

    config = GE._flagship_config(tiny=False)
    model, _ = GE._build_model(config)
    params, state = model.init(jax.random.PRNGKey(0))
    if args.streams > 1:
        return bench_multi(model, params, state, args)
    pred = StreamingPredictor(model, params, state, chunk_size=args.chunk)

    rng = np.random.RandomState(0)
    frame_pos = (rng.randn(args.n + 5, args.chunk, 36) * 0.3).astype(np.float32)
    frame_ori = rng.randn(args.n + 5, args.chunk, 108).astype(np.float32)

    # Warmup (compile + first dispatches).
    for i in range(5):
        for f in range(args.chunk):
            pred.push(frame_pos[i, f][None], frame_ori[i, f][None])

    lat = []
    for i in range(5, args.n + 5):
        # Push chunk-1 frames (buffered, no compute), time the firing frame.
        for f in range(args.chunk - 1):
            out = pred.push(frame_pos[i, f][None], frame_ori[i, f][None])
            assert not out, "chunk fired early"
        t0 = time.perf_counter()
        out = pred.push(frame_pos[i, -1][None], frame_ori[i, -1][None])
        lat.append((time.perf_counter() - t0) * 1e3)
        assert out and out["pose_body"].shape[0] == args.chunk

    lat = np.sort(np.asarray(lat))
    p50, p95, p99 = (float(np.percentile(lat, q)) for q in (50, 95, 99))
    budget_ms = args.chunk / 60.0 * 1e3  # 60 fps sensor rate
    print(f"chunk={args.chunk} frames  timed_chunks={args.n}")
    print(f"per-chunk latency: p50 {p50:.2f} ms  p95 {p95:.2f} ms  p99 {p99:.2f} ms  "
          f"max {float(lat[-1]):.2f} ms")
    print(f"added latency per frame (p50): {p50 / args.chunk:.3f} ms")
    print(f"real-time budget at 60 fps: {budget_ms:.1f} ms/chunk -> "
          f"{budget_ms / p50:.1f}x headroom (p50), {budget_ms / p99:.1f}x (p99)")


def bench_multi(model, params, state, args):
    import time
    from empose_tpu.serve import MultiStreamPredictor

    S, chunk = args.streams, args.chunk
    pred = MultiStreamPredictor(model, params, state, n_streams=S, chunk_size=chunk)
    rng = np.random.RandomState(0)
    pos = (rng.randn(S, chunk, 36) * 0.3).astype(np.float32)
    ori = rng.randn(S, chunk, 108).astype(np.float32)

    def feed_all():
        for i in range(S):
            pred.push(i, pos[i], ori[i])

    for _ in range(5):  # warmup (compile + first dispatches)
        feed_all()
        pred.step()

    lat = []
    for _ in range(args.n):
        feed_all()
        t0 = time.perf_counter()
        outs = pred.step()
        lat.append((time.perf_counter() - t0) * 1e3)
        assert len(outs) == S
    lat = np.sort(np.asarray(lat))
    p50, p99 = float(np.percentile(lat, 50)), float(np.percentile(lat, 99))
    budget_ms = chunk / 60.0 * 1e3
    agg = S * chunk / (p50 / 1e3)
    print(f"streams={S} chunk={chunk}  timed_steps={args.n}")
    print(f"per-step latency (all {S} sessions): p50 {p50:.2f} ms  p99 {p99:.2f} ms")
    print(f"aggregate rate at p50: {agg:,.0f} frames/s")
    print(f"real-time budget at 60 fps: {budget_ms:.1f} ms/chunk -> "
          f"{budget_ms / p50:.1f}x headroom (p50); "
          f"~{int(S * budget_ms / p50):,} sustainable 60 fps sessions/chip at this latency")


if __name__ == "__main__":
    main()
