"""Benchmark: LGD-RNN-6 full-pipeline inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "lgd_rnn6_inference_frames_per_sec", "value": N,
   "unit": "frames/s", "vs_baseline": N / <torch-CPU reference fps>}

The measured workload is the flagship model's complete streaming inference
step (the hot path of reference scripts/evaluate_real.py with window 256):
LSTM init + N=2 LGD refinement iterations, each running SMPL FK + virtual
sensor synthesis + reconstruction-error gradients.

The architecture is the RELEASED LGD-RNN-6 retrain configuration
(reference README.md:210-228, 5.72M params, N=2 iterations, hidden 512x2).

Baseline: the same model implemented in torch (float64 full-mesh SMPL, as the
reference's BodyModel runs, smpl.py:42) measured on this host's CPU via
``python bench.py --measure-baseline`` and cached in bench_baseline.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")

BATCH = 8
WINDOW = 256
N_MARKERS = 6

# TPU v5e (v5 lite) MXU peak: 197 TFLOP/s with bf16 inputs. The headline
# torch-parity mode runs f32 at Precision.HIGHEST (multiple bf16 passes per
# f32 product), so its pct-of-roofline vs the bf16 peak UNDERSTATES the MXU
# utilization by the pass count; the bf16 rows are the like-for-like ones.
PEAK_BF16_TFLOPS = 197.0


def _xla_flops(lowerable, *args, **kw):
    """Total FLOPs of one call per XLA's HLO cost model, or None if the
    backend doesn't expose cost analysis. This is the compiler's count of
    the ACTUAL lowered program (fusion-aware), not a hand model."""
    try:
        ca = lowerable.lower(*args, **kw).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _efficiency_rows(flops_per_frame, fps):
    """MFU bookkeeping rows for a given per-frame FLOP count and rate."""
    if not flops_per_frame or not fps:
        return {}
    achieved = flops_per_frame * fps
    return {
        "achieved_tflops": round(achieved / 1e12, 3),
        "pct_of_bf16_roofline": round(achieved / (PEAK_BF16_TFLOPS * 1e12) * 100, 3),
    }


def plausible_floor_s(flops_block):
    """The fastest a block of ``flops_block`` FLOPs can physically finish on
    this chip: the bf16 MXU roofline. Any timing below it is a measurement
    failure, not a fast run."""
    if not flops_block:
        return None
    return flops_block / (PEAK_BF16_TFLOPS * 1e12)


def timed_blocks(block_fn, repeats, min_plausible_s=None, max_extra=4):
    """Run ``repeats`` timing blocks, discarding physically impossible ones.

    ``block_fn()`` runs one block and returns its elapsed seconds. A block
    faster than ``min_plausible_s`` (the bf16-roofline bound for the block's
    known FLOP count, :func:`plausible_floor_s`) can only be a measurement
    pathology — e.g. the tunneled runtime's deferred-dispatch mode returning
    from ``block_until_ready`` without waiting, which is how BENCH_r04
    archived a 1110%-of-roofline throughput row. Suspect blocks are dropped
    and re-measured, up to ``max_extra`` replacement blocks; by construction
    no surviving block can imply a rate above the roofline.

    :return: (times, n_suspect) — ``times`` non-empty, sorted not required.
    :raises RuntimeError: if every block (incl. replacements) was impossible —
      a systematic runtime failure that must not be archived as a number.
    """
    times, n_suspect, runs = [], 0, 0
    while len(times) < repeats and runs < repeats + max_extra:
        runs += 1
        dt = block_fn()
        if min_plausible_s is not None and dt < min_plausible_s:
            n_suspect += 1
            continue  # replacement blocks, up to max_extra beyond repeats
        times.append(dt)
    if not times:
        raise RuntimeError(
            f"all {repeats + max_extra} timing blocks finished below the "
            f"roofline floor of {min_plausible_s * 1e3:.3f} ms — the runtime "
            "is not actually synchronizing; refusing to report a number")
    return times, n_suspect


def _median(xs):
    return float(np.median(np.asarray(xs)))


def bench_config():
    """The RELEASED LGD-RNN-6 architecture (reference README.md:210-228):
    hidden 512x2, N=2 refinement iterations, init-RNN 512x2, 5.72M params."""
    from empose_tpu.config import Configuration
    return Configuration.from_dict(dict(
        m_type="ief", m_rnn_init=True, m_use_gradient=True, m_average_shape=True,
        m_estimate_shape=False, m_num_iterations=2, m_hidden_size=512, m_num_layers=2,
        m_rnn_hidden_size=512, m_rnn_num_layers=2, m_rnn_bidirectional=False,
        m_step_size=0.1, m_reprojection_loss_weight=0.01, m_fk_loss=0.1,
        m_pose_loss_weight=10.0, use_marker_pos=True, use_marker_ori=True,
        use_real_offsets=True, offset_noise_level=0, n_markers=N_MARKERS,
        window_size=WINDOW, lr=5e-4))


def make_window(rng, n, f):
    return {
        "marker_pos": np.asarray(rng.randn(n, f, 36), np.float32),
        "marker_ori": np.asarray(rng.randn(n, f, 108), np.float32),
        "seq_lengths": np.full(n, f, np.int32),
        "offset_t": np.asarray(rng.randn(n, 12, 3) * 0.02, np.float32),
        "offset_r": np.broadcast_to(np.eye(3, dtype=np.float32), (n, 12, 3, 3)).copy(),
    }


def run_tpu(batch=BATCH, window=WINDOW, iters=20, warmup=3, repeats=5,
            precisions=("highest",)):
    """Measure streaming-inference fps at each NN matmul precision.

    "highest" is the torch-parity mode (f32 on the MXU, the headline
    number); "default" is the bf16-input serving mode (measured sub-0.03mm
    MPJPE shift, see README). One model build serves all precisions — the
    precision binds when the forward is (re)jitted.

    Timing is best-of-``repeats`` blocks of ``iters`` dispatches: the chip
    sits behind a network tunnel whose transient stalls inject multi-ms
    hiccups into individual dispatches, so a single block is a coin flip
    (measured 279k vs 429k f/s across two 10-iter runs); the fastest block
    is the reproducible hardware number. Each block is checked against the
    chip's roofline (:func:`timed_blocks`): an impossibly fast block is a
    runtime pathology, gets discarded and re-measured, and is counted in
    ``suspect_blocks`` — so one corrupted block can never become the
    archived number (BENCH_r04 regression). The median across blocks is
    reported alongside the min.

    :return: ({precision: {"fps", "fps_median", "suspect_blocks"}},
      flops_per_frame)
    """
    import jax
    from empose_tpu.utils.cache import enable_compilation_cache, force_synchronous_dispatch
    enable_compilation_cache()
    force_synchronous_dispatch()
    import __graft_entry__ as GE
    from empose_tpu.nn import layers as L
    from empose_tpu.ops import fk_lanes as FK

    config = bench_config()
    model, _ = GE._build_model(config)
    params, state = model.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    w = {k: jax.numpy.asarray(v) for k, v in make_window(rng, batch, window).items()}

    results = {}
    flops_per_frame = None
    entry_nn, entry_fk = L._HI, FK._HI  # restore the caller's (possibly
    try:                                # env-selected) precisions on exit
        for prec in precisions:
            # "default" is the full bf16 serving mode: NN GEMMs AND the
            # lane-major kinematics GEMMs (each validated separately for
            # accuracy; combined shift +0.03mm MPJPE on a trained LGD eval).
            L.set_nn_precision(prec)
            FK.set_fk_precision(prec)

            # A FRESH function object per precision: jax.jit's trace cache is
            # keyed on the underlying callable, so re-jitting the same object
            # would silently reuse the previous precision's trace.
            def forward(params, state, w, carry):
                out, _, new_carry = model.forward(params, state, w, carry, train=False)
                return out["pose_hat"], out["root_ori_hat"], out["shape_hat"], new_carry

            fwd = jax.jit(forward)
            carry = None
            outs = fwd(params, state, w, carry)
            carry = outs[-1]
            jax.block_until_ready(outs[0])
            if flops_per_frame is None:
                # Steady-state program (carry present); FLOPs are
                # precision-independent in XLA's count.
                f_call = _xla_flops(fwd, params, state, w, carry)
                if f_call:
                    flops_per_frame = f_call / (batch * window)
            for _ in range(warmup):
                outs = fwd(params, state, w, outs[-1])
            jax.block_until_ready(outs[0])

            def block():
                nonlocal outs
                start = time.perf_counter()
                for _ in range(iters):
                    outs = fwd(params, state, w, outs[-1])
                jax.block_until_ready(outs[0])
                return time.perf_counter() - start

            floor = plausible_floor_s(
                flops_per_frame * batch * window * iters if flops_per_frame else None)
            times, n_suspect = timed_blocks(block, repeats, floor)
            frames = batch * window * iters
            results[prec] = {
                "fps": frames / min(times),
                "fps_median": frames / _median(times),
                "suspect_blocks": n_suspect,
            }
    finally:
        L._HI, FK._HI = entry_nn, entry_fk
    return results, flops_per_frame


def run_train_step_tpu(iters=20, warmup=3, bs=12, window=32, precision="highest",
                       remat=False, want_memory=False):
    """Mean wall-clock of ONE fused training step: on-device datagen
    (FK + virtual sensors + offsets) + LGD forward + grads + adam in a
    single XLA program. Default regime is the released LGD-RNN-6 retrain
    config (batch 12 x window 32); the reference's example GPU step is
    0.700 s (reference README.md:230). Callers also probe the large-batch
    regimes (64 x 64, 64 x 256) where the differentiable Pallas LSTM kernel
    engages, at strict torch-parity precision AND the validated
    ``--matmul_precision high`` fast mode (same knob as scripts/train.py)."""
    import jax
    import __graft_entry__ as GE
    from empose_tpu.nn import layers as L
    from empose_tpu.ops import fk_lanes as FK

    config = GE._flagship_config(tiny=False)
    config.bs_train, config.window_size = bs, window
    config.remat = remat
    entry_nn, entry_fk = L._HI, FK._HI
    try:
        L.set_nn_precision(precision)
        FK.set_fk_precision(precision)
        model, sensor = GE._build_model(config)
        step, opt_init = GE.make_train_step(model, sensor, config)
        step = jax.jit(step, donate_argnums=(0, 1, 2))

        params, state = model.init(jax.random.PRNGKey(0))
        opt_state = opt_init(params)
        batch = GE._tiny_batch(np.random.RandomState(0), n=config.bs_train, f=config.window_size)
        # Cost analysis AFTER the first jitted execution below: the jit dispatch
        # populates the persistent compilation cache first, so the AOT
        # lower().compile() used for FLOP counting deserializes from cache
        # instead of paying the most expensive compile in the benchmark twice.
        flops_per_frame = None

        repeats = 4
        keys = [jax.random.PRNGKey(i) for i in range(warmup + repeats * iters)]
        carry = (params, state, opt_state)
        for i in range(warmup):
            *carry, vals = step(*carry, batch, keys[i])
        if warmup:
            jax.block_until_ready(vals["total_loss"])
        # (see note above — counted on the LIVE chained state: the originals'
        # buffers were donated to the first call)
        f_call = _xla_flops(step, *carry, batch, keys[0])
        flops_per_frame = f_call / (bs * window) if f_call else None
        mem = None
        if want_memory:
            # XLA's own accounting of the lowered program's transient HBM
            # (activations/workspace), the quantity remat trades FLOPs for.
            try:
                ma = step.lower(*carry, batch, keys[0]).compile().memory_analysis()
                mem = {"temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
                       "argument_mb": round(ma.argument_size_in_bytes / 2**20, 1),
                       "output_mb": round(ma.output_size_in_bytes / 2**20, 1)}
            except Exception:
                mem = None
        # Steps chain on-device through the donated train state, so timing the
        # chain and dividing measures the per-step compute time (per-step
        # blocking would bill the tunnel RTT of this environment to every step).
        # Best-of-``repeats`` blocks for the same tunnel-hiccup reason as
        # ``run_tpu``, with the same roofline plausibility guard: impossibly
        # fast blocks are re-measured instead of winning the min.
        k = warmup
        extra = 4
        keys.extend(jax.random.PRNGKey(1000 + i) for i in range(extra * iters))

        def block():
            nonlocal carry, k
            start = time.perf_counter()
            for _ in range(iters):
                *carry, vals = step(*carry, batch, keys[k])
                k += 1
            jax.block_until_ready(vals["total_loss"])
            return time.perf_counter() - start

        floor = plausible_floor_s(f_call * iters if f_call else None)
        times, n_suspect = timed_blocks(block, repeats, floor, max_extra=extra)
        ms = float(min(times) / iters * 1000.0)
        extras = {"ms_median": float(_median(times) / iters * 1000.0),
                  "suspect_blocks": n_suspect}
        return ((ms, flops_per_frame, mem, extras) if want_memory
                else (ms, flops_per_frame, extras))
    finally:
        L._HI, FK._HI = entry_nn, entry_fk


def run_eval_pass_tpu(n_seqs=4, frames=1024, window=256, repeats=3,
                      first_only=False):
    """Steady-state streaming EVAL pass through the real parity-CLI loop.

    Drives :func:`evaluate_real_sequences` (the exact scripts/evaluate_real.py
    code path: since r05 the batched whole-pass program — all sequences
    batched, windowed forward scanned on device, ONE dispatch + ONE host
    sync per pass) over synthetic real-format sequences. The reference's equivalent is its 73.2 s test pass
    (reference README.md:232) — different corpus size, so the honest
    comparable is frames/s, reported alongside the pass seconds.

    :return: (first_pass_s, steady_pass_s, frames_per_s)
    """
    import contextlib
    import io
    import jax
    import __graft_entry__ as GE
    from empose_tpu.eval.harness import EvalSession, evaluate_real_sequences

    config = bench_config()
    model, sensor = GE._build_model(config)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    session = EvalSession(model, params, state, sensor)

    rng = np.random.RandomState(0)
    m = 12  # real recordings always carry 12 sensors; n_markers selects the subset
    seqs = []
    for i in range(n_seqs):
        f = frames
        seqs.append({
            "ids": [f"synth_{i:02d}"],
            "poses": np.asarray(rng.randn(1, f, 66) * 0.2, np.float32),
            "shapes": np.asarray(rng.randn(1, 10) * 0.2, np.float32),
            "trans": np.asarray(rng.randn(1, f, 3) * 0.1, np.float32),
            "seq_lengths": np.full(1, f, np.int32),
            "marker_pos": np.asarray(rng.randn(1, f, m * 3), np.float32),
            "marker_ori": np.asarray(rng.randn(1, f, m * 9), np.float32),
            "marker_nor": np.asarray(rng.randn(1, f, m * 3), np.float32),
            "marker_masks": np.ones((1, f, m), np.float32),
            "offset_t": np.asarray(rng.randn(1, m, 3) * 0.02, np.float32),
            "offset_r": np.broadcast_to(np.eye(3, dtype=np.float32), (1, m, 3, 3)).copy(),
        })

    def one_pass():
        # The loop prints per-sequence progress (the reference CLI contract);
        # bench must emit exactly one JSON line, so swallow it here.
        with contextlib.redirect_stdout(io.StringIO()):
            return evaluate_real_sequences(session, seqs, window)

    t0 = time.perf_counter()
    one_pass()
    first = time.perf_counter() - t0
    if first_only:
        return first, None, None, None, None
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _, overall = one_pass()
        times.append(time.perf_counter() - t0)
    assert np.isfinite(overall["MPJPE [mm]"])
    best = min(times)

    # DEVICE-RESIDENT program cost: the pass program alone on a pre-uploaded
    # corpus, slope-measured (K-repetition inside the dispatch queue) so the
    # tunnel RTT and the per-pass host collate/upload — which dominate
    # end-to-end steady state in THIS tunneled environment — divide out.
    # This is the number a locally-attached TPU pays per pass, and the one
    # the eval-side kernel work (lane metric FK, Horn Procrustes) moves.
    from empose_tpu.eval.harness import build_eval_corpus
    _, _, stacked, win = build_eval_corpus(seqs, window)
    db = jax.device_put(stacked)

    def chain(k):
        t0 = time.perf_counter()
        outs = [session._run_pass(session.params, session.state, db, win)
                for _ in range(k)]
        jax.block_until_ready(outs[-1][0]["n"])
        return time.perf_counter() - t0

    chain(2)
    lo = min(chain(2) for _ in range(3))
    hi = min(chain(12) for _ in range(3))
    program_s = max((hi - lo) / 10, 1e-9)
    return first, best, n_seqs * frames / best, _median(times), program_s


def run_torch_cpu(batch=BATCH, window=WINDOW, iters=2):
    """Reference-architecture torch model on CPU (float64 full-mesh SMPL),
    measured at the SAME batch/window regime as the TPU run."""
    import torch
    torch.set_num_threads(os.cpu_count() or 1)
    from empose_tpu import constants as C
    from empose_tpu.bodymodel.synthetic import make_synthetic_smplh
    from tests.torch_ref.models import TorchIEF
    from tests.torch_ref.smpl import TorchSMPLH

    config = bench_config()
    npz = make_synthetic_smplh(seed=0)
    smpl = TorchSMPLH(npz, num_betas=10)
    # The reference skins the FULL mesh inside the loop; emulate with
    # original-row tables so the oracle reads the full-mesh vertices.
    faces = np.asarray(npz["f"], np.int64)
    from empose_tpu.data.virtual_sensors import VirtualSensorTables
    tables = VirtualSensorTables.build(faces, C.VERTEX_IDS)
    model = TorchIEF(config, smpl, tables).eval()
    model.set_subset_rows(np.arange(npz["v_template"].shape[0]))

    rng = np.random.RandomState(0)
    w = make_window(rng, batch, window)
    args = (torch.tensor(w["marker_pos"]), torch.tensor(w["marker_ori"]),
            torch.tensor(w["seq_lengths"].astype(np.int64)),
            torch.tensor(w["offset_r"]), torch.tensor(w["offset_t"]))

    model(*args)  # warmup
    start = time.perf_counter()
    for _ in range(iters):
        model(*args)
    elapsed = time.perf_counter() - start
    frames = batch * window * iters
    return frames / elapsed


def _warm_cache_first_call_s():
    """First eval-pass wall time of a FRESH process with a warm XLA cache.

    A cold process pays the full compile (~54-65 s, the eval_pass_first_s
    row); the persistent compilation cache (utils/cache.py) should make a
    SECOND process's first call cheap. Measured by actually spawning one —
    the axon tunnel multiplexes, so the parent holding the device is fine.
    """
    import subprocess
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--eval-first-call"],
            capture_output=True, text=True, timeout=900)
        for line in reversed(out.stdout.strip().splitlines()):
            try:
                return float(json.loads(line)["eval_pass_first_s"])
            except (ValueError, KeyError):
                continue
    except Exception:
        pass
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--measure-baseline", action="store_true",
                   help="Measure the torch-CPU reference fps and cache it.")
    p.add_argument("--eval-first-call", action="store_true",
                   help="Run ONLY the first eval pass and print its wall time "
                        "(used by the parent bench to measure the warm-cache "
                        "first call of a fresh process).")
    p.add_argument("--batch", type=int, default=BATCH)
    p.add_argument("--window", type=int, default=WINDOW)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    if args.eval_first_call:
        from empose_tpu.utils.cache import (enable_compilation_cache,
                                            force_synchronous_dispatch)
        enable_compilation_cache()
        force_synchronous_dispatch()
        first, _, _, _, _ = run_eval_pass_tpu(first_only=True)
        print(json.dumps({"eval_pass_first_s": round(first, 2)}))
        return

    if args.measure_baseline:
        fps = run_torch_cpu()
        with open(BASELINE_FILE, "w") as f:
            json.dump({"torch_cpu_fps": fps, "batch": BATCH, "window": WINDOW,
                       "n_iterations": 2, "n_threads": os.cpu_count(),
                       "note": "released LGD-RNN-6 retrain architecture (float64 "
                               "full-mesh SMPL, N=2 grad iterations) on host CPU, "
                               "same batch/window regime as the TPU run"}, f, indent=2)
        print(json.dumps({"torch_cpu_fps": fps}))
        return

    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)

    default_regime = args.batch == BATCH and args.window == WINDOW
    suspect_total = 0
    lat, flops_frame = run_tpu(args.batch, args.window, args.iters)
    fps = lat["highest"]["fps"]
    suspect_total += lat["highest"]["suspect_blocks"]
    result = {
        "metric": "lgd_rnn6_inference_frames_per_sec",
        "value": round(fps, 2),
        "unit": "frames/s",
        # The baseline is pinned at batch 8 x window 256 on THIS 1-CPU host
        # (baseline JSON records n_threads); a custom regime would make the
        # ratio apples-to-oranges, so report it only when like-for-like.
        "vs_baseline": (round(fps / baseline["torch_cpu_fps"], 2)
                        if baseline and default_regime else None),
        "value_median": round(lat["highest"]["fps_median"], 2),
        "batch": args.batch,
        "window": args.window,
        "baseline": baseline,
    }
    # Efficiency accounting (XLA cost-model FLOPs of the lowered program):
    # how far each mode sits from the chip's MXU roofline, not just speedup.
    if flops_frame:
        result["inference_flops_per_frame"] = round(flops_frame)
        result.update({"latency_" + k: v
                       for k, v in _efficiency_rows(flops_frame, fps).items()})
    if default_regime:
        # Extra rows (skipped for custom regimes — no point paying extra
        # compiles for rows the caller didn't ask about). The bf16 row is
        # the DEFAULT-precision serving mode (EMPOSE_NN_PRECISION=default +
        # EMPOSE_FK_PRECISION=default, measured sub-0.04mm MPJPE shift); the
        # headline stays at torch-parity precision. bf16 is only reported for throughput mode
        # — in latency mode (batch 8) the serial-scan dispatch dominates and
        # the bf16 delta is inside run-to-run variance.
        thr, thr_flops = run_tpu(64, args.window, args.iters,
                                 precisions=("highest", "default"))
        result["throughput_batch64_fps"] = round(thr["highest"]["fps"], 2)
        result["throughput_batch64_fps_median"] = round(thr["highest"]["fps_median"], 2)
        result["bf16_throughput_batch64_fps"] = round(thr["default"]["fps"], 2)
        result["bf16_throughput_batch64_fps_median"] = round(thr["default"]["fps_median"], 2)
        suspect_total += thr["highest"]["suspect_blocks"] + thr["default"]["suspect_blocks"]
        thr_flops = thr_flops or flops_frame
        if thr_flops:
            result.update({"throughput_" + k: v for k, v in
                           _efficiency_rows(thr_flops, thr["highest"]["fps"]).items()})
            result.update({"bf16_throughput_" + k: v for k, v in
                           _efficiency_rows(thr_flops, thr["default"]["fps"]).items()})
        tr_ms, tr_flops, tr_x = run_train_step_tpu()
        result["train_step_ms_bs12_w32"] = round(tr_ms, 2)
        suspect_total += tr_x["suspect_blocks"]
        # Large-batch training throughput (frames/s trained), where the
        # differentiable weight-resident LSTM kernel pair carries the
        # recurrence (ops/lstm_train_kernel.py).
        tt_bs, tt_w = 64, 64
        tt_ms, tt_flops, tt_x = run_train_step_tpu(bs=tt_bs, window=tt_w)
        tt_fps = tt_bs * tt_w / (tt_ms / 1e3)
        result["train_throughput_bs64_w64_fps"] = round(tt_fps, 2)
        suspect_total += tt_x["suspect_blocks"]
        if tt_flops:
            result["train_flops_per_frame"] = round(tt_flops)
            result.update({"train_" + k: v for k, v in
                           _efficiency_rows(tt_flops, tt_fps).items()})
        # README-headline training regime (bs64 x w256, README "Training
        # throughput" table): strict torch-parity precision, the validated
        # --matmul_precision high fast mode, AND the convergence-gated bf16
        # serving/training mode (--matmul_precision default, gate run 920002)
        # so the driver's round-over-round JSON tracks every mode the
        # backward-pass work moves.
        hl_bs, hl_w = 64, 256
        hl_ms, hl_flops, hl_x = run_train_step_tpu(iters=10, bs=hl_bs, window=hl_w)
        hl_fps = hl_bs * hl_w / (hl_ms / 1e3)
        result["train_step_ms_bs64_w256"] = round(hl_ms, 2)
        result["train_step_ms_bs64_w256_median"] = round(hl_x["ms_median"], 2)
        result["train_throughput_bs64_w256_fps"] = round(hl_fps, 2)
        suspect_total += hl_x["suspect_blocks"]
        if hl_flops:
            result.update({"train_bs64_w256_" + k: v for k, v in
                           _efficiency_rows(hl_flops, hl_fps).items()})
        for prec in ("high", "default"):
            pp_ms, _, pp_x = run_train_step_tpu(iters=10, bs=hl_bs, window=hl_w,
                                                precision=prec)
            pp_fps = hl_bs * hl_w / (pp_ms / 1e3)
            result[f"train_step_ms_bs64_w256_{prec}"] = round(pp_ms, 2)
            result[f"train_throughput_bs64_w256_{prec}_fps"] = round(pp_fps, 2)
            suspect_total += pp_x["suspect_blocks"]
            if hl_flops:
                result.update({f"train_bs64_w256_{prec}_" + k: v for k, v in
                               _efficiency_rows(hl_flops, pp_fps).items()})
        # Steady-state eval pass through the parity CLI's loop (batched
        # whole-pass program since r05; the serial per-sequence loop is the
        # r04 baseline row).
        (ev_first, ev_steady, ev_fps, ev_median,
         ev_program_s) = run_eval_pass_tpu()
        result["eval_pass_first_s"] = round(ev_first, 2)
        result["eval_pass_steady_s"] = round(ev_steady, 3)
        result["eval_pass_steady_median_s"] = round(ev_median, 3)
        result["eval_pass_fps"] = round(ev_fps, 1)
        # Device-resident program cost (tunnel upload/RTT divided out) —
        # what a locally-attached chip pays per pass.
        result["eval_pass_program_ms"] = round(ev_program_s * 1e3, 2)
        result["eval_pass_program_fps"] = round(4 * 1024 / ev_program_s, 1)
        result["eval_pass_regime"] = ("4 seqs x 1024 frames, window 256, "
                                      "device-resident metrics")
        # First call of a FRESH process once the persistent XLA cache is warm
        # (the number a user pays on their second-ever CLI invocation).
        warm = _warm_cache_first_call_s()
        if warm is not None:
            result["eval_pass_first_warm_cache_s"] = round(warm, 2)
        result["suspect_blocks"] = suspect_total
    print(json.dumps(result))


if __name__ == "__main__":
    main()
