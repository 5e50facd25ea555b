"""Evaluate a trained model on the real EM-POSE recordings.

CLI mirror of the reference entry point (reference: scripts/evaluate_real.py:
24-110): per-sequence metric rows plus the 'Overall average' row (the paper's
Table-2 numbers), with --cross_subject evaluating the hold-out subject 0715.

Usage: python scripts/evaluate_real.py --model_id <id> [--cross_subject]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    from empose_tpu.utils.cache import enable_compilation_cache, force_synchronous_dispatch
    enable_compilation_cache()
    force_synchronous_dispatch()
    prec = getattr(args, "precision", "highest")
    if prec != "highest":
        # Same opt-in bf16 mode as scripts/serve.py --precision (accuracy
        # measured end-to-end, README); binds before the session's traces.
        from empose_tpu.nn.layers import set_nn_precision
        from empose_tpu.ops.fk_lanes import set_fk_precision
        set_nn_precision(prec)
        set_fk_precision(prec)
    from empose_tpu import constants as C
    from empose_tpu.data.datasets import RealDataset, Loader
    from empose_tpu.data.batches import collate_real
    from empose_tpu.eval.harness import (EvalSession, evaluate_real_sequences, load_model,
                                         print_metric_table)
    from empose_tpu.nn.models import IterativeErrorFeedback

    model, params, state, config, model_dir, sensor = load_model(args.model_id)

    data_dir = C.data_dir_real()
    if args.cross_subject:
        data_dir = os.path.join(data_dir, "hold_out")
    ds = RealDataset(data_dir)
    loader = Loader(ds, batch_size=1, collate_fn=collate_real, shuffle=False)

    is_lgd = isinstance(model, IterativeErrorFeedback)
    window_size = args.window_size if args.window_size else (256 if is_lgd else None)

    noise_fn = None
    if getattr(args, "suppression_length", 0.0) > 0.0:
        # Robustness study: zero random sensors over random windows at eval
        # time (the paper's sensor-dropout ablation).
        from empose_tpu.data.noise import marker_suppression_noise_fn
        noise_fn = marker_suppression_noise_fn(args.suppression_length,
                                               getattr(args, "suppression_markers", 1),
                                               0.0, config.n_markers)
    session = EvalSession(model, params, state, sensor, noise_fn=noise_fn)
    rows, overall = evaluate_real_sequences(
        session, loader, window_size,
        visualize_index=getattr(args, "visualize", -1),
        visualize_dir=os.path.join(model_dir, "visualize"),
        host_metrics=getattr(args, "host_metrics", False),
        serial=getattr(args, "serial", False))
    print_metric_table(rows, args.model_id)
    return overall


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model_id", required=True, help="Which end-to-end model to evaluate.")
    p.add_argument("--cross_subject", action="store_true", help="Evaluate on hold-out subject 0715.")
    p.add_argument("--window_size", type=int, default=None, help="Override the eval window size.")
    p.add_argument("--suppression_length", type=float, default=0.0,
                   help="Eval-time sensor dropout: fraction of each window a random "
                        "marker is suppressed (robustness study).")
    p.add_argument("--suppression_markers", type=int, default=1,
                   help="How many markers are suppressed at a time.")
    p.add_argument("--precision", choices=("highest", "high", "default"),
                   default="highest",
                   help="Matmul precision: 'highest' = torch-parity f32 (the "
                        "Table-2 mode); 'high' = 3-pass bf16 (near-f32-exact, "
                        "~2x MXU throughput); 'default' = bf16-input fast mode "
                        "(measured sub-0.04mm MPJPE shift, see README).")
    p.add_argument("--host_metrics", action="store_true",
                   help="Use the host MetricsEngine loop (the parity oracle) instead "
                        "of the default batched whole-pass program.")
    p.add_argument("--serial", action="store_true",
                   help="Use the serial per-sequence device-stats loop (one host sync "
                        "per sequence) instead of the default batched whole-pass "
                        "program (one sync per pass). Auto-selected for "
                        "--suppression_length / --visualize runs.")
    p.add_argument("--visualize", type=int, default=-1,
                   help="Dump skeleton/mesh artifacts (npz + OBJ) for the sequence with "
                        "this index into <model_dir>/visualize/ (the reference's flag "
                        "only prints 'not yet implemented', evaluate_real.py:90-92).")
    main(p.parse_args())
