"""Sensor-dropout robustness study: sweep eval-time marker suppression.

The paper's ablation drops sensors at evaluation to measure degradation
(reference noise_functions.py:110-164 is the dropout machinery; the reference
repo ships no sweep runner). This tool evaluates one trained model on the
real recordings under a grid of ``suppression_length`` (fraction of each
window a marker is dropped) x ``suppression_markers`` (how many markers at a
time) and prints the paper-style robustness table.

Usage:
  python tools/suppression_study.py --model_id <id> \
      [--lengths 0,0.25,0.5,1.0] [--markers 1,2] [--window_size N] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_study(model_id, lengths, markers_list, window_size=None, cross_subject=False):
    from empose_tpu import constants as C
    from empose_tpu.data.batches import collate_real
    from empose_tpu.data.datasets import Loader, RealDataset
    from empose_tpu.data.noise import marker_suppression_noise_fn
    from empose_tpu.eval.harness import EvalSession, evaluate_real_sequences, load_model
    from empose_tpu.nn.models import IterativeErrorFeedback

    model, params, state, config, model_dir, sensor = load_model(model_id)
    data_dir = C.data_dir_real()
    if cross_subject:
        data_dir = os.path.join(data_dir, "hold_out")
    ds = RealDataset(data_dir)

    is_lgd = isinstance(model, IterativeErrorFeedback)
    ws = window_size if window_size else (256 if is_lgd else None)

    rows = []
    # Clean baseline once (length 0 is identical for any marker count), then
    # the full markers x positive-lengths grid.
    grid = [(0, 0.0)] + [(m, l) for m in markers_list for l in lengths if l > 0.0]
    for n_markers, length in grid:
        noise_fn = None
        if length > 0.0:
            noise_fn = marker_suppression_noise_fn(
                length, n_markers, 0.0, config.n_markers)
        session = EvalSession(model, params, state, sensor, noise_fn=noise_fn)
        loader = Loader(ds, batch_size=1, collate_fn=collate_real, shuffle=False)
        _, overall = evaluate_real_sequences(session, loader, ws)
        rows.append({
            "suppression_markers": n_markers,
            "suppression_length": length,
            **{k: round(float(v), 3) for k, v in overall.items()},
        })
        print(f"  markers={n_markers} length={length}: "
              + " ".join(f"{k}={v}" for k, v in rows[-1].items()
                         if k not in ("suppression_markers", "suppression_length")),
              flush=True)
    return rows


def check_monotone(rows, tol_mm=2.0):
    """Regression check: MPJPE degradation must be monotone in suppression
    length (per marker count) and in marker count (per length), within
    ``tol_mm`` of eval noise. Dropping MORE sensor signal for LONGER must
    not make a healthy model BETTER — a violation means the robustness
    behavior regressed (or the noise injection broke).

    :return: list of human-readable violations (empty = pass).
    """
    base = next(r for r in rows if r["suppression_length"] == 0.0)
    violations = []
    by_markers = {}
    for r in rows:
        if r["suppression_length"] > 0.0:
            by_markers.setdefault(r["suppression_markers"], []).append(r)
    for m, rs in by_markers.items():
        chain = [base] + sorted(rs, key=lambda r: r["suppression_length"])
        for a, b in zip(chain, chain[1:]):
            if b["MPJPE [mm]"] < a["MPJPE [mm]"] - tol_mm:
                violations.append(
                    f"markers={m}: MPJPE {b['MPJPE [mm]']:.2f} at length "
                    f"{b['suppression_length']} < {a['MPJPE [mm]']:.2f} at "
                    f"length {a['suppression_length']} (tol {tol_mm} mm)")
    lengths = sorted({r["suppression_length"] for r in rows if r["suppression_length"] > 0.0})
    for l in lengths:
        chain = sorted((r for r in rows if r["suppression_length"] == l),
                       key=lambda r: r["suppression_markers"])
        for a, b in zip(chain, chain[1:]):
            if b["MPJPE [mm]"] < a["MPJPE [mm]"] - tol_mm:
                violations.append(
                    f"length={l}: MPJPE {b['MPJPE [mm]']:.2f} with "
                    f"{b['suppression_markers']} markers dropped < "
                    f"{a['MPJPE [mm]']:.2f} with {a['suppression_markers']} (tol {tol_mm} mm)")
    return violations


def to_table(rows) -> str:
    from tabulate import tabulate
    keys = [k for k in rows[0] if k not in ("suppression_markers", "suppression_length")]
    headers = ["dropped markers", "dropout length (frac of window)"] + keys
    body = [[r["suppression_markers"], r["suppression_length"]] + [r[k] for k in keys]
            for r in rows]
    return tabulate(body, headers=headers)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_id", required=True)
    p.add_argument("--lengths", default="0,0.25,0.5,1.0",
                   help="Comma-separated suppression_length values (0 = clean baseline).")
    p.add_argument("--markers", default="1,2",
                   help="Comma-separated suppression_markers values.")
    p.add_argument("--window_size", type=int, default=None)
    p.add_argument("--cross_subject", action="store_true")
    p.add_argument("--out", default=None, help="Also write the rows as JSON here.")
    args = p.parse_args()

    from empose_tpu.utils.cache import enable_compilation_cache, force_synchronous_dispatch
    enable_compilation_cache()
    force_synchronous_dispatch()

    lengths = sorted(float(x) for x in args.lengths.split(","))
    markers = [int(x) for x in args.markers.split(",")]
    rows = run_study(args.model_id, lengths, markers, args.window_size,
                     args.cross_subject)
    print()
    print(to_table(rows))
    violations = check_monotone(rows)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows, "monotone_ok": not violations,
                       "violations": violations}, f, indent=2)
    if violations:
        print("\nMONOTONICITY VIOLATIONS (robustness regression):")
        for v in violations:
            print("  " + v)
        sys.exit(1)
    print("\nmonotonicity check: OK (degradation monotone in length and marker count)")


if __name__ == "__main__":
    main()
