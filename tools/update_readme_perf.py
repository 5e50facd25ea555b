"""Regenerate the README's measured-performance block from a bench JSON.

The README's headline performance claims drifted from the archived bench
artifacts more than once (r04 verdict: eval steady-state quoted 2.22 s while
BENCH_r04 recorded 2.0 s). This tool makes the bench JSON the single source:
it renders the measured numbers into the block between

    <!-- bench-numbers:begin -->  ...  <!-- bench-numbers:end -->

in README.md, so the README quotes exactly what ``python bench.py`` printed
(the same JSON the driver archives round-over-round as BENCH_r{N}.json).

Usage:
  python bench.py | tail -1 > docs/bench_current.json   # or use BENCH_r0N.json
  python tools/update_readme_perf.py --bench docs/bench_current.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

BEGIN = "<!-- bench-numbers:begin -->"
END = "<!-- bench-numbers:end -->"


def _fmt_fps(v):
    return f"{v / 1e3:,.0f}k" if v >= 1e5 else f"{v:,.0f}"


def render_block(r: dict) -> str:
    """Markdown for the measured-numbers table from a parsed bench JSON."""
    rows = []

    def add(label, value, extra=""):
        if value is not None:
            rows.append((label, value, extra))

    pct = r.get("latency_pct_of_bf16_roofline")
    add("streaming inference, latency mode (batch 8 x window 256, f32 torch-parity)",
        f"**{_fmt_fps(r['value'])} frames/s**",
        f"median {_fmt_fps(r['value_median'])} f/s; {pct}% of bf16 roofline" if pct else "")
    if "throughput_batch64_fps" in r:
        add("throughput mode (batch 64, f32 torch-parity)",
            f"**{_fmt_fps(r['throughput_batch64_fps'])} frames/s**",
            f"{r.get('throughput_pct_of_bf16_roofline')}% of roofline")
        add("throughput mode, bf16 serving precision (`--precision default`)",
            f"**{_fmt_fps(r['bf16_throughput_batch64_fps'])} frames/s**",
            f"{r.get('bf16_throughput_pct_of_bf16_roofline')}% of roofline")
    add("fused train step, released config (bs 12 x w 32)",
        f"**{r.get('train_step_ms_bs12_w32')} ms**",
        "vs the reference's 700 ms example GPU step (reference README.md:230)")
    if "train_step_ms_bs64_w256" in r:
        add("fused train step, large-batch regime (bs 64 x w 256)",
            f"**{r['train_step_ms_bs64_w256']} ms** strict f32",
            f"{_fmt_fps(r['train_throughput_bs64_w256_fps'])} f/s trained; "
            f"`high` {r.get('train_step_ms_bs64_w256_high')} ms "
            f"({_fmt_fps(r.get('train_throughput_bs64_w256_high_fps', 0))} f/s); "
            f"bf16 `default` {r.get('train_step_ms_bs64_w256_default')} ms "
            f"({_fmt_fps(r.get('train_throughput_bs64_w256_default_fps', 0))} f/s)")
    if "eval_pass_steady_s" in r:
        add("real-data eval pass (4 seqs x 1024 frames, window 256)",
            f"**{r['eval_pass_steady_s']} s** steady state "
            f"({_fmt_fps(r['eval_pass_fps'])} frames/s)",
            f"first call {r.get('eval_pass_first_s')} s cold (compile-dominated)"
            + (f", {r['eval_pass_first_warm_cache_s']} s for a fresh process "
               "with a warm XLA cache"
               if r.get("eval_pass_first_warm_cache_s") is not None else ""))
    if r.get("eval_pass_program_ms"):
        add("eval pass, device-resident program only (corpus pre-uploaded)",
            f"**{r['eval_pass_program_ms']} ms** "
            f"({_fmt_fps(r['eval_pass_program_fps'])} frames/s)",
            "tunnel upload/RTT divided out — the per-pass cost on a "
            "locally-attached chip")
    vs = r.get("vs_baseline")
    if vs:
        add("vs torch-CPU reference implementation (same architecture/regime, "
            "1-core host — see note below)", f"**{vs:,.0f}x**", "")

    lines = [
        "Measured numbers, one v5e chip (auto-generated from the `python "
        "bench.py` JSON by `tools/update_readme_perf.py` — do not edit by "
        "hand; the same JSON is archived round-over-round as "
        "`BENCH_r{N}.json`):",
        "",
        "| What | Measured | Notes |",
        "|---|---|---|",
    ]
    for label, value, extra in rows:
        lines.append(f"| {label} | {value} | {extra} |")
    suspects = r.get("suspect_blocks")
    if suspects is not None:
        lines.append("")
        lines.append(
            f"Timing blocks discarded by the roofline plausibility guard this "
            f"run: **{suspects}** (any block implying more than the chip's "
            f"197 bf16 TFLOP/s is a runtime measurement failure, never a "
            f"result — `bench.py::timed_blocks`).")
    return "\n".join(lines)


def update_readme(readme_path: str, block: str) -> None:
    with open(readme_path) as f:
        text = f.read()
    if BEGIN not in text or END not in text:
        sys.exit(f"error: {readme_path} lacks the {BEGIN} / {END} markers")
    new = re.sub(
        re.escape(BEGIN) + r".*?" + re.escape(END),
        BEGIN + "\n" + block + "\n" + END,
        text, flags=re.S)
    with open(readme_path, "w") as f:
        f.write(new)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bench", required=True, help="bench JSON file (one object, "
                   "either the raw bench.py line or a driver BENCH_r{N}.json "
                   "with a 'parsed' field).")
    p.add_argument("--readme", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md"))
    p.add_argument("--print-only", action="store_true")
    args = p.parse_args()

    with open(args.bench) as f:
        r = json.load(f)
    if "parsed" in r:  # driver artifact wrapper
        r = r["parsed"]
    block = render_block(r)
    if args.print_only:
        print(block)
        return
    update_readme(args.readme, block)
    print(f"README block updated from {args.bench}")


if __name__ == "__main__":
    main()
