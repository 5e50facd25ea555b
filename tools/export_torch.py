"""Export a trained empose_tpu experiment as a reference-layout ``model.pth``.

    python tools/export_torch.py --model_id <id> [--out /path/model.pth]

Loads the experiment's native checkpoint (the same loader the eval CLI
uses), maps the pytrees back to the reference's torch key space
(checkpoint/torch_writer.py), and writes a ``.pth`` the reference codebase
consumes with plain ``torch.load`` + strict ``load_state_dict``
(reference eval/helpers.py:131-137). Defaults to ``model.pth`` inside the
experiment directory — the exact path the reference expects.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_id", required=True)
    p.add_argument("--out", default=None,
                   help="Output path (default: <experiment_dir>/model.pth).")
    args = p.parse_args()

    from empose_tpu.checkpoint.torch_writer import save_torch_checkpoint
    from empose_tpu.eval.harness import load_model

    model, params, state, config, model_dir, _ = load_model(args.model_id)
    out = args.out or os.path.join(model_dir, "model.pth")
    if args.out is None and os.path.exists(out):
        raise SystemExit(
            f"{out} already exists (this experiment was imported from a "
            f"torch checkpoint); pass --out to write elsewhere.")
    save_torch_checkpoint(out, params, state, config)
    print(f"Exported {args.model_id} -> {out}")


if __name__ == "__main__":
    main()
