"""Convert a reference torch ``model.pth`` checkpoint to a native checkpoint.

Reads the experiment dir's config.json + model.pth (reference format,
eval/helpers.py:131-137), maps the state dict onto the JAX param/state trees,
and writes the slim native ``checkpoint_model`` next to it — after which
evaluation no longer touches the torch file.

Usage: python tools/convert_checkpoint.py --model_id <id>
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(model_id, experiment_dir=None):
    from empose_tpu import constants as C
    from empose_tpu.config import Configuration
    from empose_tpu.checkpoint.mapping import convert_model
    from empose_tpu.checkpoint.native import save_params_state
    from empose_tpu.checkpoint.torch_reader import load_state_dict, load_torch_checkpoint
    from empose_tpu.utils.experiments import get_model_dir

    experiment_dir = experiment_dir or C.experiment_dir()
    model_dir = get_model_dir(experiment_dir, model_id)
    if model_dir is None:
        raise FileNotFoundError(f"No experiment dir for model id {model_id}")
    config = Configuration.from_json(os.path.join(model_dir, "config.json"))
    sd = load_state_dict(os.path.join(model_dir, "model.pth"))
    params, state = convert_model(sd, config)
    out = os.path.join(model_dir, "checkpoint_model")
    save_params_state(out, params, state)
    print(f"Converted {model_dir}/model.pth -> {out}")
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model_id", required=True)
    p.add_argument("--experiment_dir", default=None)
    args = p.parse_args()
    main(args.model_id, args.experiment_dir)
