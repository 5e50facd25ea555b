"""Experiment-directory conventions: IDs, config.json, code.zip, cmd.txt.

Reference: empose/helpers/utils.py:21-56 + train.py:82-118. Model identity is
a unix-timestamp ID plus an auto-generated architecture summary string.
"""

from __future__ import annotations

import glob
import os
import sys
import zipfile
from typing import Optional

import jax
import numpy as np


def get_model_dir(experiment_dir: str, model_id) -> Optional[str]:
    matches = glob.glob(os.path.join(experiment_dir, str(model_id) + "-*"))
    return None if not matches else matches[0]


def create_model_dir(experiment_dir: str, experiment_id, model_summary: str,
                     other_summary: Optional[str] = None) -> str:
    model_name = f"{experiment_id}-{model_summary}"
    if other_summary:
        model_name = f"{model_name}-{other_summary}"
    model_dir = os.path.join(experiment_dir, model_name)
    if os.path.exists(model_dir):
        raise ValueError(f"Model directory already exists {model_dir}")
    os.makedirs(model_dir)
    return model_dir


def zip_files(file_list, output_file: str) -> str:
    if not output_file.endswith(".zip"):
        output_file += ".zip"
    ofile = output_file
    counter = 0
    while os.path.exists(ofile):
        counter += 1
        ofile = output_file.replace(".zip", f"_{counter}.zip")
    with zipfile.ZipFile(ofile, mode="w", compression=zipfile.ZIP_DEFLATED) as zf:
        for f in file_list:
            zf.write(f)
    return ofile


def save_cmd(model_dir: str) -> None:
    cmd = sys.argv[0] + " " + " ".join(sys.argv[1:])
    with open(os.path.join(model_dir, "cmd.txt"), "w") as f:
        f.write(cmd)


def count_parameters(params) -> int:
    """Number of trainable scalars in a params pytree (reference utils.py:54-56)."""
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))
