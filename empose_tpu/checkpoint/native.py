"""Native checkpointing (orbax): full train-state save/restore.

Upgrades the reference's best-checkpoint-only torch.save (reference:
train.py:190-205) to true resume: params, mutable state (BN stats), optimizer
state, and step counters all round-trip. The reference saves optimizer state
but never restores it (eval/helpers.py:131-137) — here --resume restores
everything.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.StandardCheckpointer()


def save_train_state(path: str, train_state: Dict[str, Any]) -> None:
    """:param train_state: pytree dict (params/state/opt_state/counters)."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(path, train_state, force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    ckptr = _checkpointer()
    return ckptr.restore(os.path.abspath(path), template)


def save_params_state(path: str, params, state) -> None:
    save_train_state(path, {"params": params, "state": state})


def restore_params_state(path: str, model) -> Tuple[Any, Any]:
    """Restore (params, state) from a model-only checkpoint (see
    save_params_state). Inference-side loading doesn't know the
    optimizer-state structure, so trainers write this slim checkpoint next to
    the full train state."""
    # eval_shape: the restore template only needs structure/shapes/dtypes,
    # so skip computing an actual init (on a tunneled device an eager init
    # is hundreds of dispatch round-trips; even jitted it is a compile).
    template_params, template_state = jax.eval_shape(
        model.init, jax.random.PRNGKey(0))
    template = {"params": template_params, "state": template_state}
    restored = restore_train_state(path, template)
    return restored["params"], restored["state"]
