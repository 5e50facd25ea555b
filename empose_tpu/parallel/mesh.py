"""Device mesh + sharding helpers: batch-DP over ICI via jit sharding.

The reference has no distributed execution at all (single torch device,
reference configuration.py:23; verified in SURVEY.md §2.3). The workload is
embarrassingly batch-parallel (5.7M params, large synthetic batches), so the
TPU-native scaling strategy is pure data parallelism over a 1-D mesh:

  * parameters / optimizer state / BN stats: replicated;
  * batch tensors: sharded along the leading (batch) axis;
  * gradient all-reduce: inserted automatically by XLA from the sharding
    annotations (the loss means over the batch), riding ICI.

No TP/PP is warranted at this model scale; the hooks below generalize to
N-D meshes if a larger model family is ever added.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        if len(devices) < n_devices:  # a real error, not an assert: this is
            raise ValueError(         # reachable from user CLIs (--dp_devices)
                f"need {n_devices} devices, have {len(devices)}: {jax.devices()}")
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp",
                   leading_axes: int = 0) -> NamedSharding:
    """Batch-axis sharding for batch pytrees.

    :param leading_axes: number of unsharded axes BEFORE the batch axis
      (e.g. 1 for the (K, n, ...) stacked batches of a host-unrolled
      multi-step program).
    """
    return NamedSharding(mesh, P(*([None] * leading_axes + [axis])))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "dp") -> Dict:
    """Device-put a host batch with the leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis)

    def put(x):
        return jax.device_put(x, sh)

    return {k: (put(v) if hasattr(v, "shape") and np.ndim(v) >= 1 else v)
            for k, v in batch.items() if k != "ids"}


def replicate(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def pad_batch_to_devices(batch: Dict, n_devices: int) -> Dict:
    """Pad the batch axis to a multiple of the mesh size by REPEATING the
    leading samples (wrap-around) with ``seq_lengths`` ZEROED on the pads.

    Repetition keeps every tensor well-conditioned through the preprocess
    chain (no all-zero garbage sequences), while the zeroed lengths make the
    pads contribute exactly 0 to every masked loss term (losses.py treats
    length-0 samples as exact zeros). The trainer rescales the batch mean by
    n_padded/n_real (see train/loop.py), so batch-mean semantics are EXACT
    for every batch size — pads carry zero weight, not double weight.
    """
    n = batch["poses"].shape[0]
    target = ((n + n_devices - 1) // n_devices) * n_devices
    if target == n:
        return batch
    reps = np.arange(target - n) % n
    out = {}
    for k, v in batch.items():
        if k == "ids":
            out[k] = list(v) + [v[int(i)] for i in reps]
            continue
        v = np.asarray(v)
        if k == "seq_lengths":
            out[k] = np.concatenate([v, np.zeros(target - n, dtype=v.dtype)], axis=0)
        else:
            out[k] = np.concatenate([v, v[reps]], axis=0)
    return out


def init_distributed(coordinator_address: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host (DCN) initialization hook.

    Single-host multi-chip needs nothing (jax.devices() already sees the whole
    slice over ICI). For multi-host slices call this once per process before
    any jax op; the DP mesh helpers above then span all hosts' devices.
    """
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
