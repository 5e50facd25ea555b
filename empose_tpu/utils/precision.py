"""Shared machinery for the matmul-precision knobs.

Two knobs exist, each a module-level ``_HI`` read at trace time plus a
setter: ``nn.layers.set_nn_precision`` (NN GEMMs) and
``ops.fk_lanes.set_fk_precision`` (lane-major kinematics GEMMs). Both
resolve names through this table so modes and error behavior stay in sync.
"""

from __future__ import annotations

from jax import lax

PRECISIONS = {
    "highest": lax.Precision.HIGHEST,  # f32 on the MXU: torch-parity mode
    "high": lax.Precision.HIGH,
    "default": lax.Precision.DEFAULT,  # bf16-input serving mode
}


def resolve(name: str) -> lax.Precision:
    try:
        return PRECISIONS[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown precision {name!r}; choose from {sorted(PRECISIONS)}")
