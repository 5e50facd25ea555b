"""Fused linear-blend-skinning kernel (Pallas/TPU) + XLA fallback.

The full-mesh LBS contraction — blend 52 joint transforms into 6890 per-vertex
transforms, then apply them — is the reference's hottest FLOP block
(human_body_prior lbs, invoked at reference smpl.py:121). The naive form
materializes the blended (V, 3, 4) transforms in HBM; this kernel keeps them
in VMEM: per (batch, vertex-tile) grid cell it runs one MXU matmul
``T = A @ W_tile`` ((12, J) x (J, TILE_V)) and immediately applies T to the
tile's rest-pose vertices on the VPU, writing only the final (3, TILE_V)
positions.

Layouts are lane-major in V (the long axis) so every block is (sublane<=12,
lane=TILE_V) — no 3-wide lane padding anywhere.

Used by smplh_fk(use_pallas=True) for full-mesh skinning; the sensor-subset
path (~150 vertices) stays on plain XLA einsums where a kernel buys nothing.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

TILE_V = 512


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def pack_transforms(R_glob: jnp.ndarray, t_skin: jnp.ndarray) -> jnp.ndarray:
    """(N, J, 3, 3) + (N, J, 3) -> (N, 12, J) row-major [R00..R22, t0..t2]."""
    n, j = t_skin.shape[0], t_skin.shape[1]
    a = jnp.concatenate([R_glob.reshape(n, j, 9), t_skin], axis=-1)  # (N, J, 12)
    return jnp.swapaxes(a, 1, 2)  # (N, 12, J)


def lbs_apply_xla(weights: jnp.ndarray, R_glob: jnp.ndarray, t_skin: jnp.ndarray,
                  v_posed: jnp.ndarray) -> jnp.ndarray:
    """Reference XLA path: verts = (W·R) v + W·t. weights (V, J)."""
    hi = lax.Precision.HIGHEST
    Rw = jnp.einsum("vj,njab->nvab", weights, R_glob, precision=hi)
    tw = jnp.einsum("vj,nja->nva", weights, t_skin, precision=hi)
    return jnp.einsum("nvab,nvb->nva", Rw, v_posed, precision=hi) + tw


def _lbs_kernel(a_ref, w_ref, v_ref, o_ref):
    """One (batch, vertex-tile) cell.

    a_ref: (1, 12, J)  packed transforms for this batch element
    w_ref: (J, TILE_V) transposed LBS weights for this tile
    v_ref: (1, 3, TILE_V) rest-pose vertices (transposed)
    o_ref: (1, 3, TILE_V) skinned vertices
    """
    # HIGHEST precision: f32 MXU passes (default bf16 costs ~1e-3 abs error).
    T = jnp.dot(a_ref[0], w_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # (12, TILE_V)
    vx, vy, vz = v_ref[0, 0, :], v_ref[0, 1, :], v_ref[0, 2, :]
    o_ref[0, 0, :] = T[0] * vx + T[1] * vy + T[2] * vz + T[9]
    o_ref[0, 1, :] = T[3] * vx + T[4] * vy + T[5] * vz + T[10]
    o_ref[0, 2, :] = T[6] * vx + T[7] * vy + T[8] * vz + T[11]


@partial(jax.jit, static_argnames=("interpret",))
def lbs_apply_pallas(weights_t: jnp.ndarray, a_packed: jnp.ndarray, v_posed_t: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused LBS. weights_t (J, V_pad); a_packed (N, 12, J); v_posed_t (N, 3, V_pad).

    V_pad must be a multiple of TILE_V (pad with zeros; padded lanes produce
    garbage that callers slice off). Returns (N, 3, V_pad).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = a_packed.shape[0]
    j = weights_t.shape[0]
    v_pad = weights_t.shape[1]
    assert v_pad % TILE_V == 0

    grid = (n, v_pad // TILE_V)
    return pl.pallas_call(
        _lbs_kernel,
        out_shape=jax.ShapeDtypeStruct((n, 3, v_pad), v_posed_t.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 12, j), lambda i, k: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((j, TILE_V), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TILE_V), lambda i, k: (i, 0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, TILE_V), lambda i, k: (i, 0, k), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a_packed, weights_t, v_posed_t)


class PallasLBS:
    """Holds padded/transposed weights for repeated fused-LBS calls."""

    def __init__(self, weights):
        v, j = weights.shape
        self.n_vertices = v
        v_pad = _round_up(v, TILE_V)
        # Build paths pass HOST numpy weights (see ops/fk_lanes.py
        # LaneFK.__init__ host-constants note): np.asarray is then free, and
        # the h2d-uploaded result lowers into closures without a d2h read.
        wt = np.zeros((j, v_pad), np.float32)
        wt[:, :v] = np.asarray(weights).T
        self.weights_t = jnp.asarray(wt)

    def __call__(self, R_glob, t_skin, v_posed, interpret: bool = False):
        """:param v_posed: (N, V, 3) -> returns (N, V, 3)."""
        n, v = v_posed.shape[0], v_posed.shape[1]
        v_pad = self.weights_t.shape[1]
        a = pack_transforms(R_glob, t_skin)
        vt = jnp.swapaxes(v_posed, 1, 2)  # (N, 3, V)
        if v < v_pad:
            vt = jnp.pad(vt, ((0, 0), (0, 0), (0, v_pad - v)))
        out = lbs_apply_pallas(self.weights_t, a, vt, interpret=interpret)
        return jnp.swapaxes(out[:, :, :v], 1, 2)
