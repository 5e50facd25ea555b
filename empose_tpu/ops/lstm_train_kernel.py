"""Differentiable weight-resident LSTM layer kernel (Pallas/TPU).

Training's LSTM cost is fwd + bwd, and under ``lax.scan`` BOTH sweeps
re-stream the recurrent weights from HBM every timestep (reference
layers.py:146-153 trains the same recurrence through cuDNN). Measured on a
v5e chip the LSTM fwd+bwd is 25-32% of a large-batch LGD train step
(bs 64 x window 64..256), so the recurrence is worth the same
weight-resident treatment the inference kernel gets — but the backward
pass needs gradients, which ``pallas_call`` does not provide.

The TPU-shaped decomposition used here keeps the KERNELS minimal and
pushes every sizeable contraction outside where it runs as one big MXU
GEMM over all F*N rows:

  forward   x_proj = x @ W_ih + b      (outside: big GEMM, XLA autodiff)
            (gates, h_all, c_all) = fwd-kernel(x_proj, mask, W_hh, h0, c0)
                                        [serial recurrence, W_hh resident]
            outs = mask * h_all         (outside; fuses into the next GEMM)

  backward  dgates = bwd-kernel(dh_all, dc_all, gates, c_prev, mask, W_hh)
                                        [reverse sweep, W_hh resident]
            dW_hh  = h_prev^T @ dgates  (outside: one big GEMM)
            dx_proj = dgates            (identity; dW_ih/db/dx via autodiff
                                         of the outer projection)

Only the irreducibly serial cell recurrence lives in kernels; a
``jax.custom_vjp`` on the core ties the two sweeps together. The layer is
the unit (one direction), so the same pair serves unidirectional stacks,
the wavefront path's layers, and both directions of bidirectional stacks.
Masked-step semantics are identical to ``nn.layers._lstm_cell_scan``:
state frozen, outputs zeroed — frozen steps produce zero ``dgates`` and
pass cotangents straight through, exactly the scan's gradient.

Residual memory: gates (F, N, 4H) + h/c streams, written once by the
forward kernel and read once by the backward — the same residuals
``lax.scan``'s autodiff saves, minus the re-streamed weights.

VMEM budget per kernel: one resident (H, 4H) recurrent-weight block +
streamed step blocks — f32 at HIGHEST/DEFAULT, or the PRE-SPLIT bf16 hi/lo
pair at HIGH (split once OUTSIDE the kernel, replacing the f32 block at
equal bytes: 4H^2 * (2+2) — the same trick the fwd-only kernels in
lstm_kernel.py use). Residency is 4 bytes/element at every precision, so
:func:`fits_vmem_layer` bounds H <= ~900 uniformly.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import lax

from empose_tpu.ops.lstm_kernel import (_VMEM_WEIGHT_BUDGET, _PALLAS_OK,
                                        _batch_axis, _sigmoid,
                                        kernel_dot_precision,
                                        split_bf16 as _split_bf16,
                                        dot3 as _dot3)

if _PALLAS_OK:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


def fits_vmem_layer(hidden: int, precision=None) -> bool:
    """One direction-layer's recurrent weights resident at once.

    4 bytes/element at EVERY precision: HIGHEST/DEFAULT keep the f32 block,
    HIGH keeps the pre-split bf16 hi/lo pair REPLACING it at equal bytes
    (the split happens outside the kernel), so H <= ~900 uniformly. The
    ``precision`` arg is accepted for call-site symmetry with the fwd-only
    kernels' gates but no longer changes the bound."""
    del precision
    return hidden * 4 * hidden * 4 <= _VMEM_WEIGHT_BUDGET


# ---------------------------------------------------------------------------
# 3-pass bf16 emulation of ``lax.Precision.HIGH`` (shared split_bf16/dot3
# helpers live in lstm_kernel.py). Mosaic raises on HIGH, and the old clamp
# to HIGHEST ran the serial gate GEMMs as 6-pass f32 emulation — twice the
# MXU passes the caller asked to pay for. The RESIDENT weights are split
# ONCE outside the kernel (in the custom_vjp core wrapper) and the bf16
# hi/lo pair REPLACES the f32 block at equal bytes — the same scheme as the
# fwd-only kernels in lstm_kernel.py, so weight residency is 4 bytes/elt at
# every precision. Only the small per-step activation split is paid every
# step. Gradients are unaffected: the custom_vjp supplies dW_hh from the
# deferred outside GEMM, never through the split.

# ---------------------------------------------------------------------------
# Forward sweep: carried states in VMEM scratch, W_hh resident, per-step
# streams: x_proj in; gate preactivations + carried (h, c) out.

def _make_fwd_kernel(hidden: int, precision, save_gates: bool):
    high3 = precision == lax.Precision.HIGH
    precision = kernel_dot_precision(precision)
    def kernel(xp_ref, m_ref, *rest):
        if high3:  # pre-split bf16 hi/lo pair replaces the f32 block
            whi_ref, wlo_ref, h0_ref, c0_ref, *rest = rest
        else:
            whh_ref, h0_ref, c0_ref, *rest = rest
        if save_gates:
            g_ref, h_ref, c_ref, h_s, c_s = rest
        else:
            h_ref, c_ref, h_s, c_s = rest
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h_s[:] = h0_ref[:]
            c_s[:] = c0_ref[:]

        m = m_ref[0]  # (N, 1)
        h, c = h_s[:], c_s[:]
        if high3:
            rec = _dot3(h, whi_ref[:], wlo_ref[:])
        else:
            rec = jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32,
                          precision=precision)
        gates = xp_ref[0] + rec
        i = _sigmoid(gates[:, :hidden])
        f = _sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = _sigmoid(gates[:, 3 * hidden:])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        h_s[:] = jnp.where(m > 0, h_new, h)
        c_s[:] = jnp.where(m > 0, c_new, c)
        if save_gates:
            g_ref[0] = gates
        h_ref[0] = h_s[:]
        c_ref[0] = c_s[:]

    return kernel


def _pallas_fwd(x_proj, mask_col, *weights_and_state,
                hidden: int, interpret: bool, precision,
                save_gates: bool = True):
    """``weights_and_state`` is ``(w_hh, h0, c0)`` at HIGHEST/DEFAULT or the
    pre-split ``(whh_hi, whh_lo, h0, c0)`` at HIGH."""
    f, n = x_proj.shape[0], x_proj.shape[1]
    kernel = _make_fwd_kernel(hidden, precision, save_gates)
    n_weights = len(weights_and_state) - 2
    step_h = pl.BlockSpec((1, n, hidden), lambda t: (t, 0, 0),
                          memory_space=pltpu.VMEM)
    gates_out = ((jax.ShapeDtypeStruct((f, n, 4 * hidden), x_proj.dtype),)
                 if save_gates else ())
    return pl.pallas_call(
        kernel,
        grid=(f,),
        out_shape=gates_out + (
            jax.ShapeDtypeStruct((f, n, hidden), x_proj.dtype),
            jax.ShapeDtypeStruct((f, n, hidden), x_proj.dtype),
        ),
        in_specs=[
            pl.BlockSpec((1, n, 4 * hidden), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((hidden, 4 * hidden), lambda t: (0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_weights)
        ] + [
            pl.BlockSpec((n, hidden), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, hidden), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=((pl.BlockSpec((1, n, 4 * hidden), lambda t: (t, 0, 0),
                                 memory_space=pltpu.VMEM),)
                   if save_gates else ()) + (step_h, step_h),
        scratch_shapes=[
            pltpu.VMEM((n, hidden), jnp.float32),
            pltpu.VMEM((n, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(x_proj, mask_col, *weights_and_state)


# ---------------------------------------------------------------------------
# Backward sweep (reverse time): cotangent carries live in the dh0/dc0
# output blocks (constant index maps), W_hh resident; streams dh/dc
# cotangents + saved gates/c_prev in, dgates out.

def _make_bwd_kernel(hidden: int, precision):
    high3 = precision == lax.Precision.HIGH
    precision = kernel_dot_precision(precision)
    def kernel(dh_ref, dc_ref, g_ref, cp_ref, m_ref, *rest):
        if high3:  # pre-split bf16 hi/lo pair replaces the f32 block
            whi_ref, wlo_ref, dg_ref, dh0_ref, dc0_ref = rest
        else:
            whh_ref, dg_ref, dh0_ref, dc0_ref = rest
        # The dh0/dc0 output blocks have constant index maps (VMEM-resident
        # for the whole grid), so they double as the reverse-sweep cotangent
        # carries — same pattern as the forward kernels' hf/cf blocks.
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dh0_ref[:] = jnp.zeros_like(dh0_ref[:])
            dc0_ref[:] = jnp.zeros_like(dc0_ref[:])

        m = m_ref[0]                       # (N, 1)
        Dh = dh0_ref[:] + dh_ref[0]        # total cotangent on carried h_t
        Dc = dc0_ref[:] + dc_ref[0]
        gates = g_ref[0]
        c_prev = cp_ref[0]
        i = _sigmoid(gates[:, :hidden])
        f = _sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = _sigmoid(gates[:, 3 * hidden:])
        c_new = f * c_prev + i * g
        tc = jnp.tanh(c_new)

        dh_new = Dh * m
        dc_new = Dc * m + dh_new * o * (1.0 - tc * tc)
        do = dh_new * tc
        di = dc_new * g
        df = dc_new * c_prev
        dg = dc_new * i
        dgates = jnp.concatenate([
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            dg * (1.0 - g * g),
            do * o * (1.0 - o),
        ], axis=-1)                        # (N, 4H)
        dg_ref[0] = dgates
        # ds_{t-1} through the gate matmul + the frozen-step bypass.
        if high3:
            back = _dot3(dgates, whi_ref[:], wlo_ref[:],
                         dn=(((1,), (1,)), ((), ())))
        else:
            back = lax.dot_general(
                dgates, whh_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)
        dh0_ref[:] = back + Dh * (1.0 - m)
        dc0_ref[:] = dc_new * f + Dc * (1.0 - m)

    return kernel


def _pallas_bwd(dh_all, dc_all, gates_all, c_prev_all, mask_col, *weights,
                hidden: int, interpret: bool, precision):
    """``weights`` is ``(w_hh,)`` at HIGHEST/DEFAULT or the pre-split
    ``(whh_hi, whh_lo)`` at HIGH."""
    f, n = dh_all.shape[0], dh_all.shape[1]
    kernel = _make_bwd_kernel(hidden, precision)
    rev_h = pl.BlockSpec((1, n, hidden), lambda t: (f - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM)
    const_h = pl.BlockSpec((n, hidden), lambda t: (0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(f,),
        out_shape=(
            jax.ShapeDtypeStruct((f, n, 4 * hidden), dh_all.dtype),
            jax.ShapeDtypeStruct((n, hidden), dh_all.dtype),
            jax.ShapeDtypeStruct((n, hidden), dh_all.dtype),
        ),
        in_specs=[
            rev_h, rev_h,
            pl.BlockSpec((1, n, 4 * hidden), lambda t: (f - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            rev_h,
            pl.BlockSpec((1, n, 1), lambda t: (f - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((hidden, 4 * hidden), lambda t: (0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(len(weights))
        ],
        out_specs=(
            pl.BlockSpec((1, n, 4 * hidden), lambda t: (f - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            const_h, const_h,
        ),
        interpret=interpret,
    )(dh_all, dc_all, gates_all, c_prev_all, mask_col, *weights)


# ---------------------------------------------------------------------------
# GSPMD batch-parallel rules: the train step is DP-sharded (train/loop.py),
# and an unannotated pallas_call under a sharded trace forces replication.
# Both sweeps are embarrassingly parallel over N.

@lru_cache(maxsize=None)
def _partitioned_fwd(hidden: int, interpret: bool, precision,
                     save_gates: bool = True):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    # HIGH takes the pre-split bf16 weight pair -> one extra replicated arg.
    n_weights = 2 if precision == lax.Precision.HIGH else 1

    def impl(x_proj, mask_col, *weights_and_state):
        return _pallas_fwd(x_proj, mask_col, *weights_and_state,
                           hidden=hidden, interpret=interpret,
                           precision=precision, save_gates=save_gates)

    outs = ("f n g, " if save_gates else "") + "f n h, f n h"
    w_terms = ", ".join(["h g"] * n_weights)
    rule = f"f n g, f n u, {w_terms}, n h, n h -> {outs}"
    fcp = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        b = _batch_axis(arg_shapes)
        st = NamedSharding(mesh, P(None, b, None))
        nb = NamedSharding(mesh, P(b, None))
        rep = NamedSharding(mesh, P())
        out_sh = (st, st, st) if save_gates else (st, st)
        return mesh, impl, out_sh, (st, st) + (rep,) * n_weights + (nb, nb)

    def infer(mesh, arg_shapes, result_shape):
        st = NamedSharding(mesh, P(None, _batch_axis(arg_shapes), None))
        return (st, st, st) if save_gates else (st, st)

    fcp.def_partition(partition=partition,
                      infer_sharding_from_operands=infer,
                      sharding_rule=rule)
    return fcp


@lru_cache(maxsize=None)
def _partitioned_bwd(hidden: int, interpret: bool, precision):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_weights = 2 if precision == lax.Precision.HIGH else 1

    def impl(dh_all, dc_all, gates_all, c_prev_all, mask_col, *weights):
        return _pallas_bwd(dh_all, dc_all, gates_all, c_prev_all, mask_col,
                           *weights, hidden=hidden, interpret=interpret,
                           precision=precision)

    w_terms = ", ".join(["i g"] * n_weights)
    rule = f"f n h, f n h, f n g, f n h, f n u, {w_terms} -> f n g, n h, n h"
    fcp = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        b = _batch_axis(arg_shapes)
        st = NamedSharding(mesh, P(None, b, None))
        nb = NamedSharding(mesh, P(b, None))
        rep = NamedSharding(mesh, P())
        return mesh, impl, (st, nb, nb), (st, st, st, st, st) + (rep,) * n_weights

    def infer(mesh, arg_shapes, result_shape):
        b = _batch_axis(arg_shapes)
        return (NamedSharding(mesh, P(None, b, None)),
                NamedSharding(mesh, P(b, None)),
                NamedSharding(mesh, P(b, None)))

    fcp.def_partition(partition=partition,
                      infer_sharding_from_operands=infer,
                      sharding_rule=rule)
    return fcp


# ---------------------------------------------------------------------------
# custom_vjp core: (x_proj, mask01, w_hh, h0, c0) -> (h_all, c_all).
# Everything differentiable OUTSIDE this core (the input projection, the
# mask multiply on outputs, final-state slices, downstream consumers) gets
# its gradient from XLA autodiff; the core supplies dx_proj/dw_hh/dh0/dc0.

def _weight_operands(w_hh, precision):
    """The kernel's resident-weight operands: the f32 block, or its bf16
    hi/lo split at HIGH (split OUTSIDE the kernel, once per trace; XLA CSEs
    the primal/fwd splits and the residual keeps only the f32 block)."""
    if precision == lax.Precision.HIGH:
        return _split_bf16(w_hh)
    return (w_hh,)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _lstm_core(x_proj, mask01, w_hh, h0, c0, hidden, interpret, precision):
    # Undifferentiated primal: skip the gate-preactivation residual stream
    # entirely (it only exists to feed the backward sweep).
    h_all, c_all = _partitioned_fwd(hidden, interpret, precision,
                                    save_gates=False)(
        x_proj, mask01[:, :, None], *_weight_operands(w_hh, precision), h0, c0)
    return h_all, c_all


def _lstm_core_fwd(x_proj, mask01, w_hh, h0, c0, hidden, interpret, precision):
    gates, h_all, c_all = _partitioned_fwd(hidden, interpret, precision)(
        x_proj, mask01[:, :, None], *_weight_operands(w_hh, precision), h0, c0)
    # Shifted carried states: step t's backward needs the step-(t-1) state.
    h_prev = jnp.concatenate([h0[None], h_all[:-1]])
    c_prev = jnp.concatenate([c0[None], c_all[:-1]])
    return (h_all, c_all), (gates, h_prev, c_prev, mask01, w_hh)


def _lstm_core_bwd(hidden, interpret, precision, res, cts):
    gates, h_prev, c_prev, mask01, w_hh = res
    dh_all, dc_all = cts
    dgates, dh0, dc0 = _partitioned_bwd(hidden, interpret, precision)(
        dh_all, dc_all, gates, c_prev, mask01[:, :, None],
        *_weight_operands(w_hh, precision))
    # The deferred weight gradient: one (H, F*N) x (F*N, 4H) MXU GEMM.
    dw_hh = jnp.einsum("fnh,fng->hg", h_prev, dgates, precision=precision)
    dx_proj = dgates
    return dx_proj, jnp.zeros_like(mask01), dw_hh, dh0, dc0


_lstm_core.defvjp(_lstm_core_fwd, _lstm_core_bwd)


def lstm_cell_train_pallas(cell: dict, x: jnp.ndarray, mask: jnp.ndarray,
                           h0: jnp.ndarray, c0: jnp.ndarray, *,
                           precision=lax.Precision.HIGHEST,
                           interpret: bool = False):
    """Differentiable drop-in for ``nn.layers._lstm_cell_scan``.

    One LSTM direction-layer over time with state frozen at masked steps;
    gradients flow to all cell params, the input, and the initial state.

    :param x: (F, N, I); :param mask: (F, N) 1.0 where valid.
    :return: (outputs (F, N, H) zeroed at masked steps, (hF, cF)).
    """
    hidden = cell["w_hh"].shape[0]
    # Input projection (+ both biases) outside the core: XLA autodiff
    # supplies dW_ih/db_ih/db_hh/dx through this one big GEMM.
    x_proj = jnp.matmul(x, cell["w_ih"], precision=precision) \
        + cell["b_ih"] + cell["b_hh"]
    h_all, c_all = _lstm_core(x_proj, mask, cell["w_hh"], h0, c0,
                              hidden, interpret, precision)
    outs = h_all * mask[:, :, None]
    return outs, (h_all[-1], c_all[-1])
