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

VMEM budget per kernel: one (H, 4H) f32 weight block + streamed step
blocks; under ``Precision.HIGH`` the kernels additionally keep the bf16
hi/lo splits of W_hh in VMEM scratch (8 bytes/element total instead of 4).
Callers gate on :func:`fits_vmem_layer`, which is precision-aware:
H <= ~900 at HIGHEST/DEFAULT (f32 block only), H <= ~640 at HIGH (f32 +
both bf16 scratch splits resident).
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

    Precision-aware: only ``Precision.HIGH`` allocates the bf16 hi/lo
    scratch splits next to the f32 block (4H^2 * (4 + 2 + 2) bytes);
    HIGHEST/DEFAULT keep just the f32 block (4H^2 * 4 bytes), so mid-size
    hidden sizes (~640 < H <= ~900) stay on the kernel there. ``None``
    (precision unknown at the call site) charges the conservative 8."""
    bytes_per_elt = 8 if precision in (None, lax.Precision.HIGH) else 4
    return hidden * 4 * hidden * bytes_per_elt <= _VMEM_WEIGHT_BUDGET


# ---------------------------------------------------------------------------
# In-kernel 3-pass bf16 emulation of ``lax.Precision.HIGH`` (shared
# split_bf16/dot3 helpers live in lstm_kernel.py). Mosaic raises on HIGH,
# and the old clamp to HIGHEST ran the serial gate GEMMs as 6-pass f32
# emulation — twice the MXU passes the caller asked to pay for. Here the
# splits of the RESIDENT weights happen once (t == 0, into bf16 VMEM
# scratch next to the f32 block; one direction-layer at a time, so the
# doubled residency still fits — fits_vmem_layer accounts for it). The
# fwd-only kernels in lstm_kernel.py keep (2L-1) matrices resident at
# once, so they instead take pre-split bf16 pairs REPLACING the f32
# block at equal bytes. Only the small per-step activation split is paid
# every step.

# ---------------------------------------------------------------------------
# Forward sweep: carried states in VMEM scratch, W_hh resident, per-step
# streams: x_proj in; gate preactivations + carried (h, c) out.

def _make_fwd_kernel(hidden: int, precision, save_gates: bool):
    high3 = precision == lax.Precision.HIGH
    precision = kernel_dot_precision(precision)
    def kernel(xp_ref, m_ref, whh_ref, h0_ref, c0_ref, *rest):
        if high3:
            *rest, whi_s, wlo_s = rest
        if save_gates:
            g_ref, h_ref, c_ref, h_s, c_s = rest
        else:
            h_ref, c_ref, h_s, c_s = rest
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h_s[:] = h0_ref[:]
            c_s[:] = c0_ref[:]
            if high3:  # weight splits once, resident for all F steps
                hi, lo = _split_bf16(whh_ref[:])
                whi_s[:] = hi
                wlo_s[:] = lo

        m = m_ref[0]  # (N, 1)
        h, c = h_s[:], c_s[:]
        if high3:
            rec = _dot3(h, whi_s[:], wlo_s[:])
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


def _pallas_fwd(x_proj, mask_col, w_hh, h0, c0,
                *, hidden: int, interpret: bool, precision,
                save_gates: bool = True):
    f, n = x_proj.shape[0], x_proj.shape[1]
    kernel = _make_fwd_kernel(hidden, precision, save_gates)
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
            pl.BlockSpec((hidden, 4 * hidden), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
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
        ] + ([pltpu.VMEM((hidden, 4 * hidden), jnp.bfloat16),
              pltpu.VMEM((hidden, 4 * hidden), jnp.bfloat16)]
             if precision == lax.Precision.HIGH else []),
        interpret=interpret,
    )(x_proj, mask_col, w_hh, h0, c0)


# ---------------------------------------------------------------------------
# Backward sweep (reverse time): cotangent carries live in the dh0/dc0
# output blocks (constant index maps), W_hh resident; streams dh/dc
# cotangents + saved gates/c_prev in, dgates out.

def _make_bwd_kernel(hidden: int, precision):
    high3 = precision == lax.Precision.HIGH
    precision = kernel_dot_precision(precision)
    def kernel(dh_ref, dc_ref, g_ref, cp_ref, m_ref, whh_ref,
               dg_ref, dh0_ref, dc0_ref, *scr):
        # The dh0/dc0 output blocks have constant index maps (VMEM-resident
        # for the whole grid), so they double as the reverse-sweep cotangent
        # carries — same pattern as the forward kernels' hf/cf blocks.
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dh0_ref[:] = jnp.zeros_like(dh0_ref[:])
            dc0_ref[:] = jnp.zeros_like(dc0_ref[:])
            if high3:
                hi, lo = _split_bf16(whh_ref[:])
                scr[0][:] = hi
                scr[1][:] = lo

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
            back = _dot3(dgates, scr[0][:], scr[1][:],
                         dn=(((1,), (1,)), ((), ())))
        else:
            back = lax.dot_general(
                dgates, whh_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)
        dh0_ref[:] = back + Dh * (1.0 - m)
        dc0_ref[:] = dc_new * f + Dc * (1.0 - m)

    return kernel


def _pallas_bwd(dh_all, dc_all, gates_all, c_prev_all, mask_col, w_hh,
                *, hidden: int, interpret: bool, precision):
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
            pl.BlockSpec((hidden, 4 * hidden), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, 4 * hidden), lambda t: (f - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            const_h, const_h,
        ),
        scratch_shapes=([pltpu.VMEM((hidden, 4 * hidden), jnp.bfloat16),
                         pltpu.VMEM((hidden, 4 * hidden), jnp.bfloat16)]
                        if precision == lax.Precision.HIGH else []),
        interpret=interpret,
    )(dh_all, dc_all, gates_all, c_prev_all, mask_col, w_hh)


# ---------------------------------------------------------------------------
# GSPMD batch-parallel rules: the train step is DP-sharded (train/loop.py),
# and an unannotated pallas_call under a sharded trace forces replication.
# Both sweeps are embarrassingly parallel over N.

@lru_cache(maxsize=None)
def _partitioned_fwd(hidden: int, interpret: bool, precision,
                     save_gates: bool = True):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def impl(x_proj, mask_col, w_hh, h0, c0):
        return _pallas_fwd(x_proj, mask_col, w_hh, h0, c0, hidden=hidden,
                           interpret=interpret, precision=precision,
                           save_gates=save_gates)

    outs = ("f n g, " if save_gates else "") + "f n h, f n h"
    rule = f"f n g, f n u, h g, n h, n h -> {outs}"
    fcp = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        b = _batch_axis(arg_shapes)
        st = NamedSharding(mesh, P(None, b, None))
        nb = NamedSharding(mesh, P(b, None))
        rep = NamedSharding(mesh, P())
        out_sh = (st, st, st) if save_gates else (st, st)
        return mesh, impl, out_sh, (st, st, rep, nb, nb)

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

    def impl(dh_all, dc_all, gates_all, c_prev_all, mask_col, w_hh):
        return _pallas_bwd(dh_all, dc_all, gates_all, c_prev_all, mask_col,
                           w_hh, hidden=hidden, interpret=interpret,
                           precision=precision)

    rule = "f n h, f n h, f n g, f n h, f n u, i g -> f n g, n h, n h"
    fcp = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        b = _batch_axis(arg_shapes)
        st = NamedSharding(mesh, P(None, b, None))
        nb = NamedSharding(mesh, P(b, None))
        rep = NamedSharding(mesh, P())
        return mesh, impl, (st, nb, nb), (st, st, st, st, st, rep)

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

@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _lstm_core(x_proj, mask01, w_hh, h0, c0, hidden, interpret, precision):
    # Undifferentiated primal: skip the gate-preactivation residual stream
    # entirely (it only exists to feed the backward sweep).
    h_all, c_all = _partitioned_fwd(hidden, interpret, precision,
                                    save_gates=False)(
        x_proj, mask01[:, :, None], w_hh, h0, c0)
    return h_all, c_all


def _lstm_core_fwd(x_proj, mask01, w_hh, h0, c0, hidden, interpret, precision):
    gates, h_all, c_all = _partitioned_fwd(hidden, interpret, precision)(
        x_proj, mask01[:, :, None], w_hh, h0, c0)
    # Shifted carried states: step t's backward needs the step-(t-1) state.
    h_prev = jnp.concatenate([h0[None], h_all[:-1]])
    c_prev = jnp.concatenate([c0[None], c_all[:-1]])
    return (h_all, c_all), (gates, h_prev, c_prev, mask01, w_hh)


def _lstm_core_bwd(hidden, interpret, precision, res, cts):
    gates, h_prev, c_prev, mask01, w_hh = res
    dh_all, dc_all = cts
    dgates, dh0, dc0 = _partitioned_bwd(hidden, interpret, precision)(
        dh_all, dc_all, gates, c_prev, mask01[:, :, None], w_hh)
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
