"""Weight-resident LSTM stack kernel (Pallas/TPU) + parity with the scan.

The latency wall of the flagship LGD-RNN forward is the init-RNN's serial
time scan (reference layers.py:146-153 runs the same recurrence in cuDNN).
Under ``lax.scan`` XLA re-streams every layer's gate weights from HBM on
every timestep: for the released 2x512 stack that is ~12 MB x 256 steps
~= 3 GB of HBM traffic — which at chip bandwidth is almost exactly the
measured ~4.4 ms scan time. The recurrence itself is tiny; the scan is
weight-reload-bound.

This kernel runs the WHOLE unidirectional stack recurrence in ONE Pallas
program: gate weights live in VMEM for all F steps (loaded once), the
running (h, c) carries live in the kernel's output blocks (constant index
map -> VMEM-resident until the grid ends), and only the hoisted layer-0
input projection x0_proj (one big MXU GEMM, computed outside) streams
through per-step grid blocks, auto-double-buffered by Pallas.

Semantics are identical to ``nn.layers._lstm_cell_scan`` applied layer by
layer: same gate order (i, f, g, o), same masked state freeze, same
zeroed outputs at padded steps, interleaved time-major instead of
layer-major — the same dataflow, cell for cell.

VMEM budget: (2L-1) weight matrices of (H, 4H) f32 + the streamed blocks.
For the released 2x512 stack that is ~12 MB (< ~16 MB/core); callers gate
on :func:`fits_vmem`.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Leave headroom for the streamed/output blocks and double buffering.
_VMEM_WEIGHT_BUDGET = 13 * 1024 * 1024


def fits_vmem(num_layers: int, hidden: int) -> bool:
    weight_bytes = (2 * num_layers - 1) * hidden * 4 * hidden * 4
    return weight_bytes <= _VMEM_WEIGHT_BUDGET


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def kernel_dot_precision(precision):
    """Mosaic (the Pallas TPU lowering) implements DEFAULT and HIGHEST dots
    but raises on HIGH (bf16_3x). Kernels that take a plain precision use
    this clamp for their non-HIGH modes; under HIGH every kernel family in
    this file (and the train pair) instead runs the explicit 3-pass bf16
    decomposition below, so the serial gate GEMMs pay 3 MXU passes — the
    cost the caller asked for — not HIGHEST's 6."""
    from jax import lax as _lax
    return _lax.Precision.HIGHEST if precision == _lax.Precision.HIGH else precision


def split_bf16(x):
    """Round-to-bf16 hi/lo split: x ~= hi + lo with one bf16 rounding each.
    The pair drives the same ``ah@bh + al@bh + ah@bl`` bf16_3x decomposition
    XLA lowers ``Precision.HIGH`` to (al@bl dropped)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def dot3(a, w_hi, w_lo, dn=(((1,), (0,)), ((), ()))):
    """3-pass bf16 emulation of an f32 ``Precision.HIGH`` dot against a
    pre-split weight (``split_bf16``); the activation splits per call."""
    a_hi, a_lo = split_bf16(a)
    return (lax.dot_general(a_hi, w_hi, dn, preferred_element_type=jnp.float32)
            + lax.dot_general(a_lo, w_hi, dn, preferred_element_type=jnp.float32)
            + lax.dot_general(a_hi, w_lo, dn, preferred_element_type=jnp.float32))


def _make_kernel(num_layers: int, hidden: int, precision):
    """Kernel body for a fixed (static) layer count.

    Ref order: x0_proj block, mask block, w_hh_all (f32, or bf16 hi/lo pair
    under HIGH), [w_ih_up (ditto), b_up,] h0s, c0s, then outputs outs
    block, hF, cF.
    """
    high3 = precision == lax.Precision.HIGH
    precision = kernel_dot_precision(precision)

    def kernel(x0_ref, m_ref, *rest):
        if high3:
            whh_hi_ref, whh_lo_ref, *rest = rest
        else:
            w_hh_ref, *rest = rest
        if num_layers > 1:
            if high3:
                wup_hi_ref, wup_lo_ref, b_up_ref, *rest = rest
            else:
                w_up_ref, b_up_ref, *rest = rest
        h0_ref, c0_ref, out_ref, hf_ref, cf_ref = rest

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            hf_ref[:] = h0_ref[:]
            cf_ref[:] = c0_ref[:]

        m = m_ref[0]  # (N, 1): 1.0 where this step is a valid frame
        prev_out = None
        for l in range(num_layers):
            if l == 0:
                x_in = x0_ref[0]  # (N, 4H), bias already folded in
            elif high3:
                x_in = dot3(prev_out, wup_hi_ref[l - 1],
                            wup_lo_ref[l - 1]) + b_up_ref[l - 1]
            else:
                x_in = jnp.dot(prev_out, w_up_ref[l - 1],
                               preferred_element_type=jnp.float32,
                               precision=precision) + b_up_ref[l - 1]
            h, c = hf_ref[l], cf_ref[l]
            if high3:
                rec = dot3(h, whh_hi_ref[l], whh_lo_ref[l])
            else:
                rec = jnp.dot(h, w_hh_ref[l],
                              preferred_element_type=jnp.float32,
                              precision=precision)
            gates = x_in + rec
            i = _sigmoid(gates[:, :hidden])
            f = _sigmoid(gates[:, hidden:2 * hidden])
            g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
            o = _sigmoid(gates[:, 3 * hidden:])
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            hf_ref[l] = jnp.where(m > 0, h_new, h)
            cf_ref[l] = jnp.where(m > 0, c_new, c)
            prev_out = h_new * m
        out_ref[0] = prev_out

    return kernel


try:  # import at module level so _make_kernel sees them
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover - pallas ships with jax
    _PALLAS_OK = False


def _pallas_forward(x0_proj, mask_col, w_hh_all, w_ih_up, b_up, h0s, c0s,
                    *, num_layers: int, hidden: int, interpret: bool, precision):
    f, n = x0_proj.shape[0], x0_proj.shape[1]
    high3 = precision == lax.Precision.HIGH
    kernel = _make_kernel(num_layers, hidden, precision)

    w_spec = pl.BlockSpec((num_layers, hidden, 4 * hidden),
                          lambda t: (0, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, n, 4 * hidden), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, 1), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x0_proj, mask_col]
    if high3:
        # Pre-split outside the kernel: the bf16 hi/lo pair replaces the f32
        # block at the SAME resident byte count (2+2 vs 4 per element), so
        # fits_vmem is precision-independent.
        in_specs += [w_spec, w_spec]
        args += list(split_bf16(w_hh_all))
    else:
        in_specs += [w_spec]
        args += [w_hh_all]
    if num_layers > 1:
        wup_spec = pl.BlockSpec((num_layers - 1, hidden, 4 * hidden),
                                lambda t: (0, 0, 0), memory_space=pltpu.VMEM)
        if high3:
            in_specs += [wup_spec, wup_spec]
            args += list(split_bf16(w_ih_up))
        else:
            in_specs += [wup_spec]
            args += [w_ih_up]
        in_specs += [
            pl.BlockSpec((num_layers - 1, 1, 4 * hidden),
                         lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
        ]
        args += [b_up]
    in_specs += [
        pl.BlockSpec((num_layers, n, hidden), lambda t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((num_layers, n, hidden), lambda t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [h0s, c0s]

    outs, hF, cF = pl.pallas_call(
        kernel,
        grid=(f,),
        out_shape=(
            jax.ShapeDtypeStruct((f, n, hidden), x0_proj.dtype),
            jax.ShapeDtypeStruct((num_layers, n, hidden), x0_proj.dtype),
            jax.ShapeDtypeStruct((num_layers, n, hidden), x0_proj.dtype),
        ),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, n, hidden), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            # Constant index map: the carry blocks stay VMEM-resident for
            # the whole grid and are flushed once at the end.
            pl.BlockSpec((num_layers, n, hidden), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, n, hidden), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(*args)
    return outs, hF, cF


# ---------------------------------------------------------------------------
# GSPMD integration: under a sharded trace (e.g. the DP multi-stream serving
# path, serve.py) an unannotated pallas_call would force full replication.
# custom_partitioning declares the kernel batch-parallel over the N axis —
# each device runs the whole-stack recurrence on its batch shard, which is
# exactly the DP semantics of the scan path it replaces.

def _batch_axis(arg_shapes):
    """The mesh axis the batch (dim 1 of x0_proj) is sharded over, if any."""
    spec = arg_shapes[0].sharding.spec
    return spec[1] if len(spec) > 1 else None


@lru_cache(maxsize=None)
def _partitioned_run(num_layers: int, hidden: int, interpret: bool, precision):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    has_up = num_layers > 1
    run = partial(_pallas_forward, num_layers=num_layers, hidden=hidden,
                  interpret=interpret, precision=precision)

    if has_up:
        def impl(x0_proj, mask_col, w_hh_all, w_ih_up, b_up, h0s, c0s):
            return run(x0_proj, mask_col, w_hh_all, w_ih_up, b_up, h0s, c0s)
        # x0_proj, mask, w_hh, w_ih_up, b_up, h0s, c0s -> outs, hF, cF.
        # Only the batch factor n is shared across the per-step tensors; the
        # weight stacks carry distinct factors so nothing propagates onto them.
        rule = ("f n g, f n u, l h g, m i j, m v k, l n h, l n h "
                "-> f n h, l n h, l n h")
        weight_args = (2, 3, 4)
    else:
        def impl(x0_proj, mask_col, w_hh_all, h0s, c0s):
            return run(x0_proj, mask_col, w_hh_all, None, None, h0s, c0s)
        rule = "f n g, f n u, l h g, l n h, l n h -> f n h, l n h, l n h"
        weight_args = (2,)

    fcp = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        batch = _batch_axis(arg_shapes)
        bsh = NamedSharding(mesh, P(None, batch, None))
        rep = NamedSharding(mesh, P())
        arg_shardings = tuple(
            rep if i in weight_args else bsh for i in range(len(arg_shapes)))
        return mesh, impl, (bsh, bsh, bsh), arg_shardings

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        bsh = NamedSharding(mesh, P(None, _batch_axis(arg_shapes), None))
        return (bsh, bsh, bsh)

    fcp.def_partition(partition=partition,
                      infer_sharding_from_operands=infer_sharding_from_operands,
                      sharding_rule=rule)
    return fcp


@partial(jax.jit, static_argnames=("num_layers", "hidden", "interpret", "precision"))
def _run(x0_proj, mask_col, w_hh_all, w_ih_up, b_up, h0s, c0s,
         *, num_layers: int, hidden: int, interpret: bool, precision):
    fcp = _partitioned_run(num_layers, hidden, interpret, precision)
    if num_layers > 1:
        return fcp(x0_proj, mask_col, w_hh_all, w_ih_up, b_up, h0s, c0s)
    return fcp(x0_proj, mask_col, w_hh_all, h0s, c0s)


def fits_vmem_bidi(hidden: int) -> bool:
    """Both directions' recurrent weights of ONE layer resident at once."""
    return 2 * hidden * 4 * hidden * 4 <= _VMEM_WEIGHT_BUDGET


# ---------------------------------------------------------------------------
# Wavefront (software-pipelined) weight-resident stack kernel.
#
# The straight stack kernel above runs layer l AFTER layer l-1 within each
# grid step, so one step's critical path is num_layers dependent
# gate-matmul chains (3 dependent MXU dots for the released 2x512 stack:
# layer-0 gates -> layer-1 input projection -> layer-1 gates). At small
# batch each dot is latency- not throughput-bound, so dependent dots add
# up. Here layer l processes time t-l instead (the same reorder as
# nn.layers._lstm_stack_scan_wavefront, where it is gated to large batch
# because the scan pays pipe-state shuffling through HBM each step — in a
# Pallas kernel the pipe lives in a VMEM-resident block, so the reorder is
# free). All per-step dots are then mutually independent, and because a
# deeper layer's input now comes from the PREVIOUS grid step, its input
# projection and gate matmul fuse into ONE dot against the concatenated
# [w_ih; w_hh] weight (same FLOPs, half the dispatches): per step exactly
# num_layers independent dots. Grid is F + L - 1 steps (fill/drain).


def _make_wavefront_kernel(num_layers: int, hidden: int, precision):
    """Ref order: x0_proj block (clamped index map — drain steps re-read the
    last row, fully masked), m_all block (per-layer shifted masks, zero
    where time t-l is out of range), w_hh0, w_cat (deeper layers'
    [w_ih; w_hh]), b_up, h0s, c0s, then outputs outs block, hF, cF, pipe
    (the VMEM-resident wavefront state). Under HIGH the two weight refs
    arrive as bf16 hi/lo pairs (pre-split outside)."""
    high3 = precision == lax.Precision.HIGH
    precision = kernel_dot_precision(precision)

    def kernel(x0_ref, m_ref, *rest):
        if high3:
            (whh0_hi_ref, whh0_lo_ref, wcat_hi_ref, wcat_lo_ref,
             b_up_ref, h0_ref, c0_ref,
             out_ref, hf_ref, cf_ref, pipe_ref) = rest
        else:
            (w_hh0_ref, w_cat_ref, b_up_ref, h0_ref, c0_ref,
             out_ref, hf_ref, cf_ref, pipe_ref) = rest
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            hf_ref[:] = h0_ref[:]
            cf_ref[:] = c0_ref[:]
            pipe_ref[:] = jnp.zeros_like(pipe_ref)

        # Read the wavefront state BEFORE overwriting: pipe[l-1] is layer
        # l-1's output from the previous grid step = layer l's input now.
        pipe = pipe_ref[:]
        outs = []
        for l in range(num_layers):
            m = m_ref[0, l]  # (N, 1): 1.0 iff time t-l is a valid frame
            h, c = hf_ref[l], cf_ref[l]
            if l == 0:
                if high3:
                    rec = dot3(h, whh0_hi_ref[:], whh0_lo_ref[:])
                else:
                    rec = jnp.dot(h, w_hh0_ref[:],
                                  preferred_element_type=jnp.float32,
                                  precision=precision)
                gates = x0_ref[0] + rec
            else:
                inp = jnp.concatenate([pipe[l - 1], h], axis=-1)  # (N, 2H)
                if high3:
                    gates = dot3(inp, wcat_hi_ref[l - 1],
                                 wcat_lo_ref[l - 1]) + b_up_ref[l - 1]
                else:
                    gates = jnp.dot(inp, w_cat_ref[l - 1],
                                    preferred_element_type=jnp.float32,
                                    precision=precision) + b_up_ref[l - 1]
            i = _sigmoid(gates[:, :hidden])
            f = _sigmoid(gates[:, hidden:2 * hidden])
            g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
            o = _sigmoid(gates[:, 3 * hidden:])
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            hf_ref[l] = jnp.where(m > 0, h_new, h)
            cf_ref[l] = jnp.where(m > 0, c_new, c)
            outs.append(h_new * m)
        for l in range(num_layers - 1):
            pipe_ref[l] = outs[l]
        # Steps t < L-1 write warmup zeros into block 0; step L-1 overwrites
        # it with the real time-0 output before the block is flushed.
        out_ref[0] = outs[-1]

    return kernel


def _pallas_wavefront(x0_proj, m_all, w_hh0, w_cat, b_up, h0s, c0s,
                      *, num_layers: int, hidden: int, interpret: bool,
                      precision):
    f, n = x0_proj.shape[0], x0_proj.shape[1]
    high3 = precision == lax.Precision.HIGH
    kernel = _make_wavefront_kernel(num_layers, hidden, precision)
    pad = num_layers - 1

    whh0_spec = pl.BlockSpec((hidden, 4 * hidden), lambda t: (0, 0),
                             memory_space=pltpu.VMEM)
    wcat_spec = pl.BlockSpec((max(pad, 1), 2 * hidden, 4 * hidden),
                             lambda t: (0, 0, 0), memory_space=pltpu.VMEM)
    if high3:
        weight_args = list(split_bf16(w_hh0)) + list(split_bf16(w_cat))
        weight_specs = [whh0_spec, whh0_spec, wcat_spec, wcat_spec]
    else:
        weight_args = [w_hh0, w_cat]
        weight_specs = [whh0_spec, wcat_spec]

    outs, hF, cF, _ = pl.pallas_call(
        kernel,
        grid=(f + pad,),
        out_shape=(
            jax.ShapeDtypeStruct((f, n, hidden), x0_proj.dtype),
            jax.ShapeDtypeStruct((num_layers, n, hidden), x0_proj.dtype),
            jax.ShapeDtypeStruct((num_layers, n, hidden), x0_proj.dtype),
            jax.ShapeDtypeStruct((max(pad, 1), n, hidden), x0_proj.dtype),
        ),
        in_specs=[
            # Clamped: drain steps (t >= F, layer 0 fully masked) re-read the
            # last row instead of running off the array.
            pl.BlockSpec((1, n, 4 * hidden),
                         lambda t: (jnp.minimum(t, f - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_layers, n, 1), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + weight_specs + [
            pl.BlockSpec((max(pad, 1), 1, 4 * hidden), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, n, hidden), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, n, hidden), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            # Clamped index map: warmup steps revisit block 0 (see kernel).
            pl.BlockSpec((1, n, hidden),
                         lambda t: (jnp.maximum(t - pad, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, n, hidden), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, n, hidden), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            # The wavefront pipe: VMEM-resident for the whole grid (constant
            # index map, the same carry trick as hF/cF); content discarded.
            pl.BlockSpec((max(pad, 1), n, hidden), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x0_proj, m_all, *weight_args, b_up, h0s, c0s)
    return outs, hF, cF


@lru_cache(maxsize=None)
def _partitioned_wavefront(num_layers: int, hidden: int, interpret: bool,
                           precision):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    run = partial(_pallas_wavefront, num_layers=num_layers, hidden=hidden,
                  interpret=interpret, precision=precision)

    def impl(x0_proj, m_all, w_hh0, w_cat, b_up, h0s, c0s):
        return run(x0_proj, m_all, w_hh0, w_cat, b_up, h0s, c0s)

    # Batch-parallel over n (dim 1 of x0_proj); weights replicated. m_all's
    # padded frame axis (f+L-1) differs from the true frame axis f, so it
    # carries its own factor p.
    rule = ("f n g, p l n u, h g, k v g, k o g, l n h, l n h "
            "-> f n h, l n h, l n h")
    weight_args = (2, 3, 4)
    fcp = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        batch = _batch_axis(arg_shapes)
        rep = NamedSharding(mesh, P())
        shardings = []
        for i, a in enumerate(arg_shapes):
            if i in weight_args:
                shardings.append(rep)
            else:
                spec = [None] * len(a.shape)
                spec[1 if i == 0 else (2 if i == 1 else 1)] = batch
                shardings.append(NamedSharding(mesh, P(*spec)))
        bsh = NamedSharding(mesh, P(None, batch, None))
        return mesh, impl, (bsh, bsh, bsh), tuple(shardings)

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        bsh = NamedSharding(mesh, P(None, _batch_axis(arg_shapes), None))
        return (bsh, bsh, bsh)

    fcp.def_partition(partition=partition,
                      infer_sharding_from_operands=infer_sharding_from_operands,
                      sharding_rule=rule)
    return fcp


@partial(jax.jit, static_argnames=("num_layers", "hidden", "interpret", "precision"))
def _run_wavefront(x0_proj, m_all, w_hh0, w_cat, b_up, h0s, c0s,
                   *, num_layers: int, hidden: int, interpret: bool, precision):
    fcp = _partitioned_wavefront(num_layers, hidden, interpret, precision)
    return fcp(x0_proj, m_all, w_hh0, w_cat, b_up, h0s, c0s)


def lstm_stack_pallas_wavefront(cells: List[dict], x: jnp.ndarray,
                                mask: jnp.ndarray, h0s: jnp.ndarray,
                                c0s: jnp.ndarray, *,
                                precision=lax.Precision.HIGHEST,
                                interpret: bool = False):
    """Wavefront weight-resident forward of a unidirectional LSTM stack.

    Same contract and semantics as :func:`lstm_stack_pallas` (identical
    outputs/finals — the same computation reordered so each grid step's
    matmuls are mutually independent; see the schedule notes above).
    Requires ``len(cells) >= 2`` — at one layer the schedules coincide, use
    :func:`lstm_stack_pallas`.

    VMEM: weight residency is the same (2L-1)*H*4H floats as
    :func:`lstm_stack_pallas` plus the (L-1, N, 2H) pipe block — callers
    must gate on :func:`fits_vmem` (with the same layer/hidden arguments)
    before selecting this schedule, exactly as nn/layers.py gates the
    sequential kernel.
    """
    L_n = len(cells)
    if L_n < 2:
        raise ValueError("wavefront schedule needs >= 2 layers "
                         "(use lstm_stack_pallas for a single layer)")
    hidden = cells[0]["w_hh"].shape[0]
    f, n = x.shape[0], x.shape[1]
    pad = L_n - 1

    x0_proj = jnp.matmul(x, cells[0]["w_ih"], precision=precision) \
        + cells[0]["b_ih"] + cells[0]["b_hh"]
    # m_all[t, l] = mask[t - l] when 0 <= t-l < F else 0: each layer's valid
    # mask at its wavefront time, precomputed so the kernel never indexes
    # dynamically.
    mask_col = mask[:, :, None].astype(x.dtype)          # (F, N, 1)
    zeros = jnp.zeros_like(mask_col[:1])
    m_all = jnp.stack([
        jnp.concatenate([jnp.tile(zeros, (l, 1, 1)), mask_col,
                         jnp.tile(zeros, (pad - l, 1, 1))])
        for l in range(L_n)], axis=1)                    # (F+pad, L, N, 1)

    w_hh0 = cells[0]["w_hh"]
    w_cat = jnp.stack([jnp.concatenate([cells[l]["w_ih"], cells[l]["w_hh"]])
                       for l in range(1, L_n)])          # (L-1, 2H, 4H)
    b_up = jnp.stack([(cells[l]["b_ih"] + cells[l]["b_hh"])[None]
                      for l in range(1, L_n)])           # (L-1, 1, 4H)

    outs, hF, cF = _run_wavefront(
        x0_proj, m_all, w_hh0, w_cat, b_up, h0s, c0s,
        num_layers=L_n, hidden=hidden, interpret=interpret,
        precision=precision)
    return outs, (hF, cF)


def _make_bidi_kernel(hidden: int, precision):
    """One bidirectional layer: the two directions are mutually independent,
    so both cell updates run inside the same grid step (two MXU dots per
    step instead of one — better systolic-array occupancy at small batch).
    The backward direction consumes the per-sample length-REVERSED input, so
    the single mask block serves both (valid frames are a prefix in both).
    Under HIGH the weight ref arrives as a bf16 hi/lo pair (pre-split)."""
    high3 = precision == lax.Precision.HIGH
    precision = kernel_dot_precision(precision)

    def kernel(xp_ref, m_ref, *rest):
        if high3:
            whh_hi_ref, whh_lo_ref, h0_ref, c0_ref, out_ref, hf_ref, cf_ref = rest
        else:
            w_hh_ref, h0_ref, c0_ref, out_ref, hf_ref, cf_ref = rest
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            hf_ref[:] = h0_ref[:]
            cf_ref[:] = c0_ref[:]

        m = m_ref[0]  # (N, 1): 1.0 where this step is a valid frame
        for d in range(2):  # static unroll: fwd, bwd
            x_in = xp_ref[0, d]  # (N, 4H), biases folded in
            h, c = hf_ref[d], cf_ref[d]
            if high3:
                rec = dot3(h, whh_hi_ref[d], whh_lo_ref[d])
            else:
                rec = jnp.dot(h, w_hh_ref[d],
                              preferred_element_type=jnp.float32,
                              precision=precision)
            gates = x_in + rec
            i = _sigmoid(gates[:, :hidden])
            f = _sigmoid(gates[:, hidden:2 * hidden])
            g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
            o = _sigmoid(gates[:, 3 * hidden:])
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            hf_ref[d] = jnp.where(m > 0, h_new, h)
            cf_ref[d] = jnp.where(m > 0, c_new, c)
            out_ref[0, d] = h_new * m

    return kernel


def _pallas_bidi(x_proj, mask_col, w_hh2, h02, c02,
                 *, hidden: int, interpret: bool, precision):
    f, n = x_proj.shape[0], x_proj.shape[2]
    high3 = precision == lax.Precision.HIGH
    kernel = _make_bidi_kernel(hidden, precision)
    w_spec = pl.BlockSpec((2, hidden, 4 * hidden), lambda t: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    weight_args = list(split_bf16(w_hh2)) if high3 else [w_hh2]
    outs, hF, cF = pl.pallas_call(
        kernel,
        grid=(f,),
        out_shape=(
            jax.ShapeDtypeStruct((f, 2, n, hidden), x_proj.dtype),
            jax.ShapeDtypeStruct((2, n, hidden), x_proj.dtype),
            jax.ShapeDtypeStruct((2, n, hidden), x_proj.dtype),
        ),
        in_specs=[
            pl.BlockSpec((1, 2, n, 4 * hidden), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [w_spec] * len(weight_args) + [
            pl.BlockSpec((2, n, hidden), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n, hidden), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 2, n, hidden), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # Constant index maps: carries stay VMEM-resident for the grid.
            pl.BlockSpec((2, n, hidden), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n, hidden), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x_proj, mask_col, *weight_args, h02, c02)
    return outs, hF, cF


@lru_cache(maxsize=None)
def _partitioned_bidi(hidden: int, interpret: bool, precision):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def impl(x_proj, mask_col, w_hh2, h02, c02):
        return _pallas_bidi(x_proj, mask_col, w_hh2, h02, c02,
                            hidden=hidden, interpret=interpret,
                            precision=precision)

    # Batch-parallel over n; the weight stack carries distinct factors.
    rule = "f d n g, f n u, e h g, d n h, d n h -> f d n h, d n h, d n h"
    fcp = custom_partitioning(impl)

    def batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[2] if len(spec) > 2 else None

    def partition(mesh, arg_shapes, result_shape):
        batch = batch_axis(arg_shapes)
        xsh = NamedSharding(mesh, P(None, None, batch, None))
        ssh = NamedSharding(mesh, P(None, batch, None))
        rep = NamedSharding(mesh, P())
        msh = NamedSharding(mesh, P(None, batch, None))
        return mesh, impl, (xsh, ssh, ssh), (xsh, msh, rep, ssh, ssh)

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        batch = batch_axis(arg_shapes)
        xsh = NamedSharding(mesh, P(None, None, batch, None))
        ssh = NamedSharding(mesh, P(None, batch, None))
        return (xsh, ssh, ssh)

    fcp.def_partition(partition=partition,
                      infer_sharding_from_operands=infer_sharding_from_operands,
                      sharding_rule=rule)
    return fcp


@partial(jax.jit, static_argnames=("hidden", "interpret", "precision"))
def _run_bidi(x_proj, mask_col, w_hh2, h02, c02,
              *, hidden: int, interpret: bool, precision):
    fcp = _partitioned_bidi(hidden, interpret, precision)
    return fcp(x_proj, mask_col, w_hh2, h02, c02)


def lstm_bidi_layer_pallas(cell_fwd: dict, cell_bwd: dict,
                           x_fwd: jnp.ndarray, x_bwd: jnp.ndarray,
                           mask: jnp.ndarray, h0: jnp.ndarray, c0: jnp.ndarray,
                           *, precision=lax.Precision.HIGHEST,
                           interpret: bool = False):
    """One bidirectional LSTM layer with both directions' recurrent weights
    VMEM-resident for the whole sweep (reference layers.py:146-153 runs the
    same bidirectional recurrence via cuDNN).

    Layers of a bidirectional stack cannot fuse into one program the way the
    unidirectional stack does — layer l+1's backward direction needs layer
    l's COMPLETE output sweep — so callers run one call per layer.

    :param x_fwd: (F, N, I) layer input; :param x_bwd: the same input
      per-sample length-reversed (valid prefix reversed in place), so
      ``mask`` (F, N) serves both directions.
    :param h0/c0: (2, N, H), [fwd, bwd].
    :return: (outs (F, 2, N, H) — backward outputs still in reversed time,
      (hF, cF) each (2, N, H)).
    """
    hidden = cell_fwd["w_hh"].shape[0]
    xp_f = jnp.matmul(x_fwd, cell_fwd["w_ih"], precision=precision) \
        + cell_fwd["b_ih"] + cell_fwd["b_hh"]
    xp_b = jnp.matmul(x_bwd, cell_bwd["w_ih"], precision=precision) \
        + cell_bwd["b_ih"] + cell_bwd["b_hh"]
    x_proj = jnp.stack([xp_f, xp_b], axis=1)        # (F, 2, N, 4H)
    w_hh2 = jnp.stack([cell_fwd["w_hh"], cell_bwd["w_hh"]])
    mask_col = mask[:, :, None].astype(x_fwd.dtype)
    outs, hF, cF = _run_bidi(x_proj, mask_col, w_hh2, h0, c0,
                             hidden=hidden, interpret=interpret,
                             precision=precision)
    return outs, (hF, cF)


def lstm_stack_pallas(cells: List[dict], x: jnp.ndarray, mask: jnp.ndarray,
                      h0s: jnp.ndarray, c0s: jnp.ndarray, *,
                      precision=lax.Precision.HIGHEST,
                      interpret: bool = False):
    """Weight-resident forward of a unidirectional LSTM stack.

    Same contract as ``nn.layers._lstm_stack_scan_wavefront``:
    :param cells: L cell dicts (w_ih, w_hh, b_ih, b_hh), layer 0 input I,
      deeper layers input H.
    :param x: (F, N, I); :param mask: (F, N); :param h0s/c0s: (L, N, H).
    :return: (outputs (F, N, H) of the last layer, (hF, cF) each (L, N, H)).
    """
    L_n = len(cells)
    hidden = cells[0]["w_hh"].shape[0]
    # Layer 0's input projection for ALL timesteps: one big MXU GEMM with
    # both biases folded in (identical to _lstm_cell_scan's hoisting).
    x0_proj = jnp.matmul(x, cells[0]["w_ih"], precision=precision) \
        + cells[0]["b_ih"] + cells[0]["b_hh"]
    mask_col = mask[:, :, None].astype(x.dtype)
    w_hh_all = jnp.stack([c["w_hh"] for c in cells])
    if L_n > 1:
        w_ih_up = jnp.stack([cells[l]["w_ih"] for l in range(1, L_n)])
        b_up = jnp.stack([(cells[l]["b_ih"] + cells[l]["b_hh"])[None]
                          for l in range(1, L_n)])
    else:
        w_ih_up = b_up = None
    outs, hF, cF = _run(x0_proj, mask_col, w_hh_all, w_ih_up, b_up, h0s, c0s,
                        num_layers=L_n, hidden=hidden, interpret=interpret,
                        precision=precision)
    return outs, (hF, cF)
