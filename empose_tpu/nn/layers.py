"""Layer library: Linear / BatchNorm / PReLU / MLP / residual blocks / LSTM.

Functional re-design of the reference layer library (reference:
empose/nn/layers.py:13-183). Every layer is a pair of pure functions
``*_init(key, ...) -> (params, state)`` and ``*_apply(params, state, x, ...)
-> (y, new_state)`` over plain-dict pytrees.

Parameter layout convention: weights are stored TRANSPOSED relative to torch
(``w`` is (in, out) so the forward pass is ``x @ w + b``), LSTM gate order is
torch's (i, f, g, o), and BatchNorm keeps torch's running-stat semantics —
this makes the torch ``.pth`` checkpoint bridge (empose_tpu/checkpoint) a pure
transpose-and-rename, with zero re-layout ambiguity.

The LSTM is a masked ``lax.scan`` reproducing torch's
``pack_padded_sequence(enforce_sorted=False)`` semantics (reference
layers.py:146-153): padded frames never update the recurrent state, outputs at
padded frames are zero, and the reverse direction of a bidirectional LSTM runs
over the true lengths only (per-sample time reversal, not a naive flip).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Matmul precision for the NN layers (linear/MLP/LSTM gate GEMMs). HIGHEST
# keeps f32-on-MXU parity with the f64 torch reference (~5e-5); DEFAULT runs
# the MXU in bf16-input mode — measured +32% latency / +50% throughput on
# the flagship with a sub-0.03mm MPJPE shift (see README). Kinematics
# (ops/, bodymodel/) are NOT governed by this knob — their precision is
# pinned where they live (the lane-major FK GEMMs have their own opt-in
# knob, ops/fk_lanes.set_fk_precision). Env default EMPOSE_NN_PRECISION,
# or call set_nn_precision() before (re)tracing.
import os as _os_prec

from empose_tpu.utils.precision import resolve as _resolve_precision

_HI = _resolve_precision(_os_prec.environ.get("EMPOSE_NN_PRECISION", "highest"))


def set_nn_precision(name: str) -> None:
    """Switch the NN-layer matmul precision for functions traced AFTER this
    call (precision binds at trace time; already-jitted programs keep
    theirs). Caveat: jax.jit's trace cache is keyed on the callable, so
    re-jitting the SAME function object after switching silently reuses the
    old trace — jit a fresh closure per precision."""
    global _HI
    _HI = _resolve_precision(name)

Params = Dict
State = Dict

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def linear_init(key, in_size: int, out_size: int) -> Params:
    """Torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for w and b."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_size)
    return {
        "w": jax.random.uniform(k1, (in_size, out_size), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (out_size,), jnp.float32, -bound, bound),
    }


def linear_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(x, params["w"], precision=_HI) + params["b"]


def batch_norm_init(key, size: int, uniform_weight: bool = True) -> Tuple[Params, State]:
    """BatchNorm1d; the reference uniform-initializes bn.weight (layers.py:26-27)."""
    scale = jax.random.uniform(key, (size,), jnp.float32) if uniform_weight else jnp.ones((size,), jnp.float32)
    params = {"scale": scale, "bias": jnp.zeros((size,), jnp.float32)}
    state = {"mean": jnp.zeros((size,), jnp.float32), "var": jnp.ones((size,), jnp.float32)}
    return params, state


# --- custom-VJP train-mode BatchNorm core ----------------------------------
# XLA's autodiff of the two-pass (mean, then var) stats formulation emits a
# multi-pass pullback with several full-size intermediates; at the training
# shapes (16k+ rows x 512 features, 5 BN sites per MLP) those HBM passes
# dominate the MLP backward. The analytic BN gradient needs ONE fused
# reduction pass (S1 = sum dy, S2 = sum dy*xhat) plus ONE elementwise pass:
#
#   dx_i = scale*r * (dy_i - m_i/c * (S1 + xhat_i * S2))      r = rsqrt(var+eps)
#   dscale = S2, dbias = S1
#
# where S1/S2 run over ALL rows (every row's output depends on the stats) and
# m_i/c gates the stats feedback to rows that contributed to them. The
# forward computes the stats in one read of x, shifted by the RUNNING mean
# (see _one_pass_stats) — numerically equivalent to the two-pass
# formulation up to f32 rounding, not bitwise.
# ``scale``/``bias`` arrive keepdims-broadcast-shaped so the same core serves
# both the (rows, H) layout of ``batch_norm_apply`` and the per-net (2, B, H)
# layout of ``_stacked_bn``; ``axes`` (static) are the reduction axes.

from functools import partial as _partial


def _bn_stats_contribution(x, mean, ct_mean, ct_var, inv, mw=None):
    """Pullback of the returned (mean, biased var) outputs into dx — the
    running-stat update consumes them, so their cotangents (normally zero:
    the optimizer never differentiates through carried state) must still be
    routed: d mean/dx_i = m_i/c, d var/dx_i = m_i * 2(x_i - mean)/c."""
    contrib = inv * ct_mean + (2.0 * inv) * (x - mean) * ct_var
    return contrib if mw is None else mw * contrib


def _one_pass_stats(x, axes, m0):
    """mean and biased var in ONE read of x: the E[x-m0] and E[(x-m0)^2]
    reductions are independent, so XLA fuses them into a single multi-output
    pass (the textbook two-pass var needs a second read after mean resolves).
    ``m0`` is the RUNNING mean (a stop-gradient constant that cancels out of
    both results exactly): shifting makes the one-pass cancellation error
    ~|batch_mean - m0|^2 * 2^-24 — negligible once the running stat tracks
    the batch stat, and exactly the unshifted formula at init (m0 == 0) —
    instead of ~|mean|^2 * 2^-24, which is catastrophic for a channel whose
    mean dwarfs its spread. Clamped at 0 for safety.

    Early-step regime (m0 == 0, accepted + pinned by
    test_bn_one_pass_stats_step0_regime): BN inputs here are post-Linear
    activations with torch-uniform init, so |batch mean| stays O(10) while
    the spread is O(1) — the unshifted cancellation error is then
    <= |mean|^2 * 2^-24 ~ 1e-5 absolute on var, invisible next to BN_EPS.
    The pathological |mean|^2/var ~ 1e8 channels only emerge once running
    stats exist to shift by."""
    xc = x - m0
    d = jnp.mean(xc, axis=axes, keepdims=True)
    d_sq = jnp.mean(jnp.square(xc), axis=axes, keepdims=True)
    var = jnp.maximum(d_sq - jnp.square(d), 0.0)
    return m0 + d, var


@_partial(jax.custom_vjp, nondiff_argnums=(0,))
def _bn_core(axes, x, scale, bias, m0):
    mean, var = _one_pass_stats(x, axes, m0)
    y = (x - mean) * lax.rsqrt(var + BN_EPS) * scale + bias
    return y, mean, var


def _bn_core_fwd(axes, x, scale, bias, m0):
    mean, var = _one_pass_stats(x, axes, m0)
    y = (x - mean) * lax.rsqrt(var + BN_EPS) * scale + bias
    return (y, mean, var), (x, scale, mean, var)


def _bn_core_bwd(axes, res, cts):
    x, scale, mean, var = res
    dy, ct_mean, ct_var = cts
    count = 1
    for a in axes:
        count *= x.shape[a]
    inv = 1.0 / count
    r = lax.rsqrt(var + BN_EPS)
    xhat = (x - mean) * r
    S1 = jnp.sum(dy, axis=axes, keepdims=True)
    S2 = jnp.sum(dy * xhat, axis=axes, keepdims=True)
    dx = (scale * r) * (dy - inv * (S1 + xhat * S2)) \
        + _bn_stats_contribution(x, mean, ct_mean, ct_var, inv)
    # The m0 shift cancels out of mean and var exactly, so its true
    # derivative is zero (it is carried state anyway, never differentiated).
    return dx, S2, S1, jnp.zeros_like(mean)


_bn_core.defvjp(_bn_core_fwd, _bn_core_bwd)


def _one_pass_stats_masked(x, axes, mw, m0):
    """Masked one-pass stats (see _one_pass_stats for the m0 shift):
    sum((x-m0)*m) and sum((x-m0)^2*m) fuse into a single read; padded rows
    carry m == 0 and contribute exactly zero, preserving the DP-padding
    exactness contract (m0 is constant over the reduced axes, so the shift
    cancels out of the masked mean the same way)."""
    count = jnp.maximum(jnp.sum(mw), 1.0)
    xc = x - m0
    d = jnp.sum(xc * mw, axis=axes, keepdims=True) / count
    d_sq = jnp.sum(jnp.square(xc) * mw, axis=axes, keepdims=True) / count
    var = jnp.maximum(d_sq - jnp.square(d), 0.0)
    return m0 + d, var, count


@_partial(jax.custom_vjp, nondiff_argnums=(0,))
def _bn_core_masked(axes, x, scale, bias, mw, m0):
    mean, var, _ = _one_pass_stats_masked(x, axes, mw, m0)
    y = (x - mean) * lax.rsqrt(var + BN_EPS) * scale + bias
    return y, mean, var


def _bn_core_masked_fwd(axes, x, scale, bias, mw, m0):
    mean, var, count = _one_pass_stats_masked(x, axes, mw, m0)
    y = (x - mean) * lax.rsqrt(var + BN_EPS) * scale + bias
    return (y, mean, var), (x, scale, mean, var, mw, count)


def _bn_core_masked_bwd(axes, res, cts):
    x, scale, mean, var, mw, count = res
    dy, ct_mean, ct_var = cts
    inv = 1.0 / count
    r = lax.rsqrt(var + BN_EPS)
    xhat = (x - mean) * r
    S1 = jnp.sum(dy, axis=axes, keepdims=True)
    S2 = jnp.sum(dy * xhat, axis=axes, keepdims=True)
    dx = (scale * r) * (dy - mw * (inv * (S1 + xhat * S2))) \
        + _bn_stats_contribution(x, mean, ct_mean, ct_var, inv, mw)
    # The mask derives from integer seq_lengths — nothing differentiates it;
    # the m0 shift cancels out of mean and var exactly (zero derivative).
    return dx, S2, S1, jnp.zeros_like(mw), jnp.zeros_like(mean)


_bn_core_masked.defvjp(_bn_core_masked_fwd, _bn_core_masked_bwd)


def batch_norm_apply(params: Params, state: State, x: jnp.ndarray, train: bool,
                     mask: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, State]:
    """Torch semantics: biased variance for normalization, unbiased for the
    running stat; running = (1 - m) * running + m * batch.

    ``mask`` (optional, shape == x rows, 1.0 where valid): train-mode batch
    statistics are computed over VALID rows only. The reference includes
    padded frames in its BN stats (models flatten (N, F, D) -> (N*F, D)
    straight into BatchNorm1d, reference models.py:202/320/520) — a padding
    artifact, identical to this path whenever windows are full. Masking is
    what makes batch-axis DP padding exact: zero-length pad samples carry
    zero mask and leave the statistics untouched (parallel/mesh.py).
    """
    if train:
        axes = tuple(range(x.ndim - 1))
        shp = (1,) * (x.ndim - 1) + (-1,)
        scale_b = params["scale"].reshape(shp)
        bias_b = params["bias"].reshape(shp)
        # Running mean as the one-pass variance shift (see _one_pass_stats).
        m0 = lax.stop_gradient(state["mean"]).reshape(shp)
        if mask is None:
            y, mean_k, var_k = _bn_core(axes, x, scale_b, bias_b, m0)
            count = x.size // x.shape[-1]
            unbiased = var_k.reshape(-1) * (count / max(count - 1, 1))
        else:
            m = mask.reshape(x.shape[:-1] + (1,)).astype(x.dtype)
            count = jnp.maximum(jnp.sum(m), 1.0)
            y, mean_k, var_k = _bn_core_masked(axes, x, scale_b, bias_b, m, m0)
            unbiased = var_k.reshape(-1) * (count / jnp.maximum(count - 1.0, 1.0))
        new_state = {
            "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean_k.reshape(-1),
            "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
        }
        return y, new_state
    mean, var = state["mean"], state["var"]
    y = (x - mean) * lax.rsqrt(var + BN_EPS) * params["scale"] + params["bias"]
    return y, state


def prelu_init(key) -> Params:
    return {"alpha": jnp.full((1,), 0.25, jnp.float32)}


def prelu_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, params["alpha"] * x)


def dropout_apply(x: jnp.ndarray, p: float, train: bool, key) -> jnp.ndarray:
    if not train or p <= 0.0 or key is None:
        return x
    keep = 1.0 - p
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# LinearLayers: [Linear -> BN? -> PReLU -> Dropout] x n (+ optional input skip)
# Reference: layers.py:13-43.
# ---------------------------------------------------------------------------

def linear_layers_init(key, hidden_size: int, num_layers: int = 2, use_batch_norm: bool = True):
    params, state = {"blocks": []}, {"blocks": []}
    for i in range(num_layers):
        key, k_lin, k_bn, k_pr = jax.random.split(key, 4)
        block_p = {"linear": linear_init(k_lin, hidden_size, hidden_size), "prelu": prelu_init(k_pr)}
        block_s = {}
        if use_batch_norm:
            block_p["bn"], block_s["bn"] = batch_norm_init(k_bn, hidden_size)
        params["blocks"].append(block_p)
        state["blocks"].append(block_s)
    return params, state


def linear_layers_apply(params, state, x, *, use_skip: bool, dropout_p: float = 0.0,
                        train: bool = False, key=None, bn_mask=None):
    y = x
    new_blocks = []
    for i, (bp, bs) in enumerate(zip(params["blocks"], state["blocks"])):
        y = linear_apply(bp["linear"], y)
        nbs = {}
        if "bn" in bp:
            y, nbs["bn"] = batch_norm_apply(bp["bn"], bs["bn"], y, train, bn_mask)
        y = prelu_apply(bp["prelu"], y)
        if dropout_p > 0.0 and train and key is not None:
            key, sub = jax.random.split(key)
            y = dropout_apply(y, dropout_p, train, sub)
        new_blocks.append(nbs)
    out = x + y if use_skip else y
    return out, {"blocks": new_blocks}


# ---------------------------------------------------------------------------
# MLP: in-proj -> BN? -> PReLU -> Dropout -> LinearLayers x n -> out-proj
# Reference: layers.py:46-77.
# ---------------------------------------------------------------------------

def mlp_init(key, input_size: int, output_size: int, hidden_size: int, num_layers: int = 2,
             use_batch_norm: bool = True):
    k_in, k_bn, k_pr, k_hidden, k_out = jax.random.split(key, 5)
    params = {
        "input_to_hidden": linear_init(k_in, input_size, hidden_size),
        "prelu": prelu_init(k_pr),
        "hidden_to_output": linear_init(k_out, hidden_size, output_size),
    }
    state = {}
    if use_batch_norm:
        params["bn"], state["bn"] = batch_norm_init(k_bn, hidden_size)
    hp, hs = [], []
    for i in range(num_layers):
        k_hidden, sub = jax.random.split(k_hidden)
        p, s = linear_layers_init(sub, hidden_size, num_layers=2, use_batch_norm=use_batch_norm)
        hp.append(p)
        hs.append(s)
    params["hidden_layers"] = hp
    state["hidden_layers"] = hs
    return params, state


def mlp_apply(params, state, x, *, skip_connection: bool = False, dropout_p: float = 0.0,
              train: bool = False, key=None, bn_mask=None):
    y = linear_apply(params["input_to_hidden"], x)
    new_state = {}
    if "bn" in params:
        y, new_state["bn"] = batch_norm_apply(params["bn"], state["bn"], y, train, bn_mask)
    y = prelu_apply(params["prelu"], y)
    if dropout_p > 0.0 and train and key is not None:
        key, sub = jax.random.split(key)
        y = dropout_apply(y, dropout_p, train, sub)
    new_hidden = []
    for hp, hs in zip(params["hidden_layers"], state["hidden_layers"]):
        if key is not None:
            key, sub = jax.random.split(key)
        else:
            sub = None
        y, ns = linear_layers_apply(hp, hs, y, use_skip=skip_connection, dropout_p=dropout_p,
                                    train=train, key=sub, bn_mask=bn_mask)
        new_hidden.append(ns)
    new_state["hidden_layers"] = new_hidden
    y = linear_apply(params["hidden_to_output"], y)
    return y, new_state


# ---------------------------------------------------------------------------
# Pair-fused applies: two same-shaped nets reading the SAME input run as one
# stacked batched GEMM chain (TPU-only optimization; the LGD model applies a
# pose net and a shape net to identical features at every step, reference
# models.py:433-447/548-600 — two separate small matmul chains there). The
# fused path is numerically identical to two independent applies: each batched
# GEMM slice sees the same operands, BN stats are per-net, and dropout draws
# the same per-net key streams as ``mlp_apply``. Checkpoints are untouched —
# weights stay per-net in the pytree and are stacked at apply time.
# ---------------------------------------------------------------------------

def linear_pair_apply(params_a: Params, params_b: Params, x: jnp.ndarray):
    """Two linears over the same input as ONE matmul (concat on out-dim)."""
    w = jnp.concatenate([params_a["w"], params_b["w"]], axis=1)
    b = jnp.concatenate([params_a["b"], params_b["b"]], axis=0)
    y = jnp.matmul(x, w, precision=_HI) + b
    na = params_a["w"].shape[1]
    return y[..., :na], y[..., na:]


def _stacked_linear(params_a: Params, params_b: Params, y: jnp.ndarray) -> jnp.ndarray:
    """Batched GEMM over a (2, B, I) stacked activation."""
    w = jnp.stack([params_a["w"], params_b["w"]])  # (2, I, O)
    b = jnp.stack([params_a["b"], params_b["b"]])  # (2, O)
    return jnp.einsum("kbi,kio->kbo", y, w, precision=_HI) + b[:, None]


def _stacked_bn(params_a, params_b, state_a, state_b, y, train, mask=None):
    scale = jnp.stack([params_a["scale"], params_b["scale"]])[:, None]
    bias = jnp.stack([params_a["bias"], params_b["bias"]])[:, None]
    if train:
        # Running means as the one-pass variance shift (see _one_pass_stats).
        m0 = lax.stop_gradient(jnp.stack([state_a["mean"], state_b["mean"]]))[:, None]
        if mask is None:
            out, mean, var = _bn_core((1,), y, scale, bias, m0)  # (2, 1, H) per-net stats
            count = y.shape[1]
            unbiased = var * (count / max(count - 1, 1))
        else:
            m = mask.reshape(1, -1, 1).astype(y.dtype)  # (1, B, 1)
            count = jnp.maximum(jnp.sum(m), 1.0)
            out, mean, var = _bn_core_masked((1,), y, scale, bias, m, m0)
            unbiased = var * (count / jnp.maximum(count - 1.0, 1.0))
        def upd(state, m, v):
            return {"mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * m,
                    "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * v}
        new_a = upd(state_a, mean[0, 0], unbiased[0, 0])
        new_b = upd(state_b, mean[1, 0], unbiased[1, 0])
        return out, new_a, new_b
    mean = jnp.stack([state_a["mean"], state_b["mean"]])[:, None]
    var = jnp.stack([state_a["var"], state_b["var"]])[:, None]
    return (y - mean) * lax.rsqrt(var + BN_EPS) * scale + bias, state_a, state_b


def _stacked_prelu(params_a, params_b, y):
    alpha = jnp.stack([params_a["alpha"], params_b["alpha"]])[:, None]  # (2,1,1)
    return jnp.where(y >= 0, y, alpha * y)


def _stacked_dropout(y, p, train, key_a, key_b):
    """Per-net masks drawn from the SAME key streams as the unfused path.

    A ``None`` key disables dropout entirely (matching ``mlp_apply``'s skip);
    the two keys always co-occur at the call sites.
    """
    if not train or p <= 0.0 or key_a is None or key_b is None:
        return y, key_a, key_b
    keep = 1.0 - p
    key_a, sub_a = jax.random.split(key_a)
    key_b, sub_b = jax.random.split(key_b)
    shape = y.shape[1:]
    masks = jnp.stack([jax.random.bernoulli(sub_a, keep, shape),
                       jax.random.bernoulli(sub_b, keep, shape)])
    return jnp.where(masks, y / keep, 0.0), key_a, key_b


def mlp_pair_apply(params_a, params_b, state_a, state_b, x, *,
                   skip_connection: bool = False, dropout_p: float = 0.0,
                   train: bool = False, key_a=None, key_b=None, bn_mask=None):
    """Two ``mlp_apply``s over the same input ``x`` as stacked batched GEMMs.

    Requires identical input/hidden sizes and layer counts (the LGD pose/shape
    nets satisfy this by construction, reference models.py:433-447); output
    sizes may differ — the final projections run as one concat-fused matmul.
    Returns ``(y_a, y_b, new_state_a, new_state_b)``.
    """
    y = _stacked_linear(params_a["input_to_hidden"], params_b["input_to_hidden"],
                        jnp.broadcast_to(x[None], (2,) + x.shape))
    new_a, new_b = {}, {}
    if "bn" in params_a:
        y, new_a["bn"], new_b["bn"] = _stacked_bn(
            params_a["bn"], params_b["bn"], state_a["bn"], state_b["bn"], y, train, bn_mask)
    y = _stacked_prelu(params_a["prelu"], params_b["prelu"], y)
    if dropout_p > 0.0 and train:
        y, key_a, key_b = _stacked_dropout(y, dropout_p, train, key_a, key_b)

    hidden_a, hidden_b = [], []
    for hp_a, hp_b, hs_a, hs_b in zip(params_a["hidden_layers"], params_b["hidden_layers"],
                                      state_a["hidden_layers"], state_b["hidden_layers"]):
        sub_a = sub_b = None
        if key_a is not None:
            key_a, sub_a = jax.random.split(key_a)
        if key_b is not None:
            key_b, sub_b = jax.random.split(key_b)
        y_in = y
        blocks_a, blocks_b = [], []
        for bp_a, bp_b, bs_a, bs_b in zip(hp_a["blocks"], hp_b["blocks"],
                                          hs_a["blocks"], hs_b["blocks"]):
            y = _stacked_linear(bp_a["linear"], bp_b["linear"], y)
            nbs_a, nbs_b = {}, {}
            if "bn" in bp_a:
                y, nbs_a["bn"], nbs_b["bn"] = _stacked_bn(
                    bp_a["bn"], bp_b["bn"], bs_a["bn"], bs_b["bn"], y, train, bn_mask)
            y = _stacked_prelu(bp_a["prelu"], bp_b["prelu"], y)
            if dropout_p > 0.0 and train:
                y, sub_a, sub_b = _stacked_dropout(y, dropout_p, train, sub_a, sub_b)
            blocks_a.append(nbs_a)
            blocks_b.append(nbs_b)
        if skip_connection:
            y = y_in + y
        hidden_a.append({"blocks": blocks_a})
        hidden_b.append({"blocks": blocks_b})
    new_a["hidden_layers"] = hidden_a
    new_b["hidden_layers"] = hidden_b

    # Final projections: same hidden input per net but DIFFERENT out sizes —
    # run as one concat-fused matmul over the flattened pair batch.
    w = jnp.stack([
        jnp.pad(params_a["hidden_to_output"]["w"],
                ((0, 0), (0, max(0, params_b["hidden_to_output"]["w"].shape[1]
                                 - params_a["hidden_to_output"]["w"].shape[1])))),
        jnp.pad(params_b["hidden_to_output"]["w"],
                ((0, 0), (0, max(0, params_a["hidden_to_output"]["w"].shape[1]
                                 - params_b["hidden_to_output"]["w"].shape[1])))),
    ])
    out = jnp.einsum("kbi,kio->kbo", y, w, precision=_HI)
    na = params_a["hidden_to_output"]["w"].shape[1]
    nb = params_b["hidden_to_output"]["w"].shape[1]
    y_a = out[0, :, :na] + params_a["hidden_to_output"]["b"]
    y_b = out[1, :, :nb] + params_b["hidden_to_output"]["b"]
    return y_a, y_b, new_a, new_b


# ---------------------------------------------------------------------------
# FeedForwardResidualBlock: Linear + add + ReLU (reference layers.py:170-182).
# ---------------------------------------------------------------------------

def residual_block_init(key, size: int) -> Params:
    return {"dense": linear_init(key, size, size)}


def residual_block_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.relu(linear_apply(params["dense"], x) + x)


# ---------------------------------------------------------------------------
# LSTM (masked scan; torch pack_padded semantics)
# ---------------------------------------------------------------------------

def lstm_init(key, input_size: int, hidden_size: int, num_layers: int, bidirectional: bool = False):
    """Torch nn.LSTM default init: all weights/biases U(-1/sqrt(H), 1/sqrt(H)).

    Param tree: {"layers": [ {"fwd": cell, "bwd": cell?} ... ]} where cell has
    w_ih (in, 4H), w_hh (H, 4H), b_ih (4H,), b_hh (4H,); gate order (i, f, g, o).
    """
    bound = 1.0 / math.sqrt(hidden_size)
    dirs = ["fwd", "bwd"] if bidirectional else ["fwd"]
    layers = []
    for l in range(num_layers):
        in_size = input_size if l == 0 else hidden_size * len(dirs)
        layer = {}
        for d in dirs:
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            layer[d] = {
                "w_ih": jax.random.uniform(k1, (in_size, 4 * hidden_size), jnp.float32, -bound, bound),
                "w_hh": jax.random.uniform(k2, (hidden_size, 4 * hidden_size), jnp.float32, -bound, bound),
                "b_ih": jax.random.uniform(k3, (4 * hidden_size,), jnp.float32, -bound, bound),
                "b_hh": jax.random.uniform(k4, (4 * hidden_size,), jnp.float32, -bound, bound),
            }
        layers.append(layer)
    return {"layers": layers}


import os as _os

# lax.scan unroll factor for the LSTM time loop. The recurrence is inherently
# sequential; unrolling packs several timesteps into one loop body, cutting
# per-iteration loop overhead. Values > 1 are numerically identical (same op
# sequence, no reassociation). Measured on a v5e chip: unroll=4 trims the
# isolated init-RNN stage ~7% but leaves the full LGD forward flat (the wall
# is the FK/rotation-algebra kernel chain), so the default stays 1.
LSTM_SCAN_UNROLL = int(_os.environ.get("EMPOSE_LSTM_UNROLL", "1"))


def _lstm_cell_scan(cell: Params, x: jnp.ndarray, mask: jnp.ndarray, h0, c0):
    """Run one LSTM direction over time with state frozen on masked steps.

    :param x: (F, N, I); :param mask: (F, N) 1.0 where valid.
    :return: (outputs (F, N, H) zeroed at masked steps, (hF, cF)).
    """
    hidden = cell["w_hh"].shape[0]
    # Input projection for ALL timesteps at once -> one big MXU matmul.
    x_proj = jnp.matmul(x, cell["w_ih"], precision=_HI) + cell["b_ih"] + cell["b_hh"]

    def step(carry, inp):
        h, c = carry
        xp, m = inp
        gates = xp + jnp.matmul(h, cell["w_hh"], precision=_HI)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m1 = m[:, None]
        h = jnp.where(m1 > 0, h_new, h)
        c = jnp.where(m1 > 0, c_new, c)
        out = h_new * m1
        return (h, c), out

    unroll = LSTM_SCAN_UNROLL if x.shape[0] % max(LSTM_SCAN_UNROLL, 1) == 0 else 1
    (hF, cF), outs = lax.scan(step, (h0, c0), (x_proj, mask), unroll=max(unroll, 1))
    return outs, (hF, cF)


# Weight-resident Pallas kernels for INFERENCE (raw pallas_call has no VJP;
# training at batch >= LSTM_TRAIN_KERNEL_MIN_BATCH routes through the
# differentiable custom_vjp kernel pair below instead, and keeps the
# scan/wavefront paths under that gate). Unidirectional stacks run the
# WHOLE stack in one program; bidirectional stacks run one program per
# layer with both directions' cell updates fused into each grid step.
# Measured on a v5e chip (released 2x512 stack, F=256): batch 64 the kernel
# runs 4.6 ms vs 7.8 ms wavefront / 9.8 ms layer-scan; batch 8 it ties the
# scan (~2.9 ms — the serial recurrence is latency-bound there, confirmed by
# two independent implementations hitting the same per-step floor), so the
# gate keeps it off below EMPOSE_LSTM_KERNEL_MIN_BATCH. "interpret" runs it
# in Pallas interpreter mode (CPU tests). EMPOSE_LSTM_KERNEL=0 disables.
LSTM_KERNEL = _os.environ.get("EMPOSE_LSTM_KERNEL", "1")
LSTM_KERNEL_MIN_BATCH = int(_os.environ.get("EMPOSE_LSTM_KERNEL_MIN_BATCH", "16"))
_LSTM_KERNEL_SUSPENDED = False


class lstm_kernel_disabled:
    """Trace-time opt-out (e.g. a DP-sharded serving trace whose per-device
    batch is below the gate — the kernel's custom_partitioning rule runs it
    per shard, so the PER-DEVICE batch is what matters there). Use around
    the call that TRACES the forward — the choice binds then."""

    def __enter__(self):
        global _LSTM_KERNEL_SUSPENDED
        self._prev = _LSTM_KERNEL_SUSPENDED
        _LSTM_KERNEL_SUSPENDED = True

    def __exit__(self, *exc):
        global _LSTM_KERNEL_SUSPENDED
        _LSTM_KERNEL_SUSPENDED = self._prev


# Differentiable per-direction-layer kernel for TRAINING (custom_vjp over a
# weight-resident forward + reverse-sweep backward pair, ops/lstm_train_kernel).
# Both scan sweeps re-stream w_hh from HBM every step; the kernel pair keeps
# it resident and defers every weight gradient to one big outside GEMM.
# Gate measured on a v5e chip (see README); EMPOSE_LSTM_TRAIN_KERNEL=0
# disables, =interpret runs the Pallas interpreter (CPU tests).
LSTM_TRAIN_KERNEL = _os.environ.get("EMPOSE_LSTM_TRAIN_KERNEL", "1")
LSTM_TRAIN_KERNEL_MIN_BATCH = int(
    _os.environ.get("EMPOSE_LSTM_TRAIN_KERNEL_MIN_BATCH", "8"))


def _lstm_train_kernel_wanted(n: int, hidden: int) -> bool:
    if LSTM_TRAIN_KERNEL == "0" or _LSTM_KERNEL_SUSPENDED:
        return False
    if n < LSTM_TRAIN_KERNEL_MIN_BATCH:
        return False
    from empose_tpu.ops.lstm_train_kernel import fits_vmem_layer
    if not fits_vmem_layer(hidden, _HI):
        return False
    if LSTM_TRAIN_KERNEL == "interpret":
        return True
    import jax as _jax
    return _jax.default_backend() != "cpu"


def _lstm_kernel_wanted(n: int, num_layers: int, hidden: int,
                        bidirectional: bool = False) -> bool:
    if LSTM_KERNEL == "0" or _LSTM_KERNEL_SUSPENDED:
        return False
    if n < LSTM_KERNEL_MIN_BATCH:
        return False
    from empose_tpu.ops.lstm_kernel import fits_vmem, fits_vmem_bidi
    if not (fits_vmem_bidi(hidden) if bidirectional
            else fits_vmem(num_layers, hidden)):
        return False
    if LSTM_KERNEL == "interpret":
        return True
    import jax as _jax
    return _jax.default_backend() != "cpu"


# Wavefront (software-pipelined) schedule for unidirectional LSTM stacks.
# Running L layers sequentially costs L*F serial cell steps; in the wavefront
# schedule layer l processes time t-l at global step t, so all L cells inside
# one scan step are mutually independent (their gate matmuls run as ONE
# batched matmul) and the critical path is F+L-1 cell steps. Outputs and
# final states are IDENTICAL to 1 ulp — the same computation reordered.
# Measured on a v5e chip (released LGD-RNN-6): +5% end-to-end at batch 64,
# but -12% at batch 8 and -9% at batch 12 — the extra pipe-state shuffling
# per step only amortizes once the gate matmuls are wide enough, so the
# schedule engages at batch >= LSTM_PIPELINE_MIN_BATCH. Escape hatch:
# EMPOSE_LSTM_PIPELINE=0 always uses the layer-by-layer schedule.
LSTM_PIPELINE = _os.environ.get("EMPOSE_LSTM_PIPELINE", "1") != "0"
LSTM_PIPELINE_MIN_BATCH = int(_os.environ.get("EMPOSE_LSTM_PIPELINE_MIN_BATCH", "48"))


def _lstm_stack_scan_wavefront(cells, x: jnp.ndarray, mask: jnp.ndarray,
                               h0s: jnp.ndarray, c0s: jnp.ndarray):
    """All-layers-in-one-scan forward pass over a unidirectional stack.

    :param cells: list of L cell param dicts (w_ih, w_hh, b_ih, b_hh);
      layers > 0 share the input size H.
    :param x: (F, N, I); :param mask: (F, N);
    :param h0s/c0s: (L, N, H) initial states.
    :return: (outputs (F, N, H) of the last layer, (hF, cF) each (L, N, H)).
    """
    L_n = len(cells)
    f, n = x.shape[0], x.shape[1]
    hidden = cells[0]["w_hh"].shape[0]
    # Layer 0's input projection for ALL timesteps -> one big MXU matmul.
    x0_proj = jnp.matmul(x, cells[0]["w_ih"], precision=_HI) \
        + cells[0]["b_ih"] + cells[0]["b_hh"]
    # Stacked deeper-layer weights: one batched matmul per scan step each.
    w_ih_up = jnp.stack([cells[l]["w_ih"] for l in range(1, L_n)])     # (L-1, H, 4H)
    b_up = jnp.stack([cells[l]["b_ih"] + cells[l]["b_hh"] for l in range(1, L_n)])
    w_hh_all = jnp.stack([c["w_hh"] for c in cells])                   # (L, H, 4H)

    pad = L_n - 1
    x0_proj = jnp.concatenate(
        [x0_proj, jnp.zeros((pad,) + x0_proj.shape[1:], x0_proj.dtype)])
    mask_pad = jnp.concatenate([mask, jnp.zeros((pad, n), mask.dtype)])

    def step(carry, inp):
        hs, cs, pipe, pipe_m = carry           # (L,N,H), (L,N,H), (L-1,N,H), (L-1,N)
        xp, m = inp
        # Gate inputs for every layer this step (mutually independent):
        # layer 0 reads x at time t; layer l>0 reads layer l-1's output from
        # the previous step (carried in `pipe`).
        up = jnp.einsum("knh,khg->kng", pipe, w_ih_up, precision=_HI) + b_up[:, None]
        gates_in = jnp.concatenate([xp[None], up])                      # (L, N, 4H)
        gates = gates_in + jnp.einsum("knh,khg->kng", hs, w_hh_all, precision=_HI)
        i, fo, g, o = jnp.split(gates, 4, axis=-1)
        i, fo, o = jax.nn.sigmoid(i), jax.nn.sigmoid(fo), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = fo * cs + i * g
        h_new = o * jnp.tanh(c_new)
        m_all = jnp.concatenate([m[None], pipe_m])[:, :, None]          # (L, N, 1)
        hs_out = jnp.where(m_all > 0, h_new, hs)
        cs_out = jnp.where(m_all > 0, c_new, cs)
        outs = h_new * m_all                                            # (L, N, H)
        return (hs_out, cs_out, outs[:-1], m_all[:-1, :, 0]), outs[-1]

    pipe0 = jnp.zeros((L_n - 1, n, hidden), x.dtype)
    pipe_m0 = jnp.zeros((L_n - 1, n), mask.dtype)
    (hF, cF, _, _), outs = lax.scan(
        step, (h0s, c0s, pipe0, pipe_m0), (x0_proj, mask_pad))
    # Step t emits the LAST layer's output for time t-(L-1); drop the warmup.
    return outs[pad:], (hF, cF)


def _reverse_by_length(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Per-sample reversal of the valid prefix of a (F, N, ...) tensor."""
    f = x.shape[0]
    t = jnp.arange(f)[:, None]  # (F, 1)
    idx = jnp.where(t < lengths[None, :], lengths[None, :] - 1 - t, t)  # (F, N)
    return jnp.take_along_axis(x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=0)


def lstm_apply(params: Params, x: jnp.ndarray, lengths: jnp.ndarray,
               init_state: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
               inference: bool = False):
    """Multi-layer (bi)LSTM over a padded batch.

    :param x: (N, F, I) batch-first input.
    :param lengths: (N,) int true lengths.
    :param init_state: optional (h0, c0), each (num_layers * num_dirs, N, H),
      layer-major with direction fastest (torch layout).
    :return: (outputs (N, F, H * dirs), (hF, cF) in torch layout). Outputs at
      padded steps are zero; final states are taken at each sample's last
      valid step (forward) / first step (reverse), matching packed-sequence
      semantics.
    """
    layers = params["layers"]
    bidirectional = "bwd" in layers[0]
    n, f = x.shape[0], x.shape[1]
    hidden = layers[0]["fwd"]["w_hh"].shape[0]
    mask = (jnp.arange(f)[:, None] < lengths[None, :]).astype(x.dtype)  # (F, N)

    xt = jnp.swapaxes(x, 0, 1)  # (F, N, I)
    num_dirs = 2 if bidirectional else 1

    if init_state is None:
        h0_all = jnp.zeros((len(layers) * num_dirs, n, hidden), x.dtype)
        c0_all = h0_all
    else:
        h0_all, c0_all = init_state

    if not bidirectional and inference and _lstm_kernel_wanted(n, len(layers), hidden):
        # Weight-resident Pallas kernel: the whole recurrence in one program
        # (inference only — no VJP; see the gate notes above).
        from empose_tpu.ops.lstm_kernel import lstm_stack_pallas
        cells = [layer["fwd"] for layer in layers]
        outs, (hF, cF) = lstm_stack_pallas(
            cells, xt, mask, h0_all, c0_all, precision=_HI,
            interpret=LSTM_KERNEL == "interpret")
        return jnp.swapaxes(outs, 0, 1), (hF, cF)

    if bidirectional and inference and _lstm_kernel_wanted(
            n, len(layers), hidden, bidirectional=True):
        # Weight-resident bidirectional layer kernel: both directions of a
        # layer run inside one program (they are mutually independent);
        # layers stay separate calls because layer l+1's backward direction
        # needs layer l's complete output sweep.
        from empose_tpu.ops.lstm_kernel import lstm_bidi_layer_pallas
        h_finals, c_finals = [], []
        for l, layer in enumerate(layers):
            xt_rev = _reverse_by_length(xt, lengths)
            outs2, (hF2, cF2) = lstm_bidi_layer_pallas(
                layer["fwd"], layer["bwd"], xt, xt_rev, mask,
                h0_all[2 * l:2 * l + 2], c0_all[2 * l:2 * l + 2],
                precision=_HI, interpret=LSTM_KERNEL == "interpret")
            outs_b = _reverse_by_length(outs2[:, 1], lengths)
            xt = jnp.concatenate([outs2[:, 0], outs_b], axis=-1)
            h_finals += [hF2[0], hF2[1]]
            c_finals += [cF2[0], cF2[1]]
        return jnp.swapaxes(xt, 0, 1), (jnp.stack(h_finals), jnp.stack(c_finals))

    # Training: the differentiable weight-resident layer kernel replaces the
    # scan (and the wavefront schedule) per direction-layer when the batch
    # clears its gate — identical masked semantics, gradients included.
    train_kernel = (not inference) and _lstm_train_kernel_wanted(n, hidden)
    if train_kernel:
        from empose_tpu.ops.lstm_train_kernel import lstm_cell_train_pallas

        def cell_fn(cell, xs, m, h0, c0):
            return lstm_cell_train_pallas(
                cell, xs, m, h0, c0, precision=_HI,
                interpret=LSTM_TRAIN_KERNEL == "interpret")
    else:
        cell_fn = _lstm_cell_scan

    if (not bidirectional and len(layers) > 1 and not train_kernel
            and LSTM_PIPELINE and n >= LSTM_PIPELINE_MIN_BATCH):
        # Wavefront schedule: critical path F+L-1 cell steps instead of F*L,
        # identical outputs/finals (see _lstm_stack_scan_wavefront).
        cells = [layer["fwd"] for layer in layers]
        outs, (hF, cF) = _lstm_stack_scan_wavefront(cells, xt, mask, h0_all, c0_all)
        return jnp.swapaxes(outs, 0, 1), (hF, cF)

    h_finals, c_finals = [], []
    for l, layer in enumerate(layers):
        fwd_idx = l * num_dirs
        outs_f, (hF_f, cF_f) = cell_fn(layer["fwd"], xt, mask, h0_all[fwd_idx], c0_all[fwd_idx])
        if bidirectional:
            xt_rev = _reverse_by_length(xt, lengths)
            outs_b, (hF_b, cF_b) = cell_fn(layer["bwd"], xt_rev, mask,
                                           h0_all[fwd_idx + 1], c0_all[fwd_idx + 1])
            outs_b = _reverse_by_length(outs_b, lengths)
            xt = jnp.concatenate([outs_f, outs_b], axis=-1)
            h_finals += [hF_f, hF_b]
            c_finals += [cF_f, cF_b]
        else:
            xt = outs_f
            h_finals.append(hF_f)
            c_finals.append(cF_f)

    outputs = jnp.swapaxes(xt, 0, 1)  # (N, F, H * dirs)
    return outputs, (jnp.stack(h_finals), jnp.stack(c_finals))


# ---------------------------------------------------------------------------
# RNNLayer: input dropout + (learned) init state + LSTM + optional out proj
# Reference: layers.py:80-167. Streaming state is an EXPLICIT carry here
# (the reference mutates self.init_state/final_state across calls).
# ---------------------------------------------------------------------------

def rnn_layer_init(key, input_size: int, hidden_size: int, num_layers: int,
                   output_size: Optional[int] = None, bidirectional: bool = False,
                   learn_init_state: bool = False):
    if bidirectional and learn_init_state:
        raise NotImplementedError(
            "bidirectional + learn_init_state: the reference's cell_init reshapes "
            "without the direction axis (layers.py:121-131) and crashes in torch "
            "as well; no released model uses this combination.")
    k_lstm, k_h, k_c, k_out = jax.random.split(key, 4)
    num_dirs = 2 if bidirectional else 1
    params = {"lstm": lstm_init(k_lstm, input_size, hidden_size, num_layers, bidirectional)}
    if learn_init_state:
        params["to_init_state_h"] = linear_init(k_h, input_size, hidden_size * num_layers * num_dirs)
        params["to_init_state_c"] = linear_init(k_c, input_size, hidden_size * num_layers * num_dirs)
    if output_size is not None:
        params["to_out"] = linear_init(k_out, hidden_size * num_dirs, output_size)
    return params


def rnn_layer_apply(params: Params, x: jnp.ndarray, lengths: jnp.ndarray,
                    carry=None, *, num_layers: int, hidden_size: int,
                    dropout_p: float = 0.0, train: bool = False, key=None):
    """:param carry: previous final state (streaming windows) or None.

    Replicates a reference quirk for checkpoint parity: cell_init returns
    ``(c0, h0)`` (layers.py:121-131), so torch's h-slot receives the output of
    ``to_init_state_c`` and vice versa. We reproduce that wiring exactly.
    """
    x = dropout_apply(x, dropout_p, train, key)
    init_state = carry
    if init_state is None and "to_init_state_h" in params:
        n = x.shape[0]
        first = x[:, 0]
        c0 = linear_apply(params["to_init_state_c"], first).reshape(n, num_layers, hidden_size)
        h0 = linear_apply(params["to_init_state_h"], first).reshape(n, num_layers, hidden_size)
        c0 = jnp.swapaxes(c0, 0, 1)
        h0 = jnp.swapaxes(h0, 0, 1)
        # Reference passes (c0, h0) into torch's (h_0, c_0) slots.
        init_state = (c0, h0)
    out, final_state = lstm_apply(params["lstm"], x, lengths, init_state,
                                  inference=not train)
    if "to_out" in params:
        out = linear_apply(params["to_out"], out)
    return out, final_state
