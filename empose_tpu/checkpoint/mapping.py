"""Torch state_dict -> JAX params/state pytrees for the EM-POSE model zoo.

The released checkpoints are torch ``model.pth`` dicts (reference:
eval/helpers.py:131-137). This module maps their flat key space onto the
functional layer trees of empose_tpu.nn. Works on any mapping from key ->
numpy array — whether produced by torch or by the dependency-free reader in
``torch_reader.py``.

Layout rules (see empose_tpu/nn/layers.py):
  * Linear:   weight (out, in) -> w (in, out) transposed; bias unchanged.
  * BatchNorm: weight/bias -> params scale/bias; running_mean/var -> state.
    Running stats MUST come from the checkpoint (the reference uniform-
    initializes bn.weight, reference layers.py:26-27, so nothing is
    re-derivable at load time).
  * PReLU:    weight (1,) -> alpha.
  * LSTM:     weight_ih_l{k}[_reverse] (4H, in) -> w_ih (in, 4H) transposed;
              gate order (i, f, g, o) is preserved verbatim.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp


Arrays = Dict[str, np.ndarray]


def _get(sd: Arrays, key: str) -> jnp.ndarray:
    key = key.lstrip(".")  # tolerate empty prefixes
    if key not in sd:
        raise KeyError(f"Checkpoint key missing: {key}")
    # Explicit copy: on CPU jnp.asarray may alias the source buffer, and a
    # torch module that produced `sd` can mutate it in place (e.g. BatchNorm
    # running stats) — the converted pytree must be independent.
    return jnp.asarray(np.array(sd[key], dtype=np.float32, copy=True))


def convert_linear(sd: Arrays, prefix: str) -> Dict:
    return {"w": _get(sd, f"{prefix}.weight").T, "b": _get(sd, f"{prefix}.bias")}


def convert_batch_norm(sd: Arrays, prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": _get(sd, f"{prefix}.weight"), "bias": _get(sd, f"{prefix}.bias")}
    state = {"mean": _get(sd, f"{prefix}.running_mean"), "var": _get(sd, f"{prefix}.running_var")}
    return params, state


def convert_prelu(sd: Arrays, prefix: str) -> Dict:
    return {"alpha": _get(sd, f"{prefix}.weight")}


def convert_linear_layers(sd: Arrays, prefix: str, num_layers: int = 2, use_batch_norm: bool = True):
    """TorchLinearLayers: nn.Sequential of [Linear, BN?, PReLU, Dropout] x n.

    Sequential indices per block: with BN -> (0:Linear, 1:BN, 2:PReLU, 3:Dropout);
    without BN -> (0:Linear, 1:PReLU, 2:Dropout). Reference layers.py:22-33.
    """
    step = 4 if use_batch_norm else 3
    params, state = {"blocks": []}, {"blocks": []}
    for i in range(num_layers):
        base = i * step
        bp = {"linear": convert_linear(sd, f"{prefix}.layers.{base}")}
        bs = {}
        if use_batch_norm:
            bp["bn"], bs["bn"] = convert_batch_norm(sd, f"{prefix}.layers.{base + 1}")
            bp["prelu"] = convert_prelu(sd, f"{prefix}.layers.{base + 2}")
        else:
            bp["prelu"] = convert_prelu(sd, f"{prefix}.layers.{base + 1}")
        params["blocks"].append(bp)
        state["blocks"].append(bs)
    return params, state


def convert_mlp(sd: Arrays, prefix: str, num_layers: int = 2, use_batch_norm: bool = True):
    """Reference MLP (layers.py:46-77)."""
    params = {
        "input_to_hidden": convert_linear(sd, f"{prefix}.input_to_hidden"),
        "prelu": convert_prelu(sd, f"{prefix}.activation_fn"),
        "hidden_to_output": convert_linear(sd, f"{prefix}.hidden_to_output"),
    }
    state = {}
    if use_batch_norm:
        params["bn"], state["bn"] = convert_batch_norm(sd, f"{prefix}.batch_norm")
    hp, hs = [], []
    for i in range(num_layers):
        p, s = convert_linear_layers(sd, f"{prefix}.hidden_layers.{i}", num_layers=2,
                                     use_batch_norm=use_batch_norm)
        hp.append(p)
        hs.append(s)
    params["hidden_layers"] = hp
    state["hidden_layers"] = hs
    return params, state


def convert_lstm(sd: Arrays, prefix: str, num_layers: int, bidirectional: bool = False) -> Dict:
    layers = []
    for l in range(num_layers):
        layer = {}
        for d, suffix in (("fwd", ""), ("bwd", "_reverse")) if bidirectional else (("fwd", ""),):
            layer[d] = {
                "w_ih": _get(sd, f"{prefix}.weight_ih_l{l}{suffix}").T,
                "w_hh": _get(sd, f"{prefix}.weight_hh_l{l}{suffix}").T,
                "b_ih": _get(sd, f"{prefix}.bias_ih_l{l}{suffix}"),
                "b_hh": _get(sd, f"{prefix}.bias_hh_l{l}{suffix}"),
            }
        layers.append(layer)
    return {"layers": layers}


def convert_rnn_layer(sd: Arrays, prefix: str, num_layers: int, bidirectional: bool = False,
                      learn_init_state: bool = False, has_out: bool = False) -> Dict:
    params = {"lstm": convert_lstm(sd, f"{prefix}.lstm", num_layers, bidirectional)}
    if learn_init_state:
        params["to_init_state_h"] = convert_linear(sd, f"{prefix}.to_init_state_h")
        params["to_init_state_c"] = convert_linear(sd, f"{prefix}.to_init_state_c")
    if has_out:
        params["to_out"] = convert_linear(sd, f"{prefix}.to_out")
    return params


def convert_residual_block(sd: Arrays, prefix: str) -> Dict:
    return {"dense": convert_linear(sd, f"{prefix}.dense")}


# ---------------------------------------------------------------------------
# Model-level converters (reference module names from empose/nn/models.py)
# ---------------------------------------------------------------------------

def convert_feed_forward_resnet(sd: Arrays, config):
    """FeedForwardResNet (reference models.py:166-220)."""
    params = {"from_input": convert_linear(sd, "from_input")}
    params["blocks"] = [convert_residual_block(sd, f"blocks.{i}") for i in range(config.m_num_layers)]
    params["to_pose"] = convert_linear(sd, "to_pose")
    state = {}
    if config.m_estimate_shape:
        params["to_shape"], state["to_shape"] = convert_mlp(sd, "to_shape", num_layers=2, use_batch_norm=False)
    return params, state


def convert_simple_rnn(sd: Arrays, config):
    """SimpleRNN / BiRNN (reference models.py:265-321)."""
    params = {
        "rnn": convert_rnn_layer(sd, "rnn", config.m_num_layers, config.m_bidirectional,
                                 learn_init_state=config.m_learn_init_state),
        "to_pose": convert_linear(sd, "to_pose"),
    }
    state = {}
    if config.m_estimate_shape:
        params["to_shape"], state["to_shape"] = convert_mlp(sd, "to_shape", num_layers=2, use_batch_norm=False)
    return params, state


def convert_ief(sd: Arrays, config):
    """IterativeErrorFeedback / LGD (reference models.py:369-457)."""
    use_bn = not config.m_no_batch_norm
    params, state = {}, {}
    if config.m_rnn_init:
        params["rnn"] = convert_rnn_layer(sd, "rnn", config.m_rnn_num_layers, config.m_rnn_bidirectional)
        params["pose_net_init"] = convert_linear(sd, "pose_net_init")
        params["shape_net_init"] = convert_linear(sd, "shape_net_init")
    else:
        params["pose_net_init"], state["pose_net_init"] = convert_mlp(
            sd, "pose_net_init", config.m_num_layers, use_bn)
        params["shape_net_init"], state["shape_net_init"] = convert_mlp(
            sd, "shape_net_init", config.m_num_layers, use_bn)
    params["pose_net_iter"], state["pose_net_iter"] = convert_mlp(
        sd, "pose_net_iter", config.m_num_layers, use_bn)
    params["shape_net_iter"], state["shape_net_iter"] = convert_mlp(
        sd, "shape_net_iter", config.m_num_layers, use_bn)
    return params, state


def convert_model(sd: Arrays, config):
    """Dispatch on config.m_type; returns (params, state) for the JAX zoo."""
    if config.m_type == "resnet":
        return convert_feed_forward_resnet(sd, config)
    if config.m_type == "rnn":
        return convert_simple_rnn(sd, config)
    if config.m_type in ("ief", "lgd"):
        return convert_ief(sd, config)
    raise ValueError(f"Model type '{config.m_type}' unknown.")
