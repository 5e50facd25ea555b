"""JAX params/state pytrees -> torch ``model.pth`` for the EM-POSE zoo.

The exact inverse of ``mapping.py``: exports a trained empose_tpu model as a
reference-layout ``model.pth`` (reference eval/helpers.py:131-145), so a
deployment can hand checkpoints BACK to the torch ecosystem — the reference
codebase loads the result with plain ``torch.load`` + ``load_state_dict``.

The import direction (``torch_reader.py``) is dependency-free because it is
deploy-critical; this export direction uses torch for the actual ``.pth``
serialization (anyone who wants a ``.pth`` file has torch) and raises a
clear error when torch is absent. The key-space mapping itself is pure
numpy, and round-trip identity through the dependency-free reader +
``mapping.convert_model`` is pinned for all 8 released architectures in
``tests/test_torch_writer.py``.

Layout rules are the mirror of mapping.py's:
  * Linear:   w (in, out) -> weight (out, in) transposed; bias unchanged.
  * BatchNorm: scale/bias -> weight/bias; state mean/var -> running stats;
    ``num_batches_tracked`` is emitted as 0 (torch's strict load wants it;
    the reference never reads it).
  * LSTM:     w_ih (in, 4H) -> weight_ih_l{k}[_reverse] (4H, in) transposed.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

Arrays = Dict[str, np.ndarray]


def _put(out: Arrays, key: str, value) -> None:
    out[key.lstrip(".")] = np.asarray(value, np.float32)


def export_linear(params: Dict, prefix: str, out: Arrays) -> None:
    _put(out, f"{prefix}.weight", np.asarray(params["w"]).T)
    _put(out, f"{prefix}.bias", params["b"])


def export_batch_norm(params: Dict, state: Dict, prefix: str, out: Arrays) -> None:
    _put(out, f"{prefix}.weight", params["scale"])
    _put(out, f"{prefix}.bias", params["bias"])
    _put(out, f"{prefix}.running_mean", state["mean"])
    _put(out, f"{prefix}.running_var", state["var"])
    out[f"{prefix}.num_batches_tracked".lstrip(".")] = np.asarray(0, np.int64)


def export_prelu(params: Dict, prefix: str, out: Arrays) -> None:
    _put(out, f"{prefix}.weight", params["alpha"])


def export_linear_layers(params: Dict, state: Dict, prefix: str, out: Arrays,
                         use_batch_norm: bool = True) -> None:
    """Inverse of mapping.convert_linear_layers (Sequential indices per
    block: with BN -> 0:Linear 1:BN 2:PReLU 3:Dropout; without -> 0/1/2)."""
    step = 4 if use_batch_norm else 3
    for i, (bp, bs) in enumerate(zip(params["blocks"], state["blocks"])):
        base = i * step
        export_linear(bp["linear"], f"{prefix}.layers.{base}", out)
        if use_batch_norm:
            export_batch_norm(bp["bn"], bs["bn"], f"{prefix}.layers.{base + 1}", out)
            export_prelu(bp["prelu"], f"{prefix}.layers.{base + 2}", out)
        else:
            export_prelu(bp["prelu"], f"{prefix}.layers.{base + 1}", out)


def export_mlp(params: Dict, state: Dict, prefix: str, out: Arrays,
               use_batch_norm: bool = True) -> None:
    export_linear(params["input_to_hidden"], f"{prefix}.input_to_hidden", out)
    export_prelu(params["prelu"], f"{prefix}.activation_fn", out)
    export_linear(params["hidden_to_output"], f"{prefix}.hidden_to_output", out)
    if use_batch_norm:
        export_batch_norm(params["bn"], state["bn"], f"{prefix}.batch_norm", out)
    for i, (hp, hs) in enumerate(zip(params["hidden_layers"], state["hidden_layers"])):
        export_linear_layers(hp, hs, f"{prefix}.hidden_layers.{i}", out,
                             use_batch_norm=use_batch_norm)


def export_lstm(params: Dict, prefix: str, out: Arrays) -> None:
    for l, layer in enumerate(params["layers"]):
        for d, suffix in (("fwd", ""), ("bwd", "_reverse")):
            if d not in layer:
                continue
            cell = layer[d]
            _put(out, f"{prefix}.weight_ih_l{l}{suffix}", np.asarray(cell["w_ih"]).T)
            _put(out, f"{prefix}.weight_hh_l{l}{suffix}", np.asarray(cell["w_hh"]).T)
            _put(out, f"{prefix}.bias_ih_l{l}{suffix}", cell["b_ih"])
            _put(out, f"{prefix}.bias_hh_l{l}{suffix}", cell["b_hh"])


def export_rnn_layer(params: Dict, prefix: str, out: Arrays) -> None:
    export_lstm(params["lstm"], f"{prefix}.lstm", out)
    if "to_init_state_h" in params:
        export_linear(params["to_init_state_h"], f"{prefix}.to_init_state_h", out)
        export_linear(params["to_init_state_c"], f"{prefix}.to_init_state_c", out)
    if "to_out" in params:
        export_linear(params["to_out"], f"{prefix}.to_out", out)


def export_residual_block(params: Dict, prefix: str, out: Arrays) -> None:
    export_linear(params["dense"], f"{prefix}.dense", out)


# ---------------------------------------------------------------------------
# Model-level exporters (mirror of mapping.py's converters)
# ---------------------------------------------------------------------------

def export_feed_forward_resnet(params: Dict, state: Dict, config) -> Arrays:
    out: Arrays = {}
    export_linear(params["from_input"], "from_input", out)
    for i, bp in enumerate(params["blocks"]):
        export_residual_block(bp, f"blocks.{i}", out)
    export_linear(params["to_pose"], "to_pose", out)
    if config.m_estimate_shape:
        export_mlp(params["to_shape"], state["to_shape"], "to_shape", out,
                   use_batch_norm=False)
    return out


def export_simple_rnn(params: Dict, state: Dict, config) -> Arrays:
    out: Arrays = {}
    export_rnn_layer(params["rnn"], "rnn", out)
    export_linear(params["to_pose"], "to_pose", out)
    if config.m_estimate_shape:
        export_mlp(params["to_shape"], state["to_shape"], "to_shape", out,
                   use_batch_norm=False)
    return out


def export_ief(params: Dict, state: Dict, config) -> Arrays:
    use_bn = not config.m_no_batch_norm
    out: Arrays = {}
    if config.m_rnn_init:
        export_rnn_layer(params["rnn"], "rnn", out)
        export_linear(params["pose_net_init"], "pose_net_init", out)
        export_linear(params["shape_net_init"], "shape_net_init", out)
    else:
        export_mlp(params["pose_net_init"], state["pose_net_init"],
                   "pose_net_init", out, use_batch_norm=use_bn)
        export_mlp(params["shape_net_init"], state["shape_net_init"],
                   "shape_net_init", out, use_batch_norm=use_bn)
    export_mlp(params["pose_net_iter"], state["pose_net_iter"],
               "pose_net_iter", out, use_batch_norm=use_bn)
    export_mlp(params["shape_net_iter"], state["shape_net_iter"],
               "shape_net_iter", out, use_batch_norm=use_bn)
    return out


def export_model(params: Dict, state: Dict, config) -> Arrays:
    """Dispatch on config.m_type; returns the flat torch key space."""
    if config.m_type == "resnet":
        return export_feed_forward_resnet(params, state, config)
    if config.m_type == "rnn":
        return export_simple_rnn(params, state, config)
    if config.m_type in ("ief", "lgd"):
        return export_ief(params, state, config)
    raise ValueError(f"Model type '{config.m_type}' unknown.")


def save_torch_checkpoint(path: str, params: Dict, state: Dict, config,
                          extra: Dict = None) -> None:
    """Write a reference-layout ``model.pth``: ``{"model_state_dict": ...,
    "iteration": 0, "epoch": 0, **extra}`` (reference train.py:190-205)."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch is present in CI
        raise ImportError(
            "Exporting .pth requires torch (the import direction, "
            "checkpoint.torch_reader, stays dependency-free)") from e
    # Explicit copy: exported arrays may be read-only views of device
    # buffers, which torch.from_numpy rejects with a warning.
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in export_model(params, state, config).items()}
    checkpoint = {"model_state_dict": sd, "iteration": 0, "epoch": 0}
    checkpoint.update(extra or {})
    torch.save(checkpoint, path)
