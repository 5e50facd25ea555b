"""Masked losses (reference: empose/nn/loss.py:13-62) + mask helpers."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def mask_from_seq_lengths(seq_lengths: jnp.ndarray, max_seq_len: int) -> jnp.ndarray:
    """(N,) lengths -> (N, S) 0/1 mask (reference utils.py:105-123).

    ``max_seq_len`` must be static under jit (it is the padded batch length).
    """
    t = jnp.arange(max_seq_len)[None, :]
    return (t < seq_lengths[:, None]).astype(jnp.float32)


def _frame_mask_from_marker_mask(marker_mask: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """(N, F, M) marker availability -> (N, F) 'all markers present' gate.

    Reference semantics (loss.py:30-34): a frame contributes only when NO
    marker is missing.
    """
    if marker_mask is None:
        return None
    missing_any = jnp.any(marker_mask == 0, axis=-1)
    return (~missing_any).astype(jnp.float32)


def padded_loss(gt: jnp.ndarray, hat: jnp.ndarray, elementwise_fn, seq_lengths: jnp.ndarray) -> jnp.ndarray:
    """Elementwise loss, mean over the last dim, masked mean over frames, mean over batch.

    Reference: loss.py:13-20. ``elementwise_fn(gt, hat)`` e.g. L1/MSE, unreduced.
    """
    unreduced = jnp.mean(elementwise_fn(gt, hat), axis=-1)  # (N, F)
    mask = mask_from_seq_lengths(seq_lengths, unreduced.shape[1])
    # max(len, 1): zero-length entries (fully-padded chunk tails) contribute
    # an exact 0 instead of 0/0 (cannot occur in the reference, which never
    # pads the batch axis).
    n_frames = jnp.maximum(seq_lengths, 1).astype(unreduced.dtype)
    loss_per_sample = jnp.sum(unreduced * mask, axis=-1) / n_frames
    return jnp.mean(loss_per_sample)


def l1(gt, hat):
    return jnp.abs(hat - gt)


def mse(gt, hat):
    return jnp.square(hat - gt)


def reconstruction_loss(markers_gt: jnp.ndarray, markers_hat: jnp.ndarray,
                        seq_lengths: Optional[jnp.ndarray] = None,
                        marker_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-marker L2 norm, summed over markers, masked mean over frames.

    Reference: loss.py:23-41. Inputs (N, F, M, D).
    """
    diff = markers_hat - markers_gt
    per_sample = jnp.sum(jnp.sqrt(jnp.sum(diff * diff, axis=-1)), axis=-1)  # (N, F)
    frame_mask = _frame_mask_from_marker_mask(marker_mask)
    if frame_mask is not None:
        per_sample = per_sample * frame_mask
    if seq_lengths is not None:
        mask = mask_from_seq_lengths(seq_lengths, per_sample.shape[1])
        per_sample = jnp.sum(per_sample * mask, axis=-1) / jnp.maximum(seq_lengths, 1).astype(per_sample.dtype)
    return jnp.mean(per_sample)


def normal_mse(x_gt: jnp.ndarray, x_hat: jnp.ndarray,
               seq_lengths: Optional[jnp.ndarray] = None,
               marker_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Squared error summed over dofs and joints, masked mean over frames.

    Reference: loss.py:44-62. Inputs (N, F, M, D).
    """
    diff = x_hat - x_gt
    per_sample = jnp.sum(diff * diff, axis=(-1, -2))  # (N, F)
    frame_mask = _frame_mask_from_marker_mask(marker_mask)
    if frame_mask is not None:
        per_sample = per_sample * frame_mask
    if seq_lengths is not None:
        mask = mask_from_seq_lengths(seq_lengths, per_sample.shape[1])
        per_sample = jnp.sum(per_sample * mask, axis=-1) / jnp.maximum(seq_lengths, 1).astype(per_sample.dtype)
    return jnp.mean(per_sample)
