"""Sensor-fault augmentation: spherical displacement + marker suppression.

Jittable redesign of the reference noise functions (reference:
empose/data/noise_functions.py:15-164) with explicit PRNG keys instead of the
seeded torch generators (seeds 98052 / 8004). The reference's host loops over
batch entries become masked vectorized ops.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from empose_tpu import constants as C


def make_noise_fn(config, randomize_if_configured: bool, is_valid: bool = False):
    """Factory (reference noise_functions.py:15-37): at most one noise type.

    Validation keeps suppression noise if configured (the reference applies it
    at eval for robustness studies, noise_functions.py:31-33).
    """
    def no_noise(batch, key):
        return batch

    if randomize_if_configured:
        if config.spherical_noise_length > 0.0:
            assert config.suppression_noise_length <= 0.0, "Only one noise type at a time."
            return spherical_marker_noise_fn(config.spherical_noise_strength,
                                             config.spherical_noise_length,
                                             config.noise_num_markers)
        if config.suppression_noise_length > 0.0:
            return marker_suppression_noise_fn(config.suppression_noise_length,
                                               config.noise_num_markers,
                                               config.suppression_noise_value,
                                               config.n_markers)
        return no_noise
    if is_valid and config.suppression_noise_length > 0.0:
        return marker_suppression_noise_fn(config.suppression_noise_length,
                                           config.noise_num_markers,
                                           config.suppression_noise_value,
                                           config.n_markers)
    return no_noise


def spherical_marker_noise_fn(sphere_size: float, window_size: float, num_markers: int):
    """Random spherical displacement on K markers over a random time window.

    Reference noise_functions.py:40-107: radius scaled by the thigh-bone
    length measured on batch entry 0; all batch entries share the same marker
    choice; the window start varies per entry.
    """
    max_r = min(max(0.0, sphere_size), 1.0)
    ws = min(max(0.0, window_size), 1.0)
    if max_r > 0.0 and ws <= 0.0:
        raise ValueError("Temporal length of spherical marker noise is 0.0 but strength is > 0.0.")

    def apply(batch: Dict, key) -> Dict:
        if max_r <= 0.0 or "marker_pos" not in batch:
            return batch
        markers = batch["marker_pos"]
        n, f = markers.shape[0], markers.shape[1]
        m = markers.shape[-1] // 3
        ms = markers.reshape(n, f, m, 3)
        lengths = batch.get("seq_lengths")
        valid = jnp.full((n,), f) if lengths is None else jnp.asarray(lengths)
        window_len_i = jnp.floor(ws * valid).astype(jnp.int32)  # (N,)
        window_len = int(ws * f)
        if window_len == 0:
            return batch

        k_ids, k_sf, k_r, k_theta, k_phi = jax.random.split(key, 5)
        m_ids = jax.random.permutation(k_ids, m)[:num_markers]
        u = jax.random.uniform(k_sf, (n,))
        sf = jnp.floor(u * (valid - window_len_i + 1).astype(jnp.float32)).astype(jnp.int32)

        rul = C.T_TO_IDX_WO_ROOT[C.T_RUL]
        rll = C.T_TO_IDX_WO_ROOT[C.T_RLL]
        thigh_len = jnp.linalg.norm(ms[0, f // 2, rul] - ms[0, 0, rll])

        r = jax.random.uniform(k_r, (n, f, num_markers)) * max_r * thigh_len / 2
        thetas = jax.random.uniform(k_theta, (n, f, num_markers)) * np.pi * 2
        phis = jax.random.uniform(k_phi, (n, f, num_markers)) * np.pi

        xs = r * jnp.cos(thetas) * jnp.sin(phis)
        ys = r * jnp.sin(thetas) * jnp.cos(phis)
        zs = r * jnp.cos(phis)
        disp = jnp.stack([xs, ys, zs], axis=-1)  # (N, F, K, 3)

        t = jnp.arange(f)[None, :]
        in_window = (t >= sf[:, None]) & (t < (sf + window_len_i)[:, None])  # (N, F)
        target = jnp.zeros((m,), bool).at[m_ids].set(True)  # (M,)
        gate = in_window[:, :, None] & target[None, None, :]  # (N, F, M)

        # Scatter displacement onto the chosen markers.
        disp_full = jnp.zeros_like(ms).at[:, :, m_ids, :].set(disp)
        ms_noisy = jnp.where(gate[..., None], ms + disp_full, ms)

        out = dict(batch)
        out["marker_pos"] = ms_noisy.reshape(n, f, -1)
        return out

    return apply


def marker_suppression_noise_fn(window_size: float, num_markers: int, mask_value: float,
                                n_markers_in: int = 12):
    """Zero out random markers (pos+ori+normal) over a random window.

    Reference noise_functions.py:110-164. One random marker (from the model's
    active marker set) per batch entry; window start per entry.
    """
    assert n_markers_in in (6, 12)
    ws = min(max(0.0, window_size), 1.0)
    candidate_ids = np.asarray(C.S_CONFIG_6 if n_markers_in == 6 else range(12))

    def apply(batch: Dict, key) -> Dict:
        markers = batch["marker_pos"]
        n, f = markers.shape[0], markers.shape[1]
        m = markers.shape[-1] // 3
        ms = markers.reshape(n, f, m, 3)
        ms_ori = batch["marker_ori"].reshape(n, f, m, 3, 3)
        ms_nor = batch["marker_nor"].reshape(n, f, m, 3)

        # Window length/start per-sample over the VALID frames (padded chunks
        # would otherwise draw dropout windows inside the padding).
        lengths = batch.get("seq_lengths")
        valid = jnp.full((n,), f) if lengths is None else jnp.asarray(lengths)
        window_len = jnp.floor(ws * valid).astype(jnp.int32)  # (N,)

        k_ids, k_sf = jax.random.split(key)
        choice = jax.random.randint(k_ids, (n, num_markers), 0, len(candidate_ids))
        m_ids = jnp.asarray(candidate_ids)[choice]  # (N, K)
        u = jax.random.uniform(k_sf, (n,))
        sf = jnp.floor(u * (valid - window_len + 1).astype(jnp.float32)).astype(jnp.int32)

        t = jnp.arange(f)[None, :]
        in_window = (t >= sf[:, None]) & (t < (sf + window_len)[:, None])  # (N, F)
        target = jnp.zeros((n, m), bool)
        target = jax.vmap(lambda tg, ids: tg.at[ids].set(True))(target, m_ids)  # (N, M)
        gate = in_window[:, :, None] & target[:, None, :]  # (N, F, M)

        out = dict(batch)
        out["marker_pos"] = jnp.where(gate[..., None], mask_value, ms).reshape(n, f, -1)
        out["marker_ori"] = jnp.where(gate[..., None, None], mask_value, ms_ori).reshape(n, f, -1)
        out["marker_nor"] = jnp.where(gate[..., None], mask_value, ms_nor).reshape(n, f, -1)
        return out

    return apply
