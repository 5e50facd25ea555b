"""Preprocessing pipeline: root normalization, on-device FK + sensor synthesis.

TPU-native redesign of the reference transform pipeline (reference:
empose/data/transforms.py:23-282). The reference chains Python callables that
mutate a batch object on the GPU inside the train loop; here the whole chain
(NormalizeRoot -> SMPL FK -> SampleMarkersWithOffsets -> noise) is ONE pure
jitted function over batch dicts, with explicit jax PRNG keys replacing the
reference's four seeded host RNG streams (np RandomState(6273) at
transforms.py:161, torch MultivariateNormal at transforms.py:157-158, and the
noise generators at noise_functions.py:59/124). Randomness is therefore
reproducible per-step from a root seed but not draw-for-draw identical to
torch — augmentation distributions, not streams, are the contract; the real-
data eval path is noise-free either way (reference data.py:304-309).

Host-side transforms (window extraction, real-marker normalization) live at
the bottom; they run in the input pipeline, not on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from empose_tpu import constants as C
from empose_tpu.ops.so3 import aa2rot, rot2aa
from empose_tpu.ops import quaternions as Q

_HI = lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Offset bank (per-subject sensor mounting offsets)
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class OffsetBank:
    """Stacked per-subject offset distributions (reference transforms.py:137-161).

    means (S, M, 3), chol (S, M, 3, 3) Cholesky factors of the covariances,
    r (S, M, 3, 3) local->sensor rotation offsets.
    """

    means: jnp.ndarray
    chol: jnp.ndarray
    r: jnp.ndarray

    def tree_flatten(self):
        return (self.means, self.chol, self.r), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @property
    def n_subjects(self):
        return self.means.shape[0]

    @property
    def n_markers(self):
        return self.means.shape[1]

    @staticmethod
    def from_offset_files(offset_files) -> "OffsetBank":
        means, covs, rs = [], [], []
        vertex_ids = None
        for f in offset_files:
            data = np.load(f)
            means.append(np.asarray(data["means"], np.float32))
            covs.append(np.asarray(data["covs"], np.float32))
            rs.append(np.asarray(data["r"], np.float32))
            vertex_ids = data["vertex_ids"].tolist()
        means = np.stack(means)
        covs = np.stack(covs)
        chol = np.linalg.cholesky(covs + 1e-12 * np.eye(3, dtype=np.float32))
        bank = OffsetBank(jnp.asarray(means), jnp.asarray(chol.astype(np.float32)), jnp.asarray(np.stack(rs)))
        object.__setattr__(bank, "vertex_ids", vertex_ids)
        return bank


# ---------------------------------------------------------------------------
# Device transforms
# ---------------------------------------------------------------------------

def normalize_root(batch: Dict) -> Dict:
    """Zero the translation; left-multiply the inverse frame-0 root rotation.

    Reference transforms.py:229-256. Operates on batch['poses'] (N, F, 66)
    and batch['trans'] (N, F, 3); stores the originals under *_source.
    """
    poses = batch["poses"]
    n, f = poses.shape[0], poses.shape[1]
    root = poses[:, :, :3]
    root_ori0 = aa2rot(root[:, 0])  # (N, 3, 3)
    root_ori_inv = jnp.swapaxes(root_ori0, -1, -2)[:, None]  # (N, 1, 3, 3)
    root_all = aa2rot(root)  # (N, F, 3, 3)
    new_root = rot2aa(jnp.matmul(root_ori_inv, root_all, precision=_HI))
    out = dict(batch)
    out["trans_source"] = batch["trans"]
    out["root_pose_source"] = root
    out["poses"] = jnp.concatenate([new_root, poses[:, :, 3:]], axis=-1)
    out["trans"] = jnp.zeros_like(batch["trans"])
    return out


def smpl_fk_markers(sensor_smpl, batch: Dict) -> Dict:
    """FK over the whole batch -> GT joints + raw virtual sensor frames.

    Fuses the reference's SMPLFK transform (transforms.py:259-282) with the
    sensor sampling's FK consumer: only the sensor-subset vertices are
    skinned, and the virtual frames are computed in the same jitted program.
    """
    poses = batch["poses"]
    n, f = poses.shape[0], poses.shape[1]
    flat = poses.reshape(n * f, -1)
    shapes = jnp.repeat(batch["shapes"], f, axis=0)
    # Reference FK uses the batch trans (zeroed by normalize_root). The
    # lane-major program serves this under the EMPOSE_FK_LANES gate (same
    # math as the row-major path; ~5x on the datagen stage of a train step).
    m_pos, m_ori, m_nor, joints = sensor_smpl.markers_and_joints(
        flat, shapes, trans=batch["trans"].reshape(n * f, 3))

    out = dict(batch)
    out["joints_gt"] = joints.reshape(n, f, -1)
    out["marker_pos_vertex"] = m_pos.reshape(n, f, -1)
    out["marker_ori_vertex"] = m_ori.reshape(n, f, -1)
    out["marker_nor_vertex"] = m_nor.reshape(n, f, -1)
    return out


def sample_markers_with_offsets(batch: Dict, bank: OffsetBank, key, noise_level: int,
                                randomize: bool) -> Dict:
    """Apply per-subject mounting offsets to the raw virtual frames.

    Reference transforms.py:163-226 with the same noise-level semantics:
      -1 / not randomize: per-subject mean offsets;
       0: one covariance sample per sequence;
       1: one covariance sample per frame;
       2: zero translational offsets;
       3: zero translational offsets AND identity rotation offsets.
    """
    n, f = batch["poses"].shape[0], batch["poses"].shape[1]
    m = bank.n_markers
    k_subj, k_noise = jax.random.split(key)
    s_idx = jax.random.randint(k_subj, (n,), 0, bank.n_subjects)

    means = bank.means[s_idx]  # (N, M, 3)
    chol = bank.chol[s_idx]  # (N, M, 3, 3)
    local_offsets = jnp.broadcast_to(means[:, None], (n, f, m, 3))
    if randomize:
        if noise_level == 0:
            z = jax.random.normal(k_noise, (n, m, 3))
            samp = means + jnp.squeeze(jnp.matmul(chol, z[..., None], precision=_HI), -1)
            local_offsets = jnp.broadcast_to(samp[:, None], (n, f, m, 3))
        elif noise_level == 1:
            z = jax.random.normal(k_noise, (n, f, m, 3))
            samp = means[:, None] + jnp.squeeze(
                jnp.matmul(chol[:, None], z[..., None], precision=_HI), -1)
            local_offsets = samp
        elif noise_level in (2, 3):
            local_offsets = jnp.zeros_like(local_offsets)
        elif noise_level != -1:
            raise ValueError(f"Unknown noise level {noise_level}")

    ms = batch["marker_pos_vertex"].reshape(n, f, m, 3)
    ori = batch["marker_ori_vertex"].reshape(n, f, m, 3, 3)
    markers_new = ms + jnp.squeeze(jnp.matmul(ori, local_offsets[..., None], precision=_HI), -1)

    r = bank.r[s_idx][:, None]  # (N, 1, M, 3, 3)
    r = jnp.broadcast_to(r, (n, f, m, 3, 3))
    if randomize and noise_level == 3:
        r = jnp.broadcast_to(jnp.eye(3), (n, f, m, 3, 3))
    ori_new = jnp.matmul(ori, r, precision=_HI)

    out = dict(batch)
    out["marker_pos"] = markers_new.reshape(n, f, -1)
    out["marker_ori"] = ori_new.reshape(n, f, -1)
    out["marker_nor"] = ori_new[..., 2].reshape(n, f, -1)
    # Offsets assumed known downstream = subject means + frame-0 rotation
    # (reference transforms.py:221-224).
    out["offset_t"] = means
    out["offset_r"] = r[:, 0]
    return out


def smpl_fk_markers_with_offsets(sensor_smpl, batch: Dict, bank: OffsetBank, key,
                                 noise_level: int, randomize: bool) -> Dict:
    """Fused lane-major datagen: FK + sensor frames + mounting offsets in ONE
    lane-domain program.

    Value-equivalent (up to f32 reassociation) to
    ``smpl_fk_markers`` -> ``sample_markers_with_offsets`` with the SAME key
    splits and draw shapes, but the offset application stays in lane layout
    ((M, 3, N) planes, ops/fk_lanes.py) instead of dropping back to row-major
    ``(n, f, m, 3, 3)`` batched 3x3 matmuls — which a bs64 x w256 trace showed
    tiling at T(4,128) (~1% occupancy, 1.8 ms for the ori compose alone) plus
    a 7 MB broadcast of the per-subject rotation offsets. Each output tensor
    is transposed out of the lane domain exactly once. Reference semantics:
    transforms.py:259-282 (SMPLFK) + transforms.py:163-226 (offset sampler),
    same noise-level table as ``sample_markers_with_offsets``.
    """
    from empose_tpu.ops.fk_lanes import apply_offsets_lanes, subject_to_lanes

    poses = batch["poses"]
    n, f = poses.shape[0], poses.shape[1]
    m = bank.n_markers
    k_subj, k_noise = jax.random.split(key)
    s_idx = jax.random.randint(k_subj, (n,), 0, bank.n_subjects)
    means = bank.means[s_idx]                                         # (N, M, 3)

    # Local translational offsets, in lane layout (M, 3, n*f).
    t_lanes = subject_to_lanes(means, f)
    if randomize:
        if noise_level == 0:
            z = jax.random.normal(k_noise, (n, m, 3))
            samp = means + jnp.squeeze(
                jnp.matmul(bank.chol[s_idx], z[..., None], precision=_HI), -1)
            t_lanes = subject_to_lanes(samp, f)
        elif noise_level == 1:
            z = jax.random.normal(k_noise, (n, f, m, 3))
            chol_l = subject_to_lanes(bank.chol[s_idx], f)            # (M, 3, 3, N)
            z_l = z.transpose(2, 3, 0, 1).reshape(m, 3, n * f)
            t_lanes = t_lanes + jnp.sum(chol_l * z_l[:, None], axis=2)
        elif noise_level in (2, 3):
            t_lanes = None
        elif noise_level != -1:
            raise ValueError(f"Unknown noise level {noise_level}")

    identity_r = randomize and noise_level == 3
    r_lanes = None if identity_r else subject_to_lanes(bank.r[s_idx], f)

    flat = poses.reshape(n * f, -1)
    shapes = jnp.repeat(batch["shapes"], f, axis=0)
    mk, frames, tg = sensor_smpl.lane_fk.frames_lanes(flat, shapes)
    pos_l, ori_l = apply_offsets_lanes(mk, frames, t_lanes, r_lanes)

    trans = batch["trans"].reshape(n * f, 1, 3)
    out = dict(batch)
    out["joints_gt"] = (tg.transpose(2, 0, 1) + trans).reshape(n, f, -1)
    out["marker_pos"] = (pos_l.transpose(2, 0, 1) + trans).reshape(n, f, -1)
    out["marker_ori"] = ori_l.transpose(3, 0, 1, 2).reshape(n, f, -1)
    out["marker_nor"] = ori_l[:, :, 2].transpose(2, 0, 1).reshape(n, f, -1)
    out["offset_t"] = means
    out["offset_r"] = (jnp.broadcast_to(jnp.eye(3), (n, m, 3, 3)) if identity_r
                       else bank.r[s_idx])
    return out


def make_preprocess_fn(sensor_smpl, bank: OffsetBank, config, randomize_if_configured: bool):
    """End-to-end preprocess factory (reference transforms.py:23-48).

    Returns pure f(batch, key, mode) with mode in
    {'all', 'normalize_only', 'after_normalize'}. 'all' and 'after_normalize'
    are jit-able as a whole; noise is applied per the config.
    """
    from empose_tpu.data.noise import make_noise_fn
    noise_fn = make_noise_fn(config, randomize_if_configured)
    noise_level = config.offset_noise_level if randomize_if_configured else -1
    if not config.use_real_offsets:
        raise ValueError("We expect to use the real offsets.")

    # The fused lane-major datagen engages with the lane FK program; the
    # two-step row-major path remains the parity oracle and the fallback
    # (EMPOSE_DATAGEN_FUSED=0 forces it for regression attribution).
    import os as _os
    fused = (getattr(sensor_smpl, "use_lanes", False)
             and _os.environ.get("EMPOSE_DATAGEN_FUSED", "1") != "0")

    def synth(batch, key):
        k_off, k_noise = jax.random.split(key)
        if fused:
            batch = smpl_fk_markers_with_offsets(sensor_smpl, batch, bank, k_off,
                                                 noise_level, randomize_if_configured)
        else:
            batch = smpl_fk_markers(sensor_smpl, batch)
            batch = sample_markers_with_offsets(batch, bank, k_off, noise_level,
                                                randomize_if_configured)
        return noise_fn(batch, k_noise)

    def preprocess(batch, key, mode="all"):
        if mode == "all":
            return synth(normalize_root(batch), key)
        if mode == "normalize_only":
            return normalize_root(batch)
        if mode == "after_normalize":
            return synth(batch, key)
        raise ValueError(f"Mode '{mode}' unknown.")

    return preprocess


# ---------------------------------------------------------------------------
# Host transforms (input pipeline)
# ---------------------------------------------------------------------------

def extract_window(n_frames: int, window_size: int, rng: Optional[np.random.RandomState],
                   mode: str = "random"):
    """Pick a (start, end) crop; reference transforms.py:66-96."""
    assert mode in ("random", "beginning", "middle")
    if n_frames <= window_size:
        return 0, n_frames
    if mode == "beginning":
        return 0, window_size
    if mode == "middle":
        mid = n_frames // 2
        sf = mid - window_size // 2
        return sf, sf + window_size
    sf = rng.randint(0, n_frames - window_size + 1)
    return sf, sf + window_size


def normalize_real_markers(marker_pos: np.ndarray, marker_ori: np.ndarray,
                           smpl_poses: np.ndarray, smpl_trans: np.ndarray):
    """Rotate real sensor data into the frame-0 root frame (host numpy).

    Reference transforms.py:99-129: positions are translated by the per-frame
    root translation and rotated by the inverse FRAME-0 root orientation;
    orientations are left-multiplied by the same inverse rotation.
    :param marker_pos: (F, M*3); :param marker_ori: (F, M*9);
    :param smpl_poses: (F, 66); :param smpl_trans: (F, 3).
    """
    f = marker_pos.shape[0]
    m = marker_pos.shape[-1] // 3
    q0 = Q.np_quat_from_aa(smpl_poses[0:1, :3])  # (1, 4)
    w, x, y, z = q0[0]
    r0 = np.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    r0_inv = r0.T

    pos = marker_pos.reshape(f, m, 3) - smpl_trans[:, None, :]
    pos = np.einsum("ab,fmb->fma", r0_inv, pos)
    ori = np.einsum("ab,fmbc->fmac", r0_inv, marker_ori.reshape(f, m, 3, 3))
    return pos.reshape(f, -1), ori.reshape(f, -1)
