"""Generate a full synthetic asset tree for development/testing.

Creates structurally faithful stand-ins for the licensed assets:

  assets/smpl_models/smplh_amass/neutral/model.npz   synthetic SMPL-H
  assets/data_real/<subj>_<seq>_clean.npz            real-recording format
  assets/data_real/<subj>_offsets.npz                per-subject offsets
  assets/data_real/hold_out/...                      cross-subject split
  assets/data_synth/amass_emr/corpus.emr             training corpus
  assets/data_synth/3dpw_emr/corpus.emr              validation corpus

The 'real' recordings are self-consistent: sensor readings are synthesized by
the framework's own FK + virtual-sensor + offset pipeline from smooth random
poses, so models can actually fit them and golden-number regression tests are
meaningful.

Usage: python tools/make_synthetic_assets.py [--out assets] [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate_all(out_dir: str, n_real_sequences: int = 4, n_amass_sequences: int = 8,
                 n_frames: int = 120, seed: int = 0, n_subjects: int = 2) -> None:
    import jax
    import jax.numpy as jnp
    from functools import partial
    from empose_tpu import constants as C
    from empose_tpu.utils.cache import enable_compilation_cache, force_synchronous_dispatch
    enable_compilation_cache()  # FK first-compiles cost minutes on remote-compile TPU setups
    force_synchronous_dispatch()
    from empose_tpu.bodymodel import synthetic as S
    from empose_tpu.bodymodel.smplh import load_smplh, smplh_fk
    from empose_tpu.data.virtual_sensors import subset_tables, virtual_pos_and_rot
    from empose_tpu.data.emr import EMRWriter

    rng = np.random.RandomState(seed)

    # Fixed-shape padded FK helpers: sequences have varying lengths, and an
    # unpadded jit would recompile per length (minutes each on remote-compile
    # TPU setups). Pad to a shard size, slice the valid prefix.
    FK_PAD = 256
    fk_sub = jax.jit(partial(smplh_fk, want_vertices=True))
    fk_joints = jax.jit(partial(smplh_fk, want_vertices=False))

    def padded(arr, pad_to):
        k = arr.shape[0]
        if k < pad_to:
            arr = np.pad(arr, [(0, pad_to - k)] + [(0, 0)] * (arr.ndim - 1))
        return arr

    def fk_padded(fn, model_, poses, shape, trans):
        nf = poses.shape[0]
        verts_out, joints_out = [], []
        for sf in range(0, nf, FK_PAD):
            p = padded(poses[sf:sf + FK_PAD], FK_PAD)
            t = padded(trans[sf:sf + FK_PAD], FK_PAD)
            k = min(FK_PAD, nf - sf)
            v, j = fn(model_, jnp.asarray(p[:, 3:]), jnp.asarray(shape[None]),
                      jnp.asarray(p[:, :3]), jnp.asarray(t))
            if v is not None:
                verts_out.append(np.asarray(v)[:k])
            joints_out.append(np.asarray(j)[:k])
        return (np.concatenate(verts_out) if verts_out else None,
                np.concatenate(joints_out))

    # 1. SMPL-H model.
    smpl_dir = os.path.join(out_dir, "smpl_models", "smplh_amass", "neutral")
    os.makedirs(smpl_dir, exist_ok=True)
    model_path = os.path.join(smpl_dir, "model.npz")
    if not os.path.exists(model_path):
        np.savez(model_path, **S.make_synthetic_smplh(seed=seed))
    model = load_smplh(model_path)
    req, tables = subset_tables(model.faces, C.VERTEX_IDS)
    sub = model.subset(req)

    # 2. Per-subject offsets.
    real_dir = os.path.join(out_dir, "data_real")
    hold_out_dir = os.path.join(real_dir, "hold_out")
    os.makedirs(hold_out_dir, exist_ok=True)
    subjects = [f"{i:04d}" for i in range(402, 402 + n_subjects)] + ["0715"]
    offsets = {}
    for subj in subjects:
        off = S.make_offset_data(np.random.RandomState(seed + int(subj)))
        offsets[subj] = off
        np.savez(os.path.join(real_dir, f"{subj}_offsets.npz"), **off)

    # 3. Real recordings: synthesize sensor readings with the pipeline itself.
    def synth_recording(subj: str, seq_idx: int, out_path: str):
        r = np.random.RandomState(seed * 1000 + int(subj) + seq_idx)
        poses = S.smooth_random_poses(r, n_frames, 66, scale=0.35).astype(np.float32)
        shape = (r.randn(10) * 0.5).astype(np.float32)
        trans = S.smooth_random_poses(r, n_frames, 3, scale=0.3).astype(np.float32)

        verts, _ = fk_padded(fk_sub, sub, poses, shape, trans)
        pos, ori, _ = virtual_pos_and_rot(jnp.asarray(verts), tables)
        off = offsets[subj]
        ori_corr = np.einsum("fmab,mbc->fmac", np.asarray(ori), off["r"])
        pos_corr = np.asarray(pos) + np.einsum("fmab,mb->fma", np.asarray(ori), off["means"])
        # Sensor noise + occasional missing markers.
        pos_corr = pos_corr + r.randn(*pos_corr.shape) * 0.002
        masks = np.ones((n_frames, 12), np.float32)
        for _ in range(2):
            m0 = r.randint(0, 12)
            t0 = r.randint(0, n_frames - 5)
            masks[t0:t0 + 5, m0] = 0.0

        np.savez(out_path,
                 id=f"{subj}_seq{seq_idx}",
                 sensor_pos=pos_corr.reshape(n_frames, -1).astype(np.float32),
                 sensor_oris=ori_corr.reshape(n_frames, -1).astype(np.float32),
                 sensor_masks=masks,
                 smpl_poses=poses, smpl_shape=shape, smpl_trans=trans,
                 offset_means=off["means"], offset_covs=off["covs"], offset_r=off["r"])

    for i in range(n_real_sequences):
        subj = subjects[i % n_subjects]
        synth_recording(subj, i, os.path.join(real_dir, f"{subj}_seq{i}_clean.npz"))
    synth_recording("0715", 0, os.path.join(hold_out_dir, "0715_seq0_clean.npz"))

    # 4. Training corpora (AMASS-like + 3DPW-like) with precomputed joints.
    for name, count in (("amass_emr", n_amass_sequences), ("3dpw_emr", max(2, n_amass_sequences // 2))):
        corp_dir = os.path.join(out_dir, "data_synth", name)
        os.makedirs(corp_dir, exist_ok=True)
        with EMRWriter(os.path.join(corp_dir, "corpus.emr")) as w:
            for i in range(count):
                import zlib
                r = np.random.RandomState(seed + zlib.crc32(name.encode()) % 1000 + i)
                nf = n_frames + r.randint(-n_frames // 4, n_frames // 4)
                poses = S.smooth_random_poses(r, nf, 66, scale=0.35).astype(np.float32)
                shape = (r.randn(10) * 0.5).astype(np.float32)
                trans = S.smooth_random_poses(r, nf, 3, scale=0.3).astype(np.float32)
                _, joints = fk_padded(fk_joints, model, poses, shape, trans)
                joints = joints[:, : C.N_JOINTS + 1].reshape(nf, -1)
                w.add_record({"id": f"{name}_{i}", "gender": "neutral", "n_frames": int(nf)},
                             {"poses": poses, "betas": shape, "trans": trans, "joints": joints})

    os.makedirs(os.path.join(out_dir, "experiments"), exist_ok=True)
    print(f"Synthetic assets written to {out_dir}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets"))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n_real", type=int, default=4)
    p.add_argument("--n_amass", type=int, default=8)
    p.add_argument("--n_frames", type=int, default=120)
    args = p.parse_args()
    generate_all(args.out, args.n_real, args.n_amass, args.n_frames, args.seed)
