"""Offline datagen: AMASS npz + 3DPW pkl -> 60 fps EMR corpora with joints.

Equivalent of the reference preprocessing CLI (reference:
scripts/preprocess_amass_3dpw.py:126-258): walks the AMASS tree (with the same
two-file denylist), resamples rotations via SQUAD and positions via cubic
splines to 60 fps, runs batched SMPL FK on the accelerator for ground-truth
joints, and writes EMR record files (the LMDB replacement, see
empose_tpu/data/emr.py). FK runs in one jit-compiled fixed-shape program over
padded 1000-frame shards — the TPU answer to the reference's memory-bound
windowing (preprocess_amass_3dpw.py:150-165).

Usage:
  python scripts/preprocess_amass_3dpw.py --amass   # $EM_DATA_SYNTH/amass -> amass_emr
  python scripts/preprocess_amass_3dpw.py --threedpw # $EM_DATA_SYNTH/3dpw -> 3dpw_emr
"""

from __future__ import annotations

import argparse
import os
import pickle as pkl
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scipy.interpolate import CubicSpline

AMASS_DENYLIST = ("MTR03_poses.npz", "WalkingStraightBackwards08_poses.npz")
FK_SHARD = 1024  # fixed-shape FK shard (padded) -> single compiled program


def get_all_valid_files(directory, is_valid_file, denylist):
    """Recursive deterministic file walk (reference preprocess:23-35)."""
    directory = os.path.expanduser(directory)
    data_paths = []
    for root, dirs, f_names in os.walk(directory):
        dirs.sort()
        for f in sorted(f_names):
            if is_valid_file(f) and f not in denylist:
                data_paths.append(Path(os.path.join(root, f)).resolve())
    return data_paths


def get_all_amass_file_ids(amass_dir):
    """Relative AMASS ids (reference preprocess:38-60)."""
    all_paths = get_all_valid_files(
        amass_dir, lambda x: x.endswith(".npz") and not x.endswith("shape.npz"),
        denylist=AMASS_DENYLIST)
    amass_dir = Path(amass_dir).resolve()
    return [str(p.relative_to(amass_dir)) for p in all_paths]


def resample_positions(positions: np.ndarray, fps_in: float, fps_out: float) -> np.ndarray:
    """Cubic-spline position resampling (reference preprocess:97-123)."""
    n_frames = positions.shape[0]
    assert n_frames > 1, "Resampling with one data point does not make sense."
    duration = n_frames / fps_in
    ts_in = np.arange(0, duration, 1 / fps_in)[:n_frames]
    ts_out = np.arange(0, duration, 1 / fps_out)
    return CubicSpline(ts_in, positions, axis=0)(ts_out)


class _ShardedFK:
    """Batched FK over padded fixed-size shards (one compiled program)."""

    def __init__(self):
        import jax
        import jax.numpy as jnp
        from functools import partial
        from empose_tpu import constants as C
        from empose_tpu.bodymodel.smplh import load_smplh, smplh_fk
        from empose_tpu.utils.cache import enable_compilation_cache, force_synchronous_dispatch
        enable_compilation_cache()
        force_synchronous_dispatch()
        self.C = C
        self.jnp = jnp
        # load_smplh returns host-numpy tables (HOST-CONSTANTS RULE); the
        # model is a jit ARGUMENT here, so push it to device ONCE — numpy
        # leaves would re-upload the full tables on every shard call.
        self.model = jax.device_put(load_smplh())
        self._fk = jax.jit(partial(smplh_fk, want_vertices=False))

    def joints(self, poses: np.ndarray, betas: np.ndarray, trans: np.ndarray) -> np.ndarray:
        jnp, C = self.jnp, self.C
        n = poses.shape[0]
        out = []
        for sf in range(0, n, FK_SHARD):
            chunk = poses[sf:sf + FK_SHARD]
            tchunk = trans[sf:sf + FK_SHARD]
            k = chunk.shape[0]
            if k < FK_SHARD:
                chunk = np.pad(chunk, ((0, FK_SHARD - k), (0, 0)))
                tchunk = np.pad(tchunk, ((0, FK_SHARD - k), (0, 0)))
            import jax
            _, js = self._fk(self.model, *jax.device_put((  # async upload
                np.asarray(chunk[:, 3:], np.float32),
                np.asarray(betas[None], np.float32),
                np.asarray(chunk[:, :3], np.float32),
                np.asarray(tchunk, np.float32))))
            out.append(np.asarray(js)[:k, : C.N_JOINTS + 1].reshape(k, -1))
        return np.concatenate(out, axis=0)


def convert_amass_to_emr(output_file: str, amass_root: str) -> int:
    from empose_tpu import constants as C
    from empose_tpu.data.emr import EMRWriter
    from empose_tpu.ops.quaternions import resample_rotations

    print(f"Converting AMASS data under {amass_root} -> {output_file} ...")
    file_ids = get_all_amass_file_ids(amass_root)
    fk = _ShardedFK()
    os.makedirs(os.path.dirname(output_file), exist_ok=True)

    with EMRWriter(output_file) as w:
        for i, file_id in enumerate(file_ids):
            sample = np.load(os.path.join(amass_root, file_id))
            poses = sample["poses"][:, : C.MAX_INDEX_ROOT_AND_BODY]
            betas = sample["betas"][: C.N_SHAPE_PARAMS]
            trans = sample["trans"]
            fps = float(sample["mocap_framerate"])
            gender = sample["gender"].tolist()
            if not isinstance(gender, str):
                gender = gender.decode()

            n_frames, n_coords = poses.shape
            poses = resample_rotations(poses.reshape(n_frames, -1, 3), fps, C.FPS).reshape(-1, n_coords)
            trans = resample_positions(trans, fps, C.FPS)
            n_frames = poses.shape[0]
            joints = fk.joints(poses, betas, trans)
            assert joints.shape[0] == n_frames

            w.add_record({"id": file_id, "gender": gender, "n_frames": int(n_frames)},
                         {"poses": poses.astype(np.float32), "betas": betas.astype(np.float32),
                          "trans": trans.astype(np.float32), "joints": joints.astype(np.float32)})
            if (i + 1) % 100 == 0:
                print(f"  {i + 1}/{len(file_ids)}")
    print(f"Wrote {len(file_ids)} sequences.")
    return len(file_ids)


def convert_3dpw_to_emr(output_file: str, threedpw_root: str) -> int:
    """3DPW pkl variant (reference preprocess:192-258): per-subject records,
    genders normalized to female/male, poses already at 60 Hz."""
    from empose_tpu import constants as C
    from empose_tpu.data.emr import EMRWriter

    print(f"Converting 3DPW data under {threedpw_root} -> {output_file} ...")
    fk = _ShardedFK()
    pkl_files = []
    for root_dir, dirs, files in os.walk(threedpw_root):
        dirs.sort()
        for f in sorted(files):
            if f.endswith(".pkl"):
                pkl_files.append(os.path.join(root_dir, f))

    os.makedirs(os.path.dirname(output_file), exist_ok=True)
    count = 0
    with EMRWriter(output_file) as w:
        for path in pkl_files:
            file_id = os.path.split(path)[-1]
            sample = pkl.load(open(path, "rb"), encoding="latin1")
            n_subjects = len(sample["poses_60Hz"])
            for s in range(n_subjects):
                poses = sample["poses_60Hz"][s][:, : C.MAX_INDEX_ROOT_AND_BODY]
                betas = sample["betas"][s][: C.N_SHAPE_PARAMS]
                trans = sample["trans_60Hz"][s]
                gender = "female" if sample["genders"][s] == "f" else "male"
                n_frames = poses.shape[0]
                joints = fk.joints(poses, betas, trans)
                assert joints.shape[0] == n_frames
                w.add_record({"id": file_id, "gender": gender, "n_frames": int(n_frames)},
                             {"poses": poses.astype(np.float32), "betas": betas.astype(np.float32),
                              "trans": trans.astype(np.float32), "joints": joints.astype(np.float32)})
                count += 1
    print(f"Wrote {count} sequences.")
    return count


if __name__ == "__main__":
    from empose_tpu import constants as C

    p = argparse.ArgumentParser()
    p.add_argument("--amass", action="store_true")
    p.add_argument("--threedpw", action="store_true")
    p.add_argument("--amass_in", default=None)
    p.add_argument("--amass_out", default=None)
    p.add_argument("--threedpw_in", default=None)
    p.add_argument("--threedpw_out", default=None)
    args = p.parse_args()

    if args.amass or args.amass_in:
        convert_amass_to_emr(args.amass_out or os.path.join(C.data_dir_synth(), "amass_emr", "corpus.emr"),
                             args.amass_in or os.path.join(C.data_dir_synth(), "amass"))
    if args.threedpw or args.threedpw_in:
        convert_3dpw_to_emr(args.threedpw_out or os.path.join(C.data_dir_synth(), "3dpw_emr", "corpus.emr"),
                            args.threedpw_in or os.path.join(C.data_dir_synth(), "3dpw"))
    if not (args.amass or args.amass_in or args.threedpw or args.threedpw_in):
        p.print_help()
