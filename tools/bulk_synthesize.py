"""Bulk on-device sensor-data synthesis: mocap corpus -> training-ready EMR.

Pre-materializes the synthetic EM measurements (normalize-root -> subset FK ->
virtual sensors -> offsets) at device speed. Each pass draws ONE random
window per corpus sequence (use --passes N for more coverage); records carry
the full training-batch field set (marker_pos/marker_ori/marker_nor, poses
normalized, shapes, zeroed trans, joints, offset_t/offset_r), so a consumer
can assemble model-ready batches without further synthesis. Useful when the
same corpus is consumed many times (hyperparameter sweeps); scales over a
data-parallel mesh with --dp_devices (the workload is embarrassingly
batch-parallel, SURVEY.md §2.3).

Usage:
  python tools/bulk_synthesize.py --corpus $EM_DATA_SYNTH/amass_emr \
      --out /tmp/materialized.emr --window 64 [--dp_devices 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synthesize_corpus(corpus_path: str, out_path: str, window: int = 64, batch: int = 32,
                      noise_level: int = 0, seed: int = 0, dp_devices: int = 1,
                      passes: int = 1) -> int:
    from empose_tpu.utils.cache import enable_compilation_cache, force_synchronous_dispatch
    enable_compilation_cache()
    force_synchronous_dispatch()
    import jax
    import jax.numpy as jnp
    from empose_tpu import constants as C
    from empose_tpu.bodymodel.smplh import load_smplh
    from empose_tpu.data import transforms as T
    from empose_tpu.data.datasets import EMRBatchLoader, get_all_offset_files
    from empose_tpu.data.emr import EMRWriter
    from empose_tpu.nn.models import SensorSMPL
    from empose_tpu.parallel import mesh as M

    sensor = SensorSMPL(load_smplh())
    bank = T.OffsetBank.from_offset_files(list(get_all_offset_files().values()))

    def synth(batch_d, key):
        b = T.normalize_root(batch_d)
        b = T.smpl_fk_markers(sensor, b)
        b = T.sample_markers_with_offsets(b, bank, key, noise_level, randomize=noise_level >= 0)
        return {k: b[k] for k in ("marker_pos", "marker_ori", "marker_nor", "joints_gt",
                                  "poses", "trans", "offset_t", "offset_r")}

    mesh = M.make_mesh(dp_devices) if dp_devices > 1 else None
    if mesh is not None:
        synth_jit = jax.jit(synth, in_shardings=(M.batch_sharding(mesh), M.replicated(mesh)),
                            out_shardings=M.batch_sharding(mesh))
    else:
        synth_jit = jax.jit(synth)

    # The loader's RNG drives the random window crops: seed it so different
    # --seed values materialize different windows.
    loader = EMRBatchLoader(corpus_path, batch, window, shuffle=False, seed=seed,
                            pad_multiple=window)
    key = jax.random.PRNGKey(seed)
    count, t0 = 0, time.time()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with EMRWriter(out_path) as w:
      for _pass in range(passes):
        for host_batch in loader:
            ids = host_batch["ids"]
            lengths = np.asarray(host_batch["seq_lengths"])
            shapes = np.asarray(host_batch["shapes"])
            if mesh is not None:
                host_batch = M.pad_batch_to_devices(host_batch, dp_devices)
                device_batch = M.shard_batch(host_batch, mesh)
            else:
                device_batch = {k: jnp.asarray(v) for k, v in host_batch.items() if k != "ids"}
            key, k = jax.random.split(key)
            out = synth_jit(device_batch, k)
            out = {k2: np.asarray(v) for k2, v in out.items()}
            for i, seq_id in enumerate(ids):
                L = int(lengths[i])
                w.add_record(
                    {"id": f"{seq_id}@w{count + i}", "n_frames": L},
                    {"marker_pos": out["marker_pos"][i, :L],
                     "marker_ori": out["marker_ori"][i, :L],
                     "marker_nor": out["marker_nor"][i, :L],
                     "joints": out["joints_gt"][i, :L],
                     "poses": out["poses"][i, :L],
                     "trans": out["trans"][i, :L],
                     "betas": shapes[i],
                     "offset_t": out["offset_t"][i],
                     "offset_r": out["offset_r"][i]})
            count += len(ids)
    dt = time.time() - t0
    print(f"Synthesized {count} windows x {window} frames in {dt:.1f}s "
          f"({count * window / dt:,.0f} frames/s) -> {out_path}")
    return count


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--window", type=int, default=64)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--offset_noise_level", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dp_devices", type=int, default=1)
    p.add_argument("--passes", type=int, default=1,
                   help="Random window draws per sequence.")
    args = p.parse_args()
    synthesize_corpus(args.corpus, args.out, args.window, args.batch,
                      args.offset_noise_level, args.seed, args.dp_devices, args.passes)
