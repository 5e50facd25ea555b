"""Checkpoint/resume demo on the flagship LGD model: prove seamless resume.

Runs the released LGD-RNN-6 retrain config (reference README.md:210-228:
bs 12, window 32, N=2 grad iterations) on whatever accelerator jax sees,
crossing a full eval -> checkpoint -> restore cycle:

  phase A: train to step K with a mid-run eval, save the FULL train state
           (params + BN state + Adam moments + RNG + counters; the reference
           saves optimizer state but never restores it, train.py:190-205 vs
           eval/helpers.py:131-137 — true resume does not exist there);
  phase B: fresh process-state Trainer, restore, continue to 2K;
  control: an uninterrupted 2K-step run over the identical batch order.

Seamlessness criterion: post-resume losses EQUAL the uninterrupted run's
losses step for step (the restore round-trips every piece of train state).
Also prints wall-clock: train step / valid pass / test pass, the reference's
example numbers being 0.700 s / 3.117 s / 73.173 s (README.md:230-232).

Usage: python tools/demo_resume.py [K] [assets_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K = int(sys.argv[1]) if len(sys.argv) > 1 else 60
d = sys.argv[2] if len(sys.argv) > 2 else "/tmp/resume_assets"
if not os.path.exists(d):
    from tools.make_synthetic_assets import generate_all
    generate_all(d, n_real_sequences=3, n_amass_sequences=40, n_frames=200, seed=3)
os.environ["SMPL_MODELS"] = os.path.join(d, "smpl_models")
os.environ["EM_DATA_REAL"] = os.path.join(d, "data_real")
os.environ["EM_DATA_SYNTH"] = os.path.join(d, "data_synth")
os.environ["EM_EXPERIMENTS"] = os.path.join(d, "experiments")

from empose_tpu.utils.cache import enable_compilation_cache, force_synchronous_dispatch

enable_compilation_cache()


force_synchronous_dispatch()
from empose_tpu.config import Configuration
from empose_tpu.data.batches import collate_amass, collate_real
from empose_tpu.data.datasets import EMRBatchLoader, EMRSequenceDataset, Loader, RealDataset
from empose_tpu.eval.metrics import MetricsEngine
from empose_tpu.train.loop import Trainer

CKPT = os.path.join(d, "resume_ckpt")

# The released LGD-RNN-6 retrain hyperparameters (reference README.md:210-228).
cfg = Configuration.from_dict(dict(
    m_type="ief", m_hidden_size=512, m_num_layers=2, m_num_iterations=2,
    m_use_gradient=True, m_average_shape=True, m_rnn_init=True,
    m_rnn_hidden_size=512, m_reprojection_loss_weight=0.01, m_fk_loss=0.1,
    m_pose_loss_weight=10.0, use_marker_pos=True, use_marker_ori=True,
    use_real_offsets=True, offset_noise_level=0, n_markers=6,
    window_size=32, bs_train=12, bs_eval=12, lr=5e-4, seed=17))

# Fixed batch order shared by all runs.
loader = EMRBatchLoader(os.path.join(d, "data_synth", "amass_emr"), cfg.bs_train,
                        cfg.window_size, shuffle=True, seed=7, pad_multiple=32)
batches = []
while len(batches) < 2 * K:
    batches.extend(loader)
batches = batches[: 2 * K]

valid_loader = Loader(EMRSequenceDataset(os.path.join(d, "data_synth", "3dpw_emr"),
                                         window_size=cfg.window_size, window_mode="middle"),
                      6, collate_amass, shuffle=False)
test_loader = Loader(RealDataset(os.environ["EM_DATA_REAL"]), 1, collate_real, shuffle=False)


def run(trainer, steps, record, t_step=None):
    for b in batches[trainer.global_step: trainer.global_step + steps]:
        t0 = time.time()
        vals = trainer.train_step({k: np.asarray(v) for k, v in b.items() if k != "ids"})
        loss = float(vals["total_loss"])  # blocks on the device result
        if t_step is not None and trainer.global_step > 1:
            t_step.append(time.time() - t0)
        record.append(loss)


me = MetricsEngine(Trainer(cfg, seed=17).smplh)

# ---- Phase A: train K steps, eval, checkpoint. --------------------------
print(f"phase A: 0 -> {K}", flush=True)
tA = Trainer(cfg, seed=17)
losses_A, t_steps = [], []
run(tA, K, losses_A, t_steps)
t0 = time.time()
valid_losses = tA.evaluate_valid(valid_loader, me)
t_valid = time.time() - t0
t0 = time.time()
test_losses = tA.evaluate_test(test_loader, me, 256)
t_test = time.time() - t0
mpjpe_mid = me.get_metrics()["MPJPE [mm]"]
tA.save(CKPT)

# ---- Phase B: fresh trainer, restore, continue to 2K. -------------------
print(f"phase B: restore -> {2 * K}", flush=True)
tB = Trainer(cfg, seed=999)  # different seed: everything must come from the checkpoint
tB.restore(CKPT)
assert tB.global_step == K
losses_B = []
run(tB, K, losses_B)

# ---- Control: uninterrupted 2K steps, identical batch order. ------------
print("control: uninterrupted", flush=True)
tC = Trainer(cfg, seed=17)
losses_C = []
run(tC, 2 * K, losses_C)

# ---- Verdict. ------------------------------------------------------------
pre = np.abs(np.asarray(losses_A) - np.asarray(losses_C[:K])).max()
post = np.abs(np.asarray(losses_B) - np.asarray(losses_C[K:])).max()
print(f"\nmax |loss diff| vs uninterrupted: pre-checkpoint {pre:.2e}, post-resume {post:.2e}")
print(f"train-step wall clock: mean {np.mean(t_steps):.3f}s  median {np.median(t_steps):.3f}s "
      f"(reference example 0.700s, README.md:230)")
print(f"valid pass: {t_valid:.3f}s   test pass: {t_test:.3f}s "
      f"(reference example 3.117s / 73.173s on its real datasets)")
print(f"held-out MPJPE at step {K}: {mpjpe_mid:.2f} mm")
print(f"loss at step 1 / {K} / {2 * K}: {losses_C[0]:.4f} / {losses_C[K - 1]:.4f} / {losses_C[-1]:.4f}")
ok = post < 1e-4
print("RESUME SEAMLESS" if ok else "RESUME DIVERGED", flush=True)
sys.exit(0 if ok else 1)
