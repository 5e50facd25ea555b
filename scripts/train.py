"""Train an EM-POSE model from synthetic AMASS data on TPU.

CLI mirror of the reference training entry point (reference: scripts/train.py:
37-250): same flags (empose_tpu/config.py), same experiment-directory
conventions (config.json, cmd.txt, code.zip, logs/), same best-TEST-loss
checkpointing — but the training step compiles to one fused XLA program with
on-device data synthesis, and --dp_devices N scales by batch data-parallelism
over a TPU mesh.

Usage: python scripts/train.py --m_type lgd --m_rnn_init --m_use_gradient ...
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(config, max_steps=None):
    from empose_tpu.utils.cache import enable_compilation_cache, force_synchronous_dispatch
    enable_compilation_cache()
    force_synchronous_dispatch()
    import numpy as np
    from empose_tpu import constants as C
    from empose_tpu.data.batches import collate_real
    from empose_tpu.data.datasets import EMRBatchLoader, Loader, RealDataset
    from empose_tpu.train.loop import Trainer, fit
    from empose_tpu.utils import experiments as U
    from empose_tpu.utils.logging import ScalarWriter

    if config.seed is None:
        config.seed = int(time.time())

    # Data (reference train.py:42-69). Training batches come straight off the
    # mmap'd EMR corpus through the C++ multithreaded window gather
    # (EMRBatchLoader) with background-thread prefetch — no per-sample Python
    # objects or collate on the hot path. Window crops draw from a dedicated
    # extractor stream (reference train.py:43 seeds its extractor 4313);
    # shuffle order draws from config.seed.
    rng_extractor = np.random.RandomState(4313)
    train_loader = EMRBatchLoader(os.path.join(C.data_dir_synth(), "amass_emr"),
                                  config.bs_train, config.window_size, shuffle=True,
                                  seed=config.seed, window_mode="random",
                                  window_rng=rng_extractor, prefetch=2)
    valid_loader = EMRBatchLoader(os.path.join(C.data_dir_synth(), "3dpw_emr"),
                                  config.bs_eval, config.window_size, shuffle=False,
                                  window_mode="middle", prefetch=2)
    test_data = RealDataset(C.data_dir_real())
    test_loader = Loader(test_data, 1, collate_real, shuffle=False)

    trainer = Trainer(config)

    # Experiment dir (reference train.py:82-118).
    experiment_id = config.experiment_id
    experiment_name = trainer.model.model_name()
    experiment_name += "{}{}{}".format("-pos" if config.use_marker_pos else "",
                                       "-ori" if config.use_marker_ori else "",
                                       "-nor" if config.use_marker_nor else "")
    if config.suppression_noise_length > 0.0:
        experiment_name += f"-noise-supp-{config.suppression_noise_length}"
    if config.spherical_noise_strength > 0.0:
        experiment_name += f"-noise-spher-{config.spherical_noise_strength}"
    if config.test:
        experiment_name += "--TEST"

    if experiment_id is None:
        experiment_id = int(time.time())
        model_dir = U.create_model_dir(C.experiment_dir(), experiment_id, experiment_name)
    else:
        model_dir = U.get_model_dir(C.experiment_dir(), experiment_id)
        if config.load or config.resume:
            if model_dir is None or not os.path.exists(model_dir):
                raise ValueError(f"Cannot find model directory for experiment ID {experiment_id}")
        else:
            if model_dir is not None:
                raise ValueError(f"Model directory for experiment ID {experiment_id} already exists. "
                                 "Did you mean to use --load?")
            model_dir = U.create_model_dir(C.experiment_dir(), experiment_id, experiment_name)

    code_files = glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)), "*.py"))
    U.zip_files(code_files, os.path.join(model_dir, "code.zip"))
    config.to_json(os.path.join(model_dir, "config.json"))
    U.save_cmd(model_dir)

    if config.resume and os.path.isdir(os.path.join(model_dir, "checkpoint")):
        trainer.restore(os.path.join(model_dir, "checkpoint"))
        print(f"Resumed from step {trainer.global_step} (epoch {trainer.epoch})")

    print(f"Model created with {U.count_parameters(trainer.params)} trainable parameters")
    print(f"Saving checkpoints to {os.path.join(model_dir, 'checkpoint')}")

    writer = ScalarWriter(os.path.join(model_dir, "logs"))

    if config.profile_dir:
        import jax
        jax.profiler.start_trace(config.profile_dir)

    try:
        fit(trainer, train_loader, valid_loader, test_loader, model_dir, writer, max_steps=max_steps)
    finally:
        if config.profile_dir:
            import jax
            jax.profiler.stop_trace()
        writer.close()

    # Final eval with the best checkpoint (reference train.py:227-246).
    ckpt_dir = os.path.join(model_dir, "checkpoint")
    if os.path.isdir(ckpt_dir):
        trainer.restore(ckpt_dir)
    from empose_tpu.eval.metrics import MetricsEngine
    me = MetricsEngine(trainer.smplh)
    final_valid = trainer.evaluate_valid(valid_loader, me)
    print("[VALID FINAL] " + " ".join(f"{k}: {v:.6f}" for k, v in final_valid.items()))
    print(MetricsEngine.to_pretty_string(me.get_metrics(), experiment_id))
    final_test = trainer.evaluate_test(test_loader, me, config.eval_window_size)
    print("[TEST FINAL] " + " ".join(f"{k}: {v:.6f}" for k, v in final_test.items()))
    print(MetricsEngine.to_pretty_string(me.get_metrics(), experiment_id))
    return model_dir, trainer


if __name__ == "__main__":
    from empose_tpu.config import Configuration
    main(Configuration.parse_cmd())
