"""Training-loop resume: a run interrupted after epoch 0 resumes into epoch 1
with optimizer state and step counter intact, matching an uninterrupted run's
trajectory shape (the reference's resume restores neither optimizer nor
schedule — train.py:83-94; ours must)."""

import os

import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_resume_continues_step_and_epoch(tmp_path, tiny_config, monkeypatch):
    from cfpnet_tpu.train.loop import run_training
    from cfpnet_tpu.train.checkpoint import load_checkpoint

    monkeypatch.chdir(tmp_path)
    cfg = tiny_config.replace(
        epochs=1, dataset="synthetic", dataset_eval="synthetic",
        synthetic_length=8,
        name="resume_t", save_dir="results/resume_t", validate_every=1,
    )
    state1 = run_training(cfg, tiny=True, max_steps_per_epoch=2)
    assert int(state1.step) == 2
    ckpts = sorted(os.listdir("checkpoints/resume_t"))
    assert "best" in ckpts

    cfg2 = cfg.replace(epochs=2, resume=os.path.abspath("checkpoints/resume_t/best"))
    state2 = run_training(cfg2, tiny=True, max_steps_per_epoch=2)
    # resumed at epoch 1, ran one more epoch of 2 steps
    assert int(state2.step) == 4
    # optimizer state was restored (not reset): second-moment nonzero
    leaves = jax.tree_util.tree_leaves(state2.opt_state)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves if hasattr(l, "shape"))
