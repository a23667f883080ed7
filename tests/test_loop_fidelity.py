"""Train/eval loop fidelity (VERDICT round-1 item 4).

- ``has_valid_depth`` batch skip at eval (reference train.py:116-118,179-181).
- Per-epoch validation/checkpointing regardless of ``validate_every``
  divisibility (the reference's step-modulo gate silently drops checkpoints,
  train.py:137).
- Sub-native-resolution eval must not crash when no 'fusion' RNG is supplied
  (reference fusion.py:88-91 randomizes unconditionally; we fall back to a
  deterministic centered positional-encoding crop).
"""

import json
import os

import jax
import numpy as np
import pytest

from cfpnet_tpu.data.datasets import SyntheticDataset
from cfpnet_tpu.data.pipeline import DataLoader
from cfpnet_tpu.models.deltar import make_model, model_geometries


class FlaggedDataset:
    """Wraps a dataset, flagging chosen indices as missing-GT with garbage
    depth — if the loop fails to skip them, metrics move."""

    def __init__(self, base, invalid: set):
        self.base = base
        self.invalid = invalid

    def __len__(self):
        return len(self.base)

    def __getitem__(self, idx):
        s = dict(self.base[idx])
        valid = idx not in self.invalid
        if not valid:
            s["depth"] = np.full_like(s["depth"], 9.5)  # absurd GT
        s["has_valid_depth"] = np.bool_(valid)
        return s


@pytest.mark.slow
def test_eval_skips_has_valid_depth_false(tiny_config):
    from cfpnet_tpu.train.loop import evaluate

    cfg = tiny_config.replace(dataset_eval="synthetic", synthetic_length=2)
    model = make_model(cfg, tiny=True)
    ds = SyntheticDataset(cfg, "online_eval", length=2)
    geoms = model_geometries(cfg, "online_eval")
    from cfpnet_tpu.data.datasets import sample_image_f32

    sample = ds[0]
    variables = jax.jit(
        lambda r, img, hist, mask: model.init(
            {"params": r, "fusion": r}, img, hist, mask, geoms, train=False
        )
    )(
        jax.random.key(0),
        sample_image_f32(sample)[None],
        sample["hist_data"][None],
        sample["mask"][None],
    )
    params, stats = variables["params"], variables.get("batch_stats")

    loader_clean = DataLoader(FlaggedDataset(ds, invalid=set()), batch_size=1)
    loader_flagged = DataLoader(FlaggedDataset(ds, invalid={1}), batch_size=1)
    m_all = evaluate(model, cfg, params, stats, loader_clean)
    m_skip = evaluate(model, cfg, params, stats, loader_flagged)
    # the flagged sample's absurd GT must not contaminate the metrics
    assert m_skip["rmse"] != pytest.approx(m_all["rmse"])
    loader_only0 = DataLoader(
        FlaggedDataset(SyntheticDataset(cfg, "online_eval", length=1), set()),
        batch_size=1,
    )
    m_only0 = evaluate(model, cfg, params, stats, loader_only0)
    assert m_skip["rmse"] == pytest.approx(m_only0["rmse"], rel=1e-6)


@pytest.mark.slow
def test_batched_eval_matches_bs1(tiny_config):
    """--eval_bs N must reproduce the reference's bs=1 image-weighted
    metrics exactly (per-image vmap + ragged-tail padding), including the
    per-image has_valid_depth skip."""
    from cfpnet_tpu.train.loop import evaluate

    cfg = tiny_config.replace(dataset_eval="synthetic")
    model = make_model(cfg, tiny=True)
    ds = SyntheticDataset(cfg, "online_eval", length=5)  # 5 % 2 != 0: ragged
    geoms = model_geometries(cfg, "online_eval")
    from cfpnet_tpu.data.datasets import sample_image_f32

    s = ds[0]
    variables = jax.jit(
        lambda r: model.init({"params": r, "fusion": r},
                             sample_image_f32(s)[None],
                             s["hist_data"][None], s["mask"][None], geoms,
                             train=False)
    )(jax.random.key(0))
    params, stats = variables["params"], variables.get("batch_stats")

    wrapped = FlaggedDataset(ds, invalid={3})
    m1 = evaluate(model, cfg, params, stats, DataLoader(wrapped, batch_size=1))
    m2 = evaluate(model, cfg, params, stats, DataLoader(wrapped, batch_size=2))
    assert set(m1) == set(m2)
    for k in m1:
        # a1/a2/a3 are means of per-pixel threshold INDICATORS: a single
        # near-threshold pixel flipping under bs-dependent XLA reassociation
        # moves them by 1/(valid px) ~ 3e-5 on these tiny images. Allow a
        # few flips; the continuous metrics stay at f32 roundoff.
        tol = 2e-4 if k in ("a1", "a2", "a3") else 1e-5
        assert m1[k] == pytest.approx(m2[k], rel=tol), k


@pytest.mark.slow
def test_final_epoch_always_checkpoints(tmp_path, tiny_config, monkeypatch):
    from cfpnet_tpu.train.loop import run_training

    monkeypatch.chdir(tmp_path)
    # validate_every=5 never divides 2 epochs — the reference's gate would
    # finish with zero checkpoints; ours must still checkpoint the last epoch.
    cfg = tiny_config.replace(
        epochs=2, validate_every=5, dataset="synthetic", dataset_eval="synthetic",
        synthetic_length=4, name="gate_t", save_dir="results/gate_t",
    )
    run_training(cfg, tiny=True, max_steps_per_epoch=1)
    ckpts = sorted(os.listdir("checkpoints/gate_t"))
    assert "best" in ckpts
    epoch_ckpts = [c for c in ckpts if c != "best"]
    assert len(epoch_ckpts) == 1 and epoch_ckpts[0].startswith("1_")


@pytest.mark.slow
def test_run_training_device_pipeline(tmp_path, tiny_config, monkeypatch):
    """The --device_pipeline wiring in run_training (loop.py:231-243 first-
    batch prep + 262-278 per-step device_prep): a 1-epoch run completes
    with finite loss/metrics and a checkpoint. (The full fast path was also
    rehearsed for 6 epochs on real TPU — PARITY.md round-3 notes.)"""
    from cfpnet_tpu.train.loop import run_training

    monkeypatch.chdir(tmp_path)
    cfg = tiny_config.replace(
        epochs=1, validate_every=1, dataset="synthetic",
        dataset_eval="synthetic", synthetic_length=4, device_pipeline=True,
        name="devpipe_t", save_dir="results/devpipe_t",
    )
    state = run_training(cfg, tiny=True, max_steps_per_epoch=2)
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert "best" in os.listdir("checkpoints/devpipe_t")


@pytest.mark.slow
def test_eval_subnative_resolution_without_rng(tiny_config):
    """Eval forward at the train crop size (below native) with train=False
    and no rngs: the fusion positional crop must fall back deterministically."""
    cfg = tiny_config
    model = make_model(cfg, tiny=True)
    geoms_t = model_geometries(cfg, "train")
    ds = SyntheticDataset(cfg, "train", length=1)
    s = ds[0]
    img, hist, mask = s["image"][None], s["hist_data"][None], s["mask"][None]
    variables = jax.jit(
        lambda r: model.init({"params": r, "fusion": r}, img, hist, mask,
                             geoms_t, train=True)
    )(jax.random.key(0))
    out = jax.jit(
        lambda v: model.apply(v, img, hist, mask, geoms_t, train=False)
    )({"params": variables["params"], "batch_stats": variables["batch_stats"]})
    _, pred, _, _ = out
    assert np.isfinite(np.asarray(pred)).all()
    # deterministic: same call twice gives identical output
    out2 = jax.jit(
        lambda v: model.apply(v, img, hist, mask, geoms_t, train=False)
    )({"params": variables["params"], "batch_stats": variables["batch_stats"]})
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(out2[1]))


def test_nyu_eval_missing_depth_flagged(tmp_path, tiny_config):
    """A missing sync_depth file at eval yields has_valid_depth=False instead
    of a crash (exceeds reference nyu.py:145 which hardcodes True)."""
    from PIL import Image

    from cfpnet_tpu.data.datasets import NYUV2Dataset

    rng = np.random.default_rng(5)
    scene = tmp_path / "sync" / "scene_b"
    scene.mkdir(parents=True)
    names = []
    for n in range(2):
        rgb = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(scene / f"rgb_{n:05d}.jpg")
        if n == 0:  # only sample 0 gets a depth map
            depth_mm = rng.uniform(500, 3900, (480, 640)).astype(np.uint16)
            Image.fromarray(depth_mm, mode="I;16").save(
                scene / f"sync_depth_{n:05d}.png"
            )
        names.append({"filename": f"sync/scene_b/{n:05d}.h5"})
    split = tmp_path / "split.json"
    split.write_text(json.dumps({"train": names, "test": names}))
    cfg = tiny_config.replace(
        data_path_eval=str(tmp_path / "sync"), filenames_file_eval=str(split),
        native_height=480, native_width=640, eval_zone_num_cfg=8,
        eval_patch_px=56,
    )
    ds = NYUV2Dataset(cfg, "online_eval")
    assert bool(ds[0]["has_valid_depth"]) is True
    s1 = ds[1]
    assert bool(s1["has_valid_depth"]) is False
    assert s1["image_u8"].shape == (480, 640, 3)  # still a well-formed sample
