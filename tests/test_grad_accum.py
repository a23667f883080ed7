"""--grad_accum: microbatched gradient accumulation inside one jitted step.

No reference equivalent (the reference trains bs=16 DataParallel,
/root/reference/train.py:45,96-135); this is a TPU-native extension that
keeps effective batch size while cutting activation memory by the
accumulation factor. The scan path must equal a hand-rolled sequential
microbatch loop: same mean gradient, same chained BN running stats.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfpnet_tpu.data.datasets import SyntheticDataset
from cfpnet_tpu.data.pipeline import collate
from cfpnet_tpu.models.deltar import make_model, model_geometries
from cfpnet_tpu.train.optim import make_optimizer
from cfpnet_tpu.train.steps import create_train_state, make_loss_fn, make_train_step


def _setup(tiny_config, bs, accum):
    cfg = tiny_config.replace(bs=bs, grad_accum=accum)
    model = make_model(cfg, tiny=True)
    geoms = model_geometries(cfg, "train")
    ds = SyntheticDataset(cfg, "train", length=bs)
    batch = jax.device_put(collate([ds[i] for i in range(bs)]))
    tx = make_optimizer(cfg, total_steps=4)
    state = create_train_state(model, cfg, jax.random.key(0), batch, geoms, tx)
    return cfg, model, geoms, batch, state


def test_grad_accum_matches_sequential_microbatches(tiny_config):
    bs, accum = 4, 2
    cfg, model, geoms, batch, state = _setup(tiny_config, bs, accum)
    rng = jax.random.key(1)

    # hand-rolled oracle: sequential microbatches, chained BN stats,
    # mean gradient, one optimizer update
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
    want = state.apply_gradients(grads=mean_grads, batch_stats=stats)

    # the production scan path (unjitted step re-jitted WITHOUT donation so
    # `state` stays alive for the oracle comparison)
    step = jax.jit(make_train_step(model, cfg, geoms, jit=False))
    got, loss = step(state, batch, rng)

    np.testing.assert_allclose(float(loss), lsum / accum, rtol=1e-5)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(got.params),
        jax.tree_util.tree_leaves_with_path(want.params),
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7,
            err_msg=f"param {pa}")
    for a, b in zip(
        jax.tree_util.tree_leaves(got.batch_stats),
        jax.tree_util.tree_leaves(want.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)
    assert int(got.step) == 1  # ONE optimizer update for the whole batch


def test_grad_accum_rejects_indivisible_batch(tiny_config):
    cfg, model, geoms, batch, state = _setup(tiny_config, 4, 3)
    step = make_train_step(model, cfg, geoms)
    with pytest.raises(ValueError, match="grad_accum"):
        step(state, batch, jax.random.key(1))
