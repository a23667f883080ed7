"""Sharded-training tests on the 8-virtual-device CPU mesh."""

import jax
import numpy as np
import pytest

from cfpnet_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    batch = {"x": np.arange(8 * 4, dtype=np.float32).reshape(8, 4)}
    sharded = shard_batch(batch, mesh)
    x = sharded["x"]
    assert x.sharding == batch_sharding(mesh)
    # each device holds 1 row
    assert len(x.addressable_shards) == 8
    assert x.addressable_shards[0].data.shape == (1, 4)
    np.testing.assert_array_equal(np.asarray(x), batch["x"])


@pytest.mark.slow
def test_sharded_train_step_matches_single_device(tiny_config):
    """DP over 8 devices computes the same loss/update as 1 device."""
    from cfpnet_tpu.data.datasets import SyntheticDataset
    from cfpnet_tpu.data.pipeline import collate
    from cfpnet_tpu.models.deltar import make_model, model_geometries
    from cfpnet_tpu.train.optim import make_optimizer
    from cfpnet_tpu.train.steps import create_train_state, make_train_step

    cfg = tiny_config.replace(bs=8)
    model = make_model(cfg, tiny=True)
    geoms = model_geometries(cfg, "train")
    ds = SyntheticDataset(cfg, "train", length=8)
    host_batch = collate([ds[i] for i in range(8)])

    tx = make_optimizer(cfg, total_steps=4)
    rng = jax.random.key(0)

    mesh = make_mesh(8)
    sharded = shard_batch(host_batch, mesh)
    state8 = create_train_state(model, cfg, rng, sharded, geoms, tx)
    step8 = make_train_step(model, cfg, geoms)
    state8, loss8 = step8(state8, sharded, jax.random.key(1))

    single = jax.device_put(host_batch, jax.devices()[0])
    state1 = create_train_state(model, cfg, rng, single, geoms, tx)
    step1 = make_train_step(model, cfg, geoms)
    state1, loss1 = step1(state1, single, jax.random.key(1))

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-4)
    # updated params agree across the sharded/unsharded paths
    p8 = jax.tree_util.tree_leaves(state8.params)[0]
    p1 = jax.tree_util.tree_leaves(state1.params)[0]
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), rtol=1e-3, atol=1e-5)


# NOTE: __graft_entry__.dryrun_multichip(8) is exercised directly by the
# round driver (and in scripts/check_entry.py); running it here would add a
# third full compile of the train step to the suite on this 1-core box.
