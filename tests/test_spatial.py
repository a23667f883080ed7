"""Spatial partitioning (beyond parity — the reference has no TP/SP of any
kind, SURVEY §2.6): image rows sharded over a 2-D ('data','spatial') mesh.

The jitted eval step is UNCHANGED — GSPMD propagates the input sharding
through every conv (halo exchanges over the mesh) and regroups the fusion
tokens with collectives. Correctness is exercised here on the 8 virtual CPU
devices; single-image latency scaling needs real multi-chip ICI.
"""

import numpy as np

import jax

from cfpnet_tpu.data.datasets import SyntheticDataset
from cfpnet_tpu.data.pipeline import collate
from cfpnet_tpu.models.deltar import make_model, model_geometries
from cfpnet_tpu.parallel.mesh import make_mesh_2d, shard_batch_spatial
from cfpnet_tpu.train.steps import make_eval_step


def _eval_setup(tiny_config):
    cfg = tiny_config.replace(bs=2, mode="online_eval")
    model = make_model(cfg, tiny=True)
    geoms = model_geometries(cfg, "online_eval")
    ds = SyntheticDataset(cfg, "online_eval", length=2)
    batch = collate([ds[i] for i in range(2)])
    variables = jax.jit(
        lambda r: model.init(
            {"params": r, "fusion": jax.random.fold_in(r, 1)},
            jax.numpy.zeros((1, cfg.native_height, cfg.native_width, 3)),
            jax.numpy.full((1, 4, cfg.zone_sample_num), 2.0),
            jax.numpy.ones((1, 4), bool),
            geoms, train=False,
        )
    )(jax.random.key(0))
    step = make_eval_step(model, cfg, geoms, protocol="validate")
    return cfg, variables, batch, step


def test_spatial_sharded_eval_matches_single_device(tiny_config):
    cfg, variables, batch, step = _eval_setup(tiny_config)
    params, stats = variables["params"], variables.get("batch_stats")

    ref, _ = step(params, stats, jax.device_put(batch))
    ref = np.asarray(ref)

    mesh = make_mesh_2d(2, 4)  # bs=2 over 'data', 64 rows over 'spatial'
    sharded = shard_batch_spatial(batch, mesh)
    img_key = "image_u8" if "image_u8" in sharded else "image"
    spec = sharded[img_key].sharding.spec
    assert tuple(spec) == ("data", "spatial"), spec

    got, _ = step(params, stats, sharded)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-5)


def test_mesh_2d_rejects_oversubscription(tiny_config):
    import pytest

    with pytest.raises(ValueError, match="devices"):
        make_mesh_2d(4, 4)  # 16 > the 8 virtual devices


def test_shard_batch_spatial_on_1d_mesh_falls_back(tiny_config):
    from cfpnet_tpu.parallel.mesh import make_mesh

    cfg, variables, batch, step = _eval_setup(tiny_config)
    mesh = make_mesh(2, batch_size=2)
    out = shard_batch_spatial(batch, mesh)
    img_key = "image_u8" if "image_u8" in out else "image"
    assert tuple(out[img_key].sharding.spec) == ("data",)
