"""Model-level tests on the tiny variant (shapes, contracts, determinism)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfpnet_tpu.models.deltar import make_model, model_geometries


@pytest.fixture(scope="module")
def setup(request):
    from cfpnet_tpu.config import Config

    cfg = Config(
        n_bins=16, input_height=48, input_width=64, native_height=64, native_width=96,
        train_zone_num=2, eval_zone_num_cfg=2, train_patch_px=16, eval_patch_px=16,
        attention_layer=["hist2image", "combine1", "image"], change_embedding=True,
    )
    model = make_model(cfg, tiny=True)
    geoms_t = model_geometries(cfg, "train")
    geoms_e = model_geometries(cfg, "online_eval")
    B, Z, n = 2, 4, 16
    rgb = jnp.asarray(np.random.default_rng(0).standard_normal((B, 48, 64, 3)), jnp.float32)
    hist = jnp.full((B, Z, n), 2.0)
    mask = jnp.ones((B, Z), bool)
    init_fn = jax.jit(
        lambda r: model.init(
            {"params": r, "fusion": jax.random.fold_in(r, 7)}, rgb, hist, mask,
            geoms_t, train=True,
        )
    )
    variables = init_fn(jax.random.key(0))
    return cfg, model, geoms_t, geoms_e, variables, (rgb, hist, mask)


def test_train_forward_shapes(setup):
    cfg, model, geoms_t, _, variables, (rgb, hist, mask) = setup
    fwd = jax.jit(
        lambda v, r: model.apply(
            v, rgb, hist, mask, geoms_t, train=True,
            rngs={"fusion": r}, mutable=["batch_stats"],
        )
    )
    (bin_edges, pred), updates = fwd(variables, jax.random.key(1))
    assert bin_edges.shape == (2, cfg.n_bins + 1)
    assert pred.shape == (2, 24, 32, 1)  # half resolution
    assert jnp.isfinite(pred).all()
    assert "batch_stats" in updates
    # bin edges start at min_val and are monotonically increasing
    np.testing.assert_allclose(np.asarray(bin_edges[:, 0]), cfg.min_depth, rtol=1e-5)
    assert (np.diff(np.asarray(bin_edges), axis=1) > 0).all()


def test_eval_forward_contract(setup):
    cfg, model, _, geoms_e, variables, (_, hist, mask) = setup
    rgb_e = jnp.zeros((2, 64, 96, 3))
    fwd = jax.jit(
        lambda v: model.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            rgb_e, hist, mask, geoms_e, train=False,
        )
    )
    bin_edges, pred, prob, last = fwd(variables)
    assert pred.shape == (2, 32, 48, 1)
    assert prob.shape == (2, 32, 48, cfg.n_bins)
    assert last is None
    np.testing.assert_allclose(np.asarray(prob.sum(-1)), 1.0, atol=1e-5)
    # pred is the prob-weighted center sum -> inside [min_val, max_val]
    assert (np.asarray(pred) >= cfg.min_depth).all()
    assert (np.asarray(pred) <= cfg.max_depth * (1 + cfg.n_bins * 0.1)).all()


def test_eval_deterministic(setup):
    _, model, _, geoms_e, variables, (_, hist, mask) = setup
    rgb_e = jnp.zeros((2, 64, 96, 3))
    fwd = jax.jit(
        lambda v: model.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            rgb_e, hist, mask, geoms_e, train=False,
        )[1]
    )
    p1, p2 = fwd(variables), fwd(variables)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_hist_mask_gates_fusion(setup):
    """Invalid zones must contribute nothing through hist2image."""
    _, model, _, geoms_e, variables, (_, hist, _) = setup
    rgb_e = jnp.zeros((2, 64, 96, 3))
    fwd = jax.jit(
        lambda v, h, m: model.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            rgb_e, h, m, geoms_e, train=False,
        )[1]
    )
    none = fwd(variables, hist, jnp.zeros((2, 4), bool))
    some = fwd(variables, hist, jnp.ones((2, 4), bool))
    # masking all zones changes the output vs all-valid
    assert np.abs(np.asarray(none) - np.asarray(some)).max() > 1e-7
    # and hist VALUES are irrelevant when all zones are masked
    none2 = fwd(variables, hist * 3.0 + 1.0, jnp.zeros((2, 4), bool))
    np.testing.assert_allclose(np.asarray(none), np.asarray(none2), atol=1e-6)
