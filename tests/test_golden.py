"""Golden regression pin: the tiny model's forward on fully deterministic
params/inputs (no RNG anywhere) must stay bit-stable across refactors.

Regenerate after an INTENDED numeric change:
    python -m pytest tests/test_golden.py --regen-golden
(or delete tests/golden/tiny_forward.npz and rerun).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tiny_forward.npz")


def _det_leaf(path, s):
    """Deterministic, shape-derived leaf values (no RNG)."""
    size = int(np.prod(s.shape)) if s.shape else 1
    v = ((np.arange(size, dtype=np.float64) * 2654435761 % 97) / 97.0 - 0.5) * 0.1
    v = v.reshape(s.shape).astype(np.float32)
    name = "/".join(getattr(p, "key", str(p)) for p in path)
    if name.endswith("var"):
        v = np.abs(v) + 0.5
    if name.endswith("scale"):
        v = v + 1.0
    return v


@pytest.fixture
def setup(tiny_config):
    from cfpnet_tpu.models.deltar import make_model, model_geometries

    cfg = tiny_config
    model = make_model(cfg, tiny=True)
    geoms = model_geometries(cfg, "online_eval")
    h, w = cfg.native_height, cfg.native_width
    Z = cfg.eval_zone_num**2
    img = jnp.asarray(
        _det_leaf(("img",), jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32))
    )
    hist = jnp.asarray(
        np.abs(_det_leaf(("hist",), jax.ShapeDtypeStruct((1, Z, 16), jnp.float32))) * 20
    )
    mask = jnp.ones((1, Z), bool)

    shapes = jax.eval_shape(
        lambda r: model.init({"params": r, "fusion": r}, img, hist, mask, geoms),
        jax.random.key(0),
    )
    variables = jax.tree_util.tree_map_with_path(_det_leaf, shapes)
    fwd = jax.jit(lambda v: model.apply(v, img, hist, mask, geoms, train=False))
    return fwd, variables


def test_golden_forward(setup, request):
    fwd, variables = setup
    bin_edges, pred, prob, _ = fwd(variables)
    got = dict(
        bin_edges=np.asarray(bin_edges), pred=np.asarray(pred),
        prob_sum0=np.asarray(prob[..., :4].mean(axis=(1, 2))),
    )
    assert np.isfinite(got["pred"]).all()
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, **got)
        pytest.skip("golden file generated; rerun to compare")
    ref = np.load(GOLDEN)
    for k in got:
        np.testing.assert_allclose(
            got[k], ref[k], rtol=2e-4, atol=2e-5,
            err_msg=f"golden mismatch in {k} — intended numeric change? "
                    f"delete {GOLDEN} to regenerate",
        )


GOLDEN_FULL = os.path.join(os.path.dirname(__file__), "golden", "full_forward.npz")


@pytest.mark.slow
def test_golden_forward_production_size():
    """Full-size pin (VERDICT round-1 item 7): the production B3 topology at
    480x640 with deterministic weights — catches backbone/fusion numeric
    drift the tiny topology can't (TF-SAME asymmetric pads at even sizes,
    31/15 FFT-conv paths, 8x8 zone geometry, n_bins 256).

    Pins a strided slice of pred + every 16th bin edge (full arrays would be
    1.2 MB). Regenerate by deleting tests/golden/full_forward.npz.
    """
    from cfpnet_tpu.config import Config
    from cfpnet_tpu.models.deltar import make_model, model_geometries

    cfg = Config(
        n_bins=256,
        attention_layer=["hist2image", "combine1", "image",
                         "hist2image", "combine1", "image"],
        change_embedding=True, sample_uniform=True,
    )
    model = make_model(cfg)
    geoms = model_geometries(cfg, "online_eval")
    img = jnp.asarray(
        _det_leaf(("img",), jax.ShapeDtypeStruct((1, 480, 640, 3), jnp.float32))
    )
    hist = jnp.asarray(
        np.abs(_det_leaf(("hist",), jax.ShapeDtypeStruct((1, 64, 16), jnp.float32)))
        * 20
    )
    mask = jnp.ones((1, 64), bool)
    shapes = jax.eval_shape(
        lambda r: model.init({"params": r, "fusion": r}, img, hist, mask, geoms),
        jax.random.key(0),
    )
    variables = jax.tree_util.tree_map_with_path(_det_leaf, shapes)
    bin_edges, pred, prob, _ = jax.jit(
        lambda v: model.apply(v, img, hist, mask, geoms, train=False)
    )(variables)
    got = dict(
        pred_slice=np.asarray(pred)[0, ::16, ::16, 0],
        bin_edges16=np.asarray(bin_edges)[0, ::16],
        pred_mean=np.asarray(pred.mean())[None],
    )
    assert np.isfinite(got["pred_slice"]).all()
    if not os.path.exists(GOLDEN_FULL):
        np.savez(GOLDEN_FULL, **got)
        pytest.skip("full-size golden generated; rerun to compare")
    ref = np.load(GOLDEN_FULL)
    for k in got:
        np.testing.assert_allclose(
            got[k], ref[k], rtol=5e-4, atol=5e-5,
            err_msg=f"full-size golden mismatch in {k} — intended change? "
                    f"delete {GOLDEN_FULL} to regenerate",
        )
