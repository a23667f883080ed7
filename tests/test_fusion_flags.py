"""Fusion flag coverage: no_skip_inside (scatter-SET vs scatter-ADD,
reference fusion.py:154-157) and change_embedding source selection
(reference fusion.py:134-135)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfpnet_tpu.data.geometry import ZoneGeometry
from cfpnet_tpu.models.fusion import TransformerFusion


@pytest.fixture(scope="module")
def env():
    geom = ZoneGeometry(img_h=64, img_w=96, zone_num=2, patch_px_h=16,
                        patch_px_w=16).at_scale(8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, 12, 16)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((1, 4, 16, 16)).astype(np.float32))
    mask = jnp.ones((1, 4), bool)
    return geom, x, f1, mask


def _run(geom, x, f1, mask, **kw):
    fus = TransformerFusion(
        embedding_dim=16, max_resolution=(8, 12), layer_names=("hist2image",),
        zone_sample_num=16, **kw,
    )
    v = fus.init({"params": jax.random.key(0), "fusion": jax.random.key(1)},
                 x, f1, mask, geom)
    return np.asarray(fus.apply(v, x, f1, mask, geom, train=False)), v


def test_no_skip_inside_changes_inside_only(env):
    geom, x, f1, mask = env
    add, _ = _run(geom, x, f1, mask, no_skip_inside=False)
    set_, _ = _run(geom, x, f1, mask, no_skip_inside=True)
    inside = np.zeros((8, 12), bool)
    inside[geom.zy0:geom.zy1, geom.zx0:geom.zx1] = True
    # outside the zone rect both modes are identical
    np.testing.assert_allclose(add[0][~inside], set_[0][~inside], atol=1e-6)
    # inside: add = set + original embedding contribution -> they differ
    assert np.abs(add[0][inside] - set_[0][inside]).max() > 1e-6


def test_change_embedding_identical_for_single_layer(env):
    """With a single hist2image layer, feat0 == embeddings at slice time, so
    change_embedding on/off must agree (the flag only matters after a prior
    layer mutates feat0 — reference fusion.py:134-135)."""
    geom, x, f1, mask = env
    on, _ = _run(geom, x, f1, mask, change_embedding=True)
    off, _ = _run(geom, x, f1, mask, change_embedding=False)
    np.testing.assert_allclose(on, off, atol=1e-6)


def test_change_embedding_differs_after_image_layer(env):
    geom, x, f1, mask = env

    def run(flag):
        fus = TransformerFusion(
            embedding_dim=16, max_resolution=(8, 12),
            layer_names=("image", "hist2image"), zone_sample_num=16,
            change_embedding=flag,
        )
        v = fus.init({"params": jax.random.key(0), "fusion": jax.random.key(1)},
                     x, f1, mask, geom)
        return np.asarray(fus.apply(v, x, f1, mask, geom, train=False))

    assert np.abs(run(True) - run(False)).max() > 1e-6
