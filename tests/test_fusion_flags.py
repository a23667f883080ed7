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


# ---------------------------------------------------------------------------
# Dispatch-surface names (reference fusion.py:160-180). The reference's OWN
# constructor raises NotImplementedError for new_cross/combine_N/cvxt
# (reference fusion.py:31-38) — no reference numeric exists — so these pin
# our implementation to the forward-loop semantics by construction:
# Combine1 IS NewCross9 followed by Block14, and the iterated forms ARE
# their unrolled single-layer sequences, under a parameter remap.
# ---------------------------------------------------------------------------


def _fusion(names):
    return TransformerFusion(
        embedding_dim=16, max_resolution=(8, 12), layer_names=tuple(names),
        zone_sample_num=16,
    )


def _apply(fus, v, env, train=False):
    geom, x, f1, mask = env
    rngs = {"fusion": jax.random.key(1)} if train else None
    if train:
        out, _ = fus.apply(v, x, f1, mask, geom, train=True, rngs=rngs,
                           mutable=["batch_stats"])
        return np.asarray(out)
    return np.asarray(fus.apply(v, x, f1, mask, geom, train=False))


def _remap(v, mapping):
    """Rebuild a variables dict with the ``layers_*`` subtrees translated
    through ``mapping`` (dst_name -> src path); non-layer entries (the
    positional encodings) pass through unchanged."""
    out = {}
    for col, tree in v.items():
        out[col] = {k: x for k, x in tree.items()
                    if not k.startswith("layers_")}
        for dst, src in mapping.items():
            node = tree
            for p in src:
                if not isinstance(node, dict) or p not in node:
                    node = None
                    break
                node = node[p]
            if node is not None:
                out[col][dst] = node
    return out


def test_new_cross_plus_cvxt_equals_combine1(env):
    geom, x, f1, mask = env
    a = _fusion(("combine1",))
    va = a.init({"params": jax.random.key(0), "fusion": jax.random.key(1)},
                x, f1, mask, geom)
    b = _fusion(("new_cross", "cvxt"))
    vb = _remap(va, {"layers_0": ("layers_0", "transformer_path"),
                     "layers_1": ("layers_0", "large_kernel_path")})
    np.testing.assert_array_equal(_apply(a, va, env), _apply(b, vb, env))


def test_combine_2_equals_two_combine1(env):
    geom, x, f1, mask = env
    c = _fusion(("combine_2",))
    vc = c.init({"params": jax.random.key(0), "fusion": jax.random.key(1)},
                x, f1, mask, geom)
    d = _fusion(("combine1", "combine1"))
    vd = _remap(vc, {"layers_0": ("layers_0_0",), "layers_1": ("layers_0_1",)})
    np.testing.assert_array_equal(_apply(c, vc, env), _apply(d, vd, env))


def test_cvxt_2_equals_two_cvxt(env):
    geom, x, f1, mask = env
    c = _fusion(("cvxt_2",))
    vc = c.init({"params": jax.random.key(0), "fusion": jax.random.key(1)},
                x, f1, mask, geom)
    d = _fusion(("cvxt", "cvxt"))
    vd = _remap(vc, {"layers_0": ("layers_0_0",), "layers_1": ("layers_0_1",)})
    np.testing.assert_array_equal(_apply(c, vc, env), _apply(d, vd, env))


def test_full_dispatch_surface_runs(env):
    """Every reference-reachable name in one stack, eval AND train mode."""
    geom, x, f1, mask = env
    fus = _fusion(("hist2image", "new_cross", "combine_2", "image", "cvxt_2"))
    v = fus.init({"params": jax.random.key(0), "fusion": jax.random.key(1)},
                 x, f1, mask, geom)
    for train in (False, True):
        out = _apply(fus, v, env, train=train)
        assert out.shape == (1, 8, 12, 16)
        assert np.isfinite(out).all()


def test_unknown_layer_name_still_raises(env):
    geom, x, f1, mask = env
    fus = _fusion(("nonsense",))
    with pytest.raises(NotImplementedError):
        fus.init({"params": jax.random.key(0), "fusion": jax.random.key(1)},
                 x, f1, mask, geom)


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
