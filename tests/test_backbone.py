"""Full-size EfficientNetV2-B3 backbone structural validation (eval_shape —
no compute). Param count and pyramid must match timm's
tf_efficientnetv2_b3 feature extractor exactly (reference encoder.py:54-79)."""

import jax
import jax.numpy as jnp
import numpy as np

from cfpnet_tpu.models.encoder import ImageEncoder


def test_b3_pyramid_and_param_count():
    enc = ImageEncoder()
    x = jnp.zeros((1, 480, 640, 3))
    vs = jax.eval_shape(lambda r: enc.init(r, x), jax.random.key(0))
    n = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(vs["params"]))
    # timm tf_efficientnetv2_b3 total 14.36M minus classifier (1.537M),
    # conv_head (0.357M) and bn2 — the feature extractor is 12.462M.
    assert n == 12_461_982, n

    feats = jax.eval_shape(lambda v: enc.apply(v, x), vs)
    shapes = [tuple(f.shape) for f in feats]
    assert shapes == [
        (1, 240, 320, 16),
        (1, 120, 160, 40),
        (1, 60, 80, 56),
        (1, 30, 40, 136),
        (1, 15, 20, 232),
    ], shapes


def test_b3_odd_input_same_padding():
    """TF-SAME stride-2 chains must ceil-divide odd sizes (416x544 train)."""
    enc = ImageEncoder()
    x = jnp.zeros((1, 416, 544, 3))
    vs = jax.eval_shape(lambda r: enc.init(r, x), jax.random.key(0))
    feats = jax.eval_shape(lambda v: enc.apply(v, x), vs)
    assert [tuple(f.shape)[1:3] for f in feats] == [
        (208, 272), (104, 136), (52, 68), (26, 34), (13, 17),
    ]
