"""The dense static-rectangle cross-zone propagation (LoFTRNewCross9) must
equal a LITERAL gather -> attend -> scatter implementation of the reference
semantics (transformer.py:204-248) with the same weights."""

import jax
import jax.numpy as jnp
import numpy as np

from cfpnet_tpu.models.transformer import LoFTRNewCross9
from cfpnet_tpu.ops.attention import linear_attention


def literal_newcross(params, feat0, rect, H, W, nhead):
    """Gather/scatter implementation mirroring the reference control flow."""
    B, N, C = feat0.shape
    zy0, zy1, zx0, zx1 = rect
    dim = C // nhead

    mask2d = np.zeros((H, W), bool)
    mask2d[zy0:zy1, zx0:zx1] = True
    inside_idx = np.where(mask2d.reshape(-1))[0]
    outside_idx = np.where(~mask2d.reshape(-1))[0]

    inside = feat0[:, inside_idx, :]
    outside = feat0[:, outside_idx, :]

    q = (outside @ params["q_proj"]["kernel"]).reshape(B, -1, nhead, dim)
    k = (inside @ params["k_proj"]["kernel"]).reshape(B, -1, nhead, dim)
    v = (inside @ params["v_proj"]["kernel"]).reshape(B, -1, nhead, dim)
    message = linear_attention(q, k, v).reshape(B, len(outside_idx), C)

    tmp = jnp.zeros_like(feat0).at[:, outside_idx, :].set(message)

    x2d = feat0.reshape(B, H, W, C)
    t2d = tmp.reshape(B, H, W, C)
    y = jnp.concatenate([x2d, t2d], axis=-1)

    def conv_bn(y, cname, bname):
        y = jax.lax.conv_general_dilated(
            y, params[cname]["kernel"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        p = params[bname]
        # eval-mode BN with the module's (fresh-init) stats: mean 0, var 1
        return (y - 0.0) / jnp.sqrt(1.0 + 1e-5) * p["scale"] + p["bias"]

    y = conv_bn(y, "conv1", "bn1")
    y = conv_bn(y, "conv2", "bn2")
    return y.reshape(B, N, C) + feat0


def test_dense_equals_literal_gather_scatter():
    H, W, C, nhead, B = 12, 16, 8, 4, 2
    rect = (3, 9, 4, 13)  # interior rectangle
    rng = np.random.default_rng(0)
    feat0 = jnp.asarray(rng.standard_normal((B, H * W, C)).astype(np.float32))

    mod = LoFTRNewCross9(C, nhead)
    variables = mod.init(jax.random.key(0), feat0, rect, H, W)
    dense = mod.apply(variables, feat0, rect, H, W, train=False)
    lit = literal_newcross(variables["params"], feat0, rect, H, W, nhead)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(lit), rtol=1e-4,
                               atol=1e-5)


def test_rect_touching_border():
    H, W, C, nhead = 8, 10, 8, 4
    rect = (0, 8, 0, 5)  # touches top/left/bottom borders
    rng = np.random.default_rng(1)
    feat0 = jnp.asarray(rng.standard_normal((1, H * W, C)).astype(np.float32))
    mod = LoFTRNewCross9(C, nhead)
    variables = mod.init(jax.random.key(0), feat0, rect, H, W)
    dense = mod.apply(variables, feat0, rect, H, W, train=False)
    lit = literal_newcross(variables["params"], feat0, rect, H, W, nhead)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(lit), rtol=1e-4,
                               atol=1e-5)
