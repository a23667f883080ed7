"""Pallas depthwise-conv kernel vs the XLA op (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from cfpnet_tpu.ops.dwconv import depthwise_conv2d
from cfpnet_tpu.ops.pallas_dwconv import depthwise_conv2d_pallas


def test_pallas_dwconv_matches_xla():
    rng = np.random.default_rng(0)
    for k, c, h, w in [(7, 8, 10, 12), (15, 4, 20, 24)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
        kern = jnp.asarray(rng.standard_normal((k, k, 1, c)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
        ref = np.asarray(depthwise_conv2d(x, kern, b))
        out = np.asarray(depthwise_conv2d_pallas(x, kern, b, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
