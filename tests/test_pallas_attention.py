"""Fused linear attention: block-diagonal XLA formulation and Pallas kernel
(interpret mode on CPU) must match the reference einsum implementation."""

import jax.numpy as jnp
import numpy as np

from cfpnet_tpu.ops.attention import linear_attention
from cfpnet_tpu.ops.pallas_attention import (
    linear_attention_blockdiag,
    linear_attention_pallas,
)


def _data(N=3, L=17, S=9, H=4, D=8, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((N, L, H, D)).astype(np.float32)
    k = rng.standard_normal((N, S, H, D)).astype(np.float32)
    v = rng.standard_normal((N, S, H, D)).astype(np.float32)
    return q, k, v


def test_blockdiag_matches_einsum():
    q, k, v = _data()
    ref = np.asarray(linear_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    N, L, H, D = q.shape
    out = linear_attention_blockdiag(
        jnp.asarray(q.reshape(N, L, H * D)),
        jnp.asarray(k.reshape(N, -1, H * D)),
        jnp.asarray(v.reshape(N, -1, H * D)),
        nhead=H,
    )
    np.testing.assert_allclose(
        np.asarray(out).reshape(N, L, H, D), ref, rtol=1e-4, atol=1e-5
    )


def test_pallas_interpret_matches_einsum():
    q, k, v = _data(N=2, L=16, S=16, H=8, D=4, seed=1)
    ref = np.asarray(linear_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    N, L, H, D = q.shape
    out = linear_attention_pallas(
        jnp.asarray(q.reshape(N, L, H * D)),
        jnp.asarray(k.reshape(N, -1, H * D)),
        jnp.asarray(v.reshape(N, -1, H * D)),
        nhead=H,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out).reshape(N, L, H, D), ref, rtol=1e-4, atol=1e-5
    )
