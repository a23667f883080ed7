"""Kernelized (elu+1) linear attention.

Numerics match the reference ``LinearAttention``
(/root/reference/src/models/attention.py:14-52): O(N·d²) attention with the
elu+1 feature map, the ``values / v_length`` fp16-overflow guard, and the
1e-6 normalizer epsilon. The contraction order (K·V summary first, then
Q·(KV)) maps each einsum onto the MXU; a fused Pallas kernel lives in
``cfpnet_tpu.ops.pallas_attention`` for the long-sequence self-attention
paths.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def elu_feature_map(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.elu(x) + 1.0


def linear_attention(
    queries: jnp.ndarray,
    keys: jnp.ndarray,
    values: jnp.ndarray,
    q_mask: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Multi-head linear attention.

    queries: [N, L, H, D]; keys/values: [N, S, H, D];
    q_mask: [N, L]; kv_mask: [N, S]. Returns [N, L, H, D].
    """
    Q = elu_feature_map(queries)
    K = elu_feature_map(keys)

    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None]
    if kv_mask is not None:
        K = K * kv_mask[:, :, None, None]
        values = values * kv_mask[:, :, None, None]

    v_length = values.shape[1]
    values = values / v_length  # fp16/bf16 overflow guard (reference :42)
    KV = jnp.einsum("nshd,nshv->nhdv", K, values)
    Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, K.sum(axis=1)) + eps)
    out = jnp.einsum("nlhd,nhdv->nlhv", Q, KV) * Z[..., None] * v_length
    return out
