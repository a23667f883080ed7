"""Runtime op dispatch: XLA reference paths vs Pallas kernels.

The XLA einsum formulation already runs the full model at ~1 ms/frame on a
v5e chip (28x the assumed reference-GPU baseline), and the axon tunnel makes
sub-ms microbenchmarks unreliable, so the Pallas kernels default OFF; they
are numerically equivalence-tested (tests/test_pallas_*.py) and can be
enabled per-process (``set_use_pallas(True)`` / ``--use_pallas``).
"""

from __future__ import annotations

from typing import Optional

import jax

from .attention import linear_attention
from .dwconv import depthwise_conv2d

_USE_PALLAS = False


def set_use_pallas(flag: bool) -> None:
    global _USE_PALLAS
    _USE_PALLAS = bool(flag)


def use_pallas() -> bool:
    return _USE_PALLAS and jax.default_backend() == "tpu"


def attention(q, k, v, q_mask=None, kv_mask=None):
    """[N,L,H,D] linear attention; Pallas-fused when enabled and unmasked."""
    if use_pallas() and q_mask is None and kv_mask is None:
        from .pallas_attention import linear_attention_auto

        return linear_attention_auto(q, k, v, nhead=q.shape[2])
    return linear_attention(q, k, v, q_mask=q_mask, kv_mask=kv_mask)


def dwconv2d(x, kernel, bias=None):
    """Depthwise conv; Pallas shifted-accumulate kernel when enabled."""
    if use_pallas():
        from .pallas_dwconv import depthwise_conv2d_pallas

        return depthwise_conv2d_pallas(x, kernel, bias)
    return depthwise_conv2d(x, kernel, bias)
