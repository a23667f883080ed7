"""Runtime op dispatch: XLA reference paths vs Pallas kernels.

The Pallas kernels default OFF, with the margin MEASURED end-to-end on the
v5e (chained host-forced protocol, round 2): full model with
``--use_pallas`` runs 16.2 ms bs=1 / 72 fps bs=8 vs 6.3 ms / 217 fps on the
XLA paths — the shifted-accumulate dwconv kernel (6.8 ms for k=31
@120x160x32) cannot beat the linear FFT convolution (0.94 ms), and the
fused attention kernel is limited by C=32 channels occupying 32 of 128
lanes plus a scoped-VMEM staging quirk of this stack for batched calls
(see ops/pallas_attention.py). Both kernels stay equivalence-tested
(tests/test_pallas_*.py) and per-process switchable
(``set_use_pallas(True)`` / ``--use_pallas``) as the fallback path for
stacks where the XLA FFT lowering regresses.

Round 3 closed the Pallas axis (full margin table in PARITY.md): a third
kernel — the WHOLE LoFTR encoder layer fused into one VMEM-resident pass
(``ops/pallas_loftr.py``) — also loses to XLA on this stack (0.94 vs
0.54 ms for the bs=8 1/4-scale window stack; Mosaic compile failure at
C=64). The kernels stay as tested fallbacks. The round-3 large-kernel-conv
win came from XLA itself: the FFT convolution re-expressed as explicit DFT
matmuls on the MXU (``ops/dwconv._dft_depthwise``, 4x faster than the
``jnp.fft`` lowering at equal accuracy) — that path is DEFAULT-ON on TPU
inside ``depthwise_conv2d`` and is orthogonal to this flag.
"""

from __future__ import annotations

from typing import Optional

import jax

from .attention import linear_attention
from .dwconv import depthwise_conv2d

_USE_PALLAS = False
_SAFE_DW_VJP = False


def set_use_pallas(flag: bool) -> None:
    global _USE_PALLAS
    _USE_PALLAS = bool(flag)


def set_safe_dw_vjp(flag: bool) -> None:
    """Process-wide mirror of ``--safe_dw_vjp`` for the fusion-path
    depthwise convs (``dwconv2d``). The backbone threads the flag through
    module fields (``models/efficientnetv2.DepthwiseConv``); the ops-path
    grouped branch (C > densify_threshold — unreachable at the shipped
    fusion dims 32/64/128 but live if channels are raised) honors the same
    flag through this switch. Set by the drivers next to
    ``set_use_pallas``."""
    global _SAFE_DW_VJP
    _SAFE_DW_VJP = bool(flag)


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
    return depthwise_conv2d(x, kernel, bias, safe_vjp=_SAFE_DW_VJP)
