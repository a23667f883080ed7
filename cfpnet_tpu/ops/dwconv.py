"""Large-kernel depthwise 2D convolution.

The reference wanted RepLKNet's CUDA implicit-GEMM kernel for its 31/15/7
depthwise convs but never wired it up (requirements.txt:6 pinned,
never imported — SURVEY.md §2.9); it runs plain ``nn.Conv2d(groups=dim)``
(/root/reference/src/models/convnext.py:30). Here the op is expressed as
``lax.conv_general_dilated`` with ``feature_group_count=C`` in NHWC, which
XLA:TPU lowers well; a Pallas kernel variant is provided in
``cfpnet_tpu.ops.pallas_dwconv`` for the hot 31×31 case.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def depthwise_conv2d(
    x: jnp.ndarray, kernel: jnp.ndarray, bias=None, densify_threshold: int = 128
) -> jnp.ndarray:
    """SAME-padded stride-1 depthwise conv.

    x: [B, H, W, C]; kernel: [kh, kw, 1, C] (HWIO with feature groups).
    Padding matches torch ``padding=(k-1)//2`` for odd k.

    TPU mapping: XLA lowers ``feature_group_count=C`` large-kernel convs to
    the VPU with poor efficiency (measured 22 ms for k=31 @120x160x32 on
    v5e — the single dominant cost of the whole model). For C <=
    ``densify_threshold`` we instead express the op as a DENSE conv with a
    channel-diagonal kernel: a Cx FLOP waste that rides the MXU and is two
    orders of magnitude faster. Numerics identical (zeros off-diagonal).
    """
    c = x.shape[-1]
    kh, kw = kernel.shape[0], kernel.shape[1]
    pad = [((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)]
    if c <= densify_threshold:
        # dense[ky,kx,i,o] = kernel[ky,kx,0,o] if i == o else 0
        dense = kernel.reshape(kh, kw, 1, c) * jnp.eye(c, dtype=kernel.dtype)[None, None]
        out = lax.conv_general_dilated(
            x, dense, window_strides=(1, 1), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    else:
        out = lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
    if bias is not None:
        out = out + bias
    return out
