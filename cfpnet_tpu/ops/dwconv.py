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
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias=None,
    densify_threshold: int = 128,
    fft_threshold: int = 13,
) -> jnp.ndarray:
    """SAME-padded stride-1 depthwise conv.

    x: [B, H, W, C]; kernel: [kh, kw, 1, C] (HWIO with feature groups).
    Padding matches torch ``padding=(k-1)//2`` for odd k.

    TPU mapping (all three paths measured with chained host-forced timing on
    a v5e, k=31 @120x160x32):
    - XLA's native ``feature_group_count=C`` lowering: 22 ms — pathological
      for large kernels (used only for C > densify_threshold, i.e. the
      backbone's small k=3 depthwise convs where it is fine).
    - channel-diagonal DENSE conv (Cx FLOP waste on the MXU): 4.9 ms.
    - FFT convolution (this is a linear convolution: the padded transform
      length H+k-1 prevents wraparound; the kernel is flipped because FFT
      computes convolution while XLA convs compute correlation): 0.94 ms.
      Used when k >= fft_threshold. f32 roundoff vs the direct conv is
      ~1e-5 relative.
    """
    c = x.shape[-1]
    kh, kw = kernel.shape[0], kernel.shape[1]
    pad = [((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)]
    if min(kh, kw) >= fft_threshold:
        out = _fft_depthwise(x, kernel)
    elif c <= densify_threshold:
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


def _fft_depthwise(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Linear FFT convolution equal to the SAME-padded correlation above.

    Transform length is exactly H+k-1: rounding up to 5-smooth sizes
    (150x190 -> 150x192 etc.) was tried and MEASURED SLOWER end-to-end on
    the v5e (bs=1 6.38 -> 7.17 ms, bs=8 218 -> 175 fps) — XLA:TPU's FFT
    cost tracks transform size, not radix smoothness. Don't "optimize" this.
    """
    B, H, W, C = x.shape
    kh, kw = kernel.shape[0], kernel.shape[1]
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    FH, FW = H + kh - 1, W + kw - 1
    in_dtype = x.dtype
    # upcast low precision to f32 for the transform; keep f64 if given
    ct = jnp.promote_types(x.dtype, jnp.float32)
    xt = jnp.transpose(x, (0, 3, 1, 2)).astype(ct)  # [B,C,H,W]
    # flip: correlation == convolution with a flipped kernel
    kt = jnp.transpose(kernel[::-1, ::-1, 0, :], (2, 0, 1)).astype(ct)
    Xf = jnp.fft.rfft2(xt, s=(FH, FW))
    Kf = jnp.fft.rfft2(kt, s=(FH, FW))
    full = jnp.fft.irfft2(Xf * Kf[None], s=(FH, FW))
    out = full[:, :, ph : ph + H, pw : pw + W]
    return jnp.transpose(out, (0, 2, 3, 1)).astype(in_dtype)
