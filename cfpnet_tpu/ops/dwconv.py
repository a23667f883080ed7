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

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def depthwise_conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias=None,
    densify_threshold: int = 128,
    fft_threshold: int = 13,
    safe_vjp: bool = False,
) -> jnp.ndarray:
    """SAME-padded stride-1 depthwise conv.

    x: [B, H, W, C]; kernel: [kh, kw, 1, C] (HWIO with feature groups).
    Padding matches torch ``padding=(k-1)//2`` for odd k.

    TPU mapping (all three paths measured with chained host-forced timing on
    a v5e, k=31 @120x160x32):
    - XLA's native ``feature_group_count=C`` lowering: 22 ms — pathological
      for large kernels (used only for C > densify_threshold, i.e. the
      backbone's small k=3 depthwise convs where it is fine).
      ``safe_vjp=True`` swaps this branch to ``grouped_conv_safe`` —
      partitioner-safe dL/dW for multi-axis meshes (``--safe_dw_vjp``,
      same opt-in contract as the backbone's ``DepthwiseConv``).
    - channel-diagonal DENSE conv (Cx FLOP waste on the MXU): 4.9 ms.
    - truncated-DFT-as-matmul linear convolution: 0.59 ms f32-HIGHEST
      (vs 2.30 ms for XLA:TPU's ``fft`` lowering of the same transform and
      0.94 ms for ``jnp.fft`` end-to-end). Used when k >= fft_threshold,
      on EVERY backend: the DFT path is pure einsums, so GSPMD shards it
      cleanly (spatial partitioning), while XLA:CPU's fft thunk rejects
      row-sharded operand layouts outright (fft_thunk.cc
      IsMonotonicWithDim0Major check — the r3 multichip-dryrun crash).
      One algorithm everywhere also means goldens are backend-portable.
      f32 roundoff vs the direct conv is ~1e-5 relative; f64 inputs get
      f64 matrices (the reference-parity suite runs through here); bf16
      inputs use bf16 DFT matrices at DEFAULT precision (one MXU pass,
      drift bounded by tests/test_dwconv_dft.py).
    - kernel-covers-map guard: mid-size kernels whose extent reaches the
      feature map (k >= min(H, W) — e.g. the deepest fusion stage of a
      sub-native-resolution model: k=7 on a 4x6 map) ALSO take the DFT
      path. XLA's SPMD partitioner (jax 0.9.0) miscompiles spatially
      row-sharded DENSE convs in exactly this regime — every output
      element wrong by O(1) on a ('data'>=2, 'spatial'=2) mesh, verified
      f64, cache-disabled, CPU; grouped and k<extent convs are unaffected
      (tests/test_spatial.py::test_sharded_small_map_conv_dispatch). The
      DFT matmul is also simply the right algorithm when the kernel
      covers the map.
    """
    c = x.shape[-1]
    kh, kw = kernel.shape[0], kernel.shape[1]
    H, W = x.shape[1], x.shape[2]
    pad = [((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)]
    if min(kh, kw) >= fft_threshold or min(kh, kw) >= min(H, W):
        if x.dtype == jnp.bfloat16:
            # bf16 DFT matrices halve the MXU passes on TPU; off-TPU they
            # buy nothing and XLA:CPU's eager DotThunk cannot even execute
            # a bf16x bf16 -> f32 dot, so non-TPU backends upcast to f32
            # matrices (accumulation is f32 either way, output stays bf16)
            mat = (jnp.bfloat16 if jax.default_backend() == "tpu"
                   else jnp.float32)
            out = _dft_depthwise(x, kernel, mat_dtype=mat)
        elif x.dtype == jnp.float64:
            out = _dft_depthwise(x, kernel, mat_dtype=jnp.float64,
                                 precision=lax.Precision.HIGHEST)
        else:
            out = _dft_depthwise(x, kernel, precision=lax.Precision.HIGHEST)
    elif c <= densify_threshold:
        # dense[ky,kx,i,o] = kernel[ky,kx,0,o] if i == o else 0
        dense = kernel.reshape(kh, kw, 1, c) * jnp.eye(c, dtype=kernel.dtype)[None, None]
        out = lax.conv_general_dilated(
            x, dense, window_strides=(1, 1), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    elif safe_vjp:
        # opt-in (--safe_dw_vjp, same contract as the backbone's
        # DepthwiseConv): partitioner-safe kernel gradient for multi-axis
        # meshes, at ~5% train-step cost and no jvp-differentiability
        out = grouped_conv_safe(x, kernel, (1, 1), tuple(map(tuple, pad)))
    else:
        out = lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
    if bias is not None:
        out = out + bias
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def grouped_conv_safe(x: jnp.ndarray, kernel: jnp.ndarray,
                      strides, pads) -> jnp.ndarray:
    """``feature_group_count=C`` depthwise conv with a partitioner-safe
    KERNEL gradient.

    XLA's SPMD partitioner (jax 0.9.0) miscompiles the grouped-convolution
    kernel-gradient (the ``batch_group_count`` HLO the conv VJP emits)
    whenever the operand is batch-sharded on a mesh whose remaining axes
    replicate it — e.g. ``P('data')`` on a 2-D ``('data','spatial')`` mesh:
    dL/dW comes out wrong by O(grad) at EVERY map size (f64,
    cache-disabled minimal repro; dL/dx and dense-conv gradients are
    unaffected, and so is ``P('data')`` on a 1-D mesh — the production DP
    path). The trap is silent: loss and forward stay correct while the
    backbone's depthwise kernels stop learning.

    This wrapper keeps the FORWARD as the native grouped conv (bit-identical
    HLO — goldens and the torch-parity suite unaffected) and overrides the
    VJP: dL/dx is ``jax.linear_transpose`` of the forward with the kernel
    held constant (lowers to the transposed GROUPED conv, which is clean),
    and dL/dW is written out as kh*kw strided-window einsums (elementwise
    multiply + reduce — partitioner-safe everywhere, and exactly the
    contraction the conv VJP computes). Pinned by
    tests/test_spatial.py::test_grouped_conv_kernel_grad_on_2d_mesh.

    x: [B, H, W, C]; kernel: [kh, kw, 1, C]; strides/pads are static
    (hashable tuples — ``((pt, pb), (pl, pr))``).
    """
    return lax.conv_general_dilated(
        x, kernel, window_strides=strides, padding=pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def _grouped_conv_fwd(x, kernel, strides, pads):
    return grouped_conv_safe(x, kernel, strides, pads), (x, kernel)


def _grouped_conv_bwd(strides, pads, res, dy):
    x, kernel = res
    kh, kw = kernel.shape[0], kernel.shape[1]
    sh, sw = strides

    # dL/dx: the conv is linear in x with the kernel held constant, so
    # linear_transpose gives the transposed GROUPED conv (which partitions
    # correctly) without tracing a discarded primal conv into the backward
    # graph (jax.vjp would, leaving its removal to XLA DCE). RAW conv — not
    # the custom_vjp wrapper, which would recurse at trace time.
    def _raw(xx):
        return lax.conv_general_dilated(
            xx, kernel, window_strides=strides, padding=pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=xx.shape[-1],
        )

    (dx,) = jax.linear_transpose(_raw, x)(dy)

    # dL/dW[ky,kx,0,c] = sum_{b,h,w} xpad[b, h*sh+ky, w*sw+kx, c]*dy[b,h,w,c]
    xp = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
    B, Ho, Wo, C = dy.shape
    acc = jnp.promote_types(jnp.float32, x.dtype)  # f32 accum for bf16 x
    cols = []
    for ky in range(kh):
        for kx in range(kw):
            win = lax.slice(
                xp,
                (0, ky, kx, 0),
                (B, ky + (Ho - 1) * sh + 1, kx + (Wo - 1) * sw + 1, C),
                (1, sh, sw, 1),
            )
            cols.append(jnp.einsum("bhwc,bhwc->c", win, dy,
                                   preferred_element_type=acc))
    dk = jnp.stack(cols).reshape(kh, kw, 1, C).astype(kernel.dtype)
    return dx, dk


grouped_conv_safe.defvjp(_grouped_conv_fwd, _grouped_conv_bwd)


@functools.lru_cache(maxsize=None)
def _dft_mats(H: int, W: int, kh: int, kw: int):
    """Constant DFT/inverse-DFT matrices for the linear convolution
    y = crop(idft2(dft2(x) * dft2(flip(k)))) with transform sizes
    FH=H+kh-1, FW=W+kw-1, expressed so that

    - the zero-padding of x is folded into TRUNCATED forward matrices
      (only the first H rows / W columns of the DFT are kept), and
    - the SAME-crop (rows ph..ph+H, cols pw..pw+W of the full linear
      convolution) is folded into the inverse matrices.

    Returns float64 numpy arrays; callers cast.
    """
    FH, FW = H + kh - 1, W + kw - 1
    Fw = FW // 2 + 1  # rfft bins along the minor (W) axis
    ph, pw = (kh - 1) // 2, (kw - 1) // 2

    n = np.arange(W)[:, None]
    f = np.arange(Fw)[None, :]
    ang = -2 * np.pi * n * f / FW
    CW, SW = np.cos(ang), np.sin(ang)  # [W, Fw] forward rfft (x rows 0..W-1)

    nk = np.arange(kw)[:, None]
    angk = -2 * np.pi * nk * f / FW
    CWk, SWk = np.cos(angk), np.sin(angk)  # [kw, Fw] kernel forward

    h = np.arange(H)[:, None]
    g = np.arange(FH)[None, :]
    angh = -2 * np.pi * h * g / FH
    CH, SH = np.cos(angh), np.sin(angh)  # [H, FH] full DFT, x rows 0..H-1

    hk = np.arange(kh)[:, None]
    anghk = -2 * np.pi * hk * g / FH
    CHk, SHk = np.cos(anghk), np.sin(anghk)  # [kh, FH]

    # inverse along H onto cropped output rows ph..ph+H-1 (full complex sum)
    m = np.arange(H)[None, :] + ph
    angi = 2 * np.pi * np.arange(FH)[:, None] * m / FH
    IHC, IHS = np.cos(angi) / FH, np.sin(angi) / FH  # [FH, H]

    # inverse rfft along W onto cropped cols pw..pw+W-1 with hermitian
    # weights (1 for DC and, when FW is even, the Nyquist bin; else 2)
    wgt = np.full(Fw, 2.0)
    wgt[0] = 1.0
    if FW % 2 == 0:
        wgt[-1] = 1.0
    mw = np.arange(W)[None, :] + pw
    angw = 2 * np.pi * np.arange(Fw)[:, None] * mw / FW
    IWC = wgt[:, None] * np.cos(angw) / FW  # [Fw, W]
    IWS = wgt[:, None] * np.sin(angw) / FW
    return (CW, SW, CWk, SWk, CH, SH, CHk, SHk, IHC, IHS, IWC, IWS)


def _dft_depthwise(x: jnp.ndarray, kernel: jnp.ndarray,
                   mat_dtype=jnp.float32, precision=None) -> jnp.ndarray:
    """Linear convolution via EXPLICIT DFT matmuls on the MXU.

    Mathematically identical to ``_fft_depthwise`` (same transform sizes,
    same kernel flip); exists because XLA:TPU lowers ``fft`` through a slow
    generic path (measured ~2.3 ms for k=31 @120x160x32 bs=8 on a v5e,
    an effective ~9 GF-f32/s) while the same transform written as dense
    DFT matmuls with the zero-pad/crop folded into truncated matrices is
    ~11 GF that the MXU streams at normal matmul rates. Accumulation is
    f32 (``preferred_element_type``); matrices are stored in ``mat_dtype``
    (f32 by default — bf16 halves MXU passes at ~1e-3 extra relative
    error, within the bf16 mode's drift budget).
    """
    B, H, W, C = x.shape
    kh, kw = kernel.shape[0], kernel.shape[1]
    in_dtype = x.dtype
    mats = [jnp.asarray(m, mat_dtype) for m in _dft_mats(H, W, kh, kw)]
    CW, SW, CWk, SWk, CH, SH, CHk, SHk, IHC, IHS, IWC, IWS = mats
    f32 = jnp.promote_types(jnp.dtype(mat_dtype), jnp.float32)
    dot = functools.partial(jnp.einsum, preferred_element_type=f32,
                            precision=precision)

    xt = jnp.transpose(x, (0, 3, 1, 2)).astype(mat_dtype)  # [B,C,H,W]
    # W-axis forward rfft
    re1 = dot("bchw,wf->bchf", xt, CW)
    im1 = dot("bchw,wf->bchf", xt, SW)
    # H-axis forward full DFT (complex): (re1+i*im1) * (CH+i*SH) along h
    re1, im1 = re1.astype(mat_dtype), im1.astype(mat_dtype)
    re2 = dot("bchf,hg->bcgf", re1, CH) - dot("bchf,hg->bcgf", im1, SH)
    im2 = dot("bchf,hg->bcgf", re1, SH) + dot("bchf,hg->bcgf", im1, CH)

    # kernel spectrum (flip: correlation == convolution with flipped kernel)
    kt = jnp.transpose(kernel[::-1, ::-1, 0, :], (2, 0, 1)).astype(mat_dtype)
    kre1 = dot("ckw,wf->ckf", kt, CWk)
    kim1 = dot("ckw,wf->ckf", kt, SWk)
    kre1, kim1 = kre1.astype(mat_dtype), kim1.astype(mat_dtype)
    kre = (dot("ckf,kg->cgf", kre1, CHk) - dot("ckf,kg->cgf", kim1, SHk))
    kim = (dot("ckf,kg->cgf", kre1, SHk) + dot("ckf,kg->cgf", kim1, CHk))

    # pointwise complex product
    re2, im2 = re2.astype(f32), im2.astype(f32)
    pr = re2 * kre[None] - im2 * kim[None]
    pi = re2 * kim[None] + im2 * kre[None]

    # inverse H (complex), directly onto the cropped output rows
    pr, pi = pr.astype(mat_dtype), pi.astype(mat_dtype)
    re3 = dot("bcgf,gh->bchf", pr, IHC) - dot("bcgf,gh->bchf", pi, IHS)
    im3 = dot("bcgf,gh->bchf", pr, IHS) + dot("bcgf,gh->bchf", pi, IHC)
    # inverse rfft W (real output), onto the cropped output cols
    re3, im3 = re3.astype(mat_dtype), im3.astype(mat_dtype)
    out = dot("bchf,fw->bchw", re3, IWC) - dot("bchf,fw->bchw", im3, IWS)
    return jnp.transpose(out, (0, 2, 3, 1)).astype(in_dtype)


def _fft_depthwise(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Linear FFT convolution equal to the SAME-padded correlation above.

    No longer on the production dispatch path (r4): XLA:CPU's fft thunk
    crashes on sharded operand layouts, so ``depthwise_conv2d`` routes all
    large-kernel convs through ``_dft_depthwise`` on every backend. Kept as
    the independent numerical oracle for tests/test_dwconv_dft.py and for
    microbenchmarks. Transform length is exactly H+k-1: rounding up to
    5-smooth sizes (150x190 -> 150x192 etc.) was tried and MEASURED SLOWER
    end-to-end on the v5e (bs=1 6.38 -> 7.17 ms, bs=8 218 -> 175 fps) —
    XLA:TPU's FFT cost tracks transform size, not radix smoothness.
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
