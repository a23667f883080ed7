"""DFT-matmul depthwise convolution: equivalence + gradients.

``ops.dwconv._dft_depthwise`` is the production path for large-kernel
depthwise convs on EVERY backend (r4: XLA:CPU's fft thunk rejects
row-sharded layouts, so the FFT variant is now a test oracle only). These
tests pin the DFT formulation to the linear-convolution semantics the
goldens and the f64 reference-parity test are built on
(reference conv: /root/reference/src/models/convnext.py:30).
"""

from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from cfpnet_tpu.ops.dwconv import _dft_depthwise, _fft_depthwise, depthwise_conv2d


@contextmanager
def enable_x64():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", old)


def _direct(x, kernel):
    c = x.shape[-1]
    kh, kw = kernel.shape[:2]
    pad = [((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2]
    return lax.conv_general_dilated(
        x, kernel, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=lax.Precision.HIGHEST)


@pytest.mark.parametrize("shape,k", [((2, 24, 30, 4), 15), ((1, 40, 52, 8), 31),
                                     ((2, 17, 19, 3), 13)])
def test_dft_matches_direct_f64(shape, k):
    with enable_x64():
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(*shape), jnp.float64)
        kern = jnp.asarray(rng.randn(k, k, 1, shape[-1]), jnp.float64)
        got = _dft_depthwise(x, kern, mat_dtype=jnp.float64)
        ref = _direct(x, kern)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-10, atol=1e-10)


def test_dft_matches_fft_f32():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 30, 40, 8), jnp.float32)
    kern = jnp.asarray(rng.randn(15, 15, 1, 8) * 0.1, jnp.float32)
    got = _dft_depthwise(x, kern)
    ref = _fft_depthwise(x, kern)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=5e-4)


def test_dft_even_kernel_free_sizes():
    # transform sizes H+k-1 are whatever they are (no smooth rounding);
    # cover an odd H/W pair where FW is odd (hermitian weights edge case)
    with enable_x64():
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 9, 12, 2), jnp.float64)
        kern = jnp.asarray(rng.randn(13, 13, 1, 2), jnp.float64)
        got = _dft_depthwise(x, kern, mat_dtype=jnp.float64)
        ref = _direct(x, kern)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-10, atol=1e-10)


def test_dft_gradients_match_fft():
    with enable_x64():
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(1, 12, 14, 3), jnp.float64)
        kern = jnp.asarray(rng.randn(13, 13, 1, 3) * 0.1, jnp.float64)

        def loss(fn, xx, kk):
            return jnp.sum(jnp.sin(fn(xx, kk)))

        gx_d, gk_d = jax.grad(
            lambda a, b: loss(
                lambda p, q: _dft_depthwise(p, q, mat_dtype=jnp.float64), a, b),
            argnums=(0, 1))(x, kern)
        gx_f, gk_f = jax.grad(
            lambda a, b: loss(_fft_depthwise, a, b), argnums=(0, 1))(x, kern)
        np.testing.assert_allclose(np.asarray(gx_d), np.asarray(gx_f),
                                   rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(gk_d), np.asarray(gk_f),
                                   rtol=1e-8, atol=1e-8)


def test_dft_depthwise_bf16_accuracy():
    """bf16-matrix DFT (the TPU dispatch for bf16 inputs) stays within the
    bf16 mode's drift budget vs the exact f64 direct conv.

    bf16 matmuls accumulate in f32 on both CPU and the MXU, so this bound
    measured on CPU transfers to the TPU path."""
    with enable_x64():
        rng = np.random.RandomState(5)
        # production-like magnitudes: unit-scale activations, small kernel
        x64 = rng.randn(2, 30, 40, 8)
        k64 = rng.randn(15, 15, 1, 8) * 0.1
        ref = _direct(jnp.asarray(x64), jnp.asarray(k64))
        xb = jnp.asarray(x64, jnp.bfloat16)
        kb = jnp.asarray(k64, jnp.bfloat16)
        # jit: XLA:CPU's eager per-op path cannot execute bf16 dots
        got = jax.jit(
            lambda a, b: _dft_depthwise(a, b, mat_dtype=jnp.bfloat16)
        )(xb, kb)
        # the unavoidable noise floor: the same conv computed exactly from
        # the bf16-rounded inputs (what ANY bf16 conv pays)
        floor = _direct(xb.astype(jnp.float64), kb.astype(jnp.float64))
        scale = np.abs(np.asarray(ref)).mean()
        err = np.abs(np.asarray(got, np.float64) - np.asarray(ref)) / scale
        err_floor = np.abs(np.asarray(floor) - np.asarray(ref)) / scale
        # budget: <= 4x the bf16-input floor in both mean and max norm, and
        # an absolute ceiling of 5% of the mean output magnitude
        assert err.mean() < 4 * err_floor.mean(), (err.mean(), err_floor.mean())
        assert err.max() < max(4 * err_floor.max(), 5e-2), (
            err.max(), err_floor.max())


def test_dispatch_uses_dft_on_every_backend():
    # r4: the public dispatcher routes k>=13 through the DFT-matmul path on
    # every backend (GSPMD-safe pure einsums; jnp.fft on CPU crashes under
    # spatial sharding) — dispatch output must be bit-identical to the DFT
    # helper and stay within FFT-oracle tolerance.
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 20, 22, 4), jnp.float32)
    kern = jnp.asarray(rng.randn(13, 13, 1, 4) * 0.1, jnp.float32)
    got = depthwise_conv2d(x, kern)
    ref = _dft_depthwise(x, kern, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    oracle = _fft_depthwise(x, kern)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=0, atol=5e-4)


def test_dispatch_f64_keeps_f64_matrices():
    # the f64 reference-parity suite runs through the dispatcher; f64
    # inputs must get f64 DFT matrices (a silent f32 downcast would show
    # up as ~1e-5 error here instead of ~1e-12)
    with enable_x64():
        rng = np.random.RandomState(6)
        x = jnp.asarray(rng.randn(1, 18, 21, 3), jnp.float64)
        kern = jnp.asarray(rng.randn(13, 13, 1, 3) * 0.1, jnp.float64)
        got = depthwise_conv2d(x, kern)
        ref = _direct(x, kern)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-10, atol=1e-10)


def test_grouped_branch_safe_vjp_opt_in():
    """The C > densify_threshold branch follows the --safe_dw_vjp contract
    (same as the backbone's DepthwiseConv): default is the native grouped
    conv — jvp-differentiable, native VJP — and ``safe_vjp=True`` swaps in
    ``grouped_conv_safe``'s partitioner-safe kernel gradient. Forward and
    gradients must agree across the two; the default must support jax.jvp
    (custom_vjp functions do not)."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 10, 12, 4), jnp.float32)
    kern = jnp.asarray(rng.randn(5, 5, 1, 4) * 0.2, jnp.float32)

    # densify_threshold=0 forces the grouped branch at any channel count
    conv = lambda safe: (lambda x, k: depthwise_conv2d(
        x, k, densify_threshold=0, fft_threshold=99, safe_vjp=safe))
    ref = np.asarray(_direct(x, kern))
    np.testing.assert_allclose(np.asarray(conv(False)(x, kern)), ref,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(conv(False)(x, kern)),
                                  np.asarray(conv(True)(x, kern)))

    loss = lambda safe: (lambda x, k: jnp.sum(jnp.sin(conv(safe)(x, k))))
    gx0, gk0 = jax.grad(loss(False), (0, 1))(x, kern)
    gx1, gk1 = jax.grad(loss(True), (0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               rtol=1e-4, atol=1e-6)

    # forward-mode must keep working on the default path
    _, tangent = jax.jvp(loss(False), (x, kern),
                         (jnp.ones_like(x), jnp.zeros_like(kern)))
    assert np.isfinite(float(tangent))
