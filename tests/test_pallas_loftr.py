"""Fused LoFTR megakernel: interpret-mode equivalence + vjp safety.

``ops.pallas_loftr.fused_loftr`` is the round-3 attempt at SURVEY §7.5's
"zone gather→attend→scatter" kernel class: the whole LoFTR encoder layer
(reference /root/reference/src/models/transformer.py:14-71) in one
VMEM-resident pass. Measured on the v5e it LOSES to XLA's lowering of the
same composite (see PARITY.md round-3 Pallas closure), so nothing
dispatches to it in production; the kernel stays equivalence-tested here
as the documented attempt.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfpnet_tpu.ops.pallas_loftr import (LoFTRParams, _fused_loftr_impl,
                                         layernorm_f32, loftr_apply_xla)


def make_params(C, rng):
    r = lambda *s: jnp.asarray(rng.randn(*s) * 0.1, jnp.float32)
    return LoFTRParams(
        wq=r(C, C), wk=r(C, C), wv=r(C, C), wm=r(C, C),
        g1=jnp.asarray(1 + 0.1 * rng.randn(C), jnp.float32), b1=r(C),
        w0=r(2 * C, 2 * C), w1=r(2 * C, C),
        g2=jnp.asarray(1 + 0.1 * rng.randn(C), jnp.float32), b2=r(C))


@pytest.mark.parametrize("N,L,S,C,H", [(6, 18, 18, 16, 4), (4, 24, 5, 16, 2),
                                       (2, 16, 8, 32, 8)])
def test_fused_matches_xla_composite(N, L, S, C, H):
    rng = np.random.RandomState(0)
    p = make_params(C, rng)
    x = jnp.asarray(rng.randn(N, L, C), jnp.float32)
    src = jnp.asarray(rng.randn(N, S, C), jnp.float32)
    got = _fused_loftr_impl(x, src, p, H, interpret=True)
    ref = loftr_apply_xla(x, src, p, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_layernorm_clone_is_bit_exact_vs_flax():
    import flax.linen as nn

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(5, 24), jnp.float32)
    scale = jnp.asarray(rng.rand(24), jnp.float32)
    bias = jnp.asarray(rng.rand(24), jnp.float32)
    ln = nn.LayerNorm(epsilon=1e-5)
    ref = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    got = layernorm_f32(x, scale, bias).astype(x.dtype)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # bf16: flax computes f32 stats then casts — the clone must match bitwise
    xb = x.astype(jnp.bfloat16)
    vb = {"params": {"scale": scale.astype(jnp.bfloat16),
                     "bias": bias.astype(jnp.bfloat16)}}
    refb = ln.apply(vb, xb)
    gotb = layernorm_f32(xb, vb["params"]["scale"], vb["params"]["bias"]).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(gotb), np.asarray(refb))


def test_fused_loftr_vjp_is_xla_grad():
    """The custom_vjp backward is the XLA composite's gradient — finite and
    matching jax.grad of loftr_apply_xla."""
    from cfpnet_tpu.ops.pallas_loftr import fused_loftr

    rng = np.random.RandomState(2)
    C, H = 16, 4
    p = make_params(C, rng)
    x = jnp.asarray(rng.randn(3, 10, C), jnp.float32)
    src = jnp.asarray(rng.randn(3, 7, C), jnp.float32)

    # on CPU the impl would hit the TPU-only pallas lowering; check the
    # *backward rule* directly (it never touches the kernel)
    from cfpnet_tpu.ops.pallas_loftr import _fused_bwd

    g = jnp.ones((3, 10, C), jnp.float32)
    dx, dsrc, dp = _fused_bwd(H, (x, src, p), g)
    rx, rsrc, rp = jax.grad(
        lambda xx, ss, pp: jnp.sum(loftr_apply_xla(xx, ss, pp, H)),
        argnums=(0, 1, 2))(x, src, p)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rx), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dsrc), np.asarray(rsrc), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(dp), jax.tree_util.tree_leaves(rp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
