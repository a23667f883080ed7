"""Op-level numerics: align-corners resizes, linear attention, depthwise conv
— validated against torch oracles (the reference's numerical substrate)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from cfpnet_tpu.ops import (
    depthwise_conv2d,
    linear_attention,
    resize_bilinear_align_corners,
    resize_linear_align_corners_1d,
)


def test_resize_bilinear_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 13, 17, 5)).astype(np.float32)
    for oh, ow in [(26, 34), (7, 9), (52, 68), (13, 17), (1, 1), (29, 23)]:
        ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), oh, ow))
        ref = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(oh, ow),
            mode="bilinear", align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_resize_linear_1d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 11, 4)).astype(np.float32)
    ours = np.asarray(resize_linear_align_corners_1d(jnp.asarray(x), 23, axis=1))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 2, 1), size=23, mode="linear", align_corners=True
    ).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def linear_attention_oracle(q, k, v, eps=1e-6):
    """Direct torch translation of the documented linear-attention math
    (/root/reference/src/models/attention.py:31-49)."""
    Q = F.elu(q) + 1
    K = F.elu(k) + 1
    v_len = v.shape[1]
    vals = v / v_len
    KV = torch.einsum("nshd,nshv->nhdv", K, vals)
    Z = 1 / (torch.einsum("nlhd,nhd->nlh", Q, K.sum(dim=1)) + eps)
    return torch.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * v_len


def test_linear_attention_matches_oracle():
    rng = np.random.default_rng(2)
    q = rng.standard_normal((2, 37, 4, 8)).astype(np.float32)
    k = rng.standard_normal((2, 16, 4, 8)).astype(np.float32)
    v = rng.standard_normal((2, 16, 4, 8)).astype(np.float32)
    ours = np.asarray(linear_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    ref = linear_attention_oracle(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_linear_attention_kv_mask():
    rng = np.random.default_rng(3)
    q = rng.standard_normal((1, 5, 2, 4)).astype(np.float32)
    k = rng.standard_normal((1, 8, 2, 4)).astype(np.float32)
    v = rng.standard_normal((1, 8, 2, 4)).astype(np.float32)
    kv_mask = np.array([[1, 1, 1, 0, 0, 0, 0, 0]], dtype=np.float32)
    masked = linear_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kv_mask=jnp.asarray(kv_mask)
    )
    trunc = linear_attention(jnp.asarray(q), jnp.asarray(k[:, :3]), jnp.asarray(v[:, :3]))
    # masking k/v == truncating them, up to the v_length rescale (exact here
    # because the /v_length and *v_length cancel)
    np.testing.assert_allclose(np.asarray(masked), np.asarray(trunc), rtol=1e-4, atol=1e-5)


def test_depthwise_conv_matches_torch():
    rng = np.random.default_rng(4)
    for k in (7, 15, 31):
        x = rng.standard_normal((1, 24, 32, 6)).astype(np.float32)
        w = rng.standard_normal((k, k, 1, 6)).astype(np.float32)
        b = rng.standard_normal((6,)).astype(np.float32)
        ours = np.asarray(depthwise_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
        # torch depthwise: weight [C, 1, k, k]
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
        ref = F.conv2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), wt, torch.from_numpy(b),
            padding=(k - 1) // 2, groups=6,
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
