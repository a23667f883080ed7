"""Attention blocks: LoFTR encoder layer, Twins (LSA+GSA), cross-zone
propagation.

Reference: /root/reference/src/models/transformer.py. TPU-first redesign
notes:

- ``LoFTRNewCross9`` (the CFPNet novelty, reference :169-248) replaces the
  reference's dynamic ``masked_select`` inside/outside split with a fully
  dense formulation: the zone region is a *static rectangle* (see
  ``data/geometry.py``), attention is computed for every token, and the
  message is zeroed on the inside region with a static ``where``. Linear
  attention is permutation-equivariant per query and order-invariant over
  keys, so this is numerically identical to the reference's
  gather-attend-scatter — but it is a single static-shape einsum chain that
  XLA tiles straight onto the MXU (no dynamic shapes, no gathers).
- ``LocallyGroupedAttn`` window partition is a static pad + reshape
  (reference :89-116 "forward_padding" semantics).
- ``GlobalSubSampleAttn`` subsampling conv is VALID-padded k=ws, s=ws
  (reference :132, torch Conv2d default padding=0).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.dispatch import attention as linear_attention
from .convnext import Block14

KINIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class LoFTREncoderLayer(nn.Module):
    """Pre-proj q/k/v -> linear attention -> merge -> LN -> MLP(concat) -> LN
    -> residual (reference transformer.py:14-71)."""

    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, x, source, x_mask=None, source_mask=None):
        # x: [N, L, C]; source: [N, S, C]
        bs, L, _ = x.shape
        dim = self.d_model // self.nhead

        q = nn.Dense(self.d_model, use_bias=False, kernel_init=KINIT, name="q_proj")(x)
        k = nn.Dense(self.d_model, use_bias=False, kernel_init=KINIT, name="k_proj")(source)
        v = nn.Dense(self.d_model, use_bias=False, kernel_init=KINIT, name="v_proj")(source)
        q = q.reshape(bs, -1, self.nhead, dim)
        k = k.reshape(bs, -1, self.nhead, dim)
        v = v.reshape(bs, -1, self.nhead, dim)

        # reference passes an all-ones q_mask when x_mask is set (:57-61)
        tmp_mask = jnp.ones_like(x_mask) if x_mask is not None else None
        message = linear_attention(q, k, v, q_mask=tmp_mask, kv_mask=source_mask)
        if x_mask is not None:
            message = message * x_mask[:, :, None, None]
        message = message.reshape(bs, -1, self.d_model)
        message = nn.Dense(self.d_model, use_bias=False, kernel_init=KINIT, name="merge")(message)
        message = nn.LayerNorm(epsilon=1e-5, name="norm1")(message)

        message = jnp.concatenate([x, message], axis=2)
        message = nn.Dense(2 * self.d_model, use_bias=False, kernel_init=KINIT, name="mlp_0")(
            message
        )
        message = nn.relu(message)
        message = nn.Dense(self.d_model, use_bias=False, kernel_init=KINIT, name="mlp_1")(message)
        message = nn.LayerNorm(epsilon=1e-5, name="norm2")(message)
        return message + x


class LocallyGroupedAttn(nn.Module):
    """LSA: self-attention within ws x ws windows (reference :75-116)."""

    dim: int
    ws: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, x, size: Tuple[int, int]):
        B, N, C = x.shape
        H, W = size
        ws = self.ws
        x = x.reshape(B, H, W, C)
        pad_r = (ws - W % ws) % ws
        pad_b = (ws - H % ws) % ws
        if pad_r or pad_b:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r
        _h, _w = Hp // ws, Wp // ws
        x = x.reshape(B, _h, ws, _w, ws, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B * _h * _w, ws * ws, C)
        x = LoFTREncoderLayer(self.dim, self.num_heads, name="encoder_layer")(x, x)
        x = x.reshape(B, _h, _w, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, Hp, Wp, C)
        if pad_r or pad_b:
            x = x[:, :H, :W, :]
        return x.reshape(B, H * W, C)


class GlobalSubSampleAttn(nn.Module):
    """GSA: all tokens query a ws-strided conv-downsampled key map
    (reference :119-150)."""

    dim: int
    sr_ratio: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, x, size: Tuple[int, int]):
        B, N, C = x.shape
        H, W = size
        query = x
        if self.sr_ratio > 1:
            x = x.reshape(B, H, W, C)
            x = nn.Conv(
                self.dim,
                (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio),
                padding="VALID",
                use_bias=True,
                kernel_init=KINIT,
                name="sr",
            )(x)
            x = x.reshape(B, -1, C)
            x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return LoFTREncoderLayer(self.dim, self.num_heads, name="encoder_layer")(query, x)


class TwinsTransformer(nn.Module):
    """LSA then GSA (reference :154-165). Note the reference does NOT pass
    num_heads down — both sub-attentions use the default 8 heads."""

    dim: int
    ws: int

    @nn.compact
    def __call__(self, x, size: Tuple[int, int]):
        x = LocallyGroupedAttn(self.dim, self.ws, name="lga")(x, size)
        x = GlobalSubSampleAttn(self.dim, self.ws, name="gsa")(x, size)
        return x


class LoFTRNewCross9(nn.Module):
    """Cross-zone propagation: outside-zone queries attend to inside-zone
    keys/values; messages land on outside tokens; 2x conv3x3+BN refine;
    residual (reference transformer.py:204-248).

    Dense static-rectangle formulation (see module docstring).
    ``rect`` = (zy0, zy1, zx0, zx1) clipped zone-region bounds on the H x W
    feature map.
    """

    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, feat0, rect: Tuple[int, int, int, int], H: int, W: int,
                 train: bool = False):
        B, N, C = feat0.shape
        zy0, zy1, zx0, zx1 = rect
        dim = self.d_model // self.nhead
        old = feat0

        x2d = feat0.reshape(B, H, W, C)
        inside = x2d[:, zy0:zy1, zx0:zx1, :].reshape(B, -1, C)
        num_inside = inside.shape[1]

        # q over ALL tokens (outside results used; inside masked after).
        q = nn.Dense(self.d_model, use_bias=False, kernel_init=KINIT, name="q_proj")(feat0)
        k = nn.Dense(self.d_model, use_bias=False, kernel_init=KINIT, name="k_proj")(inside)
        v = nn.Dense(self.d_model, use_bias=False, kernel_init=KINIT, name="v_proj")(inside)
        q = q.reshape(B, N, self.nhead, dim)
        k = k.reshape(B, num_inside, self.nhead, dim)
        v = v.reshape(B, num_inside, self.nhead, dim)

        # Reference normalizes by the OUTSIDE token count (v_length is the
        # query-side length in its gathered layout? No — v_length is
        # values.size(1) = num_inside there too; see attention.py:41).
        message = linear_attention(q, k, v).reshape(B, N, C)

        # zero the message on inside tokens (tmp[~zone_area] = message).
        msg2d = message.reshape(B, H, W, C)
        inside_mask = np.zeros((H, W, 1), dtype=bool)
        inside_mask[zy0:zy1, zx0:zx1] = True
        msg2d = jnp.where(jnp.asarray(inside_mask), jnp.zeros_like(msg2d), msg2d)

        y = jnp.concatenate([x2d, msg2d], axis=-1)
        y = nn.Conv(self.d_model, (3, 3), padding=1, use_bias=False, kernel_init=KINIT,
                    name="conv1")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         name="bn1")(y)
        y = nn.Conv(self.d_model, (3, 3), padding=1, use_bias=False, kernel_init=KINIT,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         name="bn2")(y)
        return y.reshape(B, N, C) + old


class Combine1(nn.Module):
    """Cross-zone propagation + large-kernel conv path (reference :251-275)."""

    d_model: int
    nhead: int
    large_kernel: int

    @nn.compact
    def __call__(self, feat0, rect, H: int, W: int, train: bool = False):
        B, N, C = feat0.shape
        feat0 = LoFTRNewCross9(self.d_model, self.nhead, name="transformer_path")(
            feat0, rect, H, W, train
        )
        x = feat0.reshape(B, H, W, C)
        x = Block14(self.d_model, self.large_kernel, name="large_kernel_path")(x, train)
        return x.reshape(B, N, C)


def twins_window_size(max_h: int, max_w: int) -> int:
    """ws = ceil((H*W)^(1/4)) (reference fusion.py:28)."""
    return math.ceil(math.sqrt(math.sqrt(max_h * max_w)))
