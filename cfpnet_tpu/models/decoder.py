"""UNet decoder + AdaBins-style depth regression head.

Reference: /root/reference/src/models/decoder.py.
- ``UpSampleBN`` (reference :40-58): align-corners bilinear upsample to the
  skip's size, concat, 2x (conv3x3 + BN + LeakyReLU).
- ``Decoder`` (reference :61-128): encoder chans [232,136,56,40,16], decoder
  chans [256,256,128,64,32]; three ``TransformerFusion`` insertions at 1/16,
  1/8, 1/4 with embed dims 128/64/32 and large kernels 7/15/31; fused output
  is concatenated back (restoring channel width).
- ``DepthRegression`` (reference :9-37): 3x3 conv -> range-attention maps;
  1x1 conv (no bias) + GAP + MLP -> normalized bin widths.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.geometry import ScaleGeometry
from ..ops.interp import resize_bilinear_align_corners
from .fusion import TransformerFusion

KINIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class UpSampleBN(nn.Module):
    output_features: int

    @nn.compact
    def __call__(self, x, concat_with, train: bool):
        up = resize_bilinear_align_corners(x, concat_with.shape[1], concat_with.shape[2])
        f = jnp.concatenate([up, concat_with], axis=-1)
        for i in range(2):
            f = nn.Conv(
                self.output_features, (3, 3), padding=1, kernel_init=KINIT, name=f"conv{i}"
            )(f)
            f = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, name=f"bn{i}"
            )(f)
            f = nn.leaky_relu(f, negative_slope=0.01)
        return f


class DepthRegression(nn.Module):
    dim_out: int = 256
    embedding_dim: int = 128
    norm: str = "linear"

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        range_attention_maps = nn.Conv(
            self.embedding_dim, (3, 3), padding=1, kernel_init=KINIT, name="conv3x3"
        )(x)
        head = nn.Conv(
            self.embedding_dim, (1, 1), use_bias=False, kernel_init=KINIT, name="conv1x1"
        )(x)
        head = head.mean(axis=(1, 2))
        y = nn.Dense(256, kernel_init=KINIT, name="regressor_0")(head)
        y = nn.leaky_relu(y, negative_slope=0.01)
        y = nn.Dense(256, kernel_init=KINIT, name="regressor_2")(y)
        y = nn.leaky_relu(y, negative_slope=0.01)
        y = nn.Dense(self.dim_out, kernel_init=KINIT, name="regressor_4")(y)

        if self.norm == "linear":
            y = nn.relu(y) + 0.1
        elif self.norm == "softmax":
            return jax.nn.softmax(y, axis=1), range_attention_maps
        else:
            y = nn.sigmoid(y)
        y = y / y.sum(axis=1, keepdims=True)
        return y, range_attention_maps


class Decoder(nn.Module):
    num_classes: int = 128
    encoder_channels: Sequence[int] = (232, 136, 56, 40, 16)
    decoder_channels: Sequence[int] = (256, 256, 128, 64, 32)
    native_resolution: Tuple[int, int] = (480, 640)
    attention_layers: Sequence[str] = ("hist2image", "image", "hist2image", "image")
    zone_sample_num: int = 16
    change_embedding: bool = False
    no_skip_inside: bool = False

    @nn.compact
    def __call__(
        self,
        img_features,
        hist_features,
        hist_mask,
        geoms: Dict[int, ScaleGeometry],
        train: bool = False,
    ):
        x_block0, x_block1, x_block2, x_block3, x_block4 = img_features
        depth_feat1, depth_feat2, depth_feat3 = hist_features
        dc = self.decoder_channels
        half = [c // 2 for c in dc]
        nh, nw = self.native_resolution

        def fusion(embed_dim, scale, kernel, name):
            return TransformerFusion(
                embedding_dim=embed_dim,
                max_resolution=(nh // scale, nw // scale),
                layer_names=tuple(self.attention_layers),
                large_kernel=kernel,
                zone_sample_num=self.zone_sample_num,
                change_embedding=self.change_embedding,
                no_skip_inside=self.no_skip_inside,
                name=name,
            )

        x_d4 = nn.Conv(dc[0], (1, 1), kernel_init=KINIT, name="conv4")(x_block4)

        x_d3 = UpSampleBN(dc[1], name="up1")(x_d4, x_block3, train)
        x_d3 = nn.Conv(half[1], (1, 1), kernel_init=KINIT, name="conv3")(x_d3)
        fused3 = fusion(half[1], 16, 7, "cross_atten3")(
            x_d3, depth_feat3, hist_mask, geoms[16], train
        )
        x_d3 = jnp.concatenate([x_d3, fused3], axis=-1)

        x_d2 = UpSampleBN(dc[2], name="up2")(x_d3, x_block2, train)
        x_d2 = nn.Conv(half[2], (1, 1), kernel_init=KINIT, name="conv2")(x_d2)
        fused2 = fusion(half[2], 8, 15, "cross_atten2")(
            x_d2, depth_feat2, hist_mask, geoms[8], train
        )
        x_d2 = jnp.concatenate([x_d2, fused2], axis=-1)

        x_d1 = UpSampleBN(dc[3], name="up3")(x_d2, x_block1, train)
        x_d1 = nn.Conv(half[3], (1, 1), kernel_init=KINIT, name="conv1")(x_d1)
        fused1 = fusion(half[3], 4, 31, "cross_atten1")(
            x_d1, depth_feat1, hist_mask, geoms[4], train
        )
        x_d1 = jnp.concatenate([x_d1, fused1], axis=-1)

        x_d0 = UpSampleBN(dc[4], name="up4")(x_d1, x_block0, train)

        return nn.Conv(self.num_classes, (3, 3), padding=1, kernel_init=KINIT, name="conv0")(
            x_d0
        )
