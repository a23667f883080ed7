"""Image + histogram encoders.

Reference: /root/reference/src/models/encoder.py.
- ``HistogramEncoder``: 3-stage shared-MLP PointNet over per-zone sampled
  depth points (1 -> 32 -> 64 -> 128 dims, per-point features kept,
  reference :37-50). torch Conv1d(k=1) == Dense over the feature axis; BN1d
  normalizes per channel over (batch·zones, points) — Flax BatchNorm on the
  last axis of [B·Z, N, C] matches exactly.
- ``ImageEncoder``: EfficientNetV2-B3 5-scale pyramid (reference :54-79),
  implemented natively in ``efficientnetv2.py``.
"""

from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .efficientnetv2 import (
    EfficientNetV2Features,
    StageSpec,
    V2_B3_STAGES,
    V2_B3_STEM,
)

KINIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
HIST_CHANNELS = (32, 64, 128)


class PointNetEncoder(nn.Module):
    """3x (Dense + BN + ReLU) shared MLP (reference encoder.py:6-24)."""

    out_channel: int

    @nn.compact
    def __call__(self, x, train: bool):
        # x: [B', N, D]
        for i in range(1, 4):
            x = nn.Dense(self.out_channel, use_bias=True, kernel_init=KINIT, name=f"conv{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, name=f"bn{i}"
            )(x)
            x = nn.relu(x)
        return x


class HistExtractor(nn.Module):
    out_channel: int

    @nn.compact
    def __call__(self, hist_data, train: bool):
        # hist_data: [B, Z, N, D]
        B, Z, N, D = hist_data.shape
        x = hist_data.reshape(B * Z, N, D)
        x = PointNetEncoder(self.out_channel, name="pointnet_encoder")(x, train)
        return x.reshape(B, Z, N, self.out_channel)


class HistogramEncoder(nn.Module):
    channels: Sequence[int] = HIST_CHANNELS

    @nn.compact
    def __call__(self, hist_data, train: bool = False) -> List[jnp.ndarray]:
        feats = []
        x = hist_data
        for i, c in enumerate(self.channels, start=1):
            x = HistExtractor(c, name=f"hist_extractor{i}")(x, train)
            feats.append(x)
        return feats  # [depth_feat1 (32d), depth_feat2 (64d), depth_feat3 (128d)]


class ImageEncoder(nn.Module):
    """5-scale EfficientNetV2 pyramid (reference encoder.py:54-79)."""

    stem_chs: int = V2_B3_STEM
    stages: Sequence[StageSpec] = V2_B3_STAGES
    safe_dw_vjp: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        return EfficientNetV2Features(
            self.stem_chs, self.stages, safe_dw_vjp=self.safe_dw_vjp,
            name="backbone")(x, train)
