"""CFPNet model assembly (class name ``Deltar`` kept for surface parity).

Reference: /root/reference/src/models/deltar.py:8-82.
forward contract (reference :34-67): inputs are the RGB image, per-zone
sampled depth points, and the zone validity mask; outputs are
``(bin_edges, pred)`` in training and ``(bin_edges, pred, prob, None)`` in
eval, with ``pred = Σ softmax_prob · bin_centers`` (reference :50-61).

TPU-native differences:
- NHWC layout; zone geometry arrives as static ``ScaleGeometry`` objects.
- Randomness (positional-encoding crop) is an explicit 'fusion' RNG.
- The model is a pure function of (params, batch_stats); one jit per
  (mode, resolution).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..data.geometry import ScaleGeometry, geometry_for
from .decoder import Decoder, DepthRegression, KINIT
from .efficientnetv2 import (
    StageSpec,
    V2_B3_STAGES,
    V2_B3_STEM,
    V2_TINY_STAGES,
    V2_TINY_STEM,
)
from .encoder import HistogramEncoder, ImageEncoder


class Deltar(nn.Module):
    n_bins: int = 256
    min_val: float = 1e-3
    max_val: float = 10.0
    norm: str = "linear"
    attention_layers: Sequence[str] = ("hist2image", "image", "hist2image", "image")
    zone_sample_num: int = 16
    change_embedding: bool = False
    no_skip_inside: bool = False
    native_resolution: Tuple[int, int] = (480, 640)
    # backbone spec (swap for V2_TINY_* in unit tests)
    stem_chs: int = V2_B3_STEM
    stages: Sequence[StageSpec] = V2_B3_STAGES
    encoder_channels: Sequence[int] = (232, 136, 56, 40, 16)
    decoder_channels: Sequence[int] = (256, 256, 128, 64, 32)
    num_classes: int = 128
    # rematerialize the image encoder in the backward pass (jax.checkpoint):
    # recompute backbone activations instead of holding them in HBM
    remat: bool = False
    # partitioner-safe depthwise kernel gradients (REQUIRED for training on
    # any multi-axis mesh; ~5% train-step cost — see
    # models/efficientnetv2.py::DepthwiseConv)
    safe_dw_vjp: bool = False

    @nn.compact
    def __call__(
        self,
        rgb: jnp.ndarray,  # [B, H, W, 3] ImageNet-normalized
        hist_data: jnp.ndarray,  # [B, Z, n] sampled depth points per zone
        hist_mask: jnp.ndarray,  # [B, Z] zone validity
        geoms: Dict[int, ScaleGeometry],
        train: bool = False,
    ):
        enc_cls = ImageEncoder
        if self.remat:
            enc_cls = nn.remat(ImageEncoder, static_argnums=(2,))
        img_features = enc_cls(
            self.stem_chs, self.stages, safe_dw_vjp=self.safe_dw_vjp,
            name="img_encoder",
        )(rgb, train)
        hc = tuple(c // 2 for c in (self.decoder_channels[3], self.decoder_channels[2],
                                    self.decoder_channels[1]))
        hist_features = HistogramEncoder(hc, name="hist_encoder")(
            hist_data[..., None], train
        )

        unet_out = Decoder(
            num_classes=self.num_classes,
            encoder_channels=tuple(self.encoder_channels),
            decoder_channels=tuple(self.decoder_channels),
            native_resolution=self.native_resolution,
            attention_layers=tuple(self.attention_layers),
            zone_sample_num=self.zone_sample_num,
            change_embedding=self.change_embedding,
            no_skip_inside=self.no_skip_inside,
            name="decoder",
        )(img_features, hist_features, hist_mask, geoms, train)

        bin_widths_normed, range_attention_maps = DepthRegression(
            dim_out=self.n_bins, embedding_dim=self.num_classes, norm=self.norm,
            name="depth_head",
        )(unet_out)

        out = nn.Conv(self.n_bins, (1, 1), kernel_init=KINIT, name="conv_out")(
            range_attention_maps
        )
        # Depth reconstruction (reference deltar.py:53-61) always runs in
        # f32: under a bf16 compute policy the 256-bin softmax + cumsum +
        # weighted sum would random-walk the metric prediction by a few
        # percent (tests/test_bf16.py pins the budget), and none of it is
        # MXU work — the cast costs nothing.
        rdt = jnp.promote_types(out.dtype, jnp.float32)
        out = nn.softmax(out.astype(rdt), axis=-1)
        bin_widths = (self.max_val - self.min_val) * bin_widths_normed.astype(rdt)
        bin_widths = jnp.pad(
            bin_widths, ((0, 0), (1, 0)), constant_values=self.min_val
        )
        bin_edges = jnp.cumsum(bin_widths, axis=1)
        centers = 0.5 * (bin_edges[:, :-1] + bin_edges[:, 1:])
        pred = jnp.sum(out * centers[:, None, None, :], axis=-1, keepdims=True)

        if train:
            return bin_edges, pred
        return bin_edges, pred, out, None


def make_model(config, tiny: bool = False) -> Deltar:
    """Model factory (reference src/utils/utils.py:7-10)."""
    tiny = tiny or getattr(config, "tiny_model", False)
    kw = dict(
        remat=getattr(config, "remat", False),
        n_bins=config.n_bins,
        min_val=config.min_depth,
        max_val=config.max_depth,
        norm=config.norm,
        attention_layers=tuple(config.attention_layer),
        zone_sample_num=config.zone_sample_num,
        change_embedding=config.change_embedding,
        no_skip_inside=config.no_skip_inside,
        native_resolution=(config.native_height, config.native_width),
        safe_dw_vjp=getattr(config, "safe_dw_vjp", False),
    )
    if tiny:
        kw.update(
            stem_chs=V2_TINY_STEM,
            stages=V2_TINY_STAGES,
            encoder_channels=(16, 16, 8, 8, 8),
            decoder_channels=(64, 64, 32, 16, 8),
            num_classes=32,
        )
    return Deltar(**kw)


def model_geometries(config, mode: str, offset=(0, 0)) -> Dict[int, ScaleGeometry]:
    """Static per-scale geometry for a (config, mode) pair."""
    return geometry_for(config, mode, offset).scales()
