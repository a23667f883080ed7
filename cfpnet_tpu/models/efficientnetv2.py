"""EfficientNetV2-B3 image backbone (Flax, NHWC).

A native JAX port of the graph the reference pulls from timm
(``timm.create_model('tf_efficientnetv2_b3', pretrained=True)``,
/root/reference/src/models/encoder.py:57). The ``tf_`` variant semantics
matter for parity (SURVEY.md §7 "hard parts"):

- TF "SAME" asymmetric padding — Flax/lax ``padding='SAME'`` IS the TF rule,
  so no manual pad shims are needed (unlike the torch port).
- BatchNorm eps=1e-3 (TF default), momentum 0.9.
- SiLU activations; SE blocks with rd_channels = round(block_in_chs * 0.25).

Architecture (v2_base scaled by channel x1.2 / depth x1.4, round_limit=0):

  stem  conv3x3 s2 -> 40
  s0: 2 x ConvBnAct    k3 s1        -> 16    (1/2)
  s1: 3 x EdgeResidual k3 s2 e4     -> 40    (1/4)
  s2: 3 x EdgeResidual k3 s2 e4     -> 56    (1/8)
  s3: 5 x MBConv       k3 s2 e4 se  -> 112   (1/16)
  s4: 7 x MBConv       k3 s1 e6 se  -> 136   (1/16)
  s5: 12 x MBConv      k3 s2 e6 se  -> 232   (1/32)

The reference slices these into 5 pyramid stages (encoder.py:58-69):
conv0 = stem+s0 (16 @1/2), conv1 = s1 (40 @1/4), conv2 = s2 (56 @1/8),
conv3 = s3+s4 (136 @1/16), conv4 = s5 (232 @1/32).

Weight import from a timm/torch checkpoint: ``tools/import_torch_weights.py``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from flax.linen import dtypes as flax_dtypes
from jax import lax

from ..ops.dwconv import grouped_conv_safe

BN_EPS = 1e-3
BN_MOMENTUM = 0.9


class DepthwiseConv(nn.Module):
    """``nn.Conv(features, k, feature_group_count=features)`` with an
    optional partitioner-safe kernel gradient
    (``ops.dwconv.grouped_conv_safe``).

    Same param tree (``kernel`` [kh, kw, 1, C], lecun-normal, f32), same
    TF-SAME padding rule and dtype promotion as ``nn.Conv`` — the forward
    HLO is the identical grouped convolution either way, so goldens and
    the torch parity suite are unaffected.

    ``safe_vjp=True`` swaps dL/dW to the k*k strided-einsum formulation,
    which XLA's SPMD partitioner handles correctly on multi-axis meshes
    where the native ``batch_group_count`` kernel-gradient silently
    miscompiles (see grouped_conv_safe's docstring). It costs ~5% on the
    production train step (measured: 127.4 -> 133.5 ms bs=16 @416x544
    bf16 on a v5e), so it is OFF by default: the 1-D DP production mesh
    is unaffected by the bug (bit-equal test), and any 2-D-mesh training
    MUST construct the model with ``--safe_dw_vjp``
    (tests/test_spatial.py::test_train_step_grads_on_2d_mesh_dp_only)."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    safe_vjp: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel, 1, self.features),
            jnp.float32,
        )
        x, k = flax_dtypes.promote_dtype(x, k, dtype=None)
        pads = tuple(map(tuple, lax.padtype_to_pads(
            x.shape[1:3], self.kernel, self.strides, "SAME")))
        if self.safe_vjp:
            return grouped_conv_safe(x, k, tuple(self.strides), pads)
        return lax.conv_general_dilated(
            x, k, window_strides=tuple(self.strides), padding=pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1],
        )


def _bn(name: str):
    return nn.BatchNorm(
        use_running_average=None,  # set via call-site deterministic flag
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        name=name,
        axis_name=None,
    )


class SqueezeExcite(nn.Module):
    """SE block: GAP -> 1x1 reduce (SiLU) -> 1x1 expand (sigmoid gate)."""

    rd_channels: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(self.rd_channels, (1, 1), use_bias=True, name="conv_reduce")(se)
        se = nn.silu(se)
        se = nn.Conv(c, (1, 1), use_bias=True, name="conv_expand")(se)
        return x * nn.sigmoid(se)


class ConvBnAct(nn.Module):
    out_chs: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        x = nn.Conv(
            self.out_chs,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, name="bn1"
        )(x)
        x = nn.silu(x)
        if self.stride == 1 and shortcut.shape[-1] == self.out_chs:
            x = x + shortcut
        return x


class EdgeResidual(nn.Module):
    """Fused-MBConv: kxk expand conv -> 1x1 project."""

    out_chs: int
    exp_ratio: float = 4.0
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        in_chs = x.shape[-1]
        mid = _make_divisible(in_chs * self.exp_ratio)
        x = nn.Conv(
            mid,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            use_bias=False,
            name="conv_exp",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, name="bn1"
        )(x)
        x = nn.silu(x)
        x = nn.Conv(self.out_chs, (1, 1), use_bias=False, name="conv_pwl")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, name="bn2"
        )(x)
        if self.stride == 1 and in_chs == self.out_chs:
            x = x + shortcut
        return x


class InvertedResidual(nn.Module):
    """MBConv: 1x1 expand -> kxk depthwise -> SE -> 1x1 project."""

    out_chs: int
    exp_ratio: float = 4.0
    kernel: int = 3
    stride: int = 1
    se_ratio: float = 0.25
    safe_dw_vjp: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        in_chs = x.shape[-1]
        mid = _make_divisible(in_chs * self.exp_ratio)
        x = nn.Conv(mid, (1, 1), use_bias=False, name="conv_pw")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, name="bn1"
        )(x)
        x = nn.silu(x)
        x = DepthwiseConv(
            mid,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            safe_vjp=self.safe_dw_vjp,
            name="conv_dw",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, name="bn2"
        )(x)
        x = nn.silu(x)
        # rd_channels = round(block input chs * se_ratio) — timm semantics
        x = SqueezeExcite(rd_channels=max(1, round(in_chs * self.se_ratio)), name="se")(x)
        x = nn.Conv(self.out_chs, (1, 1), use_bias=False, name="conv_pwl")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, name="bn3"
        )(x)
        if self.stride == 1 and in_chs == self.out_chs:
            x = x + shortcut
        return x


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


@dataclass(frozen=True)
class StageSpec:
    block: str  # 'cn' | 'er' | 'ir'
    repeats: int
    out_chs: int
    stride: int
    exp_ratio: float = 1.0
    kernel: int = 3
    se_ratio: float = 0.0


# tf_efficientnetv2_b3: v2_base scaled (channels x1.2 round_limit=0, depth x1.4 ceil)
V2_B3_STEM = 40
V2_B3_STAGES: Tuple[StageSpec, ...] = (
    StageSpec("cn", 2, 16, 1, 1.0, 3),
    StageSpec("er", 3, 40, 2, 4.0, 3),
    StageSpec("er", 3, 56, 2, 4.0, 3),
    StageSpec("ir", 5, 112, 2, 4.0, 3, 0.25),
    StageSpec("ir", 7, 136, 1, 6.0, 3, 0.25),
    StageSpec("ir", 12, 232, 2, 6.0, 3, 0.25),
)

# tiny variant for unit tests / dry runs (same topology, 1 block per stage)
V2_TINY_STEM = 8
V2_TINY_STAGES: Tuple[StageSpec, ...] = (
    StageSpec("cn", 1, 8, 1, 1.0, 3),
    StageSpec("er", 1, 8, 2, 2.0, 3),
    StageSpec("er", 1, 8, 2, 2.0, 3),
    StageSpec("ir", 1, 16, 2, 2.0, 3, 0.25),
    StageSpec("ir", 1, 16, 1, 2.0, 3, 0.25),
    StageSpec("ir", 1, 16, 2, 2.0, 3, 0.25),
)


class EfficientNetV2Features(nn.Module):
    """Backbone emitting the 5-scale pyramid the decoder consumes.

    Stage grouping matches the reference ImageEncoder slicing
    (/root/reference/src/models/encoder.py:58-79): the stem + stage0 fuse
    into the first pyramid level; stages 3 and 4 fuse into the fourth.
    """

    stem_chs: int = V2_B3_STEM
    stages: Sequence[StageSpec] = V2_B3_STAGES
    safe_dw_vjp: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        x = nn.Conv(
            self.stem_chs, (3, 3), strides=(2, 2), padding="SAME",
            use_bias=False, name="conv_stem",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, name="bn1"
        )(x)
        x = nn.silu(x)

        feats = []
        for si, spec in enumerate(self.stages):
            for bi in range(spec.repeats):
                stride = spec.stride if bi == 0 else 1
                name = f"blocks_{si}_{bi}"
                if spec.block == "cn":
                    x = ConvBnAct(spec.out_chs, spec.kernel, stride, name=name)(x, train)
                elif spec.block == "er":
                    x = EdgeResidual(spec.out_chs, spec.exp_ratio, spec.kernel, stride, name=name)(
                        x, train
                    )
                else:
                    x = InvertedResidual(
                        spec.out_chs, spec.exp_ratio, spec.kernel, stride, spec.se_ratio,
                        safe_dw_vjp=self.safe_dw_vjp, name=name,
                    )(x, train)
            feats.append(x)

        # pyramid: [stage0 (1/2), stage1 (1/4), stage2 (1/8), stage4 (1/16), stage5 (1/32)]
        return [feats[0], feats[1], feats[2], feats[4], feats[5]]
