"""Harness for running the ACTUAL reference PyTorch model as a numerical
oracle (VERDICT round-1 item 1: de-circularize the weight importer).

``load_reference_deltar`` imports ``/root/reference/src/models`` — the real
CFPNet torch code — with two stubs installed:

- ``timm``: the environment has no timm, and the reference only uses it for
  ``create_model('tf_efficientnetv2_b3', pretrained=True)``
  (reference encoder.py:57). ``create_model`` is replaced by an INDEPENDENT
  torch re-implementation of the timm tf_ EfficientNetV2-B3 graph below
  (TF "SAME" asymmetric padding via explicit F.pad, BatchNorm eps 1e-3 with
  fused SiLU, SE with rd_channels = round(in_chs/4)), exposing timm's module
  names (``conv_stem``/``bn1``/``blocks.{stage}.{block}.conv_exp`` ...) so
  the reference's stage slicing (encoder.py:58-69) and our importer's name
  mapping both apply unchanged.
- ``src.config``: the reference parses argv at import time into a module
  global (src/config.py:97-114); tests inject a plain namespace instead.

Weights flow OUR params -> ``export_reference_style`` -> reference
``load_state_dict`` — so a full-forward agreement test exercises the entire
importer mapping against code we did not write, breaking the round-1
circularity (importer verified only against its own inverse).
"""

from __future__ import annotations

import importlib
import math
import sys
import types
from types import SimpleNamespace

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE_ROOT = "/root/reference"

BN_EPS = 1e-3  # timm tf_ variant BatchNorm epsilon
BN_MOMENTUM = 0.1  # torch convention (unused at eval)


# --------------------------------------------------------------------------
# TF "SAME" padding (timm Conv2dSame semantics): total = max((ceil(i/s)-1)*s
# + k - i, 0), split low = total//2 — the extra pixel lands bottom/right.
# --------------------------------------------------------------------------


def _same_pad(i: int, k: int, s: int):
    total = max((math.ceil(i / s) - 1) * s + k - i, 0)
    return total // 2, total - total // 2


class Conv2dSame(nn.Conv2d):
    """torch Conv2d with TF-style dynamic asymmetric SAME padding."""

    def __init__(self, in_chs, out_chs, kernel_size, stride=1, groups=1, bias=False):
        super().__init__(in_chs, out_chs, kernel_size, stride=stride,
                         padding=0, groups=groups, bias=bias)

    def forward(self, x):
        ih, iw = x.shape[-2:]
        pt, pb = _same_pad(ih, self.kernel_size[0], self.stride[0])
        pl, pr = _same_pad(iw, self.kernel_size[1], self.stride[1])
        x = F.pad(x, (pl, pr, pt, pb))
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


class BatchNormAct2d(nn.BatchNorm2d):
    """BN + optional fused SiLU — timm's BatchNormAct2d state-dict shape."""

    def __init__(self, chs, act: bool = True):
        super().__init__(chs, eps=BN_EPS, momentum=BN_MOMENTUM)
        self._act = act

    def forward(self, x):
        x = super().forward(x)
        return F.silu(x) if self._act else x


class TorchSqueezeExcite(nn.Module):
    def __init__(self, chs, rd_channels):
        super().__init__()
        self.conv_reduce = nn.Conv2d(chs, rd_channels, 1, bias=True)
        self.conv_expand = nn.Conv2d(rd_channels, chs, 1, bias=True)

    def forward(self, x):
        se = x.mean((2, 3), keepdim=True)
        se = F.silu(self.conv_reduce(se))
        return x * torch.sigmoid(self.conv_expand(se))


class TorchConvBnAct(nn.Module):
    def __init__(self, in_chs, out_chs, kernel, stride):
        super().__init__()
        self.conv = Conv2dSame(in_chs, out_chs, kernel, stride)
        self.bn1 = BatchNormAct2d(out_chs, act=True)
        self.has_residual = stride == 1 and in_chs == out_chs

    def forward(self, x):
        y = self.bn1(self.conv(x))
        return y + x if self.has_residual else y


class TorchEdgeResidual(nn.Module):
    """Fused-MBConv: kxk expand -> 1x1 project."""

    def __init__(self, in_chs, out_chs, exp_ratio, kernel, stride, make_divisible):
        super().__init__()
        mid = make_divisible(in_chs * exp_ratio)
        self.conv_exp = Conv2dSame(in_chs, mid, kernel, stride)
        self.bn1 = BatchNormAct2d(mid, act=True)
        self.conv_pwl = nn.Conv2d(mid, out_chs, 1, bias=False)
        self.bn2 = BatchNormAct2d(out_chs, act=False)
        self.has_residual = stride == 1 and in_chs == out_chs

    def forward(self, x):
        y = self.bn2(self.conv_pwl(self.bn1(self.conv_exp(x))))
        return y + x if self.has_residual else y


class TorchInvertedResidual(nn.Module):
    """MBConv: 1x1 expand -> kxk depthwise -> SE -> 1x1 project."""

    def __init__(self, in_chs, out_chs, exp_ratio, kernel, stride, se_ratio,
                 make_divisible):
        super().__init__()
        mid = make_divisible(in_chs * exp_ratio)
        self.conv_pw = nn.Conv2d(in_chs, mid, 1, bias=False)
        self.bn1 = BatchNormAct2d(mid, act=True)
        self.conv_dw = Conv2dSame(mid, mid, kernel, stride, groups=mid)
        self.bn2 = BatchNormAct2d(mid, act=True)
        self.se = TorchSqueezeExcite(mid, max(1, round(in_chs * se_ratio)))
        self.conv_pwl = nn.Conv2d(mid, out_chs, 1, bias=False)
        self.bn3 = BatchNormAct2d(out_chs, act=False)
        self.has_residual = stride == 1 and in_chs == out_chs

    def forward(self, x):
        y = self.bn1(self.conv_pw(x))
        y = self.bn2(self.conv_dw(y))
        y = self.se(y)
        y = self.bn3(self.conv_pwl(y))
        return y + x if self.has_residual else y


class TimmLikeEffNetV2(nn.Module):
    """Structure-compatible stand-in for ``timm.create_model('tf_...')``:
    exposes ``conv_stem`` / ``bn1`` (act fused) / ``blocks`` so the
    reference ImageEncoder's ``net._modules[...]`` slicing works."""

    def __init__(self, stem_chs, stages):
        super().__init__()
        from cfpnet_tpu.models.efficientnetv2 import _make_divisible

        self.conv_stem = Conv2dSame(3, stem_chs, 3, 2)
        self.bn1 = BatchNormAct2d(stem_chs, act=True)
        blocks = []
        in_chs = stem_chs
        for spec in stages:
            stage = []
            for bi in range(spec.repeats):
                stride = spec.stride if bi == 0 else 1
                if spec.block == "cn":
                    m = TorchConvBnAct(in_chs, spec.out_chs, spec.kernel, stride)
                elif spec.block == "er":
                    m = TorchEdgeResidual(in_chs, spec.out_chs, spec.exp_ratio,
                                          spec.kernel, stride, _make_divisible)
                else:
                    m = TorchInvertedResidual(in_chs, spec.out_chs, spec.exp_ratio,
                                              spec.kernel, stride, spec.se_ratio,
                                              _make_divisible)
                in_chs = spec.out_chs
                stage.append(m)
            blocks.append(nn.Sequential(*stage))
        self.blocks = nn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(self.bn1(self.conv_stem(x)))  # bn1 fuses SiLU


# --------------------------------------------------------------------------
# reference import with stubs
# --------------------------------------------------------------------------


def _timm_stub(stem_chs, stages):
    timm = types.ModuleType("timm")
    timm.create_model = lambda name, pretrained=False, **kw: TimmLikeEffNetV2(
        stem_chs, stages
    )
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.trunc_normal_ = nn.init.trunc_normal_

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x  # drop_prob is 0 everywhere in the reference

    layers.DropPath = DropPath
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda fn: fn
    timm.models = models
    models.layers = layers
    models.registry = registry
    return {"timm": timm, "timm.models": models, "timm.models.layers": layers,
            "timm.models.registry": registry}


def install_reference_stubs(config, stem_chs=None, stages=None):
    """Make ``import src.models.deltar`` (etc.) work against
    /root/reference without timm and without argv side effects. Reuses the
    already-installed args namespace on repeat calls (the reference reads
    some flags at forward time, so mutation is sufficient)."""
    from cfpnet_tpu.models.efficientnetv2 import V2_B3_STAGES, V2_B3_STEM

    if REFERENCE_ROOT not in sys.path:
        # APPEND, never insert(0): the reference root also contains top-level
        # modules named evaluate_all/train/evaluate_time that would shadow
        # this repo's drivers for any later in-process import
        sys.path.append(REFERENCE_ROOT)
    for name, mod in _timm_stub(stem_chs or V2_B3_STEM,
                                stages or V2_B3_STAGES).items():
        if name not in sys.modules:
            sys.modules[name] = mod

    ns = dict(
        zone_sample_num=config.zone_sample_num,
        attention_layer=list(config.attention_layer),
        change_embedding=config.change_embedding,
        no_skip_inside=config.no_skip_inside,
        hist_encoder_10x=config.hist_encoder_10x,
        use_my_cross=False,
        sample_uniform=config.sample_uniform,
        train_zone_num=config.train_zone_num,
        train_zone_random_offset=0,
        simu_max_distance=config.simu_max_distance,
        mode="online_eval",
    )
    if "src.config" in sys.modules:
        for k, v in ns.items():
            setattr(sys.modules["src.config"].args, k, v)
    else:
        cfg_mod = types.ModuleType("src.config")
        cfg_mod.args = SimpleNamespace(**ns)
        sys.modules["src.config"] = cfg_mod
    return sys.modules["src.config"].args


def load_reference_deltar(config, stem_chs=None, stages=None):
    """Construct the reference ``Deltar`` (reference deltar.py:8-67) with the
    stubbed backbone. Returns (model, src.models.deltar module)."""
    install_reference_stubs(config, stem_chs, stages)
    deltar_mod = importlib.import_module("src.models.deltar")
    model = deltar_mod.Deltar(
        n_bins=config.n_bins, min_val=config.min_depth, max_val=config.max_depth,
        norm=config.norm,
    )
    return model, deltar_mod


# The reference's dead parameters (defined but never executed): newcross9's
# LoFTR tail (transformer.py:183-194 vs :204-248) and Block14's conv1
# (convnext.py:38 vs :42-58). BN num_batches_tracked buffers are counters our
# export never carries.
DEAD_KEY_MARKERS = ("transformer_path.merge.", "transformer_path.mlp.",
                    "transformer_path.norm1.", "transformer_path.norm2.",
                    "large_kernel_path.conv1.")


def load_exported_weights(model: nn.Module, torch_sd: dict):
    """Load an ``export_reference_style`` dict into the reference model;
    assert only known-dead keys stay unset."""
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in torch_sd.items()}
    missing, unexpected = model.load_state_dict(tensors, strict=False)
    assert not unexpected, f"export produced unknown keys: {unexpected[:5]}"
    bad = [
        k for k in missing
        if not k.endswith("num_batches_tracked")
        and not any(m in k for m in DEAD_KEY_MARKERS)
    ]
    assert not bad, f"export left live reference params unset: {bad[:8]}"
    return missing


def batched_patch_info(patch_info: dict, batch: int) -> dict:
    """Reproduce torch DataLoader collation of the per-sample patch_info dict
    (reference utils/dataloader.py:13-40 output feeding fusion.py:71-84)."""
    out = {}
    for k, v in patch_info.items():
        if k == "zone_num":
            out[k] = torch.tensor([int(v)] * batch)
        else:
            out[k] = {kk: vv.unsqueeze(0).repeat(batch, *([1] * vv.dim()))
                      for kk, vv in v.items()}
    return out


def randomize_batch_stats(stats_tree, rng: np.random.Generator):
    """Non-trivial BN running stats (mean ~N(0,0.3), var ~U(0.5,1.5)) so eval
    parity actually exercises the BN transform."""
    import jax

    def mk(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        shape = np.asarray(leaf).shape
        if name == "var":
            return np.asarray(rng.uniform(0.5, 1.5, shape), np.float32)
        return np.asarray(0.3 * rng.standard_normal(shape), np.float32)

    return jax.tree_util.tree_map_with_path(mk, stats_tree)
