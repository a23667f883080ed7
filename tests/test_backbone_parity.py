"""Backbone numeric parity: our Flax EfficientNetV2 blocks vs independent
torch replicas with timm ``tf_`` semantics (TF-SAME asymmetric padding,
BN eps 1e-3 + fused SiLU, SE gating) — SURVEY §7's #1 hard part, previously
asserted by shape only (VERDICT round-1 "what's missing" item 1).

Stride-2 cases use odd spatial sizes so the SAME padding is asymmetric: a
flipped pad convention shifts the grid and fails loudly here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cfpnet_tpu.models.efficientnetv2 import (
    ConvBnAct,
    EdgeResidual,
    EfficientNetV2Features,
    InvertedResidual,
    V2_TINY_STAGES,
    V2_TINY_STEM,
)
from tests.reference_oracle import (
    BatchNormAct2d,
    Conv2dSame,
    TimmLikeEffNetV2,
    TorchConvBnAct,
    TorchEdgeResidual,
    TorchInvertedResidual,
)

RNG = np.random.default_rng(7)


def t(x):
    return torch.from_numpy(np.asarray(x))


def t_conv(k):  # HWIO -> OIHW
    return t(np.transpose(np.asarray(k), (3, 2, 0, 1)))


def t_dw(k):  # [k,k,1,C] -> [C,1,k,k]
    return t(np.transpose(np.asarray(k), (3, 2, 0, 1)))


def _rand_stats(stats):
    return jax.tree_util.tree_map_with_path(
        lambda p, a: jnp.asarray(
            RNG.uniform(0.5, 1.5, a.shape) if p[-1].key == "var"
            else 0.3 * RNG.standard_normal(a.shape),
            jnp.float32,
        ),
        stats,
    )


def _copy_bn(tbn, params, stats):
    with torch.no_grad():
        tbn.weight.copy_(t(params["scale"]))
        tbn.bias.copy_(t(params["bias"]))
        tbn.running_mean.copy_(t(stats["mean"]))
        tbn.running_var.copy_(t(stats["var"]))


def _run_flax(mod, x, variables):
    return np.asarray(
        mod.apply(variables, jnp.asarray(x), train=False)
    )


def _nchw(x):
    return t(x.transpose(0, 3, 1, 2))


def _nhwc(y):
    return y.detach().numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("hw,stride", [((13, 17), 2), ((12, 16), 2), ((13, 17), 1)])
def test_conv_same_padding_asymmetric(hw, stride):
    """flax padding='SAME' must equal TF/timm Conv2dSame, incl. the odd-size
    stride-2 case where the extra pad pixel goes bottom/right."""
    import flax.linen as nn

    cin, cout, k = 5, 6, 3
    x = RNG.standard_normal((2, *hw, cin)).astype(np.float32)
    conv = nn.Conv(cout, (k, k), strides=(stride, stride), padding="SAME",
                   use_bias=False)
    params = conv.init(jax.random.key(0), jnp.asarray(x))["params"]
    ours = np.asarray(conv.apply({"params": params}, jnp.asarray(x)))

    tc = Conv2dSame(cin, cout, k, stride)
    with torch.no_grad():
        tc.weight.copy_(t_conv(params["kernel"]))
        ref = _nhwc(tc(_nchw(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_stem_parity():
    """conv_stem (stride 2, even size -> 1px asymmetric pad) + BN(1e-3) + SiLU."""
    import flax.linen as nn

    stem = 8
    x = RNG.standard_normal((1, 24, 34, 3)).astype(np.float32)

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.Conv(stem, (3, 3), strides=(2, 2), padding="SAME",
                        use_bias=False, name="conv_stem")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-3, name="bn1")(x)
            return nn.silu(x)

    mod = Stem()
    variables = mod.init(jax.random.key(1), jnp.asarray(x))
    stats = _rand_stats(variables["batch_stats"])
    ours = _run_flax(mod, x, {"params": variables["params"], "batch_stats": stats})

    tc = Conv2dSame(3, stem, 3, 2)
    tbn = BatchNormAct2d(stem, act=True).eval()
    with torch.no_grad():
        tc.weight.copy_(t_conv(variables["params"]["conv_stem"]["kernel"]))
    _copy_bn(tbn, variables["params"]["bn1"], stats["bn1"])
    with torch.no_grad():
        ref = _nhwc(tbn(tc(_nchw(x))))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_conv_bn_act_residual_parity():
    c = 6
    x = RNG.standard_normal((2, 11, 15, c)).astype(np.float32)
    mod = ConvBnAct(c, 3, 1)
    variables = mod.init(jax.random.key(2), jnp.asarray(x), train=False)
    stats = _rand_stats(variables["batch_stats"])
    ours = _run_flax(mod, x, {"params": variables["params"], "batch_stats": stats})

    tm = TorchConvBnAct(c, c, 3, 1).eval()
    assert tm.has_residual
    with torch.no_grad():
        tm.conv.weight.copy_(t_conv(variables["params"]["conv"]["kernel"]))
    _copy_bn(tm.bn1, variables["params"]["bn1"], stats["bn1"])
    with torch.no_grad():
        ref = _nhwc(tm(_nchw(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_edge_residual_stride2_parity():
    cin, cout = 8, 12
    x = RNG.standard_normal((2, 13, 17, cin)).astype(np.float32)
    mod = EdgeResidual(cout, 4.0, 3, 2)
    variables = mod.init(jax.random.key(3), jnp.asarray(x), train=False)
    p, stats = variables["params"], _rand_stats(variables["batch_stats"])
    ours = _run_flax(mod, x, {"params": p, "batch_stats": stats})

    from cfpnet_tpu.models.efficientnetv2 import _make_divisible

    tm = TorchEdgeResidual(cin, cout, 4.0, 3, 2, _make_divisible).eval()
    with torch.no_grad():
        tm.conv_exp.weight.copy_(t_conv(p["conv_exp"]["kernel"]))
        tm.conv_pwl.weight.copy_(t_conv(p["conv_pwl"]["kernel"]))
    _copy_bn(tm.bn1, p["bn1"], stats["bn1"])
    _copy_bn(tm.bn2, p["bn2"], stats["bn2"])
    with torch.no_grad():
        ref = _nhwc(tm(_nchw(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_inverted_residual_se_stride2_parity():
    cin, cout = 10, 14
    x = RNG.standard_normal((2, 15, 13, cin)).astype(np.float32)
    mod = InvertedResidual(cout, 4.0, 3, 2, 0.25)
    variables = mod.init(jax.random.key(4), jnp.asarray(x), train=False)
    p, stats = variables["params"], _rand_stats(variables["batch_stats"])
    ours = _run_flax(mod, x, {"params": p, "batch_stats": stats})

    from cfpnet_tpu.models.efficientnetv2 import _make_divisible

    tm = TorchInvertedResidual(cin, cout, 4.0, 3, 2, 0.25, _make_divisible).eval()
    with torch.no_grad():
        tm.conv_pw.weight.copy_(t_conv(p["conv_pw"]["kernel"]))
        tm.conv_dw.weight.copy_(t_dw(p["conv_dw"]["kernel"]))
        tm.se.conv_reduce.weight.copy_(t_conv(p["se"]["conv_reduce"]["kernel"]))
        tm.se.conv_reduce.bias.copy_(t(p["se"]["conv_reduce"]["bias"]))
        tm.se.conv_expand.weight.copy_(t_conv(p["se"]["conv_expand"]["kernel"]))
        tm.se.conv_expand.bias.copy_(t(p["se"]["conv_expand"]["bias"]))
        tm.conv_pwl.weight.copy_(t_conv(p["conv_pwl"]["kernel"]))
    _copy_bn(tm.bn1, p["bn1"], stats["bn1"])
    _copy_bn(tm.bn2, p["bn2"], stats["bn2"])
    _copy_bn(tm.bn3, p["bn3"], stats["bn3"])
    with torch.no_grad():
        ref = _nhwc(tm(_nchw(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def _copy_backbone_weights(tnet: TimmLikeEffNetV2, params, stats, stages):
    """Copy our backbone tree into the timm-like torch net, block by block."""
    with torch.no_grad():
        tnet.conv_stem.weight.copy_(t_conv(params["conv_stem"]["kernel"]))
    _copy_bn(tnet.bn1, params["bn1"], stats["bn1"])
    for si, spec in enumerate(stages):
        for bi in range(spec.repeats):
            p = params[f"blocks_{si}_{bi}"]
            s = stats[f"blocks_{si}_{bi}"]
            tb = tnet.blocks[si][bi]
            with torch.no_grad():
                if spec.block == "cn":
                    tb.conv.weight.copy_(t_conv(p["conv"]["kernel"]))
                elif spec.block == "er":
                    tb.conv_exp.weight.copy_(t_conv(p["conv_exp"]["kernel"]))
                    tb.conv_pwl.weight.copy_(t_conv(p["conv_pwl"]["kernel"]))
                else:
                    tb.conv_pw.weight.copy_(t_conv(p["conv_pw"]["kernel"]))
                    tb.conv_dw.weight.copy_(t_dw(p["conv_dw"]["kernel"]))
                    tb.se.conv_reduce.weight.copy_(t_conv(p["se"]["conv_reduce"]["kernel"]))
                    tb.se.conv_reduce.bias.copy_(t(p["se"]["conv_reduce"]["bias"]))
                    tb.se.conv_expand.weight.copy_(t_conv(p["se"]["conv_expand"]["kernel"]))
                    tb.se.conv_expand.bias.copy_(t(p["se"]["conv_expand"]["bias"]))
                    tb.conv_pwl.weight.copy_(t_conv(p["conv_pwl"]["kernel"]))
            for bn_name in ("bn1", "bn2", "bn3"):
                if bn_name in p:
                    _copy_bn(getattr(tb, bn_name), p[bn_name], s[bn_name])


def test_tiny_backbone_pyramid_parity():
    """Full tiny backbone vs the torch replica, incl. the reference's stage
    grouping (conv0=stem+s0, conv3=s3+s4 — reference encoder.py:58-69)."""
    x = RNG.standard_normal((1, 48, 64, 3)).astype(np.float32)
    mod = EfficientNetV2Features(V2_TINY_STEM, V2_TINY_STAGES)
    variables = mod.init(jax.random.key(5), jnp.asarray(x), train=False)
    p, stats = variables["params"], _rand_stats(variables["batch_stats"])
    ours = jax.jit(
        lambda v, xx: mod.apply(v, xx, train=False)
    )({"params": p, "batch_stats": stats}, jnp.asarray(x))

    tnet = TimmLikeEffNetV2(V2_TINY_STEM, V2_TINY_STAGES).eval()
    _copy_backbone_weights(tnet, p, stats, V2_TINY_STAGES)
    with torch.no_grad():
        y = tnet.bn1(tnet.conv_stem(_nchw(x)))  # bn1 fuses the SiLU
        feats = []
        for stage in tnet.blocks:
            y = stage(y)
            feats.append(y)
    # pyramid = stages [0, 1, 2, 4, 5]
    for fi, si in enumerate([0, 1, 2, 4, 5]):
        np.testing.assert_allclose(
            np.asarray(ours[fi]), _nhwc(feats[si]), rtol=1e-4, atol=1e-5,
            err_msg=f"pyramid level {fi} (stage {si})",
        )
