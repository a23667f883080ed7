"""Cross-framework micro-parity: our Flax modules vs torch replicas of the
documented reference structures, with identical weights. Validates every
layout/convention the checkpoint importer relies on (Dense vs Linear
transposes, LN eps, BN eval semantics, LeakyReLU slopes, exact GELU,
depthwise conv layouts)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from cfpnet_tpu.models.convnext import Block14
from cfpnet_tpu.models.decoder import DepthRegression, UpSampleBN
from cfpnet_tpu.models.encoder import PointNetEncoder
from cfpnet_tpu.models.transformer import LoFTREncoderLayer

RNG = np.random.default_rng(42)


def t(x):
    return torch.from_numpy(np.asarray(x))


def test_loftr_layer_parity():
    d_model, nhead, L, S, B = 32, 4, 10, 7, 2
    layer = LoFTREncoderLayer(d_model, nhead)
    x = RNG.standard_normal((B, L, d_model)).astype(np.float32)
    src = RNG.standard_normal((B, S, d_model)).astype(np.float32)
    params = layer.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(src))["params"]
    ours = np.asarray(layer.apply({"params": params}, jnp.asarray(x), jnp.asarray(src)))

    # torch replica (documented structure, reference transformer.py:14-71)
    class TorchLoFTR(tnn.Module):
        def __init__(self):
            super().__init__()
            self.q = tnn.Linear(d_model, d_model, bias=False)
            self.k = tnn.Linear(d_model, d_model, bias=False)
            self.v = tnn.Linear(d_model, d_model, bias=False)
            self.merge = tnn.Linear(d_model, d_model, bias=False)
            self.m0 = tnn.Linear(2 * d_model, 2 * d_model, bias=False)
            self.m1 = tnn.Linear(2 * d_model, d_model, bias=False)
            self.n1 = tnn.LayerNorm(d_model, eps=1e-5)
            self.n2 = tnn.LayerNorm(d_model, eps=1e-5)

        def forward(self, x, src):
            bs = x.shape[0]
            dim = d_model // nhead
            q = self.q(x).view(bs, -1, nhead, dim)
            k = self.k(src).view(bs, -1, nhead, dim)
            v = self.v(src).view(bs, -1, nhead, dim)
            Q = torch.nn.functional.elu(q) + 1
            K = torch.nn.functional.elu(k) + 1
            vl = v.shape[1]
            vv = v / vl
            KV = torch.einsum("nshd,nshv->nhdv", K, vv)
            Z = 1 / (torch.einsum("nlhd,nhd->nlh", Q, K.sum(1)) + 1e-6)
            msg = torch.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * vl
            msg = self.merge(msg.reshape(bs, -1, d_model))
            msg = self.n1(msg)
            msg = self.m1(torch.relu(self.m0(torch.cat([x, msg], dim=2))))
            msg = self.n2(msg)
            return msg + x

    tm = TorchLoFTR()
    with torch.no_grad():
        tm.q.weight.copy_(t(params["q_proj"]["kernel"]).T)
        tm.k.weight.copy_(t(params["k_proj"]["kernel"]).T)
        tm.v.weight.copy_(t(params["v_proj"]["kernel"]).T)
        tm.merge.weight.copy_(t(params["merge"]["kernel"]).T)
        tm.m0.weight.copy_(t(params["mlp_0"]["kernel"]).T)
        tm.m1.weight.copy_(t(params["mlp_1"]["kernel"]).T)
        tm.n1.weight.copy_(t(params["norm1"]["scale"]))
        tm.n1.bias.copy_(t(params["norm1"]["bias"]))
        tm.n2.weight.copy_(t(params["norm2"]["scale"]))
        tm.n2.bias.copy_(t(params["norm2"]["bias"]))
        ref = tm(t(x), t(src)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_block14_parity_eval():
    dim, k, B, H, W = 8, 7, 1, 12, 14
    blk = Block14(dim, k)
    x = RNG.standard_normal((B, H, W, dim)).astype(np.float32)
    variables = blk.init(jax.random.key(1), jnp.asarray(x), train=False)
    params, stats = variables["params"], variables["batch_stats"]
    # non-trivial BN running stats
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(RNG.uniform(0.5, 1.5, a.shape), jnp.float32), stats
    )
    ours = np.asarray(
        blk.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)
    )

    class TorchBlock14(tnn.Module):
        def __init__(self):
            super().__init__()
            self.dw = tnn.Conv2d(dim, dim, k, padding=(k - 1) // 2, groups=dim)
            self.bn = tnn.BatchNorm2d(dim)
            self.ln = tnn.LayerNorm(dim, eps=1e-6)
            self.p1 = tnn.Linear(dim, 4 * dim)
            self.p2 = tnn.Linear(4 * dim, dim)

        def forward(self, x):  # NCHW
            inp = x
            x = torch.relu(self.bn(self.dw(x)))
            x = x.permute(0, 2, 3, 1)
            x = self.ln(x)
            x = self.p2(torch.nn.functional.gelu(self.p1(x)))
            return inp + x.permute(0, 3, 1, 2)

    tm = TorchBlock14().eval()
    with torch.no_grad():
        tm.dw.weight.copy_(t(np.transpose(params["dwconv2_kernel"], (3, 2, 0, 1))))
        tm.dw.bias.copy_(t(params["dwconv2_bias"]))
        tm.bn.weight.copy_(t(params["bn1"]["scale"]))
        tm.bn.bias.copy_(t(params["bn1"]["bias"]))
        tm.bn.running_mean.copy_(t(stats["bn1"]["mean"]))
        tm.bn.running_var.copy_(t(stats["bn1"]["var"]))
        tm.ln.weight.copy_(t(params["norm"]["scale"]))
        tm.ln.bias.copy_(t(params["norm"]["bias"]))
        tm.p1.weight.copy_(t(params["pwconv1"]["kernel"]).T)
        tm.p1.bias.copy_(t(params["pwconv1"]["bias"]))
        tm.p2.weight.copy_(t(params["pwconv2"]["kernel"]).T)
        tm.p2.bias.copy_(t(params["pwconv2"]["bias"]))
        ref = tm(t(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_pointnet_parity_eval():
    B, N, cin, cout = 6, 16, 1, 8
    net = PointNetEncoder(cout)
    x = RNG.standard_normal((B, N, cin)).astype(np.float32)
    variables = net.init(jax.random.key(2), jnp.asarray(x), train=False)
    params = variables["params"]
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(RNG.uniform(0.5, 1.5, a.shape), jnp.float32),
        variables["batch_stats"],
    )
    ours = np.asarray(
        net.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)
    )

    convs = [tnn.Conv1d(cin, cout, 1), tnn.Conv1d(cout, cout, 1), tnn.Conv1d(cout, cout, 1)]
    bns = [tnn.BatchNorm1d(cout) for _ in range(3)]
    with torch.no_grad():
        for i in range(3):
            w = params[f"conv{i+1}"]["kernel"]  # [in, out]
            convs[i].weight.copy_(t(np.asarray(w).T[:, :, None]))
            convs[i].bias.copy_(t(params[f"conv{i+1}"]["bias"]))
            bns[i].weight.copy_(t(params[f"bn{i+1}"]["scale"]))
            bns[i].bias.copy_(t(params[f"bn{i+1}"]["bias"]))
            bns[i].running_mean.copy_(t(stats[f"bn{i+1}"]["mean"]))
            bns[i].running_var.copy_(t(stats[f"bn{i+1}"]["var"]))
            bns[i].eval()
        y = t(x).transpose(2, 1)
        for c, b in zip(convs, bns):
            y = torch.relu(b(c(y)))
        ref = y.permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_upsample_bn_parity_eval():
    B, C1, C2, OUT = 1, 6, 4, 8
    m = UpSampleBN(OUT)
    x = RNG.standard_normal((B, 5, 7, C1)).astype(np.float32)
    skip = RNG.standard_normal((B, 10, 14, C2)).astype(np.float32)
    variables = m.init(jax.random.key(3), jnp.asarray(x), jnp.asarray(skip), False)
    params = variables["params"]
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(RNG.uniform(0.5, 1.5, a.shape), jnp.float32),
        variables["batch_stats"],
    )
    ours = np.asarray(
        m.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                jnp.asarray(skip), False)
    )

    c0 = tnn.Conv2d(C1 + C2, OUT, 3, padding=1)
    b0 = tnn.BatchNorm2d(OUT).eval()
    c1 = tnn.Conv2d(OUT, OUT, 3, padding=1)
    b1 = tnn.BatchNorm2d(OUT).eval()
    with torch.no_grad():
        for tc, tb, name_c, name_b in ((c0, b0, "conv0", "bn0"), (c1, b1, "conv1", "bn1")):
            tc.weight.copy_(t(np.transpose(params[name_c]["kernel"], (3, 2, 0, 1))))
            tc.bias.copy_(t(params[name_c]["bias"]))
            tb.weight.copy_(t(params[name_b]["scale"]))
            tb.bias.copy_(t(params[name_b]["bias"]))
            tb.running_mean.copy_(t(stats[name_b]["mean"]))
            tb.running_var.copy_(t(stats[name_b]["var"]))
        up = torch.nn.functional.interpolate(
            t(x.transpose(0, 3, 1, 2)), size=(10, 14), mode="bilinear",
            align_corners=True,
        )
        f = torch.cat([up, t(skip.transpose(0, 3, 1, 2))], dim=1)
        f = torch.nn.functional.leaky_relu(b0(c0(f)), 0.01)
        f = torch.nn.functional.leaky_relu(b1(c1(f)), 0.01)
        ref = f.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
