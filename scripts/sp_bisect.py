"""Bisect the train-side spatial-sharding backward miscompile (VERDICT r4 #4).

Round-4 finding (PARITY.md round-4 deep dive): with P('data','spatial')
train batches on a ('data','spatial') mesh, the full-graph backward
computes wrong gradients (rel ~0.1-0.2 in hist-encoder/fusion leaves)
while the loss stays correct — and every individual op audits clean in
isolation. This script reproduces that and then strips the graph down to
the smallest composition that still fails, so the boundary can rest on a
checked-in minimal repro instead of "the composition miscompiles".

Run: python scripts/sp_bisect.py [stage ...]
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cfpnet_tpu.config import Config
from cfpnet_tpu.data.datasets import SyntheticDataset
from cfpnet_tpu.data.pipeline import collate
from cfpnet_tpu.models.deltar import make_model, model_geometries
from cfpnet_tpu.parallel.mesh import make_mesh_2d, shard_batch_spatial
from cfpnet_tpu.train.losses import silog_loss
from cfpnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def tiny_config(**kw):
    base = dict(
        n_bins=16, input_height=48, input_width=64,
        native_height=64, native_width=96,
        train_zone_num=2, eval_zone_num_cfg=2,
        train_patch_px=16, eval_patch_px=16, zone_sample_num=16,
        sample_uniform=True,
        attention_layer=["hist2image", "combine1", "image"],
        change_embedding=True, disable_clip_grad=True,
        hist_encoder_10x=True, bs=4, epochs=1, safe_dw_vjp=True)
    base.update(kw)
    return Config(**base)


def grad_check(name, loss_fn, params, args, batch_tree, mesh, spec):
    """Compare jax.grad(loss_fn)(params, *args, **batch) single-device vs
    with batch_tree sharded P(spec) on mesh. Returns worst rel error."""
    g = jax.jit(jax.grad(loss_fn))
    ref = jax.device_get(g(params, *args, batch_tree))
    if callable(spec):
        sharded = spec(batch_tree, mesh)
    elif spec == "batch_spatial":
        sharded = shard_batch_spatial(batch_tree, mesh)
    else:
        sharded = jax.tree_util.tree_map(
            lambda a: jax.device_put(
                a, NamedSharding(mesh, P(*spec[: a.ndim]))),
            batch_tree)
    got = jax.device_get(g(params, *args, sharded))
    worst, wkey = 0.0, None
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(got),
            jax.tree_util.tree_leaves_with_path(ref)):
        a64, b64 = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(b64).max(), 1e-12)
        rel = np.abs(a64 - b64).max() / scale
        if rel > worst:
            worst, wkey = rel, jax.tree_util.keystr(pa)
    status = "FAIL" if worst > 1e-3 else "ok  "
    print(f"[{status}] {name}: worst rel {worst:.3e} at {wkey}", flush=True)
    return worst


def full_train_loss(cfg, loss_point="pred"):
    """Build (loss_fn(params, batch), params, batch) for the tiny model."""
    model = make_model(cfg, tiny=True)
    geoms = model_geometries(cfg, "train")
    ds = SyntheticDataset(cfg, "train", length=cfg.bs)
    batch = collate([ds[i] for i in range(cfg.bs)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.key(0)
    variables = model.init(
        {"params": rng, "fusion": rng}, batch["image"], batch["hist_data"],
        batch["mask"], geoms, train=True)
    params, stats = variables["params"], variables["batch_stats"]

    def loss_fn(p, b):
        if loss_point == "eval_sq":
            out = model.apply(
                {"params": p, "batch_stats": stats}, b["image"],
                b["hist_data"], b["mask"], geoms, train=False)
            return jnp.mean(out[1].astype(jnp.float32) ** 2)
        (edges, pred), _ = model.apply(
            {"params": p, "batch_stats": stats}, b["image"], b["hist_data"],
            b["mask"], geoms, train=True, rngs={"fusion": jax.random.key(1)},
            mutable=["batch_stats"])
        if loss_point == "pred_sq":
            return jnp.mean(pred.astype(jnp.float32) ** 2)
        pred = jnp.clip(pred, cfg.min_depth, None)
        dmask = b["depth"] > cfg.min_depth
        return silog_loss(pred, b["depth"], dmask, interpolate=True)

    return loss_fn, params, batch


def mini_check(name, mesh, kind="twins", conv_in=True, B=4, H=8, W=12,
               C=16, ws=2, x64=True, sub=("lga", "gsa")):
    """Standalone composition repro: [conv3x3 ->] tokens -> attention ->
    image, mean^2 loss, grad wrt params; input sharded P('data','spatial')."""
    import flax.linen as nn

    from cfpnet_tpu.models.transformer import (
        GlobalSubSampleAttn, LocallyGroupedAttn, LoFTREncoderLayer)

    if x64:
        jax.config.update("jax_enable_x64", True)

    class Mini(nn.Module):
        @nn.compact
        def __call__(self, img):
            b, h, w, _ = img.shape
            x = img
            if conv_in:
                x = nn.Conv(C, (3, 3), padding="SAME", name="cin")(x)
            t = x.reshape(b, h * w, C)
            if kind == "loftr":
                t = LoFTREncoderLayer(C, 8, name="enc")(t, t)
            else:
                if "lga" in sub:
                    t = LocallyGroupedAttn(C, ws, name="lga")(t, (h, w))
                if "gsa" in sub:
                    t = GlobalSubSampleAttn(C, ws, name="gsa")(t, (h, w))
            return t.reshape(b, h, w, C)

    dtype = jnp.float64 if x64 else jnp.float32
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.standard_normal((B, H, W, C)), dtype)
    model = Mini()
    params = model.init(jax.random.key(0), img)["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)

    def loss_fn(p, b):
        return jnp.mean(model.apply({"params": p}, b["img"]) ** 2)

    try:
        return grad_check(name, loss_fn, params, (), {"img": img}, mesh,
                          "batch_spatial")
    finally:
        if x64:
            jax.config.update("jax_enable_x64", False)


def conv_check(name, mesh, depth=4, up=False, B=4, H=48, W=64, C=8,
               x64=True, bn=False, posenc=False, train_bn=True, se=False):
    """Decoder-shaped conv pyramid: stride-2 3x3 convs down to a ~3-row
    map (kernel covers the per-shard rows under sp=2 — the r4 dense-conv
    partitioner bug's regime), optional align-corners upsample back,
    optional train-mode BN after each conv, optional positional-encoding
    dynamic-slice crop-add (fusion.py:80-96) at the bottom."""
    import flax.linen as nn

    from cfpnet_tpu.ops.interp import resize_bilinear_align_corners

    if x64:
        jax.config.update("jax_enable_x64", True)

    class Pyramid(nn.Module):
        @nn.compact
        def __call__(self, img):
            x = img

            def maybe_bn(x, nm):
                if bn:
                    x = nn.BatchNorm(use_running_average=not train_bn,
                                     epsilon=1e-5, name=nm)(x)
                return x

            for d in range(depth):
                x = nn.Conv(C, (3, 3), strides=(2, 2), padding="SAME",
                            name=f"down{d}")(x)
                x = maybe_bn(x, f"bnd{d}")
                x = nn.leaky_relu(x)
            x = nn.Conv(C, (3, 3), padding="SAME", name="mid")(x)
            if se:
                from cfpnet_tpu.models.efficientnetv2 import SqueezeExcite
                x = SqueezeExcite(rd_channels=max(1, C // 4), name="se")(x)
            if posenc:
                h, w = x.shape[1], x.shape[2]
                maxh, maxw = h + 2, w + 3
                pos = self.param("pos", nn.initializers.normal(0.2),
                                 (maxh, maxw, C), x.dtype)
                rng = self.make_rng("fusion")
                ky, kx = jax.random.split(rng)
                oy = jax.random.randint(ky, (), 0, maxh - h + 1)
                ox = jax.random.randint(kx, (), 0, maxw - w + 1)
                x = x + jax.lax.dynamic_slice(pos, (oy, ox, 0), (h, w, C))[None]
            if up:
                for d in range(depth):
                    x = resize_bilinear_align_corners(
                        x, x.shape[1] * 2, x.shape[2] * 2)
                    x = nn.Conv(C, (3, 3), padding="SAME", name=f"up{d}")(x)
                    x = maybe_bn(x, f"bnu{d}")
                    x = nn.leaky_relu(x)
            return x

    dtype = jnp.float64 if x64 else jnp.float32
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.standard_normal((B, H, W, C)), dtype)
    model = Pyramid()
    variables = model.init({"params": jax.random.key(0),
                            "fusion": jax.random.key(2)}, img)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating)
        else a, variables)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def loss_fn(p, b):
        out = model.apply(
            {"params": p, **({"batch_stats": stats} if bn else {})},
            b["img"], rngs={"fusion": jax.random.key(3)},
            mutable=["batch_stats"] if (bn and train_bn) else False)
        if isinstance(out, tuple):
            out = out[0]
        return jnp.mean(out ** 2)

    try:
        return grad_check(name, loss_fn, params, (), {"img": img}, mesh,
                          "batch_spatial")
    finally:
        if x64:
            jax.config.update("jax_enable_x64", False)


def submodule_check(name, mesh, which="backbone", safe=True, x64=False,
                    loss_feats=(0, 1, 2, 3, 4)):
    """Backbone-only / decoder-only gradient checks under spatial sharding."""
    from cfpnet_tpu.models.decoder import Decoder
    from cfpnet_tpu.models.deltar import model_geometries
    from cfpnet_tpu.models.efficientnetv2 import V2_TINY_STAGES, V2_TINY_STEM
    from cfpnet_tpu.models.encoder import HistogramEncoder, ImageEncoder

    if x64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if x64 else jnp.float32
    cfg = tiny_config(attention_layer=[])
    B, H, W = 4, 48, 64
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.standard_normal((B, H, W, 3)), dtype)

    try:
        if which == "backbone":
            model = ImageEncoder(V2_TINY_STEM, V2_TINY_STAGES, safe_dw_vjp=safe)
            variables = model.init(jax.random.key(0), img, True)
            variables = jax.tree_util.tree_map(
                lambda a: a.astype(dtype), variables)
            params, stats = variables["params"], variables["batch_stats"]

            def loss_fn(p, b):
                feats, _ = model.apply(
                    {"params": p, "batch_stats": stats}, b["image"], True,
                    mutable=["batch_stats"])
                return sum(jnp.mean(feats[i] ** 2) for i in loss_feats)

            return grad_check(name, loss_fn, params, (), {"image": img},
                              mesh, "batch_spatial")

        # decoder-only: fabricate the tiny pyramid + hist features
        geoms = model_geometries(cfg, "train")
        enc = ImageEncoder(V2_TINY_STEM, V2_TINY_STAGES)
        zeros = jnp.zeros((B, H, W, 3), dtype)
        evars = enc.init(jax.random.key(0), zeros, False)
        feat_shapes = [f.shape for f in enc.apply(evars, zeros, False)]
        dc = (64, 64, 32, 16, 8)
        hc = (dc[3] // 2, dc[2] // 2, dc[1] // 2)
        n = cfg.zone_sample_num
        img_features = [jnp.asarray(rng.standard_normal(s), dtype)
                        for s in feat_shapes]
        hist_features = [jnp.asarray(rng.standard_normal((B, 4, n, c)), dtype)
                         for c in hc]
        hist_mask = jnp.ones((B, 4), bool)
        dec = Decoder(num_classes=32, encoder_channels=(16, 16, 8, 8, 8),
                      decoder_channels=dc, native_resolution=(64, 96),
                      attention_layers=(), zone_sample_num=n)
        dvars = dec.init(
            {"params": jax.random.key(0), "fusion": jax.random.key(1)},
            img_features, hist_features, hist_mask, geoms, True)
        dvars = jax.tree_util.tree_map(lambda a: a.astype(dtype), dvars)
        params, stats = dvars["params"], dvars["batch_stats"]

        def loss_fn(p, b):
            out, _ = dec.apply(
                {"params": p, "batch_stats": stats},
                [b[f"f{i}"] for i in range(5)],
                [b[f"h{i}"] for i in range(3)], b["mask"], geoms, True,
                mutable=["batch_stats"], rngs={"fusion": jax.random.key(3)})
            return jnp.mean(out ** 2)

        batch = {f"f{i}": f for i, f in enumerate(img_features)}
        batch.update({f"h{i}": h for i, h in enumerate(hist_features)})
        batch["mask"] = hist_mask

        def shard_fn(bt, mesh_):
            return {
                k: jax.device_put(
                    v, NamedSharding(
                        mesh_, P("data", "spatial")
                        if k.startswith("f") else P("data")))
                for k, v in bt.items()
            }

        return grad_check(name, loss_fn, params, (), batch, mesh, shard_fn)
    finally:
        if x64:
            jax.config.update("jax_enable_x64", False)


def blocks_check(name, mesh, kinds=("cn", "er", "er", "ir", "ir", "ir"),
                 strides=(1, 2, 2, 2, 1, 2), B=4, H=48, W=64, x64=True,
                 train=True, stem=True, chs=8):
    """Chain of the REAL backbone blocks (ConvBnAct/EdgeResidual/
    InvertedResidual) to isolate which block composition trips the
    partitioner."""
    import flax.linen as nn

    from cfpnet_tpu.models.efficientnetv2 import (
        BN_EPS, BN_MOMENTUM, ConvBnAct, EdgeResidual, InvertedResidual)

    if x64:
        jax.config.update("jax_enable_x64", True)

    class Chain(nn.Module):
        @nn.compact
        def __call__(self, img, train_):
            x = img
            if stem:
                x = nn.Conv(chs, (3, 3), strides=(2, 2), padding="SAME",
                            use_bias=False, name="stem")(x)
                x = nn.BatchNorm(use_running_average=not train_,
                                 momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                 name="stem_bn")(x)
                x = nn.silu(x)
            for i, (kind, s_) in enumerate(zip(kinds, strides)):
                out = chs if i < len(kinds) // 2 else chs * 2
                if kind == "cn":
                    x = ConvBnAct(out, 3, s_, name=f"b{i}")(x, train_)
                elif kind == "er":
                    x = EdgeResidual(out, 2.0, 3, s_, name=f"b{i}")(x, train_)
                else:
                    x = InvertedResidual(out, 2.0, 3, s_, 0.25,
                                         name=f"b{i}")(x, train_)
            return x

    dtype = jnp.float64 if x64 else jnp.float32
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.standard_normal((B, H, W, 3)), dtype)
    model = Chain()
    variables = model.init(jax.random.key(0), img, True)
    variables = jax.tree_util.tree_map(lambda a: a.astype(dtype), variables)
    params, stats = variables["params"], variables.get("batch_stats", {})

    def loss_fn(p, b):
        out, _ = model.apply({"params": p, "batch_stats": stats},
                             b["image"], train, mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    try:
        return grad_check(name, loss_fn, params, (), {"image": img},
                          mesh, "batch_spatial")
    finally:
        if x64:
            jax.config.update("jax_enable_x64", False)


def run_variant(name, mesh, cfg, loss_point="pred"):
    loss_fn, params, batch = full_train_loss(cfg, loss_point=loss_point)
    return grad_check(name, loss_fn, params, (), batch, mesh, "batch_spatial")


def main(stages):
    mesh = make_mesh_2d(dp=4, sp=2)
    variants = {
        "full": (tiny_config(), "pred"),
        "pred_sq": (tiny_config(), "pred_sq"),
        "att_combine1": (tiny_config(attention_layer=["combine1"]), "pred_sq"),
        "att_image": (tiny_config(attention_layer=["image"]), "pred_sq"),
        "att_hist": (tiny_config(attention_layer=["hist2image"]), "pred_sq"),
        "att_cvxt": (tiny_config(attention_layer=["cvxt"]), "pred_sq"),
        "att_newcross": (tiny_config(attention_layer=["new_cross"]), "pred_sq"),
        "train_false": (tiny_config(), "eval_sq"),
    }
    for name, (cfg, lp) in variants.items():
        if stages and name not in stages:
            continue
        try:
            run_variant(name, mesh, cfg, loss_point=lp)
        except Exception as e:
            print(f"[err ] {name}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    for nm, kw in (("att_empty", {}), ("att_empty_nosafe",
                                       dict(safe_dw_vjp=False))):
        if stages and nm not in stages:
            continue
        try:
            run_variant(nm, mesh, tiny_config(attention_layer=[], **kw),
                        loss_point="pred_sq")
        except Exception as e:
            print(f"[err ] {nm}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    minis = {
        "mini_twins": dict(kind="twins"),
        "mini_gsa": dict(sub=("gsa",)),
        "mini_lsa": dict(sub=("lga",)),
        "mini_gsa_noconv": dict(sub=("gsa",), conv_in=False),
        "mini_lsa_noconv": dict(sub=("lga",), conv_in=False),
        "mini_loftr": dict(kind="loftr"),
        "mini_loftr_noconv": dict(kind="loftr", conv_in=False),
    }
    for name, kw in minis.items():
        if stages and name not in stages:
            continue
        try:
            mini_check(name, mesh, **kw)
        except Exception as e:
            print(f"[err ] {name}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    convs = {
        # decoder-like: stride-2 pyramid down to a 3-row map, 3x3 convs
        # whose kernel covers the per-shard rows at sp=2, then upsample back
        "conv_pyramid_up": dict(depth=4, up=True),
        "conv_pyramid": dict(depth=4, up=False),
        "conv_pyramid2": dict(depth=3, up=False),
        "conv_bn": dict(depth=4, up=True, bn=True),
        "conv_bn_eval": dict(depth=4, up=True, bn=True, train_bn=False),
        "conv_posenc": dict(depth=4, up=True, posenc=True),
        "conv_bn_posenc": dict(depth=4, up=True, bn=True, posenc=True),
        "conv_se4": dict(depth=4, se=True),          # 3x4 map: uneven rows/sp=2
        "conv_se3": dict(depth=3, se=True),          # 6x8 map: even rows/sp=2
        "conv_se4_up": dict(depth=4, up=True, se=True),
        "conv_se0": dict(depth=0, se=True, H=6, W=8),
    }
    for name, kw in convs.items():
        if stages and name not in stages:
            continue
        try:
            conv_check(name, mesh, **kw)
        except Exception as e:
            print(f"[err ] {name}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    blocks = {
        "blocks_full": dict(),
        "blocks_cn_er": dict(kinds=("cn", "er", "er"), strides=(1, 2, 2)),
        "blocks_ir": dict(kinds=("ir", "ir", "ir"), strides=(2, 1, 2)),
        "blocks_er": dict(kinds=("er", "er", "er"), strides=(2, 2, 2)),
        "blocks_cn": dict(kinds=("cn", "cn", "cn"), strides=(1, 2, 2)),
        "blocks_full_eval": dict(train=False),
    }
    for name, kw in blocks.items():
        if stages and name not in stages:
            continue
        try:
            blocks_check(name, mesh, **kw)
        except Exception as e:
            print(f"[err ] {name}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    subs = {
        "backbone_safe": dict(which="backbone", safe=True),
        "backbone_raw": dict(which="backbone", safe=False),
        "decoder_only": dict(which="decoder"),
        "backbone_safe64": dict(which="backbone", safe=True, x64=True),
        "decoder_only64": dict(which="decoder", x64=True),
        "backbone_last": dict(which="backbone", loss_feats=(4,)),
        "backbone_f0": dict(which="backbone", loss_feats=(0,)),
        "backbone_f01": dict(which="backbone", loss_feats=(0, 1)),
    }
    for name, kw in subs.items():
        if stages and name not in stages:
            continue
        try:
            submodule_check(name, mesh, **kw)
        except Exception as e:
            print(f"[err ] {name}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
