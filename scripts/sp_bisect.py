"""Bisect the train-side spatial-sharding backward miscompile (VERDICT r4 #4).

Round-4 finding (PARITY.md round-4 deep dive): with P('data','spatial')
train batches on a ('data','spatial') mesh, the full-graph backward
computes wrong gradients while the loss stays correct — and every
individual op audits clean in isolation.

Round-5 conclusions (this script + scripts/sp_trainstep_diag.py, all f64):
- Much of the r4 "rel ~0.1-0.2 in hist-encoder leaves" signal was a
  METRIC artifact: biases feeding train-mode normalizers have exactly-zero
  mathematical gradients, and a per-leaf rel there compares roundoff
  against roundoff. grad_check floors leaf scale at 1e-6x the global
  gradient max (and prints the raw metric beside it).
- EVERYTHING ELSE was a PLACEMENT artifact. This script's early runs —
  like the r4 audit and the first half of round 5 — passed params
  committed to device 0 (the jitted init's output placement) together
  with the mesh-sharded batch. jax 0.9.0 silently mis-partitions that
  mix instead of raising: grad-only graphs showed an apparent
  dL/d(gsa.sr.*) = exactly-1/dp "miscompile" (which sharding pins
  seemed to fix), and the full train step showed O(1)-wrong backbone
  updates (which nothing fixed). With params PLACED on the mesh
  (replicated — the production placement; grad_check now does this by
  default, pass placement="device0" to reproduce the artifact) the raw
  full graph and the full f64 train step are clean to ~1e-13 with NO
  model changes, pins, or GSA custom VJPs (sp_trainstep_diag stages
  H/I/J/K). run_training device_puts the state accordingly;
  tests/test_spatial.py::test_upstream_mixed_placement_canary keeps a
  strict-xfail repro of the hazard.
- The r4 grouped-conv dL/dW miscompile is REAL and composes: for
  P('data') batches on a 2-D mesh the full train step returns exact
  conv_dw kernel-grad errors regardless of placement (sp_trainstep_diag
  stages L/L2) — --safe_dw_vjp remains required on multi-axis meshes.

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


def grad_check(name, loss_fn, params, args, batch_tree, mesh, spec,
               placement="mesh"):
    """Compare jax.grad(loss_fn)(params, *args, **batch) single-device vs
    with batch_tree sharded P(spec) on mesh. Returns worst rel error.

    Leaf scale is floored at 1e-6x the GLOBAL gradient max: leaves whose
    mathematical gradient is exactly zero (any bias feeding a train-mode
    normalizer — BN/LN mean-subtraction cancels the shift) carry pure
    roundoff on BOTH sides, and a per-leaf rel there compares noise
    against noise (O(1) 'failures' in f32, ~1e-5 in f64). The round-4
    audit's per-leaf rel metric had exactly this artifact.

    placement="mesh" (default) device_puts params REPLICATED on the mesh
    for the sharded call — the production placement. placement="device0"
    leaves them committed to device 0 (the jitted init's output), which
    jax 0.9.0 silently mis-partitions next to a P('data','spatial') batch
    (the round-5 placement hazard — expect spurious 'miscompiles')."""
    from cfpnet_tpu.parallel.mesh import replicated_sharding

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
    params_m = params
    if placement == "mesh":
        params_m = jax.device_put(params, replicated_sharding(mesh))
    got = jax.device_get(g(params_m, *args, sharded))
    gscale = max(np.abs(np.asarray(b, np.float64)).max()
                 for b in jax.tree_util.tree_leaves(ref))
    worst, wkey = 0.0, None
    worst_raw, wkey_raw = 0.0, None
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(got),
            jax.tree_util.tree_leaves_with_path(ref)):
        a64, b64 = np.asarray(a, np.float64), np.asarray(b, np.float64)
        leaf_scale = np.abs(b64).max()
        diff = np.abs(a64 - b64).max()
        rel = diff / max(leaf_scale, 1e-6 * gscale, 1e-300)
        if rel > worst:
            worst, wkey = rel, jax.tree_util.keystr(pa)
        raw = diff / max(leaf_scale, 1e-300)
        if raw > worst_raw:
            worst_raw, wkey_raw = raw, jax.tree_util.keystr(pa)
    status = "FAIL" if worst > 1e-3 else "ok  "
    print(f"[{status}] {name}: worst rel {worst:.3e} at {wkey} "
          f"(gscale {gscale:.2e}; per-leaf raw {worst_raw:.2e} at "
          f"{wkey_raw})", flush=True)
    return worst


def full_train_loss(cfg, loss_point="pred", x64=False):
    """Build (loss_fn(params, batch), params, batch) for the tiny model."""
    model = make_model(cfg, tiny=True)
    geoms = model_geometries(cfg, "train")
    ds = SyntheticDataset(cfg, "train", length=cfg.bs)
    batch = collate([ds[i] for i in range(cfg.bs)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    if x64:
        batch = {k: v.astype(jnp.float64)
                 if jnp.issubdtype(v.dtype, jnp.floating) else v
                 for k, v in batch.items()}
    rng = jax.random.key(0)
    variables = model.init(
        {"params": rng, "fusion": rng}, batch["image"], batch["hist_data"],
        batch["mask"], geoms, train=True)
    if x64:
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, variables)
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


def bnmin_check(name, mesh, depth=1, B=4, H=6, W=8, C=8, stride=2,
                handbn=True, x64=True, flaxconv=False):
    """Smallest-candidate repro: [conv3x3 -> train-mode batch-norm]*depth
    -> mean^2 loss, grad wrt params; input P('data','spatial'). BN is
    HAND-ROLLED jnp (mean/var over (0,1,2)) when handbn, else flax — to
    pin whether the miscompile needs flax.BatchNorm or is pure-jnp."""
    import flax.linen as nn

    if x64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if x64 else jnp.float32
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.standard_normal((B, H, W, C)), dtype)

    def conv_apply(p, x, i):
        if flaxconv:
            raise NotImplementedError
        k, b = p[f"k{i}"], p[f"b{i}"]
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    def bn_apply(p, x, i):
        if handbn:
            mu = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
            var = jnp.mean((x - mu) ** 2, axis=(0, 1, 2), keepdims=True)
            xhat = (x - mu) * jax.lax.rsqrt(var + 1e-5)
            return xhat * p[f"g{i}"] + p[f"beta{i}"]
        raise NotImplementedError

    params = {}
    prng = np.random.default_rng(9)
    cin = C
    for i in range(depth):
        params[f"k{i}"] = jnp.asarray(
            prng.standard_normal((3, 3, cin, C)) * 0.2, dtype)
        params[f"b{i}"] = jnp.asarray(prng.standard_normal((C,)) * 0.1, dtype)
        params[f"g{i}"] = jnp.asarray(1.0 + 0.1 * prng.standard_normal((C,)),
                                      dtype)
        params[f"beta{i}"] = jnp.asarray(0.1 * prng.standard_normal((C,)),
                                         dtype)
        cin = C

    def loss_fn(p, b):
        x = b["img"]
        for i in range(depth):
            x = conv_apply(p, x, i)
            x = bn_apply(p, x, i)
            x = nn.leaky_relu(x)
        return jnp.mean(x ** 2)

    try:
        return grad_check(name, loss_fn, params, (), {"img": img}, mesh,
                          "batch_spatial")
    finally:
        if x64:
            jax.config.update("jax_enable_x64", False)


def run_variant(name, mesh, cfg, loss_point="pred", x64=False):
    if x64:
        jax.config.update("jax_enable_x64", True)
    try:
        loss_fn, params, batch = full_train_loss(
            cfg, loss_point=loss_point, x64=x64)
        return grad_check(name, loss_fn, params, (), batch, mesh,
                          "batch_spatial")
    finally:
        if x64:
            jax.config.update("jax_enable_x64", False)


def main(stages):
    mesh = make_mesh_2d(dp=4, sp=2)
    variants = {
        "full": (tiny_config(), "pred", False),
        "pred_sq": (tiny_config(), "pred_sq", False),
        "att_combine1": (tiny_config(attention_layer=["combine1"]),
                         "pred_sq", False),
        "att_image": (tiny_config(attention_layer=["image"]),
                      "pred_sq", False),
        "att_hist": (tiny_config(attention_layer=["hist2image"]),
                     "pred_sq", False),
        "att_cvxt": (tiny_config(attention_layer=["cvxt"]), "pred_sq", False),
        "att_newcross": (tiny_config(attention_layer=["new_cross"]),
                         "pred_sq", False),
        "train_false": (tiny_config(), "eval_sq", False),
        # f64 reruns of every previously-'failing' stage (per-leaf rel at
        # zero-grad bias leaves was the round-4 artifact)
        "full64": (tiny_config(), "pred", True),
        "pred_sq64": (tiny_config(), "pred_sq", True),
        "att_combine164": (tiny_config(attention_layer=["combine1"]),
                           "pred_sq", True),
        "att_image64": (tiny_config(attention_layer=["image"]),
                        "pred_sq", True),
        "att_hist64": (tiny_config(attention_layer=["hist2image"]),
                       "pred_sq", True),
        "train_false64": (tiny_config(), "eval_sq", True),
    }
    for name, (cfg, lp, x64) in variants.items():
        if stages and name not in stages:
            continue
        try:
            run_variant(name, mesh, cfg, loss_point=lp, x64=x64)
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
        # HISTORY: with device-0-committed params (placement="device0"),
        # full-graph f64 runs showed gsa.sr.{kernel,bias} grads at exactly
        # 1/dp of truth for dp>=2 while these standalone minis stayed
        # clean (1e-15) at matched shapes — that asymmetry was the first
        # hint the "miscompile" was really the mixed-placement hazard
        # (see module docstring). With the default mesh placement the
        # full graph is clean too; kept as probes.
        "mini_gsa_h2": dict(sub=("gsa",), H=2, W=4, x64=True),
        "mini_gsa_h2_noconv": dict(sub=("gsa",), conv_in=False, H=2, W=4,
                                   x64=True),
        "mini_gsa_h4": dict(sub=("gsa",), H=4, W=4, x64=True),
        "mini_twins_h2": dict(kind="twins", H=2, W=4, x64=True),
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
        # depth/upsample/evenness sweep for the train-BN discrepancy
        "conv_bn_noup": dict(depth=4, bn=True),
        "conv_bn_d1": dict(depth=1, bn=True),
        "conv_bn_d2": dict(depth=2, bn=True),
        "conv_bn_d3": dict(depth=3, bn=True),
        "conv_bn_even": dict(depth=4, bn=True, H=96),  # final 6 rows: even/sp=2
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

    bnmins = {
        "bnmin_d1": dict(depth=1),
        "bnmin_d2": dict(depth=2),
        "bnmin_d3": dict(depth=3),
        "bnmin_d4_h48": dict(depth=4, H=48, W=64),
        "bnmin_d1_s1": dict(depth=1, stride=1),
        "bnmin_d2_f32": dict(depth=2, x64=False),
    }
    for name, kw in bnmins.items():
        if stages and name not in stages:
            continue
        try:
            bnmin_check(name, mesh, **kw)
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
        "backbone_last64": dict(which="backbone", loss_feats=(4,), x64=True),
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
