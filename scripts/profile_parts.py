#!/usr/bin/env python
"""Per-component latency breakdown on the TPU (bs=1, 480x640, f32/bf16).

Times the full forward, the backbone alone, the hist encoder alone, and a
decoder-only pass (pyramid features precomputed) to locate the hot spots
before writing Pallas kernels.

Usage: python scripts/profile_parts.py [bfloat16]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from cfpnet_tpu.config import Config
from cfpnet_tpu.models.deltar import make_model, model_geometries
from cfpnet_tpu.models.decoder import Decoder
from cfpnet_tpu.models.encoder import HistogramEncoder, ImageEncoder

from cfpnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()



def bench(fn, *args, iters=100):
    out = fn(*args)
    jax.block_until_ready(out)
    # per-call fencing (same protocol as bench.py / the reference harness)
    times = []
    for _ in range(iters):
        t = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t)
    times.sort()
    return sum(times[: max(1, iters // 2)]) / max(1, iters // 2) * 1000.0


def main():
    dtype = jnp.bfloat16 if (len(sys.argv) > 1 and "bf" in sys.argv[1]) else jnp.float32
    cfg = Config(
        n_bins=256,
        attention_layer=["hist2image", "combine1", "image",
                         "hist2image", "combine1", "image"],
        change_embedding=True, sample_uniform=True,
    )
    model = make_model(cfg)
    geoms = model_geometries(cfg, "online_eval")
    h, w = 480, 640
    rgb = jnp.zeros((1, h, w, 3), dtype)
    hist = jnp.full((1, 64, 16), 2.0, dtype)
    mask = jnp.ones((1, 64), bool)

    variables = jax.jit(
        lambda r: model.init({"params": r, "fusion": jax.random.fold_in(r, 1)},
                             rgb, hist, mask, geoms, train=False)
    )(jax.random.key(0))
    cast = lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x
    variables = jax.tree_util.tree_map(cast, variables)

    full = jax.jit(lambda v: model.apply(v, rgb, hist, mask, geoms, train=False)[1])
    print(f"full forward: {bench(full, variables):.3f} ms   [{dtype.__name__}]")

    # backbone only
    bb = ImageEncoder()
    bbv = jax.tree_util.tree_map(cast, jax.jit(lambda r: bb.init(r, rgb))(jax.random.key(0)))
    bfn = jax.jit(lambda v: bb.apply(v, rgb)[-1])
    print(f"backbone:     {bench(bfn, bbv):.3f} ms")

    # hist encoder only
    he = HistogramEncoder()
    hev = jax.tree_util.tree_map(cast, jax.jit(lambda r: he.init(r, hist[..., None]))(jax.random.key(0)))
    hfn = jax.jit(lambda v: he.apply(v, hist[..., None])[-1])
    print(f"hist encoder: {bench(hfn, hev):.3f} ms")

    # decoder only (on dummy pyramid feats)
    dec = Decoder(
        native_resolution=(480, 640),
        attention_layers=tuple(cfg.attention_layer),
        change_embedding=True,
    )
    feats = [
        jnp.zeros((1, h // 2, w // 2, 16), dtype),
        jnp.zeros((1, h // 4, w // 4, 40), dtype),
        jnp.zeros((1, h // 8, w // 8, 56), dtype),
        jnp.zeros((1, h // 16, w // 16, 136), dtype),
        jnp.zeros((1, h // 32, w // 32, 232), dtype),
    ]
    hfeats = [
        jnp.zeros((1, 64, 16, 32), dtype),
        jnp.zeros((1, 64, 16, 64), dtype),
        jnp.zeros((1, 64, 16, 128), dtype),
    ]
    decv = jax.tree_util.tree_map(
        cast,
        jax.jit(lambda r: dec.init({"params": r, "fusion": r}, feats, hfeats, mask, geoms))(
            jax.random.key(0)
        ),
    )
    dfn = jax.jit(lambda v: dec.apply(v, feats, hfeats, mask, geoms, train=False))
    print(f"decoder+fusion: {bench(dfn, decv):.3f} ms")

    # fusion modules alone, per scale
    from cfpnet_tpu.models.fusion import TransformerFusion

    for scale, dim, kern in ((4, 32, 31), (8, 64, 15), (16, 128, 7)):
        fh, fw = h // scale, w // scale
        fus = TransformerFusion(
            embedding_dim=dim, max_resolution=(fh, fw),
            layer_names=tuple(cfg.attention_layer), large_kernel=kern,
            zone_sample_num=16, change_embedding=True,
        )
        x = jnp.zeros((1, fh, fw, dim), dtype)
        f1 = jnp.zeros((1, 64, 16, dim), dtype)
        fv = jax.tree_util.tree_map(
            cast,
            jax.jit(lambda r: fus.init({"params": r, "fusion": r}, x, f1, mask,
                                       geoms[scale]))(jax.random.key(0)),
        )
        ffn = jax.jit(lambda v: fus.apply(v, x, f1, mask, geoms[scale], train=False))
        print(f"fusion@1/{scale} ({dim}d, k{kern}): {bench(ffn, fv):.3f} ms")

    # Block14 large-kernel dwconv alone at 1/4
    from cfpnet_tpu.models.convnext import Block14

    for scale, dim, kern in ((4, 32, 31), (8, 64, 15)):
        fh, fw = h // scale, w // scale
        blk = Block14(dim, kern)
        x = jnp.zeros((1, fh, fw, dim), dtype)
        bv = jax.tree_util.tree_map(cast, jax.jit(lambda r: blk.init(r, x))(jax.random.key(0)))
        bfn2 = jax.jit(lambda v: blk.apply(v, x, train=False))
        print(f"block14@1/{scale} k{kern}: {bench(bfn2, bv):.3f} ms")


if __name__ == "__main__":
    main()
