#!/usr/bin/env python
"""Trustworthy per-component latency via in-graph chaining.

Per-call fenced timing through the axon tunnel understates device time
(block_until_ready acks early), so every measurement here chains the op N
times inside ONE jit with a loop-carried data dependence and divides wall
time by N.

Usage: python scripts/profile_chained.py [bf16] [bs]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from cfpnet_tpu.config import Config
from cfpnet_tpu.models.decoder import Decoder
from cfpnet_tpu.models.deltar import make_model, model_geometries
from cfpnet_tpu.models.encoder import HistogramEncoder, ImageEncoder
from cfpnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N_CHAIN = 10


def chain_time(apply_fn, x0, *extra):
    """apply_fn(x, *extra) -> y (any pytree). Chains via x + tiny*mean(y).

    Ends in a host-materialized scalar (float()) — on this remote tunnel
    even ``block_until_ready`` can acknowledge before device completion;
    pulling the value to the host cannot be faked."""

    def run(x):
        def body(i, acc):
            y = apply_fn(acc, *extra)
            leaves = jax.tree_util.tree_leaves(y)
            s = leaves[0].reshape(-1)[0] * 1e-30
            return x + s.astype(x.dtype)

        return jnp.sum(jax.lax.fori_loop(0, N_CHAIN, body, x))

    g = jax.jit(run)
    float(g(x0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(x0))
        ts.append(time.perf_counter() - t0)
    return min(ts) / N_CHAIN * 1000.0


def main():
    dtype = jnp.bfloat16 if any("bf" in a for a in sys.argv[1:]) else jnp.float32
    bs = next((int(a) for a in sys.argv[1:] if a.isdigit()), 1)
    cfg = Config(
        n_bins=256,
        attention_layer=["hist2image", "combine1", "image",
                         "hist2image", "combine1", "image"],
        change_embedding=True, sample_uniform=True,
    )
    model = make_model(cfg)
    geoms = model_geometries(cfg, "online_eval")
    h, w = 480, 640
    rng = jax.random.key(0)
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, t
    )

    img = jnp.zeros((bs, h, w, 3), dtype)
    hist = jnp.full((bs, 64, 16), 2.0, dtype)
    mask = jnp.ones((bs, 64), bool)
    variables = cast(jax.jit(
        lambda r: model.init({"params": r, "fusion": r}, img, hist, mask, geoms,
                             train=False)
    )(rng))
    t = chain_time(lambda x: model.apply(variables, x, hist, mask, geoms,
                                         train=False)[1], img)
    print(f"[{dtype.__name__} bs={bs}] full eval fwd: {t:.2f} ms")

    bb = ImageEncoder()
    bbv = cast(jax.jit(lambda r: bb.init(r, img))(rng))
    t = chain_time(lambda x: bb.apply(bbv, x)[-1], img)
    print(f"  backbone:      {t:.2f} ms")

    he = HistogramEncoder()
    hev = cast(jax.jit(lambda r: he.init(r, hist[..., None]))(rng))
    t = chain_time(lambda x: he.apply(hev, x)[-1], hist[..., None])
    print(f"  hist encoder:  {t:.2f} ms")

    dec = Decoder(native_resolution=(h, w), attention_layers=tuple(cfg.attention_layer),
                  change_embedding=True)
    feats = [
        jnp.zeros((bs, h // 2, w // 2, 16), dtype),
        jnp.zeros((bs, h // 4, w // 4, 40), dtype),
        jnp.zeros((bs, h // 8, w // 8, 56), dtype),
        jnp.zeros((bs, h // 16, w // 16, 136), dtype),
        jnp.zeros((bs, h // 32, w // 32, 232), dtype),
    ]
    hf = [jnp.zeros((bs, 64, 16, c), dtype) for c in (32, 64, 128)]
    decv = cast(jax.jit(
        lambda r: dec.init({"params": r, "fusion": r}, feats, hf, mask, geoms)
    )(rng))
    t = chain_time(
        lambda x: dec.apply(decv, [x] + feats[1:], hf, mask, geoms, train=False),
        feats[0],
    )
    print(f"  decoder+fusion:{t:.2f} ms")

    from cfpnet_tpu.models.fusion import TransformerFusion

    for scale, dim, kern in ((4, 32, 31), (8, 64, 15), (16, 128, 7)):
        fh_, fw_ = h // scale, w // scale
        fus = TransformerFusion(
            embedding_dim=dim, max_resolution=(fh_, fw_),
            layer_names=tuple(cfg.attention_layer), large_kernel=kern,
            zone_sample_num=16, change_embedding=True,
        )
        x = jnp.zeros((bs, fh_, fw_, dim), dtype)
        f1 = jnp.zeros((bs, 64, 16, dim), dtype)
        fv = cast(jax.jit(
            lambda r: fus.init({"params": r, "fusion": r}, x, f1, mask, geoms[scale])
        )(rng))
        t = chain_time(
            lambda xx: fus.apply(fv, xx, f1, mask, geoms[scale], train=False), x
        )
        print(f"  fusion@1/{scale} ({dim}d,k{kern}): {t:.2f} ms")


if __name__ == "__main__":
    main()
