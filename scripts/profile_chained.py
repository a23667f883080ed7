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

N_CHAIN = 50  # the tunnel roundtrip (~30 ms) divides by this: keep it large


def chain_time(apply_fn, x0, *extra):
    """apply_fn(x, *extra) -> y (any pytree). Chains via x + tiny*mean(y).

    Ends in a host-materialized scalar (float()) — on this remote tunnel
    even ``block_until_ready`` can acknowledge before device completion;
    pulling the value to the host cannot be faked."""

    def run(x):
        def body(i, acc):
            y = apply_fn(acc, *extra)
            leaves = jax.tree_util.tree_leaves(y)
            # chain through a MEAN of the output, not a single element: a
            # sliced scalar would let XLA narrow convolutions to the one
            # consumed output pixel and understate conv-heavy components
            s = jnp.mean(leaves[0].astype(jnp.float32)) * 1e-30
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


def profile_train():
    """Per-component train-step profile (VERDICT r2 item 1): full step vs
    forward+loss vs grad-only — the bwd/opt share is the difference. Usage:
    python scripts/profile_chained.py train [bf16] [bs]."""
    import numpy as np

    from cfpnet_tpu.data.datasets import SyntheticDataset
    from cfpnet_tpu.data.pipeline import collate
    from cfpnet_tpu.train.optim import make_optimizer
    from cfpnet_tpu.train.steps import (create_train_state, make_loss_fn,
                                        make_train_step)

    dtype = "bfloat16" if any("bf" in a for a in sys.argv[1:]) else "float32"
    bs = next((int(a) for a in sys.argv[1:] if a.isdigit()), 16)
    cfg = Config(
        n_bins=256, bs=bs, input_height=416, input_width=544,
        train_zone_num=6, sample_uniform=True, drop_hist=0.34,
        noise_mean=0.17, noise_sigma=0.2, noise_prob=0.3,
        attention_layer=["hist2image", "combine1", "image",
                         "hist2image", "combine1", "image"],
        change_embedding=True, disable_clip_grad=True, hist_encoder_10x=True,
        dataset="synthetic", compute_dtype=dtype,
        remat=any("remat" in a for a in sys.argv[1:]),
    )
    model = make_model(cfg)
    geoms = model_geometries(cfg, "train")
    ds = SyntheticDataset(cfg, "train", length=bs)
    batch = jax.device_put(collate([ds[i] for i in range(bs)]))
    tx = make_optimizer(cfg, total_steps=1000)
    rng = jax.random.key(0)
    state = create_train_state(model, cfg, rng, batch, geoms, tx)
    raw_step = make_train_step(model, cfg, geoms, jit=False)
    # the EXACT production loss body (shared with make_train_step) — a
    # hand-copied loss here would silently drift from the real train graph
    prod_loss = make_loss_fn(model, cfg, geoms)

    def time_scan(fn, label):
        """Chain K calls of fn(carry)->carry inside one jit."""
        def run(c):
            c = jax.lax.fori_loop(0, N_CHAIN, lambda i, cc: fn(cc, i), c)
            leaf = jax.tree_util.tree_leaves(c)[0]
            return jnp.sum(leaf.astype(jnp.float32))
        g = jax.jit(run)
        float(g(state.params))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(state.params))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / N_CHAIN * 1000.0
        print(f"  {label}: {ms:.1f} ms  ({bs * 1000.0 / ms:.1f} img/s)")
        return ms

    # full step (fwd+bwd+AdamW) — carry the params through the chain
    def full(p, i):
        st = state.replace(params=p)
        st2, _ = raw_step(st, batch, jax.random.fold_in(rng, i))
        return st2.params

    def loss_of(p, i):
        loss, _updates = prod_loss(p, state.batch_stats, batch,
                                   jax.random.fold_in(rng, i))
        return loss

    def fwd_only(p, i):
        l = loss_of(p, i)
        return jax.tree_util.tree_map(
            lambda x: x + (l * 1e-30).astype(x.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, p)

    def grad_only(p, i):
        g = jax.grad(lambda pp: loss_of(pp, i))(p)
        return jax.tree_util.tree_map(
            lambda x, gg: x + (gg * 1e-30).astype(x.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, p, g)

    print(f"[train {dtype} bs={bs} 416x544 remat={cfg.remat}]")
    t_floor = time_scan(lambda p, i: p, "chain floor          ")
    t_full = time_scan(full, "full step (fwd+bwd+opt)")
    t_fwd = time_scan(fwd_only, "forward+loss only    ")
    t_grad = time_scan(grad_only, "value_and_grad       ")
    print(f"  implied bwd: {t_grad - t_fwd:.1f} ms, opt+stats: "
          f"{t_full - t_grad:.1f} ms")


def main():
    if any(a == "train" for a in sys.argv[1:]):
        profile_train()
        return
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
    floor = chain_time(lambda x: x * 1.000001, img)
    print(f"[{dtype.__name__} bs={bs}] chain floor (dispatch+roundtrip): "
          f"{floor:.3f} ms — subtract from every line below")
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
