"""bfloat16 accuracy guard (VERDICT round-1 item 5).

The documented fast mode casts params + inputs to bf16
(evaluate_time.timed_forward / bench.py BENCH_DTYPE). Nothing previously
bounded bf16-vs-f32 output divergence, so a regression in a mixed-precision
path (e.g. the FFT dwconv's internal upcast, ops/dwconv.py) would ship
silently. These tests pin the contract:

- the FFT depthwise conv upcasts internally: bf16 in/out, f32 math;
- the full tiny-model forward in bf16 stays within a bounded relative error
  of the f32 prediction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfpnet_tpu.data.datasets import SyntheticDataset
from cfpnet_tpu.models.deltar import make_model, model_geometries
from cfpnet_tpu.ops.dwconv import depthwise_conv2d


def test_fft_dwconv_bf16_upcasts_internally():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 24, 28, 4)).astype(np.float32)
    k = rng.standard_normal((15, 15, 1, 4)).astype(np.float32) / 15.0
    ref = np.asarray(depthwise_conv2d(jnp.asarray(x), jnp.asarray(k)))
    out = depthwise_conv2d(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16)
    )
    assert out.dtype == jnp.bfloat16
    # error budget: bf16 rounding of inputs/outputs only (~2^-8 relative),
    # NOT bf16 accumulation (which would be ~10x worse at k=15). Pointwise
    # relative error is unbounded at cancellation zeros, so the max is
    # normalized by the output RMS.
    err = np.abs(np.asarray(out, np.float32) - ref)
    assert np.median(err / (np.abs(ref) + 1e-3)) < 0.01
    rms = float(np.sqrt((ref**2).mean()))
    assert err.max() < 0.05 * rms, (err.max(), rms)


def test_bn_running_stats_accumulate_f32():
    """ADVICE r2: BN running stats must accumulate at f32 PRECISION, not
    just f32 storage. train/steps.py passes batch_stats into model.apply
    UNCAST under bf16; flax computes batch statistics in f32 and the
    momentum update then stays f32, so increments below one bf16 ulp
    survive. This pins that mechanism at the flax level."""
    import flax.linen as nn

    bn = nn.BatchNorm(use_running_average=False, momentum=0.99, epsilon=1e-5)
    # batch mean ~ 1e-3 -> per-step ra increment ~ 1e-5, far below the bf16
    # ulp at 1.0 (~7.8e-3); start ra_mean at 1.0 where bf16 would freeze it.
    x = (jnp.full((64, 4), 1e-3) + 1e-4 * jnp.arange(4)).astype(jnp.bfloat16)
    variables = bn.init(jax.random.key(0), x)
    variables = {
        "params": jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), variables["params"]),
        "batch_stats": {
            "mean": jnp.ones((4,), jnp.float32),
            "var": jnp.ones((4,), jnp.float32),
        },
    }
    y, updates = bn.apply(variables, x, mutable=["batch_stats"])
    assert y.dtype == jnp.bfloat16  # compute dtype unaffected by f32 stats
    new_mean = updates["batch_stats"]["mean"]
    assert new_mean.dtype == jnp.float32
    # the sub-bf16-ulp increment must have landed
    delta = np.asarray(new_mean) - 1.0
    expected = 0.01 * (np.asarray(x, np.float32).mean(0) - 1.0)
    np.testing.assert_allclose(delta, expected, rtol=1e-4)
    # the same update through a bf16 accumulator would have been destroyed
    frozen = np.asarray(
        (0.99 * jnp.ones((4,), jnp.bfloat16)
         + 0.01 * jnp.asarray(x, jnp.float32).mean(0).astype(jnp.bfloat16)
         ).astype(jnp.float32))
    assert not np.allclose(delta, frozen - 1.0, atol=1e-6)


@pytest.mark.slow
def test_mixed_precision_train_step(tiny_config):
    """--compute_dtype bfloat16 training: forward/backward in bf16, master
    params + BN stats + optimizer state stay f32, and the loss trajectory
    tracks f32 closely. (Measured on the v5e: 275 -> 195 ms/step bs=16,
    58 -> 82 img/s/chip.)"""
    from cfpnet_tpu.data.pipeline import collate
    from cfpnet_tpu.train.optim import make_optimizer
    from cfpnet_tpu.train.steps import create_train_state, make_train_step

    losses = {}
    for dtype in ("float32", "bfloat16"):
        cfg = tiny_config.replace(compute_dtype=dtype, dataset="synthetic")
        model = make_model(cfg, tiny=True)
        geoms = model_geometries(cfg, "train")
        ds = SyntheticDataset(cfg, "train", length=cfg.bs)
        batch = jax.device_put(collate([ds[i] for i in range(cfg.bs)]))
        tx = make_optimizer(cfg, total_steps=6)
        rng = jax.random.key(0)
        state = create_train_state(model, cfg, rng, batch, geoms, tx)
        step = make_train_step(model, cfg, geoms)
        traj = []
        for i in range(4):
            state, loss = step(state, batch, jax.random.fold_in(rng, i))
            traj.append(float(loss))
        losses[dtype] = traj
        # master params and BN stats stay f32 regardless of compute dtype
        for leaf in jax.tree_util.tree_leaves(state.params):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(state.batch_stats):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32
    f32, b16 = np.asarray(losses["float32"]), np.asarray(losses["bfloat16"])
    assert np.isfinite(b16).all()
    assert b16[-1] < b16[0]  # it learns
    np.testing.assert_allclose(b16, f32, rtol=0.05)


@pytest.mark.slow
def test_full_forward_bf16_close_to_f32(tiny_config):
    cfg = tiny_config
    model = make_model(cfg, tiny=True)
    geoms = model_geometries(cfg, "online_eval")
    from cfpnet_tpu.data.datasets import sample_image_f32

    s = SyntheticDataset(cfg, "online_eval", length=1)[0]
    img = jnp.asarray(sample_image_f32(s)[None])
    hist = jnp.asarray(s["hist_data"][None])
    mask = jnp.asarray(s["mask"][None])
    variables = jax.jit(
        lambda r: model.init({"params": r, "fusion": r}, img, hist, mask,
                             geoms, train=False)
    )(jax.random.key(0))

    def fwd(v, im, hh):
        return model.apply(v, im, hh, mask, geoms, train=False)[1]

    pred32 = np.asarray(jax.jit(fwd)(variables, img, hist))[..., 0]

    cast = lambda x: (x.astype(jnp.bfloat16)
                      if jnp.issubdtype(x.dtype, jnp.floating) else x)
    v16 = jax.tree_util.tree_map(cast, variables)
    pred16 = np.asarray(
        jax.jit(fwd)(v16, img.astype(jnp.bfloat16), hist.astype(jnp.bfloat16)),
        np.float32,
    )[..., 0]

    err = np.abs(pred16 - pred32)
    rel = err / (np.abs(pred32) + 1e-2)
    # Median-drift guard. Pixelwise max is NOT bounded here by construction:
    # with random weights the 16-bin logits are near-tied, so isolated
    # pixels legitimately flip bins under bf16 rounding and jump across the
    # depth range (observed: median rel 3.4%, median |Δ| 0.028 m, a handful
    # of tie-flips at |Δ|≈9 m). A regression in a mixed-precision path (e.g.
    # dropping the FFT-conv internal upcast) moves the MEDIAN by ~10x, which
    # is what this pins.
    assert np.median(rel) < 0.06, float(np.median(rel))
    assert np.median(err) < 0.08, float(np.median(err))
    assert np.isfinite(pred16).all()
