"""Jitted train / eval steps.

One compiled graph per (mode, resolution): forward + loss + backward +
optimizer update is a single XLA program; gradient all-reduce over the data
axis is inserted by the compiler (params replicated, batch sharded — see
``cfpnet_tpu.parallel.mesh``). This replaces the reference's per-step
DataParallel scatter/gather (/root/reference/train.py:45,96-135).

BatchNorm note: the reference's DataParallel keeps replica-0 per-device BN
statistics; under global-batch jit the statistics are computed over the full
global batch (sync-BN semantics) — strictly more faithful to the bs=16
recipe.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax.training import train_state

from ..ops.interp import resize_bilinear_align_corners
from .losses import compute_errors, silog_loss


class TrainState(train_state.TrainState):
    batch_stats: Any = None


# ImageNet statistics (reference nyu.py:266-288 / zjuL5.py:211)
IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def eval_batch_image(batch: Dict) -> jnp.ndarray:
    """Normalized f32 image from an eval batch.

    Eval samples ship ``image_u8`` (raw uint8 — 4x less host->device
    traffic than normalized f32; bit-exact for uint8-sourced data) and the
    ImageNet normalize fuses into the jitted forward here. Train-style
    batches carrying a pre-normalized ``image`` pass through unchanged."""
    if "image_u8" in batch:
        img = batch["image_u8"].astype(jnp.float32) / 255.0
        return (img - IMAGENET_MEAN) / IMAGENET_STD
    return batch["image"]


def make_loss_fn(model, config, geoms):
    """The train-step loss body, exposed so the chained latency profiler
    (scripts/profile_chained.py) times the EXACT production graph rather
    than a hand-copied one. Returns ``loss_fn(params, batch_stats, batch,
    rng) -> (loss, updates)``; differentiate w.r.t. the first argument."""
    cdt = jnp.dtype(getattr(config, "compute_dtype", "float32"))

    def cast_tree(tree):
        if cdt == jnp.float32:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(cdt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    def loss_fn(params, batch_stats, batch, rng):
        # batch_stats stay f32 UNCAST: flax computes batch statistics in
        # f32 regardless of input dtype (normalization._compute_stats),
        # and the running-average update `m*ra + (1-m)*mean` then runs
        # entirely in f32 — so sub-bf16-ulp momentum increments survive.
        # (Casting them to bf16 here would quantize the accumulator each
        # step; output dtype is unaffected — flax's _normalize derives it
        # from (x, scale, bias) only.) Test: tests/test_bf16.py::
        # test_bn_running_stats_accumulate_f32.
        (bin_edges, pred), updates = model.apply(
            {"params": cast_tree(params), "batch_stats": batch_stats},
            batch["image"].astype(cdt),
            batch["hist_data"].astype(cdt),
            batch["mask"],
            geoms,
            train=True,
            rngs={"fusion": rng},
            mutable=["batch_stats"],
        )
        # reference train.py:121-123: clip pred at min_depth, mask gt
        pred = jnp.clip(pred, config.min_depth, None)
        dmask = batch["depth"] > config.min_depth
        loss = silog_loss(pred, batch["depth"], dmask, interpolate=True)
        return loss, updates

    return loss_fn


def make_train_step(model, config, geoms, jit: bool = True,
                    pre_split: bool = False):
    """Returns jitted ``(state, batch, rng) -> (state, loss)``.
    ``jit=False`` returns the raw traceable step (used by the chained
    latency harness, which runs K steps inside one fori_loop graph).

    batch: image [B,H,W,3], depth [B,H,W,1], hist_data [B,Z,n], mask [B,Z].

    ``pre_split=True`` (requires ``--grad_accum > 1``): the step expects
    batch leaves ALREADY microbatch-split on the host to
    ``[accum, B/accum, ...]`` (``parallel/mesh.py::
    shard_batch_spatial_presplit``), skips the in-jit reshape, and
    UNROLLS the microbatch loop at trace time. This is the
    spatial-sharding composition path: both reshaping a
    ``P('data','spatial')`` batch inside jit (sp_trainstep_diag stage M)
    and ``lax.scan`` over the pre-split leaves miscompile the backward
    on this XLA; the unrolled pre-split graph is f64-clean to ~1e-13
    (stage M2).

    Mixed precision (``--compute_dtype bfloat16``): the forward/backward
    runs in bf16 while master params, optimizer state, BN statistics and
    the loss stay f32 (grads arrive f32 through the cast, and the model's
    depth-reconstruction tail is pinned to f32 internally).
    """
    loss_fn = make_loss_fn(model, config, geoms)
    accum = int(getattr(config, "grad_accum", 1) or 1)
    if pre_split and accum <= 1:
        raise ValueError("pre_split requires --grad_accum > 1")

    if accum <= 1:
        def train_step(state: TrainState, batch: Dict, rng):
            (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch, rng)
            state = state.apply_gradients(
                grads=grads, batch_stats=updates["batch_stats"]
            )
            return state, loss
    else:
        def train_step(state: TrainState, batch: Dict, rng):
            # --grad_accum: lax.scan over microbatches inside ONE compiled
            # graph — activation memory scales with bs/accum while the
            # optimizer sees the mean gradient over the full batch. BN
            # running stats thread sequentially through the scan (identical
            # to running `accum` small steps); batch *statistics* are
            # per-microbatch, matching the reference's per-replica
            # DataParallel BN more closely than the full-batch path.
            if pre_split:
                # leaves arrive [accum, B/accum, ...] from the host-side
                # split — NO in-jit reshape (reshaping a P('data','spatial')
                # operand miscompiles on this XLA; scan's per-iteration
                # slice of the replicated leading axis is clean)
                lead = jax.tree_util.tree_leaves(batch)[0].shape[0]
                if lead != accum:
                    raise ValueError(
                        f"pre_split batch has leading dim {lead}, expected "
                        f"--grad_accum {accum}")
                micro = batch
            else:
                bs = jax.tree_util.tree_leaves(batch)[0].shape[0]
                if bs % accum != 0:
                    raise ValueError(
                        f"--grad_accum {accum} does not divide batch size {bs}")
                micro = jax.tree_util.tree_map(
                    lambda x: x.reshape((accum, bs // accum) + x.shape[1:]),
                    batch)

            def body(carry, xs):
                stats, gsum, lsum = carry
                mb, i = xs
                (loss, updates), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(
                        state.params, stats, mb, jax.random.fold_in(rng, i))
                gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
                return (updates["batch_stats"], gsum, lsum + loss), None

            gzero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            if pre_split:
                # trace-time unroll instead of lax.scan: scanning over the
                # microbatch axis of P(None,'data','spatial') leaves ALSO
                # miscompiles the backward on this XLA (diag stage M2,
                # ~6e-2 x gscale errors with exact loss); with the loop
                # unrolled each microbatch slice is a static-index gather
                # the partitioner handles cleanly (stage M2, ~1e-13 f64)
                carry = (state.batch_stats, gzero, jnp.zeros(()))
                for i in range(accum):
                    mb = jax.tree_util.tree_map(lambda x: x[i], micro)
                    carry, _ = body(carry, (mb, i))
                stats, gsum, lsum = carry
            else:
                (stats, gsum, lsum), _ = jax.lax.scan(
                    body, (state.batch_stats, gzero, jnp.zeros(())),
                    (micro, jnp.arange(accum)))
            grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
            state = state.apply_gradients(grads=grads, batch_stats=stats)
            return state, lsum / accum

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model, config, geoms, protocol: str = "evaluate_all"):
    """Returns jitted ``(params, batch_stats, batch) -> (pred_full, prob)``.

    protocol='evaluate_all': clip to [min_depth, max_depth] then align-corners
    upsample to input size (reference evaluate_all.py:37-44).
    protocol='validate': upsample first, then clip to eval bounds with
    NaN->min / Inf->max fixups (reference train.py:187-195).
    """

    out_h, out_w = None, None  # inferred from batch

    def eval_step(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        image = eval_batch_image(batch)
        bin_edges, pred, prob, _ = model.apply(
            variables,
            image,
            batch["hist_data"],
            batch["mask"],
            geoms,
            train=False,
        )
        H, W = image.shape[1], image.shape[2]
        if protocol == "evaluate_all":
            pred = jnp.clip(pred, config.min_depth, config.max_depth)
            pred = resize_bilinear_align_corners(pred, H, W)
        else:
            pred = resize_bilinear_align_corners(pred, H, W)
            pred = jnp.where(jnp.isinf(pred), config.max_depth_eval, pred)
            pred = jnp.where(jnp.isnan(pred), config.min_depth_eval, pred)
            pred = jnp.clip(pred, config.min_depth_eval, config.max_depth_eval)
        return pred, prob

    return jax.jit(eval_step)


def make_metric_step(config, protocol: str = "validate"):
    """Jitted PER-IMAGE metric computation (masked, shape-static).

    Returns ``(metrics_dict_of_[B], valid_counts_[B])`` — vmapped over the
    batch axis so batched evaluation (``--eval_bs``) keeps the reference's
    image-weighted averaging exactly (reference streams one image at a time
    through RunningAverageDict, evaluate_all.py:80-84).

    The valid-mask bound pair follows the reference's two drivers exactly:
    protocol='evaluate_all' masks with ``min_depth/max_depth`` (reference
    evaluate_all.py:80), protocol='validate' with ``min_depth_eval/
    max_depth_eval`` (reference train.py:198). Identical under every
    production config (both pairs are 1e-3/10) but kept distinct so the
    protocols diverge exactly when the reference's would."""
    if protocol == "evaluate_all":
        lo, hi = config.min_depth, config.max_depth
    else:
        lo, hi = config.min_depth_eval, config.max_depth_eval

    def one_image(gt, pred):
        valid = (gt > lo) & (gt < hi)
        return compute_errors(gt, pred, valid), valid.sum()

    return jax.jit(jax.vmap(one_image))


def create_train_state(model, config, rng, sample_batch, geoms, tx) -> TrainState:
    # jit the init: eager flax init dispatches per-op (minutes over the
    # remote-device tunnel); jitted it is one program.
    init_fn = jax.jit(
        lambda r, img, hist, mask: model.init(
            {"params": r, "fusion": jax.random.fold_in(r, 1)},
            img, hist, mask, geoms, train=True,
        )
    )
    variables = init_fn(
        rng, sample_batch["image"], sample_batch["hist_data"], sample_batch["mask"]
    )
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=tx,
    )
