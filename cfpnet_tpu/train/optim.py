"""Optimizer: AdamW with two LR groups + OneCycle schedule.

Matches the reference recipe (/root/reference/train.py:79-94):
- AdamW, weight decay 0.1; backbone params at lr/10, everything else at lr
  (``--hist_encoder_10x`` moves the hist encoder into the fast group —
  reference src/models/deltar.py:68-82).
- ``OneCycleLR`` stepped per iteration: cosine anneal, pct_start 0.3,
  initial lr = max_lr/div_factor, final = initial/final_div_factor,
  momentum (Adam beta1) cycled 0.95 -> 0.85 -> 0.95.
- Optional global-norm grad clip 0.1 (production disables it —
  reference train.py:128-131).
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax.numpy as jnp
import optax


def onecycle_schedules(
    max_lr: float,
    total_steps: int,
    div_factor: float = 25.0,
    final_div_factor: float = 100.0,
    pct_start: float = 0.3,
    base_momentum: float = 0.85,
    max_momentum: float = 0.95,
    last_epoch: int = -1,
) -> Tuple[Callable, Callable]:
    """(lr_schedule, momentum_schedule) with torch OneCycleLR semantics."""
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    step_size_up = float(pct_start * total_steps) - 1.0
    step_size_down = float(total_steps - step_size_up) - 1.0

    def _anneal(start, end, pct):
        cos_out = jnp.cos(jnp.pi * pct) + 1.0
        return end + (start - end) / 2.0 * cos_out

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        up = _anneal(initial_lr, max_lr, jnp.clip(step / step_size_up, 0.0, 1.0))
        down = _anneal(
            max_lr, min_lr, jnp.clip((step - step_size_up) / step_size_down, 0.0, 1.0)
        )
        return jnp.where(step <= step_size_up, up, down)

    def mom_fn(step):
        step = jnp.asarray(step, jnp.float32)
        up = _anneal(max_momentum, base_momentum, jnp.clip(step / step_size_up, 0.0, 1.0))
        down = _anneal(
            base_momentum, max_momentum,
            jnp.clip((step - step_size_up) / step_size_down, 0.0, 1.0),
        )
        return jnp.where(step <= step_size_up, up, down)

    return lr_fn, mom_fn


def param_group_labels(params, hist_encoder_10x: bool = True):
    """'backbone' (lr/10) vs 'rest' (lr) labels per top-level module.

    Reference: deltar.py:68-82 — img_encoder is always slow; hist_encoder is
    slow unless ``hist_encoder_10x``.
    """
    slow = {"img_encoder"} if hist_encoder_10x else {"img_encoder", "hist_encoder"}

    def _label_sub(tree, label):
        if isinstance(tree, dict):
            return {k: _label_sub(v, label) for k, v in tree.items()}
        return label

    def label_tree(tree):
        # self-supervised nesting: {'depth': <model tree>, 'pose': <posenet>}
        if set(tree.keys()) == {"depth", "pose"}:
            return {"depth": label_tree(tree["depth"]),
                    "pose": _label_sub(tree["pose"], "rest")}
        return {
            k: _label_sub(v, "backbone" if k in slow else "rest")
            for k, v in tree.items()
        }

    return label_tree(params)


def make_optimizer(
    config, total_steps: int
) -> optax.GradientTransformation:
    lr_fn, mom_fn = onecycle_schedules(
        config.lr, total_steps, config.div_factor, config.final_div_factor
    )

    def adamw(lr_scale: float):
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=lambda s: lr_fn(s) * lr_scale,
            b1=mom_fn,
            b2=0.999,
            eps=1e-8,
            weight_decay=config.wd,
        )

    tx = optax.multi_transform(
        {"backbone": adamw(0.1), "rest": adamw(1.0)},
        lambda params: param_group_labels(params, config.hist_encoder_10x),
    )
    if not config.disable_clip_grad:
        tx = optax.chain(optax.clip_by_global_norm(0.1), tx)
    return tx
