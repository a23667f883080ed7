"""SILog loss + depth metric suite.

- ``silog_loss`` matches the reference ``SILogLoss``
  (/root/reference/src/loss.py:4-19): bilinear align-corners upsample of the
  half-res prediction, masked scale-invariant log loss
  ``10·sqrt(var(g) + 0.15·mean(g)²)``. torch ``var`` is unbiased
  (n-1 denominator) — replicated.
- ``compute_errors`` matches /root/reference/src/utils/metrics.py:4-24 but
  takes a validity mask so it runs shape-static under jit (the reference
  boolean-indexes on host numpy).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from ..ops.interp import resize_bilinear_align_corners


def silog_loss(
    pred: jnp.ndarray,  # [B, h, w, 1]
    target: jnp.ndarray,  # [B, H, W, 1]
    mask: Optional[jnp.ndarray] = None,  # [B, H, W, 1] bool
    interpolate: bool = True,
) -> jnp.ndarray:
    if interpolate:
        pred = resize_bilinear_align_corners(pred, target.shape[1], target.shape[2])
    g = jnp.log(pred) - jnp.log(target)
    if mask is None:
        mask = jnp.ones_like(g, dtype=bool)
    m = mask.astype(g.dtype)
    n = m.sum()
    g = jnp.where(mask, g, 0.0)
    mean = g.sum() / n
    var = (jnp.where(mask, (g - mean) ** 2, 0.0)).sum() / (n - 1.0)  # torch unbiased var
    dg = var + 0.15 * mean**2
    return 10.0 * jnp.sqrt(dg)


def compute_errors(
    gt: jnp.ndarray, pred: jnp.ndarray, valid: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """9-metric depth suite over valid pixels (masked means)."""
    v = valid.astype(jnp.float32)
    n = v.sum()

    def mmean(x):
        return (jnp.where(valid, x, 0.0)).sum() / n

    safe_gt = jnp.where(valid, gt, 1.0)
    safe_pred = jnp.where(valid, pred, 1.0)

    thresh = jnp.maximum(safe_gt / safe_pred, safe_pred / safe_gt)
    a1 = mmean(thresh < 1.25)
    a2 = mmean(thresh < 1.25**2)
    a3 = mmean(thresh < 1.25**3)

    abs_rel = mmean(jnp.abs(safe_gt - safe_pred) / safe_gt)
    sq_rel = mmean((safe_gt - safe_pred) ** 2 / safe_gt)
    rmse = jnp.sqrt(mmean((safe_gt - safe_pred) ** 2))

    lg, lp = jnp.log(safe_gt), jnp.log(safe_pred)
    rmse_log = jnp.sqrt(mmean((lg - lp) ** 2))
    err = lp - lg
    silog = jnp.sqrt(mmean(err**2) - mmean(err) ** 2) * 100.0
    log_10 = mmean(jnp.abs(jnp.log10(safe_gt) - jnp.log10(safe_pred)))

    return dict(
        a1=a1, a2=a2, a3=a3, abs_rel=abs_rel, rmse=rmse, log_10=log_10,
        rmse_log=rmse_log, silog=silog, sq_rel=sq_rel,
    )


class RunningAverage:
    """Streaming mean (reference src/utils/utils.py:14-24)."""

    def __init__(self):
        self.avg = 0.0
        self.count = 0

    def append(self, value):
        self.avg = (value + self.count * self.avg) / (self.count + 1)
        self.count += 1

    def get_value(self):
        return self.avg


class RunningAverageDict:
    """Streaming per-key means (reference src/utils/utils.py:27-41)."""

    def __init__(self):
        self._dict = None

    def update(self, new_dict):
        if self._dict is None:
            self._dict = {k: RunningAverage() for k in new_dict}
        for k, v in new_dict.items():
            self._dict[k].append(float(v))

    def get_value(self):
        return {k: v.get_value() for k, v in self._dict.items()}
