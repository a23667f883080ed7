"""Checkpoint IO (orbax).

The reference (/root/reference/src/utils/model_io.py) has weights-only and
full checkpoints, but its resume is broken: the optimizer restore is
commented out (train.py:83-84) and the scheduler restarts. Here a checkpoint
is the complete training state — params, batch_stats, opt_state, step,
epoch, best_rmse — so resume is faithful (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckptr():
    return ocp.StandardCheckpointer()


def save_weights(path: str, params, batch_stats=None) -> None:
    """Weights-only checkpoint (reference model_io.py:5-11)."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {"params": params}
    if batch_stats is not None:
        payload["batch_stats"] = batch_stats
    with _ckptr() as c:
        c.save(path, payload, force=True)


def load_weights(path: str) -> Dict[str, Any]:
    with _ckptr() as c:
        return c.restore(os.path.abspath(path))


def save_checkpoint(
    path: str, state, epoch: int, best_rmse: float = float("inf")
) -> None:
    """Full training checkpoint (params + optimizer + schedule position)."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(epoch),
        "best_rmse": np.asarray(best_rmse, np.float32),
    }
    with _ckptr() as c:
        c.save(path, payload, force=True)


def load_checkpoint(path: str, state) -> Tuple[Any, int, float]:
    """Restore a full checkpoint into ``state``. Returns
    (state, next_epoch, best_rmse)."""
    target = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(0),
        "best_rmse": np.asarray(0.0, np.float32),
    }
    with _ckptr() as c:
        restored = c.restore(os.path.abspath(path), target=target)
    state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=int(restored["step"]),
    )
    return state, int(restored["epoch"]) + 1, float(restored["best_rmse"])
