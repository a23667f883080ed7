"""Align-corners bilinear/linear resizes.

The reference relies on torch ``F.interpolate(..., align_corners=True)`` in
six places (loss upsample, eval upsample, decoder skip upsamples, fusion zone
resize, positional-encoding resize — see SURVEY.md §7 "hard parts").
``jax.image.resize`` has no align_corners mode, so we implement the exact
semantics. TPU-first design choice: the resize is expressed as two small
dense matmuls (out = R_h · x · R_wᵀ) with *static* interpolation matrices
precomputed on the host — this rides the MXU and fuses with neighbouring ops
instead of emitting gathers.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) align-corners linear interpolation matrix.

    Matches torch align_corners=True: src coord = dst * (in-1)/(out-1);
    out==1 -> src 0.
    """
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if in_size == 1 or out_size == 1:
        m[:, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    coord = np.arange(out_size, dtype=np.float64) * scale
    i0 = np.clip(np.floor(coord).astype(np.int64), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = coord - i0
    rows = np.arange(out_size)
    m[rows, i0] += 1.0 - w1
    m[rows, i1] += w1
    return m


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear align-corners resize on the (-3, -2) axes of an NHWC array."""
    h, w = x.shape[-3], x.shape[-2]
    if h == out_h and w == out_w:
        return x
    dt = x.dtype
    if h != out_h:
        rh = jnp.asarray(_interp_matrix(h, out_h), dtype=dt)
        x = jnp.einsum("oh,...hwc->...owc", rh, x)
    if w != out_w:
        rw = jnp.asarray(_interp_matrix(w, out_w), dtype=dt)
        x = jnp.einsum("pw,...hwc->...hpc", rw, x)
    return x.astype(dt)


def resize_linear_align_corners_1d(x: jnp.ndarray, out_l: int, axis: int = -2) -> jnp.ndarray:
    """Linear align-corners resize along one axis."""
    l = x.shape[axis]
    if l == out_l:
        return x
    r = jnp.asarray(_interp_matrix(l, out_l), dtype=x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    x = jnp.einsum("ol,...l->...o", r, x)
    return jnp.moveaxis(x, -1, axis)
