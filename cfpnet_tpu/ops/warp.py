"""Differentiable view synthesis ops for self-supervised training.

Backproject-transform-project warping (monodepth2-style) used by the
SelfToF-style self-supervised variant: given target-frame depth, camera
intrinsics and a 6DoF relative pose, synthesize the target frame from the
source frame by bilinear sampling.

No reference equivalent (the reference is fully supervised); this implements
the driver-requested capability "photometric warping loss + pose branch on
video pairs" (BASELINE.json configs[4]).

All ops are shape-static and gather-based (vectorized `jnp.take` on flat
indices) — TPU-friendly.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def axis_angle_to_matrix(vec: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] axis-angle -> [..., 3, 3] rotation (Rodrigues).

    Smoothed norm: the pose head is zero-initialized and jnp.linalg.norm has
    a NaN gradient at 0."""
    angle = jnp.sqrt(jnp.sum(vec * vec, axis=-1, keepdims=True) + 1e-14)
    axis = vec / (angle + 1e-7)
    ca = jnp.cos(angle)[..., None]
    sa = jnp.sin(angle)[..., None]
    x, y, z = axis[..., 0:1], axis[..., 1:2], axis[..., 2:3]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.concatenate([zero, -z, y], -1),
            jnp.concatenate([z, zero, -x], -1),
            jnp.concatenate([-y, x, zero], -1),
        ],
        axis=-2,
    )
    eye = jnp.eye(3, dtype=vec.dtype)
    return eye + sa * K + (1.0 - ca) * (K @ K)


def pose_to_transform(axisangle: jnp.ndarray, translation: jnp.ndarray) -> jnp.ndarray:
    """([B,3], [B,3]) -> [B,4,4] SE(3)."""
    B = axisangle.shape[0]
    R = axis_angle_to_matrix(axisangle)
    T = jnp.zeros((B, 4, 4), axisangle.dtype)
    T = T.at[:, :3, :3].set(R)
    T = T.at[:, :3, 3].set(translation)
    T = T.at[:, 3, 3].set(1.0)
    return T


def backproject(depth: jnp.ndarray, K_inv: jnp.ndarray) -> jnp.ndarray:
    """depth [B,H,W,1] + K_inv [B,3,3] -> cam points [B,H,W,3]."""
    B, H, W, _ = depth.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=depth.dtype), jnp.arange(W, dtype=depth.dtype),
        indexing="ij",
    )
    pix = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)  # [H,W,3]
    rays = jnp.einsum("bij,hwj->bhwi", K_inv, pix)
    return rays * depth


def project(points: jnp.ndarray, K: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """cam points [B,H,W,3] via pose T [B,4,4] -> pixel coords [B,H,W,2]."""
    R, t = T[:, :3, :3], T[:, :3, 3]
    p = jnp.einsum("bij,bhwj->bhwi", R, points) + t[:, None, None, :]
    p = jnp.einsum("bij,bhwj->bhwi", K, p)
    z = jnp.clip(p[..., 2:3], 1e-3, None)
    return p[..., :2] / z


def grid_sample(img: jnp.ndarray, coords: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bilinear sample img [B,H,W,C] at pixel coords [B,H,W,2] (x, y).

    Returns (sampled [B,H,W,C], in_bounds mask [B,H,W,1]).
    """
    B, H, W, C = img.shape
    x, y = coords[..., 0], coords[..., 1]
    valid = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)

    x0 = jnp.clip(jnp.floor(x), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    wy = jnp.clip(y - y0, 0.0, 1.0)[..., None]

    flat = img.reshape(B, H * W, C)

    def gather(yy, xx):
        idx = (yy * W + xx).astype(jnp.int32).reshape(B, H * W)
        return jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(B, H, W, C)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    out = (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
    return out, valid[..., None].astype(img.dtype)


def warp_frame(
    src: jnp.ndarray,  # [B,H,W,C] source frame
    depth: jnp.ndarray,  # [B,H,W,1] target-frame depth
    K: jnp.ndarray,  # [B,3,3]
    K_inv: jnp.ndarray,  # [B,3,3]
    T: jnp.ndarray,  # [B,4,4] target->source pose
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Synthesize the target frame from src. Returns (warped, valid_mask)."""
    pts = backproject(depth, K_inv)
    coords = project(pts, K, T)
    return grid_sample(src, coords)


def ssim(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """3x3 mean-pooled SSIM (monodepth2 formulation), NHWC -> per-pixel."""
    c1, c2 = 0.01**2, 0.03**2

    def pool(v):
        # 3x3 average pool, reflect pad
        v = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        out = 0.0
        for dy in range(3):
            for dx in range(3):
                out = out + v[:, dy : dy + x.shape[1], dx : dx + x.shape[2], :]
        return out / 9.0

    mx, my = pool(x), pool(y)
    sx = pool(x * x) - mx * mx
    sy = pool(y * y) - my * my
    sxy = pool(x * y) - mx * my
    num = (2 * mx * my + c1) * (2 * sxy + c2)
    den = (mx * mx + my * my + c1) * (sx + sy + c2)
    return jnp.clip((1.0 - num / den) / 2.0, 0.0, 1.0)


def photometric_loss(pred: jnp.ndarray, target: jnp.ndarray, alpha: float = 0.85):
    """alpha*SSIM + (1-alpha)*L1, per pixel [B,H,W,1]."""
    l1 = jnp.abs(pred - target).mean(axis=-1, keepdims=True)
    s = ssim(pred, target).mean(axis=-1, keepdims=True)
    return alpha * s + (1.0 - alpha) * l1


def smoothness_loss(depth: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware first-order disparity smoothness (monodepth2)."""
    d = depth / (depth.mean(axis=(1, 2, 3), keepdims=True) + 1e-7)
    dx = jnp.abs(d[:, :, 1:, :] - d[:, :, :-1, :])
    dy = jnp.abs(d[:, 1:, :, :] - d[:, :-1, :, :])
    ix = jnp.abs(img[:, :, 1:, :] - img[:, :, :-1, :]).mean(-1, keepdims=True)
    iy = jnp.abs(img[:, 1:, :, :] - img[:, :-1, :, :]).mean(-1, keepdims=True)
    return (dx * jnp.exp(-ix)).mean() + (dy * jnp.exp(-iy)).mean()
