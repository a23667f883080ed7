"""Pose network for the self-supervised variant.

A compact conv regressor over a concatenated frame pair -> 6DoF relative
pose (axis-angle + translation), monodepth2-style: 7 stride-2 convs + 1x1
head, outputs scaled by 0.01 for stable early training.

No reference equivalent (the reference is fully supervised); capability
requested by BASELINE.json configs[4] ("photometric warping loss + pose
branch on video pairs").
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

KINIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class PoseNet(nn.Module):
    widths: Tuple[int, ...] = (16, 32, 64, 128, 256, 256, 256)

    @nn.compact
    def __call__(self, frame_a: jnp.ndarray, frame_b: jnp.ndarray):
        """[B,H,W,3] x2 -> (axisangle [B,3], translation [B,3])."""
        x = jnp.concatenate([frame_a, frame_b], axis=-1)
        for i, w in enumerate(self.widths):
            x = nn.Conv(w, (3, 3), strides=(2, 2), padding="SAME",
                        kernel_init=KINIT, name=f"conv{i}")(x)
            x = nn.relu(x)
        x = x.mean(axis=(1, 2))
        out = nn.Dense(6, kernel_init=nn.initializers.zeros, name="pose_head")(x)
        out = 0.01 * out
        return out[:, :3], out[:, 3:]
