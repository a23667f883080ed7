"""Large-kernel ConvNeXt block.

Reference ``Block14`` (/root/reference/src/models/convnext.py:16-58):
depthwise conv (31/15/7 kernel) -> BN -> ReLU -> LayerNorm -> 4x MLP (exact
GELU) -> residual. The reference defines an unused ``conv1`` (dim*2 -> dim)
whose parameters never execute — not replicated here (the weight importer
skips it).

The depthwise conv goes through ``cfpnet_tpu.ops.depthwise_conv2d`` so the
Pallas kernel can be swapped in for the 31x31 hot case.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.dispatch import dwconv2d as depthwise_conv2d

KINIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class Block14(nn.Module):
    dim: int
    large_kernel: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, H, W, C]
        inp = x
        k = self.large_kernel
        kernel = self.param(
            "dwconv2_kernel", KINIT, (k, k, 1, self.dim), jnp.float32
        ).astype(x.dtype)
        bias = self.param("dwconv2_bias", nn.initializers.zeros, (self.dim,), jnp.float32).astype(
            x.dtype
        )
        x = depthwise_conv2d(x, kernel, bias)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1"
        )(x)
        x = nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, kernel_init=KINIT, name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, kernel_init=KINIT, name="pwconv2")(x)
        return inp + x
