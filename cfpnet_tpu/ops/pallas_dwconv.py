"""Pallas large-kernel depthwise conv (TPU).

The reference wanted RepLKNet's CUDA implicit-GEMM kernel for its 31/15/7
depthwise convs and never wired it (SURVEY.md §2.9). On TPU the op is
VPU-bound; this kernel keeps the (padded) input tile resident in VMEM and
accumulates the k·k taps as shifted multiply-adds — one HBM read of the
input and one write of the output, no im2col materialization.

Grid: one program per batch row (the model runs these at bs=1-16 on maps up
to 120x160x32, which fit VMEM comfortably: 150*190*32 f32 ≈ 3.6 MB).
Equivalent to ``ops.dwconv.depthwise_conv2d`` (same SAME padding for odd k).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _kernel(x_ref, w_ref, b_ref, out_ref, *, k: int, H: int, W: int):
    # x_ref: [1, H+k-1, W+k-1, C] (pre-padded); w_ref: [k*k, C]; b_ref: [1, C]
    import jax.experimental.pallas as pl

    def body(dy, acc):
        # one dynamic row-slice per kernel row; the k column taps are STATIC
        # slices of it (dynamic per-tap slicing costs ~10x — scalar-core
        # address computation blocks the VPU pipeline)
        rows = x_ref[0, pl.ds(dy, H), :, :]
        w_row = w_ref[pl.ds(dy * k, k), :]
        for dx in range(k):
            acc = acc + rows[:, dx : dx + W, :].astype(jnp.float32) * w_row[dx, :]
        return acc

    acc = jax.lax.fori_loop(0, k, body, jnp.zeros(out_ref.shape[1:], jnp.float32))
    out_ref[0] = (acc + b_ref[0]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def depthwise_conv2d_pallas(x, kernel, bias=None, interpret: bool = False):
    """x: [B,H,W,C]; kernel: [k,k,1,C] (HWIO); SAME padding, stride 1."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    k = kernel.shape[0]
    p = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    w = kernel.reshape(k * k, C)
    b = (bias if bias is not None else jnp.zeros((C,), x.dtype)).reshape(1, C)

    Hp, Wp = H + 2 * p, W + 2 * p
    # C (32..128) pads to the 128-lane tile, inflating VMEM footprints ~4x;
    # raise the scoped limit above the conservative 16M default.
    compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(_kernel, k=k, H=H, W=W),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        compiler_params=compiler_params,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, C), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * k, C), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda n: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, w, b)
