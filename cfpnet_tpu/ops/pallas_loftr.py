"""Fused LoFTR encoder layer (Pallas TPU megakernel).

The round-2/3 chained profiles put ~8 ms of the 30 ms bs=8 eval forward in
the attention stack — dozens of tiny [*,32..128] XLA ops (projections,
elu feature maps, einsums, LayerNorms, MLP, residual) each round-tripping a
feature-map-sized tensor through HBM. FLOPs are trivial (~2 G); the wall is
memory passes and per-op fixed latency. This kernel computes the ENTIRE
``LoFTREncoderLayer`` (reference /root/reference/src/models/transformer.py:
14-71 — q/k/v proj, elu+1 linear attention, merge, LN, concat-MLP, LN,
residual) in one VMEM-resident pass: the input is read once from HBM and
the output written once.

Attention uses the block-diagonal reformulation proven equivalent in
``ops.pallas_attention.linear_attention_blockdiag`` (cross-head terms
masked by a [C,C] block-diagonal mask), so every per-group contraction is a
dense MXU matmul with no per-head reshapes.

Grouping: callers present x as [N, L, C] groups (LSA windows, hist2image
zones, GSA query tiles). Small-L calls pack G groups per grid cell so the
shared projections/MLP run as one [G*L, C] matmul; large-L calls tile L
with the source block shared across tiles (KV summary recomputed per tile
— S*C*C MACs, negligible).

Differentiation: wrapped in ``jax.custom_vjp`` whose backward is the VJP of
the numerically-matching XLA composite (``loftr_apply_xla``), so the kernel
is safe under ``jax.grad`` — though the model only dispatches to it on the
eval path (train keeps pure XLA: fwd residuals there are reused by the
backward, which a custom-vjp recompute would forfeit).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LoFTRParams(NamedTuple):
    """Weights of one LoFTR encoder layer (all as given, any float dtype).

    kernels are [in, out] exactly as flax ``nn.Dense`` stores them.
    """

    wq: jnp.ndarray  # [C, C]
    wk: jnp.ndarray  # [C, C]
    wv: jnp.ndarray  # [C, C]
    wm: jnp.ndarray  # [C, C]  merge
    g1: jnp.ndarray  # [C]     norm1 scale
    b1: jnp.ndarray  # [C]     norm1 bias
    w0: jnp.ndarray  # [2C, 2C] mlp_0 (input = concat[x, message])
    w1: jnp.ndarray  # [2C, C]  mlp_1
    g2: jnp.ndarray  # [C]     norm2 scale
    b2: jnp.ndarray  # [C]     norm2 bias


def layernorm_f32(x, scale, bias, eps=1e-5):
    """Bit-exact clone of flax ``nn.LayerNorm`` (fast variance, f32 stats;
    cast the f32 result back to the input dtype for bf16 equality)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    mean2 = (xf * xf).mean(-1, keepdims=True)
    var = jnp.maximum(0.0, mean2 - mean * mean)
    mul = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    return (xf - mean) * mul + bias.astype(jnp.float32)


def _elu1(x):
    # elu(x)+1 without expm1 (not lowered by Mosaic)
    return jnp.where(x > 0, x + 1.0, jnp.exp(jnp.minimum(x, 0.0)))


def _head_mask(C: int, nhead: int) -> np.ndarray:
    idx = np.arange(C) // (C // nhead)
    return (idx[:, None] == idx[None, :]).astype(np.float32)


def loftr_apply_xla(x, source, p: LoFTRParams, nhead: int, eps: float = 1e-6):
    """XLA composite numerically matching the flax ``LoFTREncoderLayer``
    module path (projections in the input dtype, LN per flax semantics).
    Serves as the custom-vjp backward and the CPU/numerical oracle."""
    from .attention import linear_attention

    N, L, C = x.shape
    S = source.shape[1]
    D = C // nhead
    q = (x @ p.wq.astype(x.dtype)).reshape(N, L, nhead, D)
    k = (source @ p.wk.astype(x.dtype)).reshape(N, S, nhead, D)
    v = (source @ p.wv.astype(x.dtype)).reshape(N, S, nhead, D)
    msg = linear_attention(q, k, v, eps=eps).reshape(N, L, C)
    msg = msg @ p.wm.astype(msg.dtype)
    msg = layernorm_f32(msg, p.g1, p.b1).astype(x.dtype)
    h = jnp.concatenate([x, msg], axis=-1)
    h = h @ p.w0.astype(h.dtype)
    h = jax.nn.relu(h)
    h = h @ p.w1.astype(h.dtype)
    h = layernorm_f32(h, p.g2, p.b2).astype(x.dtype)
    return h + x


def _kernel(x_ref, s_ref, wq_ref, wk_ref, wv_ref, wm_ref, g1_ref, b1_ref,
            w0x_ref, w0m_ref, w1_ref, g2_ref, b2_ref, m_ref, out_ref,
            *, G: int, S: int, eps: float):
    C = x_ref.shape[-1]
    L = x_ref.shape[1]
    dt = x_ref.dtype
    f32 = jnp.float32

    X = x_ref[:].reshape(G * L, C)
    Src = s_ref[:].reshape(G * S, C)
    dot = functools.partial(jnp.dot, preferred_element_type=f32)

    q = dot(X, wq_ref[:])          # [G*L, C] f32
    k = dot(Src, wk_ref[:])        # [G*S, C] f32
    v = dot(Src, wv_ref[:])
    Qf = _elu1(q)
    Kf = _elu1(k)
    M = m_ref[:]                   # [C, C] block-diag head mask (f32)

    msgs = []
    for g in range(G):             # static unroll; per-group MXU matmuls
        Kg = Kf[g * S:(g + 1) * S]
        Vg = v[g * S:(g + 1) * S]
        Qg = Qf[g * L:(g + 1) * L]
        KV = jax.lax.dot_general(
            Kg, Vg / S, (((0,), (0,)), ((), ())), preferred_element_type=f32
        ) * M                      # [C, C]
        ksum = Kg.sum(axis=0, keepdims=True)            # [1, C]
        den = dot(Qg, M * jnp.transpose(ksum)) + eps    # [L, C]
        msgs.append(dot(Qg, KV) * S / den)
    msg = jnp.concatenate(msgs, axis=0) if G > 1 else msgs[0]

    msg = dot(msg.astype(dt), wm_ref[:])
    msg = layernorm_f32(msg, g1_ref[0], b1_ref[0]).astype(dt)
    # concat[x, msg] @ w0 == x @ w0[:C] + msg @ w0[C:]
    h = dot(X, w0x_ref[:]) + dot(msg, w0m_ref[:])
    h = jnp.maximum(h, 0.0).astype(dt)
    h = dot(h, w1_ref[:])
    h = layernorm_f32(h, g2_ref[0], b2_ref[0]).astype(f32)
    out_ref[:] = (h + X.astype(f32)).astype(out_ref.dtype).reshape(G, L, C)


def _largest_divisor(n: int, cap: int) -> int:
    best = 1
    for d in range(1, int(np.sqrt(n)) + 1):
        if n % d == 0:
            for c in (d, n // d):
                if c <= cap:
                    best = max(best, c)
    return best


@functools.partial(jax.jit, static_argnames=("nhead", "eps", "interpret"))
def _fused_loftr_impl(x, source, p: LoFTRParams, nhead: int,
                      eps: float = 1e-6, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, L, C = x.shape
    S = source.shape[1]
    M = jnp.asarray(_head_mask(C, nhead))
    g1 = p.g1.reshape(1, C).astype(jnp.float32)
    b1 = p.b1.reshape(1, C).astype(jnp.float32)
    g2 = p.g2.reshape(1, C).astype(jnp.float32)
    b2 = p.b2.reshape(1, C).astype(jnp.float32)
    w0x = p.w0[:C].astype(x.dtype)
    w0m = p.w0[C:].astype(x.dtype)
    wq, wk, wv, wm = (w.astype(x.dtype) for w in (p.wq, p.wk, p.wv, p.wm))
    w1 = p.w1.astype(x.dtype)

    # target ~2-4K rows of shared-dense work per grid cell
    if L >= 4096:
        TL = _largest_divisor(L, 2048)
        grid = (N, L // TL)
        xspec = pl.BlockSpec((1, TL, C), lambda n, t: (n, t, 0),
                             memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec((1, S, C), lambda n, t: (n, 0, 0),
                             memory_space=pltpu.VMEM)
        G, kl = 1, TL
    else:
        G = _largest_divisor(N, max(1, 4096 // L))
        grid = (N // G,)
        xspec = pl.BlockSpec((G, L, C), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec((G, S, C), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM)
        kl = L
    wfull = lambda shape: pl.BlockSpec(
        shape, (lambda n, t=None: (0,) * len(shape)) if len(grid) == 1
        else (lambda n, t: (0,) * len(shape)), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, G=G, S=S, eps=eps),
        out_shape=jax.ShapeDtypeStruct((N, L, C), x.dtype),
        grid=grid,
        in_specs=[xspec, sspec,
                  wfull((C, C)), wfull((C, C)), wfull((C, C)), wfull((C, C)),
                  wfull((1, C)), wfull((1, C)),
                  wfull((C, 2 * C)), wfull((C, 2 * C)), wfull((2 * C, C)),
                  wfull((1, C)), wfull((1, C)), wfull((C, C))],
        out_specs=xspec,
        interpret=interpret,
    )(x, source, wq, wk, wv, wm, g1, b1, w0x, w0m, w1, g2, b2, M)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_loftr(x, source, p: LoFTRParams, nhead: int):
    """Fused LoFTR encoder layer. x: [N,L,C]; source: [N,S,C] -> [N,L,C]."""
    return _fused_loftr_impl(x, source, p, nhead)


def _fused_fwd(x, source, p, nhead):
    return fused_loftr(x, source, p, nhead), (x, source, p)


def _fused_bwd(nhead, res, g):
    x, source, p = res
    _, vjp = jax.vjp(lambda xx, ss, pp: loftr_apply_xla(xx, ss, pp, nhead),
                     x, source, p)
    return vjp(g)


fused_loftr.defvjp(_fused_fwd, _fused_bwd)
