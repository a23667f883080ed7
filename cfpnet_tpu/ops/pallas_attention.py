"""Pallas fused linear attention (TPU).

Fuses the entire kernelized-attention chain — elu+1 feature maps, the K·V
summary, the normalizer, and the output contraction — into ONE VMEM-resident
kernel per batch row, eliminating the [N,L,H,D] intermediates that the
einsum formulation round-trips through HBM.

Math: identical to ``ops.attention.linear_attention`` (reference
/root/reference/src/models/attention.py:31-49) via a block-diagonal
reformulation that avoids per-head reshapes inside the kernel:

    With C = H·D, Qf = elu(Q)+1, Kf = elu(K)+1   (all [L|S, C]):
      KV   = Kfᵀ @ (V/S)  ⊙  M          M = block-diag head mask [C, C]
      den  = Qf @ (Kfᵀ1 broadcast per head)        [L, C]
      out  = (Qf @ KV) * S / den

    The cross-head terms of Kfᵀ@V are masked out by M, so this equals the
    per-head einsum exactly; the [C,C] matmul wastes H× the MACs of the
    block-diagonal ideal, which is negligible at these sizes and keeps every
    op a dense MXU matmul.

A pure-XLA implementation of the same reformulation
(``linear_attention_blockdiag``) serves as the CPU fallback and the
numerical oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _head_masks(C: int, nhead: int, dtype):
    """(block-diag [C,C], head-broadcast [C,C]) masks."""
    D = C // nhead
    idx = np.arange(C) // D
    blockdiag = (idx[:, None] == idx[None, :]).astype(np.float32)
    return jnp.asarray(blockdiag, dtype)


def linear_attention_blockdiag(q, k, v, nhead: int, eps: float = 1e-6):
    """XLA reference of the fused formulation. q: [N,L,C]; k,v: [N,S,C]."""
    C = q.shape[-1]
    M = _head_masks(C, nhead, q.dtype)
    Qf = jax.nn.elu(q) + 1.0
    Kf = jax.nn.elu(k) + 1.0
    S = v.shape[1]
    KV = jnp.einsum("nsc,nsd->ncd", Kf, v / S) * M[None]
    ksum = Kf.sum(axis=1)  # [N, C]
    # denominator per (l, head) broadcast to C lanes: Qf @ (ksum ⊙ M)
    den = jnp.einsum("nlc,ncd->nld", Qf, ksum[:, :, None] * M[None]) + eps
    out = jnp.einsum("nlc,ncd->nld", Qf, KV) * S / den
    return out


def _elu1(x):
    # elu(x)+1 without expm1 (unimplemented in the Pallas TPU lowering)
    return jnp.where(x > 0, x + 1.0, jnp.exp(jnp.minimum(x, 0.0)))


def _kernel(q_ref, k_ref, v_ref, m_ref, out_ref, *, S: int, eps: float):
    Q = q_ref[0]  # [TL, C] query tile
    K = k_ref[0]
    V = v_ref[0]
    M = m_ref[:]
    Qf = _elu1(Q)
    Kf = _elu1(K)
    # KV/ksum are recomputed per query tile (S*C*C MACs — negligible); the
    # K/V blocks are revisited across tiles so Mosaic keeps them resident
    KV = jax.lax.dot_general(
        Kf, V / S, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * M
    ksum = Kf.sum(axis=0, keepdims=True)  # [1, C]
    # rows of M scaled by ksum (ksum[c] weights row c): M * ksumᵀ
    den = (
        jax.lax.dot_general(
            Qf, M * jnp.transpose(ksum), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + eps
    )
    num = jax.lax.dot_general(
        Qf, KV, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    out_ref[0] = (num * S / den).astype(out_ref.dtype)


def _l_tile(L: int, target: int = 2048) -> int:
    """Largest divisor of L <= target (queries are independent, so the L
    axis tiles freely — without this, batched calls scope the full [N,L,C]
    result in VMEM and OOM the 16M scoped limit at bs=8)."""
    if L <= target:
        return L
    best = 1
    d = 1
    while d * d <= L:
        if L % d == 0:
            for c in (d, L // d):
                if c <= target:
                    best = max(best, c)
        d += 1
    return best


@functools.partial(jax.jit, static_argnames=("nhead", "eps", "interpret"))
def linear_attention_pallas(q, k, v, nhead: int, eps: float = 1e-6,
                            interpret: bool = False):
    """Fused kernel. q: [N,L,C]; k,v: [N,S,C] -> [N,L,C]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, L, C = q.shape
    S = k.shape[1]
    M = _head_masks(C, nhead, q.dtype)
    TL = _l_tile(L)

    return pl.pallas_call(
        functools.partial(_kernel, S=S, eps=eps),
        out_shape=jax.ShapeDtypeStruct((N, L, C), q.dtype),
        grid=(N, L // TL),
        in_specs=[
            pl.BlockSpec((1, TL, C), lambda n, t: (n, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, C), lambda n, t: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, C), lambda n, t: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TL, C), lambda n, t: (n, t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v, M)


# XLA:TPU on this stack stages the custom-call result on the scoped-VMEM
# stack (16 MiB limit) with lane padding to 128 — large batched calls
# (bs=8 cross-zone: [8,19200,32] -> 78 MiB padded) fail to COMPILE, not run.
# Guard: padded residency must fit comfortably; larger shapes take the XLA
# block-diagonal path (same math).
_SCOPED_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def linear_attention_auto(q, k, v, nhead: int, eps: float = 1e-6,
                          use_pallas: bool = True):
    """[N,L,H,D]-shaped drop-in for ops.attention.linear_attention (no
    masks) that dispatches to the fused Pallas kernel on TPU."""
    N, L, H, D = q.shape
    S = k.shape[1]
    qc = q.reshape(N, L, H * D)
    kc = k.reshape(N, S, H * D)
    vc = v.reshape(N, S, H * D)
    on_tpu = jax.default_backend() == "tpu"
    padded_bytes = N * L * max(H * D, 128) * 4
    if use_pallas and on_tpu and padded_bytes <= _SCOPED_VMEM_BUDGET_BYTES:
        out = linear_attention_pallas(qc, kc, vc, nhead=H, eps=eps)
    else:
        out = linear_attention_blockdiag(qc, kc, vc, nhead=H, eps=eps)
    return out.reshape(N, L, H, D)
