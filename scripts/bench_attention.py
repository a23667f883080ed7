#!/usr/bin/env python
"""Microbenchmark: einsum vs block-diagonal vs Pallas linear attention on the
model's real shapes. Loops the op inside one jit (lax.fori_loop with data
dependence) so the tunnel round-trip amortizes out of the measurement.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from cfpnet_tpu.ops.attention import linear_attention
from cfpnet_tpu.ops.pallas_attention import (
    linear_attention_blockdiag,
    linear_attention_pallas,
)
from cfpnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

REPS = 100


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t))
    return best / REPS * 1e6  # us per op


def loop(op):
    def run(q, k, v):
        def body(i, acc):
            o = op(q + acc * 1e-20, k, v)
            return acc + o.mean()

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    return jax.jit(run)


def main():
    shapes = [
        ("LGA 1/4 (140w x 144t, C32 H8)", (140, 144, 144, 8, 4)),
        ("LGA 1/8 (63w x 81t, C64 H8)", (63, 81, 81, 8, 8)),
        ("GSA 1/4 (1 x 19200q/130k, C32 H8)", (1, 19200, 130, 8, 4)),
        ("hist2image 1/4 (64z x 196t/16h, C32 H4)", (64, 196, 16, 4, 8)),
        ("newcross 1/4 (1 x 19200q/12544k, C32 H4)", (1, 19200, 12544, 4, 8)),
    ]
    rng = np.random.default_rng(0)
    for name, (N, L, S, H, D) in shapes:
        C = H * D
        q = jnp.asarray(rng.standard_normal((N, L, H, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((N, S, H, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((N, S, H, D)), jnp.float32)
        qc, kc, vc = (x.reshape(x.shape[0], x.shape[1], C) for x in (q, k, v))

        t_ein = timed(loop(lambda a, b, c: linear_attention(a, b, c)), q, k, v)
        t_bd = timed(
            loop(lambda a, b, c: linear_attention_blockdiag(a, b, c, nhead=H)),
            qc, kc, vc,
        )
        try:
            t_pl = timed(
                loop(lambda a, b, c: linear_attention_pallas(a, b, c, nhead=H)),
                qc, kc, vc,
            )
        except Exception as e:
            t_pl = float("nan")
            print(f"  pallas failed: {type(e).__name__}: {e}")
        print(f"{name}: einsum {t_ein:.1f}us  blockdiag {t_bd:.1f}us  "
              f"pallas {t_pl:.1f}us")


if __name__ == "__main__":
    main()
