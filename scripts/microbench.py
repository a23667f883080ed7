#!/usr/bin/env python
"""Single-op TPU microbenchmarks (chained host-forced protocol).

Feeds perf decisions; not part of the test suite. Sections are selected by
argv keywords so a run can target one experiment:

    python scripts/microbench.py dw3      # k=3 depthwise conv lowerings
    python scripts/microbench.py dft      # DFT-matmul precision variants
    python scripts/microbench.py int8     # int8 conv/matmul feasibility
    python scripts/microbench.py se       # SE-block (GAP+tiny matmul) cost

Every number uses the same in-graph chaining + host-forced scalar protocol
as evaluate_time.timed_forward (per-call fences lie on this tunnel — see
CLAUDE.md).
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cfpnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N_CHAIN = 100


def chain_time(fn, x0, reps: int = 4):
    """fn(x) -> y; chains x + eps*mean(y) N_CHAIN times in one jit."""

    def run(x):
        def body(i, acc):
            y = fn(acc)
            s = jnp.mean(jax.tree_util.tree_leaves(y)[0].astype(jnp.float32))
            return acc + (s * 1e-30).astype(acc.dtype)

        return jnp.sum(lax.fori_loop(0, N_CHAIN, body, x))

    g = jax.jit(run)
    float(g(x0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(x0))
        ts.append(time.perf_counter() - t0)
    return min(ts) / N_CHAIN * 1000.0


def floor_ms(dtype=jnp.bfloat16):
    x = jnp.zeros((8, 128, 128, 8), dtype)
    return chain_time(lambda a: a * 1.000001, x)


def bench_dw3():
    """k=3 depthwise convs at the backbone's MBConv shapes (eval 480x640,
    bs=8): XLA feature_group_count vs 9-tap shifted accumulate."""
    print(f"[dw3] chain floor: {floor_ms():.4f} ms")
    shapes = [  # (H, W, C) after the stride: s3 60x80x224(s2->30x40), s4, s5
        (30, 40, 224), (30, 40, 672), (15, 20, 816), (15, 20, 1392),
    ]
    B = 8
    for (H, W, C) in shapes:
        x = jnp.asarray(np.random.randn(B, H, W, C), jnp.bfloat16)
        k = jnp.asarray(np.random.randn(3, 3, 1, C) * 0.1, jnp.bfloat16)

        def xla_dw(a):
            return lax.conv_general_dilated(
                a, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C)

        def shifted(a):
            p = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
            out = jnp.zeros_like(a)
            for dy in range(3):
                for dx in range(3):
                    out = out + p[:, dy:dy + H, dx:dx + W, :] * k[dy, dx, 0]
            return out

        t1 = chain_time(xla_dw, x)
        t2 = chain_time(shifted, x)
        # correctness cross-check
        d = float(jnp.max(jnp.abs(xla_dw(x).astype(jnp.float32)
                                  - shifted(x).astype(jnp.float32))))
        print(f"  {H}x{W}x{C}: xla_grouped {t1:.4f} ms | shifted9 {t2:.4f} ms"
              f" | maxdiff {d:.2e}")


def bench_dft():
    """DFT-matmul dwconv precision ladder at the two production shapes."""
    from cfpnet_tpu.ops.dwconv import _dft_depthwise, _fft_depthwise

    print(f"[dft] chain floor: {floor_ms():.4f} ms")
    for (H, W, C, k) in [(120, 160, 32, 31), (60, 80, 64, 15)]:
        for B in (1, 8):
            xf = jnp.asarray(np.random.randn(B, H, W, C), jnp.float32)
            xb = xf.astype(jnp.bfloat16)
            kern = jnp.asarray(np.random.randn(k, k, 1, C) * 0.1, jnp.float32)
            kb = kern.astype(jnp.bfloat16)
            rows = [
                ("f32 HIGHEST", lambda a: _dft_depthwise(
                    a, kern, precision=lax.Precision.HIGHEST), xf),
                ("f32 HIGH   ", lambda a: _dft_depthwise(
                    a, kern, precision=lax.Precision.HIGH), xf),
                ("f32 DEFAULT", lambda a: _dft_depthwise(a, kern), xf),
                ("bf16 mats  ", lambda a: _dft_depthwise(
                    a, kb, mat_dtype=jnp.bfloat16), xb),
                ("fft f32    ", lambda a: _fft_depthwise(a, kern), xf),
            ]
            out = "  ".join(f"{n}: {chain_time(f, x):.4f}"
                            for n, f, x in rows)
            print(f"  k{k} {H}x{W}x{C} bs={B}: {out} ms")


def bench_int8():
    """Is int8 x int8 -> int32 fast on this stack? conv + matmul probes."""
    print(f"[int8] chain floor: {floor_ms():.4f} ms")
    B, H, W, C, O = 8, 60, 80, 224, 224
    xi = jnp.asarray(np.random.randint(-127, 127, (B, H, W, C)), jnp.int8)
    ki = jnp.asarray(np.random.randint(-127, 127, (3, 3, C, O)), jnp.int8)
    xb = (xi.astype(jnp.float32) / 127.0).astype(jnp.bfloat16)
    kb = (ki.astype(jnp.float32) / 127.0).astype(jnp.bfloat16)

    def conv_i8(a):
        return lax.conv_general_dilated(
            a, ki, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    def conv_bf(a):
        return lax.conv_general_dilated(
            a, kb, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    try:
        t8 = chain_time(conv_i8, xi)
        print(f"  conv3x3 {H}x{W} {C}->{O} int8: {t8:.4f} ms")
    except Exception as e:  # noqa: BLE001
        print(f"  conv3x3 int8 FAILED: {type(e).__name__}: {e}")
    tb = chain_time(conv_bf, xb)
    print(f"  conv3x3 {H}x{W} {C}->{O} bf16: {tb:.4f} ms")

    M = K = N = 4096
    ai = jnp.asarray(np.random.randint(-127, 127, (M, K)), jnp.int8)
    bi = jnp.asarray(np.random.randint(-127, 127, (K, N)), jnp.int8)
    ab, bb = (ai.astype(jnp.float32) / 127).astype(jnp.bfloat16), (
        bi.astype(jnp.float32) / 127).astype(jnp.bfloat16)
    try:
        t8 = chain_time(lambda a: lax.dot(
            a, bi, preferred_element_type=jnp.int32), ai)
        print(f"  dot {M}^3 int8: {t8:.4f} ms "
              f"({2 * M * K * N / t8 / 1e9:.1f} GFLOP/s-equiv)")
    except Exception as e:  # noqa: BLE001
        print(f"  dot int8 FAILED: {type(e).__name__}: {e}")
    tb = chain_time(lambda a: lax.dot(
        a, bb, preferred_element_type=jnp.float32), ab)
    print(f"  dot {M}^3 bf16: {tb:.4f} ms "
          f"({2 * M * K * N / tb / 1e9:.1f} GFLOP/s)")


def bench_se():
    """SE block (GAP -> 1x1 -> 1x1 -> gate) serialization cost at s5."""
    import flax.linen as nn

    from cfpnet_tpu.models.efficientnetv2 import SqueezeExcite

    print(f"[se] chain floor: {floor_ms():.4f} ms")
    B, H, W, C = 8, 15, 20, 1392
    x = jnp.asarray(np.random.randn(B, H, W, C), jnp.bfloat16)
    se = SqueezeExcite(rd_channels=58)
    v = jax.jit(se.init)(jax.random.key(0), x)
    v = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), v)
    print(f"  SE @{H}x{W}x{C} bs={B}: {chain_time(lambda a: se.apply(v, a), x):.4f} ms")


def main():
    which = set(sys.argv[1:]) or {"dw3", "dft"}
    if "dw3" in which:
        bench_dw3()
    if "dft" in which:
        bench_dft()
    if "int8" in which:
        bench_int8()
    if "se" in which:
        bench_se()


if __name__ == "__main__":
    main()
