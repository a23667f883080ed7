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
              f"({2 * M * K * N / (t8 / 1e3) / 1e12:.1f} TOP/s)")
    except Exception as e:  # noqa: BLE001
        print(f"  dot int8 FAILED: {type(e).__name__}: {e}")
    tb = chain_time(lambda a: lax.dot(
        a, bb, preferred_element_type=jnp.float32), ab)
    print(f"  dot {M}^3 bf16: {tb:.4f} ms "
          f"({2 * M * K * N / (tb / 1e3) / 1e12:.1f} TFLOP/s)")


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


def bench_attn():
    """Fusion@1/4 anatomy (the bs=8 wall's biggest block, 5.4 ms): per-block
    costs at production shapes (C=32, nhead=8 -> head dim 4, 120x160 map),
    and the per-head einsum vs block-diagonal matmul reformulation of
    linear attention."""
    from cfpnet_tpu.config import Config
    from cfpnet_tpu.models.deltar import model_geometries
    from cfpnet_tpu.models.transformer import (Combine1, LoFTREncoderLayer,
                                               TwinsTransformer)
    from cfpnet_tpu.ops.attention import elu_feature_map, linear_attention

    print(f"[attn] chain floor: {floor_ms():.4f} ms")
    B, H, W, C, NH = 8, 120, 160, 32, 8
    L, S = H * W, 64 * 16
    dt = jnp.bfloat16
    rng = jax.random.key(0)
    x = jnp.asarray(np.random.randn(B, L, C), dt)
    src = jnp.asarray(np.random.randn(B, S, C), dt)

    def cast(t):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dt)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, t)

    # 1) whole-block costs
    lo = LoFTREncoderLayer(C, NH)
    lov = cast(jax.jit(lo.init)(rng, x, src))
    print(f"  hist2image (LoFTR L={L} S={S}): "
          f"{chain_time(lambda a: lo.apply(lov, a, src), x):.4f} ms")
    tw = TwinsTransformer(C, 12)
    twv = cast(jax.jit(lambda r: tw.init(r, x, (H, W)))(rng))
    print(f"  image (Twins LSA+GSA ws=12):    "
          f"{chain_time(lambda a: tw.apply(twv, a, (H, W)), x):.4f} ms")
    cfg = Config(n_bins=256, sample_uniform=True, change_embedding=True,
                 attention_layer=["hist2image", "combine1", "image",
                                  "hist2image", "combine1", "image"])
    g4 = model_geometries(cfg, "online_eval")[4]
    rect = (g4.zy0, g4.zy1, g4.zx0, g4.zx1)
    cb = Combine1(C, NH, 31)
    cbv = cast(jax.jit(lambda r: cb.init(r, x, rect, H, W))(rng))
    print(f"  combine1 (newcross9+Block14):   "
          f"{chain_time(lambda a: cb.apply(cbv, a, rect, H, W), x):.4f} ms")

    # 2) the attention einsum alone: per-head vs block-diagonal
    q = jnp.asarray(np.random.randn(B, L, NH, C // NH), dt)
    k = jnp.asarray(np.random.randn(B, S, NH, C // NH), dt)
    v = jnp.asarray(np.random.randn(B, S, NH, C // NH), dt)

    def blockdiag(qq):
        D = C // NH
        Q = elu_feature_map(qq).reshape(B, L, C)
        K = elu_feature_map(k).reshape(B, S, C)
        V = (v / S).reshape(B, S, C)
        bd = jnp.asarray(np.kron(np.eye(NH), np.ones((D, D))), dt)  # (C,C)
        KV = jnp.einsum("nsc,nsd->ncd", K, V) * bd
        ks = K.sum(axis=1)  # (n, C)
        e = jnp.asarray(np.kron(np.eye(NH), np.ones((D, 1))), dt)  # (C,NH)
        Z = 1.0 / (jnp.einsum("nlc,nch->nlh", Q, ks[:, :, None] * e) + 1e-6)
        out = jnp.einsum("nlc,ncd->nld", Q, KV)
        out = out.reshape(B, L, NH, D) * Z[..., None] * S
        return out

    t1 = chain_time(lambda qq: linear_attention(qq, k, v), q)
    t2 = chain_time(blockdiag, q)
    d = float(jnp.max(jnp.abs(
        linear_attention(q, k, v).astype(jnp.float32)
        - blockdiag(q).astype(jnp.float32))))
    print(f"  linear_attention L={L} S={S}: per-head {t1:.4f} ms | "
          f"block-diag {t2:.4f} ms | maxdiff {d:.2e}")
    # self-attention shape (LSA windows): many small batches
    qw = jnp.asarray(np.random.randn(B * 140, 144, NH, C // NH), dt)
    t1 = chain_time(lambda qq: linear_attention(qq, qq, qq), qw)
    print(f"  linear_attention windows (1120x144): per-head {t1:.4f} ms")


def bench_attn2():
    """Bisect combine1 (1.35 ms) and Twins (0.97 ms) at 1/4 scale, bs=8."""
    import flax.linen as nn

    from cfpnet_tpu.config import Config
    from cfpnet_tpu.models.convnext import Block14
    from cfpnet_tpu.models.deltar import model_geometries
    from cfpnet_tpu.models.transformer import (GlobalSubSampleAttn,
                                               LocallyGroupedAttn,
                                               LoFTRNewCross9)
    from cfpnet_tpu.ops.dwconv import _dft_depthwise

    print(f"[attn2] chain floor: {floor_ms():.4f} ms")
    B, H, W, C, NH = 8, 120, 160, 32, 8
    L = H * W
    dt = jnp.bfloat16
    rng = jax.random.key(0)
    x = jnp.asarray(np.random.randn(B, L, C), dt)
    x2d = x.reshape(B, H, W, C)

    def cast(t):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dt)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, t)

    cfg = Config(n_bins=256, sample_uniform=True, change_embedding=True,
                 attention_layer=["hist2image", "combine1", "image",
                                  "hist2image", "combine1", "image"])
    g4 = model_geometries(cfg, "online_eval")[4]
    rect = (g4.zy0, g4.zy1, g4.zx0, g4.zx1)

    nc = LoFTRNewCross9(C, NH)
    ncv = cast(jax.jit(lambda r: nc.init(r, x, rect, H, W))(rng))
    print(f"  newcross9:            "
          f"{chain_time(lambda a: nc.apply(ncv, a, rect, H, W), x):.4f} ms")

    b14 = Block14(C, 31)
    b14v = cast(jax.jit(lambda r: b14.init(r, x2d))(rng))
    print(f"  Block14 k=31:         "
          f"{chain_time(lambda a: b14.apply(b14v, a), x2d):.4f} ms")

    kern = jnp.asarray(np.random.randn(31, 31, 1, C) * 0.1, dt)
    print(f"  dft dwconv k=31 bf16: "
          f"{chain_time(lambda a: _dft_depthwise(a, kern, mat_dtype=dt), x2d):.4f} ms")

    conv = nn.Conv(C, (3, 3), padding=1, use_bias=False)
    y2 = jnp.concatenate([x2d, x2d], axis=-1)
    cv = cast(jax.jit(lambda r: conv.init(r, y2))(rng))
    print(f"  conv3x3 64->32:       "
          f"{chain_time(lambda a: conv.apply(cv, a), y2):.4f} ms")

    lga = LocallyGroupedAttn(C, 12)
    lgav = cast(jax.jit(lambda r: lga.init(r, x, (H, W)))(rng))
    print(f"  LSA ws=12:            "
          f"{chain_time(lambda a: lga.apply(lgav, a, (H, W)), x):.4f} ms")

    gsa = GlobalSubSampleAttn(C, 12)
    gsav = cast(jax.jit(lambda r: gsa.init(r, x, (H, W)))(rng))
    print(f"  GSA sr=12:            "
          f"{chain_time(lambda a: gsa.apply(gsav, a, (H, W)), x):.4f} ms")

    # LayerNorm cost at this width (suspect: small-C LN is VPU/bandwidth)
    ln = nn.LayerNorm(epsilon=1e-5)
    lnv = cast(jax.jit(ln.init)(rng, x))
    print(f"  LayerNorm (L={L}xC32): "
          f"{chain_time(lambda a: ln.apply(lnv, a), x):.4f} ms")
    bn = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    bnv = cast(jax.jit(bn.init)(rng, x2d))
    print(f"  BatchNorm (eval):     "
          f"{chain_time(lambda a: bn.apply(bnv, a), x2d):.4f} ms")


def bench_s2d():
    """Space-to-depth conv trick at the small-C hot shapes: a 3x3 conv on
    C channels == a 2x2 conv on the 2x2-space-to-depth layout with 4C
    channels (structured-sparse kernel, zeros elsewhere). 1.78x the FLOPs
    but 4x the MXU lane utilization when C=32 pads 32->128."""
    print(f"[s2d] chain floor: {floor_ms():.4f} ms")
    B = 8
    for (H, W, Cin, Cout) in [(120, 160, 64, 32), (120, 160, 32, 32),
                              (240, 320, 64, 64)]:
        x = jnp.asarray(np.random.randn(B, H, W, Cin), jnp.bfloat16)
        k = jnp.asarray(np.random.randn(3, 3, Cin, Cout) * 0.05, jnp.bfloat16)

        def plain(a):
            return lax.conv_general_dilated(
                a, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        # Equivalent (2,2,4Cin,4Cout) kernel: input s2d on the natural grid
        # (block b = rows 2b,2b+1); OUTPUT blocks on a SHIFTED grid (block Y
        # = rows 2Y-1, 2Y), so each output block's 4-row receptive field
        # aligns to exactly 2 input blocks. Conv padding (1,1) per axis
        # yields H/2+1 output blocks; d2s then slice [1:H+1] drops the
        # out-of-range first/last shifted rows. Tap math: input row
        # 2(Y+t-1)+iy minus output row 2Y-1+oy' gives dy = 2t+iy-oy'-1,
        # valid taps dy in [-1,1].
        k4 = np.zeros((2, 2, 4 * Cin, 4 * Cout), np.float32)
        kn = np.asarray(k, np.float32)
        for oy in range(2):
            for ox in range(2):
                for ty in range(2):
                    for tx in range(2):
                        for iy in range(2):
                            for ix in range(2):
                                dy = 2 * ty + iy - oy - 1
                                dx = 2 * tx + ix - ox - 1
                                if -1 <= dy <= 1 and -1 <= dx <= 1:
                                    k4[ty, tx,
                                       (iy * 2 + ix) * Cin:(iy * 2 + ix + 1) * Cin,
                                       (oy * 2 + ox) * Cout:(oy * 2 + ox + 1) * Cout] \
                                        = kn[dy + 1, dx + 1]
        k4 = jnp.asarray(k4, jnp.bfloat16)

        def s2d(a):
            # NHWC (B,H,W,C) -> (B,H/2,W/2,4C) with subpixel-major channels
            a4 = a.reshape(B, H // 2, 2, W // 2, 2, Cin).transpose(
                0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * Cin)
            o4 = lax.conv_general_dilated(
                a4, k4, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # depth-to-space on the shifted grid: rows -1..H, cols -1..W
            o = o4.reshape(B, H // 2 + 1, W // 2 + 1, 2, 2, Cout).transpose(
                0, 1, 3, 2, 4, 5).reshape(B, H + 2, W + 2, Cout)
            return o[:, 1:H + 1, 1:W + 1, :]

        t1 = chain_time(plain, x)
        t2 = chain_time(s2d, x)
        d = float(jnp.max(jnp.abs(plain(x).astype(jnp.float32)
                                  - s2d(x).astype(jnp.float32))))
        print(f"  conv3x3 {H}x{W} {Cin}->{Cout}: plain {t1:.4f} ms | "
              f"s2d {t2:.4f} ms | maxdiff {d:.2e}")


def bench_pack():
    """Zero-relayout lane packing for small-C Dense layers: a row-major
    (M,32)@(32,32) equals (M/4,128)@(block-diag(W x4)) with BOTH reshapes
    free (4 consecutive tokens' channels are contiguous in memory). If XLA
    pads K=N=32 up to the 128-lane MXU tile, packing is up to 4x fewer
    hardware MACs with zero data movement."""
    print(f"[pack] chain floor: {floor_ms():.4f} ms")
    M = 8 * 19200  # bs=8 tokens at 1/4 scale
    for C, P in ((32, 4), (64, 2)):
        x = jnp.asarray(np.random.randn(M, C), jnp.bfloat16)
        w = jnp.asarray(np.random.randn(C, C) * 0.1, jnp.bfloat16)
        wp = jnp.asarray(
            np.kron(np.eye(P, dtype=np.float32), np.asarray(w, np.float32)),
            jnp.bfloat16)

        def plain(a):
            return a @ w

        def packed(a):
            return (a.reshape(M // P, P * C) @ wp).reshape(M, C)

        t1 = chain_time(plain, x)
        t2 = chain_time(packed, x)
        d = float(jnp.max(jnp.abs(plain(x).astype(jnp.float32)
                                  - packed(x).astype(jnp.float32))))
        gf = 2 * M * C * C / 1e9
        print(f"  dense {M}x{C}@{C}x{C} ({gf:.2f} GF): plain {t1:.4f} ms "
              f"({gf/t1:.0f} GF/ms) | packed x{P} {t2:.4f} ms | maxdiff {d:.2e}")
    # MLP shapes: 32->128 and 128->32 (pwconv/mlp in the fusion blocks)
    for (Ci, Co, P) in ((32, 128, 4), (128, 32, 4), (32, 64, 4)):
        x = jnp.asarray(np.random.randn(M, Ci), jnp.bfloat16)
        w = jnp.asarray(np.random.randn(Ci, Co) * 0.1, jnp.bfloat16)
        wp = jnp.asarray(
            np.kron(np.eye(P, dtype=np.float32), np.asarray(w, np.float32)),
            jnp.bfloat16)

        def plain(a):
            return a @ w

        def packed(a):
            return (a.reshape(M // P, P * Ci) @ wp).reshape(M, Co)

        t1 = chain_time(plain, x)
        t2 = chain_time(packed, x)
        print(f"  dense {M}x{Ci}@{Ci}x{Co}: plain {t1:.4f} ms | "
              f"packed x{P} {t2:.4f} ms")


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
    if "attn" in which:
        bench_attn()
    if "attn2" in which:
        bench_attn2()
    if "s2d" in which:
        bench_s2d()
    if "pack" in which:
        bench_pack()


if __name__ == "__main__":
    main()
