#!/usr/bin/env python
"""Headline benchmark: frames/sec/chip, bs=1, 480x640 depth completion.

Protocol mirrors the reference latency harness
(/root/reference/evaluate_time.py:73-82) with one infrastructure fix: on a
remote-attached TPU, per-call device fences acknowledge before completion,
so forwards are chained inside one jit with a loop-carried data dependence
and a host-forced scalar (see evaluate_time.timed_forward); the same
trimmed-mean reduction applies. A batched-throughput field is included
(production serving batches; the reference's bs=1 comes from its
DataParallel eval limitation).

Prints ONE JSON line:
  {"metric": "frames_per_sec_per_chip_480x640_bs1", "value": N,
   "unit": "frames/s", "vs_baseline": N}

``vs_baseline`` divides by an assumed reference number: the reference repo
publishes no latency (SURVEY.md §6, BASELINE.md); we assume ~30 ms/frame
(33.3 fps) for the PyTorch model on a modern CUDA GPU via its own
evaluate_time harness. The driver's north-star is vs_baseline >= 2.
"""

import json
import os
import sys

from cfpnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()


ASSUMED_REFERENCE_FPS = 33.3  # ~30 ms/frame on GPU (repo publishes no number)

# per-chip dense bf16 peak TFLOP/s by device kind (public spec sheets);
# override with BENCH_PEAK_TFLOPS. MFU is reported against the bf16 peak
# (the MXU's native mode — f32 numbers get tfps_achieved only).
PEAK_BF16_TFLOPS = {
    "v4": 275.0,
    "v5 lite": 197.0, "v5e": 197.0, "v5litepod": 197.0,
    "v5p": 459.0, "v5": 459.0,
    "v6 lite": 918.0, "v6e": 918.0,
}


def peak_bf16_tflops() -> float:
    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env)
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key in ("v5 lite", "v5litepod", "v5e", "v6 lite", "v6e", "v5p",
                "v4", "v5"):
        if key in kind:
            return PEAK_BF16_TFLOPS[key]
    return 197.0  # assume v5e when unrecognized


def train_config(config):
    """Production train-step shape (configs/train_cfpnet_combine1.txt):
    bs=16 @ 416x544, 6x6 zones of 64 px."""
    return config.replace(
        mode="train", bs=int(os.environ.get("BENCH_TRAIN_BS", "16")),
        input_height=416, input_width=544, train_zone_num=6,
        drop_hist=0.34, noise_mean=0.17, noise_sigma=0.20, noise_prob=0.30,
        disable_clip_grad=True, hist_encoder_10x=True,
        remat=os.environ.get("BENCH_REMAT", "0") == "1",
    )


def main():
    niters = int(os.environ.get("BENCH_ITERS", "500"))
    from cfpnet_tpu.config import Config
    from evaluate_time import timed_forward

    config = Config(
        n_bins=256,
        attention_layer=["hist2image", "combine1", "image",
                         "hist2image", "combine1", "image"],
        change_embedding=True,
        sample_uniform=True,
        zone_sample_num=16,
        dataset_eval="synthetic",
        compute_dtype=os.environ.get("BENCH_DTYPE", "float32"),
        use_pallas=os.environ.get("BENCH_PALLAS", "0") == "1",
    ).replace(mode="online_eval")

    bs8 = int(os.environ.get("BENCH_THROUGHPUT_BS", "8"))
    ms, _pred = timed_forward(config, niters=niters)
    ms8, _ = timed_forward(config, niters=max(100, niters // 4), batch_size=bs8)
    out = {
        "metric": "frames_per_sec_per_chip_480x640_bs1",
        "value": round(1000.0 / ms, 2),
        "unit": "frames/s",
        "vs_baseline": round(1000.0 / ms / ASSUMED_REFERENCE_FPS, 3),
        "latency_ms_bs1": round(ms, 3),
        "throughput_fps_bs%d" % bs8: round(bs8 * 1000.0 / ms8, 2),
        "dtype": config.compute_dtype,
        "iters": niters,
        "timing": "in-graph chained (see evaluate_time.timed_forward)",
    }
    # the documented fast mode (accuracy-guarded in tests/test_bf16.py):
    # report both dtypes in the same line (BENCH_DTYPE overrides skip this).
    # The headline value is PINNED to bf16 — deterministic dtype, so
    # round-over-round comparisons never mix dtypes (ADVICE r2); the f32
    # measurement ships under its own explicit keys.
    if "BENCH_DTYPE" not in os.environ and config.compute_dtype == "float32":
        ms16, _ = timed_forward(config, niters=niters, compute_dtype="bfloat16")
        ms16_8, _ = timed_forward(config, niters=max(100, niters // 4),
                                  batch_size=bs8, compute_dtype="bfloat16")
        out["latency_ms_bs1_f32"] = out.pop("latency_ms_bs1")
        out["fps_bs1_f32"] = round(1000.0 / ms, 2)
        out["throughput_fps_bs%d_f32" % bs8] = out.pop("throughput_fps_bs%d" % bs8)
        out["latency_ms_bs1"] = round(ms16, 3)
        out["throughput_fps_bs%d" % bs8] = round(bs8 * 1000.0 / ms16_8, 2)
        out["value"] = round(1000.0 / ms16, 2)
        out["vs_baseline"] = round(1000.0 / ms16 / ASSUMED_REFERENCE_FPS, 3)
        out["dtype"] = "bfloat16 (pinned headline; guarded fast mode — f32 under *_f32 keys)"

    # ---- FLOPs-normalized utilization (VERDICT r2 item 1): XLA
    # cost-analysis FLOPs per forward, achieved TFLOP/s, MFU vs the chip's
    # dense bf16 peak. The bf16 timings above are the numerators' clocks.
    if os.environ.get("BENCH_MFU", "1") == "1":
        from evaluate_time import (graph_flops_eval, graph_flops_train,
                                   timed_train_step)

        peak = peak_bf16_tflops()
        f1 = graph_flops_eval(config, 1)
        f8 = graph_flops_eval(config, bs8)
        ms1b = out.get("latency_ms_bs1", ms)
        fps8 = out.get("throughput_fps_bs%d" % bs8, bs8 * 1000.0 / ms8)
        out["flops_g_fwd"] = round(f1 / 1e9, 2)
        out["peak_bf16_tflops"] = peak
        out["tfps_bs1"] = round(f1 / (ms1b / 1e3) / 1e12, 2)
        out["mfu_bs1"] = round(out["tfps_bs1"] / peak, 4)
        out["tfps_bs%d" % bs8] = round(f8 / bs8 * fps8 / 1e12, 2)
        out["mfu_bs%d" % bs8] = round(out["tfps_bs%d" % bs8] / peak, 4)

        # production train step (bs=16 @ 416x544, fwd+bwd+AdamW)
        tcfg = train_config(config)
        tdt = ("bfloat16" if "BENCH_DTYPE" not in os.environ
               else os.environ["BENCH_DTYPE"])
        ms_t = timed_train_step(tcfg, niters=int(os.environ.get(
            "BENCH_TRAIN_ITERS", "40")), compute_dtype=tdt)
        ft = graph_flops_train(tcfg)
        out["train_ms_bs%d" % tcfg.bs] = round(ms_t, 2)
        out["train_img_s"] = round(tcfg.bs * 1000.0 / ms_t, 2)
        out["flops_g_train_step"] = round(ft / 1e9, 2)
        out["tfps_train"] = round(ft / (ms_t / 1e3) / 1e12, 2)
        out["mfu_train"] = round(out["tfps_train"] / peak, 4)
        out["train_dtype"] = tdt
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
