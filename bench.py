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
    # report both dtypes in the same line (BENCH_DTYPE overrides skip this)
    if "BENCH_DTYPE" not in os.environ and config.compute_dtype == "float32":
        ms16, _ = timed_forward(config, niters=niters, compute_dtype="bfloat16")
        ms16_8, _ = timed_forward(config, niters=max(100, niters // 4),
                                  batch_size=bs8, compute_dtype="bfloat16")
        out["latency_ms_bs1_bf16"] = round(ms16, 3)
        out["fps_bs1_bf16"] = round(1000.0 / ms16, 2)
        out["throughput_fps_bs%d_bf16" % bs8] = round(bs8 * 1000.0 / ms16_8, 2)
        if ms16 < ms:
            out["value"] = round(1000.0 / ms16, 2)
            out["vs_baseline"] = round(1000.0 / ms16 / ASSUMED_REFERENCE_FPS, 3)
            out["dtype"] = "bfloat16 (guarded fast mode; f32 fields included)"
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
