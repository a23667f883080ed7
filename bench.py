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

    ms, _pred = timed_forward(config, niters=niters)
    fps = 1000.0 / ms
    bs8 = int(os.environ.get("BENCH_THROUGHPUT_BS", "8"))
    ms8, _ = timed_forward(config, niters=max(100, niters // 4), batch_size=bs8)
    fps8 = bs8 * 1000.0 / ms8
    print(
        json.dumps(
            {
                "metric": "frames_per_sec_per_chip_480x640_bs1",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / ASSUMED_REFERENCE_FPS, 3),
                "latency_ms_bs1": round(ms, 3),
                "throughput_fps_bs%d" % bs8: round(fps8, 2),
                "dtype": config.compute_dtype,
                "iters": niters,
                "timing": "in-graph chained (see evaluate_time.timed_forward)",
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
