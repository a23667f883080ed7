#!/usr/bin/env python
"""Measured same-host baseline anchor: reference torch CPU vs ours CPU.

The headline ``vs_baseline`` in bench.py divides by an ASSUMED reference GPU
number (the reference repo publishes no latency — SURVEY.md §6). This script
produces the one anchor that CAN be measured on this box: the ACTUAL
reference PyTorch model (instantiated via tests/reference_oracle.py's
stubbed-timm harness — the same oracle the parity suite runs) and our model,
both f32, both on the same single CPU core, both under the reference's own
per-call trimmed-mean protocol (/root/reference/evaluate_time.py:73-82 —
``sorted[1:-2]/(n-3)``; per-call fencing is honest on a locally attached
CPU backend, unlike the axon tunnel).

Prints ONE JSON line:
  {"ref_cpu_ms": N, "ours_cpu_ms": N, "cpu_speedup": N, "iters": N, ...}

bench.py runs this as a budget-gated subprocess and merges the fields; the
checked-in ANCHOR.json (produced by this script) is its fallback when the
budget doesn't cover a live run.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")  # before backend init (CLAUDE.md)

ITERS = int(os.environ.get("ANCHOR_ITERS", "12"))


def production_config():
    from cfpnet_tpu.config import Config

    return Config(
        n_bins=256,
        attention_layer=["hist2image", "combine1", "image",
                         "hist2image", "combine1", "image"],
        change_embedding=True,
        sample_uniform=True,
        zone_sample_num=16,
        dataset_eval="synthetic",
    ).replace(mode="online_eval")


def trimmed(diffs_ms):
    n = len(diffs_ms)
    if n > 3:
        return sum(sorted(diffs_ms)[1:-2]) / (n - 3)
    return sum(diffs_ms) / n


def measure_ours(config):
    from cfpnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from evaluate_time import timed_forward

    # chained=False: the reference's literal per-call protocol — valid on a
    # locally attached CPU backend
    ms, _ = timed_forward(config, niters=ITERS, compute_dtype="float32",
                          chained=False)
    return ms


def measure_reference(config):
    import numpy as np
    import torch

    torch.set_num_threads(1)  # 1-core box; keep the comparison symmetric
    from tests.reference_oracle import load_reference_deltar
    from tests.test_reference_parity import make_inputs, reference_inputs

    model, _ = load_reference_deltar(config)
    model.eval()
    rgb, hist, mask = make_inputs(config, "online_eval")
    inputs = reference_inputs(config, "online_eval", rgb, hist, mask)
    diffs = []
    with torch.no_grad():
        for _ in range(2):  # warmup
            model(inputs)
        for _ in range(ITERS):
            t = time.perf_counter()
            model(inputs)
            diffs.append((time.perf_counter() - t) * 1000.0)
    return trimmed(diffs)


def main():
    if not os.path.isdir("/root/reference/src/models"):
        print(json.dumps({"error": "reference checkout not available"}))
        return 1
    cfg = production_config()
    ours_ms = measure_ours(cfg)
    ref_ms = measure_reference(cfg)
    out = {
        "ref_cpu_ms": round(ref_ms, 2),
        "ours_cpu_ms": round(ours_ms, 2),
        "cpu_speedup": round(ref_ms / ours_ms, 3),
        "iters": ITERS,
        "protocol": "per-call trimmed mean (reference evaluate_time.py:73-82)"
                    ", f32, bs=1 480x640, single CPU core, same host",
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
