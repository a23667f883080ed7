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

Timeout-proofing (VERDICT r3 item 2: r3's bench died rc=124 with NOTHING
printed because every optional extra ran before the headline): the bf16
headline (bs=1 + bs=8) is measured FIRST; everything else is budget-gated
against ``BENCH_BUDGET_S`` wall-clock (default 600 s) with per-stage cost
estimates, and any stage that doesn't fit (or raises twice) is listed under
``"skipped"`` instead of killing the run. The single JSON line always
prints; exit code is always 0 once the headline exists.

Stage order after the headline (VERDICT r4 item 2: no driver artifact ever
carried a train-step number because the train timing ran LAST with the
fattest estimate): the production train-step timing runs FIRST among the
extras, then the MFU cost analyses, then the f32 keys, then the measured
CPU baseline anchor. A failed optional stage is retried once (r4's
``f32_bs1: JaxRuntimeError`` was a transient tunnel flake) and recorded
with a truncated message + a stderr traceback, not just the type name
(VERDICT r4 item 3 / ADVICE r4).

Env knobs: BENCH_DTYPE (pin a single dtype — skips the f32 extra keys),
BENCH_BUDGET_S, BENCH_ITERS, BENCH_THROUGHPUT_BS, BENCH_MFU=0,
BENCH_TRAIN_BS, BENCH_TRAIN_ITERS, BENCH_REMAT=1, BENCH_PALLAS=1,
BENCH_PEAK_TFLOPS, BENCH_ANCHOR=0 (skip the live anchor subprocess),
BENCH_SMOKE=1 (tiny model on forced-CPU — the tests/test_driver_entry.py
regression path; reports a DISTINCT metric name so a consumer keying on the
production metric can never ingest a smoke number).

``vs_baseline`` divides by an assumed reference number: the reference repo
publishes no latency (SURVEY.md §6, BASELINE.md); we assume ~30 ms/frame
(33.3 fps) for the PyTorch model on a modern CUDA GPU via its own
evaluate_time harness. The driver's north-star is vs_baseline >= 2.
Alongside the assumption, the ``ref_cpu_ms``/``ours_cpu_ms`` fields carry a
MEASURED same-host anchor (scripts/baseline_anchor.py: the actual reference
torch model vs ours, both f32 on the same CPU core, reference protocol) —
live when the budget covers it, else the checked-in ANCHOR.json measurement
(``anchor_source`` says which).
"""

import json
import os
import subprocess
import sys
import time
import traceback

if os.environ.get("BENCH_SMOKE") == "1":
    # the image's sitecustomize pins the axon TPU plugin; the smoke path
    # must force CPU before any backend initializes
    import jax

    jax.config.update("jax_platforms", "cpu")

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


class StageBudget:
    """Wall-clock gate for optional stages: a stage runs only when the
    remaining budget covers the caller's cost estimate; a stage that raises
    is retried ONCE (transient tunnel flakes — VERDICT r4) and, failing
    twice, recorded as skipped with a truncated message (plus a full
    traceback on stderr — the JSON stdout contract stays one line)."""

    def __init__(self, budget_s: float):
        self.t0 = time.monotonic()
        self.budget = budget_s
        self.skipped = []

    def elapsed(self) -> float:
        return time.monotonic() - self.t0

    def run(self, name: str, fn, est_s: float, retries: int = 1):
        if self.elapsed() + est_s > self.budget:
            self.skipped.append(f"{name} (budget)")
            return None
        last = None
        for attempt in range(1 + retries):
            try:
                return fn()
            except Exception as e:  # an extra must never kill the headline
                last = e
                traceback.print_exc(file=sys.stderr)
                if self.elapsed() + est_s > self.budget:
                    break  # no room for another attempt
        msg = str(last).replace("\n", " ")[:160]
        self.skipped.append(f"{name} (error: {type(last).__name__}: {msg})")
        return None


def read_anchor_fallback():
    """Checked-in ANCHOR.json (produced by scripts/baseline_anchor.py on
    this box) — used when the live anchor subprocess doesn't fit the
    budget."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ANCHOR.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        d = json.load(f)
    return d if "ref_cpu_ms" in d else None


def run_anchor_live():
    """scripts/baseline_anchor.py in a subprocess (it forces the CPU
    backend; this process holds the TPU). Sequential — never concurrent
    with the TPU measurements above it."""
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "baseline_anchor.py")
    r = subprocess.run([sys.executable, script], capture_output=True,
                       text=True, timeout=900)
    out = json.loads(r.stdout.strip().splitlines()[-1])
    if "ref_cpu_ms" not in out:
        raise RuntimeError(out.get("error", "anchor produced no numbers"))
    return out


def smoke_main():
    """BENCH_SMOKE=1: tiny model on forced-CPU, same code path and JSON
    schema as the real run — the regression hook that keeps the driver's
    bench artifact from rotting between rounds (VERDICT r3 item 5). The
    metric NAME is distinct (ADVICE r4: a consumer keying on the production
    metric name alone must never ingest a tiny-CPU number)."""
    from __graft_entry__ import _tiny_config
    from evaluate_time import timed_forward

    config = _tiny_config().replace(mode="online_eval")
    ms, _ = timed_forward(config, tiny=True, niters=8, K=2,
                          compute_dtype="bfloat16")
    out = {
        "metric": "frames_per_sec_smoke_tiny_cpu",
        "value": round(1000.0 / ms, 2),
        "unit": "frames/s",
        "vs_baseline": round(1000.0 / ms / ASSUMED_REFERENCE_FPS, 3),
        "latency_ms_bs1": round(ms, 3),
        "dtype": "bfloat16",
        "smoke": True,
    }
    print(json.dumps(out))
    return 0


def main():
    if os.environ.get("BENCH_SMOKE") == "1":
        return smoke_main()

    sb = StageBudget(float(os.environ.get("BENCH_BUDGET_S", "600")))
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
        use_pallas=os.environ.get("BENCH_PALLAS", "0") == "1",
    ).replace(mode="online_eval")

    # ---- headline FIRST: pinned bf16 (the documented, accuracy-guarded
    # fast mode — tests/test_bf16.py), bs=1 then bs=8. BENCH_DTYPE
    # overrides the pin and skips the f32 extra keys.
    hdt = os.environ.get("BENCH_DTYPE", "bfloat16")
    bs8 = int(os.environ.get("BENCH_THROUGHPUT_BS", "8"))
    t = time.monotonic()
    ms, _pred = timed_forward(config, niters=niters, compute_dtype=hdt)
    cost_bs1 = time.monotonic() - t
    t = time.monotonic()
    ms8, _ = timed_forward(config, niters=max(100, niters // 4),
                           batch_size=bs8, compute_dtype=hdt)
    cost_bs8 = time.monotonic() - t
    out = {
        "metric": "frames_per_sec_per_chip_480x640_bs1",
        "value": round(1000.0 / ms, 2),
        "unit": "frames/s",
        "vs_baseline": round(1000.0 / ms / ASSUMED_REFERENCE_FPS, 3),
        "latency_ms_bs1": round(ms, 3),
        "throughput_fps_bs%d" % bs8: round(bs8 * 1000.0 / ms8, 2),
        "dtype": hdt + ("" if "BENCH_DTYPE" in os.environ else
                        " (pinned headline; guarded fast mode — f32 under *_f32 keys)"),
        "iters": niters,
        "timing": "in-graph chained (see evaluate_time.timed_forward)",
    }

    # ---- budget-gated extras ----
    # production train step FIRST (VERDICT r4 item 2): bs=16 @ 416x544,
    # fwd+bwd+AdamW — half the reference's capability surface
    # (/root/reference/train.py:96-135) and the one number no driver
    # artifact had ever captured while it ran last.
    from evaluate_time import (graph_flops_eval, graph_flops_train,
                               timed_train_step)

    tcfg = train_config(config)
    ms_t = sb.run("train_step", lambda: timed_train_step(
        tcfg, niters=int(os.environ.get("BENCH_TRAIN_ITERS", "40")),
        compute_dtype=hdt),
        est_s=max(120.0, 1.5 * (cost_bs1 + cost_bs8)))
    if ms_t is not None:
        out["train_ms_bs%d" % tcfg.bs] = round(ms_t, 2)
        out["train_img_s"] = round(tcfg.bs * 1000.0 / ms_t, 2)
        out["train_dtype"] = hdt

    # FLOPs-normalized utilization (VERDICT r2 item 1): XLA cost-analysis
    # FLOPs, achieved TFLOP/s, MFU vs the chip's bf16 peak.
    if os.environ.get("BENCH_MFU", "1") == "1":
        peak = peak_bf16_tflops()
        f1 = sb.run("flops_bs1", lambda: graph_flops_eval(config, 1),
                    est_s=max(30.0, 0.75 * cost_bs1))
        f8 = sb.run("flops_bs%d" % bs8,
                    lambda: graph_flops_eval(config, bs8),
                    est_s=max(30.0, 0.75 * cost_bs8))
        if f1 is not None:
            out["flops_g_fwd"] = round(f1 / 1e9, 2)
            out["peak_bf16_tflops"] = peak
            out["tfps_bs1"] = round(f1 / (ms / 1e3) / 1e12, 2)
            out["mfu_bs1"] = round(out["tfps_bs1"] / peak, 4)
        if f8 is not None:
            fps8 = bs8 * 1000.0 / ms8
            out["tfps_bs%d" % bs8] = round(f8 / bs8 * fps8 / 1e12, 2)
            out["mfu_bs%d" % bs8] = round(out["tfps_bs%d" % bs8] / peak, 4)
        if ms_t is not None:
            ft = sb.run("flops_train", lambda: graph_flops_train(tcfg),
                        est_s=max(30.0, 0.75 * cost_bs1))
            if ft is not None:
                out["flops_g_train_step"] = round(ft / 1e9, 2)
                out["tfps_train"] = round(ft / (ms_t / 1e3) / 1e12, 2)
                out["mfu_train"] = round(out["tfps_train"] / peak, 4)

    if "BENCH_DTYPE" not in os.environ:
        r = sb.run("f32_bs1", lambda: timed_forward(
            config, niters=niters, compute_dtype="float32"),
            est_s=1.5 * cost_bs1)
        if r is not None:
            out["latency_ms_bs1_f32"] = round(r[0], 3)
            out["fps_bs1_f32"] = round(1000.0 / r[0], 2)
        r = sb.run("f32_bs%d" % bs8, lambda: timed_forward(
            config, niters=max(100, niters // 4), batch_size=bs8,
            compute_dtype="float32"), est_s=1.5 * cost_bs8)
        if r is not None:
            out["throughput_fps_bs%d_f32" % bs8] = round(
                bs8 * 1000.0 / r[0], 2)

    # measured same-host baseline anchor (VERDICT r4 item 5), live when the
    # budget covers the CPU subprocess (CPU compile cache makes it ~2-4 min
    # warm), else the checked-in ANCHOR.json measurement
    anchor = None
    if os.environ.get("BENCH_ANCHOR", "1") == "1":
        anchor = sb.run("anchor_live", run_anchor_live, est_s=300.0,
                        retries=0)
    source = "live"
    if anchor is None:
        anchor, source = read_anchor_fallback(), "ANCHOR.json (checked-in)"
    if anchor is not None:
        out["ref_cpu_ms"] = anchor["ref_cpu_ms"]
        out["ours_cpu_ms"] = anchor["ours_cpu_ms"]
        out["cpu_speedup"] = anchor.get("cpu_speedup")
        out["anchor_source"] = source

    if sb.skipped:
        out["skipped"] = sb.skipped
    print(json.dumps(out))
    sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
