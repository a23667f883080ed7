"""End-to-end HTTP serving throughput: micro-batched vs serialized.

Quantifies the MicroBatcher win (tools/serve_http.py): N concurrent bs=1
clients against the same in-process server, once with coalescing enabled
(--batch_wait_ms window) and once strict-serialized (window 0). Reports
images/sec over the full request->response wall time.

HONESTY NOTE (CLAUDE.md "Environment hazards"): per-call
``block_until_ready`` timing lies over the axon tunnel, but an HTTP
response cannot be acked early — the body IS the depth array, which does
not exist until the device call completes. Wall time from first POST to
last fully-read response is therefore an honest end-to-end measure; both
modes pay identical tunnel + HTTP costs, so the RATIO isolates the coalescing
win. Run nothing else TPU/CPU-heavy concurrently (1 host core).

Usage:
    python tools/export_serving.py --random_init --dst /tmp/art \
        --serve_platforms tpu --serve_batch_sizes 1 8 @configs/...
    python scripts/bench_serving_http.py --artifact /tmp/art \
        --clients 8 --requests 12

The reference has no serving path at all (its deployment story ends at
/root/reference/evaluate_time.py's latency loop) — this benchmarks a
beyond-parity subsystem.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_mode(artifact: str, clients: int, requests: int,
             batch_wait_ms: float) -> dict:
    from tools.serve_http import make_server

    server = make_server(artifact, port=0, batch_wait_ms=batch_wait_ms)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    man = server.artifact_model.manifest
    h, w = man["input"]["image_u8"][1], man["input"]["image_u8"][2]
    zones, s = man["input"]["hist"][1], man["input"]["hist"][2]
    rng = np.random.default_rng(0)
    # one pre-encoded payload per client (encode cost excluded from timing;
    # identical across modes anyway)
    payloads = []
    for _ in range(clients):
        buf = io.BytesIO()
        np.savez(buf,
                 image_u8=rng.integers(0, 256, (1, h, w, 3), np.uint8),
                 hist=rng.uniform(1.0, 3.0, (1, zones, s)).astype(np.float32),
                 mask=np.ones((1, zones), bool))
        payloads.append(buf.getvalue())

    url = f"http://127.0.0.1:{port}/predict"

    def post(body: bytes) -> np.ndarray:
        req = urllib.request.Request(url, data=body, method="POST")
        with np.load(io.BytesIO(urllib.request.urlopen(req).read())) as z:
            return z["depth"]

    post(payloads[0])  # server is warmed by make_server; prime HTTP path too

    errors = []

    def client(i):
        try:
            for _ in range(requests):
                d = post(payloads[i])
                assert d.shape == (1, h, w) and np.isfinite(d).all()
        except Exception as e:  # noqa: BLE001 — report, don't hang the join
            errors.append(f"client {i}: {e!r}")

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    stats = {
        "batch_wait_ms": batch_wait_ms,
        "clients": clients,
        "requests_per_client": requests,
        "images": clients * requests,
        "wall_s": round(wall, 3),
        "img_per_s": round(clients * requests / wall, 2),
        "errors": errors,
    }
    if server.batcher is not None:
        stats["device_batches"] = server.batcher.batches_run
        stats["mean_coalesced_rows"] = round(
            server.batcher.rows_run / max(1, server.batcher.batches_run), 2)
    server.shutdown()
    server.server_close()
    if server.batcher is not None:
        server.batcher.close()
    return stats


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=12,
                    help="bs=1 requests per client")
    ap.add_argument("--batch_wait_ms", type=float, default=5.0)
    args = ap.parse_args(argv)

    coalesced = run_mode(args.artifact, args.clients, args.requests,
                         args.batch_wait_ms)
    print(json.dumps(coalesced), flush=True)
    serialized = run_mode(args.artifact, args.clients, args.requests, 0.0)
    print(json.dumps(serialized), flush=True)
    print(json.dumps({
        "speedup_coalesced_over_serialized": round(
            coalesced["img_per_s"] / serialized["img_per_s"], 2)
    }), flush=True)


if __name__ == "__main__":
    main()
