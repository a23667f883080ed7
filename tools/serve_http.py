#!/usr/bin/env python
"""Minimal production inference endpoint over a serving artifact.

    python tools/serve_http.py --artifact artifacts/cfpnet [--port 8000]
                               [--sharded]

Stdlib-only HTTP server (no framework dependency) in front of
``cfpnet_tpu.serve.ServingModel`` — the reference has no serving/deployment
path at all (its closest surface is the latency loop,
/root/reference/evaluate_time.py:49-82); this completes the beyond-parity
deployment story: export (tools/export_serving.py) -> validate
(evaluate_all --serving_artifact) -> serve (this).

Protocol (binary, numpy .npz both ways — no base64 inflation):

  GET  /healthz    -> 200 "ok" once the model answered a warmup predict
  GET  /manifest   -> the artifact's manifest.json
  POST /predict    -> body: .npz with
                        image_u8 [N,H,W,3] uint8   raw RGB
                        hist     [N,Z,S]   float32 sampled zone depth points
                        mask     [N,Z]     bool    valid zones
                      response: .npz with depth [N,H,W] float32 (meters)

Requests of any N are padded/chunked through the exported static batch
sizes by ``ServingModel.predict`` (XLA:TPU wants static shapes — the pad
rows are zero images with all-invalid masks, sliced off before the
response). ``--sharded`` serves through ``predict_sharded`` (the exported
module SPMD-partitioned over all local chips). A process-wide lock
serializes device calls: one TPU process, many HTTP clients.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REQUIRED = ("image_u8", "hist", "mask")


def predict_npz(model, body: bytes, sharded: bool = False) -> bytes:
    """Decode a request .npz, run the artifact, encode the response .npz.

    Raises ValueError on malformed payloads (missing arrays, wrong rank,
    mismatched batch) — mapped to HTTP 400 by the handler."""
    try:
        with np.load(io.BytesIO(body)) as z:
            arrays = {k: z[k] for k in z.files}
    except Exception as e:
        raise ValueError(f"body is not a readable .npz: {e}") from e
    missing = [k for k in REQUIRED if k not in arrays]
    if missing:
        raise ValueError(f"missing arrays in request: {missing}; "
                         f"need {list(REQUIRED)}")
    img, hist, mask = (arrays[k] for k in REQUIRED)
    if img.ndim != 4 or img.shape[-1] != 3:
        raise ValueError(f"image_u8 must be [N,H,W,3], got {img.shape}")
    if hist.ndim != 3 or mask.ndim != 2:
        raise ValueError(
            f"hist must be [N,Z,S] and mask [N,Z], got {hist.shape}, "
            f"{mask.shape}")
    if not (img.shape[0] == hist.shape[0] == mask.shape[0]):
        raise ValueError(
            f"batch mismatch: image {img.shape[0]}, hist {hist.shape[0]}, "
            f"mask {mask.shape[0]}")
    spec = model.manifest["input"]
    want_hw = tuple(spec["image_u8"][1:3])
    if tuple(img.shape[1:3]) != want_hw:
        raise ValueError(
            f"artifact expects {want_hw[0]}x{want_hw[1]} images, got "
            f"{img.shape[1]}x{img.shape[2]}")
    fn = model.predict_sharded if sharded else model.predict
    depth = fn(img, hist, mask)
    out = io.BytesIO()
    np.savez(out, depth=depth.astype(np.float32))
    return out.getvalue()


def make_server(artifact: str, port: int = 0, sharded: bool = False):
    """Build (but don't start) the HTTP server; returns it warmed up.

    Warmup runs one predict per EXPORTED batch size so no client request
    ever pays device compilation (startup is the right place for compiles;
    measured: an unwarmed bs=8 module cost its first caller ~90 s on a cold
    compile cache)."""
    from cfpnet_tpu.serve import ServingModel

    model = ServingModel(artifact)
    lock = threading.Lock()

    spec = model.manifest["input"]
    h, w = spec["image_u8"][1], spec["image_u8"][2]
    zones, s = spec["hist"][1], spec["hist"][2]
    fn = model.predict_sharded if sharded else model.predict
    for bs in model.batch_sizes:
        try:
            fn(np.zeros((bs, h, w, 3), np.uint8),
               np.full((bs, zones, s), 2.0, np.float32),
               np.ones((bs, zones), bool))
        except ValueError:
            # sharded mode uses only mesh-divisible exported sizes; requests
            # chunk through those, so the skipped size is never compiled
            if not sharded:
                raise

    class Handler(BaseHTTPRequestHandler):
        # one artifact per process; quiet request logging to stderr noise
        def log_message(self, fmt, *args):
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, b"ok", "text/plain")
            elif self.path == "/manifest":
                self._send(200, json.dumps(model.manifest).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, b"not found", "text/plain")
                return
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            try:
                with lock:  # one device at a time; HTTP threads queue here
                    out = predict_npz(model, body, sharded=sharded)
            except ValueError as e:
                self._send(400, str(e).encode(), "text/plain")
                return
            self._send(200, out, "application/octet-stream")

    server = ThreadingHTTPServer(("", port), Handler)
    server.artifact_model = model  # for tests/introspection
    return server


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--artifact", required=True,
                    help="serving artifact directory (tools/export_serving.py)")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--sharded", action="store_true",
                    help="serve via predict_sharded (DP over local devices)")
    args = ap.parse_args(argv)
    server = make_server(args.artifact, args.port, sharded=args.sharded)
    print(f"serving {args.artifact} on :{server.server_address[1]}"
          f"{' (sharded)' if args.sharded else ''}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
