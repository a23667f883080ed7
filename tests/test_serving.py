"""Serving-artifact tests: jax.export roundtrip, live-model equality,
padding/chunking, bf16, and the CLI end-to-end.

The reference has no export/deployment path (its closest surface is the
latency driver, /root/reference/evaluate_time.py:49-82) — this subsystem is
beyond-parity (PARITY.md "Beyond the reference")."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfpnet_tpu.models.deltar import make_model, model_geometries
from cfpnet_tpu.serve.export import (ServingModel, export_serving_artifact,
                                     make_serving_forward)

TINY_ARGS = [
    "--n_bins", "16", "--input_height", "48", "--input_width", "64",
    "--native_height", "64", "--native_width", "96",
    "--train_zone_num", "2", "--eval_zone_num_cfg", "2",
    "--train_patch_px", "16", "--eval_patch_px", "16",
    "--sample_uniform", "--attention_layer", "hist2image", "combine1",
    "image", "--change_embedding",
]


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """Tiny model + weights + inputs + an exported (cpu-only) artifact."""
    from cfpnet_tpu.config import parse_config

    cfg = parse_config(TINY_ARGS).replace(mode="online_eval")
    model = make_model(cfg, tiny=True)
    geoms = model_geometries(cfg, "online_eval")
    h, w = cfg.native_height, cfg.native_width
    zn = cfg.eval_zone_num
    zones, s = zn * zn, cfg.zone_sample_num

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, h, w, 3), np.uint8)
    hist = (1.0 + 2.0 * rng.random((5, zones, s))).astype(np.float32)
    mask = np.ones((5, zones), bool)
    mask[1, 0] = False  # one invalid zone exercises the mask path

    variables = jax.jit(lambda r: model.init(
        {"params": r, "fusion": jax.random.fold_in(r, 1)},
        jnp.zeros((1, h, w, 3), jnp.float32),
        jnp.asarray(hist[:1]), jnp.asarray(mask[:1]), geoms, train=False,
    ))(jax.random.key(0))
    params, batch_stats = variables["params"], variables.get("batch_stats")

    dst = str(tmp_path_factory.mktemp("artifact"))
    export_serving_artifact(cfg, params, batch_stats, dst,
                            batch_sizes=(1, 2), platforms=("cpu",),
                            tiny=True)
    return cfg, model, geoms, params, batch_stats, (img, hist, mask), dst


def test_artifact_matches_live_model(served):
    """Deserialize -> call == jitting the same forward live (same platform,
    same graph -> tight tolerance), including uint8 normalize + protocol
    post-processing."""
    cfg, model, geoms, params, batch_stats, (img, hist, mask), dst = served
    fwd = make_serving_forward(model, cfg, geoms, params, batch_stats)
    live = np.asarray(jax.jit(fwd)(img[:2], hist[:2], mask[:2]))

    m = ServingModel(dst)
    got = m.predict(img[:2], hist[:2], mask[:2])
    assert got.shape == (2, cfg.native_height, cfg.native_width)
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, live, rtol=1e-6, atol=1e-6)
    # output respects the validate-protocol clamp
    assert (got >= cfg.min_depth_eval).all() and (got <= cfg.max_depth_eval).all()


def test_artifact_matches_eval_step_semantics(served):
    """The exported computation is the eval step: same normalize (uint8
    batch), same forward, same post-processing."""
    from cfpnet_tpu.train.steps import make_eval_step

    cfg, model, geoms, params, batch_stats, (img, hist, mask), dst = served
    step = make_eval_step(model, cfg, geoms, protocol="validate")
    batch = {"image_u8": jnp.asarray(img[:1]), "hist_data": jnp.asarray(hist[:1]),
             "mask": jnp.asarray(mask[:1])}
    ref, _ = step(params, batch_stats, batch)
    got = ServingModel(dst).predict(img[:1], hist[:1], mask[:1])
    # different compiled graphs (eval step fuses metric prep differently)
    # reassociate f32 reductions: observed max |diff| ~7e-4 on the tiny net
    np.testing.assert_allclose(got, np.asarray(ref)[..., 0], rtol=1e-3,
                               atol=2e-3)


def test_padding_and_chunking(served):
    """n=5 through exported sizes {1,2}: chunked 2+2+1, padded rows never
    leak into real outputs (eval mode has no cross-batch coupling)."""
    _, _, _, _, _, (img, hist, mask), dst = served
    m = ServingModel(dst)
    full = m.predict(img, hist, mask)
    assert full.shape[0] == 5
    for i in range(5):
        one = m.predict(img[i:i + 1], hist[i:i + 1], mask[i:i + 1])
        # bs=1 and bs=2 are separately compiled modules — f32 reassociation
        # only (observed ~7e-4 max abs on the tiny net)
        np.testing.assert_allclose(full[i], one[0], rtol=1e-3, atol=2e-3)


def test_multiplatform_export_and_manifest(served, tmp_path):
    """platforms=('cpu','tpu') lowers both into ONE artifact on a CPU-only
    host (cross-platform lowering is the point of jax.export)."""
    import json

    cfg, model, geoms, params, batch_stats, (img, hist, mask), _ = served
    dst = str(tmp_path / "multi")
    export_serving_artifact(cfg, params, batch_stats, dst, batch_sizes=(1,),
                            platforms=("cpu", "tpu"), tiny=True)
    manifest = json.load(open(os.path.join(dst, "manifest.json")))
    assert manifest["platforms"] == ["cpu", "tpu"]
    got = ServingModel(dst).predict(img[:1], hist[:1], mask[:1])
    assert np.isfinite(got).all()


def test_bf16_export(served, tmp_path):
    """The guarded bf16 fast mode exports with the same numerics as running
    the bf16 forward live. (bf16-vs-f32 drift itself is a property of the
    mode, bounded on the PRODUCTION model by tests/test_bf16.py — on a
    random-init tiny net the near-uniform softmax head amplifies it, so the
    artifact-fidelity check compares same-dtype.)"""
    cfg, model, geoms, params, batch_stats, (img, hist, mask), dst = served
    bdst = str(tmp_path / "bf16")
    export_serving_artifact(cfg, params, batch_stats, bdst, batch_sizes=(1,),
                            platforms=("cpu",), compute_dtype="bfloat16",
                            tiny=True)
    live = np.asarray(jax.jit(
        make_serving_forward(model, cfg, geoms, params, batch_stats,
                             compute_dtype="bfloat16")
    )(img[:1], hist[:1], mask[:1]))
    b16 = ServingModel(bdst).predict(img[:1], hist[:1], mask[:1])
    assert np.isfinite(b16).all()
    # same graph, separately compiled: bf16-level reassociation only
    np.testing.assert_allclose(b16, live, rtol=2e-2, atol=2e-2)


def test_export_rejects_pallas(served):
    cfg, model, geoms, params, batch_stats, _, _ = served
    with pytest.raises(ValueError, match="use_pallas"):
        export_serving_artifact(cfg.replace(use_pallas=True), params,
                                batch_stats, "/tmp/nope", tiny=True)


def test_predict_sharded_matches_predict(served):
    """DP serving: the deserialized module jitted with batch-axis shardings
    over the virtual device mesh — XLA SPMD-partitions the exported
    StableHLO. The partitioned program is a separate compilation, so the
    match is f32-reassociation-tight (same bound as the artifact's other
    cross-compilation equalities; observed max ~7e-4), incl. the pad/chunk
    tail."""
    from cfpnet_tpu.parallel.mesh import make_mesh

    _, _, _, _, _, (img, hist, mask), dst = served
    m = ServingModel(dst)
    mesh = make_mesh(batch_size=m.batch_sizes[-1])  # 2 devices for bs=2
    assert mesh.devices.size > 1, "conftest provides 8 virtual devices"
    got = m.predict_sharded(img, hist, mask, mesh=mesh)
    ref = m.predict(img, hist, mask)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-3)


def test_predict_sharded_rejects_indivisible_mesh(served):
    """A mesh no exported size divides fails fast with a clear error."""
    from jax.sharding import Mesh

    _, _, _, _, _, (img, hist, mask), dst = served
    m = ServingModel(dst)
    mesh = Mesh(np.array(jax.devices()[:3]), ("data",))  # sizes are {1,2}
    with pytest.raises(ValueError, match="divisible"):
        m.predict_sharded(img, hist, mask, mesh=mesh)


def test_timed_serving_harness(served):
    """The --serving_artifact latency mode: Exported.call traces inside the
    chained-jit protocol and returns a sane positive ms figure."""
    from evaluate_time import timed_serving

    _, _, _, _, _, _, dst = served
    ms = timed_serving(dst, niters=8, batch_size=1, K=4)
    assert 0 < ms < 60_000


def test_artifact_backed_evaluation(served):
    """evaluate_all's --serving_artifact path: the metric sweep through the
    exported module equals live evaluation fed the SAME uint8 inputs
    (quantizing float-sourced images at the serving boundary is part of the
    deployed contract — a client sends raw uint8). Exercises the ragged-tail
    padding (5 samples through bs=2) and the protocol-matched metric step."""
    from evaluate_all import artifact_eval_steps
    from cfpnet_tpu.data.datasets import (IMAGENET_MEAN, IMAGENET_STD,
                                          SyntheticDataset)
    from cfpnet_tpu.data.pipeline import DataLoader
    from cfpnet_tpu.train.loop import evaluate, make_eval_steps

    cfg, model, geoms, params, batch_stats, _, dst = served
    cfg2 = cfg.replace(dataset_eval="synthetic", eval_bs=2)
    base = SyntheticDataset(cfg2, "online_eval", length=5)

    class U8Dataset:
        """Synthetic eval samples shipped as raw uint8 (the serving input)."""

        def __len__(self):
            return len(base)

        def __getitem__(self, i):
            s = dict(base[i])
            raw = s.pop("image") * IMAGENET_STD + IMAGENET_MEAN
            s["image_u8"] = np.clip(
                np.round(raw * 255.0), 0, 255).astype(np.uint8)
            return s

    loader = DataLoader(U8Dataset(), 2)
    live = evaluate(model, cfg2, params, batch_stats, loader,
                    steps=make_eval_steps(model, cfg2, loader,
                                          protocol="validate"))
    got = evaluate(model, cfg2, None, None, loader,
                   steps=artifact_eval_steps(cfg2, loader, dst))
    assert set(got) == set(live) and live
    for k in live:
        np.testing.assert_allclose(got[k], live[k], rtol=1e-2, atol=5e-3,
                                   err_msg=k)


def test_artifact_backed_evaluation_rejects_missing_bs(served):
    from evaluate_all import artifact_eval_steps
    from cfpnet_tpu.data.datasets import SyntheticDataset
    from cfpnet_tpu.data.pipeline import DataLoader

    cfg, _, _, _, _, _, dst = served
    loader = DataLoader(SyntheticDataset(cfg, "online_eval", length=3), 3)
    with pytest.raises(ValueError, match="eval_bs"):
        artifact_eval_steps(cfg, loader, dst)


def test_evaluate_all_serving_artifact_cli(served, tmp_path, monkeypatch):
    """python evaluate_all.py ... --serving_artifact D on synthetic eval:
    metrics + results.csv/xlsx written without touching any checkpoint."""
    import evaluate_all as ea

    _, _, _, _, _, _, dst = served
    monkeypatch.setattr(sys, "argv", [
        "evaluate_all.py", *TINY_ARGS, "--tiny_model",
        "--test_dataset", "synthetic", "--synthetic_length", "3",
        "--serving_artifact", dst, "--save_dir", str(tmp_path),
    ])
    ea.main()
    csv_path = tmp_path / "results.csv"
    assert csv_path.exists()
    rows = csv_path.read_text().strip().splitlines()
    assert rows[1].startswith("artifact,")


def test_http_endpoint(served):
    """tools/serve_http.py: warmup, /healthz, /manifest, binary .npz
    /predict (response == ServingModel.predict), and 400 on malformed
    payloads — the stdlib deployment endpoint over an artifact."""
    import io
    import json as jsonlib
    import threading
    import urllib.request
    from urllib.error import HTTPError

    from tools.serve_http import make_server

    _, _, _, _, _, (img, hist, mask), dst = served
    server = make_server(dst, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        assert urllib.request.urlopen(f"{base}/healthz").read() == b"ok"
        manifest = jsonlib.loads(
            urllib.request.urlopen(f"{base}/manifest").read())
        assert manifest["format"] == "cfpnet-serving-v1"

        buf = io.BytesIO()
        np.savez(buf, image_u8=img[:3], hist=hist[:3], mask=mask[:3])
        req = urllib.request.Request(
            f"{base}/predict", data=buf.getvalue(), method="POST",
            headers={"Content-Type": "application/octet-stream"})
        with np.load(io.BytesIO(urllib.request.urlopen(req).read())) as z:
            depth = z["depth"]
        ref = ServingModel(dst).predict(img[:3], hist[:3], mask[:3])
        np.testing.assert_array_equal(depth, ref)

        bad = urllib.request.Request(
            f"{base}/predict", data=b"not an npz", method="POST")
        with pytest.raises(HTTPError) as ei:
            urllib.request.urlopen(bad)
        assert ei.value.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_cli_end_to_end(tmp_path):
    """tools/export_serving.py --random_init --tiny -> loadable artifact."""
    dst = str(tmp_path / "cli_artifact")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv=['export_serving.py','--random_init','--tiny',"
        f"'--dst',{dst!r},'--serve_platforms','cpu'] + {TINY_ARGS!r};"
        "from tools.export_serving import main; main(sys.argv[1:])"
    )
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   timeout=600)
    m = ServingModel(dst)
    h, w = m.manifest["input"]["image_u8"][1:3]
    zones, s = m.manifest["input"]["hist"][1:3]
    out = m.predict(np.zeros((1, h, w, 3), np.uint8),
                    np.full((1, zones, s), 2.0, np.float32),
                    np.ones((1, zones), bool))
    assert out.shape == (1, h, w) and np.isfinite(out).all()


# ---- measured-geometry artifacts (ZJUL5 rigs) -------------------------------

def _fabricate_zju_tree(root, H=64, W=96, zn=2, px=16, off_y=6, off_x=-4,
                        n_files=2, seed=11):
    """Tiny ZJUL5-format capture tree with a deliberately OFF-CENTER rig:
    the measured ``fr`` rects differ from the config-derived centered grid,
    so geometry provenance is observable."""
    import json

    import h5py

    rng = np.random.default_rng(seed)
    root.mkdir(parents=True, exist_ok=True)
    sy = int((H - px * zn) / 2) + off_y
    sx = int((W - px * zn) / 2) + off_x
    fr = np.asarray(
        [[sy + i * px, sx + j * px, sy + (i + 1) * px, sx + (j + 1) * px]
         for i in range(zn) for j in range(zn)], np.float32)
    names = []
    for i in range(n_files):
        with h5py.File(root / f"cap{i}.h5", "w") as f:
            f["rgb"] = (rng.random((H, W, 3)) * 255).astype(np.uint8)
            f["depth"] = rng.uniform(0.3, 8.0, (H, W)).astype(np.float32)
            f["hist_data"] = np.stack(
                [rng.uniform(0.5, 3.5, zn * zn),
                 rng.uniform(0.05, 0.3, zn * zn)], axis=1).astype(np.float32)
            f["fr"] = fr
            f["mask"] = np.ones(zn * zn, bool)
        names.append({"filename": f"cap{i}.h5"})
    (root / "data.json").write_text(json.dumps({"test": names}))


def test_manifest_records_geometry(served):
    """Every artifact records its baked zone geometry (source + per-scale
    ScaleGeometry fields) for pre-deployment validation."""
    from cfpnet_tpu.serve.export import geometry_dict

    cfg, _, geoms, _, _, _, dst = served
    man = ServingModel(dst).manifest
    assert man["geometry"]["source"] == "config"
    assert man["geometry"]["zone_num"] == cfg.eval_zone_num
    assert man["geometry"]["scales"] == geometry_dict(geoms)


def test_measured_geometry_export(tmp_path):
    """The export CLI reads a ZJUL5 dataset's measured ``fr`` rects and bakes
    THAT geometry into the artifact (like the live eval driver,
    train/loop.py:52-54); the artifact matches the live eval step running on
    the measured geometry."""
    import tools.export_serving as tex
    from cfpnet_tpu.config import parse_config
    from cfpnet_tpu.data.datasets import ZJUL5Dataset
    from cfpnet_tpu.data.pipeline import collate
    from cfpnet_tpu.serve.export import geometry_dict
    from cfpnet_tpu.train.steps import make_eval_step

    d = tmp_path / "zju"
    _fabricate_zju_tree(d)
    zflags = ["--dataset_eval", "zjuL5", "--data_path_eval", str(d),
              "--filenames_file_eval", str(d / "data.json")]
    dst = str(tmp_path / "artifact")
    tex.main(["--random_init", "--tiny", "--dst", dst,
              "--serve_platforms", "cpu"] + TINY_ARGS + zflags)

    cfg = parse_config(TINY_ARGS + zflags).replace(mode="online_eval")
    ds = ZJUL5Dataset(cfg)
    man = ServingModel(dst).manifest
    assert man["geometry"]["source"] == "measured:zjuL5"
    assert man["geometry"]["scales"] == geometry_dict(ds.scale_geoms)
    # the off-center rig genuinely differs from the config grid
    assert man["geometry"]["scales"] != geometry_dict(
        model_geometries(cfg, "online_eval"))

    # artifact == live eval step on the measured geometry (same params: the
    # CLI's --random_init derives them deterministically from config.seed)
    model = make_model(cfg, tiny=True)
    h, w = cfg.native_height, cfg.native_width
    zn = next(iter(ds.scale_geoms.values())).zone_num
    variables = jax.jit(lambda r: model.init(
        {"params": r, "fusion": jax.random.fold_in(r, 1)},
        jnp.zeros((1, h, w, 3), jnp.float32),
        jnp.full((1, zn * zn, cfg.zone_sample_num), 2.0, jnp.float32),
        jnp.ones((1, zn * zn), bool), ds.scale_geoms, train=False,
    ))(jax.random.key(cfg.seed))
    step = make_eval_step(model, cfg, ds.scale_geoms, protocol="validate")
    batch = collate([ds[0]])
    ref, _ = step(variables["params"], variables.get("batch_stats"), batch)
    got = ServingModel(dst).predict(batch["image_u8"], batch["hist_data"],
                                    batch["mask"])
    # separately compiled graphs: f32 reassociation tolerance (as elsewhere)
    np.testing.assert_allclose(got, np.asarray(ref)[..., 0],
                               rtol=1e-3, atol=2e-3)


def test_artifact_geometry_mismatch_rejected(served, tmp_path):
    """Evaluating a measured-rig dataset through a config-geometry artifact
    fails loudly (a silent run would mis-place every zone)."""
    from evaluate_all import artifact_eval_steps
    from cfpnet_tpu.data.pipeline import make_loader

    cfg, *_, dst = served  # artifact exported with config geometry
    d = tmp_path / "zju"
    _fabricate_zju_tree(d)
    zcfg = cfg.replace(dataset_eval="zjuL5", data_path_eval=str(d),
                       filenames_file_eval=str(d / "data.json"))
    loader = make_loader(zcfg, "online_eval")
    with pytest.raises(ValueError, match="zone geometry"):
        artifact_eval_steps(zcfg, loader, dst)


def test_http_micro_batching(served):
    """Concurrent /predict requests coalesce into batched device calls via
    the MicroBatcher (one dispatcher thread owns the device); every client
    still gets exactly its own rows back."""
    import io
    import threading
    import urllib.request

    from tools.serve_http import make_server

    _, _, _, _, _, (img, hist, mask), dst = served
    # generous window: all 5 requests (launched together) join batch #1
    server = make_server(dst, port=0, batch_wait_ms=1000.0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    n = 5
    results = [None] * n

    def one(i):
        buf = io.BytesIO()
        np.savez(buf, image_u8=img[i:i + 1], hist=hist[i:i + 1],
                 mask=mask[i:i + 1])
        req = urllib.request.Request(
            f"{base}/predict", data=buf.getvalue(), method="POST")
        with np.load(io.BytesIO(urllib.request.urlopen(req).read())) as z:
            results[i] = z["depth"]

    try:
        threads = [threading.Thread(target=one, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        m = ServingModel(dst)
        for i in range(n):
            assert results[i] is not None, f"request {i} never answered"
            ref = m.predict(img[i:i + 1], hist[i:i + 1], mask[i:i + 1])
            # coalesced rows may run through a different exported batch size
            # than a lone predict -> f32 reassociation tolerance (as in
            # test_padding_and_chunking)
            np.testing.assert_allclose(results[i], ref, rtol=1e-3, atol=2e-3)
        assert server.batcher.rows_run >= n
        assert server.batcher.batches_run < n, (
            f"no coalescing: {server.batcher.batches_run} batches for {n} "
            "concurrent single-row requests")
    finally:
        server.shutdown()
        server.server_close()
        server.batcher.close()


# ---- MicroBatcher unit tests (no device, fake predict_fn) -------------------

def _mb_inputs(n, v, zones=4, s=3, h=4, w=6):
    img = np.full((n, h, w, 3), v, np.uint8)
    hist = np.full((n, zones, s), float(v), np.float32)
    mask = np.ones((n, zones), bool)
    return img, hist, mask


def test_microbatcher_slices_mixed_sizes():
    """Concurrent submits of different batch sizes coalesce into one call and
    each caller gets exactly its own rows back, in its own order."""
    import threading

    from tools.serve_http import MicroBatcher

    calls = []

    def fake_predict(img, hist, mask):
        calls.append(int(img.shape[0]))
        # depth row i = mean of image row i: identifies provenance exactly
        return img.astype(np.float32).mean(axis=(1, 2, 3))

    mb = MicroBatcher(fake_predict, max_rows=8, max_wait_s=0.25)
    try:
        sizes = {0: 1, 1: 3, 2: 2}
        results = {}

        def one(i):
            results[i] = mb.submit(*_mb_inputs(sizes[i], v=10 * (i + 1)))

        threads = [threading.Thread(target=one, args=(i,)) for i in sizes]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        for i, n in sizes.items():
            np.testing.assert_array_equal(
                results[i], np.full(n, 10.0 * (i + 1), np.float32))
        assert mb.rows_run == 6
        assert mb.batches_run < 3, f"no coalescing: {calls}"
    finally:
        mb.close()


def test_microbatcher_error_isolated_to_batch():
    """A predict failure poisons only the requests in that batch; the
    dispatcher survives and later submits succeed."""
    from tools.serve_http import MicroBatcher

    def fake_predict(img, hist, mask):
        if (img == 66).any():
            raise RuntimeError("boom")
        return np.zeros(img.shape[0], np.float32)

    # max_wait 0: each submit runs as its own batch (strict serialization)
    mb = MicroBatcher(fake_predict, max_rows=8, max_wait_s=0.0)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            mb.submit(*_mb_inputs(2, v=66))
        out = mb.submit(*_mb_inputs(1, v=5))
        np.testing.assert_array_equal(out, np.zeros(1, np.float32))
        assert mb.batches_run == 1 and mb.rows_run == 1
    finally:
        mb.close()


def test_microbatcher_close_joins_dispatcher():
    from tools.serve_http import MicroBatcher

    mb = MicroBatcher(lambda i, h, m: np.zeros(i.shape[0], np.float32),
                      max_rows=4, max_wait_s=0.0)
    mb.submit(*_mb_inputs(1, v=1))
    mb.close()
    assert not mb._thread.is_alive()
