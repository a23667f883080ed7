#!/usr/bin/env python
"""Epoch-sweep evaluation driver.

Surface matches the reference (/root/reference/evaluate_all.py:93-167):

    python evaluate_all.py @configs/X.txt [--selected_epoch best]
                            [--test_dataset nyu|zjuL5]

Sweeps weights/{name}/{ep}_{rmse} checkpoints (or a single
``--selected_epoch``), evaluates the full metric suite at native 480x640,
and writes ``results[_nyu].csv`` (+ ``.xlsx`` when openpyxl is available —
the reference hard-requires it; CSV is the always-on artifact).
"""

import csv
import os

import jax

from cfpnet_tpu.config import parse_config
from cfpnet_tpu.data.pipeline import make_loader
from cfpnet_tpu.models.deltar import make_model
from cfpnet_tpu.train.checkpoint import load_weights
from cfpnet_tpu.train.loop import evaluate, make_eval_steps

from cfpnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()


METRICS = ["a1", "a2", "a3", "abs_rel", "rmse", "log_10", "rmse_log", "silog", "sq_rel"]


def make_save_hook(config, dataset):
    """Per-image result dumps: colorized prediction / input RGB / error map
    PNGs into per-scene folders under ``save_dir`` — the capability behind
    the reference's --save_pred/--save_rgb/--save_error_map flags and
    per-scene folder layout (reference evaluate_all.py:47-48,59-61,71-77;
    the reference parses the flags and creates the folders but never writes
    the images — here the flags produce files). Returns None when no save
    flag is set."""
    if not (config.save_pred or config.save_rgb or config.save_error_map):
        return None
    import numpy as np
    from PIL import Image as PILImage

    from cfpnet_tpu.data.datasets import sample_image_f32
    from cfpnet_tpu.utils.vis import colorize, unnormalize

    def meta(idx):
        fn = getattr(dataset, "sample_meta", None)
        return fn(idx) if fn else ("eval", f"{idx:05d}")

    def hook(idx, pred_hw, batch, j):
        folder, name = meta(idx)
        out_dir = os.path.join(config.save_dir, folder)
        os.makedirs(out_dir, exist_ok=True)
        if config.save_pred:
            vis = colorize(pred_hw, vmin=float(pred_hw.min()),
                           vmax=float(pred_hw.max()))
            PILImage.fromarray(vis).save(
                os.path.join(out_dir, f"{name}_pred.png"))
        if config.save_rgb:
            if "image_u8" in batch:
                rgb = np.asarray(batch["image_u8"][j])
            else:
                rgb = np.clip(
                    unnormalize(sample_image_f32(
                        {k: v[j] for k, v in batch.items()
                         if k in ("image", "image_u8")})) * 255.0,
                    0, 255).astype(np.uint8)
            PILImage.fromarray(rgb).save(
                os.path.join(out_dir, f"{name}_rgb.png"))
        if config.save_error_map:
            gt = np.asarray(batch["depth"][j, ..., 0])
            err = np.abs(pred_hw - gt)
            # invalid gt rendered white (colorize's -1 convention)
            err[(gt <= config.min_depth) | (gt >= config.max_depth)] = -1
            valid = err >= 0
            vmax = float(err[valid].max()) if valid.any() else 1.0
            vis = colorize(err, vmin=0.0, vmax=max(vmax, 1e-6))
            PILImage.fromarray(vis).save(
                os.path.join(out_dir, f"{name}_error.png"))

    return hook


def artifact_eval_steps(config, loader, artifact_path):
    """(eval_step, metric_step) backed by an exported serving artifact —
    pre-deployment validation: the metric sweep runs through the EXACT
    StableHLO module that will serve (weights baked in), not live weights.

    The artifact's input contract is raw uint8 RGB (what a deployed client
    sends); float-sourced eval images (synthetic) cross the boundary
    quantized to uint8, exactly as a client would send them. The metric
    valid-mask protocol follows the artifact's baked post-processing
    protocol (manifest['protocol']) so pred handling and masking stay the
    matched reference pair (steps.make_eval_step/make_metric_step)."""
    import jax.numpy as jnp

    from cfpnet_tpu.data.datasets import IMAGENET_MEAN, IMAGENET_STD
    from cfpnet_tpu.serve import ServingModel
    from cfpnet_tpu.train.steps import make_metric_step

    m = ServingModel(artifact_path)
    man_geo = m.manifest.get("geometry")
    if man_geo is not None:
        # the artifact bakes its zone geometry in as compile-time constants;
        # evaluating a dataset whose geometry differs (measured ZJUL5 rig vs
        # the config grid, or a zone_type ablation) would silently mis-place
        # every zone — fail loudly instead
        from cfpnet_tpu.models.deltar import model_geometries
        from cfpnet_tpu.serve.export import geometry_dict

        live = getattr(getattr(loader, "dataset", None), "scale_geoms", None)
        if live is None:
            live = model_geometries(config, "online_eval")
        if geometry_dict(live) != man_geo["scales"]:
            raise ValueError(
                f"artifact zone geometry ({man_geo['source']}, "
                f"{man_geo['zone_num']}x{man_geo['zone_num']}) does not match "
                "the eval dataset's geometry — re-export with the matching "
                "--test_dataset/zone flags (tools/export_serving.py reads "
                "measured ZJUL5 rects when --test_dataset zjuL5)")
    bs = getattr(loader, "batch_size", 1)
    if bs not in m.batch_sizes:
        raise ValueError(
            f"artifact exports batch sizes {m.batch_sizes}; evaluation uses "
            f"--eval_bs {bs} — re-export with it or change --eval_bs")
    exported = m.exported(bs)
    protocol = m.manifest.get("protocol", "validate")

    def eval_step(params, batch_stats, batch):
        if "image_u8" in batch:
            img = batch["image_u8"]
        else:
            raw = batch["image"] * jnp.asarray(IMAGENET_STD) + jnp.asarray(
                IMAGENET_MEAN)
            img = jnp.clip(jnp.round(raw * 255.0), 0, 255).astype(jnp.uint8)
        pred = exported.call(img, batch["hist_data"].astype(jnp.float32),
                             batch["mask"])
        return pred[..., None], None

    return jax.jit(eval_step), make_metric_step(config, protocol=protocol)


def zju_overrides(config):
    """Dataset-specific overrides (reference evaluate_all.py:99-109)."""
    return config.replace(
        data_path_eval="data/ZJUL5",
        filenames_file_eval="data/ZJUL5/data.json",
        native_height=480,
        native_width=640,
        max_depth=10.0,
        min_depth=1e-3,
        n_bins=256,
        min_depth_eval=1e-3,
        max_depth_eval=10.0,
        zone_sample_num=16,
        dataset_eval="zjuL5",
    )


def main():
    config = parse_config().replace(mode="online_eval")
    if config.multihost:
        from cfpnet_tpu.parallel.mesh import maybe_initialize_distributed

        maybe_initialize_distributed(config)
    if "zjuL5" in config.test_dataset:
        config = zju_overrides(config)
    elif "synthetic" in config.test_dataset:
        config = config.replace(dataset_eval="synthetic")
    elif "nyu" in config.test_dataset:
        config = config.replace(dataset_eval="nyu")

    model = make_model(config)
    from cfpnet_tpu.data.datasets import make_dataset

    dataset = make_dataset(config, "online_eval")
    loader = make_loader(config, "online_eval", dataset=dataset)

    if config.serving_artifact:
        # metric sweep through the exported StableHLO module (weights baked
        # in — no checkpoint involved); one row, epoch column = 'artifact'
        steps = artifact_eval_steps(config, loader, config.serving_artifact)
        results = evaluate(
            model, config, None, None, loader, steps=steps,
            per_image_hook=make_save_hook(config, loader.dataset),
        )
        results = {k: round(v, 3) for k, v in results.items()}
        print(f"Metrics (serving artifact): {results}")
        print(",".join(str(results[m]) for m in METRICS))
        write_reports(config, [["artifact"] + [results[m] for m in METRICS]])
        return

    # one traced/jitted step pair per geometry group, reused for the whole
    # epoch sweep (a mixed-rig ZJUL5 data.json — several rect signatures —
    # sweeps in ONE invocation: one compiled graph per rig, metrics merged
    # image-weighted; reference zjuL5.py:106-135 recomputes per capture)
    from cfpnet_tpu.train.loop import make_grouped_eval

    eval_fn = make_grouped_eval(model, config, dataset, protocol="evaluate_all")
    sharded_steps = None

    rows = []
    weights_dir = os.path.join("weights", config.name)
    for ep in range(config.epochs):
        if config.selected_epoch != "-1":
            weight_path = os.path.join(weights_dir, config.selected_epoch)
        else:
            names = [
                n for n in sorted(os.listdir(weights_dir)) if n.startswith(f"{ep}_")
            ] if os.path.isdir(weights_dir) else []
            if not names:
                continue
            weight_path = os.path.join(weights_dir, names[0])

        payload = load_weights(weight_path)
        if config.shard_eval and jax.process_count() > 1:
            from cfpnet_tpu.train.loop import evaluate_sharded

            if sharded_steps is None:
                sharded_steps = make_eval_steps(model, config, loader,
                                                protocol="evaluate_all")
            results = evaluate_sharded(
                model, config, payload["params"], payload.get("batch_stats"),
                dataset, protocol="evaluate_all", steps=sharded_steps,
                per_image_hook=make_save_hook(config, dataset),
            )
        else:
            results = eval_fn(
                payload["params"], payload.get("batch_stats"),
                per_image_hook=make_save_hook(config, dataset),
            )
        results = {k: round(v, 3) for k, v in results.items()}
        print(f"Metrics: {results}")
        print(",".join(str(results[m]) for m in METRICS))
        rows.append([ep] + [results[m] for m in METRICS])
        if config.selected_epoch != "-1":
            break

    write_reports(config, rows)


def write_reports(config, rows):
    """results[_nyu].csv + .xlsx under save_dir (reference writes only xlsx,
    evaluate_all.py:113-167; CSV is the dependency-free always-on artifact)."""
    if jax.process_count() > 1 and jax.process_index() != 0:
        return  # one CSV/xlsx writer per job
    os.makedirs(config.save_dir, exist_ok=True)
    suffix = "_nyu" if "nyu" in config.test_dataset else ""
    csv_path = os.path.join(config.save_dir, f"results{suffix}.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["epoch"] + METRICS)
        w.writerows(rows)
    print(f"wrote {csv_path}")
    from cfpnet_tpu.utils.xlsx import write_xlsx

    xlsx = os.path.join(config.save_dir, f"results{suffix}.xlsx")
    write_xlsx(xlsx, [["epoch"] + METRICS] + rows)
    print(f"wrote {xlsx}")


if __name__ == "__main__":
    main()
