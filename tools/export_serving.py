#!/usr/bin/env python
"""Export a trained checkpoint as a self-contained serving artifact.

    python tools/export_serving.py @configs/train_cfpnet_combine1.txt \
        --weight_path weights/<name>/best --dst artifacts/cfpnet \
        [--serve_batch_sizes 1 8] [--serve_protocol validate] \
        [--serve_platforms cpu tpu] [--random_init] [--tiny]

Everything not listed above (flags or @argfiles) is forwarded to the config
parser, so the same argfile that trained the model describes the export.
Passing ``--test_dataset zjuL5`` (plus the ZJU data paths, or relying on the
eval driver's defaults) applies the same dataset overrides as evaluate_all
AND bakes the rig's MEASURED zone geometry (the h5 ``fr`` rects) into the
artifact instead of the config grid — the manifest records the geometry and
``evaluate_all --serving_artifact`` refuses to run a dataset whose geometry
does not match it.
The artifact directory (StableHLO modules with the weights baked in +
manifest.json) is the complete deployable unit — serving hosts need jax but
not flax, not this repo's model code, and no checkpoint. See
cfpnet_tpu/serve/export.py.

The reference has no deployment/export story (its closest driver is the
latency loop, /root/reference/evaluate_time.py:49-82) — this is a
beyond-parity capability, PARITY.md "Beyond the reference".
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--weight_path", default="",
                    help="orbax weights checkpoint (as written by training "
                         "or the torch importer); omit with --random_init")
    ap.add_argument("--random_init", action="store_true",
                    help="export randomly initialized weights (smoke tests)")
    ap.add_argument("--dst", required=True, help="artifact output directory")
    ap.add_argument("--serve_batch_sizes", type=int, nargs="+", default=[1])
    ap.add_argument("--serve_protocol", default="validate",
                    choices=["validate", "evaluate_all"])
    ap.add_argument("--serve_platforms", nargs="+", default=["cpu", "tpu"])
    ap.add_argument("--tiny", action="store_true")
    args, config_args = ap.parse_known_args(argv)

    from cfpnet_tpu.config import parse_config

    config = parse_config(config_args)
    # same dataset-specific overrides as the eval driver (reference
    # evaluate_all.py:99-109) — but only when --test_dataset is EXPLICIT:
    # its default is 'zjuL5' (reference src/config.py:86) and a bare export
    # must not silently acquire the ZJU data paths
    if any(a.startswith(("--test_dataset", "--test-dataset"))
           for a in config_args):
        if "zjuL5" in config.test_dataset:
            from evaluate_all import zju_overrides

            config = zju_overrides(config)
        elif "synthetic" in config.test_dataset:
            config = config.replace(dataset_eval="synthetic")
        elif "nyu" in config.test_dataset:
            config = config.replace(dataset_eval="nyu")
    config = config.replace(mode="online_eval")

    # measured sensor geometry: a ZJUL5 deployment serves the real rig's
    # zone-to-pixel rects (h5 ``fr``), not the config grid — read them from
    # the eval dataset exactly like the live driver (train/loop.py:52-54)
    # and bake them into the artifact. Loud failure if the data is absent:
    # silently exporting the config grid would mis-place every zone.
    geoms, geometry_source = None, "config"
    if config.dataset_eval == "zjuL5":
        from cfpnet_tpu.data.datasets import ZJUL5Dataset

        ds = ZJUL5Dataset(config)
        if ds.scale_geoms is None:
            raise SystemExit(
                f"{config.filenames_file_eval}: empty ZJUL5 sample list — "
                "cannot derive the rig's measured zone geometry")
        geoms, geometry_source = ds.scale_geoms, "measured:zjuL5"

    import jax

    from cfpnet_tpu.models.deltar import make_model, model_geometries
    from cfpnet_tpu.serve.export import export_serving_artifact

    if args.weight_path and not args.random_init:
        from cfpnet_tpu.train.checkpoint import load_weights

        payload = load_weights(args.weight_path)
        params, batch_stats = payload["params"], payload.get("batch_stats")
    elif args.random_init:
        import jax.numpy as jnp

        ecfg = config
        model = make_model(ecfg, tiny=args.tiny)
        igeoms = geoms if geoms is not None else model_geometries(
            ecfg, "online_eval")
        h, w = ecfg.native_height, ecfg.native_width
        zn = next(iter(igeoms.values())).zone_num
        variables = jax.jit(lambda r: model.init(
            {"params": r, "fusion": jax.random.fold_in(r, 1)},
            jnp.zeros((1, h, w, 3), jnp.float32),
            jnp.full((1, zn * zn, ecfg.zone_sample_num), 2.0, jnp.float32),
            jnp.ones((1, zn * zn), bool), igeoms, train=False,
        ))(jax.random.key(config.seed))
        params, batch_stats = variables["params"], variables.get("batch_stats")
    else:
        ap.error("provide --weight_path or --random_init")

    mpath = export_serving_artifact(
        config, params, batch_stats, args.dst,
        batch_sizes=args.serve_batch_sizes,
        protocol=args.serve_protocol,
        platforms=args.serve_platforms,
        tiny=args.tiny,
        geoms=geoms,
        geometry_source=geometry_source,
    )
    print(f"serving artifact written: {mpath}")


if __name__ == "__main__":
    main(sys.argv[1:])
