#!/usr/bin/env python
"""Export a trained checkpoint as a self-contained serving artifact.

    python tools/export_serving.py @configs/train_cfpnet_combine1.txt \
        --weight_path weights/<name>/best --dst artifacts/cfpnet \
        [--serve_batch_sizes 1 8] [--serve_protocol validate] \
        [--serve_platforms cpu tpu] [--random_init] [--tiny]

Everything not listed above (flags or @argfiles) is forwarded to the config
parser, so the same argfile that trained the model describes the export.
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

    import jax

    from cfpnet_tpu.models.deltar import make_model, model_geometries
    from cfpnet_tpu.serve.export import export_serving_artifact

    if args.weight_path and not args.random_init:
        from cfpnet_tpu.train.checkpoint import load_weights

        payload = load_weights(args.weight_path)
        params, batch_stats = payload["params"], payload.get("batch_stats")
    elif args.random_init:
        import jax.numpy as jnp

        ecfg = config.replace(mode="online_eval")
        model = make_model(ecfg, tiny=args.tiny)
        geoms = model_geometries(ecfg, "online_eval")
        h, w = ecfg.native_height, ecfg.native_width
        zn = ecfg.eval_zone_num
        variables = jax.jit(lambda r: model.init(
            {"params": r, "fusion": jax.random.fold_in(r, 1)},
            jnp.zeros((1, h, w, 3), jnp.float32),
            jnp.full((1, zn * zn, ecfg.zone_sample_num), 2.0, jnp.float32),
            jnp.ones((1, zn * zn), bool), geoms, train=False,
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
    )
    print(f"serving artifact written: {mpath}")


if __name__ == "__main__":
    main(sys.argv[1:])
