#!/usr/bin/env python
"""Single-frame demo: RGB 480x640 + 8x8 ToF zone hists -> dense depth, bs=1.

Runs the full pipeline on one frame (a real NYU frame if --rgb/--depth are
given, else a synthetic frame), prints depth statistics and writes a
colorized depth map PNG (reference 'colorize' helper, utils.py:44-64).

    python scripts/demo.py [--rgb img.jpg --depth depth.png]
                           [--weights weights/.../best] [--out demo_depth.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cfpnet_tpu.config import Config
from cfpnet_tpu.data.datasets import SyntheticDataset, normalize_image
from cfpnet_tpu.data.geometry import geometry_for
from cfpnet_tpu.data import tof_sim
from cfpnet_tpu.models.deltar import make_model, model_geometries
from cfpnet_tpu.ops.interp import resize_bilinear_align_corners
from cfpnet_tpu.utils.cache import enable_compilation_cache
from cfpnet_tpu.utils.vis import colorize

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rgb")
    ap.add_argument("--depth")
    ap.add_argument("--weights")
    ap.add_argument("--out", default="demo_depth.png")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    cfg = Config(
        n_bins=256,
        attention_layer=["hist2image", "combine1", "image",
                         "hist2image", "combine1", "image"],
        change_embedding=True, sample_uniform=True,
    )
    if args.rgb:
        from PIL import Image

        img = np.asarray(Image.open(args.rgb), np.float32) / 255.0
        dep = np.asarray(Image.open(args.depth), np.float32) / 1000.0
        geom = geometry_for(cfg, "online_eval")
        fh, _, mask = tof_sim.get_hist(dep, geom, cfg.simu_max_distance)
        pts = tof_sim.sample_points(fh, mask, cfg.zone_sample_num, True)
        sample = dict(image=normalize_image(img).astype(np.float32),
                      depth=dep[..., None], hist_data=pts, mask=mask)
    else:
        sample = SyntheticDataset(cfg, "online_eval")[0]

    model = make_model(cfg, tiny=args.tiny)
    geoms = model_geometries(cfg, "online_eval")
    from cfpnet_tpu.data.datasets import sample_image_f32

    image = jnp.asarray(sample_image_f32(sample)[None])
    hist = jnp.asarray(sample["hist_data"][None])
    mask = jnp.asarray(sample["mask"][None])

    if args.weights:
        from cfpnet_tpu.train.checkpoint import load_weights

        payload = load_weights(args.weights)
        variables = {"params": payload["params"]}
        if payload.get("batch_stats") is not None:
            variables["batch_stats"] = payload["batch_stats"]
    else:
        variables = jax.jit(
            lambda r: model.init({"params": r, "fusion": jax.random.fold_in(r, 1)},
                                 image, hist, mask, geoms, train=False)
        )(jax.random.key(0))
        print("note: random weights (pass --weights for a trained model)")

    pred = jax.jit(
        lambda v: model.apply(v, image, hist, mask, geoms, train=False)[1]
    )(variables)
    pred = resize_bilinear_align_corners(pred, image.shape[1], image.shape[2])
    pred = np.asarray(pred)[0, :, :, 0]
    print(f"pred depth: shape {pred.shape}, range [{pred.min():.3f}, "
          f"{pred.max():.3f}] m, mean {pred.mean():.3f} m")

    from PIL import Image as PILImage

    vis = colorize(pred, vmin=float(pred.min()), vmax=float(pred.max()))
    PILImage.fromarray(vis).save(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
