"""SelfToF-style self-supervised training: photometric warping + pose branch.

Self-supervised objective on video pairs (BASELINE.json configs[4]):

  loss = min(reproj(warped_src, target), reproj(src, target))   # automask
       + smoothness_weight * edge-aware smoothness
       + zone_loss_weight  * ToF zone-mean consistency

The ToF zone term anchors metric scale: the per-zone mean of the predicted
depth must match the sensor's per-zone histogram mean (the same 8x8 zone
geometry used by the supervised path) — this is what makes a
lightweight-ToF self-supervised variant metric, unlike pure monodepth.

The depth network is the full CFPNet model; the pose branch is
``models/posenet.py``. Both train jointly in one jitted step on the
data-parallel mesh.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax.training import train_state

from ..models.posenet import PoseNet
from ..ops.interp import resize_bilinear_align_corners
from ..ops.warp import (
    photometric_loss,
    pose_to_transform,
    smoothness_loss,
    warp_frame,
)


class SelfSupState(train_state.TrainState):
    batch_stats: Any = None


def zone_mean_depth(depth_full: jnp.ndarray, geom) -> jnp.ndarray:
    """[B,H,W,1] -> [B, Z] per-zone mean depth using the pixel-level zone
    geometry (zones of patch_px size starting at (sy_px, sx_px))."""
    zn, ph, pw = geom.zone_num, geom.patch_px_h, geom.patch_px_w
    region = depth_full[:, geom.sy_px : geom.sy_px + zn * ph,
                        geom.sx_px : geom.sx_px + zn * pw, 0]
    B = region.shape[0]
    zones = region.reshape(B, zn, ph, zn, pw).transpose(0, 1, 3, 2, 4)
    return zones.reshape(B, zn * zn, ph * pw).mean(axis=-1)


def make_selfsup_train_step(depth_model, config, geoms, pixel_geom):
    """(state, batch, rng) -> (state, metrics dict).

    batch keys: image (normalized target), image_raw (0..1 target),
    src_raw (0..1 source frame), hist_data [B,Z,n], mask [B,Z],
    zone_mu [B,Z] (sensor zone means), K [B,3,3], K_inv [B,3,3].
    """
    pose_model = PoseNet()

    def train_step(state: SelfSupState, batch: Dict, rng):
        def loss_fn(params):
            (bin_edges, pred), updates = depth_model.apply(
                {"params": params["depth"], "batch_stats": state.batch_stats},
                batch["image"], batch["hist_data"], batch["mask"], geoms,
                train=True, rngs={"fusion": rng}, mutable=["batch_stats"],
            )
            H, W = batch["image"].shape[1], batch["image"].shape[2]
            depth_full = resize_bilinear_align_corners(pred, H, W)
            depth_full = jnp.clip(depth_full, config.min_depth, None)

            aa, tt = pose_model.apply(
                {"params": params["pose"]}, batch["image_raw"], batch["src_raw"]
            )
            T = pose_to_transform(aa, tt)

            warped, valid = warp_frame(
                batch["src_raw"], depth_full, batch["K"], batch["K_inv"], T
            )
            reproj = photometric_loss(warped, batch["image_raw"], config.ssim_alpha)
            # monodepth2 auto-masking: identity reprojection competes
            ident = photometric_loss(batch["src_raw"], batch["image_raw"],
                                     config.ssim_alpha)
            ph = jnp.where(reproj * valid + (1 - valid) * 1e3 < ident, reproj, ident)
            ph_loss = ph.mean()

            smooth = smoothness_loss(depth_full, batch["image_raw"])

            zmean = zone_mean_depth(depth_full, pixel_geom)
            zvalid = batch["mask"].astype(depth_full.dtype)
            zone_l = (jnp.abs(zmean - batch["zone_mu"]) * zvalid).sum() / (
                zvalid.sum() + 1e-6
            )

            loss = (
                ph_loss
                + config.smoothness_weight * smooth
                + config.zone_loss_weight * zone_l
            )
            aux = dict(
                loss=loss, photometric=ph_loss, smooth=smooth, zone=zone_l,
                updates=updates,
            )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(
            grads=grads, batch_stats=aux["updates"]["batch_stats"]
        )
        metrics = {k: v for k, v in aux.items() if k != "updates"}
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def run_selfsup_training(config, tiny: bool = False,
                         max_steps_per_epoch=None) -> SelfSupState:
    """Self-supervised training loop: mirrors run_training but with the
    joint depth+pose objective; validation reuses the supervised eval
    (metric depth thanks to the zone term)."""
    import os
    import time

    from ..data.geometry import geometry_for
    from ..data.pipeline import make_loader
    from ..models.deltar import make_model, model_geometries
    from ..parallel.mesh import make_mesh
    from .checkpoint import save_weights
    from .loop import JsonlLogger, evaluate
    from .losses import RunningAverage
    from .optim import make_optimizer

    mesh = make_mesh(config.dp_shards, batch_size=config.bs)
    model = make_model(config, tiny=tiny)
    geoms = model_geometries(config, "train")
    pixel_geom = geometry_for(config, "train")

    train_loader = make_loader(config, "train", mesh=mesh)
    eval_loader = make_loader(config, "online_eval")
    steps_per_epoch = len(train_loader)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    tx = make_optimizer(config, config.epochs * steps_per_epoch)

    first = next(iter(train_loader))
    rng = jax.random.key(config.seed)
    state = create_selfsup_state(model, config, rng, first, geoms, tx)
    train_step = make_selfsup_train_step(model, config, geoms, pixel_geom)

    logger = JsonlLogger(
        None if config.no_logging
        else os.path.join(config.save_dir, "selfsup_log.jsonl")
    )
    step, best_rmse = 0, float("inf")
    for epoch in range(config.epochs):
        t0 = time.time()
        loss_avg = RunningAverage()
        for i, batch in enumerate(train_loader):
            if max_steps_per_epoch and i >= max_steps_per_epoch:
                break
            state, m = train_step(state, batch, jax.random.fold_in(rng, step))
            loss_avg.append(float(m["loss"]))
            step += 1
        metrics = evaluate(
            model, config, state.params["depth"], state.batch_stats, eval_loader,
            protocol="validate",
        )
        rmse = metrics.get("rmse", float("inf"))
        logger.log(kind="selfsup_val", epoch=epoch, step=step,
                   loss=loss_avg.get_value(), **metrics)
        print(f"selfsup epoch {epoch}: loss {loss_avg.get_value():.4f} "
              f"rmse {rmse:.4f} ({time.time()-t0:.0f}s)")
        if not config.no_logging:
            save_weights(f"weights/{config.name}/{epoch}_{rmse:.3f}",
                         state.params["depth"], state.batch_stats)
            if rmse < best_rmse:
                best_rmse = rmse
                save_weights(f"weights/{config.name}/best",
                             state.params["depth"], state.batch_stats)
    logger.close()
    return state


def create_selfsup_state(depth_model, config, rng, batch, geoms, tx) -> SelfSupState:
    pose_model = PoseNet()
    dvars = jax.jit(
        lambda r, img, hist, mask: depth_model.init(
            {"params": r, "fusion": jax.random.fold_in(r, 1)},
            img, hist, mask, geoms, train=True,
        )
    )(rng, batch["image"], batch["hist_data"], batch["mask"])
    pvars = jax.jit(
        lambda r, a, b: pose_model.init(r, a, b)
    )(jax.random.fold_in(rng, 2), batch["image_raw"], batch["src_raw"])
    return SelfSupState.create(
        apply_fn=depth_model.apply,
        params={"depth": dvars["params"], "pose": pvars["params"]},
        batch_stats=dvars.get("batch_stats"),
        tx=tx,
    )
