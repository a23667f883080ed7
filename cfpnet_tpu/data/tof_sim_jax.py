"""On-device (jitted) ToF simulation + train-time augmentation.

The reference runs its entire preprocessing on host CPUs across 12 worker
processes (SURVEY.md §2.1); here the post-decode pipeline — crop, flip,
photometric augmentation, ImageNet normalization, zone histogramming,
strongest-cluster selection, moment fitting, hist dropout/noise, point
sampling — is ONE jitted XLA program over the whole batch, so augmentation
runs on the TPU and the host only decodes images.

Numerics match ``tof_sim.py`` (and the reference semantics it mirrors):
- histc: values in [0, max], right-closed last bin;
- noise floor 20 subtracted after zeroing bin 0;
- largest contiguous non-zero cluster, first-max ties (argmax);
- moments with the 1e-9 regularizers;
- uniform mu±3sigma point expansion.

Shape-static throughout: histograms via flat scatter-add, cluster runs via
cumsum run-ids + a second scatter-add, ties via argmax. Z<=64, bins<=100 —
these are tiny on-device ops fused into the input pipeline.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import ZoneGeometry
from .tof_sim import BIN_WIDTH, NOISE_FLOOR

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def _zone_patches(depth: jnp.ndarray, geom: ZoneGeometry) -> jnp.ndarray:
    """[B,H,W] -> [B, Z, patch_px] zone pixel groups (static slices)."""
    zn, ph, pw = geom.zone_num, geom.patch_px_h, geom.patch_px_w
    region = depth[:, geom.sy_px : geom.sy_px + ph * zn,
                   geom.sx_px : geom.sx_px + pw * zn]
    B = region.shape[0]
    z = region.reshape(B, zn, ph, zn, pw).transpose(0, 1, 3, 2, 4)
    return z.reshape(B, zn * zn, ph * pw)


@functools.partial(jax.jit, static_argnames=("geom", "max_distance"))
def zone_histograms_jax(depth: jnp.ndarray, geom: ZoneGeometry,
                        max_distance: float = 4.0) -> jnp.ndarray:
    """[B,H,W] depth -> [B,Z,bins] float32 histograms (histc semantics)."""
    bins = int(max_distance / BIN_WIDTH)
    patches = _zone_patches(depth, geom)  # [B, Z, P]
    idx = jnp.minimum(jnp.floor(patches / BIN_WIDTH).astype(jnp.int32), bins - 1)
    valid = ((patches >= 0.0) & (patches <= max_distance)).astype(jnp.float32)
    B, Z, P = patches.shape

    def one(idx_z, val_z):  # [P] -> [bins]
        return jnp.zeros((bins,), jnp.float32).at[idx_z].add(val_z)

    return jax.vmap(jax.vmap(one))(idx, valid)


def strongest_cluster_jax(hist: jnp.ndarray) -> jnp.ndarray:
    """[..., bins] keep only the largest contiguous non-zero run
    (first-max ties)."""
    bins = hist.shape[-1]
    nz = hist > 0
    prev = jnp.pad(nz[..., :-1], [(0, 0)] * (nz.ndim - 1) + [(1, 0)])
    starts = nz & ~prev
    run_id = jnp.cumsum(starts, axis=-1) * nz  # 0 = no run

    flat = hist.reshape(-1, bins)
    rid = run_id.reshape(-1, bins)

    def sums(h, r):  # [bins] -> [bins+1] per-run sums
        return jnp.zeros((bins + 1,), h.dtype).at[r].add(h)

    run_sums = jax.vmap(sums)(flat, rid)
    best = jnp.argmax(run_sums[:, 1:], axis=-1) + 1
    keep = rid == best[:, None]
    return jnp.where(keep, flat, 0.0).reshape(hist.shape)


@functools.partial(jax.jit, static_argnames=("geom", "max_distance"))
def get_hist_jax(depth: jnp.ndarray, geom: ZoneGeometry,
                 max_distance: float = 4.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B,H,W] -> (fh [B,Z,2] mu/sigma, mask [B,Z])."""
    bins = int(max_distance / BIN_WIDTH)
    hist = zone_histograms_jax(depth, geom, max_distance)
    hist = hist.at[..., 0].set(0.0)
    hist = jnp.clip(hist - NOISE_FLOOR, 0.0, None)
    hist = strongest_cluster_jax(hist)

    centers = (jnp.arange(bins, dtype=jnp.float32) + 0.5) * BIN_WIDTH
    n = hist.sum(axis=-1)
    mask = n > 0
    mu = (hist * centers).sum(axis=-1) / (n + 1e-9)
    var = (hist * (centers - mu[..., None]) ** 2).sum(axis=-1) / (n + 1e-9)
    sigma = jnp.sqrt(var) + 1e-9
    return jnp.stack([mu, sigma], axis=-1), mask


def sample_points_jax(fh: jnp.ndarray, mask: jnp.ndarray,
                      zone_sample_num: int,
                      sample_uniform: bool = True) -> jnp.ndarray:
    """Expand per-zone (mu, sigma) to depth samples; [B,Z,2] -> [B,Z,n];
    invalid zones zero. Both reference modes
    (/root/reference/src/utils/dataloader.py:65-80):

    - ``sample_uniform``: linspace over mu±3sigma (production configs);
    - else (the parser DEFAULT): Gaussian inverse-CDF at evenly spaced
      quantiles [1e-3, 1-1e-3]. The quantile grid is static per
      ``zone_sample_num``, so Phi^-1 is evaluated once at trace time (f64,
      host) and baked into the graph as a constant — the on-device work is
      just the mu + sigma*z affine map.
    """
    mu, sg = fh[..., 0:1], fh[..., 1:2]
    if sample_uniform:
        t = jnp.linspace(0.0, 1.0, zone_sample_num)
        start, end = mu - 3.0 * sg, mu + 3.0 * sg
        pts = start * (1.0 - t) + end * t
    else:
        from .tof_sim import _std_normal_icdf_grid

        z = jnp.asarray(_std_normal_icdf_grid(zone_sample_num), jnp.float32)
        pts = mu + sg * z
    return jnp.where(mask[..., None], pts, 0.0)


def augment_hist_jax(fh, mask, rng, drop_hist: float, noise_prob: float,
                     noise_mean: float, noise_sigma: float):
    """Train-time zone dropout + mu noise (reference nyu.py:155-163).

    The reference draws ``m = int(n_valid * drop_hist)`` zone indices WITH
    replacement (np.random.choice default), so the effective per-zone drop
    probability is ``p_eff = 1 - (1 - 1/n)^m`` (~28.8% for p=0.34, n=64 —
    NOT 34%). Dropping i.i.d. Bernoulli(p_eff) per valid zone reproduces
    that marginal exactly at static shape; the host path
    (tof_sim.augment_hist) replicates the reference draw literally, and
    tests/test_aug_equivalence.py pins the two marginals against each
    other."""
    k1, k2, k3 = jax.random.split(rng, 3)
    if drop_hist > 1e-3:
        n_int = mask.sum(axis=-1, keepdims=True)
        # the reference computes the draw count int(n * drop_hist) in f64; a
        # f32 product can round ACROSS the integer boundary (e.g. p=0.58,
        # n=50: f64 floor = 28, f32 floor = 29). n is bounded by the static
        # zone count, so bake the exact-f64 table in and index it.
        m_table = jnp.asarray(
            np.floor(np.arange(mask.shape[-1] + 1) * np.float64(drop_hist)),
            jnp.float32,
        )
        m = m_table[n_int]
        n = n_int.astype(jnp.float32)
        p_eff = jnp.where(
            n > 0, 1.0 - (1.0 - 1.0 / jnp.maximum(n, 1.0)) ** m, 0.0
        )
        keep = jax.random.uniform(k1, mask.shape) >= p_eff
        mask = mask & keep
    if noise_prob > 1e-3:
        hit = jax.random.uniform(k2, mask.shape) < noise_prob
        noise = noise_mean + noise_sigma * jax.random.normal(k3, mask.shape)
        mu = fh[..., 0] + jnp.where(hit & mask, noise, 0.0)
        fh = fh.at[..., 0].set(mu)
    return fh, mask


def photometric_augment_jax(img: jnp.ndarray, rng) -> jnp.ndarray:
    """Gamma/brightness/color augmentation on [B,H,W,3] 0..1 images
    (reference nyu.py:229-245), applied with p=0.5 per sample."""
    B = img.shape[0]
    k0, k1, k2, k3 = jax.random.split(rng, 4)
    do = (jax.random.uniform(k0, (B, 1, 1, 1)) > 0.5).astype(img.dtype)
    gamma = jax.random.uniform(k1, (B, 1, 1, 1), minval=0.9, maxval=1.1)
    bright = jax.random.uniform(k2, (B, 1, 1, 1), minval=0.75, maxval=1.25)
    colors = jax.random.uniform(k3, (B, 1, 1, 3), minval=0.9, maxval=1.1)
    aug = jnp.clip((img ** gamma) * bright * colors, 0.0, 1.0)
    return do * aug + (1.0 - do) * img


@functools.partial(
    jax.jit,
    static_argnames=("geom", "max_distance", "zone_sample_num", "drop_hist",
                     "noise_prob", "noise_mean", "noise_sigma", "train",
                     "sample_uniform"),
)
def device_preprocess(
    img: jnp.ndarray,  # [B,H,W,3] 0..1 (already decoded/cropped on host)
    depth: jnp.ndarray,  # [B,H,W]
    rng,
    geom: ZoneGeometry,
    max_distance: float = 4.0,
    zone_sample_num: int = 16,
    drop_hist: float = 0.0,
    noise_prob: float = 0.0,
    noise_mean: float = 0.0,
    noise_sigma: float = 0.0,
    train: bool = True,
    sample_uniform: bool = True,
):
    """Fused on-device tail of the data pipeline: flip + photometric aug +
    normalize + ToF sim + hist aug + point sampling, one XLA program.

    ``img`` may arrive as uint8 (the NYU loader ships raw crops — the
    source data is uint8 even after the PIL rotate, so this is exact and
    4x less host->device traffic) or as f32 in 0..1."""
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    k_flip, k_phot, k_hist = jax.random.split(rng, 3)
    if train:
        B = img.shape[0]
        flip = jax.random.uniform(k_flip, (B, 1, 1, 1)) > 0.5
        img = jnp.where(flip, img[:, :, ::-1, :], img)
        depth = jnp.where(flip[..., 0], depth[:, :, ::-1], depth)
        img = photometric_augment_jax(img, k_phot)
    norm = (img - IMAGENET_MEAN) / IMAGENET_STD
    fh, mask = get_hist_jax(depth, geom, max_distance)
    if train:
        fh, mask = augment_hist_jax(
            fh, mask, k_hist, drop_hist, noise_prob, noise_mean, noise_sigma
        )
    pts = sample_points_jax(fh, mask, zone_sample_num, sample_uniform)
    return dict(image=norm, depth=depth[..., None], hist_data=pts, mask=mask)
