"""On-device (jitted) ToF simulation vs the host numpy path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfpnet_tpu.data import tof_sim
from cfpnet_tpu.data import tof_sim_jax as tsj
from cfpnet_tpu.data.geometry import ZoneGeometry
from tests.conftest import synthetic_depth


@pytest.fixture
def geom():
    return ZoneGeometry(img_h=96, img_w=128, zone_num=4, patch_px_h=16, patch_px_w=16)


def test_get_hist_jax_matches_host(rng, geom):
    depths = np.stack([synthetic_depth(np.random.default_rng(s), 96, 128)
                       for s in range(3)])
    fh_j, mask_j = tsj.get_hist_jax(jnp.asarray(depths), geom, 4.0)
    for b in range(3):
        fh_h, _, mask_h = tof_sim.get_hist(depths[b], geom, 4.0)
        np.testing.assert_array_equal(np.asarray(mask_j[b]), mask_h)
        np.testing.assert_allclose(np.asarray(fh_j[b]), fh_h, rtol=1e-4, atol=1e-5)


def test_strongest_cluster_jax(rng):
    hist = (rng.random((10, 50)) < 0.3).astype(np.float32) * rng.integers(
        1, 30, (10, 50)
    ).astype(np.float32)
    ours = np.asarray(tsj.strongest_cluster_jax(jnp.asarray(hist)))
    ref = tof_sim.strongest_cluster(hist)
    np.testing.assert_array_equal(ours, ref)


def test_sample_points_jax_matches_host(rng):
    fh = np.stack([rng.uniform(0.5, 3.5, 8), rng.uniform(0.05, 0.3, 8)], -1).astype(
        np.float32
    )[None]
    mask = (rng.random(8) < 0.7)[None]
    ours = np.asarray(tsj.sample_points_jax(jnp.asarray(fh), jnp.asarray(mask), 16))
    ref = tof_sim.sample_points(fh[0], mask[0], 16, sample_uniform=True)
    np.testing.assert_allclose(ours[0], ref, rtol=1e-5, atol=1e-6)


def test_device_preprocess_shapes_and_determinism(geom, rng):
    depths = np.stack([synthetic_depth(np.random.default_rng(s), 96, 128)
                       for s in range(2)])
    img = rng.random((2, 96, 128, 3)).astype(np.float32)
    out = tsj.device_preprocess(
        jnp.asarray(img), jnp.asarray(depths), jax.random.key(0), geom,
        drop_hist=0.34, noise_prob=0.3, noise_mean=0.17, noise_sigma=0.2,
        train=True,
    )
    assert out["image"].shape == (2, 96, 128, 3)
    assert out["hist_data"].shape == (2, 16, 16)
    assert out["mask"].shape == (2, 16)
    out2 = tsj.device_preprocess(
        jnp.asarray(img), jnp.asarray(depths), jax.random.key(0), geom,
        drop_hist=0.34, noise_prob=0.3, noise_mean=0.17, noise_sigma=0.2,
        train=True,
    )
    np.testing.assert_array_equal(np.asarray(out["image"]), np.asarray(out2["image"]))

    # eval mode: no aug, hist matches the host path exactly
    oute = tsj.device_preprocess(
        jnp.asarray(img), jnp.asarray(depths), jax.random.key(1), geom, train=False
    )
    fh_h, _, mask_h = tof_sim.get_hist(depths[0], geom, 4.0)
    pts = tof_sim.sample_points(fh_h, mask_h, 16, True)
    np.testing.assert_allclose(np.asarray(oute["hist_data"][0]), pts, rtol=1e-4,
                               atol=1e-5)
