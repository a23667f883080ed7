"""Native C++ ToF kernel vs the vectorized numpy path (bit-level parity
within float tolerance) + a throughput sanity check."""

import os
import subprocess
import time

import numpy as np
import pytest

from cfpnet_tpu.data import tof_sim
from cfpnet_tpu.data.geometry import ZoneGeometry
from cfpnet_tpu.data.native import get_lib, native_get_hist, native_sample_uniform
from tests.conftest import synthetic_depth

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native/libtofsim.so not built (run native/build.sh)"
)


@pytest.fixture(scope="module")
def geom():
    return ZoneGeometry(img_h=480, img_w=640, zone_num=8, patch_px_h=56, patch_px_w=56)


def numpy_get_hist(depth, geom, max_d):
    hist = tof_sim.zone_histograms(depth, geom, max_d)
    hist[:, 0] = 0.0
    hist = np.clip(hist - tof_sim.NOISE_FLOOR, 0.0, None)
    hist = tof_sim.strongest_cluster(hist)
    return tof_sim.fit_moments(hist, max_d)


def test_native_matches_numpy(rng, geom):
    for seed in range(5):
        depth = synthetic_depth(np.random.default_rng(seed), 480, 640)
        fh_n, mask_n = native_get_hist(depth, geom, 4.0, 0.04, 20.0)
        fh_p, mask_p = numpy_get_hist(depth, geom, 4.0)
        np.testing.assert_array_equal(mask_n, mask_p)
        np.testing.assert_allclose(fh_n, fh_p, rtol=1e-5, atol=1e-6)


def test_native_sampling_matches(rng):
    fh = np.stack([rng.uniform(0.5, 3.5, 64), rng.uniform(0.05, 0.3, 64)], 1).astype(
        np.float32
    )
    mask = rng.random(64) < 0.7
    ours = native_sample_uniform(fh, mask, 16)
    ref = tof_sim.sample_points(fh, mask, 16, sample_uniform=True)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_native_is_faster(rng, geom):
    depth = synthetic_depth(rng, 480, 640)
    t0 = time.perf_counter()
    for _ in range(20):
        native_get_hist(depth, geom, 4.0, 0.04, 20.0)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        numpy_get_hist(depth, geom, 4.0)
    t_numpy = time.perf_counter() - t0
    # informational: assert it's at least not slower
    assert t_native < t_numpy * 1.5, (t_native, t_numpy)
