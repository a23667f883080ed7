"""Test fixtures.

Forces the CPU backend with 8 virtual devices (the standard JAX
fake-multi-device trick) so mesh/sharding code paths are exercised without
TPU hardware — replacing the reference's absent multi-device tests
(SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize may pre-register a TPU plugin and pin
# jax_platforms — force the CPU backend before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from cfpnet_tpu.config import Config
from cfpnet_tpu.utils.cache import enable_compilation_cache

# persistent XLA cache: the compile-heavy slow tests (full-size f64 parity,
# train-step compiles) pay their multi-minute compile once per machine
enable_compilation_cache()


@pytest.fixture
def tiny_config():
    """A config shrunk so the tiny backbone + fusion compile in seconds.

    Geometry mirrors production structure: native 64x96 with 2x2 zones of
    16x16 px (region 32x32 centered), train crop 48x64 with the same zones.
    """
    return Config(
        n_bins=16,
        input_height=48,
        input_width=64,
        native_height=64,
        native_width=96,
        train_zone_num=2,
        eval_zone_num_cfg=2,
        train_patch_px=16,
        eval_patch_px=16,
        zone_sample_num=16,
        sample_uniform=True,
        attention_layer=["hist2image", "combine1", "image"],
        change_embedding=True,
        disable_clip_grad=True,
        hist_encoder_10x=True,
        bs=2,
        epochs=1,
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def synthetic_depth(rng, h, w, max_d=4.0):
    """Smooth positive synthetic depth map with some zero (invalid) pixels."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    d = 1.0 + 1.5 * np.sin(yy / 37.0) ** 2 + 1.2 * np.cos(xx / 53.0) ** 2
    d += 0.05 * rng.standard_normal((h, w)).astype(np.float32)
    d = np.clip(d, 0.1, max_d + 2)
    invalid = rng.random((h, w)) < 0.02
    d[invalid] = 0.0
    return d.astype(np.float32)


@pytest.fixture
def make_depth(rng):
    return lambda h, w: synthetic_depth(rng, h, w)
