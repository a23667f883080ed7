"""--train_zone_random_offset: per-batch zone-grid shift augmentation.

The reference draws a fresh offset per SAMPLE inside its dynamic-shape
torch loader (/root/reference/src/utils/dataloader.py:97-99) and feeds the
shifted rects into the model's dynamic fusion gather. Here zone geometry
is static per compile (the fusion scatter keystone), so the offset cycles
per BATCH via a pure schedule both the loader and the train loop evaluate
independently — these tests pin the schedule, the hist-extraction shift,
the loader threading, and the end-to-end loop.
"""

import numpy as np
import pytest

import jax

from cfpnet_tpu.data.datasets import SyntheticDataset, finalize_sample
from cfpnet_tpu.data.geometry import geometry_for, zone_offset_for
from cfpnet_tpu.data.pipeline import DataLoader, collate


def test_zone_offset_schedule(tiny_config):
    """Deterministic, inclusive-bounded, and actually varying."""
    vals = [zone_offset_for(7, e, s, 3) for e in range(4) for s in range(16)]
    assert vals == [zone_offset_for(7, e, s, 3)
                    for e in range(4) for s in range(16)]
    assert all(-3 <= v <= 3 for v in vals)
    assert len(set(vals)) > 3  # spans several distinct offsets
    # both ends of randint's inclusive range are reachable
    big = {zone_offset_for(7, 0, s, 3) for s in range(200)}
    assert {-3, 3} <= big
    assert zone_offset_for(7, 5, 9, 0) == 0
    # distinct (epoch, step) streams decorrelate
    assert [zone_offset_for(7, 0, s, 3) for s in range(16)] != \
        [zone_offset_for(7, 1, s, 3) for s in range(16)]


def test_finalize_sample_offset_shifts_hist(tiny_config):
    """Zone offset (o, o) must equal extracting from a depth map shifted
    by (-o, -o): window [sy+o, sy+o+ph) of the original IS window
    [sy, sy+ph) of np.roll(dep, -o, axis=0/1). Same rng stream on both
    sides; compares the full simulated hist products."""
    cfg = tiny_config
    h, w = cfg.image_size_for("train")
    rs = np.random.default_rng(3)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # coarse steps: each 16x16 zone concentrates into a few 0.04 m bins
    # with counts far above the reference's clip(hist - 20) threshold
    # (tiny zones of a fast-varying or uniform-random field clip to empty)
    dep = (1.0 + 0.48 * np.floor((yy + 2.0 * xx) / 48.0)).astype(np.float32)
    img = rs.random((h, w, 3)).astype(np.float32)
    o = 3

    s_off = finalize_sample(img, dep, 500.0, cfg, "train",
                            np.random.default_rng(11), offset=(o, o))
    dep_roll = np.roll(np.roll(dep, -o, axis=0), -o, axis=1)
    s_ctr = finalize_sample(img, dep_roll, 500.0, cfg, "train",
                            np.random.default_rng(11), offset=(0, 0))
    np.testing.assert_array_equal(s_off["hist_data"], s_ctr["hist_data"])
    np.testing.assert_array_equal(s_off["mask"], s_ctr["mask"])
    # and the offset actually changes the extraction vs centered
    s_c0 = finalize_sample(img, dep, 500.0, cfg, "train",
                           np.random.default_rng(11), offset=(0, 0))
    assert not np.array_equal(s_off["hist_data"], s_c0["hist_data"])


def test_loader_threads_offset_schedule(tiny_config):
    """The producer thread must set dataset.zone_offset to
    zone_offset_for(seed, epoch, batch) before decoding each batch —
    including after set_epoch — and samples must reflect it."""
    cfg = tiny_config.replace(bs=2, train_zone_random_offset=2)

    seen = []

    class Spy(SyntheticDataset):
        def __getitem__(self, idx):
            seen.append(int(getattr(self, "zone_offset", 0)))
            return super().__getitem__(idx)

    ds = Spy(cfg, "train", length=6)
    loader = DataLoader(ds, 2, shuffle=True, drop_last=True, seed=cfg.seed,
                        zone_random_offset=2)
    for epoch in (0, 1):
        loader.set_epoch(epoch)
        seen.clear()
        for _ in loader:
            pass
        expect = [zone_offset_for(cfg.seed, epoch, b, 2)
                  for b in range(3) for _ in range(2)]
        assert seen == expect, (epoch, seen, expect)


@pytest.mark.slow
def test_run_training_with_zone_offset(tiny_config, tmp_path):
    """End-to-end: run_training with --train_zone_random_offset compiles
    per-offset steps and finishes with a finite loss."""
    from cfpnet_tpu.train.loop import run_training

    cfg = tiny_config.replace(
        bs=2, eval_bs=1, epochs=1, train_zone_random_offset=2,
        dataset="synthetic", dataset_eval="synthetic",
        synthetic_length=4, workers=0, no_logging=True,
        save_dir=str(tmp_path),
    )
    run_training(cfg, tiny=True, max_steps_per_epoch=2)
