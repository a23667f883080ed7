"""Data-layer tests: synthetic dataset, the full NYU decode+augment path on
fabricated files, ZJUL5 on a fabricated h5, loader batching."""

import json
import os

import numpy as np
import pytest

from cfpnet_tpu.data.datasets import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    NYUV2Dataset,
    SyntheticDataset,
    ZJUL5Dataset,
)
from cfpnet_tpu.data.pipeline import DataLoader, collate


def test_synthetic_sample_shapes(tiny_config):
    cfg = tiny_config
    ds = SyntheticDataset(cfg, "train", length=4)
    s = ds[0]
    zn = cfg.train_zone_num
    assert s["image"].shape == (cfg.input_height, cfg.input_width, 3)
    assert s["depth"].shape == (cfg.input_height, cfg.input_width, 1)
    assert s["hist_data"].shape == (zn * zn, cfg.zone_sample_num)
    assert s["mask"].shape == (zn * zn,)
    assert s["image"].dtype == np.float32 and s["mask"].dtype == bool
    # deterministic per index
    s2 = ds[0]
    np.testing.assert_array_equal(s["image"], s2["image"])


def test_synthetic_eval_native_res(tiny_config):
    ds = SyntheticDataset(tiny_config, "online_eval", length=2)
    s = ds[0]
    # float-valued sources ship exact normalized f32 — only uint8-sourced
    # datasets (jpg/h5) use the compact image_u8 path (ADVICE r2: the u8
    # round-trip would quantize synthetic pixels by up to ~1/510)
    assert "image_u8" not in s
    assert s["image"].shape == (
        tiny_config.native_height, tiny_config.native_width, 3
    )
    assert s["image"].dtype == np.float32
    from cfpnet_tpu.data.datasets import sample_image_f32

    f32 = sample_image_f32(s)
    assert f32.dtype == np.float32 and f32.shape == s["image"].shape
    np.testing.assert_array_equal(f32, s["image"])


def test_dataloader_batching(tiny_config):
    ds = SyntheticDataset(tiny_config, "train", length=5)
    dl = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=7)
    batches = list(dl)
    assert len(batches) == 2 == len(dl)
    assert batches[0]["image"].shape[0] == 2
    # epoch advances -> different shuffle order
    order1 = dl._index_order()
    dl.epoch += 1
    order2 = dl._index_order()
    assert not np.array_equal(order1, order2)


def test_dataloader_propagates_worker_errors(tiny_config):
    class Broken:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        list(DataLoader(Broken(), batch_size=1))


@pytest.fixture
def fake_nyu(tmp_path, tiny_config):
    """Fabricate a mini NYU tree: rgb_{n}.jpg + sync_depth_{n}.png (mm)."""
    from PIL import Image

    rng = np.random.default_rng(3)
    scene = tmp_path / "sync" / "scene_a"
    scene.mkdir(parents=True)
    names = []
    for n in range(3):
        rgb = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
        depth_mm = (rng.uniform(500, 3900, (480, 640))).astype(np.uint16)
        Image.fromarray(rgb).save(scene / f"rgb_{n:05d}.jpg")
        Image.fromarray(depth_mm, mode="I;16").save(scene / f"sync_depth_{n:05d}.png")
        names.append({"filename": f"sync/scene_a/{n:05d}.h5"})
    split = tmp_path / "split.json"
    split.write_text(json.dumps({"train": names, "test": names}))
    return tiny_config.replace(
        data_path=str(tmp_path / "sync"),
        data_path_eval=str(tmp_path / "sync"),
        filenames_file=str(split),
        filenames_file_eval=str(split),
        input_height=416,
        input_width=544,
        native_height=480,
        native_width=640,
        train_zone_num=6,
        eval_zone_num_cfg=8,
        train_patch_px=64,
        eval_patch_px=56,
        do_random_rotate=True,
        drop_hist=0.34,
        noise_prob=0.3,
        noise_mean=0.17,
        noise_sigma=0.2,
    )


def test_nyu_train_path(fake_nyu):
    ds = NYUV2Dataset(fake_nyu, "train")
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (416, 544, 3)
    assert s["depth"].shape == (416, 544, 1)
    assert s["hist_data"].shape == (36, 16)
    assert s["mask"].shape == (36,)
    # depth in meters
    assert 0.0 <= s["depth"].min() and s["depth"].max() < 4.5
    # image got ImageNet-normalized (roughly zero-centered)
    assert abs(s["image"].mean()) < 2.0


def test_nyu_eval_path(fake_nyu):
    ds = NYUV2Dataset(fake_nyu, "online_eval")
    s = ds[1]
    assert s["image_u8"].shape == (480, 640, 3)
    assert s["image_u8"].dtype == np.uint8
    assert s["hist_data"].shape == (64, 16)
    # a uniform-random source image has mean ~127
    assert 100 < s["image_u8"].mean() < 155
    # the on-device normalize path reproduces the host normalize exactly
    from cfpnet_tpu.data.datasets import normalize_image, sample_image_f32

    np.testing.assert_allclose(
        sample_image_f32(s),
        normalize_image(s["image_u8"].astype(np.float32) / 255.0),
        rtol=1e-6,
    )


def test_zjul5_h5(tmp_path, tiny_config):
    import h5py

    rng = np.random.default_rng(5)
    d = tmp_path / "zju"
    d.mkdir()
    with h5py.File(d / "cap0.h5", "w") as f:
        f["rgb"] = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
        f["depth"] = rng.uniform(0.3, 8.0, (480, 640)).astype(np.float32)
        f["hist_data"] = np.stack(
            [rng.uniform(0.5, 3.5, 64), rng.uniform(0.05, 0.3, 64)], axis=1
        ).astype(np.float32)
        # the real sensor's centered 8x8 grid of 56px zones
        from cfpnet_tpu.data.geometry import ZoneGeometry

        f["fr"] = ZoneGeometry(480, 640, 8, 56, 56).zone_rects()
        f["mask"] = np.ones(64, bool)
    (d / "data.json").write_text(json.dumps({"test": [{"filename": "cap0.h5"}]}))
    cfg = tiny_config.replace(
        data_path_eval=str(d), filenames_file_eval=str(d / "data.json"),
        zone_type="8x8",
    )
    ds = ZJUL5Dataset(cfg)
    s = ds[0]
    assert s["image_u8"].shape == (480, 640, 3)
    assert s["hist_data"].shape == (64, 16)
    assert s["mask"].all()
    # zone ablation: central 4x4
    cfg2 = cfg.replace(zone_type="4x4")
    s2 = ZJUL5Dataset(cfg2)[0]
    assert s2["hist_data"].shape == (16, 16)


def test_nyu_pair_dataset(fake_nyu):
    from cfpnet_tpu.data.datasets import NYUPairDataset

    cfg = fake_nyu.replace(selfsup=True, do_random_rotate=False)
    ds = NYUPairDataset(cfg, "train")
    s = ds[0]
    assert s["image"].shape == (416, 544, 3)
    assert s["image_raw"].shape == (416, 544, 3)
    assert s["src_raw"].shape == (416, 544, 3)
    assert s["zone_mu"].shape == (36,)
    assert s["K"].shape == (3, 3) and s["K_inv"].shape == (3, 3)
    np.testing.assert_allclose(s["K"] @ s["K_inv"], np.eye(3), atol=1e-4)
    # raw image is 0..1 (unnormalized)
    assert 0.0 <= s["image_raw"].min() and s["image_raw"].max() <= 1.0


def test_nyu_device_pipeline_ships_uint8(fake_nyu):
    """With --device_pipeline the NYU loader ships raw uint8 crops (4x less
    host->device traffic) and device_preprocess reproduces the f32 path
    exactly (the u8 crop IS the source of the f32/255 values)."""
    import jax

    from cfpnet_tpu.data.tof_sim_jax import device_preprocess
    from cfpnet_tpu.data.geometry import geometry_for

    cfg = fake_nyu.replace(device_pipeline=True, do_random_rotate=False)
    ds = NYUV2Dataset(cfg, "train")
    s = ds[0]
    assert s["image_raw"].dtype == np.uint8
    assert s["image_raw"].shape == (416, 544, 3)
    geom = geometry_for(cfg, "train")
    rng = jax.random.key(3)
    out_u8 = device_preprocess(s["image_raw"][None], s["depth"][None, ..., 0],
                               rng, geom, train=True)
    out_f32 = device_preprocess(
        (s["image_raw"].astype(np.float32) / 255.0)[None],
        s["depth"][None, ..., 0], rng, geom, train=True,
    )
    for k in out_u8:
        # atol 1e-6: XLA fuses the on-device /255 differently from the
        # host's, shifting f32 rounding by ~1 ulp
        np.testing.assert_allclose(np.asarray(out_u8[k]), np.asarray(out_f32[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_synthetic_pair_dataset(tiny_config):
    from cfpnet_tpu.data.datasets import SyntheticPairDataset

    ds = SyntheticPairDataset(tiny_config.replace(selfsup=True), "train", length=2)
    s = ds[0]
    assert s["src_raw"].shape == s["image_raw"].shape
    assert not np.array_equal(s["src_raw"], s["image_raw"])  # shifted frame


def test_collate():
    a = {"x": np.zeros((2, 3)), "y": np.float32(1.0)}
    b = {"x": np.ones((2, 3)), "y": np.float32(2.0)}
    c = collate([a, b])
    assert c["x"].shape == (2, 2, 3) and c["y"].shape == (2,)
