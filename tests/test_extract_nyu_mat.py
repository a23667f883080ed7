"""Oracle test for tools/extract_nyu_mat.py.

VERDICT r3 item 6: the r3 extractor diverged from the reference converter
(`/root/reference/extract_official_train_test_set_from_mat.py:44-64`) in
three ways — it read the inpainted ``depths`` instead of ``rawDepths``,
painted the RGB border white instead of compositing onto black zeros, and
zeroed a depth border the reference leaves untouched. This test pins the
fixed tool against an INDEPENDENT numpy re-implementation of the
reference's conversion math (reference :44-64, re-derived below rather
than imported), at two levels:

1. unit: the tool's pure conversion helpers produce byte-identical arrays
   to the oracle math on a fabricated frame;
2. end-to-end: a fabricated nyu_depth_v2_labeled.mat (HDF5 with
   object-reference sceneTypes, MATLAB axis order) + splits.mat run
   through the tool's ``main()`` yields the reference's on-disk layout,
   byte-identical 16-bit depth PNG pixels, and JPEG RGB matching the
   oracle frame to within JPEG quantization.
"""

import os
import sys

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")
scipy_io = pytest.importorskip("scipy.io")

from tools.extract_nyu_mat import (convert_depth_mm,
                                   convert_rgb_black_border,
                                   main as extract_main)


def _oracle_depth_png(depth_raw_hw: np.ndarray) -> np.ndarray:
    # reference :57-58: img_depth = depth_raw * 1000.0; .astype(np.uint16)
    return (depth_raw_hw * 1000.0).astype(np.uint16)


def _oracle_rgb_jpg_array(image_hwc_rgb: np.ndarray) -> np.ndarray:
    # reference :60-62: flip RGB->BGR for cv2, composite onto black zeros
    # keeping rows 7:474 / cols 7:632; cv2.imwrite flips BGR back to RGB
    # in the file, so the stored pixel array is this in RGB order:
    bgr = image_hwc_rgb[:, :, ::-1]
    boundary = np.zeros((480, 640, 3), dtype=np.uint8)
    boundary[7:474, 7:632, :] = bgr[7:474, 7:632, :]
    return boundary[:, :, ::-1]


def _fabricate_frame(seed: int):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(480, 640, 3), dtype=np.uint8)
    depth = rng.uniform(0.0, 10.0, size=(480, 640)).astype(np.float64)
    return img, depth


def test_conversion_math_matches_reference_oracle():
    img, depth = _fabricate_frame(0)
    dep_mm = convert_depth_mm(depth)
    assert dep_mm.dtype == np.uint16
    np.testing.assert_array_equal(dep_mm, _oracle_depth_png(depth))

    rgb = convert_rgb_black_border(img)
    np.testing.assert_array_equal(rgb, _oracle_rgb_jpg_array(img))
    # the border really is black zeros (r3 painted it white)
    assert rgb[:7].max() == 0 and rgb[474:].max() == 0
    assert rgb[:, :7].max() == 0 and rgb[:, 632:].max() == 0


def test_depth_has_no_border_zeroing():
    # the reference leaves the depth frame untouched (:57-59); r3 zeroed a
    # 7-px border, which corrupts every border-region GT pixel
    _, depth = _fabricate_frame(1)
    dep_mm = convert_depth_mm(depth)
    assert dep_mm[:7].min() > 0  # uniform(0,10)*1000 floors at >0 w.h.p.


def _write_fake_mat(tmp_path, n_frames, scenes, seed=2):
    """Fabricate the HDF5 .mat in MATLAB axis order: images [N,3,W,H],
    rawDepths [N,W,H], sceneTypes as a [1,N] array of object references to
    uint16 char datasets (how MATLAB v7.3 stores cellstr)."""
    rng = np.random.RandomState(seed)
    mat = tmp_path / "nyu_depth_v2_labeled.mat"
    frames = []
    with h5py.File(mat, "w") as f:
        imgs = np.empty((n_frames, 3, 640, 480), dtype=np.uint8)
        deps = np.empty((n_frames, 640, 480), dtype=np.float64)
        refs = np.empty((1, n_frames), dtype=h5py.ref_dtype)
        yy, xx = np.mgrid[0:480, 0:640].astype(np.float64)
        for i in range(n_frames):
            # smooth low-frequency content: JPEG q=95 is near-lossless on
            # it, so the decode-compare tolerance can stay tight (noise
            # would measure the codec, not the tool)
            phase = rng.uniform(0, 2 * np.pi, size=3)
            img_hwc = np.stack([
                127.5 + 120.0 * np.sin(yy / 97.0 + xx / 61.0 + p)
                for p in phase], axis=-1).astype(np.uint8)
            dep_hw = rng.uniform(0.5, 9.5, size=(480, 640))
            frames.append((img_hwc, dep_hw))
            imgs[i] = np.transpose(img_hwc, (2, 1, 0))
            deps[i] = dep_hw.T
            chars = np.array([[ord(c)] for c in scenes[i]], dtype=np.uint16)
            ds = f.create_dataset(f"#refs#/s{i}", data=chars)
            refs[0, i] = ds.ref
        f.create_dataset("images", data=imgs)
        f.create_dataset("rawDepths", data=deps)
        # the tool must NOT read the inpainted depths; make them poison
        f.create_dataset("depths", data=deps + 100.0)
        f.create_dataset("sceneTypes", data=refs)
    return mat, frames


def test_end_to_end_matches_reference_layout_and_pixels(tmp_path, monkeypatch):
    from PIL import Image

    scenes = ["kitchen_0001", "kitchen_0001", "office_0002", "office_0002"]
    mat, frames = _write_fake_mat(tmp_path, 4, scenes)
    splits = tmp_path / "splits.mat"
    # 1-based MATLAB indices: frames 1,3 train; 2,4 test (reference :77-78)
    scipy_io.savemat(splits, {
        "trainNdxs": np.array([[1], [3]], dtype=np.float64),
        "testNdxs": np.array([[2], [4]], dtype=np.float64),
    })
    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv",
                        ["extract_nyu_mat.py", str(mat), str(splits), str(out)])
    extract_main()

    expect = [("train", 0), ("test", 1), ("train", 2), ("test", 3)]
    for (sub, i), scene in zip(expect, scenes):
        # reference :53,59,63 layout: out/{split}/{scene}/rgb_%05d.jpg etc,
        # 0-based zero-padded frame ids
        ddir = out / sub / scene
        png = ddir / f"sync_depth_{i:05d}.png"
        jpg = ddir / f"rgb_{i:05d}.jpg"
        assert png.exists() and jpg.exists(), (png, jpg)

        img_hwc, dep_hw = frames[i]
        got_dep = np.asarray(Image.open(png))
        # 16-bit PNG is lossless: byte-identical pixels, incl. proof the
        # tool read rawDepths (the poisoned `depths` would be +100000 mm)
        np.testing.assert_array_equal(
            got_dep.astype(np.uint16), _oracle_depth_png(dep_hw))

        want_rgb = _oracle_rgb_jpg_array(img_hwc)
        got_rgb = np.asarray(Image.open(jpg).convert("RGB"))
        assert got_rgb.shape == (480, 640, 3)
        # JPEG q=95 on smooth gradients is near-lossless
        err = np.abs(got_rgb.astype(np.int32) - want_rgb.astype(np.int32))
        assert err.mean() < 4.0, err.mean()
        # the black border survives encoding essentially exactly
        assert got_rgb[:6].mean() < 3.0 and got_rgb[475:].mean() < 3.0


def test_every_frame_must_be_in_exactly_one_split(tmp_path, monkeypatch):
    # reference :50 asserts membership; a frame in neither split must fail
    scenes = ["kitchen_0001", "office_0002"]
    mat, _ = _write_fake_mat(tmp_path, 2, scenes, seed=3)
    splits = tmp_path / "splits.mat"
    scipy_io.savemat(splits, {
        "trainNdxs": np.array([[1]], dtype=np.float64),
        "testNdxs": np.array([], dtype=np.float64).reshape(0, 1),
    })
    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv",
                        ["extract_nyu_mat.py", str(mat), str(splits), str(out)])
    with pytest.raises(AssertionError):
        extract_main()
