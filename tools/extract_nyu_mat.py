#!/usr/bin/env python
"""Extract the official NYU-Depth-v2 train/test images from
nyu_depth_v2_labeled.mat + splits.mat.

Equivalent of the reference's ``extract_official_train_test_set_from_mat.py``
(the curfil-derived converter at the reference repo root), matching its
conversion math EXACTLY (oracle-tested in tests/test_extract_nyu_mat.py
against an independent numpy re-implementation of reference :44-64):

- depth comes from ``rawDepths`` (NOT the inpainted ``depths`` — reference
  :82), transposed to [H, W], scaled *1000 and cast to uint16 millimeters,
  saved as 16-bit PNG with NO border masking (reference :57-59)
- RGB is composited onto a black 480x640 canvas keeping rows 7:474 and
  cols 7:632 (the Kinect registration border becomes black zeros, NOT
  white — reference :61-63), saved as JPEG
- split membership uses the 1-based ``trainNdxs``/``testNdxs`` with the
  reference's assertion that every frame is in exactly one split
- layout: ``out/{train,test}/<sceneType>/rgb_XXXXX.jpg`` +
  ``sync_depth_XXXXX.png`` (0-based, zero-padded ids — reference :59,63)

Byte-level caveat: the reference encodes JPEG through cv2 (libjpeg q=95);
this tool uses PIL at quality=95. The arrays fed to the encoders are
bit-identical (that is what the oracle test pins); the compressed bytes
can differ by encoder build. Depth PNGs are lossless and carry identical
pixels.

Usage:
    python tools/extract_nyu_mat.py nyu_depth_v2_labeled.mat splits.mat out_dir
"""

from __future__ import annotations

import os
import sys

import numpy as np


def convert_depth_mm(depth_raw_m: np.ndarray) -> np.ndarray:
    """[H, W] raw depth in meters -> uint16 millimeters (reference :57-58).
    No border zeroing — the reference leaves the depth frame untouched."""
    return (depth_raw_m * 1000.0).astype(np.uint16)


def convert_rgb_black_border(image_hwc: np.ndarray) -> np.ndarray:
    """[480, 640, 3] uint8 RGB -> same, composited onto BLACK zeros keeping
    rows 7:474 / cols 7:632 (reference :61-62). The reference additionally
    flips RGB->BGR for cv2.imwrite, which flips back on write — a no-op in
    the saved file, so PIL takes the RGB array directly."""
    out = np.zeros((480, 640, 3), dtype=np.uint8)
    out[7:474, 7:632, :] = image_hwc[7:474, 7:632, :]
    return out


def convert_image(idx: int, scene_dir: str, depth_raw_m: np.ndarray,
                  img: np.ndarray, out_folder: str) -> None:
    from PIL import Image

    os.makedirs(os.path.join(out_folder, scene_dir), exist_ok=True)
    Image.fromarray(convert_rgb_black_border(img)).save(
        os.path.join(out_folder, scene_dir, f"rgb_{idx:05d}.jpg"),
        quality=95,
    )
    Image.fromarray(convert_depth_mm(depth_raw_m), mode="I;16").save(
        os.path.join(out_folder, scene_dir, f"sync_depth_{idx:05d}.png")
    )


def main():
    if len(sys.argv) != 4:
        print(__doc__)
        sys.exit(1)
    mat_path, splits_path, out_dir = sys.argv[1:4]

    import h5py
    import scipy.io

    splits = scipy.io.loadmat(splits_path)
    # 1-based MATLAB indices (reference :77-78)
    test_1b = set(int(x) for x in splits["testNdxs"].reshape(-1))
    train_1b = set(int(x) for x in splits["trainNdxs"].reshape(-1))

    with h5py.File(mat_path, "r") as f:
        images = f["images"]        # [N, 3, W, H] (h5py reverses MATLAB dims)
        depths = f["rawDepths"]     # [N, W, H] — raw, not inpainted (:82)
        names_ref = f["sceneTypes"][0]
        n = images.shape[0]
        for i in range(n):
            if (i + 1) in train_1b:
                sub = "train"
            else:
                assert (i + 1) in test_1b, (
                    f"index {i + 1} neither in training nor in test set")
                sub = "test"
            scene_chars = f[names_ref[i]][:]
            scene = "".join(chr(int(c)) for c in scene_chars.reshape(-1))
            img = np.transpose(np.asarray(images[i]), (2, 1, 0))  # -> H, W, 3
            dep = np.transpose(np.asarray(depths[i]), (1, 0))     # -> H, W
            convert_image(i, os.path.join(sub, scene), dep, img, out_dir)
            if i % 100 == 0:
                print(f"{i}/{n}")
    print(f"done -> {out_dir}")


if __name__ == "__main__":
    main()
