#!/usr/bin/env python
"""Extract the official NYU-Depth-v2 test set from nyu_depth_v2_labeled.mat.

Equivalent of the reference's
``extract_official_train_test_set_from_mat.py`` (93 LoC, reference repo
root): converts the official .mat + splits.mat into per-scene
``rgb_XXXXX.jpg`` / ``sync_depth_XXXXX.png`` files with the same on-disk
conventions the dataloaders expect:

- depth saved as uint16 millimeters (depth * 1000) — reference :57-63
- a 7-pixel black/white border is masked out of both modalities
- scene-name directories, zero-padded ids

Usage:
    python tools/extract_nyu_mat.py nyu_depth_v2_labeled.mat splits.mat out_dir
"""

from __future__ import annotations

import os
import sys

import h5py
import numpy as np


def convert_image(idx: int, scene: str, depth_m: np.ndarray, img: np.ndarray,
                  out_folder: str) -> None:
    from PIL import Image

    os.makedirs(os.path.join(out_folder, scene), exist_ok=True)

    # mask the 7-px registration border (reference :57-63 semantics)
    img = img.copy()
    img[:7, :] = 255
    img[-7:, :] = 255
    img[:, :7] = 255
    img[:, -7:] = 255
    depth_mm = (depth_m * 1000.0).astype(np.uint16)
    depth_mm[:7, :] = 0
    depth_mm[-7:, :] = 0
    depth_mm[:, :7] = 0
    depth_mm[:, -7:] = 0

    Image.fromarray(img).save(
        os.path.join(out_folder, scene, f"rgb_{idx:05d}.jpg")
    )
    Image.fromarray(depth_mm, mode="I;16").save(
        os.path.join(out_folder, scene, f"sync_depth_{idx:05d}.png")
    )


def main():
    if len(sys.argv) != 4:
        print(__doc__)
        sys.exit(1)
    mat_path, splits_path, out_dir = sys.argv[1:4]

    import scipy.io

    splits = scipy.io.loadmat(splits_path)
    test_idx = set(int(x) - 1 for x in splits["testNdxs"].reshape(-1))

    with h5py.File(mat_path, "r") as f:
        images = f["images"]  # [N, 3, W, H]
        depths = f["depths"]  # [N, W, H]
        names_ref = f["sceneTypes"][0] if "sceneTypes" in f else f["scenes"][0]
        n = images.shape[0]
        for i in range(n):
            sub = "test" if i in test_idx else "train"
            scene_chars = f[names_ref[i]][:]
            scene = "".join(chr(int(c)) for c in scene_chars.reshape(-1))
            img = np.transpose(np.asarray(images[i]), (2, 1, 0))  # -> H, W, 3
            dep = np.transpose(np.asarray(depths[i]), (1, 0))  # -> H, W
            convert_image(i, os.path.join(sub, scene), dep, img, out_dir)
            if i % 100 == 0:
                print(f"{i}/{n}")
    print(f"done -> {out_dir}")


if __name__ == "__main__":
    main()
