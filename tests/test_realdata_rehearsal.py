"""Real-data path rehearsal (VERDICT round-1 item 5/8): prove the on-disk
contract end to end without the real dataset.

Chain exercised: fabricated ``nyu_depth_v2_labeled.mat`` + ``splits.mat``
-> ``tools/extract_nyu_mat.py`` (official_splits layout: per-scene
``rgb_XXXXX.jpg`` / ``sync_depth_XXXXX.png`` uint16-mm, 7px border mask)
-> ``NYUV2Dataset`` path conventions -> ``run_training`` (1 tiny epoch with
per-epoch validation + checkpointing) -> ``evaluate_all.main`` (CSV/xlsx
artifacts). Matches reference extract_official_train_test_set_from_mat.py
and src/dataloader/nyu.py:91-198.
"""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture
def official_mat(tmp_path):
    """Fabricate the official .mat pair (h5 layout: images [N,3,W,H],
    rawDepths [N,W,H], sceneTypes = h5 references to uint16 char arrays —
    the datasets the reference converter reads, :80-84)."""
    import h5py
    import scipy.io

    rng = np.random.default_rng(21)
    n = 4
    scenes = ["kitchen_0001", "kitchen_0001", "office_0002", "office_0002"]
    mat = tmp_path / "nyu_depth_v2_labeled.mat"
    with h5py.File(mat, "w") as f:
        f["images"] = (rng.random((n, 3, 640, 480)) * 255).astype(np.uint8)
        f["rawDepths"] = rng.uniform(0.6, 4.2, (n, 640, 480)).astype(np.float32)
        # the inpainted 'depths' must NOT be read (reference :82): poison it
        f["depths"] = np.full((n, 640, 480), 99.0, np.float32)
        refs = []
        for i, name in enumerate(scenes):
            d = f.create_dataset(
                f"#refs#/s{i}",
                data=np.array([[np.uint16(ord(c))] for c in name]),
            )
            refs.append(d.ref)
        f.create_dataset(
            "sceneTypes", data=np.array([refs], dtype=object),
            dtype=h5py.ref_dtype,
        )
    splits = tmp_path / "splits.mat"
    # 1-based: frames 2,4 are test, 1,3 are train
    scipy.io.savemat(splits, {"testNdxs": np.array([[2], [4]]),
                              "trainNdxs": np.array([[1], [3]])})
    return mat, splits, scenes


def test_extractor_layout(official_mat, tmp_path):
    from tools.extract_nyu_mat import main as extract_main

    mat, splits, scenes = official_mat
    out = tmp_path / "official_splits"
    old = sys.argv
    sys.argv = ["extract_nyu_mat.py", str(mat), str(splits), str(out)]
    try:
        extract_main()
    finally:
        sys.argv = old

    from PIL import Image

    # frame 0 is train, frame 1 is test; per-scene dirs, zero-padded ids
    assert (out / "train" / "kitchen_0001" / "rgb_00000.jpg").exists()
    assert (out / "test" / "kitchen_0001" / "sync_depth_00001.png").exists()
    assert (out / "train" / "office_0002" / "rgb_00002.jpg").exists()
    assert (out / "test" / "office_0002" / "rgb_00003.jpg").exists()
    dep = np.asarray(
        Image.open(out / "test" / "kitchen_0001" / "sync_depth_00001.png")
    )
    assert dep.dtype == np.int32 or dep.dtype == np.uint16
    assert dep.shape == (480, 640)
    # reference :57-59 leaves the depth frame UNTOUCHED (r3 wrongly zeroed
    # a border); rawDepths uniform(0.6, 4.2) m -> border stays in-range mm
    assert dep[:7].min() >= 600
    assert 600 <= dep[240, 320] <= 4200  # millimeters
    # the RGB border is composited onto black zeros (reference :61-62)
    rgb = np.asarray(
        Image.open(out / "test" / "kitchen_0001" / "rgb_00001.jpg").convert("RGB")
    )
    assert rgb[:6].mean() < 3.0 and rgb[:, 633:].mean() < 3.0  # JPEG-fuzzy


@pytest.mark.slow
def test_train_and_evaluate_on_extracted_tree(official_mat, tmp_path,
                                              tiny_config, monkeypatch):
    """Full driver chain over the extracted files: train 1 tiny epoch with
    validation on the real NYU loaders, then sweep evaluate_all to CSV."""
    from tools.extract_nyu_mat import main as extract_main

    mat, splits, scenes = official_mat
    out = tmp_path / "official_splits"
    monkeypatch.setattr(sys, "argv",
                        ["extract_nyu_mat.py", str(mat), str(splits), str(out)])
    extract_main()

    # split json in the reference's nyu_sync.json shape: the leading path
    # component is dropped by the loader (reference nyu.py:96-104)
    names_train = [{"filename": "official/kitchen_0001/00000.h5"},
                   {"filename": "official/office_0002/00002.h5"}]
    names_test = [{"filename": "official/kitchen_0001/00001.h5"},
                  {"filename": "official/office_0002/00003.h5"}]
    split_json = tmp_path / "split.json"
    split_json.write_text(json.dumps({"train": names_train, "test": names_test}))

    monkeypatch.chdir(tmp_path)
    cfg = tiny_config.replace(
        dataset="nyu", dataset_eval="nyu",
        data_path=str(out / "train"), data_path_eval=str(out / "test"),
        filenames_file=str(split_json), filenames_file_eval=str(split_json),
        native_height=480, native_width=640,
        eval_zone_num_cfg=8, eval_patch_px=56,
        bs=2, epochs=1, validate_every=1,
        name="rehearsal", save_dir="results/rehearsal",
        tiny_model=True,
    )
    from cfpnet_tpu.train.loop import run_training

    state = run_training(cfg, tiny=True, max_steps_per_epoch=1)
    assert int(state.step) == 1
    weights = sorted(os.listdir("weights/rehearsal"))
    assert "best" in weights

    # evaluate_all CLI surface over the trained weights
    import evaluate_all

    argv = ["evaluate_all.py",
            "--dataset_eval", "nyu", "--test_dataset", "nyu",
            "--data_path_eval", str(out / "test"),
            "--filenames_file_eval", str(split_json),
            "--name", "rehearsal", "--save_dir", "results/rehearsal",
            "--selected_epoch", "best", "--tiny_model",
            "--epochs", "1",
            "--n_bins", str(cfg.n_bins),
            "--zone_sample_num", str(cfg.zone_sample_num),
            "--sample_uniform",
            "--attention_layer", *cfg.attention_layer,
            "--change_embedding",
            "--save_pred", "--save_rgb", "--save_error_map",
            ]
    monkeypatch.setattr(sys, "argv", argv)
    evaluate_all.main()
    csv_path = "results/rehearsal/results_nyu.csv"
    assert os.path.exists(csv_path)
    rows = open(csv_path).read().strip().splitlines()
    assert rows[0].startswith("epoch,a1,")
    assert len(rows) == 2
    vals = rows[1].split(",")
    assert all(np.isfinite(float(v)) for v in vals)

    # per-image dumps (VERDICT r2 item 6): per-scene folders keyed like the
    # reference's image_folder (reference evaluate_all.py:71-77), one
    # colorized PNG per enabled flag
    from PIL import Image

    for scene, frame in (("kitchen_0001", "rgb_00001"),
                         ("office_0002", "rgb_00003")):
        d = os.path.join("results/rehearsal", scene)
        for kind in ("pred", "rgb", "error"):
            p = os.path.join(d, f"{frame}_{kind}.png")
            assert os.path.exists(p), p
            im = np.asarray(Image.open(p))
            assert im.shape == (480, 640, 3) and im.dtype == np.uint8
