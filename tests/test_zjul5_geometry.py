"""ZJUL5 measured-rect geometry (VERDICT round-1 item 2).

The reference derives fusion geometry from the ``fr`` rects stored in each
real VL53L5CX capture (reference zjuL5.py:106,135 ->
src/utils/dataloader.py:13-40). Round 1 discarded them and assumed the
NYU-style centered grid; these tests prove ``scales_from_rects`` matches the
reference computation (including on deliberately off-center rigs) and that
the dataset/eval plumbing honors it.
"""

import json
import os

import numpy as np
import pytest

from cfpnet_tpu.data.geometry import ZoneGeometry, scales_from_rects

HAVE_REF = os.path.isdir("/root/reference/src/utils")


def centered_rects(img_h=480, img_w=640, zn=8, px=56, off_y=0, off_x=0):
    return ZoneGeometry(img_h, img_w, zn, px, px,
                        offset_y=off_y, offset_x=off_x).zone_rects()


def test_matches_zone_geometry_at_scale():
    """For a uniform centered grid the rect-derived geometry must equal the
    config-derived one (the round-1 assumption, now proven instead)."""
    geom = ZoneGeometry(480, 640, 8, 56, 56)
    by_rects = scales_from_rects(geom.zone_rects(), 480, 640)
    by_cfg = geom.scales()
    assert by_rects == by_cfg


@pytest.mark.parametrize("off_y,off_x", [(12, 0), (0, -20), (33, 17)])
def test_offcenter_rects_move_the_fusion_slices(off_y, off_x):
    fr = centered_rects(off_y=off_y, off_x=off_x)
    base = scales_from_rects(centered_rects(), 480, 640)
    moved = scales_from_rects(fr, 480, 640)
    for cps in (4, 8, 16):
        b, m = base[cps], moved[cps]
        # start indices shift by trunc((start+off)/cps) - trunc(start/cps)
        sy0 = 16 + off_y  # centered grid start = (480-448)/2 = 16
        sx0 = 96 + off_x
        assert m.sy_wo == int(sy0 / cps)
        assert m.sx_wo == int(sx0 / cps)
        assert (m.p1, m.p2) == (b.p1, b.p2)
        # the clipped zone rectangle (what hist2image writes back to) moved
        if off_y > 0:
            assert m.zy0 >= b.zy0
        if off_x < 0:
            assert m.zx0 <= b.zx0


def test_out_of_bounds_rects_produce_pads():
    """A rig whose zone grid hangs off the image needs feature-map padding —
    reference dataloader.py:20-26."""
    fr = centered_rects(off_y=-40, off_x=150)  # top overhang + right overhang
    g = scales_from_rects(fr, 480, 640)[8]
    assert g.pad_h == int(np.ceil(24 / 8))  # sy = 16-40 = -24
    # ex = 96+150+448 = 694 > 640 -> overhang 54
    assert g.pad_w == int(np.ceil(54 / 8))
    assert g.interpolate or (g.tzh == g.p1 * 8 and g.tzw == g.p2 * 8)


@pytest.mark.skipif(not HAVE_REF, reason="reference checkout not available")
def test_rect_geometry_matches_reference_patch_info():
    """Fuzz arbitrary rigs against the REAL reference implementation."""
    import sys

    import torch

    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")  # append: see reference_oracle.py
    from src.utils.dataloader import patch_info_from_rect_data

    rng = np.random.default_rng(11)
    cases = [centered_rects()]
    for _ in range(12):
        zn = int(rng.choice([2, 4, 6, 8]))
        px = int(rng.integers(30, 90))
        off_y = int(rng.integers(-60, 60))
        off_x = int(rng.integers(-60, 60))
        cases.append(centered_rects(480, 640, zn, px, off_y, off_x))
    for fr in cases:
        ours = scales_from_rects(fr, 480, 640)
        ref = patch_info_from_rect_data(torch.from_numpy(fr))
        assert int(ref["zone_num"]) == ours[4].zone_num
        for cps in (4, 8, 16):
            r, g = ref[cps], ours[cps]
            assert tuple(r["pad_size"].tolist()) == (g.pad_h, g.pad_w), (cps, fr[0])
            assert tuple(r["patch_size"].tolist()) == (g.p1, g.p2)
            assert tuple(r["index_wo_pad"].tolist()) == (
                g.sy_wo, g.sx_wo, g.ey_wo, g.ex_wo
            ), (cps, fr[0])


@pytest.fixture
def zju_tree(tmp_path):
    """Two fabricated captures with a deliberately OFF-CENTER rig."""
    import h5py

    rng = np.random.default_rng(7)
    fr = centered_rects(off_y=24, off_x=-16)
    d = tmp_path / "zju"
    d.mkdir()
    names = []
    for i in range(2):
        with h5py.File(d / f"cap{i}.h5", "w") as f:
            f["rgb"] = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
            f["depth"] = rng.uniform(0.3, 8.0, (480, 640)).astype(np.float32)
            f["hist_data"] = np.stack(
                [rng.uniform(0.5, 3.5, 64), rng.uniform(0.05, 0.3, 64)], axis=1
            ).astype(np.float32)
            f["fr"] = fr
            f["mask"] = np.ones(64, bool)
        names.append({"filename": f"cap{i}.h5"})
    (d / "data.json").write_text(json.dumps({"test": names}))
    return d, fr


def test_dataset_exposes_measured_geometry(zju_tree, tiny_config):
    from cfpnet_tpu.data.datasets import ZJUL5Dataset

    d, fr = zju_tree
    cfg = tiny_config.replace(
        data_path_eval=str(d), filenames_file_eval=str(d / "data.json"),
        zone_type="8x8", native_height=480, native_width=640,
    )
    ds = ZJUL5Dataset(cfg)
    assert ds.scale_geoms == scales_from_rects(fr, 480, 640)
    ds[0], ds[1]  # both files agree -> no error

    # zone ablation subsets the rects before deriving geometry
    cfg4 = cfg.replace(zone_type="4x4")
    ds4 = ZJUL5Dataset(cfg4)
    assert ds4.scale_geoms[16].zone_num == 4
    # central 4x4 of the off-center grid starts 2 zones in
    assert ds4.scale_geoms[16].sy_wo == int((16 + 24 + 2 * 56) / 16)


def test_mixed_rig_dataset_groups_by_rect_signature(zju_tree, tiny_config):
    """Captures from two rigs in one data.json form two geometry groups
    (reference zjuL5.py:106-135 derives patch_info per capture; the static-
    geometry equivalent is one group per rect signature — VERDICT r4 #3)."""
    import h5py

    from cfpnet_tpu.data.datasets import ZJUL5Dataset

    d, fr = zju_tree
    with h5py.File(d / "cap1.h5", "r+") as f:
        del f["fr"]
        f["fr"] = centered_rects()  # different rig
    cfg = tiny_config.replace(
        data_path_eval=str(d), filenames_file_eval=str(d / "data.json"),
        zone_type="8x8", native_height=480, native_width=640,
    )
    ds = ZJUL5Dataset(cfg)
    assert [g[1] for g in ds.geometry_groups] == [[0], [1]]
    assert ds.geometry_groups[0][0] == scales_from_rects(fr, 480, 640)
    assert ds.geometry_groups[1][0] == scales_from_rects(
        centered_rects(), 480, 640)
    ds[0], ds[1]  # both captures load under their own group
    # single-geometry consumers must fail LOUDLY, never pick a grid silently
    with pytest.raises(ValueError, match="mixed-rig"):
        ds.scale_geoms


def test_dataset_rejects_rects_changed_after_init(zju_tree, tiny_config):
    import h5py

    from cfpnet_tpu.data.datasets import ZJUL5Dataset

    d, fr = zju_tree
    cfg = tiny_config.replace(
        data_path_eval=str(d), filenames_file_eval=str(d / "data.json"),
        zone_type="8x8", native_height=480, native_width=640,
    )
    ds = ZJUL5Dataset(cfg)  # single rig at init time
    with h5py.File(d / "cap1.h5", "r+") as f:
        del f["fr"]
        f["fr"] = centered_rects()
    ds[0]
    with pytest.raises(ValueError, match="changed since dataset init"):
        ds[1]


def test_evaluate_uses_dataset_geometry(zju_tree, tiny_config, monkeypatch):
    """loop.evaluate must build its eval step from the dataset's measured
    geometry, not the configured centered grid."""
    from cfpnet_tpu.data.datasets import ZJUL5Dataset
    from cfpnet_tpu.data.pipeline import DataLoader
    from cfpnet_tpu.train import loop as loop_mod

    d, fr = zju_tree
    cfg = tiny_config.replace(
        data_path_eval=str(d), filenames_file_eval=str(d / "data.json"),
        zone_type="8x8", native_height=480, native_width=640,
    )
    ds = ZJUL5Dataset(cfg)
    seen = {}

    def fake_make_eval_step(model, config, geoms, protocol="evaluate_all"):
        seen["geoms"] = geoms
        return lambda params, stats, batch: (batch["depth"], None)

    monkeypatch.setattr(loop_mod, "make_eval_step", fake_make_eval_step)
    loop_mod.evaluate(None, cfg, {}, None, DataLoader(ds, batch_size=1),
                      max_batches=1)
    assert seen["geoms"] == scales_from_rects(fr, 480, 640)


# ---------------------------------------------------------------------------
# Mixed-rig grouped evaluation end to end (VERDICT r4 item 7): a data.json
# mixing two rigs sweeps in ONE invocation through make_grouped_eval — one
# compiled graph per rect signature, per-zone placement from each rig's own
# geometry, metrics merged image-weighted.
# ---------------------------------------------------------------------------


def tiny_rects(off_y=0, off_x=0):
    return ZoneGeometry(64, 96, 2, 16, 16,
                        offset_y=off_y, offset_x=off_x).zone_rects()


@pytest.fixture
def tiny_zju_mixed(tmp_path):
    """Three captures at the tiny 64x96 native geometry, rigs 2 + 1 —
    unequal group sizes so image-weighted merging is actually exercised."""
    import h5py

    rng = np.random.default_rng(3)
    d = tmp_path / "zju_mixed"
    d.mkdir()
    rigs = [tiny_rects(), tiny_rects(off_y=6, off_x=-4)]
    names = []
    for i, rig in enumerate([0, 0, 1]):
        with h5py.File(d / f"cap{i}.h5", "w") as f:
            f["rgb"] = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
            f["depth"] = rng.uniform(0.3, 3.5, (64, 96)).astype(np.float32)
            f["hist_data"] = np.stack(
                [rng.uniform(0.5, 3.0, 4), rng.uniform(0.05, 0.3, 4)], axis=1
            ).astype(np.float32)
            f["fr"] = rigs[rig]
            f["mask"] = np.ones(4, bool)
        names.append({"filename": f"cap{i}.h5"})
    (d / "data.json").write_text(json.dumps({"test": names}))
    # per-rig split files for the reference merge
    (d / "data_g0.json").write_text(json.dumps({"test": names[:2]}))
    (d / "data_g1.json").write_text(json.dumps({"test": names[2:]}))
    return d


@pytest.mark.slow
def test_mixed_rig_grouped_eval_matches_split_runs(tiny_zju_mixed, tiny_config):
    import jax

    from cfpnet_tpu.data.datasets import ZJUL5Dataset
    from cfpnet_tpu.models.deltar import make_model, model_geometries
    from cfpnet_tpu.train.loop import make_grouped_eval

    d = tiny_zju_mixed
    cfg = tiny_config.replace(
        data_path_eval=str(d), filenames_file_eval=str(d / "data.json"),
        zone_type="2x2", dataset_eval="zjuL5",
    )
    ds = ZJUL5Dataset(cfg)
    assert [g[1] for g in ds.geometry_groups] == [[0, 1], [2]]

    model = make_model(cfg, tiny=True)
    img = np.zeros((1, 64, 96, 3), np.float32)
    hist = np.zeros((1, 4, cfg.zone_sample_num), np.float32)
    mask = np.ones((1, 4), bool)
    variables = jax.jit(
        lambda r: model.init({"params": r, "fusion": r}, img, hist, mask,
                             model_geometries(cfg, "online_eval"), train=False)
    )(jax.random.key(0))
    params, stats = variables["params"], variables.get("batch_stats")

    merged = make_grouped_eval(model, cfg, ds, protocol="evaluate_all")(
        params, stats)

    # reference result: two single-rig runs, merged image-weighted
    per_group = []
    for split, n in (("data_g0.json", 2), ("data_g1.json", 1)):
        sub = ZJUL5Dataset(cfg.replace(filenames_file_eval=str(d / split)))
        assert len(sub.geometry_groups) == 1
        m = make_grouped_eval(model, cfg, sub, protocol="evaluate_all")(
            params, stats)
        per_group.append((m, n))
    total = sum(n for _, n in per_group)
    for k in merged:
        want = sum(m[k] * n for m, n in per_group) / total
        np.testing.assert_allclose(merged[k], want, rtol=1e-6,
                                   err_msg=f"metric {k}")
