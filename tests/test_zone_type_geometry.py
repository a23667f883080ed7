"""zone_type ablation geometry: the model-side geometry must match the
patch_info the reference recomputes from the SUBSET rects (nyu.py:180)."""

import numpy as np

from cfpnet_tpu.config import Config
from cfpnet_tpu.data.geometry import ZoneGeometry, geometry_for
from cfpnet_tpu.data import tof_sim


def test_zone_subset_geometry_matches_subset_rects():
    for zone_type, sub in (("6x6", 6), ("4x4", 4), ("2x2", 2)):
        cfg = Config(zone_type=zone_type)
        geom = geometry_for(cfg, "online_eval")
        assert geom.zone_num == sub

        # oracle: subset the full 8x8 rects, then check bounds agree
        full = ZoneGeometry(img_h=480, img_w=640, zone_num=8,
                            patch_px_h=56, patch_px_w=56)
        rects = full.zone_rects()
        _, fr_sub, _ = tof_sim.apply_zone_subset(
            np.zeros((64, 2), np.float32), rects, np.ones(64, bool), zone_type
        )
        ours = geom.zone_rects()
        np.testing.assert_array_equal(ours, fr_sub)


def test_zone_subset_scale_geometry():
    cfg = Config(zone_type="4x4")
    geom = geometry_for(cfg, "online_eval")
    s8 = geom.at_scale(8)
    # central 4x4 of the 8x8 grid: rows 128..352 px -> cells 16..44 @1/8
    assert (s8.sy_wo, s8.ey_wo) == (16, 44)
    assert s8.p1 == 7 and not s8.interpolate


def test_default_zone_type_unchanged():
    cfg = Config()  # 8x8
    g = geometry_for(cfg, "online_eval")
    assert g.zone_num == 8 and g.sy_px == 16 and g.sx_px == 96
    cfg_t = Config(train_zone_num=6)  # train default zone_type 8x8 >= 6 -> no-op
    gt = geometry_for(cfg_t, "train")
    assert gt.zone_num == 6
