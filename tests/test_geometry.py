"""Geometry contract tests: static geometry == reference patch_info math."""

import math

import numpy as np

from cfpnet_tpu.config import Config
from cfpnet_tpu.data.geometry import ZoneGeometry, geometry_for


def patch_info_oracle(rects: np.ndarray, cps: int, img_h: int, img_w: int):
    """Independent reimplementation of the reference patch_info semantics
    (/root/reference/src/utils/dataloader.py:13-40) used as a test oracle."""
    y0, x0, y1, x1 = rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3]
    max_ph = float((y1 - y0).max())
    max_pw = float((x1 - x0).max())
    pad_h_px = max(abs(float(np.clip(y0, None, 0).min())), float(np.clip(y1, img_h, None).max()) - img_h)
    pad_w_px = max(abs(float(np.clip(x0, None, 0).min())), float(np.clip(x1, img_w, None).max()) - img_w)
    return dict(
        pad=(math.ceil(pad_h_px / cps), math.ceil(pad_w_px / cps)),
        p=(math.ceil(max_ph / cps), math.ceil(max_pw / cps)),
        idx=(int(y0.min() / cps), int(x0.min() / cps), int(y1.max() / cps), int(x1.max() / cps)),
    )


def test_eval_geometry_matches_oracle():
    cfg = Config()
    geom = geometry_for(cfg, "online_eval")
    rects = geom.zone_rects()
    assert rects.shape == (64, 4)
    for cps in (4, 8, 16):
        s = geom.at_scale(cps)
        o = patch_info_oracle(rects, cps, 480, 640)
        assert (s.pad_h, s.pad_w) == o["pad"]
        assert (s.p1, s.p2) == o["p"]
        assert (s.sy_wo, s.sx_wo, s.ey_wo, s.ex_wo) == o["idx"]


def test_eval_geometry_production_values():
    """Hand-verified production values (480x640, 8x8 zones of 56px)."""
    cfg = Config()
    g = geometry_for(cfg, "online_eval")
    s4, s8, s16 = g.at_scale(4), g.at_scale(8), g.at_scale(16)
    assert (s4.sy_wo, s4.ey_wo, s4.sx_wo, s4.ex_wo) == (4, 116, 24, 136)
    assert (s4.p1, s4.interpolate) == (14, False)
    assert (s8.sy_wo, s8.ey_wo, s8.p1, s8.interpolate) == (2, 58, 7, False)
    # 1/16 scale: 8 zones * p1=4 = 32 != 28 -> align-corners interp path
    assert (s16.sy_wo, s16.ey_wo, s16.p1, s16.interpolate) == (1, 29, 4, True)


def test_train_geometry_no_interp():
    cfg = Config(train_zone_num=6)
    g = geometry_for(cfg, "train")
    for cps in (4, 8, 16):
        s = g.at_scale(cps)
        assert not s.interpolate
        assert s.pad_h == 0 and s.pad_w == 0


def test_offset_geometry_with_padding():
    """A negative offset pushes the zone region out of bounds -> pads."""
    g = ZoneGeometry(img_h=480, img_w=640, zone_num=8, patch_px_h=56, patch_px_w=56,
                     offset_y=-20, offset_x=-100)
    s = g.at_scale(8)
    rects = g.zone_rects()
    o = patch_info_oracle(rects, 8, 480, 640)
    assert (s.pad_h, s.pad_w) == o["pad"]
    assert (s.sy_wo, s.sx_wo, s.ey_wo, s.ex_wo) == o["idx"]
    assert s.pad_w > 0
    # clipped inside-rectangle bounds stay within the feature map
    assert 0 <= s.zy0 <= s.zy1 <= s.H
    assert 0 <= s.zx0 <= s.zx1 <= s.W


def test_zone_rects_row_major():
    g = ZoneGeometry(img_h=480, img_w=640, zone_num=2, patch_px_h=56, patch_px_w=56)
    r = g.zone_rects()
    # rows vary slowest (row-major zone ordering, reference :121-122)
    assert r[0, 0] == r[1, 0] and r[0, 1] != r[1, 1]
    assert r[2, 0] == r[0, 0] + 56
