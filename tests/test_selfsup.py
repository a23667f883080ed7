"""Self-supervised variant tests: warping ops vs geometric identities, pose
net shapes, and a full joint train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfpnet_tpu.ops.warp import (
    axis_angle_to_matrix,
    grid_sample,
    photometric_loss,
    pose_to_transform,
    smoothness_loss,
    ssim,
    warp_frame,
)


def test_axis_angle_identity_and_known_rotation():
    R = axis_angle_to_matrix(jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-5)
    # 90° about z
    R = axis_angle_to_matrix(jnp.array([[0.0, 0.0, np.pi / 2]]))
    expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(np.asarray(R[0]), expect, atol=1e-5)


def test_grid_sample_identity_and_shift():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 8, 10, 3)).astype(np.float32))
    ys, xs = jnp.meshgrid(jnp.arange(8.0), jnp.arange(10.0), indexing="ij")
    coords = jnp.stack([xs, ys], -1)[None]
    out, valid = grid_sample(img, coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
    assert np.asarray(valid).all()
    # integer shift by +1 in x == slicing
    out, valid = grid_sample(img, coords + jnp.array([1.0, 0.0]))
    np.testing.assert_allclose(
        np.asarray(out[0, :, :-1]), np.asarray(img[0, :, 1:]), atol=1e-6
    )
    assert not np.asarray(valid)[0, :, -1].any()  # last col out of bounds


def test_identity_pose_warp_is_identity():
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.random((1, 16, 20, 3)).astype(np.float32))
    depth = jnp.full((1, 16, 20, 1), 2.0)
    K = jnp.asarray(np.array([[[20.0, 0, 10], [0, 20.0, 8], [0, 0, 1]]], np.float32))
    K_inv = jnp.asarray(np.linalg.inv(np.asarray(K)))
    T = pose_to_transform(jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    warped, valid = warp_frame(src, depth, K, K_inv, T)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(src), atol=1e-4)


def test_translation_warp_shifts_image():
    """Camera translating +x with constant depth shifts sampling by fx*tx/z."""
    rng = np.random.default_rng(2)
    src = jnp.asarray(rng.random((1, 12, 16, 3)).astype(np.float32))
    z = 2.0
    depth = jnp.full((1, 12, 16, 1), z)
    fx = 8.0
    K = jnp.asarray(np.array([[[fx, 0, 8], [0, fx, 6], [0, 0, 1]]], np.float32))
    K_inv = jnp.asarray(np.linalg.inv(np.asarray(K)))
    tx = 0.5  # shift = fx*tx/z = 2 px
    T = pose_to_transform(jnp.zeros((1, 3)), jnp.asarray([[tx, 0.0, 0.0]]))
    warped, valid = warp_frame(src, depth, K, K_inv, T)
    np.testing.assert_allclose(
        np.asarray(warped[0, :, :-2]), np.asarray(src[0, :, 2:]), atol=1e-4
    )


def test_ssim_zero_for_identical():
    x = jnp.asarray(np.random.default_rng(3).random((1, 8, 8, 3)).astype(np.float32))
    s = ssim(x, x)
    np.testing.assert_allclose(np.asarray(s), 0.0, atol=1e-5)
    assert float(photometric_loss(x, x).mean()) < 1e-5
    assert float(photometric_loss(x, x * 0.5 + 0.2).mean()) > 0.01


def test_smoothness_penalizes_rough_depth():
    img = jnp.ones((1, 8, 8, 3)) * 0.5
    smooth_d = jnp.ones((1, 8, 8, 1))
    rough = jnp.asarray(
        np.random.default_rng(4).random((1, 8, 8, 1)).astype(np.float32) + 0.5
    )
    assert float(smoothness_loss(smooth_d, img)) < 1e-6
    assert float(smoothness_loss(rough, img)) > 0.01


def test_posenet_shapes():
    from cfpnet_tpu.models.posenet import PoseNet

    net = PoseNet(widths=(4, 8))
    a = jnp.zeros((2, 32, 32, 3))
    v = net.init(jax.random.key(0), a, a)
    aa, tt = net.apply(v, a, a)
    assert aa.shape == (2, 3) and tt.shape == (2, 3)
    # zero-init head -> zero pose at init (stable start)
    np.testing.assert_allclose(np.asarray(aa), 0.0, atol=1e-8)


@pytest.mark.slow
def test_selfsup_train_step(tiny_config):
    from cfpnet_tpu.data.datasets import SyntheticPairDataset
    from cfpnet_tpu.data.geometry import geometry_for
    from cfpnet_tpu.data.pipeline import collate
    from cfpnet_tpu.models.deltar import make_model, model_geometries
    from cfpnet_tpu.train.optim import make_optimizer
    from cfpnet_tpu.train.selfsup import (
        create_selfsup_state,
        make_selfsup_train_step,
        zone_mean_depth,
    )

    cfg = tiny_config.replace(selfsup=True)
    model = make_model(cfg, tiny=True)
    geoms = model_geometries(cfg, "train")
    pixel_geom = geometry_for(cfg, "train")
    ds = SyntheticPairDataset(cfg, "train", length=cfg.bs)
    batch = jax.device_put(collate([ds[i] for i in range(cfg.bs)]))

    # zone_mean_depth agrees with a numpy zone average
    zm = np.asarray(zone_mean_depth(jnp.asarray(batch["depth"]), pixel_geom))
    zn, ph = pixel_geom.zone_num, pixel_geom.patch_px_h
    d0 = np.asarray(batch["depth"])[0, :, :, 0]
    manual = d0[pixel_geom.sy_px : pixel_geom.sy_px + ph,
                pixel_geom.sx_px : pixel_geom.sx_px + ph].mean()
    np.testing.assert_allclose(zm[0, 0], manual, rtol=1e-5)

    tx = make_optimizer(cfg, total_steps=4)
    state = create_selfsup_state(model, cfg, jax.random.key(0), batch, geoms, tx)
    step = make_selfsup_train_step(model, cfg, geoms, pixel_geom)
    state, m = step(state, batch, jax.random.key(1))
    for k in ("loss", "photometric", "smooth", "zone"):
        assert np.isfinite(float(m[k])), k
    assert int(state.step) == 1
    # pose params updated too
    leaf = jax.tree_util.tree_leaves(state.params["pose"])[0]
    assert np.isfinite(np.asarray(leaf)).all()
