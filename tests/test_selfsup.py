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


def test_pose_optimization_recovers_known_translation():
    """Ground-truth-motion sanity for the whole differentiable chain
    (VERDICT round-1 item 9): a source frame constructed from a KNOWN rigid
    camera translation must be recovered by gradient descent on the pose
    through warp_frame + photometric_loss — sign and scale, not just a loss
    decrease."""
    import optax

    rng = np.random.default_rng(9)
    # smooth texture so photometric gradients are informative; the blur
    # kernel MUST include the center tap ([1,1,1]/3-style) — a [1,0,1]/2
    # kernel has |gain|=1 at the 2px period and makes the loss periodic
    tex = rng.random((1, 64, 80, 3)).astype(np.float32)
    for _ in range(8):
        tex = (tex + np.roll(tex, 1, 1) + np.roll(tex, -1, 1)
               + np.roll(tex, 1, 2) + np.roll(tex, -1, 2)) / 5.0
    tex = (tex - tex.min()) / (tex.max() - tex.min())
    target = jnp.asarray(tex)
    z, fx = 2.0, 40.0
    depth = jnp.full((1, 64, 80, 1), z)
    K = jnp.asarray(np.array([[[fx, 0, 40], [0, fx, 32], [0, 0, 1]]], np.float32))
    K_inv = jnp.asarray(np.linalg.inv(np.asarray(K)))
    tx_true = 0.15  # pixel shift = fx*tx/z = 3 px
    shift = int(fx * tx_true / z)
    # warp with T(tx) samples src at x+shift, so src = target rolled +shift
    src = jnp.asarray(np.roll(tex, shift, axis=2))

    def loss_fn(t):
        T = pose_to_transform(jnp.zeros((1, 3)), t[None])
        warped, valid = warp_frame(src, depth, K, K_inv, T)
        err = photometric_loss(warped, target) * valid
        return err.sum() / (valid.sum() + 1e-6)

    ident = float(loss_fn(jnp.zeros(3)))
    opt = optax.adam(2e-2)
    t = jnp.zeros(3)
    opt_state = opt.init(t)

    @jax.jit
    def update(t, opt_state):
        l, g = jax.value_and_grad(loss_fn)(t)
        up, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(t, up), opt_state, l

    for _ in range(300):
        t, opt_state, l = update(t, opt_state)
    final = float(l)
    t = np.asarray(t)
    # observed: ratio 6e-4, t = [0.1500, -0.001, 0.000]
    assert final < 0.05 * ident, (final, ident)
    # sign and scale of the x-translation, other axes near zero
    assert t[0] > 0, t
    assert abs(t[0] - tx_true) < 0.1 * tx_true, (t, tx_true)
    assert abs(t[1]) < 0.1 * tx_true and abs(t[2]) < 0.1 * tx_true, t


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
