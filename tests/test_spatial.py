"""Spatial partitioning (beyond parity — the reference has no TP/SP of any
kind, SURVEY §2.6): image rows sharded over a 2-D ('data','spatial') mesh.

The jitted eval step is UNCHANGED — GSPMD propagates the input sharding
through every conv (halo exchanges over the mesh) and regroups the fusion
tokens with collectives. Correctness is exercised here on the 8 virtual CPU
devices; single-image latency scaling needs real multi-chip ICI.
"""

import numpy as np

import jax

from cfpnet_tpu.data.datasets import SyntheticDataset
from cfpnet_tpu.data.pipeline import collate
from cfpnet_tpu.models.deltar import make_model, model_geometries
from cfpnet_tpu.parallel.mesh import make_mesh_2d, shard_batch_spatial
from cfpnet_tpu.train.steps import make_eval_step


def _eval_setup(tiny_config):
    cfg = tiny_config.replace(bs=2, mode="online_eval")
    model = make_model(cfg, tiny=True)
    geoms = model_geometries(cfg, "online_eval")
    ds = SyntheticDataset(cfg, "online_eval", length=2)
    batch = collate([ds[i] for i in range(2)])
    variables = jax.jit(
        lambda r: model.init(
            {"params": r, "fusion": jax.random.fold_in(r, 1)},
            jax.numpy.zeros((1, cfg.native_height, cfg.native_width, 3)),
            jax.numpy.full((1, 4, cfg.zone_sample_num), 2.0),
            jax.numpy.ones((1, 4), bool),
            geoms, train=False,
        )
    )(jax.random.key(0))
    step = make_eval_step(model, cfg, geoms, protocol="validate")
    return cfg, variables, batch, step


import pytest


@pytest.mark.parametrize("dp,sp", [(2, 4), (2, 2)])
def test_spatial_sharded_eval_matches_single_device(tiny_config, dp, sp):
    # (2, 2) is not redundant with (2, 4): jax 0.9.0's SPMD partitioner
    # miscompiled kernel-covers-map dense convs on exactly the
    # (data>=2, spatial=2) shape (see test_sharded_small_map_conv_dispatch)
    cfg, variables, batch, step = _eval_setup(tiny_config)
    params, stats = variables["params"], variables.get("batch_stats")

    ref, _ = step(params, stats, jax.device_put(batch))
    ref = np.asarray(ref)

    mesh = make_mesh_2d(dp, sp)  # bs=2 over 'data', 64 rows over 'spatial'
    sharded = shard_batch_spatial(batch, mesh)
    img_key = "image_u8" if "image_u8" in sharded else "image"
    spec = sharded[img_key].sharding.spec
    assert tuple(spec) == ("data", "spatial"), spec

    got, _ = step(params, stats, sharded)
    # tolerance is f32-reassociation noise amplified through ~20 layers of
    # the net; the f64 companion test below pins the same comparison to
    # one f32 ulp of the output, so a partitioner wrong-answer (O(1))
    # cannot hide inside this budget
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=1.5e-3)


@pytest.mark.slow
def test_spatial_sharded_eval_matches_single_device_f64(tiny_config):
    """The tight version of the equality pin above, in float64 on the
    partitioner-bug mesh shape (2, 2). This is the measurement that
    justifies the f32 test's loosened tolerance: a real partitioner wrong-
    answer is O(1) (see test_sharded_small_map_conv_dispatch), while in
    f64 the sharded/unsharded disagreement collapses to ONE f32 rounding
    of the output — the depth-reconstruction tail is f32-pinned by design
    (models/deltar.py) even under x64, so predictions quantize at the f32
    ulp of the depth range (measured max |delta| 3.0e-8 at depth ~2 m;
    everything upstream of the pin cancels to f64 exactness)."""
    cfg, variables, batch, step = _eval_setup(tiny_config)
    to64 = lambda t: jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float64)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else np.asarray(a),
        t)
    params, stats = to64(variables["params"]), to64(variables.get("batch_stats"))
    batch = to64(batch)

    with jax.enable_x64(True):
        ref, _ = step(params, stats, jax.device_put(batch))
        ref = np.asarray(ref)
        mesh = make_mesh_2d(2, 2)
        got, _ = step(params, stats, shard_batch_spatial(batch, mesh))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=0, atol=1e-6)


def test_shard_batch_spatial_rejects_indivisible_rows(tiny_config):
    """--spatial_shards values that do not divide the image rows must fail
    with a clear error naming the flag, not this jax version's raw
    device_put internals error."""
    cfg, variables, batch, step = _eval_setup(tiny_config)
    img_key = "image_u8" if "image_u8" in batch else "image"
    rows = batch[img_key].shape[1]
    mesh = make_mesh_2d(1, 3)  # 3 divides neither 64 nor any tiny height
    assert rows % 3 != 0
    with pytest.raises(ValueError, match="spatial_shards"):
        shard_batch_spatial(batch, mesh)


def test_sharded_small_map_conv_dispatch(tiny_config):
    """Kernel-covers-map depthwise convs must be GSPMD-safe on a (2, 2)
    mesh, in f64 (regression for the r4 dryrun red).

    Root cause being guarded against: XLA's SPMD partitioner (jax 0.9.0)
    miscompiles spatially row-sharded DENSE convolutions whose halo reaches
    across shards on a ('data'>=2, 'spatial'==2) mesh — EVERY output
    element wrong by O(1), reproduced in f64 with the compilation cache
    disabled (so not roundoff, not stale-AOT poisoning). The densified
    channel-diagonal formulation of mid-size depthwise kernels hit this at
    the deepest fusion scale (k=7 on a 4x6 map). ``depthwise_conv2d`` now
    routes any kernel with min(k) >= min(H, W) through the DFT-matmul path
    (pure einsums — partitioner-safe); this test pins both the routing and
    the numerics.
    """
    from jax import lax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cfpnet_tpu.ops.dwconv import depthwise_conv2d

    with jax.enable_x64(True):
        rng = np.random.RandomState(0)
        x = jax.numpy.asarray(rng.randn(4, 4, 6, 32))
        kern = jax.numpy.asarray(rng.randn(7, 7, 1, 32) * 0.1)
        assert x.dtype == jax.numpy.float64

        def direct(x):
            return lax.conv_general_dilated(
                x, kern, (1, 1), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=x.shape[-1])

        ref = np.asarray(jax.jit(direct)(x))
        got = np.asarray(jax.jit(lambda x: depthwise_conv2d(x, kern))(x))
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)

        mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                    ("data", "spatial"))
        xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
        got_sh = np.asarray(
            jax.jit(lambda x: depthwise_conv2d(x, kern))(xs))
        np.testing.assert_allclose(got_sh, got, rtol=0, atol=1e-12)


def test_dense_conv_boundary_regime_on_2d_mesh(tiny_config):
    """The dispatch guard reroutes ONLY kernel-covers-map (min(k) >=
    min(H, W)) dense convs to the DFT path. This pins the regime it
    deliberately leaves on the dense channel-diagonal branch: kernels that
    cover the PER-SHARD rows but not the map (k >= H/sp, k < min(H, W)) —
    the halo spans whole shards, yet a direct probe sweep (r4: dp in
    {1,2,4}, sp in {2,4,8}, rows/shard down to 2, k in {3..11}, f64,
    cache-cold) found NO miscompile anywhere in it on jax 0.9.0. If an
    upstream change widens the bug into this regime, this test goes red
    and the guard in ``ops/dwconv.py`` must learn the shard count."""
    from jax import lax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cfpnet_tpu.ops.dwconv import depthwise_conv2d

    with jax.enable_x64(True):
        rng = np.random.RandomState(1)
        for dp, sp, H, W, k in [(2, 2, 8, 12, 7), (2, 4, 8, 12, 7)]:
            x = jax.numpy.asarray(rng.randn(dp * 2, H, W, 8))
            kern = jax.numpy.asarray(rng.randn(k, k, 1, 8) * 0.1)
            assert k < min(H, W) and k >= H // sp  # the boundary regime
            p = (k - 1) // 2

            def direct(x):
                return lax.conv_general_dilated(
                    x, kern, (1, 1), [(p, p), (p, p)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=x.shape[-1])

            ref = np.asarray(jax.jit(direct)(x))
            mesh = Mesh(np.array(jax.devices()[: dp * sp]).reshape(dp, sp),
                        ("data", "spatial"))
            xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
            got = np.asarray(jax.jit(lambda x: depthwise_conv2d(x, kern))(xs))
            np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)


def test_mesh_2d_rejects_oversubscription(tiny_config):
    import pytest

    with pytest.raises(ValueError, match="devices"):
        make_mesh_2d(4, 4)  # 16 > the 8 virtual devices
    with pytest.raises(ValueError, match=">= 1"):
        make_mesh_2d(0, 4)  # ADVICE r3: dp=0 built an empty mesh
    with pytest.raises(ValueError, match="divisible"):
        make_mesh_2d(3, 2, batch_size=4)


def test_evaluate_driver_spatial_shards_flag(tiny_config):
    """--spatial_shards N is the CLI entry point for the 2-D mesh (ADVICE
    r3 item 4): the full ``evaluate`` metric sweep through a spatially
    sharded step must match the unsharded sweep."""
    from cfpnet_tpu.data.pipeline import DataLoader
    from cfpnet_tpu.train.loop import evaluate

    cfg, variables, batch, step = _eval_setup(tiny_config)
    params, stats = variables["params"], variables.get("batch_stats")
    ds = SyntheticDataset(cfg, "online_eval", length=4)
    loader = DataLoader(ds, batch_size=2)
    want = evaluate(make_model(cfg, tiny=True), cfg, params, stats, loader)
    loader2 = DataLoader(ds, batch_size=2)
    got = evaluate(make_model(cfg, tiny=True),
                   cfg.replace(spatial_shards=4), params, stats, loader2)
    assert want and set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=5e-4, atol=1e-5)


def _mesh22():
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                ("data", "spatial"))


def _raw_grouped(x, kern, strides, pads):
    from jax import lax

    return lax.conv_general_dilated(
        x, kern, strides, pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


def test_grouped_conv_kernel_grad_on_2d_mesh(tiny_config):
    """``grouped_conv_safe``'s kernel gradient must match single-device
    autodiff when the operand is batch-sharded on a 2-D mesh.

    The raw grouped conv's VJP emits a ``batch_group_count`` convolution
    that XLA's SPMD partitioner (jax 0.9.0) miscompiles for operands
    sharded ``P('data')`` on a ('data','spatial') mesh — dL/dW wrong by
    O(grad) at every map size while forward and dL/dx stay correct (the
    backbone's depthwise kernels would silently stop learning). The
    custom-VJP wrapper computes dL/dW as k*k strided-window einsums
    instead; forward HLO is unchanged. See the canary test below for
    upstream status."""
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cfpnet_tpu.ops.dwconv import grouped_conv_safe

    rng = np.random.RandomState(0)
    for s in (1, 2):
        x = jnp.asarray(rng.randn(4, 9, 13, 8), jnp.float32)
        kern = jnp.asarray(rng.randn(3, 3, 1, 8) * 0.3, jnp.float32)
        pads = tuple(map(tuple, lax.padtype_to_pads(
            (9, 13), (3, 3), (s, s), "SAME")))

        def loss(x, kern):
            return jnp.sum(jnp.sin(grouped_conv_safe(x, kern, (s, s), pads)))

        # forward bit-identical to the native grouped conv
        np.testing.assert_array_equal(
            np.asarray(jax.jit(
                lambda x, k: grouped_conv_safe(x, k, (s, s), pads))(x, kern)),
            np.asarray(jax.jit(
                lambda x, k: _raw_grouped(x, k, (s, s), pads))(x, kern)))

        g = jax.jit(jax.grad(loss, (0, 1)))
        gx_ref, gk_ref = jax.device_get(g(x, kern))
        # raw-conv autodiff agrees on a single device (reassociation only)
        def loss_raw(x, kern):
            return jnp.sum(jnp.sin(_raw_grouped(x, kern, (s, s), pads)))
        gx_raw, gk_raw = jax.device_get(jax.jit(jax.grad(loss_raw, (0, 1)))(x, kern))
        np.testing.assert_allclose(np.asarray(gk_ref), np.asarray(gk_raw),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gx_ref), np.asarray(gx_raw),
                                   rtol=1e-4, atol=1e-6)
        # the regression: batch-sharded on the 2-D mesh
        xs = jax.device_put(x, NamedSharding(_mesh22(), P("data")))
        gx_sh, gk_sh = jax.device_get(g(xs, kern))
        np.testing.assert_allclose(np.asarray(gk_sh), np.asarray(gk_ref),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gx_sh), np.asarray(gx_ref),
                                   rtol=1e-4, atol=1e-6)


def test_train_step_grads_on_2d_mesh_dp_only(tiny_config):
    """Full train-step gradients on a 2-D mesh with batch-only sharding
    must match single-device (the model-level consequence of the grouped-
    conv VJP fix: before it, every backbone conv_dw kernel gradient came
    out wrong by O(grad) in exactly this configuration while the loss
    stayed correct). lr=1 SGD so the param delta IS the mean gradient.

    Train-side SPATIAL sharding (P('data','spatial') batches into the
    train step) is covered by test_train_step_grads_on_2d_mesh_spatial
    below (supported as of r5 — requires the state to be PLACED on the
    mesh, see the mixed-placement canary)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cfpnet_tpu.data.pipeline import collate
    from cfpnet_tpu.models.deltar import model_geometries
    from cfpnet_tpu.train.steps import create_train_state, make_train_step

    # --safe_dw_vjp is REQUIRED on multi-axis meshes (off by default: ~5%
    # train-step cost, and the 1-D production mesh is unaffected)
    cfg = tiny_config.replace(bs=4, safe_dw_vjp=True)
    model = make_model(cfg, tiny=True)
    geoms = model_geometries(cfg, "train")
    ds = SyntheticDataset(cfg, "train", length=4)
    batch = collate([ds[i] for i in range(4)])
    rng = jax.random.key(0)
    state = create_train_state(
        model, cfg, rng, jax.device_put(batch), geoms, optax.sgd(1.0))
    step = jax.jit(make_train_step(model, cfg, geoms, jit=False))
    srng = jax.random.fold_in(rng, 1)

    ref_state, ref_loss = step(state, jax.device_put(batch), srng)
    sharded = {k: jax.device_put(v, NamedSharding(_mesh22(), P("data")))
               for k, v in batch.items()}
    got_state, got_loss = step(state, sharded, srng)

    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-5)
    deltas_ref = jax.tree_util.tree_map(
        lambda o, n: np.asarray(o, np.float64) - np.asarray(n, np.float64),
        state.params, ref_state.params)
    gscale = max(float(np.max(np.abs(np.asarray(g))))
                 for g in jax.tree_util.tree_leaves(deltas_ref))
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(got_state.params),
            jax.tree_util.tree_leaves_with_path(ref_state.params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=0, atol=max(1e-6, 2e-3 * gscale),
            err_msg=f"param {jax.tree_util.keystr(pa)}")


def test_spatial_training_guard_rails(tiny_config):
    """run_training must refuse the configurations that compute wrong
    values or are unaudited on this XLA (clear errors, not silent
    corruption): spatial training without --safe_dw_vjp or with
    --device_pipeline (unaudited). --grad_accum composes as of round 5
    via the host-side microbatch pre-split (tested below)."""
    from cfpnet_tpu.train.loop import run_training

    base = tiny_config.replace(spatial_shards=2)
    with pytest.raises(ValueError, match="safe_dw_vjp"):
        run_training(base, tiny=True)
    with pytest.raises(NotImplementedError, match="device_pipeline"):
        run_training(base.replace(safe_dw_vjp=True, device_pipeline=True),
                     tiny=True)


def _spatial_train_setup(tiny_config):
    """Shared rig for the spatial train-step equality test and the
    mixed-placement canary: tiny model, bs=4 synthetic train batch,
    lr=1 SGD (param delta == mean gradient), one jitted raw step."""
    import optax

    from cfpnet_tpu.data.pipeline import collate
    from cfpnet_tpu.models.deltar import model_geometries
    from cfpnet_tpu.train.steps import create_train_state, make_train_step

    cfg = tiny_config.replace(bs=4, safe_dw_vjp=True)
    model = make_model(cfg, tiny=True)
    geoms = model_geometries(cfg, "train")
    ds = SyntheticDataset(cfg, "train", length=4)
    batch = collate([ds[i] for i in range(4)])
    rng = jax.random.key(0)
    state = create_train_state(
        model, cfg, rng, jax.device_put(batch), geoms, optax.sgd(1.0))
    step = jax.jit(make_train_step(model, cfg, geoms, jit=False))
    srng = jax.random.fold_in(rng, 1)
    return state, step, batch, srng


def _assert_step_equal(state, step, batch, srng, got_state, got_loss,
                       ref_state, ref_loss):
    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-5)
    deltas_ref = jax.tree_util.tree_map(
        lambda o, n: np.asarray(o, np.float64) - np.asarray(n, np.float64),
        state.params, ref_state.params)
    gscale = max(float(np.max(np.abs(np.asarray(g))))
                 for g in jax.tree_util.tree_leaves(deltas_ref))
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(got_state.params),
            jax.tree_util.tree_leaves_with_path(ref_state.params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=0, atol=max(1e-6, 2e-3 * gscale),
            err_msg=f"param {jax.tree_util.keystr(pa)}")


@pytest.mark.slow
def test_train_step_grads_on_2d_mesh_spatial(tiny_config):
    """Full train-step param updates with the batch sharded
    P('data','spatial') (rows over the 'spatial' axis) must match
    single-device — train-side spatial sharding, which round 4 declared
    unsupported. The round-5 audit (scripts/sp_trainstep_diag.py)
    DISSOLVED the r4 "composed backward miscompiles" boundary: every
    spatial-train gradient discrepancy — including the apparent
    dL/d(gsa.sr.*) = 1/dp bug the first half of round 5 chased — traced
    to feeding single-device-committed params alongside the mesh-sharded
    batch in one jit call, which jax 0.9.0 silently mis-partitions
    instead of raising (see test_upstream_mixed_placement_canary below).
    With the state PLACED on the mesh (replicated — exactly the
    device_put run_training performs) the full f64 train step matches
    single-device to ~1e-13 with NO model changes (diag stages H/I/K).
    f32 noise in this comparison measured 7.5e-5 x gscale (stage H32);
    a real partitioner wrong-answer is O(gscale), so the 2e-3*gscale
    budget separates them by ~25x. safe_dw_vjp=True is the supported
    spatial-train configuration: the grouped-conv dL/dW miscompile is
    LIVE on 2-D meshes for P('data') operands (diag stage L reproduces
    it composed, placement-independent) even though the dp2sp2
    spatial-batch graph happens to audit clean without it (stage J)."""
    from cfpnet_tpu.parallel.mesh import replicated_sharding

    state, step, batch, srng = _spatial_train_setup(tiny_config)
    ref_state, ref_loss = step(state, jax.device_put(batch), srng)

    mesh = _mesh22()
    sharded = shard_batch_spatial(batch, mesh)
    img_key = "image_u8" if "image_u8" in sharded else "image"
    assert tuple(sharded[img_key].sharding.spec) == ("data", "spatial")
    # production placement: state replicated over the mesh (run_training
    # performs this device_put explicitly before the first step)
    state_m = jax.device_put(state, replicated_sharding(mesh))
    got_state, got_loss = step(state_m, sharded, srng)
    _assert_step_equal(state, step, batch, srng, got_state, got_loss,
                       ref_state, ref_loss)


@pytest.mark.slow
def test_run_training_spatial_with_grad_accum(tiny_config, tmp_path):
    """End-to-end wiring of the composition: run_training with
    --spatial_shards 2 --grad_accum 2 --safe_dw_vjp must pre-split
    batches in the loader (pipeline.py accum_presplit), init from
    microbatch 0, and finish with a finite loss."""
    from cfpnet_tpu.train.loop import run_training

    cfg = tiny_config.replace(
        bs=4, eval_bs=1, epochs=1, spatial_shards=2, grad_accum=2,
        safe_dw_vjp=True, dataset="synthetic", dataset_eval="synthetic",
        synthetic_length=4, workers=0, no_logging=True,
        save_dir=str(tmp_path),
    )
    run_training(cfg, tiny=True, max_steps_per_epoch=1)


@pytest.mark.slow
def test_grad_accum_presplit_on_2d_mesh(tiny_config):
    """--grad_accum composed with train-side spatial sharding: the in-jit
    (accum, bs/accum) reshape of a P('data','spatial') batch miscompiles
    (loss 1e-4-rel wrong, param updates up to 0.75 x gscale —
    sp_trainstep_diag stage M) and lax.scan over host-pre-split leaves
    miscompiles too (~6e-2 x gscale, loss exact), so the microbatch split
    happens on the HOST (shard_batch_spatial_presplit: leaves
    [accum, B/accum, ...] with a replicated leading axis) and
    make_train_step(pre_split=True) UNROLLS the microbatch loop at trace
    time. This pins the whole composition: the presplit sharded accum
    step must match the single-device accum step (diag stage M2 measured
    it f64-clean, ~1e-13)."""
    import optax

    from cfpnet_tpu.data.pipeline import collate
    from cfpnet_tpu.models.deltar import model_geometries
    from cfpnet_tpu.parallel.mesh import (replicated_sharding,
                                          shard_batch_spatial_presplit)
    from cfpnet_tpu.train.steps import create_train_state, make_train_step

    cfg = tiny_config.replace(bs=4, safe_dw_vjp=True, grad_accum=2)
    model = make_model(cfg, tiny=True)
    geoms = model_geometries(cfg, "train")
    ds = SyntheticDataset(cfg, "train", length=4)
    batch = collate([ds[i] for i in range(4)])
    rng = jax.random.key(0)
    state = create_train_state(
        model, cfg, rng, jax.device_put(batch), geoms, optax.sgd(1.0))
    step = jax.jit(make_train_step(model, cfg, geoms, jit=False,
                                   pre_split=True))
    srng = jax.random.fold_in(rng, 1)

    # single-device reference: same pre-split leaves, default placement
    presplit_host = {k: np.reshape(np.asarray(v),
                                   (2, np.shape(v)[0] // 2)
                                   + tuple(np.shape(v)[1:]))
                     for k, v in batch.items()}
    ref_state, ref_loss = step(state, jax.device_put(presplit_host), srng)

    mesh = _mesh22()
    sharded = shard_batch_spatial_presplit(batch, mesh, 2)
    img_key = "image_u8" if "image_u8" in sharded else "image"
    assert tuple(sharded[img_key].sharding.spec) == (None, "data", "spatial")
    state_m = jax.device_put(state, replicated_sharding(mesh))
    got_state, got_loss = step(state_m, sharded, srng)
    _assert_step_equal(state, step, batch, srng, got_state, got_loss,
                       ref_state, ref_loss)

    # and the pre-split semantics equal the plain accum step's (unrolled
    # vs scanned codegen differ at f32 rounding — measured 2e-6 max on
    # O(0.3) params; 1e-5 separates that from any real semantic drift)
    plain = jax.jit(make_train_step(model, cfg, geoms, jit=False))
    plain_state, plain_loss = plain(state, jax.device_put(batch), srng)
    np.testing.assert_allclose(float(ref_loss), float(plain_loss), rtol=1e-5)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_state.params),
            jax.tree_util.tree_leaves_with_path(plain_state.params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=0, atol=1e-5, err_msg=f"param {jax.tree_util.keystr(pa)}")


@pytest.mark.slow
@pytest.mark.xfail(
    strict=True,
    reason="UPSTREAM CANARY: jax 0.9.0 silently computes WRONG gradients "
           "(instead of raising or resharding correctly) when single-"
           "device-committed params and a P('data','spatial') batch meet "
           "in one jit call — backbone param updates come back O(1) wrong "
           "(up to ~5x the max gradient) while the loss stays correct "
           "(round-5 audit, scripts/sp_trainstep_diag.py stages C/G vs "
           "H/I). run_training guards by device_put-ing the state "
           "replicated on the mesh before stepping. When this XPASSes, "
           "upstream fixed mixed-placement handling and the explicit "
           "placement becomes an optimization rather than a correctness "
           "guard.")
def test_upstream_mixed_placement_canary(tiny_config):
    """Identical to test_train_step_grads_on_2d_mesh_spatial EXCEPT the
    state stays committed to device 0 (where the jitted init put it)
    instead of being placed on the mesh — the hazard run_training's
    explicit placement exists to rule out. Loss (forward) agrees; the
    param updates do not."""
    state, step, batch, srng = _spatial_train_setup(tiny_config)
    ref_state, ref_loss = step(state, jax.device_put(batch), srng)

    mesh = _mesh22()
    sharded = shard_batch_spatial(batch, mesh)
    got_state, got_loss = step(state, sharded, srng)
    _assert_step_equal(state, step, batch, srng, got_state, got_loss,
                       ref_state, ref_loss)


@pytest.mark.xfail(
    strict=True,
    reason="UPSTREAM CANARY: XLA SPMD (jax 0.9.0) miscompiles the grouped-"
           "conv kernel gradient for P('data') operands on a 2-D mesh. "
           "When this test XPASSes, the upstream bug is FIXED — re-evaluate "
           "whether ops.dwconv.grouped_conv_safe's custom VJP is still "
           "needed (and whether train-side spatial sharding can be "
           "supported, see PARITY.md round-4 notes).")
def test_upstream_grouped_conv_vjp_canary(tiny_config):
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8, 12, 8), jnp.float32)
    kern = jnp.asarray(rng.randn(3, 3, 1, 8) * 0.3, jnp.float32)
    pads = ((1, 1), (1, 1))

    def loss(x, kern):
        return jnp.sum(jnp.sin(_raw_grouped(x, kern, (1, 1), pads)))

    g = jax.jit(jax.grad(loss, argnums=1))
    ref = np.asarray(jax.device_get(g(x, kern)))
    xs = jax.device_put(x, NamedSharding(_mesh22(), P("data")))
    got = np.asarray(jax.device_get(g(xs, kern)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_shard_batch_spatial_on_1d_mesh_falls_back(tiny_config):
    from cfpnet_tpu.parallel.mesh import make_mesh

    cfg, variables, batch, step = _eval_setup(tiny_config)
    mesh = make_mesh(2, batch_size=2)
    out = shard_batch_spatial(batch, mesh)
    img_key = "image_u8" if "image_u8" in out else "image"
    assert tuple(out[img_key].sharding.spec) == ("data",)
