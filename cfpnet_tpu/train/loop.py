"""Training + evaluation loops.

Mirrors the reference drivers (/root/reference/train.py:51-201) with the
TPU-native step functions: per-epoch NYU validation with the 9-metric suite,
best-RMSE checkpoint tracking ({ep}_{rmse:.3f} + rolling best — reference
train.py:150-155), faithful resume, JSONL structured logging (the reference's
wandb calls are commented out; SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from ..data.pipeline import make_loader
from ..models.deltar import make_model, model_geometries
from ..parallel.mesh import make_mesh
from .checkpoint import load_checkpoint, save_checkpoint, save_weights
from .losses import RunningAverage, RunningAverageDict
from .optim import make_optimizer
from .steps import create_train_state, make_eval_step, make_metric_step, make_train_step


class JsonlLogger:
    def __init__(self, path: Optional[str]):
        self.f = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self.f = open(path, "a")

    def log(self, **kw):
        if self.f:
            kw.setdefault("ts", time.time())
            self.f.write(json.dumps(kw) + "\n")
            self.f.flush()

    def close(self):
        if self.f:
            self.f.close()


def make_eval_steps(model, config, loader, protocol: str = "validate"):
    """(eval_step, metric_step) for a loader — datasets carrying measured
    sensor geometry (ZJUL5 'fr' rects) override the configured zone grid
    (reference zjuL5.py:135). Build ONCE and pass to repeated ``evaluate``
    calls: each fresh jit closure re-traces the full model (seconds)."""
    geoms = getattr(getattr(loader, "dataset", None), "scale_geoms", None)
    if geoms is None:
        geoms = model_geometries(config, "online_eval")
    return (make_eval_step(model, config, geoms, protocol=protocol),
            make_metric_step(config, protocol=protocol))


def evaluate(
    model, config, params, batch_stats, loader, protocol: str = "validate",
    max_batches: Optional[int] = None, tiny: bool = False, steps=None,
    per_image_hook=None, _accumulator=None,
) -> Dict[str, float]:
    """Full metric sweep over an eval loader at native resolution.

    Metrics are computed PER IMAGE and streamed through RunningAverageDict —
    identical to the reference's bs=1 protocol at any ``--eval_bs`` (the
    reference is locked to bs=1 by DataParallel, evaluate_all.py:95). A
    ragged final batch is padded by repeating the last sample (one compiled
    shape) and the pad images are excluded from the averages.

    Pass ``steps=(eval_step, metric_step)`` to reuse jitted steps across
    epochs (a fresh make_eval_step per call would re-trace every epoch).

    ``per_image_hook(dataset_index, pred_hw, batch, j)`` is called for every
    REAL (non-pad) sample with the host-fetched full-resolution prediction —
    the eval loader is sequential, so ``dataset_index`` maps 1:1 onto the
    dataset (used by evaluate_all's --save_pred/--save_rgb/--save_error_map
    dumps; reference evaluate_all.py:71-77)."""
    if steps is not None:
        eval_step, metric_step = steps
    else:
        eval_step, metric_step = make_eval_steps(model, config, loader, protocol)
    eval_bs = getattr(loader, "batch_size", 1)
    # --spatial_shards N (>1): image rows sharded over an N-way 'spatial'
    # mesh axis — GSPMD partitions the convs with halo exchanges so per-
    # image latency scales across chips; the jitted step is unchanged
    # (tests/test_spatial.py pins equality vs single-device).
    mesh2 = None
    if getattr(config, "spatial_shards", 0) > 1:
        from ..parallel.mesh import (make_mesh_2d, replicated_sharding,
                                     shard_batch_spatial)

        sp = config.spatial_shards
        dp = max(1, jax.device_count() // sp)
        while dp > 1 and eval_bs % dp != 0:
            dp -= 1
        idle = jax.device_count() - dp * sp
        if idle > 0:
            # e.g. --eval_bs 3 --spatial_shards 2 on 8 devices -> 3x2 mesh,
            # 2 chips idle. Loud, not silent (ADVICE r4): the fix is an
            # eval_bs divisible by device_count // spatial_shards.
            print(
                f"spatial eval mesh: dp={dp} x sp={sp} uses {dp * sp} of "
                f"{jax.device_count()} devices ({idle} idle) — pick "
                f"--eval_bs divisible by {jax.device_count() // sp} to use "
                f"the full mesh"
            )
        mesh2 = make_mesh_2d(dp, sp, batch_size=eval_bs)
        repl = replicated_sharding(mesh2)
        params = jax.device_put(params, repl)
        if batch_stats is not None:
            batch_stats = jax.device_put(batch_stats, repl)
    else:
        # checkpoint restores are host arrays; pin them on device once
        params = jax.device_put(params)
        if batch_stats is not None:
            batch_stats = jax.device_put(batch_stats)
    metrics = RunningAverageDict() if _accumulator is None else _accumulator
    seen = 0
    for i, batch in enumerate(loader):
        if max_batches is not None and i >= max_batches:
            break
        hvd = batch.pop("has_valid_depth", None)
        img_key = "image_u8" if "image_u8" in batch else "image"
        n_real = int(batch[img_key].shape[0])  # shape read — no transfer
        if n_real < eval_bs:  # pad the ragged tail to the compiled shape
            pad = eval_bs - n_real
            batch = {
                k: np.concatenate(
                    [np.asarray(v)] + [np.asarray(v)[-1:]] * pad, axis=0
                )
                for k, v in batch.items()
            }
        if mesh2 is not None:
            batch = shard_batch_spatial(batch, mesh2)
        pred, _prob = eval_step(params, batch_stats, batch)
        m, n = metric_step(batch["depth"], pred)
        # ONE device->host sync per batch: each float()/np.asarray is a
        # full round trip over the (high-latency) device link, and ~10 of
        # them per image made the eval loop RTT-bound (~0.8 s/frame here).
        # The save hook's payload (pred + the batch fields it reads) rides
        # the SAME fetch — per-image transfers would re-add ~2+ RTTs/frame.
        if per_image_hook is None:
            m, n, hvd = jax.device_get((m, n, hvd))
        else:
            hook_fields = {k: batch[k] for k in ("image_u8", "image", "depth")
                           if k in batch}
            m, n, hvd, pred_host, host_batch = jax.device_get(
                (m, n, hvd, pred, hook_fields))
        m = {k: np.asarray(v).reshape(-1) for k, v in m.items()}
        n = np.asarray(n).reshape(-1)
        hvd = None if hvd is None else np.asarray(hvd).reshape(-1)
        if per_image_hook is not None:
            pred_host = np.asarray(pred_host)
            for j in range(n_real):
                per_image_hook(seen + j, pred_host[j, ..., 0], host_batch, j)
        for j in range(n_real):
            # skip samples without ground truth (reference train.py:179-181)
            if hvd is not None and not bool(hvd[j]):
                continue
            if int(n[j]) > 0:
                metrics.update({k: float(v[j]) for k, v in m.items()})
        seen += n_real
    return metrics.get_value() or {}


EVAL_METRIC_KEYS = ["a1", "a2", "a3", "abs_rel", "rmse", "log_10",
                    "rmse_log", "silog", "sq_rel"]


class _Subset:
    """Index-striding dataset view (keeps scale_geoms / sample_meta)."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)
        try:
            self.scale_geoms = getattr(dataset, "scale_geoms", None)
        except ValueError:
            # mixed-rig dataset (scale_geoms raises by design) — the caller
            # (make_grouped_eval) sets the per-group geometry explicitly
            self.scale_geoms = None

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]

    def sample_meta(self, i):
        fn = getattr(self.dataset, "sample_meta", None)
        if fn is not None:
            return fn(self.indices[i])
        return "eval", f"{self.indices[i]:05d}"


def make_grouped_eval(model, config, dataset, protocol: str = "validate"):
    """Geometry-grouped evaluation over a (possibly mixed-rig) dataset.

    The reference recomputes ZJUL5 zone geometry per capture
    (/root/reference/src/dataloader/zjuL5.py:106-135) and so sweeps a
    mixed-rig data.json in one run; here geometry is a compile-time
    constant of the jitted graph, so the equivalent is ONE compiled step
    pair per rect-signature group (``dataset.geometry_groups``) with the
    per-image metric stream merged through a shared RunningAverageDict —
    image-weighted averaging identical to a flat single-geometry sweep.

    Returns ``eval_fn(params, batch_stats, per_image_hook=None) -> metrics``
    reusable across an epoch sweep (loaders + jitted steps built once).
    Single-geometry datasets (or ones with no ``geometry_groups``) fall
    back to the plain ``evaluate`` path unchanged."""
    groups = getattr(dataset, "geometry_groups", None)
    if not groups or len(groups) <= 1:
        loader = make_loader(config, "online_eval", dataset=dataset)
        steps = make_eval_steps(model, config, loader, protocol)

        def eval_fn(params, batch_stats, per_image_hook=None):
            return evaluate(model, config, params, batch_stats, loader,
                            protocol=protocol, steps=steps,
                            per_image_hook=per_image_hook)

        return eval_fn

    plans = []
    for geoms, indices, _fr in groups:
        sub = _Subset(dataset, indices)
        sub.scale_geoms = geoms
        loader = make_loader(config, "online_eval", dataset=sub)
        plans.append((sub, loader,
                      make_eval_steps(model, config, loader, protocol)))

    def eval_fn(params, batch_stats, per_image_hook=None):
        acc = RunningAverageDict()
        for sub, loader, steps in plans:
            hook = None
            if per_image_hook is not None:
                # evaluate() numbers samples subset-locally; dumps must be
                # keyed by the GLOBAL dataset index (same translation as
                # evaluate_sharded)
                hook = (lambda s: lambda i, pred_hw, batch, j:
                        per_image_hook(s.indices[i], pred_hw, batch, j))(sub)
            evaluate(model, config, params, batch_stats, loader,
                     protocol=protocol, steps=steps, per_image_hook=hook,
                     _accumulator=acc)
        return acc.get_value() or {}

    return eval_fn


def evaluate_sharded(
    model, config, params, batch_stats, dataset, protocol: str = "validate",
    steps=None, per_image_hook=None, barrier_fn=None,
) -> Dict[str, float]:
    """Multi-host evaluation (beyond parity — the reference is locked to one
    device, evaluate_all.py:95): images are strided across processes, each
    process sweeps its own subset with the ordinary single-device eval steps
    (eval is embarrassingly parallel — no collectives in the hot loop), and
    the image-weighted (mean, count) pairs merge with ONE
    ``process_allgather`` at the end. Every process returns the identical
    global metrics; numerics match the single-process sweep because the
    per-image metric stream is unchanged, only its partitioning differs."""
    groups = getattr(dataset, "geometry_groups", None)
    if groups is not None and len(groups) > 1:
        # a process-strided subset would mix geometries inside one jitted
        # step; grouped eval is single-process for now (mixed-rig datasets
        # are small real-sensor sweeps — the reference's are <1k captures)
        raise NotImplementedError(
            "mixed-rig dataset under multi-host eval sharding is not "
            "supported; run the sweep single-process (make_grouped_eval)")
    nproc = jax.process_count()
    pid = jax.process_index()
    if nproc == 1:
        loader = make_loader(config, "online_eval", dataset=dataset)
        return evaluate(model, config, params, batch_stats, loader,
                        protocol=protocol, steps=steps,
                        per_image_hook=per_image_hook)

    def _localize(tree):
        # post-step params live replicated on the GLOBAL mesh (not fully
        # addressable from one process); every process holds a complete
        # copy, so pull the local replica for the per-process sweep
        def one(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                assert x.is_fully_replicated, (
                    "sharded (non-replicated) params cannot be localized for "
                    "the per-process eval sweep")
                return np.asarray(x.addressable_data(0))
            return x
        return jax.tree_util.tree_map(one, tree)

    params = _localize(params)
    batch_stats = None if batch_stats is None else _localize(batch_stats)
    sub = _Subset(dataset, range(pid, len(dataset), nproc))
    loader = make_loader(config, "online_eval", dataset=sub)
    if per_image_hook is not None:
        # evaluate() numbers samples subset-locally; the caller's hook (e.g.
        # evaluate_all's save hook) was built over the FULL dataset, so
        # translate to global indices — otherwise every dump is labeled with
        # the wrong scene/frame and processes overwrite each other's files.
        _caller_hook = per_image_hook

        def per_image_hook(i, pred_hw, batch, j):  # noqa: F811
            _caller_hook(sub.indices[i], pred_hw, batch, j)

    if steps is None:
        steps = make_eval_steps(model, config, loader, protocol)
    acc = RunningAverageDict()
    evaluate(model, config, params, batch_stats, loader, protocol=protocol,
             steps=steps, per_image_hook=per_image_hook, _accumulator=acc)
    count = 0 if acc._dict is None else next(iter(acc._dict.values())).count
    vals = acc.get_value() if acc._dict is not None else {}
    vec = np.array(
        [float(count)] + [vals.get(k, 0.0) * count for k in EVAL_METRIC_KEYS],
        np.float64,
    )
    if barrier_fn is not None:
        barrier_fn("eval_allgather")
    from jax.experimental import multihost_utils

    all_vec = np.asarray(multihost_utils.process_allgather(vec))  # [P, 10]
    total = all_vec[:, 0].sum()
    if total == 0:
        return {}
    sums = all_vec[:, 1:].sum(axis=0)
    return {k: float(s / total) for k, s in zip(EVAL_METRIC_KEYS, sums)}


def run_training(config, tiny: bool = False, max_steps_per_epoch: Optional[int] = None):
    """End-to-end training (reference train.py main_worker + train)."""
    if getattr(config, "spatial_shards", 0) > 1:
        # Train-side spatial partitioning: image rows over an sp-way
        # 'spatial' axis, batch over 'data' (beyond parity — the reference
        # has no SP, SURVEY §2.6). Two guards (round-5 audit,
        # scripts/sp_trainstep_diag.py): (1) --safe_dw_vjp — XLA 0.9.0's
        # grouped-conv dL/dW miscompile is live on 2-D meshes (stage L:
        # exact conv_dw kernel-grad errors for P('data') batches,
        # placement-independent; the dp2sp2 spatial graph happens to audit
        # clean without it, but that is one graph shape, not a guarantee);
        # (2) the train state must be PLACED on the mesh before stepping
        # (below) — feeding device-0-committed params alongside a
        # P('data','spatial') batch makes jax silently compute O(1)-wrong
        # gradients instead of raising (the placement hazard; canaried in
        # tests/test_spatial.py). With both guards the full f64 train
        # step is bit-level clean (~1e-13) vs single-device;
        # tests/test_spatial.py::test_train_step_grads_on_2d_mesh_spatial
        # pins it.
        from ..parallel.mesh import make_mesh_2d

        if not getattr(config, "safe_dw_vjp", False):
            raise ValueError(
                "--spatial_shards for TRAINING requires --safe_dw_vjp: "
                "XLA 0.9.0 silently miscompiles grouped-conv parameter "
                "gradients on multi-axis meshes (see ops/dwconv.py; "
                "spatial training is equality-verified only with the "
                "safe VJPs on)")
        if getattr(config, "device_pipeline", False):
            raise NotImplementedError(
                "--device_pipeline with train-side --spatial_shards is "
                "not verified (the on-device ToF sim has not been audited "
                "under spatial sharding); drop one of the two flags")
        # --grad_accum composes via the HOST-side microbatch pre-split
        # with a trace-time-unrolled microbatch loop (pipeline.py ->
        # shard_batch_spatial_presplit, make_train_step pre_split=True):
        # the in-jit (accum, bs/accum) reshape of a P('data','spatial')
        # batch corrupts loss AND gradients (sp_trainstep_diag stage M)
        # and lax.scan over the pre-split leaves corrupts gradients too
        # (stage M2's scan variant) — only the unrolled pre-split graph
        # is f64-clean (stage M2; equality pinned by tests/
        # test_spatial.py::test_grad_accum_presplit_on_2d_mesh).
        sp = config.spatial_shards
        dp = config.dp_shards or max(1, jax.device_count() // sp)
        # with --grad_accum the per-STEP unit on the 'data' axis is the
        # microbatch (pre-split composition), so dp must divide bs/accum
        _acc = int(getattr(config, "grad_accum", 1) or 1)
        _unit = config.bs // _acc if _acc > 1 else config.bs
        if _acc > 1 and config.bs % _acc != 0:
            raise ValueError(
                f"--grad_accum {_acc} does not divide --bs {config.bs}")
        while dp > 1 and _unit % dp != 0:
            dp -= 1
        idle = jax.device_count() - dp * sp
        if idle > 0:
            print(
                f"spatial train mesh: dp={dp} x sp={sp} uses {dp * sp} of "
                f"{jax.device_count()} devices ({idle} idle) — pick --bs "
                f"divisible by {jax.device_count() // sp} to use the full "
                f"mesh"
            )
        mesh = make_mesh_2d(dp, sp, batch_size=config.bs)
    else:
        mesh = make_mesh(config.dp_shards, batch_size=config.bs)
    model = make_model(config, tiny=tiny)
    geoms_t = model_geometries(config, "train")

    train_loader = make_loader(config, "train", mesh=mesh)
    eval_loader = make_loader(config, "online_eval")

    steps_per_epoch = len(train_loader)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    total_steps = config.epochs * steps_per_epoch
    tx = make_optimizer(config, total_steps)

    # init from the first batch's shapes
    sp_presplit = (
        getattr(config, "spatial_shards", 0) > 1
        and int(getattr(config, "grad_accum", 1) or 1) > 1)
    first_batch = next(iter(train_loader))
    if sp_presplit:
        # presplit leaves are [accum, mb, ...]; init from microbatch 0
        init_batch = {k: v[0] for k, v in first_batch.items()}
    else:
        init_batch = first_batch
    rng = jax.random.key(config.seed)
    if config.device_pipeline:
        from ..data.geometry import geometry_for as _gf
        from ..data.tof_sim_jax import device_preprocess as _dp

        _pg = _gf(config, "train")
        first_batch = dict(
            first_batch,
            **_dp(first_batch["image_raw"], first_batch["depth"][..., 0],
                  jax.random.fold_in(rng, 777), _pg,
                  max_distance=config.simu_max_distance,
                  zone_sample_num=config.zone_sample_num, train=True,
                  sample_uniform=config.sample_uniform),
        )
    state = create_train_state(model, config, rng, init_batch, geoms_t, tx)
    if jax.process_count() == 1:
        # Deterministic state placement: params/opt-state replicated over
        # the WHOLE mesh. The jitted init above already lands there via
        # the sharded first_batch, but make it explicit — jax 0.9.0
        # silently computes wrong gradients (instead of raising) when
        # single-device-committed params meet a P('data','spatial')
        # batch in one jit call (the round-5 placement hazard — see
        # scripts/sp_trainstep_diag.py and the strict-xfail canary
        # tests/test_spatial.py::test_upstream_mixed_placement_canary).
        # Multihost resume already re-places explicitly below.
        from ..parallel.mesh import replicated_sharding

        step_val = int(state.step)
        state = jax.device_put(state, replicated_sharding(mesh))
        state = state.replace(step=step_val)

    start_epoch, best_rmse = 0, float("inf")
    if config.resume:
        state, start_epoch, best_rmse = load_checkpoint(config.resume, state)
        # orbax restores onto a single device; re-place replicated on the mesh
        from ..parallel.mesh import replicated_sharding

        step_val = int(state.step)
        state = jax.device_put(state, replicated_sharding(mesh))
        state = state.replace(step=step_val)
        print(f"resumed from {config.resume} at epoch {start_epoch}")

    train_step = make_train_step(model, config, geoms_t, pre_split=sp_presplit)

    # --train_zone_random_offset N: zone-grid shift augmentation (reference
    # src/utils/dataloader.py:97-99, per-sample there). Zone geometry is
    # static per compile (the fusion scatter's keystone), so the offset
    # cycles per BATCH: zone_offset_for(seed, epoch, step) — the loader
    # computes the same value for its hist extraction (pipeline.py
    # producer) with no plumbing between the two. Each distinct offset
    # compiles its own train step (2N+1 total, persistent-cache-amortized).
    zone_off = int(getattr(config, "train_zone_random_offset", 0) or 0)
    if zone_off > 0 and config.device_pipeline:
        raise NotImplementedError(
            "--train_zone_random_offset with --device_pipeline is not "
            "wired (the on-device ToF sim uses one static geometry); "
            "drop one of the two flags")
    _step_fns = {0: train_step}

    def train_step_for(o: int):
        if o not in _step_fns:
            _step_fns[o] = make_train_step(
                model, config, model_geometries(config, "train", (o, o)),
                pre_split=sp_presplit)
        return _step_fns[o]

    logger = JsonlLogger(
        None if config.no_logging else os.path.join(config.save_dir, "train_log.jsonl")
    )

    device_prep = None
    if config.device_pipeline:
        from ..data.geometry import geometry_for
        from ..data.tof_sim_jax import device_preprocess

        pix_geom = geometry_for(config, "train")

        def device_prep(batch, prep_rng):
            out = device_preprocess(
                batch["image_raw"], batch["depth"][..., 0], prep_rng, pix_geom,
                max_distance=config.simu_max_distance,
                zone_sample_num=config.zone_sample_num,
                drop_hist=config.drop_hist, noise_prob=config.noise_prob,
                noise_mean=config.noise_mean, noise_sigma=config.noise_sigma,
                train=True, sample_uniform=config.sample_uniform,
            )
            return dict(batch, **out)

    geoms_e = model_geometries(config, "online_eval")
    eval_steps = (
        make_eval_step(model, config, geoms_e, protocol="validate"),
        make_metric_step(config, protocol="validate"),
    )

    step = int(state.step)
    for epoch in range(start_epoch, config.epochs):
        t_epoch = time.time()
        train_loader.set_epoch(epoch)  # align shuffle + zone-offset streams
        loss_avg = RunningAverage()
        for i, batch in enumerate(train_loader):
            if max_steps_per_epoch and i >= max_steps_per_epoch:
                break
            step_rng = jax.random.fold_in(rng, step)
            if device_prep is not None:
                batch = device_prep(batch, jax.random.fold_in(step_rng, 777))
            if zone_off > 0:
                from ..data.geometry import zone_offset_for

                train_step = train_step_for(
                    zone_offset_for(config.seed, epoch, i, zone_off))
            state, loss = train_step(state, batch, step_rng)
            loss_avg.append(float(loss))
            step += 1
            if step % 50 == 0:
                logger.log(kind="train", epoch=epoch, step=step, loss=float(loss))

        # Per-epoch validation + checkpointing. The reference gates on
        # ``step % validate_every`` (train.py:137), which silently skips
        # validation AND checkpointing whenever steps-per-epoch isn't a
        # divisor multiple; here ``validate_every`` is an epoch stride and
        # the final epoch always validates, so no run ends checkpoint-less.
        # Production configs use --validate_every 1 (every epoch) either way.
        stride = max(int(config.validate_every), 1)
        if (epoch + 1) % stride == 0 or epoch + 1 == config.epochs:
            # Under multihost the sharded path is NOT optional: post-step
            # params live replicated on the GLOBAL mesh while eval batches
            # are process-local single-device arrays — plain evaluate()'s
            # jit would reject the device mix. evaluate_sharded localizes
            # the replica and strides the images (identical metrics).
            if jax.process_count() > 1:
                metrics = evaluate_sharded(
                    model, config, state.params, state.batch_stats,
                    eval_loader.dataset, protocol="validate", steps=eval_steps,
                )
            else:
                metrics = evaluate(
                    model, config, state.params, state.batch_stats, eval_loader,
                    protocol="validate", tiny=tiny, steps=eval_steps,
                )
            rmse = metrics.get("rmse", float("inf"))
            logger.log(kind="val", epoch=epoch, step=step, **metrics)
            print(
                f"epoch {epoch}: loss {loss_avg.get_value():.4f} "
                f"rmse {rmse:.4f} ({time.time()-t_epoch:.0f}s)"
            )
            if not config.no_logging:
                save_checkpoint(
                    f"checkpoints/{config.name}/{epoch}_{rmse:.3f}", state, epoch, best_rmse
                )
                save_weights(
                    f"weights/{config.name}/{epoch}_{rmse:.3f}",
                    state.params, state.batch_stats,
                )
                if rmse < best_rmse:
                    best_rmse = rmse
                    save_checkpoint(
                        f"checkpoints/{config.name}/best", state, epoch, best_rmse
                    )
                    save_weights(
                        f"weights/{config.name}/best", state.params, state.batch_stats
                    )
    logger.close()
    return state
