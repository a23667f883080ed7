"""Round-5 spatial TRAIN-STEP audit — the script that found the placement
hazard. Runs the exact test computation (tiny model, full train step,
lr=1 SGD, dp2sp2 virtual-CPU mesh) under controlled variations and prints
the top-10 param-update leaves by |sharded - single-device|.

MEASURED CONCLUSIONS (this box, jax 0.9.0, stages as below):

1. THE PLACEMENT HAZARD. Feeding params committed to device 0 (the
   jitted init's output placement) together with a P('data','spatial')
   batch makes jax silently compute wrong gradients instead of raising:
   full-step backbone updates off by up to ~5x the max gradient in BOTH
   f32 and f64 (stages B/C/G), loss still correct. With the state
   device_put REPLICATED on the mesh first — the production placement —
   the same step is clean to ~1e-13 f64 (H) / 7.5e-5*gscale f32 noise
   (H32). run_training performs that device_put; the strict-xfail canary
   tests/test_spatial.py::test_upstream_mixed_placement_canary tracks
   upstream.
2. NO MODEL CHANGES NEEDED for spatial training: with mesh placement the
   raw graph is clean WITHOUT sharding pins (I), without the GSA custom
   VJP, and even without --safe_dw_vjp at this graph shape (J); grad-only
   graphs agree (K). The gsa.sr = 1/dp "miscompile" round 5 first chased
   (and "fixed" with sharding pins) was the placement artifact in
   disguise.
3. THE GROUPED-CONV BUG IS REAL AND COMPOSES. For P('data')-only batches
   on the same 2-D mesh, conv_dw kernel grads come back wrong (0.28-0.59
   x gscale) with safe_dw_vjp off, IDENTICALLY for mesh-placed and
   device-0 state (L/L2) — so --safe_dw_vjp stays required on multi-axis
   meshes; placement does not excuse it.

Stages: A f32 dp-only noise floor · B/C/G device-0 state (the hazard,
f32/f64/cdt-f64) · H/H32 mesh-placed state (clean) · I no-set_mesh ·
J +no-safe-vjp · K grad-only · L/L2 P('data')-on-2-D grouped-conv repro.
Run: python scripts/sp_trainstep_diag.py [stage ...]
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cfpnet_tpu.config import Config
from cfpnet_tpu.data.datasets import SyntheticDataset
from cfpnet_tpu.data.pipeline import collate
from cfpnet_tpu.models.deltar import make_model, model_geometries
from cfpnet_tpu.parallel.mesh import make_mesh, make_mesh_2d, \
    shard_batch, shard_batch_spatial
from cfpnet_tpu.train.steps import create_train_state, make_train_step
from cfpnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def tiny_config(**kw):
    base = dict(
        n_bins=16, input_height=48, input_width=64, native_height=64,
        native_width=96, train_zone_num=2, eval_zone_num_cfg=2,
        train_patch_px=16, eval_patch_px=16, zone_sample_num=16,
        sample_uniform=True,
        attention_layer=["hist2image", "combine1", "image"],
        change_embedding=True, disable_clip_grad=True,
        hist_encoder_10x=True, bs=4, epochs=1, safe_dw_vjp=True)
    base.update(kw)
    return Config(**base)


def cast_tree(tree, dt):
    import jax.numpy as jnp
    return jax.tree_util.tree_map(
        lambda a: a.astype(dt)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a, tree)


def run(name, x64, spatial, pins=True, grad_only=False, aux=True,
        compute_dtype="float32", replicate_state=False, safe_vjp=True,
        grad_accum=1, presplit=False):
    import jax.numpy as jnp

    if x64:
        jax.config.update("jax_enable_x64", True)
    try:
        cfg = tiny_config(compute_dtype=compute_dtype, safe_dw_vjp=safe_vjp,
                          grad_accum=grad_accum)
        model = make_model(cfg, tiny=True)
        geoms = model_geometries(cfg, "train")
        ds = SyntheticDataset(cfg, "train", length=4)
        batch = collate([ds[i] for i in range(4)])
        rng = jax.random.key(0)
        state = create_train_state(
            model, cfg, rng, jax.device_put(batch), geoms, optax.sgd(1.0))
        if x64:
            state = state.replace(params=cast_tree(state.params, jnp.float64),
                                  batch_stats=cast_tree(state.batch_stats,
                                                        jnp.float64))
            batch = {k: np.asarray(v, np.float64)
                     if np.issubdtype(np.asarray(v).dtype, np.floating)
                     else v for k, v in batch.items()}
        srng = jax.random.fold_in(rng, 1)
        if grad_only:
            from cfpnet_tpu.train.steps import make_loss_fn

            loss_fn = make_loss_fn(model, cfg, geoms)
            if aux:
                def step(state, b, r):
                    (loss, _), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(
                            state.params, state.batch_stats, b, r)
                    return state.replace(params=grads), loss
            else:
                def step(state, b, r):
                    grads = jax.grad(
                        lambda p: loss_fn(p, state.batch_stats, b, r)[0])(
                            state.params)
                    return state.replace(params=grads), jnp.zeros(())
            step = jax.jit(step)
            # param "delta" below is then the raw gradient (base_p - grads
            # makes gscale the max |grad| + |param|; good enough for ranking)
        else:
            step = jax.jit(make_train_step(model, cfg, geoms, jit=False,
                                           pre_split=presplit))

        if presplit:
            batch = {k: np.reshape(
                np.asarray(v),
                (grad_accum, np.shape(v)[0] // grad_accum)
                + tuple(np.shape(v)[1:]))
                for k, v in batch.items()}
        ref_state, ref_loss = step(state, jax.device_put(batch), srng)

        if spatial == "dp_on_2d":
            # P('data')-only batch on the 2-D mesh — the r4 grouped-conv
            # canary's operand layout, composed into the full step
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh = make_mesh_2d(2, 2)
            sharded = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
                       for k, v in batch.items()}
            if replicate_state:
                from cfpnet_tpu.parallel.mesh import replicated_sharding

                state = jax.device_put(state, replicated_sharding(mesh))
            got_state, got_loss = step(state, sharded, srng)
        elif spatial:
            mesh = make_mesh_2d(2, 2)
            if presplit:
                from jax.sharding import NamedSharding, PartitionSpec as P

                sharded = {k: jax.device_put(v, NamedSharding(
                    mesh, P(None, "data", "spatial") if np.ndim(v) == 5
                    else P(None, "data")))
                    for k, v in batch.items()}
            else:
                sharded = shard_batch_spatial(batch, mesh)
            if replicate_state:
                from cfpnet_tpu.parallel.mesh import replicated_sharding

                state = jax.device_put(state, replicated_sharding(mesh))
            if pins:
                with jax.sharding.set_mesh(mesh):
                    got_state, got_loss = step(state, sharded, srng)
            else:
                got_state, got_loss = step(state, sharded, srng)
        else:
            mesh = make_mesh(4)
            sharded = shard_batch(batch, mesh)
            got_state, got_loss = step(state, sharded, srng)

        ref_p = jax.device_get(ref_state.params)
        got_p = jax.device_get(got_state.params)
        base_p = jax.device_get(state.params)
        if grad_only:
            base_p = jax.tree_util.tree_map(np.zeros_like, ref_p)
        gscale = max(
            float(np.max(np.abs(np.asarray(r, np.float64)
                                - np.asarray(b, np.float64))))
            for r, b in zip(jax.tree_util.tree_leaves(ref_p),
                            jax.tree_util.tree_leaves(base_p)))
        rows = []
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(got_p),
                jax.tree_util.tree_leaves_with_path(ref_p)):
            d = float(np.max(np.abs(np.asarray(a, np.float64)
                                    - np.asarray(b, np.float64))))
            rows.append((d, jax.tree_util.keystr(pa)))
        rows.sort(reverse=True)
        print(f"[{name}] loss ref={float(ref_loss):.9g} "
              f"got={float(got_loss):.9g} gscale={gscale:.3e}", flush=True)
        for d, k in rows[:10]:
            print(f"   {d:.6e}  ({d / gscale:.2e} x gscale)  {k}",
                  flush=True)
    finally:
        if x64:
            jax.config.update("jax_enable_x64", False)


if __name__ == "__main__":
    stages = sys.argv[1:] or ["A", "B", "C"]
    if "A" in stages:
        run("A f32 dp4 1-D", x64=False, spatial=False)
    if "B" in stages:
        run("B f32 dp2sp2 pins", x64=False, spatial=True)
    if "C" in stages:
        run("C f64 dp2sp2 pins", x64=True, spatial=True)
    # D: grads through make_loss_fn only (value_and_grad + aux updates,
    #    no optimizer) — separates the step wrapper from the loss graph
    if "D" in stages:
        run("D f64 dp2sp2 pins grad-only aux", x64=True, spatial=True,
            grad_only=True, aux=True)
    # E: pure jax.grad, stats closed over, no aux — the bisect's exact
    #    shape (clean there); if this fails the diag construction differs
    if "E" in stages:
        run("E f64 dp2sp2 pins grad-only noaux", x64=True, spatial=True,
            grad_only=True, aux=False)
    # G: full step with compute_dtype=float64 — removes make_loss_fn's
    #    f32 input casts from the f64 graph
    if "G" in stages:
        run("G f64 dp2sp2 pins step cdt=f64", x64=True, spatial=True,
            compute_dtype="float64")
    # H: full step with the state REPLICATED over the mesh first — the
    #    production placement (run_training inits from a sharded batch /
    #    re-places resumed state replicated); C/G instead fed device-0-
    #    committed params alongside the mesh-sharded batch, a mixed-
    #    device-set scenario production never constructs
    if "H" in stages:
        run("H f64 dp2sp2 pins step repl-state", x64=True, spatial=True,
            replicate_state=True)
    if "H32" in stages:
        run("H32 f32 dp2sp2 pins step repl-state", x64=False, spatial=True,
            replicate_state=True)
    # I: replicated state, NO set_mesh/pins — does the full step still
    #    show the gsa.sr 1/dp signature without the pins?
    if "I" in stages:
        run("I f64 dp2sp2 raw step repl-state", x64=True, spatial=True,
            replicate_state=True, pins=False)
    # J: replicated state, no pins, safe_dw_vjp OFF — is the grouped-conv
    #    dL/dW miscompile also a placement artifact, or real with
    #    production placement?
    if "J" in stages:
        run("J f64 dp2sp2 raw step repl-state no-safe-vjp", x64=True,
            spatial=True, replicate_state=True, pins=False, safe_vjp=False)
    # K: grad-only, replicated state, no pins — was the original gsa.sr
    #    1/dp bisect failure (device-0 params) a placement artifact?
    if "K" in stages:
        run("K f64 dp2sp2 raw grad-only repl-state", x64=True, spatial=True,
            replicate_state=True, pins=False, grad_only=True, aux=False)
    # L: P('data')-only batch on the 2-D mesh (the r4 requirement's
    #    scenario), replicated state, safe_dw_vjp OFF — does the composed
    #    grouped-conv dL/dW miscompile survive production placement?
    if "L" in stages:
        run("L f64 dp-on-2d raw step repl-state no-safe-vjp", x64=True,
            spatial="dp_on_2d", replicate_state=True, pins=False,
            safe_vjp=False)
    if "L2" in stages:
        run("L2 f64 dp-on-2d raw step device0-state no-safe-vjp", x64=True,
            spatial="dp_on_2d", replicate_state=False, pins=False,
            safe_vjp=False)
    # M: --grad_accum 2 composed with spatial sharding (scan over
    #    microbatches inside the step). MEASURED: FAILS in f64 even with
    #    mesh-placed state — the (accum, bs/accum, ...) microbatch reshape
    #    of a P('data','spatial') batch corrupts BOTH loss (1e-4 rel) and
    #    param updates (up to 0.75 x gscale). run_training rejects the
    #    combination; re-run this stage on any jax/XLA bump.
    if "M" in stages:
        run("M f64 dp2sp2 step repl-state accum2", x64=True, spatial=True,
            replicate_state=True, pins=False, grad_accum=2)
    # M2: the pre-split workaround for M — microbatches split on the HOST
    #    (shard_batch_spatial_presplit / make_train_step(pre_split=True)).
    #    MEASURED: lax.scan over the P(None,'data','spatial') leaves STILL
    #    miscompiles the backward (~6e-2 x gscale across many leaves, loss
    #    exact — a THIRD distinct partitioner wrong-answer); with the
    #    microbatch loop UNROLLED at trace time (static-index slices, the
    #    shipped pre_split path) the same composition is f64-clean to
    #    ~1e-13. Re-run on any jax/XLA bump.
    if "M2" in stages:
        run("M2 f64 dp2sp2 step repl-state accum2 PRESPLIT", x64=True,
            spatial=True, replicate_state=True, pins=False, grad_accum=2,
            presplit=True)
