"""Worker process for the multi-host test (SURVEY §2.7, VERDICT item 3).

Launched by tests/test_multihost.py as N processes, each with 4 virtual CPU
devices: initializes jax.distributed, builds the global 1-D DP mesh, feeds
its per-host shard through the production DataLoader/shard_batch path
(make_array_from_process_local_data), runs ONE jitted train step, and prints
the loss — which the parent compares across hosts and against a
single-process run of the identical global batch.

Usage: python tests/multihost_worker.py <process_id> <num_processes> <coord>
"""

import os
import sys

if __name__ == "__main__":
    # argv/env setup must precede any jax import — only in worker mode
    # (pytest also imports this module to reuse tiny_cfg)
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "").split("--xla_force_host_platform")[0]
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tiny_cfg(pid: int = -1, nproc: int = 0, coord: str = ""):
    from cfpnet_tpu.config import Config

    return Config(
        n_bins=16, bs=8, epochs=1,
        input_height=48, input_width=64,
        native_height=64, native_width=96,
        train_zone_num=2, eval_zone_num_cfg=2,
        train_patch_px=16, eval_patch_px=16,
        attention_layer=["hist2image", "combine1", "image"],
        change_embedding=True, disable_clip_grad=True, hist_encoder_10x=True,
        sample_uniform=True, dataset="synthetic", dataset_eval="synthetic",
        synthetic_length=8, no_logging=True,
        multihost=nproc > 0, coordinator_address=coord,
        num_processes=nproc, process_id=pid,
    )


def main(pid, nproc, coord):
    import jax

    from cfpnet_tpu.parallel.mesh import make_mesh, maybe_initialize_distributed
    from cfpnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = tiny_cfg(pid, nproc, coord)
    assert maybe_initialize_distributed(cfg)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()

    from cfpnet_tpu.data.datasets import SyntheticDataset
    from cfpnet_tpu.data.pipeline import DataLoader
    from cfpnet_tpu.models.deltar import make_model, model_geometries
    from cfpnet_tpu.train.optim import make_optimizer
    from cfpnet_tpu.train.steps import TrainState, make_train_step

    def kv_barrier(name):
        # Coordination-service barrier (pure gRPC — no XLA collective).
        # Gloo's cross-process context has a ~30s connect window; on this
        # 1-core box a compile-cache miss skews processes by minutes, so
        # every collective-executing program is AOT-compiled first and the
        # processes align HERE before running it.
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(name, timeout_in_ms=1_500_000)

    mesh = make_mesh(0, batch_size=cfg.bs)
    model = make_model(cfg, tiny=True)
    geoms = model_geometries(cfg, "train")
    loader = DataLoader(SyntheticDataset(cfg, "train", cfg.bs), cfg.bs,
                        shuffle=True, drop_last=True, seed=cfg.seed, mesh=mesh)
    batch = next(iter(loader))
    # each host decoded bs/nproc samples; the assembled array is global
    assert batch["image"].shape[0] == cfg.bs

    tx = make_optimizer(cfg, total_steps=4)
    rng = jax.random.key(cfg.seed)
    init_fn = jax.jit(
        lambda r, im, hh, mm: model.init(
            {"params": r, "fusion": jax.random.fold_in(r, 1)},
            im, hh, mm, geoms, train=True,
        )
    )
    c_init = init_fn.lower(
        rng, batch["image"], batch["hist_data"], batch["mask"]
    ).compile()
    kv_barrier("init_compiled")
    variables = c_init(rng, batch["image"], batch["hist_data"], batch["mask"])
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"), tx=tx,
    )

    step = make_train_step(model, cfg, geoms)
    step_rng = jax.random.fold_in(rng, 0)
    c_step = step.lower(state, batch, step_rng).compile()
    kv_barrier("step_compiled")
    state, loss = c_step(state, batch, step_rng)
    print(f"MULTIHOST_LOSS {pid} {float(loss):.10f}", flush=True)

    # sharded eval (VERDICT r2 item 7): each process sweeps a strided image
    # subset single-device, (mean,count) merged via ONE process_allgather —
    # must equal the single-process sweep bit-for-bit in expectation
    from cfpnet_tpu.data.datasets import SyntheticDataset
    from cfpnet_tpu.train.loop import evaluate_sharded

    ecfg = cfg.replace(mode="online_eval")
    eds = SyntheticDataset(ecfg, "online_eval", length=6)
    kv_barrier("eval_start")
    # per_image_hook must receive GLOBAL dataset indices (the hook is built
    # over the full dataset by evaluate_all's make_save_hook) — a process
    # seeing subset-local indices would mislabel/overwrite dump files
    hook_indices = []
    em = evaluate_sharded(model, ecfg, state.params, state.batch_stats, eds,
                          protocol="validate", barrier_fn=kv_barrier,
                          per_image_hook=lambda i, p, b, j:
                          hook_indices.append(int(i)))
    assert hook_indices == list(range(pid, 6, nproc)), hook_indices
    print(f"MULTIHOST_EVAL {pid} {em['rmse']:.10f} {em['a1']:.10f}",
          flush=True)
    kv_barrier("done")


if __name__ == "__main__":
    main(pid, nproc, coord)
