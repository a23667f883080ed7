"""Multi-host data parallelism (SURVEY §2.7, VERDICT round-1 item 3).

Launches 2 REAL processes x 4 virtual CPU devices each, initializes
``jax.distributed`` through the production ``maybe_initialize_distributed``
path, feeds per-host shards through ``DataLoader``/``shard_batch``
(``jax.make_array_from_process_local_data``), runs one jitted train step,
and asserts the loss agrees across hosts AND with a single-process run of
the identical global batch — proving the DCN-path plumbing computes the
same global update as single-host DP.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_loss_and_eval():
    """Same global batch + step on this process's 8 virtual devices, then
    the same 6-image eval sweep in one process."""
    import jax

    from cfpnet_tpu.data.datasets import SyntheticDataset
    from cfpnet_tpu.data.pipeline import DataLoader
    from cfpnet_tpu.models.deltar import make_model, model_geometries
    from cfpnet_tpu.parallel.mesh import make_mesh
    from cfpnet_tpu.train.optim import make_optimizer
    from cfpnet_tpu.train.steps import create_train_state, make_train_step
    from tests.multihost_worker import tiny_cfg

    cfg = tiny_cfg().replace(multihost=False, num_processes=0, process_id=-1)
    mesh = make_mesh(0, batch_size=cfg.bs)
    model = make_model(cfg, tiny=True)
    geoms = model_geometries(cfg, "train")
    loader = DataLoader(SyntheticDataset(cfg, "train", cfg.bs), cfg.bs,
                        shuffle=True, drop_last=True, seed=cfg.seed, mesh=mesh)
    batch = next(iter(loader))
    tx = make_optimizer(cfg, total_steps=4)
    rng = jax.random.key(cfg.seed)
    state = create_train_state(model, cfg, rng, batch, geoms, tx)
    step = make_train_step(model, cfg, geoms)
    state, loss = step(state, batch, jax.random.fold_in(rng, 0))

    from cfpnet_tpu.data.pipeline import make_loader
    from cfpnet_tpu.train.loop import evaluate

    ecfg = cfg.replace(mode="online_eval")
    eds = SyntheticDataset(ecfg, "online_eval", length=6)
    metrics = evaluate(model, ecfg, state.params, state.batch_stats,
                       make_loader(ecfg, "online_eval", dataset=eds),
                       protocol="validate")
    return float(loss), metrics


@pytest.mark.slow
def test_two_process_step_matches_single_process(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=REPO, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    losses, evals = {}, {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MULTIHOST_LOSS"):
                _, pid, val = line.split()
                losses[int(pid)] = float(val)
            if line.startswith("MULTIHOST_EVAL"):
                _, pid, rmse, a1 = line.split()
                evals[int(pid)] = (float(rmse), float(a1))
    assert set(losses) == {0, 1}, outs
    # both hosts computed the same (psum'd) global loss
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)

    ref, ref_metrics = _single_process_loss_and_eval()
    assert losses[0] == pytest.approx(ref, rel=1e-5), (losses, ref)

    # sharded eval: both hosts return the IDENTICAL merged global metrics
    # (each swept a different strided subset — the merge is the proof), and
    # they match the single-process sweep of the same 6 images. The
    # single-process bound is loose (5e-4): the distributed AdamW step's
    # reduction order differs at the f32 lsb, so the evaluated params differ
    # slightly (observed ~2e-5 on rmse) — same reason the loss check above
    # is rel=1e-5, not exact.
    assert set(evals) == {0, 1}, outs
    assert evals[0] == pytest.approx(evals[1], rel=1e-9)
    assert evals[0][0] == pytest.approx(ref_metrics["rmse"], rel=5e-4)
    assert evals[0][1] == pytest.approx(ref_metrics["a1"], rel=5e-4)
