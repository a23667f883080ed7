"""Device mesh + sharding helpers.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
over 4 GPUs (/root/reference/train.py:45, run.sh:2) — replicate/scatter/
gather each step with implicit NCCL. The TPU-native equivalent is a 1-D
``jax.sharding.Mesh`` over the slice: parameters replicated, batch sharded on
the 'data' axis, gradient all-reduce emitted by XLA as ``psum`` over ICI
(SURVEY.md §2.6-2.7). The mesh is exposed so TP/SP axes can be added later;
DP is the capability contract.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
feed per-host shards via ``shard_batch`` (jax.make_array_from_process_local_
data) — collectives then ride ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed(config) -> bool:
    """Activate the multi-host runtime (SURVEY §2.7): one JAX process per
    host, collectives over ICI within a slice and DCN across hosts.

    Returns True when running multi-process. Controlled by ``--multihost``
    plus either explicit ``--coordinator_address/--num_processes/
    --process_id`` or the cluster env vars ``jax.distributed.initialize``
    auto-detects on TPU pods. Idempotent."""
    if not getattr(config, "multihost", False):
        return False
    import jax.distributed

    kw = {}
    if getattr(config, "coordinator_address", ""):
        kw["coordinator_address"] = config.coordinator_address
    if getattr(config, "num_processes", 0):
        kw["num_processes"] = config.num_processes
    if getattr(config, "process_id", -1) >= 0:
        kw["process_id"] = config.process_id
    # idempotence via the distributed-runtime state, not exception-message
    # parsing (ADVICE r2: the "already initialized" text is not a stable API)
    already = (
        jax.distributed.is_initialized()
        if hasattr(jax.distributed, "is_initialized")
        else getattr(
            getattr(jax.distributed, "global_state", None), "client", None
        ) is not None
    )
    if not already:
        jax.distributed.initialize(**kw)
    return jax.process_count() > 1


def make_mesh(dp_shards: int = 0, devices=None, batch_size: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over ``dp_shards`` devices (0 = all).

    When ``batch_size`` is given, the shard count is clamped to the largest
    divisor of the batch (a 1-chip mesh for bs=2 on an 8-device host, etc.).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = dp_shards if dp_shards > 0 else len(devices)
    n = min(n, len(devices))
    if batch_size is not None:
        while n > 1 and batch_size % n != 0:
            n -= 1
    return Mesh(np.array(devices[:n]), ("data",))


def make_mesh_2d(dp: int, sp: int, devices=None,
                 batch_size: Optional[int] = None) -> Mesh:
    """2-D ``('data', 'spatial')`` mesh: batch sharded over 'data', image
    ROWS sharded over 'spatial'. Spatial partitioning is beyond parity (the
    reference has no TP/SP of any kind — SURVEY §2.6): GSPMD splits every
    conv spatially and inserts halo exchanges over ICI, so a single image's
    latency scales across chips instead of only throughput."""
    if dp < 1 or sp < 1:
        raise ValueError(f"mesh axes must be >= 1, got dp={dp} sp={sp}")
    devices = list(devices if devices is not None else jax.devices())
    if dp * sp > len(devices):
        raise ValueError(
            f"mesh {dp}x{sp} needs {dp * sp} devices, have {len(devices)}")
    if batch_size is not None and batch_size % dp != 0:
        raise ValueError(f"batch {batch_size} not divisible by dp={dp}")
    return Mesh(np.array(devices[: dp * sp]).reshape(dp, sp), ("data", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict on the mesh, sharded along the batch axis."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch
        )
    return jax.device_put(batch, sh)


def shard_batch_spatial(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch on a 2-D ``('data', 'spatial')`` mesh: EVERY 4-D
    ``[B, H, W, C]`` array is sharded (batch, rows), everything else is
    batch-sharded and replicated over 'spatial'. All-4-D rather than a key
    allowlist (ADVICE r3): a new image-like key silently falling back to
    batch-only sharding would be a quiet perf regression, and no 4-D batch
    key with a non-spatial dim-1 exists. Inputs for ``make_eval_step``
    under spatial partitioning — the jitted step needs no changes; GSPMD
    propagates the input sharding through the convs (halo exchanges) and
    regroups the fusion/attention tokens with collectives."""
    if "spatial" not in mesh.axis_names:
        return shard_batch(batch, mesh)
    if jax.process_count() > 1:
        raise NotImplementedError(
            "spatial partitioning is single-controller; use shard_batch "
            "for multi-host DP")
    sp = mesh.shape["spatial"]
    dp = mesh.shape["data"]
    for k, v in batch.items():
        # this jax rejects uneven device_put shardings with a raw
        # internals error; fail with the CLI vocabulary instead
        if np.ndim(v) >= 1 and np.shape(v)[0] % dp != 0:
            raise ValueError(
                f"batch[{k!r}] has batch dim {np.shape(v)[0]} — not "
                f"divisible by the {dp}-way 'data' mesh axis")
        if np.ndim(v) == 4 and v.shape[1] % sp != 0:
            raise ValueError(
                f"batch[{k!r}] has {v.shape[1]} rows — not divisible by "
                f"the {sp}-way 'spatial' mesh axis; pick --spatial_shards "
                f"from the divisors of the image height")
    return {
        k: jax.device_put(
            v,
            NamedSharding(
                mesh,
                P("data", "spatial") if np.ndim(v) == 4 else P("data"),
            ),
        )
        for k, v in batch.items()
    }


def shard_batch_spatial_presplit(batch: dict, mesh: Mesh, accum: int) -> dict:
    """Microbatch-split a host batch on the HOST, then place it on a 2-D
    ``('data','spatial')`` mesh: each leaf ``[B, ...]`` becomes
    ``[accum, B/accum, ...]`` with the leading (microbatch) axis
    REPLICATED — ``P(None,'data','spatial')`` for image-like leaves,
    ``P(None,'data')`` otherwise. Feeds ``make_train_step(...,
    pre_split=True)``: the in-jit ``(accum, B/accum)`` reshape of a
    ``P('data','spatial')`` batch miscompiles on this XLA
    (sp_trainstep_diag stage M), and so does ``lax.scan`` over the
    pre-split leaves — only split-on-host + a trace-time-unrolled
    microbatch loop is f64-clean (stage M2, ~1e-13)."""
    if "spatial" not in mesh.axis_names:
        raise ValueError("presplit sharding needs a ('data','spatial') mesh")
    if jax.process_count() > 1:
        raise NotImplementedError(
            "spatial partitioning is single-controller; use shard_batch "
            "for multi-host DP")
    sp = mesh.shape["spatial"]
    dp = mesh.shape["data"]
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if v.ndim < 1 or v.shape[0] % accum != 0:
            raise ValueError(
                f"batch[{k!r}] batch dim {v.shape[:1]} not divisible by "
                f"--grad_accum {accum}")
        mb = v.shape[0] // accum
        if mb % dp != 0:
            raise ValueError(
                f"batch[{k!r}] microbatch size {mb} not divisible by the "
                f"{dp}-way 'data' mesh axis (bs={v.shape[0]}, "
                f"grad_accum={accum})")
        if v.ndim == 4 and v.shape[1] % sp != 0:
            raise ValueError(
                f"batch[{k!r}] has {v.shape[1]} rows — not divisible by "
                f"the {sp}-way 'spatial' mesh axis")
        spec = P(None, "data", "spatial") if v.ndim == 4 else P(None, "data")
        out[k] = jax.device_put(
            v.reshape((accum, mb) + v.shape[1:]), NamedSharding(mesh, spec))
    return out
