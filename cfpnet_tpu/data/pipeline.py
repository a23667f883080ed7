"""Host -> device data pipeline.

Replaces the reference's 12-worker torch DataLoader
(/root/reference/src/dataloader/nyu.py:48-52) with a background-thread
prefetch pipeline that overlaps host decode/ToF-sim with device compute and
lands batches directly on the mesh (batch axis sharded — SURVEY.md §2.7).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from ..parallel.mesh import (shard_batch, shard_batch_spatial,
                             shard_batch_spatial_presplit)
from .geometry import zone_offset_for


def collate(samples) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples], axis=0) for k in keys}


class DataLoader:
    """Minimal epoch-based loader: shuffle, batch, background prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        mesh=None,
        zone_random_offset: int = 0,
        accum_presplit: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        if mesh is not None and jax.process_count() > 1:
            # each process decodes bs/nproc samples; a non-divisible batch
            # would silently shrink the global batch (ADVICE r2) — fail fast.
            nproc = jax.process_count()
            if batch_size % nproc != 0:
                raise ValueError(
                    f"multi-host data loading requires batch_size divisible "
                    f"by the process count: bs={batch_size}, "
                    f"processes={nproc}. Pick bs a multiple of {nproc}."
                )
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.mesh = mesh
        self.zone_random_offset = int(zone_random_offset)
        self.accum_presplit = int(accum_presplit)
        self.epoch = 0

    def set_epoch(self, epoch: int):
        """Pin the epoch counter (shuffle stream + zone-offset schedule).

        ``run_training`` calls this each epoch so the loader and the train
        loop agree on ``zone_offset_for(seed, epoch, step)`` — including
        after ``--resume`` (the implicit end-of-iteration increment starts
        from 0 in a fresh process) and after an early ``break`` (the
        increment is skipped when the consumer abandons the iterator)."""
        self.epoch = int(epoch)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_order(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict]:
        order = self._index_order()
        nb = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                nproc = jax.process_count()
                pid = jax.process_index()
                for b in range(nb):
                    if stop.is_set():
                        return
                    if self.zone_random_offset > 0:
                        # per-batch zone offset (reference train_zone_
                        # random_offset, per-sample there — see
                        # zone_offset_for): the single producer thread
                        # sets it before decoding the batch; run_training
                        # computes the SAME value for its geometry/step-fn
                        # choice from (seed, epoch, step)
                        self.dataset.zone_offset = zone_offset_for(
                            self.seed, self.epoch, b,
                            self.zone_random_offset)
                    lo = b * self.batch_size
                    chunk = order[lo : lo + self.batch_size]
                    full = len(chunk) == self.batch_size
                    if self.mesh is not None and full and nproc > 1:
                        # multi-host: every process sees the same global
                        # index order (same seed/epoch) and decodes ONLY its
                        # contiguous shard; shard_batch assembles the global
                        # array via make_array_from_process_local_data
                        per = self.batch_size // nproc
                        chunk = chunk[pid * per : (pid + 1) * per]
                    batch = collate([self.dataset[int(i)] for i in chunk])
                    if self.mesh is not None and full:
                        if "spatial" in self.mesh.axis_names:
                            # 2-D ('data','spatial') train mesh: image rows
                            # sharded over 'spatial' (single-controller
                            # only — shard_batch_spatial rejects multihost).
                            # With --grad_accum the microbatch split happens
                            # HERE on the host (P(None,'data','spatial')
                            # leaves) — the in-jit reshape miscompiles
                            # (sp_trainstep_diag stages M/M2).
                            if self.accum_presplit > 1:
                                batch = shard_batch_spatial_presplit(
                                    batch, self.mesh, self.accum_presplit)
                            else:
                                batch = shard_batch_spatial(batch, self.mesh)
                        else:
                            batch = shard_batch(batch, self.mesh)
                    elif self.mesh is None:
                        batch = jax.device_put(batch)
                    q.put(batch)
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
        self.epoch += 1


def make_loader(config, mode: str, mesh=None, dataset=None) -> DataLoader:
    """Loader policy matches the reference: train bs=config.bs shuffled;
    eval bs=1 sequential (reference nyu.py:48-59)."""
    from .datasets import make_dataset

    if dataset is None:
        dataset = make_dataset(config, mode)
    if mode == "train":
        spatial = mesh is not None and "spatial" in mesh.axis_names
        accum = int(getattr(config, "grad_accum", 1) or 1)
        return DataLoader(
            dataset, config.bs, shuffle=True, drop_last=True, seed=config.seed,
            mesh=mesh,
            zone_random_offset=(
                0 if getattr(config, "device_pipeline", False)
                else getattr(config, "train_zone_random_offset", 0)),
            accum_presplit=accum if (spatial and accum > 1) else 0,
        )
    return DataLoader(dataset, max(1, getattr(config, "eval_bs", 1)),
                      shuffle=False, drop_last=False)
