"""AOT serving artifacts via ``jax.export`` (StableHLO).

Production-serving capability the reference lacks entirely (its deployment
story ends at ``evaluate_time.py``'s latency loop —
/root/reference/evaluate_time.py:49-82). A serving artifact is a directory:

    manifest.json        — shapes, dtypes, protocol, platforms, file map
    fwd_bs{N}.stablehlo  — one serialized ``jax.export.Exported`` per
                           exported batch size (weights baked in as module
                           constants — the artifact is self-contained; no
                           checkpoint, no model code, no flax needed at
                           serving time)

The exported computation is the COMPLETE eval path: raw uint8 RGB in,
ImageNet normalization on device, the full fused forward, and the eval
protocol's post-processing (align-corners upsample to input size, NaN/Inf
fixups, clamp to the eval depth bounds — reference train.py:187-195 /
evaluate_all.py:37-44). Output is final metric depth in meters.

TPU-first notes:
- batch sizes are STATIC (one exported function per size) — XLA:TPU wants
  static shapes; ``ServingModel.predict`` pads partial batches to the
  smallest exported size that fits.
- exported with ``platforms=("cpu", "tpu")`` by default: one artifact runs
  on a TPU serving fleet and on CPU fallback/test hosts.
- the guarded bf16 fast mode exports exactly as it trains/evals: bf16
  compute with the depth-reconstruction tail pinned to f32 inside the model
  (models/deltar.py), so serving numerics match `--compute_dtype bfloat16`
  evaluation bit-for-bit on the same platform.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Sequence

import numpy as np

MANIFEST_NAME = "manifest.json"
FORMAT = "cfpnet-serving-v1"


def geometry_dict(geoms) -> Dict[str, dict]:
    """JSON form of a per-scale geometry map ({conv_patch_size:
    ScaleGeometry}) — recorded in the manifest so artifact-backed evaluation
    can verify the exported zone geometry matches the eval dataset's
    (measured ZJUL5 rigs vs the config-derived NYU grid)."""
    return {str(cps): dataclasses.asdict(g) for cps, g in sorted(geoms.items())}


def make_serving_forward(model, config, geoms, params, batch_stats,
                         compute_dtype=None, protocol: str = "validate"):
    """Closure ``(image_u8, hist, mask) -> depth_m`` over baked weights.

    image_u8: [B,H,W,3] uint8 raw RGB; hist: [B,Z,S] f32 sampled depth
    points; mask: [B,Z] bool valid zones. Returns [B,H,W] f32 meters.

    The body reuses the exact eval-step semantics (train/steps.py::
    make_eval_step): normalize like ``eval_batch_image``, forward, then the
    requested protocol's post-processing.
    """
    import jax.numpy as jnp

    from ..data.datasets import IMAGENET_MEAN, IMAGENET_STD
    from ..ops.interp import resize_bilinear_align_corners

    cdt = jnp.dtype(compute_dtype or config.compute_dtype)

    def cast(tree):
        if cdt == jnp.float32:
            return tree
        import jax

        return jax.tree_util.tree_map(
            lambda x: x.astype(cdt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    params = cast(params)
    batch_stats = cast(batch_stats) if batch_stats is not None else None

    def fwd(image_u8, hist, mask):
        img = image_u8.astype(jnp.float32) / 255.0
        img = (img - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        _, pred, _, _ = model.apply(
            variables, img.astype(cdt), hist.astype(cdt), mask, geoms,
            train=False,
        )
        H, W = image_u8.shape[1], image_u8.shape[2]
        if protocol == "evaluate_all":
            pred = jnp.clip(pred, config.min_depth, config.max_depth)
            pred = resize_bilinear_align_corners(pred, H, W)
        else:
            pred = resize_bilinear_align_corners(pred, H, W)
            pred = jnp.where(jnp.isinf(pred), config.max_depth_eval, pred)
            pred = jnp.where(jnp.isnan(pred), config.min_depth_eval, pred)
            pred = jnp.clip(pred, config.min_depth_eval, config.max_depth_eval)
        return pred[..., 0].astype(jnp.float32)

    return fwd


def export_serving_artifact(
    config,
    params,
    batch_stats,
    dst: str,
    batch_sizes: Sequence[int] = (1,),
    compute_dtype: Optional[str] = None,
    protocol: str = "validate",
    platforms: Sequence[str] = ("cpu", "tpu"),
    tiny: bool = False,
    geoms=None,
    geometry_source: str = "config",
) -> str:
    """Export the eval forward for each batch size; write ``dst/``.

    Returns the manifest path. Weights are baked into the modules as
    constants, so ``dst`` is the complete deployable unit.

    ``geoms`` overrides the config-derived zone geometry — pass a dataset's
    measured ``scale_geoms`` (ZJUL5 ``fr`` rects) to bake the real rig's
    zone-to-pixel mapping into the artifact, exactly like the live eval
    driver uses it (train/loop.py:52-54). The zone count for the hist input
    follows the geometry (so ``zone_type`` sub-grid ablations export with
    the right shapes), and the geometry is recorded in the manifest for
    pre-deployment validation (evaluate_all.artifact_eval_steps).
    """
    import jax
    from jax import export as jexport

    from ..models.deltar import make_model, model_geometries

    if getattr(config, "use_pallas", False):
        raise ValueError(
            "serving export requires --use_pallas off: Pallas kernels are "
            "not portable across the exported platform set")

    config = config.replace(mode="online_eval")
    model = make_model(config, tiny=tiny)
    if geoms is None:
        geoms = model_geometries(config, "online_eval")
    h, w = config.native_height, config.native_width
    zn = next(iter(geoms.values())).zone_num
    zones, s = zn * zn, config.zone_sample_num

    fwd = make_serving_forward(model, config, geoms, params, batch_stats,
                               compute_dtype=compute_dtype,
                               protocol=protocol)

    os.makedirs(dst, exist_ok=True)
    files: Dict[str, str] = {}
    for bs in sorted(set(int(b) for b in batch_sizes)):
        args = (
            jax.ShapeDtypeStruct((bs, h, w, 3), np.uint8),
            jax.ShapeDtypeStruct((bs, zones, s), np.float32),
            jax.ShapeDtypeStruct((bs, zones), np.bool_),
        )
        exported = jexport.export(jax.jit(fwd),
                                  platforms=tuple(platforms))(*args)
        fname = f"fwd_bs{bs}.stablehlo"
        with open(os.path.join(dst, fname), "wb") as f:
            f.write(bytes(exported.serialize()))
        files[str(bs)] = fname

    manifest = {
        "format": FORMAT,
        "platforms": list(platforms),
        "protocol": protocol,
        "compute_dtype": str(compute_dtype or config.compute_dtype),
        "batch_sizes": sorted(int(b) for b in files),
        "input": {
            "image_u8": [None, h, w, 3],
            "hist": [None, zones, s],
            "mask": [None, zones],
        },
        "output": "depth_m [B, H, W] float32",
        "geometry": {
            "source": geometry_source,
            "zone_num": zn,
            "scales": geometry_dict(geoms),
        },
        "n_bins": int(config.n_bins),
        "jax_version": jax.__version__,
        "files": files,
    }
    mpath = os.path.join(dst, MANIFEST_NAME)
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=2)
    return mpath


class ServingModel:
    """Load a serving artifact and predict — no flax/model code involved.

    >>> m = ServingModel("artifacts/cfpnet")
    >>> depth = m.predict(image_u8, hist, mask)   # [N,H,W] f32 meters

    Partial batches are padded to the smallest exported batch size that
    fits (padding rows are zero images with all-invalid masks) and the
    result sliced back. N larger than the largest exported size is chunked.
    """

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, MANIFEST_NAME)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("format") != FORMAT:
            raise ValueError(
                f"not a {FORMAT} artifact: {self.manifest.get('format')!r}")
        self.batch_sizes = sorted(int(b) for b in self.manifest["files"])
        self._fns: Dict[int, object] = {}
        self._sharded: Dict[tuple, object] = {}

    def _fn(self, bs: int):
        if bs not in self._fns:
            from jax import export as jexport

            fname = self.manifest["files"][str(bs)]
            with open(os.path.join(self.path, fname), "rb") as f:
                self._fns[bs] = jexport.deserialize(bytearray(f.read()))
        return self._fns[bs]

    def exported(self, batch_size: int):
        """The deserialized ``jax.export.Exported`` for one exported batch
        size — its ``.call`` is traceable inside another jit (used by
        evaluate_time's ``--serving_artifact`` chained latency mode)."""
        if batch_size not in self.batch_sizes:
            raise KeyError(
                f"batch size {batch_size} not exported; have {self.batch_sizes}")
        return self._fn(batch_size)

    def _predict_exact(self, image_u8, hist, mask) -> np.ndarray:
        bs = image_u8.shape[0]
        out = self._fn(bs).call(image_u8, hist, mask)
        return np.asarray(out)

    def _chunked(self, image_u8, hist, mask, sizes, run) -> np.ndarray:
        """Pad/chunk ``n`` samples through the exported sizes ``sizes``,
        calling ``run(img, hist, mask)`` per exact-size chunk."""
        image_u8 = np.ascontiguousarray(image_u8, np.uint8)
        hist = np.ascontiguousarray(hist, np.float32)
        mask = np.ascontiguousarray(mask, bool)
        n = image_u8.shape[0]
        outs = []
        i = 0
        while i < n:
            take = min(n - i, sizes[-1])
            bs = next(b for b in sizes if b >= take)
            take = min(take, bs)
            pad = bs - take

            def pick(a):
                chunk = a[i:i + take]
                if pad:
                    z = np.zeros((pad,) + a.shape[1:], a.dtype)
                    chunk = np.concatenate([chunk, z], axis=0)
                return chunk

            pred = np.asarray(run(pick(image_u8), pick(hist), pick(mask)))
            outs.append(pred[:take])
            i += take
        return np.concatenate(outs, axis=0)

    def predict(self, image_u8, hist, mask) -> np.ndarray:
        return self._chunked(image_u8, hist, mask, self.batch_sizes,
                             self._predict_exact)

    def _sharded_fn(self, bs: int, mesh):
        """jit of the deserialized module with batch-axis shardings — XLA's
        SPMD partitioner splits the inlined StableHLO computation across the
        mesh (pure DP: no collectives in the eval forward)."""
        key = (bs, mesh)
        if key not in self._sharded:
            import jax

            from ..parallel.mesh import batch_sharding

            sh = batch_sharding(mesh)
            self._sharded[key] = jax.jit(
                self._fn(bs).call, in_shardings=(sh, sh, sh),
                out_shardings=sh)
        return self._sharded[key]

    def predict_sharded(self, image_u8, hist, mask, mesh=None) -> np.ndarray:
        """Data-parallel predict over a device mesh (beyond-parity: the
        reference serves strictly single-device bs=1 —
        /root/reference/evaluate_all.py:95).

        Shards the batch axis of an exported module across a 1-D ``'data'``
        mesh (default: all local devices, clamped to a divisor of the
        largest exported batch size). Only exported sizes divisible by the
        mesh size are used; partial batches pad/chunk exactly like
        ``predict``. The partitioned program is a separate XLA compilation,
        so results match ``predict`` to f32-reassociation tolerance (same
        ~1e-3 bound as the artifact's other cross-compilation equalities),
        not bitwise."""
        from ..parallel.mesh import make_mesh

        if mesh is None:
            mesh = make_mesh(batch_size=self.batch_sizes[-1])
        ndev = int(mesh.devices.size)
        sizes = [b for b in self.batch_sizes if b % ndev == 0]
        if not sizes:
            raise ValueError(
                f"no exported batch size in {self.batch_sizes} is divisible "
                f"by the {ndev}-device mesh; re-export with a divisible "
                f"--serve_batch_sizes or pass a smaller mesh")
        return self._chunked(
            image_u8, hist, mask, sizes,
            lambda im, hh, mm: self._sharded_fn(im.shape[0], mesh)(im, hh, mm))
