#!/usr/bin/env python
"""PyTorch -> JAX weight importer.

Two import paths (SURVEY.md §2.8 — pretrained weights are capability-
critical for metric parity):

1. ``import_timm_backbone(state_dict)``: a timm ``tf_efficientnetv2_b3``
   checkpoint -> our ``img_encoder/backbone`` params + batch_stats.
2. ``import_reference_checkpoint(state_dict)``: a full reference-trained
   ``Deltar`` checkpoint (/root/reference/src/utils/model_io.py format,
   ``module.``-prefix tolerated) -> our complete param/batch_stats trees.

Name mapping follows the reference module graph:
- ``img_encoder.conv0.0`` = conv_stem, ``.conv0.1`` = bn1, ``.conv0.2.{i}`` =
  stage0 block i; ``conv1/conv2`` = stages 1/2; ``conv3.0/.1`` = stages 3/4;
  ``conv4`` = stage 5 (reference encoder.py:58-69).
- fusion/transformer/decoder/head names per src/models/{fusion,transformer,
  decoder,deltar}.py.

Tensor layout transforms: conv OIHW->HWIO, depthwise [C,1,k,k]->[k,k,1,C],
Linear/Conv1d(k=1) [O,I(,1)]->[I,O], BN/LN weight->scale. The reference's
dead parameters (``Block14.conv1/bn1``-the-unused-one, ``gamma``,
``num_batches_tracked``) are skipped.

CLI:
    python tools/import_torch_weights.py --src ckpt.pt --dst weights/imported \
        [--kind reference|timm] [--config @configs/X.txt ...]
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, Tuple

import numpy as np

# make `python tools/import_torch_weights.py` work from anywhere: as a
# script, sys.path gets tools/, not the repo root that holds cfpnet_tpu
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---------------------------------------------------------------- transforms


def t_conv(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def t_dwconv(w):  # [C,1,k,k] -> [k,k,1,C]
    return np.transpose(w, (2, 3, 1, 0))


def t_dense(w):  # [O,I] -> [I,O]
    return np.transpose(w, (1, 0))


def t_conv1d(w):  # [O,I,1] -> [I,O]
    return np.transpose(w[:, :, 0], (1, 0))


def t_raw(w):
    return np.asarray(w)


# ------------------------------------------------------------- tree building


def _set(tree: Dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _block_entries(block_kind: str):
    """(torch_subname, flax_subname, transform, collection) per block param."""

    def bn(tname, fname):
        return [
            (f"{tname}.weight", (fname, "scale"), t_raw, "params"),
            (f"{tname}.bias", (fname, "bias"), t_raw, "params"),
            (f"{tname}.running_mean", (fname, "mean"), t_raw, "batch_stats"),
            (f"{tname}.running_var", (fname, "var"), t_raw, "batch_stats"),
        ]

    if block_kind == "cn":
        return [("conv.weight", ("conv", "kernel"), t_conv, "params")] + bn("bn1", "bn1")
    if block_kind == "er":
        return (
            [("conv_exp.weight", ("conv_exp", "kernel"), t_conv, "params")]
            + bn("bn1", "bn1")
            + [("conv_pwl.weight", ("conv_pwl", "kernel"), t_conv, "params")]
            + bn("bn2", "bn2")
        )
    # ir
    return (
        [("conv_pw.weight", ("conv_pw", "kernel"), t_conv, "params")]
        + bn("bn1", "bn1")
        + [("conv_dw.weight", ("conv_dw", "kernel"), t_dwconv, "params")]
        + bn("bn2", "bn2")
        + [
            ("se.conv_reduce.weight", ("se", "conv_reduce", "kernel"), t_conv, "params"),
            ("se.conv_reduce.bias", ("se", "conv_reduce", "bias"), t_raw, "params"),
            ("se.conv_expand.weight", ("se", "conv_expand", "kernel"), t_conv, "params"),
            ("se.conv_expand.bias", ("se", "conv_expand", "bias"), t_raw, "params"),
        ]
        + [("conv_pwl.weight", ("conv_pwl", "kernel"), t_conv, "params")]
        + bn("bn3", "bn3")
    )


def backbone_mapping(stages=None, timm_prefix: bool = True):
    """Mapping timm-style keys -> (flax path under backbone/, transform,
    collection). With ``timm_prefix=False``, keys use the reference
    ImageEncoder wrapper names instead."""
    from cfpnet_tpu.models.efficientnetv2 import V2_B3_STAGES

    stages = stages or V2_B3_STAGES
    out = {}
    out["conv_stem.weight"] = (("conv_stem", "kernel"), t_conv, "params")
    for tn, fp, tr, col in _bn_entries("bn1", "bn1"):
        out[tn] = (fp, tr, col)
    for si, spec in enumerate(stages):
        for bi in range(spec.repeats):
            for tname, fpath, tr, col in _block_entries(spec.block):
                out[f"blocks.{si}.{bi}.{tname}"] = (
                    (f"blocks_{si}_{bi}",) + fpath, tr, col,
                )
    return out


def _bn_entries(tname, fname):
    return [
        (f"{tname}.weight", (fname, "scale"), t_raw, "params"),
        (f"{tname}.bias", (fname, "bias"), t_raw, "params"),
        (f"{tname}.running_mean", (fname, "mean"), t_raw, "batch_stats"),
        (f"{tname}.running_var", (fname, "var"), t_raw, "batch_stats"),
    ]


def _ln_entries(tname, fname):
    return [
        (f"{tname}.weight", (fname, "scale"), t_raw, "params"),
        (f"{tname}.bias", (fname, "bias"), t_raw, "params"),
    ]


def _loftr_entries():
    e = []
    for n in ("q_proj", "k_proj", "v_proj", "merge"):
        e.append((f"{n}.weight", (n, "kernel"), t_dense, "params"))
    e.append(("mlp.0.weight", ("mlp_0", "kernel"), t_dense, "params"))
    e.append(("mlp.2.weight", ("mlp_1", "kernel"), t_dense, "params"))
    e += _ln_entries("norm1", "norm1") + _ln_entries("norm2", "norm2")
    return e


def _block14_entries():
    e = [
        ("dwconv2.weight", ("dwconv2_kernel",), t_dwconv, "params"),
        ("dwconv2.bias", ("dwconv2_bias",), t_raw, "params"),
    ]
    e += _bn_entries("bn1", "bn1")
    e += _ln_entries("norm", "norm")
    for n in ("pwconv1", "pwconv2"):
        e.append((f"{n}.weight", (n, "kernel"), t_dense, "params"))
        e.append((f"{n}.bias", (n, "bias"), t_raw, "params"))
    return e


def _newcross_entries():
    # LoFTREncoderLayer_newcross9's forward uses ONLY q/k/v + conv1/bn1/
    # conv2/bn2 (reference transformer.py:204-248); its merge/mlp/norm1/norm2
    # are dead parameters and are skipped (filtered as known-unused below).
    e = [
        (f"{n}.weight", (n, "kernel"), t_dense, "params")
        for n in ("q_proj", "k_proj", "v_proj")
    ]
    e += [("conv1.weight", ("conv1", "kernel"), t_conv, "params")]
    e += _bn_entries("bn1", "bn1")
    e += [("conv2.weight", ("conv2", "kernel"), t_conv, "params")]
    e += _bn_entries("bn2", "bn2")
    return e


def fusion_mapping(layer_names, native_res, scale, embed_dim):
    """cross_atten module mapping. positional_encodings need a reshape from
    [H*W, D] to [H, W, D]."""
    h, w = native_res[0] // scale, native_res[1] // scale

    def t_pos(x):
        return np.asarray(x).reshape(h, w, embed_dim)

    out = {"positional_encodings": (("positional_encodings",), t_pos, "params"),
           "positional_encodings2": (("positional_encodings2",), t_raw, "params")}
    for i, name in enumerate(layer_names):
        if name == "hist2image":
            for tn, fp, tr, col in _loftr_entries():
                out[f"layers.{i}.{tn}"] = ((f"layers_{i}",) + fp, tr, col)
        elif name == "image":
            for tn, fp, tr, col in _loftr_entries():
                out[f"layers.{i}.lga.encoder_layer.{tn}"] = (
                    (f"layers_{i}", "lga", "encoder_layer") + fp, tr, col)
                out[f"layers.{i}.gsa.encoder_layer.{tn}"] = (
                    (f"layers_{i}", "gsa", "encoder_layer") + fp, tr, col)
            out[f"layers.{i}.gsa.sr.weight"] = (
                (f"layers_{i}", "gsa", "sr", "kernel"), t_conv, "params")
            out[f"layers.{i}.gsa.sr.bias"] = (
                (f"layers_{i}", "gsa", "sr", "bias"), t_raw, "params")
            for tn, fp, tr, col in _ln_entries("norm", "norm"):
                out[f"layers.{i}.gsa.{tn}"] = ((f"layers_{i}", "gsa") + fp, tr, col)
        elif name == "combine1":
            for tn, fp, tr, col in _newcross_entries():
                out[f"layers.{i}.transformer_path.{tn}"] = (
                    (f"layers_{i}", "transformer_path") + fp, tr, col)
            for tn, fp, tr, col in _block14_entries():
                out[f"layers.{i}.large_kernel_path.{tn}"] = (
                    (f"layers_{i}", "large_kernel_path") + fp, tr, col)
    return out


def reference_mapping(config):
    """Full reference Deltar state_dict -> our trees."""
    from cfpnet_tpu.models.efficientnetv2 import V2_B3_STAGES

    out = {}

    # --- image encoder: reference wrapper names -> backbone blocks
    wrapper = {
        # torch prefix -> (stage index, repeats)
        "conv0.2": 0, "conv1": 1, "conv2": 2, "conv3.0": 3, "conv3.1": 4, "conv4": 5,
    }
    out["img_encoder.conv0.0.weight"] = (
        ("img_encoder", "backbone", "conv_stem", "kernel"), t_conv, "params")
    for tn, fp, tr, col in _bn_entries("conv0.1", "bn1"):
        out[f"img_encoder.{tn}"] = (("img_encoder", "backbone") + fp, tr, col)
    for prefix, si in wrapper.items():
        spec = V2_B3_STAGES[si]
        for bi in range(spec.repeats):
            for tname, fpath, tr, col in _block_entries(spec.block):
                out[f"img_encoder.{prefix}.{bi}.{tname}"] = (
                    ("img_encoder", "backbone", f"blocks_{si}_{bi}") + fpath, tr, col)

    # --- hist encoder
    for k in (1, 2, 3):
        base = f"hist_encoder.hist_extractor{k}.pointnet_encoder"
        ours = ("hist_encoder", f"hist_extractor{k}", "pointnet_encoder")
        for i in (1, 2, 3):
            out[f"{base}.conv{i}.weight"] = (ours + (f"conv{i}", "kernel"), t_conv1d, "params")
            out[f"{base}.conv{i}.bias"] = (ours + (f"conv{i}", "bias"), t_raw, "params")
            for tn, fp, tr, col in _bn_entries(f"bn{i}", f"bn{i}"):
                out[f"{base}.{tn}"] = (ours + fp, tr, col)

    # --- decoder convs + upsample blocks
    for name in ("conv4", "conv3", "conv2", "conv1", "conv0"):
        out[f"decoder.{name}.weight"] = (("decoder", name, "kernel"), t_conv, "params")
        out[f"decoder.{name}.bias"] = (("decoder", name, "bias"), t_raw, "params")
    for k in (1, 2, 3, 4):
        up = f"decoder.up{k}._net"
        ours = ("decoder", f"up{k}")
        out[f"{up}.0.weight"] = (ours + ("conv0", "kernel"), t_conv, "params")
        out[f"{up}.0.bias"] = (ours + ("conv0", "bias"), t_raw, "params")
        for tn, fp, tr, col in _bn_entries("1", "bn0"):
            out[f"{up}.{tn}"] = (ours + fp, tr, col)
        out[f"{up}.3.weight"] = (ours + ("conv1", "kernel"), t_conv, "params")
        out[f"{up}.3.bias"] = (ours + ("conv1", "bias"), t_raw, "params")
        for tn, fp, tr, col in _bn_entries("4", "bn1"):
            out[f"{up}.{tn}"] = (ours + fp, tr, col)

    # --- fusion modules at the three scales
    native = (config.native_height, config.native_width)
    layers = tuple(config.attention_layer)
    for name, scale, dim in (("cross_atten1", 4, 32), ("cross_atten2", 8, 64),
                             ("cross_atten3", 16, 128)):
        for tn, (fp, tr, col) in fusion_mapping(layers, native, scale, dim).items():
            out[f"decoder.{name}.{tn}"] = (("decoder", name) + fp, tr, col)

    # --- depth head
    for cname in ("conv3x3", "conv1x1"):
        out[f"depth_head.{cname}.weight"] = (
            ("depth_head", cname, "kernel"), t_conv, "params")
    out["depth_head.conv3x3.bias"] = (("depth_head", "conv3x3", "bias"), t_raw, "params")
    for ti, fi in ((0, 0), (2, 2), (4, 4)):
        out[f"depth_head.regressor.{ti}.weight"] = (
            ("depth_head", f"regressor_{fi}", "kernel"), t_dense, "params")
        out[f"depth_head.regressor.{ti}.bias"] = (
            ("depth_head", f"regressor_{fi}", "bias"), t_raw, "params")

    # --- output conv
    out["conv_out.0.weight"] = (("conv_out", "kernel"), t_conv, "params")
    out["conv_out.0.bias"] = (("conv_out", "bias"), t_raw, "params")
    return out


SKIP_SUFFIXES = ("num_batches_tracked",)


def _apply_mapping(state_dict, mapping):
    params: Dict = {}
    batch_stats: Dict = {}
    used, missing = set(), []
    for tkey, (fpath, tr, col) in mapping.items():
        if tkey not in state_dict:
            missing.append(tkey)
            continue
        arr = tr(np.asarray(state_dict[tkey]))
        _set(params if col == "params" else batch_stats, fpath, arr)
        used.add(tkey)
    unused = [
        k for k in state_dict
        if k not in used
        and not k.endswith(SKIP_SUFFIXES)
    ]
    return params, batch_stats, missing, unused


def import_timm_backbone(state_dict):
    """timm tf_efficientnetv2_b3 state_dict -> backbone trees."""
    state_dict = {k: v for k, v in state_dict.items()}
    mapping = backbone_mapping()
    params, batch_stats, missing, unused = _apply_mapping(state_dict, mapping)
    # classifier head params are expected leftovers
    unused = [u for u in unused if not u.startswith(("classifier", "conv_head", "bn2"))]
    return {"backbone": params}, {"backbone": batch_stats}, missing, unused


def import_reference_checkpoint(state_dict, config):
    """Full reference Deltar checkpoint -> our trees.

    Strips the DataParallel ``module.`` prefix (reference model_io.py:47-52).
    """
    sd = {}
    for k, v in state_dict.items():
        sd[k[len("module."):] if k.startswith("module.") else k] = v
    if "model" in sd and hasattr(sd["model"], "items"):
        sd = {k[len("module."):] if k.startswith("module.") else k: v
              for k, v in sd["model"].items()}
    mapping = reference_mapping(config)
    params, batch_stats, missing, unused = _apply_mapping(sd, mapping)
    # Dead reference params that never execute: Block14.conv1
    # (convnext.py:38 defined, :42-58 unused), gamma (None at
    # layer_scale_init_value=0), and newcross9's merge/mlp/norm1/norm2
    # (transformer.py:183-194 defined, :204-248 unused).
    def _dead(u):
        if "large_kernel_path.conv1" in u or u.endswith(".gamma"):
            return True
        if "transformer_path." in u and any(
            f".{n}." in u or u.endswith((f".{n}.weight", f".{n}.bias"))
            for n in ("merge", "mlp", "norm1", "norm2")
        ):
            # careful: transformer_path.bn1/bn2/conv2 are live; only the
            # LoFTR-tail params are dead
            return any(
                u.split("transformer_path.")[1].startswith(p)
                for p in ("merge.", "mlp.", "norm1.", "norm2.")
            )
        return False

    unused = [u for u in unused if not _dead(u)]
    return params, batch_stats, missing, unused


def export_reference_style(params, batch_stats, config):
    """Inverse mapping: our trees -> reference-style flat torch state_dict
    (numpy). Used for roundtrip tests and for exporting to torch users."""
    mapping = reference_mapping(config)
    inv_tr = {t_conv: lambda x: np.transpose(x, (3, 2, 0, 1)),
              t_dwconv: lambda x: np.transpose(x, (3, 2, 0, 1)),
              t_dense: lambda x: np.transpose(x, (1, 0)),
              t_conv1d: lambda x: np.transpose(x, (1, 0))[:, :, None],
              t_raw: lambda x: np.asarray(x)}
    out = {}
    for tkey, (fpath, tr, col) in mapping.items():
        tree = params if col == "params" else batch_stats
        node = tree
        ok = True
        for p in fpath:
            if not isinstance(node, dict) or p not in node:
                ok = False
                break
            node = node[p]
        if not ok:
            continue
        if tr in inv_tr:
            out[tkey] = inv_tr[tr](np.asarray(node))
        else:  # t_pos: flatten back to [H*W, D]
            a = np.asarray(node)
            out[tkey] = a.reshape(-1, a.shape[-1])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="torch checkpoint (.pt)")
    ap.add_argument("--dst", required=True, help="output orbax checkpoint dir")
    ap.add_argument("--kind", choices=["timm", "reference"], default="reference")
    # every remaining arg (flags or @argfiles) is forwarded to parse_config —
    # the import must be built against the same topology the user trains/
    # evals with (n_bins, attention_layer, ...)
    args, config_args = ap.parse_known_args()
    args.config_args = config_args

    import torch

    from cfpnet_tpu.config import parse_config
    from cfpnet_tpu.train.checkpoint import save_weights

    sd = torch.load(args.src, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    config = parse_config(args.config_args)
    if args.kind == "timm":
        params, batch_stats, missing, unused = import_timm_backbone(sd)
        params = {"img_encoder": params}
        batch_stats = {"img_encoder": batch_stats}
    else:
        params, batch_stats, missing, unused = import_reference_checkpoint(sd, config)

    if missing:
        print(f"WARNING: {len(missing)} expected keys missing, e.g. {missing[:5]}",
              file=sys.stderr)
    if unused:
        print(f"note: {len(unused)} source keys unused, e.g. {unused[:5]}",
              file=sys.stderr)
    save_weights(args.dst, params, batch_stats)
    print(f"imported {args.kind} checkpoint -> {args.dst}")


if __name__ == "__main__":
    main()
