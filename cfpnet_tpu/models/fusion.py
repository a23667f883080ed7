"""TransformerFusion: per-scale fusion of image features with zone histogram
features.

Reference: /root/reference/src/models/fusion.py:12-188. TPU-first redesign:

- All zone geometry (pads, slices, patch sizes, interpolate decisions —
  reference :66-84) arrives as a *static* ``ScaleGeometry`` so every slice,
  pad and reshape below is shape-static under jit.
- The ``hist2image`` scatter-add (reference :144-157, boolean-mask
  ``feat0[zone_mask] += ...``) becomes a static-rectangle ``.at[].add`` —
  one fused dynamic-update-slice, no boolean gathers.
- The train-time positional-encoding random crop (reference :88-91, a
  ``torch.randint`` on the device path) threads an explicit Flax RNG
  ('fusion' collection) into a ``lax.dynamic_slice``.
- Masks: invalid zones are zeroed after cross-attention via a per-zone
  multiply (reference :144 ``zone_feature[~hist_mask] = 0``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.geometry import ScaleGeometry
from ..ops.interp import resize_bilinear_align_corners
from .convnext import Block14
from .transformer import (
    Combine1,
    LoFTREncoderLayer,
    LoFTRNewCross9,
    TwinsTransformer,
    twins_window_size,
)

# torch/timm trunc_normal_(std=0.2) truncates at ±2.0 absolute (±10σ) —
# effectively a plain normal; flax truncated_normal truncates at ±2σ. The
# difference is negligible at init time.
POS_INIT = nn.initializers.truncated_normal(stddev=0.2)


class TransformerFusion(nn.Module):
    embedding_dim: int
    max_resolution: Tuple[int, int]  # native (eval) feature-map size at this scale
    layer_names: Sequence[str]
    num_heads: int = 4
    large_kernel: int = 7
    zone_sample_num: int = 16
    change_embedding: bool = False
    no_skip_inside: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, H, W, C]
        feat1: jnp.ndarray,  # [B, Z, n, C] histogram features
        hist_mask: jnp.ndarray,  # [B, Z] bool/float — zones with signal
        geom: ScaleGeometry,
        train: bool = False,
    ) -> jnp.ndarray:
        B, H, W, C = x.shape
        maxH, maxW = self.max_resolution
        zn, p1, p2 = geom.zone_num, geom.p1, geom.p2
        Z = zn * zn

        pos = self.param(
            "positional_encodings", POS_INIT, (maxH, maxW, self.embedding_dim), jnp.float32
        ).astype(x.dtype)
        pos2 = self.param(
            "positional_encodings2",
            POS_INIT,
            (self.zone_sample_num, self.embedding_dim),
            jnp.float32,
        ).astype(x.dtype)

        # random-crop offset of the 2D positional encoding (reference :88-96).
        # The reference randomizes unconditionally; here eval callers that
        # provide no 'fusion' RNG get a deterministic centered crop instead of
        # a crash (sub-native-resolution eval has no reference precedent).
        if H < maxH or W < maxW:
            if self.has_rng("fusion"):
                rng = self.make_rng("fusion")
                ky, kx = jax.random.split(rng)
                off_y = jax.random.randint(ky, (), 0, maxH - H + 1) if H < maxH else 0
                off_x = jax.random.randint(kx, (), 0, maxW - W + 1) if W < maxW else 0
            else:
                off_y, off_x = (maxH - H) // 2, (maxW - W) // 2
            pos_crop = jax.lax.dynamic_slice(
                pos, (off_y, off_x, 0), (H, W, self.embedding_dim)
            )
        else:
            pos_crop = pos
        embeddings = x + pos_crop[None]
        feat0 = embeddings.reshape(B, H * W, C)

        # histogram tokens (reference :123-125)
        feat1 = feat1 + pos2[None, None]
        feat1_tokens = feat1.reshape(B * Z, self.zone_sample_num, C)
        zone_valid = hist_mask.reshape(B * Z, 1, 1).astype(x.dtype)

        rect = (geom.zy0, geom.zy1, geom.zx0, geom.zx1)
        ws = twins_window_size(maxH, maxW)

        for i, name in enumerate(self.layer_names):
            if name == "image":
                feat0 = TwinsTransformer(self.embedding_dim, ws, name=f"layers_{i}")(
                    feat0, (H, W)
                )
            elif name == "hist2image":
                src2d = (
                    feat0.reshape(B, H, W, C) if self.change_embedding else embeddings
                )
                padded = jnp.pad(
                    src2d,
                    ((0, 0), (geom.pad_h, geom.pad_h), (geom.pad_w, geom.pad_w), (0, 0)),
                )
                zone = padded[:, geom.sy : geom.ey, geom.sx : geom.ex, :]
                if geom.interpolate:
                    zone = resize_bilinear_align_corners(zone, zn * p1, zn * p2)
                tokens = (
                    zone.reshape(B, zn, p1, zn, p2, C)
                    .transpose(0, 1, 3, 2, 4, 5)
                    .reshape(B * Z, p1 * p2, C)
                )
                tokens = LoFTREncoderLayer(
                    self.embedding_dim, self.num_heads, name=f"layers_{i}"
                )(tokens, feat1_tokens)
                tokens = tokens * zone_valid  # zero invalid zones (reference :144)
                zone_out = (
                    tokens.reshape(B, zn, zn, p1, p2, C)
                    .transpose(0, 1, 3, 2, 4, 5)
                    .reshape(B, zn * p1, zn * p2, C)
                )
                if geom.interpolate:
                    zone_out = resize_bilinear_align_corners(zone_out, geom.tzh, geom.tzw)
                # static-rectangle scatter back (reference :154-157)
                oy0 = max(0, -geom.sy_wo)
                ox0 = max(0, -geom.sx_wo)
                block = zone_out[
                    :, oy0 : oy0 + (geom.zy1 - geom.zy0), ox0 : ox0 + (geom.zx1 - geom.zx0), :
                ]
                f2d = feat0.reshape(B, H, W, C)
                region = f2d[:, geom.zy0 : geom.zy1, geom.zx0 : geom.zx1, :]
                new = block if self.no_skip_inside else region + block
                f2d = f2d.at[:, geom.zy0 : geom.zy1, geom.zx0 : geom.zx1, :].set(new)
                feat0 = f2d.reshape(B, H * W, C)
            elif "new_cross" in name:
                # reference forward dispatch :160-161 — a bare cross-zone
                # propagation layer. NOTE: the reference's own constructor
                # (:31-38) raises NotImplementedError for this name, so no
                # reference numeric exists to match; semantics follow the
                # forward loop with the module it plainly calls for
                # (NewCross9, reference transformer.py:169-248).
                feat0 = LoFTRNewCross9(
                    self.embedding_dim, self.num_heads, name=f"layers_{i}"
                )(feat0, rect, H, W, train)
            elif "combine" in name:
                # 'combine1' (the shipped configs) or iterated 'combine_N'
                # (reference :163-169 — N distinct Combine1 sublayers applied
                # in sequence; also unconstructible in the reference, :38).
                if "_" in name:
                    for j in range(int(name.split("_")[-1])):
                        feat0 = Combine1(
                            self.embedding_dim,
                            self.num_heads,
                            self.large_kernel,
                            name=f"layers_{i}_{j}",
                        )(feat0, rect, H, W, train)
                else:
                    feat0 = Combine1(
                        self.embedding_dim,
                        self.num_heads,
                        self.large_kernel,
                        name=f"layers_{i}",
                    )(feat0, rect, H, W, train)
            elif "cvxt" in name:
                # reference :170-180: large-kernel ConvNeXt Block14 on the
                # 2-D map, optionally iterated 'cvxt_N' with distinct
                # sublayers (unconstructible in the reference, :38).
                reps = int(name.split("_")[-1]) if "_" in name else 1
                f2d = feat0.reshape(B, H, W, C)
                for j in range(reps):
                    f2d = Block14(
                        self.embedding_dim,
                        self.large_kernel,
                        name=f"layers_{i}" if reps == 1 else f"layers_{i}_{j}",
                    )(f2d, train)
                feat0 = f2d.reshape(B, H * W, C)
            else:
                raise NotImplementedError(f"attention layer '{name}'")

        return feat0.reshape(B, H, W, C)
