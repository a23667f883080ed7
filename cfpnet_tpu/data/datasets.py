"""Datasets: NYUv2, ZJUL5, and a synthetic fixture.

Host-side decode + augmentation matching the reference pipelines:
- NYU train (reference src/dataloader/nyu.py:91-198): border crop 16/12 px,
  optional random rotation ±2.5° (bilinear img / nearest depth), random crop
  to (input_height, input_width), horizontal flip p=0.5, photometric aug
  p=0.5 (gamma U(0.9,1.1), brightness U(0.75,1.25), per-channel color
  U(0.9,1.1), clip [0,1]), ImageNet normalize, ToF simulation, hist dropout/
  noise augmentation, point sampling.
- NYU eval (reference nyu.py:136-146): native 480x640, normalize, ToF sim.
- ZJUL5 (reference src/dataloader/zjuL5.py:74-155): h5 files carry real
  VL53L5CX hist_data/fr/mask; only sampling + zone-subset ablation run.
- Synthetic: procedurally generated RGB+depth for tests/benchmarks (the
  reference has no equivalent; SURVEY.md §4 calls for it).

Sample dict: image [H,W,3] f32 (normalized), depth [H,W,1] f32 (meters),
hist_data [Z,n] f32, mask [Z] bool, focal f32. Zone geometry is static
(see geometry.py) so no per-sample rect/patch_info tensors are shipped.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from . import tof_sim
from .geometry import ZoneGeometry, geometry_for, scales_from_rects

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

# camera intrinsics [fx, fy, cx, cy]
NYU_K = np.array(
    [518.8579, 519.4696, 325.5824 - 16.0, 253.7362 - 12.0], dtype=np.float32
)
ZJU_K = np.array([611.2, 609.6, 323.4, 244.9], dtype=np.float32)


def normalize_image(img: np.ndarray) -> np.ndarray:
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def sample_image_f32(sample) -> np.ndarray:
    """Normalized f32 image from a sample carrying either ``image``
    (train: normalized f32) or ``image_u8`` (eval: raw uint8 — shipped
    compact and normalized on device, see ``make_eval_step``)."""
    if "image" in sample:
        return np.asarray(sample["image"], np.float32)
    u8 = np.asarray(sample["image_u8"], np.float32) / 255.0
    return normalize_image(u8).astype(np.float32)


class NYUV2Dataset:
    """NYUv2 depth-completion dataset with simulated ToF zone histograms."""

    def __init__(self, config, mode: str, rng: Optional[np.random.Generator] = None):
        assert mode in ("train", "online_eval")
        self.config = config
        self.mode = mode
        self.rng = rng or np.random.default_rng(config.seed)
        fname = config.filenames_file if mode == "train" else config.filenames_file_eval
        with open(fname, "r") as f:
            split = json.load(f)
        self.sample_list = split["train" if mode == "train" else "test"]
        self.data_root = config.data_path if mode == "train" else config.data_path_eval
        self.focal = float(NYU_K[0])

    def __len__(self):
        return len(self.sample_list)

    def sample_meta(self, idx):
        """(folder, name) for per-image result dumps — the reference keys
        its per-scene output folders off image_folder/image_path
        (reference evaluate_all.py:71-77)."""
        rgb_path, _ = self._paths(idx)
        folder = os.path.basename(os.path.dirname(rgb_path)) or "nyu"
        name = os.path.splitext(os.path.basename(rgb_path))[0]
        return folder, name

    def _paths(self, idx):
        # reference nyu.py:96-104: filename entries like 'sync/scene/00001.h5';
        # strip the leading dir and swap in rgb_/sync_depth_ files.
        entry = self.sample_list[idx]
        fname = entry["filename"] if isinstance(entry, dict) else entry
        rel = "/".join(fname.split("/")[1:])
        base = os.path.join(self.data_root, rel)
        num = os.path.basename(base).split(".")[0]
        d = os.path.dirname(base)
        return os.path.join(d, f"rgb_{num}.jpg"), os.path.join(d, f"sync_depth_{num}.png")

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        from PIL import Image

        rgb_path, depth_path = self._paths(idx)
        image = Image.open(rgb_path)
        cfg = self.config
        has_valid_depth = True
        try:
            depth_gt = Image.open(depth_path)
        except (FileNotFoundError, OSError):
            if self.mode == "train":
                raise
            # eval samples without GT are flagged and skipped downstream
            # (reference train.py:179-181 guards on has_valid_depth; the
            # reference NYU loader hardcodes True at nyu.py:145 and would
            # crash here — we degrade gracefully instead)
            has_valid_depth = False
            depth_gt = Image.new("I", image.size)

        if self.mode == "train":
            # border crop to avoid registration artifacts (reference :118-119)
            image = image.crop((16, 12, 640 - 16, 480 - 12))
            depth_gt = depth_gt.crop((16, 12, 640 - 16, 480 - 12))
            if cfg.do_random_rotate:
                angle = float((self.rng.random() - 0.5) * 2 * cfg.degree)
                image = image.rotate(angle, resample=Image.BILINEAR)
                depth_gt = depth_gt.rotate(angle, resample=Image.NEAREST)
            # stay uint8 through the crop: PIL's rotate outputs uint8, so
            # the u8 crop is the exact source of the f32/255 values
            img_u8 = np.asarray(image, dtype=np.uint8)
            dep = np.asarray(depth_gt, dtype=np.float32) / 1000.0
            img_u8, dep = self._random_crop(img_u8, dep,
                                            cfg.input_height, cfg.input_width)
            if cfg.device_pipeline:
                # the fused on-device pipeline handles flip/photometric/
                # normalize/ToF — ship raw uint8 crops (4x less host->device
                # traffic; device_preprocess converts on device)
                return dict(image_raw=img_u8,
                            depth=dep[..., None].astype(np.float32))
            img = img_u8.astype(np.float32) / 255.0
            img, dep = self._train_preprocess(img, dep)
        else:
            img = np.asarray(image, dtype=np.float32) / 255.0
            dep = np.asarray(depth_gt, dtype=np.float32) / 1000.0

        zo = int(getattr(self, "zone_offset", 0)) if self.mode == "train" else 0
        sample = finalize_sample(
            img, dep, self.focal, cfg, self.mode, self.rng,
            simulate_hist=True, exact_u8=True,  # jpg/png source is uint8
            offset=(zo, zo),  # per-batch zone offset (set by DataLoader)
        )
        if self.mode == "online_eval":
            sample["has_valid_depth"] = np.bool_(has_valid_depth)
        return sample

    def _random_crop(self, img, dep, h, w):
        y = int(self.rng.integers(0, img.shape[0] - h + 1))
        x = int(self.rng.integers(0, img.shape[1] - w + 1))
        return img[y : y + h, x : x + w], dep[y : y + h, x : x + w]

    def _train_preprocess(self, img, dep):
        if self.rng.random() > 0.5:
            img = img[:, ::-1].copy()
            dep = dep[:, ::-1].copy()
        if self.rng.random() > 0.5:
            img = self._augment_image(img)
        return img, dep

    def _augment_image(self, img):
        gamma = self.rng.uniform(0.9, 1.1)
        brightness = self.rng.uniform(0.75, 1.25)
        colors = self.rng.uniform(0.9, 1.1, size=3).astype(np.float32)
        img = np.clip((img**gamma) * brightness * colors[None, None, :], 0.0, 1.0)
        return img.astype(np.float32)


class ZJUL5Dataset:
    """Real VL53L5CX captures; hist precomputed in h5 (eval only).

    Each h5 also carries ``fr`` — the real sensor's measured zone-to-pixel
    rects, from which the reference derives its fusion geometry
    (reference zjuL5.py:106,135). The reference recomputes ``patch_info``
    per capture; here geometry is a compile-time constant of the jitted
    graph, so init reads every capture's rects once and GROUPS the indices
    by rect signature (``geometry_groups``). A single-rig dataset (every
    shipped data.json) exposes its geometry as ``scale_geoms``; a mixed-rig
    dataset makes ``scale_geoms`` raise — single-geometry consumers must
    sweep per group (``train/loop.make_grouped_eval`` does, one compiled
    graph per rig, metrics merged image-weighted).
    """

    def __init__(self, config, mode: str = "online_eval"):
        assert mode == "online_eval"
        self.config = config
        with open(config.filenames_file_eval, "r") as f:
            self.sample_list = json.load(f)["test"]
        self.data_root = config.data_path_eval
        self.focal = float(ZJU_K[0])
        # group captures by measured-rect signature (reference zjuL5.py:135
        # derives patch_info per capture; one jitted graph per group here)
        self.geometry_groups = []  # [(scale_geoms, indices, fr)]
        self._group_of = []  # idx -> group number
        by_sig = {}
        for i in range(len(self.sample_list)):
            fr = self._subset_fr(self._read_fr(i))
            key = fr.tobytes()
            if key not in by_sig:
                by_sig[key] = len(self.geometry_groups)
                self.geometry_groups.append((
                    scales_from_rects(fr, config.native_height,
                                      config.native_width),
                    [], fr,
                ))
            g = by_sig[key]
            self.geometry_groups[g][1].append(i)
            self._group_of.append(g)

    @property
    def scale_geoms(self):
        """THE dataset geometry — only meaningful for a single-rig dataset.
        Raises (loudly, never a silent wrong grid) when captures carry more
        than one rect signature."""
        if not self.geometry_groups:
            return None
        if len(self.geometry_groups) > 1:
            raise ValueError(
                f"mixed-rig ZJUL5 dataset: {len(self.geometry_groups)} "
                "distinct zone-rect signatures — a single static geometry "
                "does not exist; evaluate per geometry group "
                "(evaluate_all.py handles this automatically via "
                "dataset.geometry_groups)"
            )
        return self.geometry_groups[0][0]

    def _read_fr(self, idx) -> np.ndarray:
        import h5py

        entry = self.sample_list[idx]
        fname = entry["filename"] if isinstance(entry, dict) else entry
        with h5py.File(os.path.join(self.data_root, fname), "r") as f:
            return np.asarray(f["fr"][:], dtype=np.float32)

    def _subset_fr(self, fr: np.ndarray) -> np.ndarray:
        _, fr, _ = tof_sim.apply_zone_subset(
            np.zeros((len(fr), 2), np.float32), fr,
            np.zeros((len(fr),), bool), self.config.zone_type,
        )
        return fr

    def __len__(self):
        return len(self.sample_list)

    def sample_meta(self, idx):
        entry = self.sample_list[idx]
        fname = entry["filename"] if isinstance(entry, dict) else entry
        folder = os.path.dirname(fname) or "zjuL5"
        return folder.replace("/", "__"), os.path.splitext(os.path.basename(fname))[0]

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        import h5py

        entry = self.sample_list[idx]
        fname = entry["filename"] if isinstance(entry, dict) else entry
        cfg = self.config
        with h5py.File(os.path.join(self.data_root, fname), "r") as f:
            img_u8 = np.asarray(f["rgb"][:], dtype=np.uint8)
            dep = np.asarray(f["depth"][:], dtype=np.float32)
            fh = np.asarray(f["hist_data"][:], dtype=np.float32)
            fr = np.asarray(f["fr"][:], dtype=np.float32)
            mask = np.asarray(f["mask"][:]).astype(bool)
        fh, fr, mask = tof_sim.apply_zone_subset(fh, fr, mask, cfg.zone_type)
        expect = self.geometry_groups[self._group_of[idx]][2]
        if not np.array_equal(fr, expect):
            raise ValueError(
                f"{fname}: zone rects changed since dataset init; the jitted "
                "eval graph bakes geometry in as compile-time constants — "
                "rebuild the dataset object"
            )
        pts = tof_sim.sample_points(fh, mask, cfg.zone_sample_num, cfg.sample_uniform)
        return dict(
            image_u8=img_u8,  # normalized on device (see finalize_sample note)
            depth=dep[..., None] if dep.ndim == 2 else dep,
            hist_data=pts,
            mask=mask,
            focal=np.float32(self.focal),
        )


class SyntheticDataset:
    """Procedural RGB + depth with the REAL ToF simulation applied.

    Deterministic per index; used by tests, bench.py and the demo driver when
    no dataset is on disk.
    """

    def __init__(self, config, mode: str, length: int = 64):
        self.config = config
        self.mode = mode
        self.length = length

    def __len__(self):
        return self.length

    def sample_meta(self, idx):
        return "synthetic", f"{idx:05d}"

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        cfg = self.config
        h, w = cfg.image_size_for(self.mode)
        rng = np.random.default_rng(cfg.seed * 1000003 + idx)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        f1, f2 = rng.uniform(10, 60), rng.uniform(10, 60)
        dep = 1.0 + 1.3 * np.sin(yy / f1) ** 2 + 1.1 * np.cos(xx / f2) ** 2
        dep += 0.03 * rng.standard_normal((h, w)).astype(np.float32)
        dep = np.clip(dep, 0.05, cfg.max_depth).astype(np.float32)
        dep[rng.random((h, w)) < 0.01] = 0.0  # invalid pixels
        img = np.stack(
            [dep / dep.max()] * 3, axis=-1
        ) * 0.5 + 0.25 * rng.random((h, w, 3)).astype(np.float32)
        img = np.clip(img, 0, 1).astype(np.float32)
        if cfg.device_pipeline and self.mode == "train":
            return dict(image_raw=img, depth=dep[..., None])
        zo = int(getattr(self, "zone_offset", 0)) if self.mode == "train" else 0
        return finalize_sample(img, dep, 500.0, cfg, self.mode, rng,
                               simulate_hist=True, offset=(zo, zo))


def finalize_sample(
    img: np.ndarray,
    dep: np.ndarray,
    focal: float,
    cfg,
    mode: str,
    rng: np.random.Generator,
    simulate_hist: bool = True,
    offset=(0, 0),
    exact_u8: bool = False,
) -> Dict[str, np.ndarray]:
    """Shared tail: normalize, ToF-simulate, augment, sample points.

    Eval samples from uint8 SOURCES (jpg/h5 — ``exact_u8=True``) ship the
    image as RAW uint8 (``image_u8``) and the ImageNet normalize runs on
    device inside the eval step — 4x less host->device traffic per frame,
    numerically exact because the u8 crop is the literal source of the
    f32/255 values. Float-valued sources (synthetic) and train samples stay
    normalized f32 (``image``): quantizing them would introduce up to
    ~1/510 per-channel error (ADVICE r2)."""
    geom = geometry_for(cfg, mode, offset)
    max_d = cfg.simu_max_distance
    if cfg.random_simu_max_d and mode == "train":
        max_d = float(rng.uniform(cfg.simu_min_d, cfg.simu_max_d))
    fh, fr, mask = tof_sim.get_hist(dep, geom, max_d)
    if mode == "train":
        fh, mask = tof_sim.augment_hist(
            fh, mask, rng,
            drop_hist=cfg.drop_hist, noise_prob=cfg.noise_prob,
            noise_mean=cfg.noise_mean, noise_sigma=cfg.noise_sigma,
        )
    if cfg.zone_type != f"{geom.zone_num}x{geom.zone_num}":
        fh, fr, mask = tof_sim.apply_zone_subset(fh, fr, mask, cfg.zone_type)
    pts = tof_sim.sample_points(fh, mask, cfg.zone_sample_num, cfg.sample_uniform)
    out = dict(
        depth=dep[..., None].astype(np.float32),
        hist_data=pts,
        mask=mask,
        focal=np.float32(focal),
    )
    if mode == "train" or not exact_u8:
        out["image"] = normalize_image(img).astype(np.float32)
    else:
        out["image_u8"] = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
    return out


class SyntheticPairDataset:
    """Synthetic video pairs for the self-supervised variant: the source
    frame is the same scene under a small camera shift (approximated by an
    image-plane translation). Deterministic per index."""

    def __init__(self, config, mode: str = "train", length: int = 64):
        self.base = SyntheticDataset(config, mode, length)
        self.config = config
        self.mode = mode
        self.length = length

    def __len__(self):
        return self.length

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        cfg = self.config
        rng = np.random.default_rng(cfg.seed * 7 + idx)
        s = self.base[idx]
        img_raw = (s["image"] * IMAGENET_STD + IMAGENET_MEAN).astype(np.float32)
        dy, dx = int(rng.integers(-4, 5)), int(rng.integers(-4, 5))
        src_raw = np.roll(img_raw, (dy, dx), axis=(0, 1))
        fx = float(NYU_K[0])
        h, w = img_raw.shape[:2]
        K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]], np.float32)
        geom = geometry_for(cfg, self.mode)
        fh, _, zmask = tof_sim.get_hist(s["depth"][..., 0], geom, cfg.simu_max_distance)
        s.update(
            image_raw=img_raw,
            src_raw=src_raw,
            zone_mu=fh[:, 0].astype(np.float32),
            K=K,
            K_inv=np.linalg.inv(K).astype(np.float32),
        )
        return s


class NYUPairDataset(NYUV2Dataset):
    """NYU video pairs: the source frame is the temporally adjacent sync
    frame in the same scene directory (falls back to the target frame when
    no neighbor exists). Train-time augmentation is disabled (self-sup
    warping needs geometrically consistent pairs)."""

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        from PIL import Image

        cfg = self.config
        rgb_path, depth_path = self._paths(idx)
        d = os.path.dirname(rgb_path)
        num = int(os.path.basename(rgb_path)[4:].split(".")[0])
        src_path = os.path.join(d, f"rgb_{num + 1:05d}.jpg")
        if not os.path.exists(src_path):
            src_path = os.path.join(d, f"rgb_{num - 1:05d}.jpg")
        if not os.path.exists(src_path):
            src_path = rgb_path

        img = np.asarray(Image.open(rgb_path), np.float32) / 255.0
        src = np.asarray(Image.open(src_path), np.float32) / 255.0
        dep = np.asarray(Image.open(depth_path), np.float32) / 1000.0

        # center-crop to the train size (no random aug: pairs must stay
        # geometrically consistent)
        h, w = cfg.image_size_for(self.mode)
        y0 = (img.shape[0] - h) // 2
        x0 = (img.shape[1] - w) // 2
        img = img[y0 : y0 + h, x0 : x0 + w]
        src = src[y0 : y0 + h, x0 : x0 + w]
        dep = dep[y0 : y0 + h, x0 : x0 + w]

        s = finalize_sample(img, dep, self.focal, cfg, self.mode,
                            self.rng, simulate_hist=True)
        geom = geometry_for(cfg, self.mode)
        fh, _, _ = tof_sim.get_hist(dep, geom, cfg.simu_max_distance)
        fx, fy, cx, cy = NYU_K
        K = np.array(
            [[fx, 0, cx - x0], [0, fy, cy - y0], [0, 0, 1]], np.float32
        )
        s.update(
            image_raw=img.astype(np.float32),
            src_raw=src.astype(np.float32),
            zone_mu=fh[:, 0].astype(np.float32),
            K=K,
            K_inv=np.linalg.inv(K).astype(np.float32),
        )
        return s


def make_dataset(config, mode: str, rng=None):
    name = config.dataset if mode == "train" else config.dataset_eval
    if config.selfsup and mode == "train":
        if name == "nyu":
            return NYUPairDataset(config, mode, rng)
        if name == "synthetic":
            return SyntheticPairDataset(config, mode)
        raise NotImplementedError(f"self-sup dataset '{name}'")
    if name == "nyu":
        return NYUV2Dataset(config, mode, rng)
    if name in ("zjuL5", "zju", "ZJUL5"):
        return ZJUL5Dataset(config, mode)
    if name == "synthetic":
        length = getattr(config, "synthetic_length", 64)
        if mode != "train":
            length = min(length, 64)
        return SyntheticDataset(config, mode, length)
    raise NotImplementedError(f"dataset '{name}'")
