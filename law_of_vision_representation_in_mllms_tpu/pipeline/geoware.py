"""GeoAware-SC preprocessing + pose-awareness drivers.

Rebuilds the reference's optional GeoAware-SC branch end-to-end:
- `preprocess_maps` — `C_score/preprocess_map.py:20-69`: per image (and its
  horizontal flip), dump the multi-scale SD feature dict and the DINOv2
  token descriptors next to the images (npz/npy instead of torch .pt).
- `run_pose_awareness` — `C_score/pose_awareness_test.py`: classify each
  target image's pose (back/front/left/right) by mean masked-NN descriptor
  distance against 12 pose templates, using co-PCA-fused SD+DINO features.

Instance masks: the reference derives them with ODISE panoptic inference
(an 11k-LoC vendored stack, out of rebuild scope — PARITY.md). Callers pass
`mask_dir` with per-image `<stem>_mask.npy`/`.png` exports (SAM or ODISE);
without it the mask is all-ones (the reference's `mask=False` behaviour
elsewhere in GeoAware-SC).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.precision import Precision, DEFAULT_PRECISION
from ..data.image_processing import IMAGENET_MEAN, IMAGENET_STD
from ..metrics.geoware_extras import (PCA_DIMS, RESOLUTION, co_pca,
                                      fuse_descriptors, grid_to_descriptors,
                                      masked_nn_mean_distance,
                                      pose_awareness_eval,
                                      resize_mask_nearest)
from ..models.facet import facet_descriptors
from ..models.featurizer import (FeaturizerConfig,
                                 extract_multiscale_features)
from ..models.vit import VIT_PRESETS, ViTEncoder

# preprocess_map.py:54 / pose_awareness_test.py:28-37 defaults
REAL_SIZE = 960       # SD input side
DINO_SIZE = 840       # DINOv2 input side (60x60 grid at patch 14)
DINO_LAYER = 11
DINO_FACET = "token"


def load_square(img, target: int, *, flip: bool = False,
                edge: bool = False) -> np.ndarray:
    """PIL image -> [target, target, 3] uint8: aspect-preserving LANCZOS
    resize (long side = target) + centered zero- or edge-padding
    (`C_score/utils/utils_correspondence.py:75-110 resize`)."""
    from PIL import Image
    img = img.convert("RGB")
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    w, h = img.size
    if h <= w:
        nh = int(np.around(target * h / w))
        img = img.resize((target, nh), Image.Resampling.LANCZOS)
    else:
        nw = int(np.around(target * w / h))
        img = img.resize((nw, target), Image.Resampling.LANCZOS)
    arr = np.asarray(img, np.uint8)
    ph, pw = target - arr.shape[0], target - arr.shape[1]
    pads = ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
    return np.pad(arr, pads, mode="edge" if edge else "constant")


def _sd_pixels(arr_u8: np.ndarray) -> np.ndarray:
    return (arr_u8.astype(np.float32) / 255.0 - 0.5) * 2.0


def _dino_pixels(arr_u8: np.ndarray) -> np.ndarray:
    x = arr_u8.astype(np.float32) / 255.0
    return ((x - np.asarray(IMAGENET_MEAN, np.float32))
            / np.asarray(IMAGENET_STD, np.float32))


def make_geoware_extractors(sd_params: Dict, sd_cfg: FeaturizerConfig,
                            dino_params: Dict, dino_tower: str =
                            "facebook/dinov2-base-840", *,
                            layer: int = DINO_LAYER,
                            facet: str = DINO_FACET,
                            deterministic: bool = True,
                            ensemble: int = 1,
                            precision: Precision = DEFAULT_PRECISION):
    """Returns (sd_fn(px [1,H,W,3]) -> {s3,s4,s5}, dino_fn(px) -> [1,1,t,d]).

    `ensemble` averages the SD features over that many noise draws
    (preprocess_map.py:29-36 NUM_ENSEMBLE) — with deterministic=True the
    draws are identical, so it is forced to 1.

    `dino_tower`: a VIT_PRESETS key, or a ViTConfig directly (tests).
    """
    dcfg = (VIT_PRESETS[dino_tower]() if isinstance(dino_tower, str)
            else dino_tower)
    encoder = ViTEncoder(dcfg, precision)
    if deterministic:
        ensemble = 1

    @jax.jit
    def sd_fn(px, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)

        def one(i):
            return extract_multiscale_features(
                sd_params, sd_cfg, px, jax.random.fold_in(rng, i),
                deterministic=deterministic, precision=precision)
        acc = one(0)
        for i in range(1, ensemble):
            nxt = one(i)
            acc = {k: acc[k] + nxt[k] for k in acc}
        return {k: v / ensemble for k, v in acc.items()}

    @jax.jit
    def dino_fn(px):
        return facet_descriptors(encoder, {"params": dino_params}, px,
                                 layer=layer, facet=facet)
    return sd_fn, dino_fn


def preprocess_maps(image_paths: Sequence[str], out_dir: str, sd_fn, dino_fn,
                    *, real_size: int = REAL_SIZE,
                    dino_size: int = DINO_SIZE, flips: bool = True,
                    process_index: int = 0,
                    process_count: int = 1) -> List[str]:
    """Per image (and flip): save `<stem>_sd[_flip].npz` (s3/s4/s5 NHWC) and
    `<stem>_dino[_flip].npy` ([1,1,t,d]) under out_dir.

    Outputs are keyed by basename stem (matching the reference's flat
    per-image .pt layout); duplicate stems across subdirectories would
    silently clobber each other, so they are rejected up front."""
    from PIL import Image
    paths = list(image_paths)
    stems = {}
    for p in paths:
        s = os.path.splitext(os.path.basename(p))[0]
        if s in stems and stems[s] != p:
            raise ValueError(
                f"duplicate image stem '{s}': {stems[s]} vs {p} — outputs "
                "are keyed by basename; run per-directory or rename")
        stems[s] = p
    os.makedirs(out_dir, exist_ok=True)
    written = []
    variants = [False, True] if flips else [False]
    base_rng = jax.random.PRNGKey(0)
    for j, p in enumerate(paths[process_index::process_count]):
        with Image.open(p) as img:
            img = img.convert("RGB")
        stem = os.path.splitext(os.path.basename(p))[0]
        for flip in variants:
            suffix = "_flip" if flip else ""
            sd_px = _sd_pixels(load_square(img, real_size, flip=flip))
            # fresh per-image/flip noise draws (the reference samples
            # torch.randn per call); deterministic mode ignores the key
            rng = jax.random.fold_in(
                base_rng, (process_index + j * process_count) * 2 + flip)
            feats = jax.device_get(sd_fn(jnp.asarray(sd_px[None]), rng))
            sd_out = os.path.join(out_dir, f"{stem}_sd{suffix}.npz")
            np.savez(sd_out, **{k: np.asarray(v, np.float32)
                                for k, v in feats.items()})
            dn_px = _dino_pixels(load_square(img, dino_size, flip=flip))
            desc = np.asarray(jax.device_get(
                dino_fn(jnp.asarray(dn_px[None]))), np.float32)
            dn_out = os.path.join(out_dir, f"{stem}_dino{suffix}.npy")
            np.save(dn_out, desc)
            written += [sd_out, dn_out]
    return written


def panoptic_to_binary_mask(seg_map: np.ndarray, segments_info: List[Dict],
                            classes: Sequence[str],
                            category) -> np.ndarray:
    """ODISE panoptic output -> the reference's binary category mask
    (`C_score/model_utils/extractor_sd.py:249-286 get_mask`).

    seg_map: [H, W] int panoptic ids (the `pred['panoptic_seg'][0]` map);
    segments_info: list of {"id", "category_id"} dicts
    (`pred['panoptic_seg'][1]`); classes: category_id -> name list from
    the demo metadata. Matching is substring-based after the reference's
    Pascal->COCO renames; a category (or list) with no match, or a
    matched area under 6 pixels, falls back to all-ones — both exactly
    the reference's behaviour. Export the result with
    `np.save(f"{stem}_mask.npy", m)` (or a {0,255} PNG) for `mask_dir`
    ingestion by `run_pose_awareness`.
    """
    convert = {"aeroplane": "airplane", "motorbike": "motorcycle",
               "pottedplant": "potted plant", "tvmonitor": "tv"}
    if isinstance(category, list):
        cats = [convert.get(c, c) for c in category]
    else:
        cats = [convert.get(category, category)]
    target_ids = []
    for item in segments_info:
        name = classes[item["category_id"]]
        if any(c in name for c in cats):
            target_ids.append(item["id"])
    seg = np.asarray(seg_map)
    m = np.zeros(seg.shape, np.float32)
    for i in target_ids:
        m += (seg == i).astype(np.float32)
    if not target_ids or m.sum() < 6:
        m = np.ones(seg.shape, np.float32)
    return m


def _load_mask(mask_dir: Optional[str], stem: str, res: int) -> np.ndarray:
    if mask_dir:
        for ext in ("npy", "png"):
            p = os.path.join(mask_dir, f"{stem}_mask.{ext}")
            if os.path.exists(p):
                if ext == "npy":
                    m = np.load(p)
                else:
                    from PIL import Image
                    m = np.asarray(Image.open(p).convert("L"))
                m = (np.asarray(m) > 0).astype(np.float32)
                return resize_mask_nearest(m, res)
    return np.ones((res, res), np.float32)


def pair_distance(src_feats: Dict, src_dino, tgt_feats: Dict, tgt_dino,
                  src_mask: np.ndarray, *, res: int = RESOLUTION,
                  dims: Sequence[int] = PCA_DIMS) -> float:
    """Fused-descriptor mean masked-NN distance for one (src, tgt) pair.

    src = the pose-query image whose masked patches are matched INTO tgt
    (the template) — `pose_awareness_test.py:169-209`.
    """
    sd_s, sd_t = co_pca(src_feats, tgt_feats, dims)
    grid = sd_s.shape[1]
    d_s = fuse_descriptors(grid_to_descriptors(sd_s), src_dino)
    d_t = fuse_descriptors(grid_to_descriptors(sd_t), tgt_dino)
    return float(masked_nn_mean_distance(
        d_s, d_t, jnp.asarray(src_mask), grid=grid, res=res))


def _load_cached(feat_dir: str, stem: str):
    sd = dict(np.load(os.path.join(feat_dir, f"{stem}_sd.npz")))
    dino = np.load(os.path.join(feat_dir, f"{stem}_dino.npy"))
    return {k: jnp.asarray(v) for k, v in sd.items()}, jnp.asarray(dino)


def run_pose_awareness(template_dir: str, target_dir: str, labels_path: str,
                       feat_dir: str, *, mask_dir: Optional[str] = None,
                       res: int = RESOLUTION,
                       out_path: Optional[str] = None) -> Dict[str, float]:
    """Full protocol over cached features (run `preprocess_maps` on both
    image sets first, flips not required).

    labels_path: JSON {image filename: 'b'|'f'|'l'|'r'} — the reference
    hardcodes this table for SPair cats (`pose_awareness_test.py` img_to_pose).
    """
    with open(labels_path) as f:
        labels = json.load(f)
    tmpl = sorted(glob.glob(os.path.join(template_dir, "*.png"))
                  + glob.glob(os.path.join(template_dir, "*.jpg")))
    if len(tmpl) != 12:
        raise ValueError(f"need 12 sorted pose templates, found {len(tmpl)}")
    targets = sorted(p for p in glob.glob(os.path.join(target_dir, "*"))
                     if os.path.basename(p) in labels)

    t_feats = []
    for p in tmpl:
        stem = os.path.splitext(os.path.basename(p))[0]
        t_feats.append(_load_cached(feat_dir, stem))

    rows, poses = [], []
    for p in targets:
        stem = os.path.splitext(os.path.basename(p))[0]
        feats, dino = _load_cached(feat_dir, stem)
        mask = _load_mask(mask_dir, stem, res)
        row = [pair_distance(feats, dino, tf, td, mask, res=res)
               for tf, td in t_feats]
        rows.append(row)
        poses.append(labels[os.path.basename(p)])

    results = pose_awareness_eval(rows, poses)
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"results": results, "rows": rows,
                       "targets": [os.path.basename(p) for p in targets]},
                      f, indent=1)
    return results
