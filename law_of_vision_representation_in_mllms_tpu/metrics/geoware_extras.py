"""GeoAware-SC extras: co-PCA SD+DINO fusion and the pose-awareness test.

TPU-native rebuild of the reference's optional GeoAware-SC branch:
- `co_pca` — joint PCA over a source/target pair's multi-scale SD features
  (`C_score/utils/utils_correspondence.py:144-224`), exact SVD instead of
  torch.pca_lowrank's randomized sketch (component-sign ambiguity is
  irrelevant: both images share one projection, so all pairwise distances
  are preserved).
- `fuse_descriptors` — L2-normalize + concat SD and DINO descriptors
  (`C_score/pose_awareness_test.py:117-131`).
- `masked_nn_mean_distance` — for every masked source patch, the L2 distance
  to its nearest-neighbour target patch, averaged. The reference loops over
  patches on GPU (`pose_awareness_test.py:196-207`); here it is one batched
  |src|x|tgt| distance matrix on the MXU via the |a-b|^2 = |a|^2+|b|^2-2ab
  expansion with fp32 accumulation.
- `pose_awareness_eval` — the full 12-template pose-classification protocol
  (`pose_awareness_test.py:246-296`): per-target distances to 4 poses x 3
  template sets, 2-view (front/back vs left/right) and 4-view predictions,
  accuracy aggregation.

The SD features come from `models/unet.UNetHarvest(pre_up_indices=(0,1,2))`
("pre0"/"pre1"/"pre2" = s5/s4/s3, strides 64/32/16 — the ODISE
FeatureExtractorBackbone taps); DINO descriptors from
`models/facet.facet_descriptors`. Instance masks: the reference computes
them with ODISE panoptic inference (`extractor_sd.py get_mask`); that
vendored 11k-LoC segmentation stack is out of rebuild scope — callers pass
precomputed masks (SAM/ODISE exports) or all-ones (see
`pipeline/geoware.py`).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# SD co-PCA target dims for (s5, s4, s3) — pose_awareness_test.py:27 PCA_DIMS
PCA_DIMS = (256, 256, 256)
# NN-distance grid resolution — pose_awareness_test.py:39 RESOLUTION
RESOLUTION = 128


def _reduce_pair(a: jnp.ndarray, b: jnp.ndarray, dim: int):
    """Joint PCA of two [t, C] feature sets to [t, dim] each."""
    x = jnp.concatenate([a, b], axis=0).astype(jnp.float32)
    x = x - jnp.mean(x, axis=0, keepdims=True)
    # exact right singular vectors (torch.pca_lowrank approximates these)
    _, _, vt = jnp.linalg.svd(x, full_matrices=False)
    r = x @ vt[:dim].T
    return r[: a.shape[0]], r[a.shape[0]:]


def co_pca(feats1: Dict[str, jnp.ndarray], feats2: Dict[str, jnp.ndarray],
           dims: Sequence[int] = PCA_DIMS
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fuse a pair's multi-scale SD features into one descriptor grid each.

    feats*: {"s3": [1,H3,W3,C3], "s4": [1,H4,W4,C4], "s5": [1,H5,W5,C5]}
    (NHWC; H3 = 2*H4 = 4*H5). Returns two [1, H3, W3, sum(dims)] grids with
    channel order (s3-reduced, s4-reduced, s5-reduced) — matching
    `utils_correspondence.py:203-224`'s final gather.
    """
    red1, red2 = {}, {}
    for name, dim in zip(("s5", "s4", "s3"), dims):
        f1, f2 = feats1[name], feats2[name]
        _, h1, w1, c = f1.shape
        _, h2, w2, _ = f2.shape
        # effective dim caps at the SVD rank (tiny test models have C < dim)
        r1, r2 = _reduce_pair(f1.reshape(-1, c), f2.reshape(-1, c), dim)
        red1[name] = r1.reshape(1, h1, w1, r1.shape[-1])
        red2[name] = r2.reshape(1, h2, w2, r2.shape[-1])

    def _gather(red):
        s4h, s4w = red["s4"].shape[1:3]
        s3h, s3w = red["s3"].shape[1:3]
        up = lambda x, h, w: jax.image.resize(  # noqa: E731
            x, (1, h, w, x.shape[-1]), method="bilinear")
        # s5 -> s4 resolution, concat with s4; then everything -> s3 res.
        s45 = jnp.concatenate([red["s4"], up(red["s5"], s4h, s4w)], axis=-1)
        return jnp.concatenate([red["s3"], up(s45, s3h, s3w)], axis=-1)

    return _gather(red1), _gather(red2)


def grid_to_descriptors(grid: jnp.ndarray) -> jnp.ndarray:
    """[1, H, W, C] feature grid -> [1, 1, H*W, C] descriptors."""
    _, h, w, c = grid.shape
    return grid.reshape(1, 1, h * w, c)


def fuse_descriptors(sd_desc: jnp.ndarray, dino_desc: jnp.ndarray,
                     ) -> jnp.ndarray:
    """L2-normalize each descriptor set and concat on the channel axis
    (`pose_awareness_test.py:117-131`, dist='l2' branch)."""
    def _norm(x):
        x = x.astype(jnp.float32)
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    return jnp.concatenate([_norm(sd_desc), _norm(dino_desc)], axis=-1)


def _upsample_grid(desc: jnp.ndarray, grid: int, res: int) -> jnp.ndarray:
    """[1,1,grid*grid,C] descriptors -> [res*res, C] bilinear-upsampled."""
    c = desc.shape[-1]
    g = desc.reshape(1, grid, grid, c)
    g = jax.image.resize(g, (1, res, res, c), method="bilinear")
    return g.reshape(res * res, c)


def resize_mask_nearest(mask: np.ndarray, res: int) -> np.ndarray:
    """[H,W] {0,1} mask -> [res,res] via nearest (F.interpolate 'nearest')."""
    h, w = mask.shape
    # torch 'nearest' picks floor(i * h / res) (asymmetric, not half-pixel)
    iy = np.minimum((np.arange(res) * h // res), h - 1)
    ix = np.minimum((np.arange(res) * w // res), w - 1)
    return mask[iy][:, ix]


def masked_nn_mean_distance(src_desc: jnp.ndarray, tgt_desc: jnp.ndarray,
                            src_mask: jnp.ndarray, *, grid: int,
                            res: int = RESOLUTION) -> jnp.ndarray:
    """Mean over masked source patches of the min L2 distance to any target
    patch (`pose_awareness_test.py:181-209 process_images`).

    src_desc/tgt_desc: [1, 1, grid*grid, C]; src_mask: [res, res] {0,1}.
    """
    a = _upsample_grid(src_desc, grid, res).astype(jnp.float32)
    b = _upsample_grid(tgt_desc, grid, res).astype(jnp.float32)
    m = src_mask.reshape(-1).astype(jnp.float32)
    # |a-b|^2 via one [t, t] matmul (MXU) instead of a per-patch loop
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1)
    d2 = a2 + b2[None, :] - 2.0 * (a @ b.T)
    dmin = jnp.sqrt(jnp.clip(jnp.min(d2, axis=-1), 0.0))
    return jnp.sum(dmin * m) / jnp.maximum(jnp.sum(m), 1.0)


# -------------------------------------------------------------------------
# Pose-awareness protocol (pose_awareness_test.py:246-296)
# -------------------------------------------------------------------------

# template index groups per pose: 12 sorted templates = 4 poses x 3 sets
POSE_INDICES = {"back": [0, 4, 8], "front": [1, 5, 9],
                "left": [2, 6, 10], "right": [3, 7, 11]}
POSE_LETTERS = ("b", "f", "l", "r")


def classify_pose(distances: np.ndarray) -> Tuple[str, str, str]:
    """distances: [12] mean NN distances to the sorted pose templates.

    Returns (bf_indicator, lr_indicator, four_way_letter) following
    `pose_awareness_test.py:266-274`: majority vote of pairwise
    back-vs-front / left-vs-right comparisons across the 3 template sets,
    and a 4-way argmin-bincount vote.
    """
    d = np.asarray(distances, dtype=np.float64)
    pd = {k: d[idx] for k, idx in POSE_INDICES.items()}
    bf = (pd["back"] - pd["front"] > 0).sum() > 1
    lr = (pd["left"] - pd["right"] > 0).sum() > 1
    bf_ind = "f" if bf else "b"
    lr_ind = "r" if lr else "l"
    votes = np.bincount(np.argmin(d.reshape(3, 4), axis=-1), minlength=4)
    four = POSE_LETTERS[int(np.argmax(votes))]
    return bf_ind, lr_ind, four


def pose_awareness_eval(distance_rows: Sequence[Sequence[float]],
                        gt_poses: Sequence[str]) -> Dict[str, float]:
    """Aggregate accuracies (`pose_awareness_test.py:276-296`).

    distance_rows: per target image, the 12 template distances (sorted
    template order). gt_poses: per target, one of 'b'/'f'/'l'/'r'.
    """
    correct = {"2": 0, "4": 0, "2_lr": 0, "2_fb": 0, "4_lr": 0, "4_fb": 0}
    views = {"lr": 0, "bf": 0}
    for row, pose in zip(distance_rows, gt_poses):
        bf_ind, lr_ind, four = classify_pose(row)
        correct["2"] += pose in (bf_ind, lr_ind)
        correct["4"] += pose == four
        if pose in ("b", "f"):
            views["bf"] += 1
            correct["2_fb"] += bf_ind == pose
            correct["4_fb"] += four == pose
        elif pose in ("l", "r"):
            views["lr"] += 1
            correct["2_lr"] += lr_ind == pose
            correct["4_lr"] += four == pose
    n = max(len(gt_poses), 1)
    out = {"correct_2": correct["2"] / n, "correct_4": correct["4"] / n,
           "n": len(gt_poses)}
    if views["lr"]:
        out["correct_2_lr"] = correct["2_lr"] / views["lr"]
        out["correct_4_lr"] = correct["4_lr"] / views["lr"]
    if views["bf"]:
        out["correct_2_fb"] = correct["2_fb"] / views["bf"]
        out["correct_4_fb"] = correct["4_fb"] / views["bf"]
    return out
