"""C score: dense semantic correspondence (SPair-71k PCK).

Zero-shot reference path (`C_score/pck_train.py:57-245` with
`DummyAggregationNetwork`, `configs/eval_zero_shot_spair.yaml`):
per image pair, L2-normalize patch descriptors (norm + 1e-10,
`pck_train.py:24-29`), similarity matrix desc1 @ desc2.T (N²xN²), then
window-soft-argmax flow (`utils_correspondence.py:297-338`):

1. per source patch, argmax over targets; keep an (2w+1)² window around it
   (border-clamped rectangle), ZEROING the rest (`get_flow`) — zeros matter:
   they contribute exp(0/beta)=1 to the softmax denominator;
2. temperature softmax (beta=0.02) over targets, marginalize to x / y and
   take the expectation over a [-1, 1] grid (`soft_argmax`), un-normalize to
   patch coords ((v+1)(N-1)/2);
3. keypoint -> patch index (floor(N/ANNO * coord)), look up the flow, map
   back to pixels at patch centers (x*stride + stride//2);
4. PCK@{0.10,0.05,0.01}: ||pred-gt|| < alpha * max(bbox_w, bbox_h), both
   per-keypoint and per-image aggregates, plus the geo-aware subset.

TPU-native: everything below is shape-static jnp batched over pairs — the
N²xN² similarity matmul and the softmax marginalization are single MXU/VPU
ops instead of the reference's per-pair GPU loop.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

EPS = 1e-10


def normalize_feats(feats):
    """[..., P, C] row L2 normalization, reference eps convention."""
    n = jnp.linalg.norm(feats.astype(jnp.float32), axis=-1, keepdims=True)
    return feats / (n + EPS)


def similarity(desc1, desc2):
    """[..., P, C] x2 -> [..., P, P] cosine similarity (descs normalized)."""
    return jnp.einsum("...sc,...tc->...st", desc1, desc2,
                      precision=jax.lax.Precision.HIGHEST)


def window_mask(sim, num_patches: int, window: int):
    """Zero out sim outside a (2w+1)² window around each source's argmax."""
    n = num_patches
    amax = jnp.argmax(sim, axis=-1)                      # [..., S]
    ax, ay = amax % n, amax // n
    t = jnp.arange(n * n)
    tx, ty = t % n, t // n                               # [T]
    inx = jnp.abs(tx[None, :] - ax[..., None]) <= window
    iny = jnp.abs(ty[None, :] - ay[..., None]) <= window
    return sim * (inx & iny)


def gaussian_kernel_mask(sim, num_patches: int, sigma: float):
    """`apply_gaussian_kernel` (`utils_correspondence.py:281-296`):
    multiply sim by a gaussian centered at the argmax."""
    n = num_patches
    amax = jnp.argmax(sim, axis=-1)
    ax = (amax % n).astype(jnp.float32)
    ay = (amax // n).astype(jnp.float32)
    t = jnp.arange(n * n)
    tx = (t % n).astype(jnp.float32)
    ty = (t // n).astype(jnp.float32)
    g = jnp.exp(-((tx[None, :] - ax[..., None]) ** 2
                  + (ty[None, :] - ay[..., None]) ** 2) / (2 * sigma ** 2))
    return sim * g


def soft_argmax_flow(sim, num_patches: int, *, window: int = 0,
                     beta: float = 0.02):
    """sim: [..., S, T] -> flow [..., S, 2] (x, y) in patch coordinates.

    window > 0: hard window then soft-argmax (SOFT_EVAL_WINDOW);
    window < 0: gaussian kernel with sigma=-window;
    window == 0: plain soft-argmax.
    """
    n = num_patches
    if window > 0:
        sim = window_mask(sim, n, window)
    elif window < 0:
        sim = gaussian_kernel_mask(sim, n, -window)

    probs = jax.nn.softmax(sim.astype(jnp.float32) / beta, axis=-1)
    # reshape targets to a grid and marginalize
    probs = probs.reshape(*probs.shape[:-1], n, n)       # [..., S, ty, tx]
    lin = jnp.linspace(-1.0, 1.0, n)
    gx = jnp.sum(jnp.sum(probs, axis=-2) * lin, axis=-1)  # [..., S]
    gy = jnp.sum(jnp.sum(probs, axis=-1) * lin, axis=-1)
    # unnormalize to patch coords ((v+1)(N-1)/2, `get_flow`->
    # `unnormalise_and_convert_mapping_to_flow`)
    fx = (gx + 1.0) * (n - 1) / 2.0
    fy = (gy + 1.0) * (n - 1) / 2.0
    return jnp.stack([fx, fy], axis=-1)


def kpts_to_patch_idx(kps, num_patches: int, anno_size: int):
    """[..., K, 2] (x, y) pixel keypoints -> flat patch index
    (`utils_correspondence.py:384-389`)."""
    scale = num_patches / anno_size
    px = (kps[..., 0] * scale).astype(jnp.int32)
    py = (kps[..., 1] * scale).astype(jnp.int32)
    px = jnp.clip(px, 0, num_patches - 1)
    py = jnp.clip(py, 0, num_patches - 1)
    return num_patches * py + px


def transfer_keypoints(sim, kps1, num_patches: int, anno_size: int, *,
                       soft_eval: bool = True, window: int = 5,
                       beta: float = 0.02):
    """Predicted (x, y) pixel positions in image 2 for image-1 keypoints
    (`calculate_keypoint_transformation`, `utils_correspondence.py:345-382`).

    sim: [S, T] or [B, S, T]; kps1: [K, 2] / [B, K, 2] (x, y).
    """
    n = num_patches
    stride = anno_size / n
    idx = kpts_to_patch_idx(kps1, n, anno_size)          # [..., K]
    if soft_eval:
        flow = soft_argmax_flow(sim, n, window=window, beta=beta)
        fk = jnp.take_along_axis(flow, idx[..., None], axis=-2)
        nx = jnp.clip(fk[..., 0], 0, n - 1)
        ny = jnp.clip(fk[..., 1], 0, n - 1)
    else:
        sim_k = jnp.take_along_axis(sim, idx[..., None], axis=-2)
        nn = jnp.argmax(sim_k, axis=-1)
        nx = (nn % n).astype(jnp.float32)
        ny = (nn // n).astype(jnp.float32)
    # anno_stride // 2 is a *python float* floor-div in the reference
    x = nx * stride + (stride // 2)
    y = ny * stride + (stride // 2)
    return jnp.stack([x, y], axis=-1)


class PCKResult(NamedTuple):
    per_kpt: jnp.ndarray       # [len(alphas)] keypoint-weighted PCK
    per_img: jnp.ndarray       # [len(alphas)] image-averaged PCK
    n_kpts: jnp.ndarray        # total visible keypoints
    correct: jnp.ndarray       # [len(alphas), B, K] per-kpt correctness


def pck(pred, gt, vis, thresholds, alphas=(0.10, 0.05, 0.01)):
    """PCK over a padded batch of pairs.

    pred/gt: [B, K, 2]; vis: [B, K] bool; thresholds: [B] (alpha multiplies
    the per-pair bbox threshold, `pck_train.py:210-229`).
    """
    alphas = jnp.asarray(alphas, jnp.float32)
    err = jnp.linalg.norm((pred - gt).astype(jnp.float32), axis=-1)  # [B,K]
    thr = alphas[:, None, None] * thresholds[None, :, None]          # [A,B,1]
    correct = (err[None] < thr) & vis[None]                          # [A,B,K]
    n = jnp.maximum(jnp.sum(vis), 1)
    per_kpt = jnp.sum(correct, axis=(1, 2)) / n
    nk = jnp.maximum(jnp.sum(vis, axis=1), 1)                        # [B]
    img_has = jnp.any(vis, axis=1)                                   # [B]
    per_img_each = jnp.sum(correct, axis=2) / nk[None]               # [A,B]
    n_img = jnp.maximum(jnp.sum(img_has), 1)
    per_img = jnp.sum(jnp.where(img_has[None], per_img_each, 0.0),
                      axis=1) / n_img
    return PCKResult(per_kpt=per_kpt, per_img=per_img,
                     n_kpts=jnp.sum(vis), correct=correct)


@functools.partial(jax.jit, static_argnames=("num_patches", "anno_size",
                                             "soft_eval", "window"))
def compute_pck_batch(desc1, desc2, kps1, kps2, vis, thresholds, *,
                      num_patches: int, anno_size: int,
                      soft_eval: bool = True, window: int = 5):
    """End-to-end batched C-score evaluation step.

    desc1/desc2: [B, P, C] raw (unnormalized) patch descriptors;
    kps1/kps2: [B, K, 2] (x, y) pixel keypoints in the anno_size canvas;
    vis: [B, K] mutual visibility; thresholds: [B] bbox thresholds.
    """
    d1 = normalize_feats(desc1)
    d2 = normalize_feats(desc2)
    sim = similarity(d1, d2)
    pred = transfer_keypoints(sim, kps1, num_patches, anno_size,
                              soft_eval=soft_eval, window=window)
    return pck(pred, kps2, vis, thresholds), pred


def concat_two_features(desc_a, desc_b):
    """pck_train_two.py: channel-concat two reps after per-rep
    normalization (`pck_train_two.py:24-34`)."""
    return jnp.concatenate([normalize_feats(desc_a), normalize_feats(desc_b)],
                           axis=-1)


def resize_feature_grid(tokens, out_grid: int, *, method: str = "bilinear"):
    """Resample token feature maps to a new square grid.

    The reference's trained-eval pipeline pre-resizes SD feature maps to the
    60x60 evaluation grid (`C_score/preprocess_map.py`, NUM_PATCHES=60 in
    the trained configs) with bilinear interpolation. tokens: [..., P, C]
    row-major square grids -> [..., out_grid**2, C].
    """
    import jax

    *lead, p, c = tokens.shape
    g = int(round(p ** 0.5))
    grid = tokens.reshape(*lead, g, g, c)
    out = jax.image.resize(grid, (*lead, out_grid, out_grid, c),
                           method=method)
    return out.reshape(*lead, out_grid * out_grid, c)
