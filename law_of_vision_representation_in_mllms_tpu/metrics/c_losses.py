"""Training losses for supervised correspondence
(`C_score/utils/utils_losses.py`).

- `clip_loss`: symmetric cross-entropy over matched keypoint descriptors
  (`cal_clip_loss` :79-90).
- `dense_epe_loss`: correlation -> soft-argmax displacement vs ground-truth
  keypoint flow (`get_corr_map_loss` :6-17).
- `self_contrastive_loss`: neighbors similar / random non-neighbors
  dissimilar (`self_contrastive_loss` :19-72), vectorized (the reference
  loops python-side over sampled pixel pairs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .aggregation import soft_argmax_displacement
from .c_score import similarity


def clip_loss(desc1, desc2, logit_scale):
    """desc1/desc2: [N, C] matched (keypoint) descriptor pairs."""
    scale = jnp.exp(logit_scale)
    logits_12 = scale * desc1 @ desc2.T
    labels = jnp.arange(desc1.shape[0])

    def ce(logits):
        lp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(lp, labels[:, None],
                                             axis=-1))
    return (ce(logits_12) + ce(logits_12.T)) / 2


def dense_epe_loss(desc1, desc2, kp_patch_idx, gt_flow, num_patches: int,
                   *, window: int = 0):
    """desc1/desc2 [P, C] normalized; kp_patch_idx [K]; gt_flow [K, 2]
    (x, y displacement in patch units)."""
    sim = similarity(desc1, desc2)
    disp = soft_argmax_displacement(sim, num_patches, window=window)
    pred = disp[kp_patch_idx]
    return jnp.mean(jnp.linalg.norm(pred - gt_flow, axis=-1))


def self_contrastive_loss(feat_map, rng, *, lambda_factor: float = 0.1):
    """feat_map: [B, H, W, C]. Local term: maximize dot products with the 8
    neighbors; global term: minimize dot products of random non-neighbor
    pairs."""
    b, h, w, c = feat_map.shape
    local = 0.0
    for di, dj in ((0, 1), (1, 0), (1, 1), (1, -1), (0, -1), (-1, 0),
                   (-1, -1), (-1, 1)):
        shifted = jnp.roll(feat_map, (di, dj), axis=(1, 2))
        dot = jnp.sum(feat_map * shifted, axis=-1)          # [B, H, W]
        ii = jnp.arange(h)[:, None]
        jj = jnp.arange(w)[None, :]
        valid = jnp.ones((h, w), bool)
        if di > 0:
            valid = valid & (ii >= di)
        if di < 0:
            valid = valid & (ii < h + di)
        if dj > 0:
            valid = valid & (jj >= dj)
        if dj < 0:
            valid = valid & (jj < w + dj)
        local -= jnp.mean(jnp.where(valid, dot, 0.0))

    n = h * w
    k1, k2 = jax.random.split(rng)
    src = jax.random.randint(k1, (n, 2), 0, jnp.asarray([h, w]))
    dst = jax.random.randint(k2, (n, 2), 0, jnp.asarray([h, w]))
    non_neighbor = (jnp.abs(src - dst) > 1).any(axis=-1)
    f1 = feat_map[:, src[:, 0], src[:, 1]]                   # [B, n, C]
    f2 = feat_map[:, dst[:, 0], dst[:, 1]]
    dots = jnp.sum(f1 * f2, axis=-1)                         # [B, n]
    glob = jnp.sum(jnp.where(non_neighbor[None], dots, 0.0)) / b
    return local + lambda_factor * glob
