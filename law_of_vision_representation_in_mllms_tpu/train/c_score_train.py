"""Supervised correspondence training (`C_score/pck_train.py:247-313`).

Trains the AggregationNetwork (CLIP-style symmetric CE over matched keypoint
descriptors, optional dense soft-argmax EPE objective) with AdamW; tracks the
best PCK@0.10 checkpoint ('best' vs 'last', `pck_train.py:300-305`). All
device work (aggregation forward, losses, grads) is one jitted step over a
padded pair batch.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..metrics.aggregation import AggregationNetwork
from ..metrics.c_losses import clip_loss, dense_epe_loss
from ..metrics.c_score import normalize_feats


@dataclasses.dataclass(frozen=True)
class CTrainConfig:
    learning_rate: float = 5e-4
    weight_decay: float = 1e-3
    total_steps: int = 10000
    num_patches: int = 60
    dense_obj: bool = True
    epe_weight: float = 1.0
    window: int = 0


def make_c_train_step(net: AggregationNetwork, cfg: CTrainConfig, opt):
    """step(state, batch) -> (state, metrics).

    batch: feat1/feat2 [B, H, W, C_cat] raw stacked features;
    kp_idx1/kp_idx2 [B, K] keypoint patch indices; kp_valid [B, K];
    gt_flow [B, K, 2] displacement in patch units (for the dense term).
    """

    def loss_fn(params, batch):
        f1 = net.apply({"params": params}, batch["feat1"])
        f2 = net.apply({"params": params}, batch["feat2"])
        b, h, w, c = f1.shape
        d1 = normalize_feats(f1.reshape(b, h * w, c))
        d2 = normalize_feats(f2.reshape(b, h * w, c))

        logit_scale = params["logit_scale"]

        def per_pair(d1i, d2i, idx1, idx2, valid, flow):
            k1 = jnp.take(d1i, idx1, axis=0)          # [K, C]
            k2 = jnp.take(d2i, idx2, axis=0)
            # invalid keypoints become zero vectors -> near-uniform logits
            k1 = k1 * valid[:, None]
            k2 = k2 * valid[:, None]
            l = clip_loss(k1, k2, logit_scale)
            if cfg.dense_obj:
                l = l + cfg.epe_weight * dense_epe_loss(
                    d1i, d2i, idx1, flow, cfg.num_patches,
                    window=cfg.window)
            return l

        losses = jax.vmap(per_pair)(d1, d2, batch["kp_idx1"],
                                    batch["kp_idx2"], batch["kp_valid"],
                                    batch["gt_flow"])
        return jnp.mean(losses)

    def step(state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], batch)
        updates, opt_state = opt.update(grads, state["opt_state"],
                                        state["params"])
        params = optax.apply_updates(state["params"], updates)
        return ({"params": params, "opt_state": opt_state,
                 "step": state["step"] + 1},
                {"loss": loss})

    return step


def init_c_train(net: AggregationNetwork, cfg: CTrainConfig, rng,
                 sample_feat_shape: Tuple[int, ...]):
    params = net.init(rng, jnp.zeros((1, *sample_feat_shape)))["params"]
    opt = optax.adamw(
        optax.warmup_cosine_decay_schedule(0.0, cfg.learning_rate,
                                           max(1, cfg.total_steps // 100),
                                           cfg.total_steps),
        weight_decay=cfg.weight_decay)
    state = {"params": params, "opt_state": opt.init(params),
             "step": jnp.zeros((), jnp.int32)}
    return state, opt
