"""Offline per-image feature extraction.

Replaces BOTH reference extractors with one batched jitted driver:
- `llava/feature/extract.py` (DDP/NCCL loop saving per-image tower outputs
  for feature-cached training),
- `C_score/extract_feature.py` (per-image SPair feature dump).

TPU-first: images are batched (the reference runs batch 1 per GPU), the
tower forward is one jitted program, work shards across processes by
index striding (`parallel.process_shard`), and features land as .npy next
to a manifest.
"""

from __future__ import annotations

import json
import os
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.precision import Precision, DEFAULT_PRECISION
from ..data.image_processing import (ImageProcessorConfig, preprocess_image,
                                     processor_for_tower)
from ..models.vit import ViTTower, ViTConfig


def make_vit_extractor(cfg: ViTConfig, params, *, select_layer: int = -2,
                       select_feature: str = "patch",
                       precision: Precision = DEFAULT_PRECISION):
    tower = ViTTower(cfg, select_layer, select_feature, precision)

    checked = []

    @jax.jit
    def fn(pixels):
        return tower.apply({"params": params}, pixels)

    if str(cfg.attn_impl).startswith("xla_expclamp"):
        # first-batch clamp guard for the fused no-max softmax
        # (ops/clamp_guard.py, VERDICT r3 #5)
        def guarded(pixels):
            if not checked:
                checked.append(True)
                from ..ops import clamp_guard
                if clamp_guard.guard_enabled():
                    clamp_guard.check_clamp_headroom(
                        lambda px: tower.apply({"params": params}, px),
                        pixels, label=f"tower {cfg.attn_impl}")
            return fn(pixels)
        return guarded
    return fn


def extract_tower_features(apply_fn: Callable, image_paths: Sequence[str],
                           processor: ImageProcessorConfig, out_dir: str, *,
                           batch_size: int = 16, suffix: str = "",
                           process_index: int = 0, process_count: int = 1,
                           pad_square: bool = False) -> List[str]:
    """Run `apply_fn(pixels [B,H,W,3]) -> [B,P,C]` over images, saving one
    `<stem><suffix>.npy` per image. Returns written paths (this process)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    mine = list(image_paths)[process_index::process_count]
    written = []
    for s in range(0, len(mine), batch_size):
        chunk = mine[s:s + batch_size]
        pixels = np.stack([
            preprocess_image(Image.open(p), processor,
                             pad_square=pad_square) for p in chunk])
        # pad the tail batch to the jitted batch size
        n = len(chunk)
        if n < batch_size:
            pixels = np.concatenate(
                [pixels, np.zeros((batch_size - n, *pixels.shape[1:]),
                                  np.float32)])
        from ..utils.retry import retry_transient
        px = jnp.asarray(pixels)
        feats = np.asarray(retry_transient(
            lambda: apply_fn(px), label="feature extraction"))[:n]
        for p, f in zip(chunk, feats):
            stem = os.path.splitext(os.path.basename(p))[0]
            out = os.path.join(out_dir, f"{stem}{suffix}.npy")
            np.save(out, f.astype(np.float32))
            written.append(out)
    manifest = os.path.join(out_dir, f"manifest_{process_index}.json")
    with open(manifest, "w") as f:
        json.dump({"count": len(written), "suffix": suffix}, f)
    return written
