"""Glue between TowerSpec entries and the diffusion featurizers.

`make_diffusion_apply` returns the callable `llava.encode_images` expects for
`kind == "diffusion"` entries — resolving the FeaturizerConfig from the tower
name (or an explicit override for tests), threading the PRNG, and handling
the image-variations CLIP-image conditioning.

Replaces `DiffVisionTower` (`diffusion_encoder.py:44-94`): where the
reference wraps torch modules and loops lists of images, here the whole
tower is a pure function over (params, pixels) that fuses into the
surrounding jit program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax

from ..core.precision import Precision, DEFAULT_PRECISION
from .featurizer import (FEATURIZER_PRESETS, FeaturizerConfig,
                         extract_features)
from .towers import TowerEntry
from .vit import CLIPVisionPooled, ViTConfig, clip_l14


def resolve_featurizer_config(entry: TowerEntry,
                              override: Optional[FeaturizerConfig] = None
                              ) -> FeaturizerConfig:
    cfg = override or FEATURIZER_PRESETS[entry.name]()
    return dataclasses.replace(cfg, t=entry.t,
                               up_ft_index=(entry.up_ft_index
                                            if entry.up_ft_index is not None
                                            else cfg.up_ft_index),
                               ensemble_size=entry.ensemble_size,
                               img_size=entry.img_size)


def make_image_embed_fn(vit_cfg: Optional[ViTConfig] = None,
                        projection_dim: int = 768,
                        precision: Precision = DEFAULT_PRECISION):
    """CLIP image-embedding conditioner for the imsd tower
    (CLIPVisionModelWithProjection over the raw [-1,1] 224 pixels)."""
    cfg = vit_cfg or clip_l14(224)
    mod = CLIPVisionPooled(cfg, projection_dim, precision)

    def fn(params, pixels224):
        return mod.apply({"params": params}, pixels224)
    return fn


def make_diffusion_apply(*, rng: Optional[jax.Array] = None,
                         deterministic: bool = True,
                         precision: Precision = DEFAULT_PRECISION,
                         config_overrides: Optional[Dict[str, Any]] = None,
                         image_embed_fn=None):
    """Returns apply(tower_params, entry, pixels) -> [B, P, C]."""
    overrides = config_overrides or {}

    def apply(tower_params, entry: TowerEntry, pixels):
        if not tower_params:
            raise ValueError(
                f"diffusion tower '{entry.name}' has no params — port a "
                "checkpoint first (io.port_cli: unet_*/vae_*/dit/mmdit) "
                "and place it under params['towers'][i]")
        cfg = resolve_featurizer_config(entry, overrides.get(entry.name))
        fn = image_embed_fn
        if cfg.family == "imsd" and fn is None:
            fn = make_image_embed_fn(precision=precision)
        return extract_features(tower_params, cfg, pixels, rng,
                                deterministic=deterministic,
                                precision=precision, image_embed_fn=fn)
    return apply
