"""Feature-extraction runner: RunConfig -> per-image feature dump."""

from __future__ import annotations

import glob
import json
import os

import jax

from ..core.config import RunConfig
from ..core.precision import DEFAULT_PRECISION, FP32_PRECISION
from ..data.image_processing import processor_for_tower
from .features import extract_tower_features, make_vit_extractor


def run_feature_extraction(cfg: RunConfig, images: str, out_dir: str, *,
                           batch_size: int = 16, suffix: str = "") -> int:
    precision = DEFAULT_PRECISION if cfg.train.bf16 else FP32_PRECISION
    if os.path.isdir(images):
        paths = sorted(p for ext in ("jpg", "jpeg", "png")
                       for p in glob.glob(f"{images}/**/*.{ext}",
                                          recursive=True))
    else:
        with open(images) as f:
            paths = json.load(f)

    from ..train.runner import build_model
    model_cfg, params = build_model(cfg)
    entry = model_cfg.tower_spec.entries[0]
    if entry.kind == "vit":
        fn = make_vit_extractor(entry.vit_config, params["towers"][0],
                                select_layer=cfg.model.select_layer,
                                precision=precision)
    elif entry.kind == "diffusion":
        # deterministic featurization (posterior mean, zero noise) — the
        # A/C-score caches must be bit-stable across runs
        # (`C_score/extract_feature.py:16-133` is the reference equivalent)
        from ..models.tower_runtime import make_diffusion_apply
        import jax as _jax
        dapply = make_diffusion_apply(
            deterministic=True, precision=precision,
            config_overrides=model_cfg.featurizer_overrides)
        tower_params = params["towers"][0]
        fn = _jax.jit(lambda px: dapply(tower_params, entry, px))
    else:
        raise ValueError(
            f"cannot extract features from a '{entry.kind}' tower "
            f"({entry.name}) — precomputed-feature entries ARE the cache")
    proc = processor_for_tower(entry.name, entry.img_size)
    written = extract_tower_features(
        fn, paths, proc, out_dir, batch_size=batch_size, suffix=suffix,
        process_index=jax.process_index(),
        process_count=jax.process_count())
    return len(written)
