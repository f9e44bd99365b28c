"""Evaluation runner: RunConfig -> LlavaLMM -> tasks.

The `accelerate launch -m lmms_eval --model llava ...` equivalent
(`lmms_eval/__main__.py`), plus the embedding-extraction driver
(`run_embed_extract.sh`) as a function instead of a shell loop around
commented-out code.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax

from ..core.config import RunConfig
from ..core.precision import DEFAULT_PRECISION, FP32_PRECISION
from ..data import get_template
from ..models.tower_runtime import make_diffusion_apply
from .evaluator import simple_evaluate
from .llava_adapter import LlavaLMM
from .task import load_task
from .tasks import task_yaml, PAPER_TASKS


def _resolve_task(name_or_path: str):
    if os.path.exists(name_or_path):
        return name_or_path
    if name_or_path in PAPER_TASKS:
        return task_yaml(name_or_path)
    raise FileNotFoundError(f"unknown task {name_or_path}")


def build_lmm(cfg: RunConfig) -> LlavaLMM:
    from ..train.runner import build_model, build_tokenizer
    precision = DEFAULT_PRECISION if cfg.train.bf16 else FP32_PRECISION
    model_cfg, params = build_model(cfg)
    if cfg.model.quantize in ("int8", "int4"):
        from ..ops.quant import quantize_decoder
        params = dict(params)
        params["decoder"] = quantize_decoder(
            params["decoder"],
            bits=4 if cfg.model.quantize == "int4" else 8)
    elif cfg.model.quantize:
        raise ValueError(f"unknown model.quantize {cfg.model.quantize!r}")
    tokenizer = build_tokenizer(cfg)
    diffusion_apply = None
    if any(e.kind == "diffusion" for e in model_cfg.tower_spec.entries):
        diffusion_apply = make_diffusion_apply(
            precision=precision,
            config_overrides=model_cfg.featurizer_overrides)
    return LlavaLMM(params, model_cfg, tokenizer,
                    get_template(cfg.model.conv_template),
                    precision=precision, diffusion_apply=diffusion_apply,
                    pad_square=cfg.data.image_aspect_ratio == "pad",
                    gen_backend=cfg.model.gen_backend,
                    decode_chunk=cfg.model.decode_chunk,
                    draft_len=cfg.model.draft_len,
                    negotiate_layouts=cfg.model.negotiate_layouts)


def run_evaluation(cfg: RunConfig, tasks: List[str], *,
                   limit: Optional[int] = None, log_samples: bool = False,
                   model: str = "llava", model_args: Optional[dict] = None):
    """`--model llava` evaluates this framework's model built from the
    RunConfig; any other name resolves through the adapter registry with
    `model_args` kwargs (the reference's `--model X --model_args k=v`,
    `lmms_eval/__main__.py:43`)."""
    if model == "llava":
        lmm = build_lmm(cfg)
    else:
        from .models_registry import build_lmm_by_name
        lmm = build_lmm_by_name(model, **(model_args or {}))
    paths = [_resolve_task(t) for t in tasks]
    return simple_evaluate(lmm, paths, limit=limit, log_samples=log_samples,
                           process_index=jax.process_index(),
                           process_count=jax.process_count())


def run_embed_extraction(cfg: RunConfig, task: str, out_dir: str, *,
                         limit: int = 100) -> int:
    """A-score phase A: dump post-projector embeddings for the first `limit`
    docs of a benchmark (`run_embed_extract.sh:25-35` + the commented hooks
    in `lmms_eval/models/llava.py:38-51` / `llava_arch.py:475-476`)."""
    lmm = build_lmm(cfg)
    t = load_task(_resolve_task(task), limit=limit)
    requests = t.build_requests(list(range(len(t.docs)))[:limit])
    return lmm.dump_image_embeds_for_docs(requests, out_dir, limit=limit)
