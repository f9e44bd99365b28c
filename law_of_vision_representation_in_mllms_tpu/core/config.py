"""One typed run-config for the whole pipeline.

The reference mixes three config styles plus hardcoded path dicts
(SURVEY.md §5: HF dataclasses + shell flags, argparse + YAML namespace
mutation, lmms-eval YAML + k=v strings, edit-in-place constants). Here every
entry point consumes one `RunConfig` loadable from YAML/CLI overrides.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import yaml


@dataclasses.dataclass
class ModelSection:
    vision_tower: str = "openai/clip-vit-large-patch14-336"
    decoder: str = "vicuna-7b"             # vicuna-7b | tiny | path
    # depth override for the decoder preset (None = preset depth). The
    # tower/projector phases of the law pipeline (extract-embeds ->
    # a-score) never run the decoder blocks — a 2-layer vicuna-width
    # decoder gives the TRUE 4096-dim LLM embedding space without
    # initializing 13.4 GB of unused random blocks.
    decoder_layers: Optional[int] = None
    projector_type: str = "mlp2x_gelu"
    select_layer: int = -2
    select_feature: str = "patch"
    # diffusion tower knobs (`train.py:83-88`)
    up_ft_index: int = 0
    t: int = 1
    # NOTE: the conditioning prompt ('' throughout the reference pipeline)
    # is baked into featurizer bundles at PORT time (io/featurizer_bundle
    # precomputes the text embedding); this field is informational — change
    # the prompt by re-porting with different prompt_ids
    prompt: str = ""
    ensemble_size: int = 1
    # None = per-tower default (768 for SD UNets, 512 for XL/DiT/SD3 —
    # `towers.DIFFUSION_IMG_SIZES`)
    img_size: Optional[int] = None
    conv_template: str = "v1"
    # opt-in visual-token pruning (inference accelerator, beyond reference):
    # keep only the top-K image tokens by `prune_score` (auto|saliency|norm).
    # None (default) = exact reference parity.
    visual_keep: Optional[int] = None
    prune_score: str = "auto"
    # decode backend for eval/serve generation (all greedy-equivalent):
    #   greedy      - full-length in-program scan (generate_greedy)
    #   chunked     - N-step scan chunks + host EOS early-exit
    #                 (models/decode.py; the 7B-scale default)
    #   speculative - prompt-lookup speculation (models/speculative.py)
    gen_backend: str = "greedy"
    decode_chunk: int = 16                 # chunk size for gen_backend=chunked
    # gen_backend=chunked only: compile the decode programs with
    # negotiated boundary layouts and relay the params out once into
    # XLA's preferred formats (models/layouts.py). REQUIRED at 7B on a
    # 16 GB chip — default layouts make XLA hoist 3 GB of weight
    # layout-conversion copies out of the token loop and the chunk
    # program OOMs at compile (benchmarks/README.md round-3 log).
    negotiate_layouts: bool = False
    draft_len: int = 8                     # draft length for speculative
    # weight-only decoder quantization for serving/eval (ops/quant.py):
    # "int8" stores the decoder matmul weights as int8 with per-channel
    # scales (dequant-to-bf16 before the dot — no int8 dot_general).
    # Halves the decode param-read HBM floor and resident weight bytes
    # at 7B. None (default) = exact bf16 reference parity.
    quantize: Optional[str] = None
    # KV-cache quantization for generation ("int8" | None): int8 codes +
    # per-(slot, head) scales (ops/quant.quantize_kv). Halves the decode
    # cache's resident bytes and per-step attention read — the round-4
    # roofline's b8 bottleneck term. Composes with `quantize`. With the
    # flash prefill (TPU) prompt K/V compute exactly; only the cache
    # storage is int8. None (default) = exact bf16 cache parity.
    kv_quant: Optional[str] = None
    # Decode-step (q_len=1) attention route for generation
    # ("xla" | "pallas" | "pallas_stacked"). "pallas_stacked" is the
    # flash-decode kernel that block-indexes the stacked KV cache
    # directly (ops/decode_attention.py); "xla" (default) is the
    # reference batched-dot path. See benchmarks/README.md round-5
    # window-term decomposition for the measured difference at 7B.
    decode_attn: Optional[str] = None
    # ViT-tower attention impl override (None = measured per-backend
    # default). "xla_expclamp_fused" is the fastest CLIP-336 path on v5e
    # (+33% end-to-end: 370.6 vs 278 img/s; "xla_expclamp" without the
    # fused denominator measures 311); exact while attention logits stay
    # under 85 — ops/attention.mha_expnomax documents the condition.
    tower_attn_impl: Optional[str] = None
    # Diffusion-tower (UNet/DiT/MMDiT) attention impl override (None =
    # exact softmax). "xla_expclamp_fused" measured +14% on SD1.5@768
    # featurize; same clamp-85 exactness condition as the ViT opt-in.
    diffusion_attn_impl: Optional[str] = None
    # Fast-activation opt-in for erf-GELU ViT towers (DINOv2/OpenCLIP):
    # substitutes the tanh-approximation (x/2(1+tanh(.79(x+.044x^3)))) for
    # the exact erf GELU — measured +18% DINOv2-L throughput (821 vs 695
    # img/s, beating its A100-eager basis; benchmarks/zoo_sweep.py). The
    # approximation's deviation under bf16 tower compute is at the bf16
    # rounding floor (benchmarks/validate_fast_act.py fp32-oracle run).
    # False (default) = exact erf parity.
    tower_fast_act: bool = False
    checkpoint: Optional[str] = None       # orbax train-state dir
    tokenizer: Optional[str] = None        # HF tokenizer path (host-side)
    # ported tower weights, one path per tower-spec entry ('' = skip).
    # ViT entries take a plain io.param_io .npz; diffusion entries take an
    # io.featurizer_bundle .npz (+ .json sidecar with the architecture).
    tower_weights: Optional[List[str]] = None


@dataclasses.dataclass
class TrainSection:
    stage: int = 1
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    epochs: int = 1
    batch_size: int = 32
    grad_accum: int = 1
    max_length: int = 2048
    bf16: bool = True
    gradient_checkpointing: bool = False
    # remat save policy when gradient_checkpointing is on: "block" or
    # "dots" (models/llama._remat)
    remat_policy: str = "block"
    # single-fusion AdamW (train_step.FusedAdamW); False = optax chain
    fused_optimizer: bool = True
    group_by_modality_length: bool = False
    # LoRA finetune (`finetune_lora.sh`: lora_r 128, lora_alpha 256)
    lora_enable: bool = False
    lora_r: int = 128
    lora_alpha: float = 256.0
    # QLoRA: quantize the FROZEN decoder base to "int4"/"int8"
    # (ops/quant.py weight-only; reference `train.py:908-932`
    # BitsAndBytesConfig load_in_{4,8}bit + peft). Requires a frozen
    # decoder (stage 1 or lora_enable); the 4-bit base cuts resident
    # decoder bytes 4x vs bf16 while adapters/projector train dense.
    quantize_base: Optional[str] = None
    # "Switch" steering ablation (train_switch.py): only W trains
    switch_enable: bool = False
    switch_sigma: float = 1.0
    pretrain_mm_mlp_adapter: Optional[str] = None
    output_dir: str = "checkpoints/run"
    save_steps: int = 500
    # prune to the newest N step checkpoints (HF save_total_limit); 0 = all
    save_total_limit: int = 0
    logging_steps: int = 1
    seed: int = 42


@dataclasses.dataclass
class DataSection:
    data_path: str = ""
    image_folder: str = ""
    feature_folder: Optional[str] = None   # feature-cached training
    image_aspect_ratio: str = "pad"


@dataclasses.dataclass
class ParallelSection:
    n_data: Optional[int] = None
    n_model: int = 1
    # context parallelism: shard the decoder sequence `seq` ways and run
    # ring attention over the mesh's seq axis (ops/ring_attention.py) —
    # long-context headroom the reference lacks (2048-token cap)
    seq: int = 1
    # pipeline parallelism: GPipe-schedule the decoder trunk over
    # `pipeline` stages (parallel/pipeline.py); layer stack shards on the
    # mesh's stage axis. Composes with data/tensor parallelism and
    # zero<=2; exclusive with seq>1 and LoRA.
    pipeline: int = 1
    # GPipe microbatch count (bubble = (S-1)/(M+S-1)); None -> one/stage
    pp_microbatches: Optional[int] = None
    # checkpoint each pipeline tick (saves ~(M+S-1)x of circulating
    # activations for one extra forward of recompute)
    pp_remat_ticks: bool = False
    # ZeRO level (deepspeed `scripts/zero{2,3}.json` equivalents):
    # 0 = TP-only/replicated, 2 = shard optimizer state on the data axis,
    # 3 = shard params + optimizer state (FSDP).
    zero: int = 0
    # place AdamW moments in pinned_host memory (zero3_offload.json)
    offload_opt_state: bool = False
    # additionally keep the params in pinned_host between steps (deepspeed
    # offload_param; they are streamed to HBM for each forward)
    offload_params: bool = False


@dataclasses.dataclass
class RunConfig:
    model: ModelSection = dataclasses.field(default_factory=ModelSection)
    train: TrainSection = dataclasses.field(default_factory=TrainSection)
    data: DataSection = dataclasses.field(default_factory=DataSection)
    parallel: ParallelSection = dataclasses.field(
        default_factory=ParallelSection)

    @classmethod
    def from_yaml(cls, path: str, overrides: Optional[List[str]] = None
                  ) -> "RunConfig":
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        return cls.from_dict(raw, overrides)

    @classmethod
    def from_dict(cls, raw: Dict[str, Any],
                  overrides: Optional[List[str]] = None) -> "RunConfig":
        cfg = cls()
        for section_name in ("model", "train", "data", "parallel"):
            section = getattr(cfg, section_name)
            for k, v in (raw.get(section_name) or {}).items():
                if not hasattr(section, k):
                    raise ValueError(
                        f"unknown config key {section_name}.{k}")
                setattr(section, k, v)
        for ov in overrides or []:
            key, _, val = ov.partition("=")
            section_name, _, field = key.partition(".")
            section = getattr(cfg, section_name)
            cur = getattr(section, field)  # raises on unknown keys
            setattr(section, field,
                    _coerce(val, cur, type(section).__annotations__
                            .get(field)))
        return cfg


def _coerce(val: str, like: Any, annotation: Any = None):
    if isinstance(like, bool):
        return val.lower() in ("1", "true", "yes")
    if isinstance(like, int):
        return int(val)
    if isinstance(like, float):
        return float(val)
    if like is None:
        # Optional fields: coerce by the DECLARED type, not by whether the
        # value happens to look numeric (a checkpoint dir named "123" must
        # stay a string; tower_weights must become a list)
        if val.lower() in ("none", "null", ""):
            return None
        ann = str(annotation or "")
        if "List" in ann or "list" in ann:
            import json as _json
            if val.startswith("["):
                return _json.loads(val)
            return val.split(":")       # path-list shorthand a.npz:b.npz
        if "int" in ann:
            return int(val)
        if "float" in ann:
            return float(val)
        return val
    return val
