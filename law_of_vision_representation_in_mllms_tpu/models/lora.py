"""LoRA adapters for the LLaMA decoder.

Reference: `llava/train/train.py:945-985` (peft LoraConfig over the decoder's
linear layers, r/alpha/dropout flags at :110-115, LoRA-split checkpoint save
at :1122-1132). TPU-native: low-rank factors live in their own pytree,
applied per-site as x @ A @ B * (alpha/r) — rank-r matmuls that never
materialize weight deltas — and trained via the same optax.multi_transform
freeze labels as stage 1. `merge_lora` folds the adapters into the base
weights for serving.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from .llama import LlamaConfig

LORA_TARGETS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    rank: int = 16
    alpha: float = 32.0          # train.py:111 lora_alpha default 16/32
    targets: Sequence[str] = LORA_TARGETS

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank


def _dims(cfg: LlamaConfig):
    d, i, hd = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    return {
        "wq": (d, cfg.num_heads * hd),
        "wk": (d, cfg.num_kv_heads * hd),
        "wv": (d, cfg.num_kv_heads * hd),
        "wo": (cfg.num_heads * hd, d),
        "gate": (d, i),
        "up": (d, i),
        "down": (i, d),
    }


def init_lora(rng, cfg: LlamaConfig, lora_cfg: LoraConfig,
              dtype=jnp.float32) -> Dict[str, Any]:
    dims = _dims(cfg)
    out = {}
    for t in lora_cfg.targets:
        din, dout = dims[t]
        ka, rng = jax.random.split(rng)
        # A ~ small normal, B = 0 (standard LoRA init: delta starts at 0)
        out[f"{t}_a"] = (jax.random.normal(
            ka, (cfg.num_layers, din, lora_cfg.rank)) * 0.01).astype(dtype)
        out[f"{t}_b"] = jnp.zeros((cfg.num_layers, lora_cfg.rank, dout),
                                  dtype)
    return out


def lora_matmul(x, w, lora_layer, name: str, scaling: float):
    """x @ w plus the rank-r delta when `name` has adapters."""
    y = x @ w
    a = lora_layer.get(f"{name}_a")
    if a is None:
        return y
    b = lora_layer[f"{name}_b"]
    return y + ((x @ a.astype(x.dtype)) @ b.astype(x.dtype)
                ) * jnp.asarray(scaling, x.dtype)


def merge_lora(decoder_params, lora_params, lora_cfg: LoraConfig):
    """Fold adapters into the base stacked weights (serving)."""
    merged = dict(decoder_params)
    layers = dict(decoder_params["layers"])
    for t in lora_cfg.targets:
        a, b = lora_params[f"{t}_a"], lora_params[f"{t}_b"]
        delta = jnp.einsum("ldr,lrh->ldh", a.astype(jnp.float32),
                           b.astype(jnp.float32)) * lora_cfg.scaling
        layers[t] = (layers[t].astype(jnp.float32) + delta
                     ).astype(decoder_params["layers"][t].dtype)
    merged["layers"] = layers
    return merged


def lora_freeze_labels(params) -> Dict:
    """Only the 'lora' subtree trains."""
    labels = jax.tree.map(lambda _: "freeze", params)
    labels["lora"] = jax.tree.map(lambda _: "train", params["lora"])
    return labels
