"""Attention ops.

`mha` is the XLA-fused reference path (fp32 softmax, bf16 matmuls — XLA fuses
the scale/softmax chain into the MXU matmuls). The Pallas flash-attention
kernel in `ops.flash_attention` is used for long decoder sequences on TPU;
both share this signature so models can switch by config.

Replaces the reference's flash-attn CUDA monkey-patch
(`llava/train/llama_flash_attn_monkey_patch.py`) and the Triton kernel
(`llava/model/language_model/mpt/flash_attn_triton.py`).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def mha(q, k, v, *, bias=None, mask=None, scale: float | None = None,
        accum_dtype=jnp.float32):
    """Multi-head attention.

    Args:
      q: [B, Sq, H, D]
      k, v: [B, Skv, H, D]   (H may be num_kv_heads; caller repeats for GQA)
      bias: broadcastable to [B, H, Sq, Skv], added to logits.
      mask: broadcastable boolean [B, H, Sq, Skv]; False -> -inf.
      scale: logit scale; default 1/sqrt(D).

    Returns [B, Sq, H, D] in q.dtype.
    """
    *_, d = q.shape
    if scale is None:
        scale = d ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=accum_dtype)
    logits = logits * jnp.asarray(scale, accum_dtype)
    if bias is not None:
        logits = logits + bias.astype(accum_dtype)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.asarray(-1e30, accum_dtype))
    probs = _softmax(logits).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=accum_dtype)
    return out.astype(q.dtype)


def _softmax(logits):
    m = lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    unnorm = jnp.exp(logits - m)
    return unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)


def causal_mask(sq: int, skv: int, dtype=bool):
    """Lower-triangular mask aligned to the *end* of the kv sequence."""
    i = jnp.arange(sq)[:, None]
    j = jnp.arange(skv)[None, :]
    return (j - (skv - sq)) <= i
