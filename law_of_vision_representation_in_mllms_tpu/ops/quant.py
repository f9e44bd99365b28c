"""Weight-only int8 quantization for the decode path.

The reference trains/serves with bitsandbytes 4/8-bit layers
(`llava/train/train.py:908-932` load_in_{4,8}bit); SURVEY §2.9 keeps
quantized TRAINING out of parity scope. This module is the TPU-native
piece that matters for serving: single-token decode is HBM-bandwidth
bound (the whole 13.4 GB bf16 parameter set is read once per step at
7B), so storing the matmul weights as int8 with per-output-channel
scales halves the param-read floor — and halves resident HBM, lifting
the practical batch ceiling.

Design (dequant-to-bf16, NO int8 dot_general):
- symmetric per-output-channel scales: `scale_j = max_i |W_ij| / 127`,
  `q_ij = round(W_ij / scale_j)` — the standard near-lossless
  weight-only scheme for decode;
- the matmul computes `(x @ convert(q8)) * scale`: the scale applies
  AFTER the dot (it is per-output-column, so it commutes with the
  contraction), which keeps the big int8->bf16 convert a pure
  elementwise producer that XLA fuses into the dot's operand read —
  the int8 bytes are what crosses HBM. int8 `dot_general` itself is
  never emitted (it wedges this environment's remote compiler,
  CLAUDE.md).

A quantized weight is a dict leaf `{"q8": int8 [..., di, do],
"scale": f32 [..., 1, do]}` in place of the dense [..., di, do] array —
`lax.scan` over stacked layers slices dict leaves transparently, and
`models/llama._layer` dispatches on the leaf type.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

# decoder matmul weights worth quantizing (embed stays dense: it is a
# gather, not a matmul, and shares no kernel with the dot path)
DECODER_TARGETS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


def quantize_int8(w, axis: int = -2) -> Dict[str, Any]:
    """Symmetric per-output-channel int8 quantization of a dense weight.

    `axis` is the CONTRACTING dimension (reduced over by the matmul);
    scales are computed over it so each output channel gets one scale.
    """
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q8": q, "scale": scale.astype(jnp.float32)}


def dequantize_int8(qw: Dict[str, Any], dtype=jnp.float32):
    return qw["q8"].astype(dtype) * qw["scale"].astype(dtype)


def is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and "q8" in leaf and "scale" in leaf


def int8_matmul(x, qw: Dict[str, Any]):
    """`x @ dequant(qw)` with the per-channel scale applied after the
    dot (mathematically identical; keeps the convert fusible into the
    dot's int8 operand read)."""
    y = x @ qw["q8"].astype(x.dtype)
    return y * qw["scale"].astype(x.dtype).reshape(
        (1,) * (y.ndim - 1) + (-1,))


def quantize_decoder(params: Dict[str, Any],
                     targets=DECODER_TARGETS,
                     quantize_lm_head: bool = True) -> Dict[str, Any]:
    """Quantize a LLaMA decoder param tree's matmul weights in place
    (returns a new tree; embed/norms stay dense). Stacked [L, di, do]
    layer weights get per-(layer, output-channel) scales [L, 1, do]."""
    out = dict(params)
    layers = dict(params["layers"])
    for t in targets:
        if t in layers and not is_quantized(layers[t]):
            layers[t] = quantize_int8(layers[t], axis=-2)
    out["layers"] = layers
    if quantize_lm_head and "lm_head" in out \
            and not is_quantized(out["lm_head"]):
        out["lm_head"] = quantize_int8(out["lm_head"], axis=-2)
    return out


def quantized_bytes(params) -> int:
    """Resident bytes of a (possibly partially quantized) param tree."""
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
