"""Perceiver resampler projector (`perceiverNx`).

Reference: `llava/model/multimodal_projector/perceiver_helpers.py` (flamingo
PerceiverResampler: 64 learned latents cross-attend to the image tokens, N
blocks of attention+FF, final LN) followed by a Linear to the LLM width
(`multimodal_projector/builder.py:54-57`). Functional pytree params like the
other projectors.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..core.precision import Precision, DEFAULT_PRECISION

# reference defaults (`perceiver_helpers.py:73-76`, used as-is by
# `builder.py:54-57`): 64 learned latents, 8 heads x 64 dims
NUM_LATENTS = 64
DEFAULT_HEADS = 8


def init_perceiver_projector(rng, depth: int, mm_hidden_size: int,
                             hidden_size: int, *, num_latents: int = 64,
                             heads: int = 8, head_dim: int = 64,
                             ff_mult: int = 4,
                             dtype=jnp.float32) -> Dict[str, Any]:
    d = mm_hidden_size
    inner = heads * head_dim
    keys = iter(jax.random.split(rng, 5 * depth + 4))

    def mat(shape, scale=0.02):
        return (jax.random.normal(next(keys), shape) * scale).astype(dtype)

    layers = []
    for _ in range(depth):
        layers.append({
            "norm_media": {"scale": jnp.ones((d,), dtype),
                           "bias": jnp.zeros((d,), dtype)},
            "norm_latents": {"scale": jnp.ones((d,), dtype),
                             "bias": jnp.zeros((d,), dtype)},
            "to_q": mat((d, inner)),
            "to_kv": mat((d, 2 * inner)),
            "to_out": mat((inner, d)),
            "ff_norm": {"scale": jnp.ones((d,), dtype),
                        "bias": jnp.zeros((d,), dtype)},
            "ff_in": mat((d, d * ff_mult)),
            "ff_out": mat((d * ff_mult, d)),
        })
    return {
        "latents": mat((num_latents, d), scale=1.0),
        "layers": layers,
        "final_norm": {"scale": jnp.ones((d,), dtype),
                       "bias": jnp.zeros((d,), dtype)},
        "proj": {"kernel": mat((d, hidden_size)),
                 "bias": jnp.zeros((hidden_size,), dtype)},
    }


def _ln(x, p):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def apply_perceiver_projector(params, feats,
                              precision: Precision = DEFAULT_PRECISION,
                              heads: int = DEFAULT_HEADS):
    """feats [B, P, mm_hidden] -> [B, num_latents, hidden].

    `heads` is a STATIC argument (the param tree stays pure float arrays so
    grad/jit work); the reference always uses the default 8
    (`builder.py:54-57` passes only dim/depth)."""
    cd = precision.compute_dtype
    x = feats.astype(cd)
    b = x.shape[0]
    head_dim = params["layers"][0]["to_q"].shape[-1] // heads
    lat = jnp.broadcast_to(params["latents"].astype(cd)[None],
                           (b, *params["latents"].shape))
    for lp in params["layers"]:
        xm = _ln(x, lp["norm_media"])
        lm = _ln(lat, lp["norm_latents"])
        q = lm @ lp["to_q"].astype(cd)
        kv_in = jnp.concatenate([xm, lm], axis=1)
        kv = kv_in @ lp["to_kv"].astype(cd)
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            return t.reshape(b, t.shape[1], heads, head_dim
                             ).transpose(0, 2, 1, 3)
        qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)
        qh = qh * (head_dim ** -0.5)
        sim = jnp.einsum("bhid,bhjd->bhij", qh, kh,
                         preferred_element_type=jnp.float32)
        sim = sim - jax.lax.stop_gradient(sim.max(-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1).astype(cd)
        out = jnp.einsum("bhij,bhjd->bhid", attn, vh,
                         preferred_element_type=jnp.float32).astype(cd)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, heads * head_dim)
        lat = lat + out @ lp["to_out"].astype(cd)
        h = _ln(lat, lp["ff_norm"])
        h = jax.nn.gelu(h @ lp["ff_in"].astype(cd), approximate=False)
        lat = lat + h @ lp["ff_out"].astype(cd)
    lat = _ln(lat, params["final_norm"])
    return lat @ params["proj"]["kernel"].astype(cd) + \
        params["proj"]["bias"].astype(cd)
