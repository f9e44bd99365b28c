"""MPT decoder — the legacy LLaVA branch.

Reference: `llava/model/language_model/mpt/` (~1.9k LoC torch + a Triton
flash-attention kernel, `flash_attn_triton.py`). Architecture: ALiBi
positional biases (no RoPE), pre-LN blocks with LayerNorm (no bias in MPT
checkpoints: `norm.py LPLayerNorm`), fused-qkv attention without biases,
GELU MLP, tied embeddings for the LM head.

Same functional stacked-params + lax.scan design as models/llama.py; the
Triton kernel's job is covered by `ops/flash_attention.py`: `use_flash`
runs the Pallas flash kernel with the ALiBi bias generated in-kernel
from the per-head slopes (zero HBM bias traffic — the Triton kernel
loads a materialized bias). Golden-tested vs HF MptForCausalLM; flash
fwd+grad parity in tests/test_mpt.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from ..core.precision import Precision, DEFAULT_PRECISION


@dataclasses.dataclass(frozen=True)
class MptConfig:
    vocab_size: int = 50432
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    expansion_ratio: int = 4
    alibi_bias_max: float = 8.0
    ln_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def tiny(vocab_size: int = 128, hidden_size: int = 32, num_layers: int = 2,
         num_heads: int = 4) -> MptConfig:
    return MptConfig(vocab_size=vocab_size, hidden_size=hidden_size,
                     num_layers=num_layers, num_heads=num_heads)


def alibi_slopes(num_heads: int, bias_max: float = 8.0) -> jnp.ndarray:
    """MPT's ALiBi slopes (`mpt/attention.py build_alibi_bias` semantics,
    matching HF `build_mpt_alibi_tensor`)."""
    n = 2 ** math.ceil(math.log2(num_heads))
    base = jnp.arange(1, n + 1, dtype=jnp.float32) * (bias_max / n)
    slopes = 1.0 / jnp.power(2.0, base)
    if n != num_heads:
        slopes = jnp.concatenate([slopes[1::2], slopes[0::2]])[:num_heads]
    return slopes


def alibi_bias(num_heads: int, seq_len: int,
               bias_max: float = 8.0) -> jnp.ndarray:
    """[H, 1, S] additive bias (HF MPT: -(S-1-j) * slope per key j)."""
    dist = jnp.arange(1 - seq_len, 1, dtype=jnp.float32)[None, None, :]
    return dist * alibi_slopes(num_heads, bias_max)[:, None, None]


def init_params(rng, cfg: MptConfig, dtype=jnp.float32) -> Dict[str, Any]:
    keys = jax.random.split(rng, 4)
    d, L = cfg.hidden_size, cfg.num_layers

    def norm_init(k, *shape):
        return (jax.random.normal(k, shape) * 0.02).astype(dtype)

    return {
        "embed": norm_init(keys[0], cfg.vocab_size, d),
        "layers": {
            "wqkv": norm_init(keys[1], L, d, 3 * d),
            "wo": norm_init(keys[2], L, d, d),
            "up": norm_init(keys[3], L, d, cfg.expansion_ratio * d),
            "down": norm_init(keys[0], L, cfg.expansion_ratio * d, d),
            "ln1": jnp.ones((L, d), dtype),
            "ln2": jnp.ones((L, d), dtype),
        },
        "final_ln": jnp.ones((d,), dtype),
    }


def _ln(x, weight, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * lax.rsqrt(var + eps) * weight.astype(jnp.float32)
            ).astype(x.dtype)


def forward(params, cfg: MptConfig, input_ids, *, attn_mask=None,
            precision: Precision = DEFAULT_PRECISION,
            use_flash: bool | None = None):
    """input_ids [B, S] -> logits [B, S, V] (tied lm head).

    use_flash routes attention through the Pallas flash kernel with the
    ALiBi bias generated IN-KERNEL from the per-head slopes
    (ops/flash_attention.py alibi_slopes) — the reference's Triton
    branch (`mpt/flash_attn_triton.py`) materializes a bias tensor
    instead. Like the LLaMA flash path it assumes right padding
    (causality makes padded keys unreachable from valid queries).
    None = flash on TPU, XLA elsewhere."""
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    cd = precision.compute_dtype
    b, s = input_ids.shape
    h = params["embed"][jnp.clip(input_ids, 0, cfg.vocab_size - 1)
                        ].astype(cd)
    slopes = alibi_slopes(cfg.num_heads, cfg.alibi_bias_max)
    bias = alibi_bias(cfg.num_heads, s, cfg.alibi_bias_max)   # [H,1,S]
    causal = jnp.tril(jnp.ones((s, s), bool))
    mask = causal[None, None]
    if attn_mask is not None:
        mask = mask & attn_mask[:, None, None, :]

    def body(carry, lp):
        x = carry
        hn = _ln(x, lp["ln1"], cfg.ln_eps)
        qkv = hn @ lp["wqkv"].astype(cd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = cfg.head_dim

        def heads(t):
            return t.reshape(b, s, cfg.num_heads, hd)
        q, k, v = heads(q), heads(k), heads(v)
        if use_flash:
            from ..ops.flash_attention import flash_mha_trainable
            attn = flash_mha_trainable(q, k, v, causal=True,
                                       alibi_slopes=slopes).astype(cd)
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits * (hd ** -0.5) + bias[None]
            logits = jnp.where(mask, logits, -1e30)
            probs = jax.nn.softmax(logits, axis=-1).astype(cd)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                              preferred_element_type=jnp.float32
                              ).astype(cd)
        x = x + attn.reshape(b, s, cfg.hidden_size) @ lp["wo"].astype(cd)
        hn = _ln(x, lp["ln2"], cfg.ln_eps)
        hn = jax.nn.gelu(hn @ lp["up"].astype(cd), approximate=False)
        x = x + hn @ lp["down"].astype(cd)
        return x, ()

    h, _ = lax.scan(body, h, params["layers"])
    h = _ln(h, params["final_ln"], cfg.ln_eps)
    return (h @ params["embed"].astype(h.dtype).T).astype(jnp.float32)


def port_mpt(state_dict, cfg: MptConfig) -> Dict:
    """HF MptForCausalLM -> stacked params."""
    import numpy as np

    def t(key):
        return state_dict[key].detach().float().numpy()

    def stack(fmt, transpose=True):
        ws = [t(fmt.format(i=i)) for i in range(cfg.num_layers)]
        return np.stack([w.T if transpose else w for w in ws])

    return {
        "embed": t("transformer.wte.weight"),
        "layers": {
            "wqkv": stack("transformer.blocks.{i}.attn.Wqkv.weight"),
            "wo": stack("transformer.blocks.{i}.attn.out_proj.weight"),
            "up": stack("transformer.blocks.{i}.ffn.up_proj.weight"),
            "down": stack("transformer.blocks.{i}.ffn.down_proj.weight"),
            "ln1": stack("transformer.blocks.{i}.norm_1.weight",
                         transpose=False),
            "ln2": stack("transformer.blocks.{i}.norm_2.weight",
                         transpose=False),
        },
        "final_ln": t("transformer.norm_f.weight"),
    }
