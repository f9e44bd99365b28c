"""LLaMA decoder, TPU-native.

Functional implementation (pure functions over a stacked-parameter pytree)
rather than a module tree: layers are stacked along a leading axis and the
trunk is one `lax.scan`, which keeps compile time flat in depth and gives
GSPMD a single well-annotated weight tensor per role to shard.

Replaces the reference's `LlavaLlamaForCausalLM` torch wrapper
(`llava/model/language_model/llava_llama.py:31-160`) and its flash-attn
monkey patch (`llava/train/llama_flash_attn_monkey_patch.py`). Numerics match
HF `LlamaForCausalLM` (golden-tested): RMSNorm in fp32, rotate-half RoPE,
fp32 softmax, SwiGLU MLP, optional GQA.

Sharding (2-D mesh (data, model)):
  wq/wk/wv/gate/up: shard last dim on "model"; wo/down: shard first dim;
  embed/lm_head: shard vocab. Activations shard batch on "data". See
  `param_partition_specs`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..core.precision import Precision, DEFAULT_PRECISION


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    max_seq_len: int = 2048
    # decode-step (q_len=1) attention route: "xla" = the single-pass
    # elementwise formulation (_decode_attention), "pallas" = the
    # flash-decode kernel (ops/decode_attention.py, opt-in)
    decode_attn: str = "xla"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def vicuna_7b() -> LlamaConfig:
    """lmsys/vicuna-7b-v1.5 — the decoder used by every reference model
    (scripts/v1_5/train/pretrain.sh:5)."""
    return LlamaConfig()


def tiny(vocab_size: int = 256, hidden_size: int = 64, num_layers: int = 2,
         num_heads: int = 4, num_kv_heads: int = 2,
         intermediate_size: int = 128, max_seq_len: int = 128
         ) -> LlamaConfig:
    return LlamaConfig(vocab_size=vocab_size, hidden_size=hidden_size,
                       intermediate_size=intermediate_size,
                       num_layers=num_layers, num_heads=num_heads,
                       num_kv_heads=num_kv_heads, max_seq_len=max_seq_len)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def init_params(rng, cfg: LlamaConfig, dtype=jnp.float32) -> Dict[str, Any]:
    keys = jax.random.split(rng, 8)
    d, i, hd = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    nh, nkv, L = cfg.num_heads, cfg.num_kv_heads, cfg.num_layers

    def norm_init(k, *shape):
        # sample directly in the target dtype: at 7B the fp32 temporaries
        # of a cast-after-sample would double peak init memory
        return jax.random.normal(k, shape, dtype) * jnp.asarray(0.02, dtype)

    return {
        "embed": norm_init(keys[0], cfg.vocab_size, d),
        "layers": {
            "wq": norm_init(keys[1], L, d, nh * hd),
            "wk": norm_init(keys[2], L, d, nkv * hd),
            "wv": norm_init(keys[3], L, d, nkv * hd),
            "wo": norm_init(keys[4], L, nh * hd, d),
            "gate": norm_init(keys[5], L, d, i),
            "up": norm_init(keys[6], L, d, i),
            "down": norm_init(keys[7], L, i, d),
            "rms1": jnp.ones((L, d), dtype),
            "rms2": jnp.ones((L, d), dtype),
        },
        "final_norm": jnp.ones((d,), dtype),
        "lm_head": norm_init(keys[0], d, cfg.vocab_size),
    }


def param_partition_specs(cfg: LlamaConfig) -> Dict[str, Any]:
    """PartitionSpecs for the (data, model) mesh — Megatron-style TP."""
    return {
        "embed": P("model", None),
        "layers": {
            "wq": P(None, None, "model"),
            "wk": P(None, None, "model"),
            "wv": P(None, None, "model"),
            "wo": P(None, "model", None),
            "gate": P(None, None, "model"),
            "up": P(None, None, "model"),
            "down": P(None, "model", None),
            "rms1": P(None, None),
            "rms2": P(None, None),
        },
        "final_norm": P(None),
        "lm_head": P(None, "model"),
    }


# ---------------------------------------------------------------------------
# Core math
# ---------------------------------------------------------------------------

def rms_norm(x, weight, eps: float):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def rope_tables(cfg: LlamaConfig, positions):
    """cos/sin tables for given positions [B, S] (HF rotate-half layout)."""
    hd = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (
        jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [B,S,hd/2]
    emb = jnp.concatenate([angles, angles], axis=-1)              # [B,S,hd]
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x, cos, sin):
    """x: [B, S, H, Dh]; cos/sin: [B, S, Dh]."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos[..., None, :]
            + rotated.astype(jnp.float32) * sin[..., None, :]).astype(x.dtype)


def _attention(q, k, v, mask, accum_dtype=jnp.float32,
               k_scale=None, v_scale=None, decode_impl: str = "xla"):
    """q [B,S,H,Dh], k/v [B,T,KV,Dh], mask [B,1,S,T] bool.

    Grouped-query attention without materializing repeated KV heads: query
    head h reads kv head h // (H/KV) (HF repeat_interleave semantics) via a
    reshape, so the KV cache is only ever touched at its true size — on the
    decode path this halves (or better) cache HBM traffic for GQA models.

    KV-cache quantization (`ops/quant.quantize_kv`): when k/v arrive as
    int8 codes with per-(slot, head) scales k_scale/v_scale [B,T,KV],
    the int8->bf16 convert fuses into the QK^T / PV dot's operand read
    (int8 bytes are what crosses HBM; int8 dot_general is never emitted
    — it wedges this environment's remote compiler). The K scale is
    per key slot, so it commutes with the contraction and applies to
    the logits' key axis; the V scale folds into probs before the PV
    dot. Both applications are fp32 and happen before the existing
    bf16 probs cast, so the only added noise is the int8 grid itself."""
    b, s, nh, dh = q.shape
    nkv = k.shape[2]
    scale = dh ** -0.5
    if s == 1 and k.shape[1] > 1:
        if decode_impl == "pallas":
            from ..ops.decode_attention import decode_attention
            return decode_attention(q, k, v, mask, k_scale, v_scale)
        return _decode_attention(q, k, v, mask, accum_dtype,
                                 k_scale, v_scale)
    if k.dtype != q.dtype:
        k = k.astype(q.dtype)
    if v.dtype != q.dtype:
        v = v.astype(q.dtype)
    if nkv == nh:
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=accum_dtype) * scale
        if k_scale is not None:
            logits = logits * jnp.transpose(k_scale, (0, 2, 1)
                                            )[:, :, None, :].astype(
                                                logits.dtype)
        logits = jnp.where(mask, logits, jnp.asarray(-1e30, accum_dtype))
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if v_scale is not None:
            probs = probs * jnp.transpose(v_scale, (0, 2, 1))[:, :, None, :]
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                         preferred_element_type=accum_dtype)
        return out.astype(q.dtype)
    g = nh // nkv
    qg = q.reshape(b, s, nkv, g, dh)
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k,
                        preferred_element_type=accum_dtype) * scale
    if k_scale is not None:
        logits = logits * jnp.transpose(k_scale, (0, 2, 1)
                                        )[:, :, None, None, :].astype(
                                            logits.dtype)
    logits = jnp.where(mask[:, :, None], logits,
                       jnp.asarray(-1e30, accum_dtype))
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if v_scale is not None:
        probs = probs * jnp.transpose(v_scale, (0, 2, 1))[:, :, None,
                                                          None, :]
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs.astype(q.dtype), v,
                     preferred_element_type=accum_dtype)
    return out.reshape(b, s, nh, dh).astype(q.dtype)


def _decode_attention(q, k, v, mask, accum_dtype=jnp.float32,
                      k_scale=None, v_scale=None):
    """Single-token (decode-step) attention as elementwise-multiply +
    reduce, reading the KV cache ONCE in its stored [B,T,KV,Dh] layout.

    The batched-dot form (`einsum "bqhd,bkhd->bhqk"`) puts (b, h) in the
    dot's batch dims, and against the [B,T,H,Dh] cache XLA materializes
    a TRANSPOSED [B,H,T,Dh] copy of both cache halves every step — at
    vicuna-7B b16/T545 that transpose traffic measured 27.6 ms of the
    41.5 ms decode step (benchmarks: step@l512 − step@l48, round 5).
    With q a single token the "dot" is a matvec, so sum-reduce over the
    lane axis is the same math with no transpose: QK^T, masking, softmax
    over T, and PV all stream the cache in layout. int8 cache codes
    convert in-register on the fused read; per-(slot, head) scales
    apply exactly as in the dot form (K scale on the logits' key axis,
    V scale folded into probs). fp32 logits/softmax as before."""
    b, _, nh, dh = q.shape
    nkv = k.shape[2]
    scale = dh ** -0.5
    f32 = jnp.float32
    mask_bt = mask[:, 0, 0, :]                       # [B,T]
    if nkv == nh:
        qv = q[:, 0].astype(accum_dtype)             # [B,H,Dh]
        s_btk = jnp.sum(k.astype(accum_dtype) * qv[:, None], axis=-1)
        s_btk = s_btk * scale                        # [B,T,H]
        if k_scale is not None:
            s_btk = s_btk * k_scale.astype(s_btk.dtype)
        s_btk = jnp.where(mask_bt[:, :, None], s_btk,
                          jnp.asarray(-1e30, s_btk.dtype))
        p = jax.nn.softmax(s_btk.astype(f32), axis=1)
        if v_scale is not None:
            p = p * v_scale
        out = jnp.sum(p[..., None].astype(accum_dtype)
                      * v.astype(accum_dtype), axis=1)   # [B,H,Dh]
        return out[:, None].astype(q.dtype)
    g = nh // nkv
    qg = q[:, 0].reshape(b, nkv, g, dh).astype(accum_dtype)
    s_btkg = jnp.sum(k.astype(accum_dtype)[:, :, :, None, :]
                     * qg[:, None], axis=-1) * scale      # [B,T,KV,g]
    if k_scale is not None:
        s_btkg = s_btkg * k_scale.astype(s_btkg.dtype)[..., None]
    s_btkg = jnp.where(mask_bt[:, :, None, None], s_btkg,
                       jnp.asarray(-1e30, s_btkg.dtype))
    p = jax.nn.softmax(s_btkg.astype(f32), axis=1)
    if v_scale is not None:
        p = p * v_scale[..., None]
    out = jnp.sum(p[..., None].astype(accum_dtype)
                  * v.astype(accum_dtype)[:, :, :, None, :], axis=1)
    return out.reshape(b, 1, nh, dh).astype(q.dtype)


def _layer(cfg: LlamaConfig, h, lp, cos, sin, mask, cache, cache_index,
           prec: Precision, use_flash: bool = False, lora=None,
           lora_scaling: float = 1.0, ring=None, ring_mask=None):
    """One decoder block.

    cache: optional (ck_all, cv_all, ks_all, vs_all, layer_idx) where
    ck/cv are the FULL stacked [L,B,Tmax,KV,Dh] buffers and layer_idx
    selects this block's slice. The new k/v are written in place at
    (layer_idx, :, cache_index) — a [B,S,KV,Dh]-sized write per layer per
    step, NOT a rewrite of the whole buffer (the round-1 scan-over-cache
    design stacked a fresh cache every decode step, doubling HBM
    traffic). ks_all/vs_all are the per-(slot, head) scale buffers
    [L,B,Tmax,KV] of a quantized cache (init_cache(quant="int8")), or
    None for the dense bf16 cache: fresh K/V quantize on write, and
    attention reads int8 codes + scales (see _attention). lora: optional
    per-layer low-rank factor dict (models/lora.py)."""
    from .lora import lora_matmul
    from ..ops.quant import quant_matmul, is_quantized
    b, s, d = h.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    cd = prec.compute_dtype
    lora = lora or {}

    def mm(x_, name):
        w = lp[name]
        if is_quantized(w):
            # weight-only int8/int4 (ops/quant.py): decode reads the
            # quantized bytes from HBM; scales apply after the dot(s).
            # LoRA deltas stay dense on top.
            y = quant_matmul(x_, w)
            a = lora.get(f"{name}_a")
            if a is not None:
                y = y + ((x_ @ a.astype(cd)) @ lora[f"{name}_b"].astype(cd)
                         ) * jnp.asarray(lora_scaling, cd)
            return y
        return lora_matmul(x_, w.astype(cd), lora, name, lora_scaling)

    x = rms_norm(h, lp["rms1"], cfg.rms_eps)
    q = mm(x, "wq").reshape(b, s, nh, hd)
    k = mm(x, "wk").reshape(b, s, nkv, hd)
    v = mm(x, "wv").reshape(b, s, nkv, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    k_sc = v_sc = None
    if cache is not None:
        ck_all, cv_all, ks_all, vs_all, li = cache
        if ks_all is not None:
            # int8 KV cache: quantize the fresh block on write; the
            # attention read below is int8 codes + per-slot scales
            from ..ops.quant import quantize_kv
            kw, ks = quantize_kv(k)
            vw, vs = quantize_kv(v)
            ks_all = lax.dynamic_update_slice(
                ks_all, ks[None].astype(ks_all.dtype),
                (li, 0, cache_index, 0))
            vs_all = lax.dynamic_update_slice(
                vs_all, vs[None].astype(vs_all.dtype),
                (li, 0, cache_index, 0))
            k_sc = lax.dynamic_index_in_dim(ks_all, li, 0, keepdims=False)
            v_sc = lax.dynamic_index_in_dim(vs_all, li, 0, keepdims=False)
        else:
            kw, vw = k, v
        ck_all = lax.dynamic_update_slice(
            ck_all, kw[None].astype(ck_all.dtype),
            (li, 0, cache_index, 0, 0))
        cv_all = lax.dynamic_update_slice(
            cv_all, vw[None].astype(cv_all.dtype),
            (li, 0, cache_index, 0, 0))
        new_cache = ((ck_all, cv_all) if ks_all is None
                     else (ck_all, cv_all, ks_all, vs_all))
        if cfg.decode_attn == "pallas_stacked" and s == 1:
            # flash-decode straight off the STACKED cache: the
            # dynamic_index below hands XLA a [B,T,KV,Dh] slice to
            # materialize for the attention consumer; indexing the
            # layer dim inside the kernel's BlockSpec avoids the copy
            from ..ops.decode_attention import decode_attention_stacked
            attn = decode_attention_stacked(
                q, ck_all, cv_all, li, mask,
                ks_all if ks_all is not None else None,
                vs_all if ks_all is not None else None)
            h = h + mm(attn.reshape(b, s, nh * hd), "wo")
            x = rms_norm(h, lp["rms2"], cfg.rms_eps)
            gated = jax.nn.silu(mm(x, "gate")) * mm(x, "up")
            h = h + mm(gated, "down")
            return h, new_cache
        # attention reads the cache at its stored dtype; the einsum promotes
        # (bf16/int8 cache x bf16/f32 q) without materializing a converted
        # copy
        k_all = lax.dynamic_index_in_dim(ck_all, li, 0, keepdims=False)
        v_all = lax.dynamic_index_in_dim(cv_all, li, 0, keepdims=False)
    else:
        k_all, v_all = k, v
        new_cache = None

    if ring is not None:
        # Context-parallel path (no cache): sequence sharded over the CP
        # mesh axis, K/V rotating over ICI (`ops/ring_attention.py`).
        # Causality + key padding handled inside the ring.
        attn = ring(q, k, v, ring_mask)
    elif use_flash:
        # Pallas flash over the LOCAL k/v (valid for prefill at
        # cache_index 0 / no-cache passes with right padding — the caller
        # guarantees it). Differentiable: custom-VJP backward kernels.
        from ..ops.flash_attention import flash_mha_trainable
        kf, vf = k, v
        if nkv != nh:
            rep = nh // nkv
            kf = jnp.repeat(kf, rep, axis=2)
            vf = jnp.repeat(vf, rep, axis=2)
        attn = flash_mha_trainable(q, kf, vf, causal=True)
    else:
        attn = _attention(q, k_all, v_all, mask, prec.accum_dtype,
                          k_scale=k_sc, v_scale=v_sc,
                          decode_impl=cfg.decode_attn)
    h = h + mm(attn.reshape(b, s, nh * hd), "wo")

    x = rms_norm(h, lp["rms2"], cfg.rms_eps)
    gated = jax.nn.silu(mm(x, "gate")) * mm(x, "up")
    h = h + mm(gated, "down")
    return h, new_cache


def _remat(body, policy: str | None):
    """Per-block gradient checkpointing with a selectable save policy.

    "block" (default): save only block boundaries — the backward re-runs
    every block forward (the reference's --gradient_checkpointing). At
    1.4B stage-2 that recompute is ~25% of step FLOPs (benchmarks/README
    round-4 MFU accounting), so:
    "dots": save non-batched dot outputs (q/k/v/o/gate/up/down matmul
    results), recompute only elementwise ops and the batched attention
    dots — near-zero recompute FLOPs for ~[4h+... ] x tokens x layers of
    extra activation memory (the [B,H,S,S] attention logits are batched
    dots and stay UNsaved).
    """
    if policy in (None, "block", "full"):
        return jax.checkpoint(body)
    if policy == "dots":
        return jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims)
    raise ValueError(f"unknown remat_policy {policy!r}")


def forward(params, cfg: LlamaConfig, embeds, positions, *,
            attn_mask=None, cache=None, cache_index=None,
            precision: Precision = DEFAULT_PRECISION,
            use_flash: bool = False, lora=None,
            lora_scaling: float = 1.0, remat: bool = False,
            remat_policy: str | None = None,
            cp=None):
    """Run the trunk.

    Args:
      embeds: [B, S, D] input embeddings (post token-embedding / splice).
      positions: [B, S] int32 absolute positions (for RoPE).
      attn_mask: [B, T] bool validity of key positions, where T is S
        (no cache) or the cache length. Combined with causality.
      cache: optional dict with "k","v" [L, B, Tmax, KV, Dh] and the new
        entries are written at cache_index. An int8 cache
        (init_cache(quant="int8")) carries "k_scale","v_scale"
        [L, B, Tmax, KV] too; fresh K/V quantize on write and attention
        reads codes + scales (_attention docstring).
      cp: optional `ops.ring_attention.ContextParallel` — run attention
        sequence-parallel over cp.seq_axis (ring K/V rotation; no-cache
        passes only). Like the flash path, causality is over array order
        (right-padded batches); the [S, S] mask never materializes.
    Returns (hidden [B,S,D], new_cache or None).
    """
    b, s, d = embeds.shape
    cd = precision.compute_dtype
    h = embeds.astype(cd)
    cos, sin = rope_tables(cfg, positions)

    ring = ring_mask = None
    if cp is not None and cache is None:
        from ..ops.ring_attention import make_cp_attention
        n_seq = cp.mesh.shape[cp.seq_axis]
        if s % n_seq:
            raise ValueError(f"seq len {s} not divisible by CP axis "
                             f"'{cp.seq_axis}' ({n_seq})")
        ring = make_cp_attention(cp, causal=True)
        ring_mask = (attn_mask.astype(jnp.bool_) if attn_mask is not None
                     else jnp.ones((b, s), jnp.bool_))

    if ring is not None:
        mask = None                      # ring handles causality + padding
    elif cache is None:
        q_pos = positions
        k_pos = positions
        causal = k_pos[:, None, :] <= q_pos[:, :, None]        # [B,S,T]
    else:
        # Causality over cache SLOTS, not RoPE positions: with padded
        # prefills slot index and position diverge. A query written at slot
        # cache_index+i may attend to slots <= its own; per-slot validity
        # (padding, not-yet-written) comes from attn_mask.
        t = cache["k"].shape[2]
        k_slot = jnp.arange(t)[None, :]                         # [1,T]
        q_slot = cache_index + jnp.arange(s)                    # [S]
        causal = k_slot[:, None, :] <= q_slot[None, :, None]    # [1,S,T]
        causal = jnp.broadcast_to(causal, (b, s, t))
    if ring is None:
        mask = causal[:, None, :, :]
        if attn_mask is not None:
            mask = mask & attn_mask[:, None, None, :]

    # Pallas flash attention applies to right-padded prefill-style passes
    # over local k/v (training + inference; custom-VJP backward)
    flash_ok = (ring is None and use_flash and s > 1
                and (cache is None or (isinstance(cache_index, int)
                                       and cache_index == 0)))

    lora_xs = lora if lora is not None else {}
    if cache is None:
        def body(carry, xs):
            h = carry
            lp, ll = xs
            h, _ = _layer(cfg, h, lp, cos, sin, mask, None, None,
                          precision, use_flash=flash_ok, lora=ll,
                          lora_scaling=lora_scaling, ring=ring,
                          ring_mask=ring_mask)
            return h, ()
        if remat:
            # gradient checkpointing per block (reference:
            # --gradient_checkpointing True, pretrain.sh:30);
            # remat_policy="dots" saves matmul outputs (see _remat)
            body = _remat(body, remat_policy)
        h, _ = lax.scan(body, h, (params["layers"], lora_xs))
        new_cache = None
    else:
        # the cache rides the CARRY (in-place slot writes), not the scan
        # ys — stacking ys would write the full [L,B,T,KV,Dh] buffer every
        # decode step
        layer_xs = (params["layers"], lora_xs,
                    jnp.arange(cfg.num_layers, dtype=jnp.int32))
        if "k_scale" in cache:             # int8 KV cache (quantize_kv)
            def body(carry, xs):
                h, ck, cv, ks, vs = carry
                lp, ll, li = xs
                h, (ck, cv, ks, vs) = _layer(
                    cfg, h, lp, cos, sin, mask, (ck, cv, ks, vs, li),
                    cache_index, precision, use_flash=flash_ok,
                    lora=ll, lora_scaling=lora_scaling)
                return (h, ck, cv, ks, vs), ()
            if remat:
                body = _remat(body, remat_policy)
            (h, nk, nv, nks, nvs), _ = lax.scan(
                body, (h, cache["k"], cache["v"],
                       cache["k_scale"], cache["v_scale"]), layer_xs)
            new_cache = {"k": nk, "v": nv, "k_scale": nks, "v_scale": nvs}
        else:
            def body(carry, xs):
                h, ck, cv = carry
                lp, ll, li = xs
                h, (ck, cv) = _layer(
                    cfg, h, lp, cos, sin, mask, (ck, cv, None, None, li),
                    cache_index, precision, use_flash=flash_ok,
                    lora=ll, lora_scaling=lora_scaling)
                return (h, ck, cv), ()
            if remat:
                body = _remat(body, remat_policy)
            (h, nk, nv), _ = lax.scan(
                body, (h, cache["k"], cache["v"]), layer_xs)
            new_cache = {"k": nk, "v": nv}

    h = rms_norm(h, params["final_norm"], cfg.rms_eps)
    return h, new_cache


def logits_fn(params, hidden, precision: Precision = DEFAULT_PRECISION):
    from ..ops.quant import quant_matmul, is_quantized
    w = params["lm_head"]
    if is_quantized(w):
        return quant_matmul(hidden, w).astype(jnp.float32)
    return (hidden @ w.astype(hidden.dtype)).astype(jnp.float32)


def embed_tokens(params, input_ids, precision: Precision = DEFAULT_PRECISION):
    """Token embedding lookup; out-of-range ids (e.g. the -200 image token)
    are clamped — callers overwrite those positions via the splice."""
    ids = jnp.clip(input_ids, 0, params["embed"].shape[0] - 1)
    return params["embed"][ids].astype(precision.compute_dtype)


def init_cache(cfg: LlamaConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16, quant: Optional[str] = None):
    """Decode KV cache. quant="int8" stores codes + per-(slot, head)
    scales (`ops/quant.quantize_kv`): halves cache HBM bytes — both
    resident and the per-step attention read, the term the round-4
    decode roofline identified as the b8 bottleneck. The scale buffers
    are Dh=128x smaller than the codes (f32 [L,B,T,KV])."""
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    if quant is None:
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    if quant != "int8":
        raise ValueError(f"unknown kv cache quant {quant!r}")
    return {"k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(shape[:-1], jnp.float32),
            "v_scale": jnp.zeros(shape[:-1], jnp.float32)}


def causal_lm_loss(logits, labels, ignore_index: int = -100):
    """Next-token cross-entropy with IGNORE_INDEX masking
    (`llava/constants.py:6`, HF shift convention). Labels outside the vocab
    are ignored too (defensive: an out-of-range take_along_axis index is
    undefined behavior, and a tokenizer/decoder vocab mismatch would
    otherwise silently poison the loss)."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = ((shift_labels != ignore_index) & (shift_labels >= 0)
             & (shift_labels < logits.shape[-1]))
    safe = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)
