"""Prompt-lookup speculative decoding (lossless, draft-model-free).

Greedy decode is param-read bound: every generated token re-reads the
full decoder weights (~2.8 GB/step at 1.4B; benchmarks llava_1p4b pure
decode runs at 74% of that roofline). Speculation beats the roofline by
verifying several tokens per weight pass: draft G candidate tokens, run
ONE cached forward over [current, d_0..d_{G-1}], and accept the longest
prefix where the model's own argmax agrees — the output matches greedy
decoding by construction (bit-exact parity is tested in fp32; under
bf16 the (G+1)-query forward may reduce in a different order than the
1-query step, so an exactly-tied argmax can resolve differently — the
same caveat as any batched-vs-single forward). Copy-heavy stretches
advance up to G+1 tokens per parameter read.

The draft here is prompt lookup (n-gram matching, as popularized by
transformers' prompt_lookup_num_tokens): find the most recent earlier
occurrence of the last bigram in the token history and propose the
tokens that followed it. No second model, no extra weights — ideal for
the eval workloads this framework serves (OCR/doc VQA answers quote the
context heavily).

TPU-native formulation: everything static-shape under one jit —
`lax.while_loop` over verification rounds, bigram search as a masked
argmax over the token buffer, lockstep batch (acceptance = min over
rows, which only under-accepts and never breaks losslessness), and the
KV cache written speculatively then overwritten where rejected (the
slot-causal mask in `llama.forward` keeps not-yet-valid slots invisible).

The reference has no speculation anywhere (its eval decodes one token
per step through HF generate) — this is beyond-parity serving headroom.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..core.precision import DEFAULT_PRECISION, Precision
from . import llama as L


def bigram_draft(toks, cur_len, g):
    """Most recent earlier occurrence of the trailing bigram in the token
    history; the G tokens that followed it become the draft. Shared by
    the decoder-only and full-LLaVA speculative paths."""
    b, t_max = toks.shape
    last2 = lax.dynamic_slice(toks, (0, cur_len - 2), (b, 2))
    j = jnp.arange(t_max - 1)
    hit = (toks[:, :-1] == last2[:, :1]) & (toks[:, 1:] == last2[:, 1:2])
    hit = hit & (j[None] < cur_len - 2)
    found = jnp.any(hit, axis=1)
    j_best = jnp.argmax(jnp.where(hit, j[None], -1), axis=1)       # [B]
    src = jnp.minimum(j_best[:, None] + 2 + jnp.arange(g)[None],
                      cur_len - 1)
    draft = jnp.take_along_axis(toks, src, axis=1)                 # [B, G]
    # no match: draft repeats the current token (always verified, never
    # wrong — just a cold round)
    cur = lax.dynamic_slice(toks, (0, cur_len - 1), (b, 1))
    return jnp.where(found[:, None], draft,
                     jnp.broadcast_to(cur, (b, g)))


def pad_after_eos(out, eos_id):
    """Greedy emits eos forever after the first eos — replicate."""
    b = out.shape[0]
    seen = jnp.cumsum((out == eos_id).astype(jnp.int32), axis=1) > 0
    prev = jnp.concatenate([jnp.zeros((b, 1), bool), seen[:, :-1]], axis=1)
    return jnp.where(prev, eos_id, out)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "max_new_tokens", "draft_len", "eos_id", "precision",
    "use_flash", "kv_quant"))
def decode_prompt_lookup(params, cfg: L.LlamaConfig, input_ids,
                         *, max_new_tokens: int, draft_len: int = 8,
                         eos_id: int = 2,
                         precision: Precision = DEFAULT_PRECISION,
                         use_flash: bool = False,
                         kv_quant: str | None = None):
    """Greedy-equivalent decode with prompt-lookup speculation.

    Args:
      input_ids: [B, L] prompt (no padding; rows share the length).
    Returns:
      (tokens [B, max_new_tokens] — identical to step-by-step greedy,
       eos-padded after the first eos — and the number of verification
       rounds actually run, for diagnostics/benchmarks).
    """
    b, l = input_ids.shape
    g = draft_len
    t_max = l + max_new_tokens + g + 2
    cd = precision.compute_dtype

    toks = jnp.zeros((b, t_max), jnp.int32)
    toks = lax.dynamic_update_slice(toks, input_ids, (0, 0))

    cache = L.init_cache(cfg, b, t_max, cd, quant=kv_quant)
    emb = L.embed_tokens(params, input_ids, precision)
    pos = jnp.broadcast_to(jnp.arange(l)[None], (b, l))
    h, cache = L.forward(params, cfg, emb, pos,
                         attn_mask=jnp.arange(t_max)[None] < l,
                         cache=cache, cache_index=0, precision=precision,
                         use_flash=use_flash)
    logits = L.logits_fn(params, h[:, -1:], precision)
    first = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    toks = lax.dynamic_update_slice(toks, first[:, None], (0, l))

    def cond(carry):
        _, _, cur_len, rounds = carry
        return cur_len < l + max_new_tokens

    def body(carry):
        toks, cache, cur_len, rounds = carry
        cur = lax.dynamic_slice(toks, (0, cur_len - 1), (b, 1))
        draft = bigram_draft(toks, cur_len, g)
        inp = jnp.concatenate([cur, draft], axis=1)                # [B,G+1]
        emb = L.embed_tokens(params, inp, precision)
        pos = cur_len - 1 + jnp.arange(g + 1)[None]
        pos = jnp.broadcast_to(pos, (b, g + 1))
        slot_ok = jnp.arange(t_max)[None] < cur_len + g
        h, cache = L.forward(params, cfg, emb, pos, attn_mask=slot_ok,
                             cache=cache, cache_index=cur_len - 1,
                             precision=precision)
        y = jnp.argmax(L.logits_fn(params, h, precision),
                       axis=-1).astype(jnp.int32)                  # [B,G+1]
        # accept the longest prefix where draft agrees with the model
        agree = jnp.cumprod((draft == y[:, :g]).astype(jnp.int32),
                            axis=1)
        a = jnp.min(jnp.sum(agree, axis=1))        # lockstep acceptance
        a = jnp.minimum(a, l + max_new_tokens - cur_len - 1)
        a = jnp.maximum(a, 0)
        # emitted tokens this round = y[:, :a+1] (y == draft where
        # accepted); write the full window, only cur_len+a+1 is "known"
        toks = lax.dynamic_update_slice(toks, y, (0, cur_len))
        return toks, cache, cur_len + a + 1, rounds + 1

    toks, _, cur_len, rounds = lax.while_loop(
        cond, body, (toks, cache, l + 1, jnp.int32(0)))

    out = lax.dynamic_slice(toks, (0, l), (b, max_new_tokens))
    return pad_after_eos(out, eos_id), rounds
