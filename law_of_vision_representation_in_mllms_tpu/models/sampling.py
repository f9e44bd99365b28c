"""Temperature / nucleus (top-p) token sampling for the decode paths.

The reference decodes with HF `generate(do_sample=temperature > 0,
temperature=..., top_p=...)` throughout its eval adapter
(`llava/eval/lmms-eval/lmms_eval/models/llava.py:391-417`) and one-shot
inference (`llava/eval/run_llava.py:81-83`); the OpenAI serving dialect
exposes the same two knobs. This module is the TPU-native equivalent:
one jit-friendly primitive (static shapes, no data-dependent control
flow) used by `llava.generate_sample`, the eval adapter, the serve
endpoint, and the inflight engine's per-slot decode step.

Semantics match HF's warper chain (`TemperatureLogitsWarper` then
`TopPLogitsWarper`, min_tokens_to_keep=1): logits are divided by the
temperature, the vocabulary is sorted by probability, and a token is
kept iff the cumulative probability BEFORE it is <= top_p (so the
smallest set whose mass reaches top_p survives and the top token always
does). Sampling over the surviving set uses the Gumbel-max trick — an
argmax over perturbed logits, which the MXU-free VPU handles in one
fused pass without materializing a categorical draw.

`temperature <= 0` is the greedy contract (same as the reference's
`do_sample=False` routing): callers either branch to their argmax path
or rely on `sample_token`'s own `jnp.where(temperature > 0, ...)`
fallback, which keeps ONE compiled program serving mixed greedy/sampled
rows (the inflight engine's case — per-slot temperatures in one step
dispatch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def top_p_mask(sorted_probs: jnp.ndarray, top_p) -> jnp.ndarray:
    """Keep-mask over DESCENDING-sorted probabilities: token i survives
    iff the cumulative mass strictly before it is <= top_p (HF
    `TopPLogitsWarper` with its one-position shift; the top token is
    always kept since its exclusive prefix mass is 0)."""
    exclusive_cum = jnp.cumsum(sorted_probs, axis=-1) - sorted_probs
    return exclusive_cum <= top_p


def sample_token(logits: jnp.ndarray, rng: jax.Array, temperature,
                 top_p=1.0) -> jnp.ndarray:
    """Sample next-token ids from `[..., V]` logits.

    temperature/top_p may be python floats or traced scalars (one
    compiled program covers every setting); `temperature <= 0` returns
    the plain argmax row-for-row, so greedy callers can route through
    this unconditionally.
    """
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    t = jnp.asarray(temperature, jnp.float32)
    scaled = logits.astype(jnp.float32) / jnp.maximum(t, 1e-6)
    order = jnp.argsort(-scaled, axis=-1)
    sorted_logits = jnp.take_along_axis(scaled, order, axis=-1)
    keep = top_p_mask(jax.nn.softmax(sorted_logits, axis=-1), top_p)
    sorted_logits = jnp.where(keep, sorted_logits, -jnp.inf)
    gumbel = jax.random.gumbel(rng, sorted_logits.shape, jnp.float32)
    pick = jnp.argmax(sorted_logits + gumbel, axis=-1)
    sampled = jnp.take_along_axis(
        order, pick[..., None], axis=-1)[..., 0].astype(jnp.int32)
    return jnp.where(t > 0, sampled, greedy)
