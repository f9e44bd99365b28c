"""Pallas flash attention for TPU.

Replaces the reference's CUDA flash-attn monkey patch
(`llava/train/llama_flash_attn_monkey_patch.py`) and the MPT Triton kernel
(`llava/model/language_model/mpt/flash_attn_triton.py`) with a TPU-native
kernel: online-softmax over K/V blocks, so the [Sq, Skv] logits matrix never
touches HBM. fp32 running max / denominator / accumulator in VMEM scratch,
bf16 MXU matmuls.

Layout: [B*H, S, D] (callers fold batch and heads). Sequence lengths are
padded to block multiples; `kv_len` masks the tail. Causal masking skips
fully-masked K blocks' contribution via the mask (block skipping is left to
the grid since Mosaic lacks early-exit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, out_ref, m_scr, l_scr, acc_scr, *,
            scale: float, causal: bool, kv_len: int, block_q: int,
            block_k: int):
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                   # [bq, D]
    k = k_ref[0]                                   # [bk, D]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale                                  # [bq, bk]

    qb = pl.program_id(1)
    k_idx = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, 1)
    mask = k_idx < kv_len
    if causal:
        q_idx = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 0)
        mask = mask & (k_idx <= q_idx)
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_scr[:]                              # [bq, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    # masked entries must contribute 0 even when the whole row is masked
    # (s == m_new == NEG_INF would give exp(0) = 1)
    p = jnp.where(mask, jnp.exp(s - m_new), 0.0)   # [bq, bk]
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new

    @pl.when(kb == nk - 1)
    def _finish():
        out_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)
                      ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "scale", "block_q",
                                             "block_k", "kv_len",
                                             "interpret"))
def flash_attention_bhsd(q, k, v, *, causal: bool = False,
                         scale: float | None = None,
                         kv_len: int | None = None, block_q: int = 256,
                         block_k: int = 512, interpret: bool = False):
    """q: [BH, Sq, D]; k, v: [BH, Skv, D] (padded to block multiples).
    kv_len: number of valid kv positions (defaults to Skv)."""
    bh, sq, d = q.shape
    _, skv, _ = k.shape
    if scale is None:
        scale = d ** -0.5
    if kv_len is None:
        kv_len = skv
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    nq = pl.cdiv(sq, block_q)
    nk = pl.cdiv(skv, block_k)

    kernel = functools.partial(_kernel, scale=scale, causal=causal,
                               kv_len=kv_len, block_q=block_q,
                               block_k=block_k)
    return pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * skv * d,
            bytes_accessed=q.size * q.dtype.itemsize * 4,
            transcendentals=bh * sq * skv),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def flash_mha(q, k, v, *, causal: bool = False, scale: float | None = None,
              block_q: int = 256, block_k: int = 512,
              interpret: bool | None = None):
    """Drop-in for ops.attention.mha: q [B, Sq, H, D], k/v [B, Skv, H, D].
    Pads sequences to block multiples internally. interpret=None runs the
    compiled kernel on TPU and the interpreter elsewhere (CPU tests)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, sq, h, d = q.shape
    _, skv, _, _ = k.shape

    def pick(pref: int, s: int):
        """Whole (128-rounded) sequence when it fits comfortably in VMEM —
        short ViT sequences want one block, not a fine grid — otherwise the
        largest block <= pref dividing the rounded length."""
        s_p = _round_up(s, 128)
        if s_p <= 1024:
            return s_p, s_p
        for cand in (pref, 512, 256, 128):
            if cand <= s_p and s_p % cand == 0:
                return cand, s_p
        return s_p, s_p

    bq, sq_p = pick(block_q, sq)
    bk, skv_p = pick(block_k, skv)

    def fold(x, s, s_p):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)
        if s_p != s:
            x = jnp.pad(x, ((0, 0), (0, s_p - s), (0, 0)))
        return x

    qf, kf, vf = fold(q, sq, sq_p), fold(k, skv, skv_p), fold(v, skv, skv_p)
    out = flash_attention_bhsd(qf, kf, vf, causal=causal, scale=scale,
                               kv_len=skv, block_q=bq, block_k=bk,
                               interpret=interpret)
    out = out[:, :sq].reshape(b, h, sq, d)
    return jnp.transpose(out, (0, 2, 1, 3))
