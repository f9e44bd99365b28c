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


def _kernel(q_ref, k_ref, v_ref, *rest, scale: float, causal: bool,
            kv_len: int, block_q: int, block_k: int, alibi: bool):
    if alibi:
        slope_ref, out_ref, m_scr, l_scr, acc_scr = rest
    else:
        out_ref, m_scr, l_scr, acc_scr = rest
        slope_ref = None
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
    if alibi:
        # ALiBi additive bias computed IN-KERNEL from the per-head slope
        # (the reference Triton kernel loads a materialized bias tensor,
        # flash_attn_triton.py; here the bias costs zero HBM traffic).
        # MPT form: slope * (j - (S-1)) per key j (models/mpt.alibi_bias)
        # — the per-row-constant offset is softmax-invariant but kept for
        # numerics parity with the unfused path.
        s = s + slope_ref[0, 0] * (k_idx - (kv_len - 1)).astype(jnp.float32)
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
def flash_attention_bhsd(q, k, v, alibi_slopes=None, *,
                         causal: bool = False,
                         scale: float | None = None,
                         kv_len: int | None = None, block_q: int = 256,
                         block_k: int = 512, interpret: bool = False):
    """q: [BH, Sq, D]; k, v: [BH, Skv, D] (padded to block multiples).
    kv_len: number of valid kv positions (defaults to Skv).
    alibi_slopes: optional [BH] per-(batch,head) ALiBi slopes — the bias
    is generated in-kernel (no [Sq,Skv] bias tensor ever exists)."""
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

    alibi = alibi_slopes is not None
    kernel = functools.partial(_kernel, scale=scale, causal=causal,
                               kv_len=kv_len, block_q=block_q,
                               block_k=block_k, alibi=alibi)
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = (q, k, v)
    if alibi:
        slopes8 = jnp.broadcast_to(
            jnp.asarray(alibi_slopes, jnp.float32)[:, None], (bh, 8))
        in_specs.append(pl.BlockSpec((1, 8), lambda b, i, j: (b, 0),
                                     memory_space=pltpu.VMEM))
        args = (q, k, v, slopes8)
    return pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=in_specs,
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
    )(*args)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def flash_mha(q, k, v, *, causal: bool = False, scale: float | None = None,
              alibi_slopes=None, block_q: int = 256, block_k: int = 512,
              interpret: bool | None = None):
    """Drop-in for ops.attention.mha: q [B, Sq, H, D], k/v [B, Skv, H, D].
    Pads sequences to block multiples internally. interpret=None runs the
    compiled kernel on TPU and the interpreter elsewhere (CPU tests).
    alibi_slopes: optional [H] ALiBi slopes (MPT), tiled over batch."""
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
    slopes_bh = None
    if alibi_slopes is not None:
        slopes_bh = jnp.tile(jnp.asarray(alibi_slopes, jnp.float32), b)
    out = flash_attention_bhsd(qf, kf, vf, slopes_bh, causal=causal,
                               scale=scale, kv_len=skv, block_q=bq,
                               block_k=bk, interpret=interpret)
    out = out[:, :sq].reshape(b, h, sq, d)
    return jnp.transpose(out, (0, 2, 1, 3))


# ---------------------------------------------------------------------------
# Differentiable flash attention (custom VJP).
#
# Forward additionally stores the log-sum-exp per query row; backward runs
# two Pallas kernels (dq over q-blocks, dk/dv over k-blocks) with the
# standard recomputation: p = exp(qk*scale - lse), ds = p*(dout v^T - delta),
# delta = rowsum(dout * out). Replaces the reference flash-attn CUDA
# backward; makes the flash path usable in training.
# ---------------------------------------------------------------------------


def _fwd_lse_kernel(q_ref, k_ref, v_ref, *rest, scale, causal, kv_len,
                    block_q, block_k, alibi):
    if alibi:
        slope_ref, out_ref, lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        out_ref, lse_ref, m_scr, l_scr, acc_scr = rest
        slope_ref = None
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    qb = pl.program_id(1)
    k_idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    if alibi:
        s = s + slope_ref[0, 0] * (k_idx - (kv_len - 1)).astype(jnp.float32)
    mask = k_idx < kv_len
    if causal:
        q_idx = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape,
                                                        0)
        mask = mask & (k_idx <= q_idx)
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new

    @pl.when(kb == nk - 1)
    def _finish():
        l = l_scr[:]
        out_ref[0] = (acc_scr[:] / jnp.maximum(l, 1e-30)
                      ).astype(out_ref.dtype)
        lse = jnp.where(l > 0, m_scr[:] + jnp.log(jnp.maximum(l, 1e-30)),
                        0.0)
        lse_ref[0] = jnp.broadcast_to(lse, (block_q, lse_ref.shape[-1]))


def _recompute_p(q, k, scale, lse, qb, kb, block_q, block_k, causal,
                 kv_len, slope=None):
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    k_idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    if slope is not None:
        s = s + slope * (k_idx - (kv_len - 1)).astype(jnp.float32)
    mask = k_idx < kv_len
    if causal:
        q_idx = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape,
                                                        0)
        mask = mask & (k_idx <= q_idx)
    p = jnp.where(mask, jnp.exp(s - lse), 0.0)
    return p


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *rest,
                   scale, causal, kv_len, block_q, block_k, alibi):
    if alibi:
        slope_ref, dq_ref, dq_scr = rest
        slope = slope_ref[0, 0]
    else:
        dq_ref, dq_scr = rest
        slope = None
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, 0:1]
    delta = delta_ref[0][:, 0:1]
    p = _recompute_p(q, k, scale, lse, pl.program_id(1), kb, block_q,
                     block_k, causal, kv_len, slope)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dq_scr[:] += jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32
                                     ) * scale

    @pl.when(kb == nk - 1)
    def _finish():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    *rest, scale, causal, kv_len, block_q, block_k,
                    alibi):
    if alibi:
        slope_ref, dk_ref, dv_ref, dk_scr, dv_scr = rest
        slope = slope_ref[0, 0]
    else:
        dk_ref, dv_ref, dk_scr, dv_scr = rest
        slope = None
    qb = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qb == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, 0:1]
    delta = delta_ref[0][:, 0:1]
    p = _recompute_p(q, k, scale, lse, qb, pl.program_id(1), block_q,
                     block_k, causal, kv_len, slope)
    dv_scr[:] += jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dk_scr[:] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32
                                     ) * scale

    @pl.when(qb == nq - 1)
    def _finish():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_fwd_lse(q, k, v, slopes8, *, scale, causal, kv_len, block_q,
                   block_k, interpret):
    bh, sq, d = q.shape
    _, skv, _ = k.shape
    nq = pl.cdiv(sq, block_q)
    nk = pl.cdiv(skv, block_k)
    alibi = slopes8 is not None
    kernel = functools.partial(_fwd_lse_kernel, scale=scale, causal=causal,
                               kv_len=kv_len, block_q=block_q,
                               block_k=block_k, alibi=alibi)
    in_specs = [
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
    ]
    args = (q, k, v)
    if alibi:
        in_specs.append(pl.BlockSpec((1, 8), lambda b, i, j: (b, 0),
                                     memory_space=pltpu.VMEM))
        args = (q, k, v, slopes8)
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 8), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq, 8), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)
    return out, lse


def flash_attention_trainable(q, k, v, *, causal: bool = False,
                              scale: float | None = None,
                              alibi_slopes=None,
                              kv_len: int | None = None,
                              block_q: int = 256, block_k: int = 512,
                              interpret: bool | None = None):
    """Differentiable flash attention on [BH, S, D] (padded to blocks).
    alibi_slopes: optional [BH] in-kernel ALiBi bias (no slope grads —
    MPT's slopes are deterministic constants, mpt/attention.py)."""
    bh, sq, d = q.shape
    _, skv, _ = k.shape
    if scale is None:
        scale = d ** -0.5
    if kv_len is None:
        kv_len = skv
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    alibi = alibi_slopes is not None
    if alibi:
        slopes8 = jnp.broadcast_to(
            jnp.asarray(alibi_slopes, jnp.float32)[:, None], (bh, 8))
    else:
        # dummy operand: custom_vjp args must be arrays, and the slopes
        # must be a FORMAL argument (closing over a traced value leaks
        # tracers when this runs inside a lax.scan body)
        slopes8 = jnp.zeros((bh, 8), jnp.float32)
    slope_spec = pl.BlockSpec((1, 8), lambda b, i, j: (b, 0),
                              memory_space=pltpu.VMEM)

    @jax.custom_vjp
    def _attn(q, k, v, s8):
        out, _ = _flash_fwd_lse(q, k, v, s8 if alibi else None,
                                scale=scale, causal=causal, kv_len=kv_len,
                                block_q=block_q, block_k=block_k,
                                interpret=interpret)
        return out

    def _fwd(q, k, v, s8):
        out, lse = _flash_fwd_lse(q, k, v, s8 if alibi else None,
                                  scale=scale, causal=causal,
                                  kv_len=kv_len, block_q=block_q,
                                  block_k=block_k, interpret=interpret)
        return out, (q, k, v, out, lse, s8)

    def _bwd(res, do):
        q, k, v, out, lse, slopes8 = res
        delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                        axis=-1, keepdims=True)                  # [BH,S,1]
        delta8 = jnp.broadcast_to(delta, (*delta.shape[:2], 8))
        nq = pl.cdiv(sq, block_q)
        nk = pl.cdiv(skv, block_k)
        common_in = [
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),                 # q
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),                 # k
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),                 # v
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),                 # do
            pl.BlockSpec((1, block_q, 8), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),                 # lse
            pl.BlockSpec((1, block_q, 8), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),                 # delta
        ]
        dq_args = (q, k, v, do, lse, delta8)
        dq_in = list(common_in)
        if alibi:
            dq_in.append(slope_spec)
            dq_args = dq_args + (slopes8,)
        dq = pl.pallas_call(
            functools.partial(_bwd_dq_kernel, scale=scale, causal=causal,
                              kv_len=kv_len, block_q=block_q,
                              block_k=block_k, alibi=alibi),
            grid=(bh, nq, nk),
            in_specs=dq_in,
            out_specs=pl.BlockSpec((1, block_q, d),
                                   lambda b, i, j: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(*dq_args)

        # dk/dv: swap inner grid to loop q blocks per k block
        dkv_in = [
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),                 # q
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),                 # k
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),                 # v
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),                 # do
            pl.BlockSpec((1, block_q, 8), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),                 # lse
            pl.BlockSpec((1, block_q, 8), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),                 # delta
        ]
        dkv_args = (q, k, v, do, lse, delta8)
        if alibi:
            dkv_in.append(slope_spec)
            dkv_args = dkv_args + (slopes8,)
        dk, dv = pl.pallas_call(
            functools.partial(_bwd_dkv_kernel, scale=scale, causal=causal,
                              kv_len=kv_len, block_q=block_q,
                              block_k=block_k, alibi=alibi),
            grid=(bh, nk, nq),
            in_specs=dkv_in,
            out_specs=(
                pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((bh, skv, d), k.dtype),
                jax.ShapeDtypeStruct((bh, skv, d), v.dtype),
            ),
            scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                            pltpu.VMEM((block_k, d), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(*dkv_args)
        # ALiBi slopes are deterministic constants (mpt/attention.py) —
        # no slope gradient
        return dq, dk, dv, jnp.zeros_like(slopes8)

    _attn.defvjp(_fwd, _bwd)
    return _attn(q, k, v, slopes8)


def flash_mha_trainable(q, k, v, *, causal: bool = False,
                        scale: float | None = None, alibi_slopes=None,
                        block_q: int = 256, block_k: int = 512,
                        interpret: bool | None = None):
    """Differentiable drop-in for mha: q [B, Sq, H, D], k/v [B, Skv, H, D].
    alibi_slopes: optional [H] ALiBi slopes (MPT), tiled over batch."""
    b, sq, h, d = q.shape
    _, skv, _, _ = k.shape

    def pick(pref, s):
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

    slopes_bh = None
    if alibi_slopes is not None:
        slopes_bh = jnp.tile(jnp.asarray(alibi_slopes, jnp.float32), b)
    out = flash_attention_trainable(
        fold(q, sq, sq_p), fold(k, skv, skv_p), fold(v, skv, skv_p),
        causal=causal, scale=scale, alibi_slopes=slopes_bh, kv_len=skv,
        block_q=bq, block_k=bk, interpret=interpret)
    out = out[:, :sq].reshape(b, h, sq, d)
    return jnp.transpose(out, (0, 2, 1, 3))
