"""Fused short-sequence (encoder) attention for TPU.

The ViT towers' attention is the single biggest cost in feature extraction:
at CLIP-L/14-336 shapes (B=64, H=16, S=577, D=64) XLA materializes the
[B,H,S,S] fp32 logits in HBM three times per layer (write, softmax read,
PV read) — measured 60% of tower runtime on v5e. The generic flash kernel
(ops/flash_attention.py) doesn't help here either: its (B*H, 1, 1) grid
runs 1024 micro-programs per layer whose ~1 us of work each drowns in
program dispatch, and its fold/unfold transposes add four HBM passes.

This kernel exploits that encoder sequences are SHORT: S<=1024 rows of
logits for a block of heads fit entirely in VMEM, so softmax is one shot
(no online rescaling) and the logits never touch HBM. Layout choices:

- grid (B, H/HB): each program computes HB whole heads of one image;
  batched dot_generals amortize dispatch (HB*2*S^2*D FLOPs per program).
- inputs stay [B, S, H, D] (no host-side fold); the output leaves in
  [B, H, S, D] and the single cheap transpose back is left to XLA.
- logits/softmax in fp32; the P.V matmul feeds bf16 P (matches the XLA
  path's numerics within the golden tolerance); normalization by the
  softmax denominator happens AFTER P.V on [HB,S,D] (D << S rescales).

Replaces the reference's xformers/SDPA encoder attention
(`clip_encoder.py` towers run under torch SDPA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, out_ref, *, kv_len: int,
            softmax_dtype):
    """One (image, head-block, q-block) tile; q is PRE-SCALED.

    Padding trick: padded K rows are zero, so padded logits are exactly 0
    and padded V rows contribute nothing to P.V — instead of building an
    iota mask over the [HB,BQ,S] logits (3 extra VPU passes), subtract the
    padded columns' exact softmax mass `n_pad * exp(-m)` from the
    denominator. m = max(s) >= 0 stays valid for numerical stability."""
    q = q_ref[0]                                   # [HB, BQ, D]
    k = k_ref[0]                                   # [HB, S,  D]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # [HB, BQ, Sk]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp((s - m).astype(softmax_dtype))
    # the denominator accumulates in fp32 regardless of softmax dtype: the
    # pad-mass subtraction below cancels against l, and a bf16 sum's ulp
    # (~0.25 at 63) would swamp rows whose true mass is small
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    n_pad = s.shape[-1] - kv_len
    if n_pad:
        l = jnp.maximum(l - n_pad * jnp.exp(-m), 1e-20)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # [HB, BQ, D]
    out_ref[0] = (o / l).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("head_block", "block_q",
                                             "interpret", "kv_len",
                                             "softmax_dtype"))
def _call(q, k, v, *, head_block: int, block_q: int,
          interpret: bool, kv_len: int, softmax_dtype):
    b, h, s_p, d = q.shape
    kernel = functools.partial(_kernel, kv_len=kv_len,
                               softmax_dtype=softmax_dtype)
    return pl.pallas_call(
        kernel,
        grid=(b, h // head_block, s_p // block_q),
        in_specs=[
            pl.BlockSpec((1, head_block, block_q, d),
                         lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, head_block, s_p, d),
                         lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, head_block, s_p, d),
                         lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, head_block, block_q, d),
                               lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, s_p, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_p * s_p * d,
            bytes_accessed=(3 * q.size + q.size) * q.dtype.itemsize,
            transcendentals=b * h * s_p * s_p),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=interpret,
    )(q, k, v)


def _kernel_v2(q_ref, k_ref, v_ref, out_ref, *, kv_len: int,
               softmax_dtype, pretransposed: bool, head_block: int):
    """One program = `head_block` (image·head) pairs, whole-sequence
    softmax, SEQUENTIAL 2D dots (an unrolled python loop over the leading
    block dim — never a batched dot_general).

    Round-3 rework of `_kernel`: the v1 batched [HB,·,·] dot_generals run
    at ~13-19 TFLOP/s under Mosaic (measured, benchmarks/README.md); plain
    2D dots per head are the untried formulation, and head_block > 1
    amortizes per-program overhead without reintroducing batched-dot
    semantics. Same padding trick as v1: zero K columns give exactly-0
    logits, so the padded columns' softmax mass n_pad*exp(-m) is
    subtracted from the denominator instead of masking the [S,S] logits."""
    def one_head(i, _):
        q = q_ref[i]                               # [S_p, D]
        if pretransposed:
            k = k_ref[i]                           # [D, S_p]
            s = jax.lax.dot_general(
                q, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # [S_p, S_p]
        else:
            k = k_ref[i]                           # [S_p, D]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        v = v_ref[i]                               # [S_p, D]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp((s - m).astype(softmax_dtype))
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        n_pad = s.shape[-1] - kv_len
        if n_pad:
            l = jnp.maximum(l - n_pad * jnp.exp(-m), 1e-20)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [S_p, D]
        out_ref[i] = (o / l).astype(out_ref.dtype)
        return 0

    if head_block == 1:
        one_head(0, 0)
    else:
        # fori_loop (not an unrolled python loop): sequential iterations
        # REUSE one [S_p,S_p] logits buffer — unrolled, Mosaic keeps every
        # iteration's logits live and blows the 16 MB VMEM budget at hb>=4
        jax.lax.fori_loop(0, head_block, one_head, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "kv_len",
                                             "softmax_dtype",
                                             "pretransposed", "head_block"))
def _call_v2(q, k, v, *, interpret: bool, kv_len: int, softmax_dtype,
             pretransposed: bool, head_block: int):
    bh, s_p, d_qk = q.shape                  # d_qk may be zero-padded
    d_v = v.shape[-1]
    hb = head_block
    kernel = functools.partial(_kernel_v2, kv_len=kv_len,
                               softmax_dtype=softmax_dtype,
                               pretransposed=pretransposed,
                               head_block=hb)
    k_spec = (pl.BlockSpec((hb, d_qk, s_p), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM) if pretransposed else
              pl.BlockSpec((hb, s_p, d_qk), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(bh // hb,),
        in_specs=[
            pl.BlockSpec((hb, s_p, d_qk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            k_spec,
            pl.BlockSpec((hb, s_p, d_v), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hb, s_p, d_v), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s_p, d_v), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * s_p * s_p * (d_qk + d_v),
            bytes_accessed=2 * bh * s_p * (d_qk + d_v) * q.dtype.itemsize,
            transcendentals=bh * s_p * s_p),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(q, k, v)


def encoder_mha_v2(q, k, v, *, scale: float | None = None,
                   softmax_dtype=None, pretransposed: bool = True,
                   pad_d: int | None = None, head_block: int = 1,
                   interpret: bool | None = None):
    """Per-head 2D-dot fused encoder attention.

    q, k, v: [B, S, H, D]; returns [B, S, H, D] in q.dtype. Options:
    - pretransposed: feed K as [D, S] (one XLA transpose pass outside the
      kernel) so the QK dot contracts lhs-minor x rhs-major — the MXU's
      native orientation — instead of an NT dot.
    - pad_d: zero-pad the contraction dim D up to `pad_d` (e.g. 128) so
      Q/K occupy full 128-lane tiles; zeros don't change QK^T.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, s, h, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if softmax_dtype is None:
        softmax_dtype = q.dtype
    s_p = _round_up(s, 128)

    q = q * jnp.asarray(scale, q.dtype)

    def prep(x, d_pad):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)
        pads = [(0, 0), (0, s_p - s), (0, d_pad - d)]
        if s_p != s or d_pad != d:
            x = jnp.pad(x, pads)
        return x

    d_eff = pad_d if pad_d else d
    q2 = prep(q, d_eff)
    k2 = prep(k, d_eff)
    if pretransposed:
        k2 = jnp.transpose(k2, (0, 2, 1))                  # [BH, D, S_p]
    v2 = prep(v, d)
    out = _call_v2(q2, k2, v2, interpret=interpret, kv_len=s,
                   softmax_dtype=jnp.dtype(softmax_dtype),
                   pretransposed=pretransposed, head_block=head_block)
    out = out.reshape(b, h, s_p, d)[:, :, :s]
    return jnp.transpose(out, (0, 2, 1, 3))


def encoder_mha(q, k, v, *, scale: float | None = None,
                head_block: int | None = None,
                block_q: int | None = None,
                softmax_dtype=None,
                interpret: bool | None = None):
    """Fused non-causal attention for short sequences.

    q, k, v: [B, S, H, D] (any S <= ~1024; padded to 128 internally).
    Returns [B, S, H, D] in q.dtype. Blocks: `head_block` heads x
    `block_q` query rows per program (heads ride the leading block dim in
    the head-major layout, so any divisor of H is legal; defaults keep the
    fp32 logits block around 2-4 MB of VMEM). softmax_dtype defaults to
    the INPUT dtype:
    bf16 towers get bf16 softmax (the reference runs these frozen encoders
    in fp16, `siglip_encoder.py:62-64`); fp32 inputs keep exact fp32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, s, h, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if softmax_dtype is None:
        softmax_dtype = q.dtype
    s_p = _round_up(s, 128)
    if head_block is None:
        head_block = next(c for c in (8, 6, 4, 3, 2, 1) if h % c == 0)
    if block_q is None:
        budget = 4 * 1024 * 1024
        block_q = s_p
        while head_block * block_q * s_p * 4 > budget and block_q > 128:
            block_q //= 2
    block_q = min(block_q, s_p)
    while s_p % block_q:
        block_q //= 2
    # head-major layout for the kernel (leading batch dims for Mosaic's
    # batched matmul); the scale folds into q here (one [B,S,H,D] pass
    # instead of one over the [B,H,S,S] logits)
    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3))
        if s_p != s:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, s_p - s), (0, 0)))
        return x
    q = q * jnp.asarray(scale, q.dtype)
    out = _call(prep(q), prep(k), prep(v),
                head_block=head_block, block_q=block_q,
                interpret=interpret, kv_len=s,
                softmax_dtype=jnp.dtype(softmax_dtype))
    return jnp.transpose(out, (0, 2, 1, 3))[:, :s]
