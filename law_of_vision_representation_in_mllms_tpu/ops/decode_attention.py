"""Pallas flash-decode attention: single-token attention over the KV
cache, streamed in the cache's stored [B, T, KV, Dh] layout.

Why this kernel exists: the round-5 decode decomposition
(benchmarks/README.md "the decode window term, isolated by measurement")
showed XLA's batched-dot decode attention materializes a [B,H,T,Dh]
transposed copy of both cache halves every step — 27.6 ms of a 41.5 ms
vicuna-7B b16 step against a 7.4 ms byte floor. `models/llama.
_decode_attention` removes the transpose at the XLA level with an
elementwise-multiply + reduce formulation; this kernel is the opt-in
(`LlamaConfig.decode_attn="pallas"`) step past it: one pass over K/V
tiles with classic online softmax (flash-decode), no intermediate
[B,T,H] logits array in HBM at all, and in-register int8 dequant for
quantized caches (`ops/quant.quantize_kv` per-(slot, head) scales).

Semantics match `models/llama._attention` for q_len == 1 exactly
(fp32 logits/softmax accumulation; K scale on the logits' key axis,
V scale folded into probs after normalization algebra): parity is
asserted against the dense path in tests/test_decode_attention.py.

Grid: (B, ceil(T / block_t)); all (kv, group) heads of one batch row
are processed per step so K/V tiles are CONTIGUOUS [block_t, KV*Dh]
reads — no strided DMA, no layout change, and the Pallas pipeline
double-buffers tile fetches across grid steps. GQA reads the cache at
its true KV size (query head h uses kv head h // (H/KV), HF
repeat_interleave semantics, as in the dense path).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, mask_ref, ks_ref, vs_ref, o_ref,
            m_scr, l_scr, acc_scr, *, scale, quantized):
    tb = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(tb == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    k_t = k_ref[0].astype(jnp.float32)          # [TB, KV, D]
    q_t = q_ref[0].astype(jnp.float32)          # [KV, G, D]
    # QK^T as broadcast-multiply + lane reduction: the same matvec math
    # as the dense path's dot, with no batch dims for XLA to transpose
    s = jnp.sum(k_t[:, :, None, :] * q_t[None], axis=-1) * scale
    if quantized:
        s = s * ks_ref[0][:, :, None]           # per-(slot, head) K scale
    # the caller zero-pads the mask to the block grid, so a ragged last
    # tile's out-of-bounds K garbage is always masked here. The mask
    # rides as a [B,T,KV] broadcast: its (1, bt, nkv) tile has a FULL
    # lane dim, the shape Mosaic accepts (a (1, bt) tile of a [B,T]
    # mask fails the 8x128 block-tiling rule — first TPU compile).
    valid = mask_ref[0] > 0                     # [TB, KV] (f32 0/1)
    s = jnp.where(valid[:, :, None], s, _NEG)

    m_prev = m_scr[...]                         # [KV, G]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=0))
    # exp after masking can still give exp(0)=1 on fully-masked tiles
    # (s == m_new == _NEG); the explicit valid multiply zeroes those
    p = jnp.exp(s - m_new[None]) * valid[:, :, None].astype(jnp.float32)
    corr = jnp.exp(m_prev - m_new)
    # l accumulates RAW probabilities (the softmax denominator); the V
    # scale below only enters the numerator — same algebra as the dense
    # path's softmax-then-scale
    l_scr[...] = l_scr[...] * corr + jnp.sum(p, axis=0)
    if quantized:
        # sanitize: a ragged tile's OOB scale read may be NaN, and
        # NaN * (p == 0) would poison the accumulator
        vs = jnp.where(valid, vs_ref[0], 0.0)
        p = p * vs[:, :, None]                  # per-(slot, head) V scale
    # where (not multiply): a ragged tile's OOB V rows may be NaN and
    # p==0 would not neutralize them (0 * NaN = NaN)
    v_t = jnp.where(valid[:, :, None], v_ref[0].astype(jnp.float32),
                    0.0)                        # [TB, KV, D]
    pv = jnp.sum(p[..., None] * v_t[:, :, None, :], axis=0)   # [KV, G, D]
    acc_scr[...] = acc_scr[...] * corr[..., None] + pv
    m_scr[...] = m_new

    @pl.when(tb == nt - 1)
    def _():
        o_ref[0] = (acc_scr[...] / l_scr[...][..., None]
                    ).astype(o_ref.dtype)


def decode_attention_stacked(q, ck_all, cv_all, layer_idx, mask,
                             ks_all=None, vs_all=None, *,
                             block_t: int = 128,
                             interpret: bool = False):
    """Same kernel, fed the FULL stacked [L,B,T,KV,Dh] cache + a traced
    layer index (scalar prefetch): the per-layer `dynamic_index_in_dim`
    the dense path runs inside the layer scan gives XLA a [B,T,KV,Dh]
    slice to materialize for the attention consumer; indexing the
    leading dim in the BlockSpec instead means tiles DMA straight from
    the stacked buffer and no slice copy can exist."""
    b, s_q, nh, dh = q.shape
    assert s_q == 1, f"decode kernel is q_len=1 only, got {s_q}"
    if jax.default_backend() != "tpu":
        interpret = True
    t, nkv = ck_all.shape[2], ck_all.shape[3]
    g = nh // nkv
    scale = dh ** -0.5
    quantized = ks_all is not None
    if mask.ndim == 4:
        mask = mask[:, 0, 0, :]
    qg = q[:, 0].reshape(b, nkv, g, dh)
    bt = min(block_t, t)
    nt = pl.cdiv(t, bt)
    maskf = mask.astype(jnp.float32)
    if nt * bt != t:
        maskf = jnp.pad(maskf, ((0, 0), (0, nt * bt - t)))
    maskf = jnp.broadcast_to(maskf[:, :, None], (b, nt * bt, nkv))
    li = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    mha = g == 1
    if mha:
        qg = qg.reshape(b, nkv, dh)             # 3D kernel path
        q_spec = pl.BlockSpec((1, nkv, dh), lambda i, j, li_: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        q_spec = pl.BlockSpec((1, nkv, g, dh),
                              lambda i, j, li_: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [
        q_spec,
        pl.BlockSpec((1, 1, bt, nkv, dh),
                     lambda i, j, li_: (li_[0], i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bt, nkv, dh),
                     lambda i, j, li_: (li_[0], i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bt, nkv), lambda i, j, li_: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qg, ck_all, cv_all, maskf]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, 1, bt, nkv),
                         lambda i, j, li_: (li_[0], i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bt, nkv),
                         lambda i, j, li_: (li_[0], i, j, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [ks_all.astype(jnp.float32), vs_all.astype(jnp.float32)]
    else:
        in_specs += [
            pl.BlockSpec((1, 1, 1), lambda i, j, li_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, j, li_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        z = jnp.zeros((1, 1, 1), jnp.float32)
        args += [z, z]

    if mha:
        out_spec = pl.BlockSpec((1, nkv, dh), lambda i, j, li_: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, nkv, dh), q.dtype)
        scratch = [pltpu.VMEM((1, nkv), jnp.float32),
                   pltpu.VMEM((1, nkv), jnp.float32),
                   pltpu.VMEM((nkv, dh), jnp.float32)]
        body = partial(_kernel_stacked_mha, scale=scale,
                       quantized=quantized)
    else:
        out_spec = pl.BlockSpec((1, nkv, g, dh),
                                lambda i, j, li_: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, nkv, g, dh), q.dtype)
        scratch = [pltpu.VMEM((nkv, g), jnp.float32),
                   pltpu.VMEM((nkv, g), jnp.float32),
                   pltpu.VMEM((nkv, g, dh), jnp.float32)]
        body = partial(_kernel_stacked, scale=scale, quantized=quantized)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nt),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(li, *args)
    return out.reshape(b, 1, nh, dh)


def _kernel_stacked_mha(li_ref, q_ref, k_ref, v_ref, mask_ref, ks_ref,
                        vs_ref, o_ref, m_scr, l_scr, acc_scr, *, scale,
                        quantized):
    """MHA (G==1) specialization: every array is <=3D with (sublane,
    lane) = (TB or KV, KV or D) — the shape family the production flash
    kernel lowers with. The generic G-dim body's [TB,KV,1,D] forms gave
    Mosaic's compile helper an INTERNAL crash at 7B (first stacked TPU
    attempt); this path avoids single-lane arrays entirely."""
    tb = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(tb == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    k_t = k_ref[0, 0].astype(jnp.float32)       # [TB, KV, D]
    q_t = q_ref[0].astype(jnp.float32)          # [KV, D]
    s = jnp.sum(k_t * q_t[None], axis=-1) * scale          # [TB, KV]
    if quantized:
        s = s * ks_ref[0, 0]
    valid = mask_ref[0] > 0                     # [TB, KV]
    s = jnp.where(valid, s, _NEG)

    m_prev = m_scr[0]                           # [KV]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=0))
    p = jnp.exp(s - m_new[None]) * valid.astype(jnp.float32)
    corr = jnp.exp(m_prev - m_new)
    l_scr[0] = l_scr[0] * corr + jnp.sum(p, axis=0)
    if quantized:
        vs = jnp.where(valid, vs_ref[0, 0], 0.0)
        p = p * vs
    v_t = jnp.where(valid[:, :, None],
                    v_ref[0, 0].astype(jnp.float32), 0.0)  # [TB, KV, D]
    pv = jnp.sum(p[..., None] * v_t, axis=0)    # [KV, D]
    acc_scr[...] = acc_scr[...] * corr[:, None] + pv
    m_scr[0] = m_new

    @pl.when(tb == nt - 1)
    def _():
        o_ref[0] = (acc_scr[...] / l_scr[0][:, None]).astype(o_ref.dtype)


def _kernel_stacked(li_ref, q_ref, k_ref, v_ref, mask_ref, ks_ref,
                    vs_ref, o_ref, m_scr, l_scr, acc_scr, *, scale,
                    quantized):
    """Stacked-cache body: identical math to `_kernel`, block indexing
    differs (leading [1,1,...] layer/batch dims squeezed here)."""
    tb = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(tb == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    k_t = k_ref[0, 0].astype(jnp.float32)       # [TB, KV, D]
    q_t = q_ref[0].astype(jnp.float32)          # [KV, G, D]
    s = jnp.sum(k_t[:, :, None, :] * q_t[None], axis=-1) * scale
    if quantized:
        s = s * ks_ref[0, 0][:, :, None]
    valid = mask_ref[0] > 0                     # [TB, KV] (f32 0/1)
    s = jnp.where(valid[:, :, None], s, _NEG)

    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=0))
    p = jnp.exp(s - m_new[None]) * valid[:, :, None].astype(jnp.float32)
    corr = jnp.exp(m_prev - m_new)
    l_scr[...] = l_scr[...] * corr + jnp.sum(p, axis=0)
    if quantized:
        vs = jnp.where(valid, vs_ref[0, 0], 0.0)
        p = p * vs[:, :, None]
    v_t = jnp.where(valid[:, :, None],
                    v_ref[0, 0].astype(jnp.float32), 0.0)
    pv = jnp.sum(p[..., None] * v_t[:, :, None, :], axis=0)
    acc_scr[...] = acc_scr[...] * corr[..., None] + pv
    m_scr[...] = m_new

    @pl.when(tb == nt - 1)
    def _():
        o_ref[0] = (acc_scr[...] / l_scr[...][..., None]
                    ).astype(o_ref.dtype)


def decode_attention(q, k, v, mask, k_scale=None, v_scale=None, *,
                     block_t: int = 128, interpret: bool = False):
    """q [B,1,H,Dh], k/v [B,T,KV,Dh] (bf16 or int8 codes), mask
    [B,1,1,T] or [B,T] bool, k_scale/v_scale [B,T,KV] f32 for int8
    caches. Returns [B,1,H,Dh] in q.dtype."""
    b, s_q, nh, dh = q.shape
    assert s_q == 1, f"decode kernel is q_len=1 only, got {s_q}"
    if jax.default_backend() != "tpu":
        interpret = True                        # CPU tests / dryruns
    t, nkv = k.shape[1], k.shape[2]
    g = nh // nkv
    scale = dh ** -0.5
    quantized = k_scale is not None
    if mask.ndim == 4:
        mask = mask[:, 0, 0, :]
    qg = q[:, 0].reshape(b, nkv, g, dh)
    bt = min(block_t, t)
    nt = pl.cdiv(t, bt)
    # zero-pad the mask to the block grid: OOB rows of a ragged last
    # K/V tile read unspecified padding, and the mask is what excludes
    # them — so the mask itself must never be read out of bounds
    maskf = mask.astype(jnp.float32)            # [B, T]
    if nt * bt != t:
        maskf = jnp.pad(maskf, ((0, 0), (0, nt * bt - t)))
    maskf = jnp.broadcast_to(maskf[:, :, None], (b, nt * bt, nkv))

    in_specs = [
        pl.BlockSpec((1, nkv, g, dh), lambda i, j: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bt, nkv, dh), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bt, nkv, dh), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bt, nkv), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qg, k, v, maskf]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, bt, nkv), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, nkv), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]
    else:
        # dummies keep the kernel signature static (never read)
        in_specs += [
            pl.BlockSpec((1, 1, 1), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        z = jnp.zeros((1, 1, 1), jnp.float32)
        args += [z, z]

    out = pl.pallas_call(
        partial(_kernel, scale=scale, quantized=quantized),
        grid=(b, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nkv, g, dh), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nkv, g, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((nkv, g), jnp.float32),
            pltpu.VMEM((nkv, g), jnp.float32),
            pltpu.VMEM((nkv, g, dh), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return out.reshape(b, 1, nh, dh)
