"""Attention ops.

`mha` is the XLA-fused reference path (fp32 softmax, bf16 matmuls — XLA fuses
the scale/softmax chain into the MXU matmuls). The Pallas flash-attention
kernel in `ops.flash_attention` is used for long decoder sequences on TPU;
both share this signature so models can switch by config.

Replaces the reference's flash-attn CUDA monkey-patch
(`llava/train/llama_flash_attn_monkey_patch.py`) and the Triton kernel
(`llava/model/language_model/mpt/flash_attn_triton.py`).
"""

from __future__ import annotations

import contextlib

import jax.numpy as jnp
from jax import lax

# Trace-time capture hook for the clamp guard (ops/clamp_guard.py): while
# a `capture_logit_maxes()` context is active, every `mha_expnomax*` call
# traced inside it appends its per-call max scaled logit. The production
# programs are unaffected (the hook is None outside guard traces).
_LOGIT_CAPTURE: list | None = None


@contextlib.contextmanager
def capture_logit_maxes():
    """Collect the traced max attention logit of every expclamp call
    traced within the context. Usable only around python-loop model
    bodies (all expclamp users: ViT towers, UNet/DiT/MMDiT blocks) —
    a lax.scan body would leak tracers, and none of the users scan."""
    global _LOGIT_CAPTURE
    prev = _LOGIT_CAPTURE
    _LOGIT_CAPTURE = acc = []
    try:
        yield acc
    finally:
        _LOGIT_CAPTURE = prev


def _capture_max(logits):
    if _LOGIT_CAPTURE is not None:
        _LOGIT_CAPTURE.append(jnp.max(logits).astype(jnp.float32))


def mha(q, k, v, *, bias=None, mask=None, scale: float | None = None,
        accum_dtype=jnp.float32):
    """Multi-head attention.

    Args:
      q: [B, Sq, H, D]
      k, v: [B, Skv, H, D]   (H may be num_kv_heads; caller repeats for GQA)
      bias: broadcastable to [B, H, Sq, Skv], added to logits.
      mask: broadcastable boolean [B, H, Sq, Skv]; False -> -inf.
      scale: logit scale; default 1/sqrt(D).

    Returns [B, Sq, H, D] in q.dtype.
    """
    *_, d = q.shape
    if scale is None:
        scale = d ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=accum_dtype)
    logits = logits * jnp.asarray(scale, accum_dtype)
    if bias is not None:
        logits = logits + bias.astype(accum_dtype)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.asarray(-1e30, accum_dtype))
    probs = _softmax(logits).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=accum_dtype)
    return out.astype(q.dtype)


def _softmax(logits):
    m = lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    unnorm = jnp.exp(logits - m)
    return unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)


def mha_post(q, k, v, *, bias=None, mask=None, scale: float | None = None,
             accum_dtype=jnp.float32):
    """`mha` with the softmax normalization moved AFTER the P·V matmul.

    Identical math to `mha` (softmax is linear in the normalizer), but the
    [B,H,Sq,Skv]-sized divide pass disappears: instead of normalizing the
    probability tensor (read+write of the largest intermediate in the whole
    tower), the [B,Sq,H,D] output — Skv/D times smaller — is divided by the
    row sums. On v5e CLIP-L-336 (B=64,H=16,S=577,D=64) this removes ~1.4 GB
    of HBM traffic per layer out of ~4.1 GB; everything else stays on XLA's
    fused fast path (dot → exp fuses as an output fusion, the fp32 row-sum
    rides the same pass as a second fusion output).

    The denominator accumulates in fp32 regardless of `accum_dtype`: a bf16
    sum's ulp at l≈600 would swamp small-mass rows (same reasoning as
    ops/encoder_attention.py), while the bf16 probabilities themselves match
    the reference's fp16 towers (`clip_encoder.py:33` runs .half()).

    Replaces the same reference surface as `mha` (torch SDPA encoder
    attention in `clip_encoder.py` / `siglip_encoder.py`).
    """
    *_, d = q.shape
    if scale is None:
        scale = d ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=accum_dtype)
    logits = logits * jnp.asarray(scale, accum_dtype)
    if bias is not None:
        logits = logits + bias.astype(accum_dtype)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.asarray(-1e30, accum_dtype))
    m = lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    p = jnp.exp(logits - m)
    l = jnp.sum(p.astype(jnp.float32), axis=-1)            # [B,H,Sq] fp32
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v,
                     preferred_element_type=accum_dtype)
    den = jnp.transpose(l, (0, 2, 1))[..., None]           # [B,Sq,H,1]
    return (out.astype(jnp.float32) / den).astype(q.dtype)


def mha_expnomax(q, k, v, *, scale: float | None = None, clamp: float = 85.0,
                 accum_dtype=jnp.float32):
    """No-max softmax attention — the fastest measured CLIP-336 path on
    v5e (310 vs 278 img/s for `mha`, benchmarks/README.md round-3 log).

    softmax(s) = exp(s)/Σexp(s) computed DIRECTLY: skipping the row-max
    subtraction removes the max reduction's full read pass over the
    [B,H,Sq,Skv] logits AND lets XLA fuse the exp into the QK dot's output
    fusion, so the pre-exp logits never reach HBM. Max subtraction is a
    numerical-stability device, not part of the math: for any row whose
    logits stay below `clamp` the result is exactly as accurate as the
    max-subtracted bf16 path (bf16/fp32 share an 8-bit exponent, so large
    magnitudes cost no mantissa), and exp stays in range (overflow at
    ~88.7). Rows exceeding `clamp` saturate toward a uniform distribution
    over their clamped entries — 85 leaves >25 of headroom over the
    largest attention logits reported for ViT-L-class models; bench.py
    asserts exact equality against `mha` on its workload. Opt in via
    ViTConfig.attn_impl="xla_expclamp" / model.tower_attn_impl.

    An all-underflowed row (every logit < ~-87) would yield l=0; the
    denominator floor turns that into zeros instead of NaNs.
    """
    *_, d = q.shape
    if scale is None:
        scale = d ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=accum_dtype)
    logits = logits * jnp.asarray(scale, accum_dtype)
    _capture_max(logits)
    p = jnp.exp(jnp.minimum(logits, jnp.asarray(clamp, accum_dtype)))
    l = jnp.sum(p.astype(jnp.float32), axis=-1)            # [B,H,Sq] fp32
    l = jnp.maximum(l, 1e-35)
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v,
                     preferred_element_type=accum_dtype)
    den = jnp.transpose(l, (0, 2, 1))[..., None]           # [B,Sq,H,1]
    return (out.astype(jnp.float32) / den).astype(q.dtype)


def mha_expnomax_fused(q, k, v, *, scale: float | None = None,
                       clamp: float = 85.0, accum_dtype=jnp.float32):
    """`mha_expnomax` with the softmax denominator fused into the P·V
    matmul: V gains a ones column, so ``P @ [V | 1]`` yields the
    numerator AND the row-sums in one MXU pass. Two HBM savings over
    `mha_expnomax`:

    - the separate row-sum reduction disappears, so the exp'd logits
      [B,H,Sq,Skv] are read ONCE (by the dot) instead of twice;
    - with a single consumer, the QK→scale→exp→cast chain fuses into one
      output fusion materializing p once in compute dtype (the two-reader
      version keeps an `accum_dtype` copy alive for the fp32 row-sum).

    The extra column is free on the MXU: D=64 pads to the 128-lane tile
    regardless. The dot outputs fp32 (preferred_element_type), so the
    denominator is an fp32 accumulation of the same compute-dtype p the
    numerator uses — the same accuracy structure as `mha_expnomax` — and
    the final divide runs in fp32 inside the dot's output fusion. Clamp
    semantics and the all-underflowed-row guard match `mha_expnomax`.
    """
    *_, d = q.shape
    if scale is None:
        scale = d ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=accum_dtype)
    logits = logits * jnp.asarray(scale, accum_dtype)
    _capture_max(logits)
    p = jnp.exp(jnp.minimum(logits, jnp.asarray(clamp, accum_dtype)))
    v_aug = jnp.concatenate(
        [v, jnp.ones(v.shape[:-1] + (1,), v.dtype)], axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v_aug,
                     preferred_element_type=jnp.float32)
    den = jnp.maximum(out[..., -1:], 1e-35)                # [B,Sq,H,1]
    return (out[..., :-1] / den).astype(q.dtype)


def mha_blocked(q, k, v, *, scale: float | None = None, block_k: int = 128,
                accum_dtype=jnp.float32, unroll: bool = True):
    """K-blocked online-softmax attention in pure XLA ops (non-causal).

    The flash-attention recurrence (running max / denominator / fp32
    accumulator over KV blocks) expressed with plain dots + elementwise ops
    so the matmuls stay on XLA's fast batched-dot path — the avenue none of
    the Pallas kernels could take (Mosaic runs D=64 batched dots at
    ~19 TFLOP/s, benchmarks/README.md "Kernel-policy measurements"). Block
    logits are [B,H,Sq,block_k]; the full [B,H,Sq,Skv] tensor never exists.

    Trade-off measured on v5e (round 3): per-block carry updates re-read and
    re-write the fp32 [B,Sq,H,D] accumulator, which XLA cannot fuse into the
    P·V dots, so total HBM traffic is ≥ the unblocked `mha_post` path
    whenever the logits tensor fits HBM comfortably. Kept for the record and
    for shapes where Skv is large enough that materializing logits at all is
    the problem (Skv ≳ 4k).

    q: [B,Sq,H,D]; k, v: [B,Skv,H,D]. Returns [B,Sq,H,D] in q.dtype.
    """
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    nb = -(-skv // block_k)
    skv_p = nb * block_k
    if skv_p != skv:
        pad = [(0, 0), (0, skv_p - skv), (0, 0), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    # fold the scale into q: one pass over [B,Sq,H,D] instead of one over
    # every [B,H,Sq,block_k] logits block (d**-0.5 is exact in bf16 for
    # power-of-two D, so numerics match the logit-scaled path)
    q = q * jnp.asarray(scale, q.dtype)

    kb = jnp.moveaxis(k.reshape(b, nb, block_k, h, d), 1, 0)
    vb = jnp.moveaxis(v.reshape(b, nb, block_k, h, d), 1, 0)
    neg = jnp.asarray(-1e30, accum_dtype)

    def block_update(carry, kv_b, v_b, col0):
        m, l, acc = carry
        s = jnp.einsum("bqhd,bkhd->bhqk", q, kv_b,
                       preferred_element_type=accum_dtype)
        valid = (col0 + jnp.arange(block_k)) < skv
        s = jnp.where(valid[None, None, None, :], s, neg)
        bm = lax.stop_gradient(jnp.max(s, axis=-1))        # [B,H,Sq]
        nm = jnp.maximum(m, bm)
        p = jnp.exp(s - nm[..., None])
        corr = jnp.exp(m - nm).astype(jnp.float32)         # [B,H,Sq]
        l = l * corr + jnp.sum(p.astype(jnp.float32), axis=-1)
        pv = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v_b.dtype), v_b,
                        preferred_element_type=jnp.float32)
        corr_t = jnp.transpose(corr, (0, 2, 1))[..., None]  # [B,Sq,H,1]
        acc = acc * corr_t + pv.astype(jnp.float32)
        return nm, l, acc

    m0 = jnp.full((b, h, sq), -jnp.inf, accum_dtype)
    l0 = jnp.zeros((b, h, sq), jnp.float32)
    a0 = jnp.zeros((b, sq, h, d), jnp.float32)
    if unroll:
        carry = (m0, l0, a0)
        for i in range(nb):
            carry = block_update(carry, kb[i], vb[i], i * block_k)
        _, l, acc = carry
    else:
        def body(carry, xs):
            kv_b, v_b, col0 = xs
            return block_update(carry, kv_b, v_b, col0), None
        cols = jnp.arange(nb) * block_k
        (_, l, acc), _ = lax.scan(body, (m0, l0, a0), (kb, vb, cols))
    den = jnp.transpose(l, (0, 2, 1))[..., None]
    return (acc / den).astype(q.dtype)


def causal_mask(sq: int, skv: int, dtype=bool):
    """Lower-triangular mask aligned to the *end* of the kv sequence."""
    i = jnp.arange(sq)[:, None]
    j = jnp.arange(skv)[None, :]
    return (j - (skv - sq)) <= i
