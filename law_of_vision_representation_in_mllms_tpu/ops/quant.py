"""Weight-only int8 quantization for the decode path.

The reference trains/serves with bitsandbytes 4/8-bit layers
(`llava/train/train.py:908-932` load_in_{4,8}bit); SURVEY §2.9 keeps
quantized TRAINING out of parity scope. This module is the TPU-native
piece that matters for serving: single-token decode is HBM-bandwidth
bound (the whole 13.4 GB bf16 parameter set is read once per step at
7B), so storing the matmul weights as int8 with per-output-channel
scales halves the param-read floor — and halves resident HBM, lifting
the practical batch ceiling.

Design (dequant-to-bf16, NO int8 dot_general):
- symmetric per-output-channel scales: `scale_j = max_i |W_ij| / 127`,
  `q_ij = round(W_ij / scale_j)` — the standard near-lossless
  weight-only scheme for decode;
- the matmul computes `(x @ convert(q8)) * scale`: the scale applies
  AFTER the dot (it is per-output-column, so it commutes with the
  contraction), which keeps the big int8->bf16 convert a pure
  elementwise producer that XLA fuses into the dot's operand read —
  the int8 bytes are what crosses HBM. int8 `dot_general` itself is
  never emitted (it wedges this environment's remote compiler,
  CLAUDE.md).

A quantized weight is a dict leaf `{"q8": int8 [..., di, do],
"scale": f32 [..., 1, do]}` in place of the dense [..., di, do] array —
`lax.scan` over stacked layers slices dict leaves transparently, and
`models/llama._layer` dispatches on the leaf type.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

# decoder matmul weights worth quantizing (embed stays dense: it is a
# gather, not a matmul, and shares no kernel with the dot path)
DECODER_TARGETS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


def quantize_int8(w, axis: int = -2) -> Dict[str, Any]:
    """Symmetric per-output-channel int8 quantization of a dense weight.

    `axis` is the CONTRACTING dimension (reduced over by the matmul);
    scales are computed over it so each output channel gets one scale.
    """
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q8": q, "scale": scale.astype(jnp.float32)}


def dequantize_int8(qw: Dict[str, Any], dtype=jnp.float32):
    return qw["q8"].astype(dtype) * qw["scale"].astype(dtype)


def is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and "scale" in leaf and (
        "q8" in leaf or "q4" in leaf)


def quantize_kv(x):
    """Per-(token, head) symmetric int8 quantization of attention K/V.

    x: [..., Dh] (typically [B, S, KV, Dh] — one fresh K or V block on
    its way into the decode cache). Returns ``(codes int8 [..., Dh],
    scale f32 [...])`` with ``scale = maxabs/127`` over the head dim.

    Rationale (benchmarks/README.md round-4 decode roofline): at 7B the
    per-step KV-cache read is the term that drags int8-weight decode to
    58% of achievable at b8 — per-token scales halve those bytes while
    keeping the dots bf16 (the int8->bf16 convert fuses into the QK^T /
    PV operand read exactly like the int8 weight path above; int8
    dot_general is never emitted). Per-(token, head) granularity is the
    standard near-lossless choice: each scale covers one Dh=128 vector.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-20) / 127.0
    codes = jnp.round(xf / scale[..., None]).astype(jnp.int8)
    return codes, scale


def int8_matmul(x, qw: Dict[str, Any]):
    """`x @ dequant(qw)` with the per-channel scale applied after the
    dot (mathematically identical; keeps the convert fusible into the
    dot's int8 operand read)."""
    y = x @ qw["q8"].astype(x.dtype)
    return y * qw["scale"].astype(x.dtype).reshape(
        (1,) * (y.ndim - 1) + (-1,))


def quantize_int4(w, axis: int = -2,
                  group_size: int | None = 128) -> Dict[str, Any]:
    """Symmetric int4 quantization with grouped scales.

    Weights are stored PACKED: two 4-bit codes per int8 byte. Within
    each scale group of `gsz` contraction rows, row j (j < gsz/2)
    shares a byte with row j + gsz/2 — j in the low nibble, its
    partner in the high — so each group's packed tile unpacks into two
    CONTIGUOUS row halves, never an even/odd interleave. That layout
    is what lets the Pallas decode kernel (`ops/int4_kernel.py`)
    compute `x_lo @ lo + x_hi @ hi` per group straight from the packed
    VMEM tile: 4 bits/weight is all that crosses HBM — half the int8
    floor, a quarter of bf16. (XLA alone does NOT fuse a shift-based
    unpack into the dot's operand read the way it fuses the int8
    convert; it materializes the bf16 tree, measured 7x slower —
    benchmarks/README.md round-4 int4 note. Native `jnp.int4` S4
    storage would be cleaner, but S4 array dispatch crashes this
    environment's remote backend with a shard_arg recursion.)

    `group_size` scales blocks of `group_size` contraction rows
    independently (the standard accuracy fix for 4-bit round-to-nearest;
    bitsandbytes' 4-bit blockwise scheme is the reference counterpart,
    `llava/train/train.py:915-923` BitsAndBytesConfig). `None` means one
    scale per output channel (G=1). Symmetric range is [-7, 7]: -8 is
    excluded so the grid is symmetric, matching the amax/7 scale.

    Leaf format: {"q4": int8 [..., di//2, do] (packed), "scale":
    f32 [..., G, do]} with di % (2*group_size or 2) == 0; `axis` must be
    the contracting dim -2.
    """
    if axis != -2:
        raise ValueError("int4 quantization expects the contracting dim "
                         "at axis=-2")
    wf = jnp.asarray(w, jnp.float32)
    di, do = wf.shape[-2], wf.shape[-1]
    if di % 2:
        raise ValueError(f"int4 packing needs an even contraction dim, "
                         f"got {di}")
    # clamp: a group can never exceed the contraction dim (tiny test
    # models keep the production default group_size=128)
    g = di if group_size is None else min(int(group_size), di)
    if di % g or g % 2:
        raise ValueError(f"group_size {g} must be even and divide "
                         f"di={di}")
    lead = wf.shape[:-2]
    wg = wf.reshape(*lead, di // g, g, do)
    amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)       # [...,G,1,do]
    scale = jnp.maximum(amax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(wg / scale), -7, 7).astype(jnp.int8)
    lo, hi = q[..., : g // 2, :], q[..., g // 2:, :]          # [...,G,g/2,do]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF),
                            jnp.left_shift(hi, 4)).astype(jnp.int8)
    packed = packed.reshape(*lead, di // 2, do)
    return {"q4": packed, "scale": scale[..., 0, :].astype(jnp.float32)}


def _unpack_int4(packed, ng: int, dtype):
    """[..., di//2, do] packed int8 -> [..., di, do] values in `dtype`,
    undoing the per-group half-split: byte row j of group G holds
    contraction row G*gsz + j in the low nibble and G*gsz + gsz/2 + j in
    the high. Arithmetic shifts sign-extend: low nibble via <<4 then
    >>4, high via >>4. Pure elementwise + reshape."""
    lead = packed.shape[:-2]
    dh, do = packed.shape[-2], packed.shape[-1]
    pg = packed.reshape(*lead, ng, dh // ng, do)
    lo = jnp.right_shift(jnp.left_shift(pg, 4), 4)
    hi = jnp.right_shift(pg, 4)
    w = jnp.concatenate([lo, hi], axis=-2)        # [..., G, gsz, do]
    return w.reshape(*lead, 2 * dh, do).astype(dtype)


def dequantize_int4(qw: Dict[str, Any], dtype=jnp.float32):
    q, scale = qw["q4"], qw["scale"]
    di, do = q.shape[-2] * 2, q.shape[-1]
    ng = scale.shape[-2]
    w = _unpack_int4(q, ng, dtype)
    wg = w.reshape(*q.shape[:-2], ng, di // ng, do)
    return (wg * scale[..., :, None, :].astype(dtype)).reshape(
        *q.shape[:-2], di, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _int4_kernel_mm(x2, q, scale, interpret=False):
    from .int4_kernel import int4_matmul_kernel
    return int4_matmul_kernel(x2, q, scale, interpret=interpret)


def _int4_kernel_mm_fwd(x2, q, scale, interpret=False):
    # residuals must be jax types: carry x2's dtype via a 0-size array
    return (_int4_kernel_mm(x2, q, scale, interpret),
            (q, scale, jnp.zeros((0,), x2.dtype)))


def _int4_kernel_mm_bwd(interpret, res, dy):
    # QLoRA training (train.quantize_base): the frozen int4 base needs
    # dL/dx to reach earlier layers and the adapters. dx = dy @ W^T with
    # W dequantized by XLA (a bf16 materialize per backward matmul —
    # ~5% of a 7B train step; the fwd still streams packed bytes via
    # the Pallas kernel). q is frozen int storage: float0 cotangent.
    q, scale, xproto = res
    xdt = xproto.dtype
    import numpy as _np
    w = dequantize_int4({"q4": q, "scale": scale}, xdt)
    dx = (dy.astype(xdt) @ w.T).astype(xdt)
    return (dx, _np.zeros(q.shape, jax.dtypes.float0),
            jnp.zeros_like(scale))


_int4_kernel_mm.defvjp(_int4_kernel_mm_fwd, _int4_kernel_mm_bwd)


def int4_matmul(x, qw: Dict[str, Any]):
    """`x @ dequant(qw)` with grouped scales applied after per-group
    partial dots: y = sum_G scale[G] * (x_G @ q_G).

    On TPU, production shapes route through the Pallas kernel
    (`ops/int4_kernel.py`) that unpacks nibbles in-register so only the
    packed 4-bit bytes cross HBM (differentiable w.r.t. x via the
    custom VJP above — the QLoRA train path). Elsewhere (and for tiny
    test shapes) the XLA formulation below runs: for G == 1 the same
    post-dot scaling as the int8 path; for G > 1 one batched dot with G
    as the batch dim (decode x is tiny, so [..., G, do] is negligible)."""
    q, scale = qw["q4"], qw["scale"]
    di, do = q.shape[-2] * 2, q.shape[-1]
    ng = scale.shape[-2]
    if q.ndim == 2 and jax.default_backend() == "tpu":
        from .int4_kernel import kernel_supported
        if kernel_supported(q, scale):
            y = _int4_kernel_mm(x.reshape(-1, di), q, scale, False)
            return y.reshape(*x.shape[:-1], do)
    s = scale.astype(x.dtype)
    w = _unpack_int4(q, ng, x.dtype)
    if ng == 1:
        y = x @ w
        return y * s.reshape((1,) * (y.ndim - 1) + (-1,))
    g = di // ng
    xg = x.reshape(*x.shape[:-1], ng, g)
    wg = w.reshape(ng, g, do)
    y = jnp.einsum("...Gg,Ggo->...Go", xg, wg)
    return jnp.sum(y * s, axis=-2)


def quant_matmul(x, qw: Dict[str, Any]):
    """Dispatch on the quantized-leaf format (int8 or int4)."""
    return int4_matmul(x, qw) if "q4" in qw else int8_matmul(x, qw)


def quantize_decoder(params: Dict[str, Any],
                     targets=DECODER_TARGETS,
                     quantize_lm_head: bool = True,
                     bits: int = 8,
                     group_size: int | None = 128) -> Dict[str, Any]:
    """Quantize a LLaMA decoder param tree's matmul weights in place
    (returns a new tree; embed/norms stay dense). Stacked [L, di, do]
    layer weights get per-(layer, output-channel) scales [L, 1, do]
    (int8) or per-(layer, group, output-channel) [L, G, do] (int4)."""
    if bits == 8:
        def qfn(w):
            return quantize_int8(w, axis=-2)
    elif bits == 4:
        def qfn(w):
            return quantize_int4(w, axis=-2, group_size=group_size)
    else:
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    out = dict(params)
    layers = dict(params["layers"])
    for t in targets:
        if t in layers and not is_quantized(layers[t]):
            layers[t] = qfn(layers[t])
    out["layers"] = layers
    if quantize_lm_head and "lm_head" in out \
            and not is_quantized(out["lm_head"]):
        out["lm_head"] = qfn(out["lm_head"])
    return out


def quantized_bytes(params) -> int:
    """Resident bytes of a (possibly partially quantized) param tree."""
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
