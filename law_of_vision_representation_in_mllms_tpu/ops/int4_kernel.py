"""Pallas int4 weight-only matmul for the decode path.

Why a kernel at all: the XLA formulation (`ops/quant.int4_matmul`
fallback) expresses the nibble unpack as shifts + concat feeding the
dot. XLA fuses a plain int8->bf16 `convert` into a dot's operand read
(the int8 path streams quantized bytes from HBM), but it does NOT fuse
the shift/select unpack graph — it materializes the full dequantized
bf16 weight tree to HBM every step, so "int4" decode measured 30.9
tok/s at 7B b4 vs int8's 220.8 (benchmarks/results.json, round-4
negative result). This kernel reads the PACKED bytes into VMEM and
unpacks in-register, so 4 bits/weight is what crosses HBM.

Block geometry is the whole game. The v1 kernel blocked ONE scale
group (hg x bo = 16 KB) per grid step: at 7B that is ~143,000 grid
steps per decode step, and per-step overhead (~0.3 us) alone accounted
for the measured 46 ms (86.7 tok/s b4 — 11x the 4.1 ms param-read
floor). v2 blocks `gk` groups per step (targeting ~1-2 MB weight
tiles) and sweeps them with an in-kernel static loop, cutting the grid
to a few thousand steps; an M grid dim keeps prefill's x tiles inside
VMEM.

Packing contract (produced by `ops/quant.quantize_int4`): the di
contraction rows are grouped into G scale groups of gsz rows; within a
group, row j pairs with row j + gsz/2 in one byte (j in the low
nibble, j + gsz/2 in the high). Splitting each group into contiguous
lo/hi HALVES — instead of interleaving even/odd rows — lets the kernel
compute the group's partial dot as

    part_g = x[:, lo rows] @ lo + x[:, hi rows] @ hi

from ONE VMEM-resident packed tile, with no row interleave anywhere
(an in-kernel sublane interleave is exactly the shuffle Mosaic would
make slow). Scales apply post-dot per group: acc += part_g * scale_g.

Grid: (do // BO, M // BM, G // gk) with the group dim innermost — the
f32 accumulator persists in scratch across the inner sweep and the
output block is written once per (column, row) block. Activations
enter as [G/gk, M, gk*gsz] (a cheap device-side reshape+transpose of
the [M, di] input) so each grid step's x tile is a leading-dim slice.

Reference counterpart: bitsandbytes 4-bit blockwise quantized serving
(`llava/train/train.py:915-923` BitsAndBytesConfig load_in_4bit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, q_ref, s_ref, o_ref, acc_ref):
    # x [1, BM, gk*gsz] bf16; q [gk*hg, BO] int8 packed; s [1, gk, BO]
    # f32 (scale enters 3-D so its block's trailing dims pass the
    # Mosaic tiling rule: gk == the full array dim); o [BM, BO];
    # acc [BM, BO] f32 scratch persisting over the group sweep.
    g = pl.program_id(2)

    @pl.when(g == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    gk = s_ref.shape[1]
    hg = q_ref.shape[0] // gk
    xg = x_ref[0]                                   # [BM, gk*gsz]
    for i in range(gk):                             # static unroll
        p = q_ref[i * hg:(i + 1) * hg, :].astype(jnp.int32)
        lo4 = jnp.bitwise_and(p, 15)
        # sign-extend the low nibble without a left shift
        lo = jnp.where(lo4 >= 8, lo4 - 16, lo4).astype(jnp.bfloat16)
        # p is sign-extended int32, so an arithmetic >>4 yields the
        # high nibble's signed value directly
        hi = jnp.right_shift(p, 4).astype(jnp.bfloat16)
        xi = xg[:, i * 2 * hg:(i + 1) * 2 * hg]     # [BM, gsz]
        if xg.shape[0] > 64:
            # prefill-sized M: one K=gsz dot keeps the MXU's full
            # contraction depth fed; the lo/hi sublane concat
            # reassembles the group's rows in order (contiguous halves
            # by construction)
            w = jnp.concatenate([lo, hi], axis=0)   # [gsz, BO]
            part = jnp.dot(xi, w, preferred_element_type=jnp.float32)
        else:
            # decode-sized M: two half-depth dots skip the concat copy
            # (weight-tile-sized — it would rival the HBM read it
            # saves)
            part = jnp.dot(xi[:, :hg], lo,
                           preferred_element_type=jnp.float32)
            part += jnp.dot(xi[:, hg:], hi,
                            preferred_element_type=jnp.float32)
        acc_ref[...] += part * s_ref[0, i]          # [BO] broadcasts

    @pl.when(g == pl.num_programs(2) - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def kernel_supported(q, scale) -> bool:
    """Shape gate for the compiled kernel (production 7B/1.4B shapes
    all pass; tiny CPU-test shapes fall back to the XLA path)."""
    if q.ndim != 2 or scale.ndim != 2:
        return False
    dh, do = q.shape
    ng = scale.shape[0]
    if dh % ng:
        return False
    hg = dh // ng
    # lanes: per-group x tile is 2*hg wide; sublanes: packed tile rows
    return (2 * hg) % 128 == 0 and hg % 8 == 0 and _pick_bo(do) > 0


def _pick_bo(do: int) -> int:
    for bo in (512, 256, 128):
        if do % bo == 0:
            return bo
    return 0


def _pick_gk(ng: int, hg: int, bo: int, bm: int) -> int:
    """Groups per grid step: the largest divisor of ng keeping the
    packed weight tile (gk*hg x bo int8) within ~1.5 MB and the x tile
    (bm x gk*2*hg bf16) within ~4 MB — big enough tiles to amortize
    grid-step overhead, small enough to double-buffer in VMEM."""
    best = 1
    for gk in range(1, ng + 1):
        if ng % gk:
            continue
        if gk * hg * bo <= (3 << 19) and bm * gk * 4 * hg <= (1 << 22):
            best = gk
    return best


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_matmul_kernel(x2, q, scale, *, interpret: bool = False):
    """x2 [M, di] @ unpack(q [di/2, do]) * scale [G, do] -> [M, do].

    M is padded to the bf16 sublane tile (16) and blocked at 256 for
    prefill-sized calls; the packed bytes are the only weight bytes
    read from HBM.
    """
    m0, di = x2.shape
    dh, do = q.shape
    ng = scale.shape[0]
    hg = dh // ng
    gsz = 2 * hg
    bo = _pick_bo(do)
    bm = max(16, min(256, -(-m0 // 16) * 16))
    m = -(-m0 // bm) * bm
    gk = _pick_gk(ng, hg, bo, bm)
    gb = ng // gk
    xp = jnp.zeros((m, di), jnp.bfloat16).at[:m0].set(
        x2.astype(jnp.bfloat16))
    xg = xp.reshape(m, gb, gk * gsz).transpose(1, 0, 2)  # [GB, M, gk*gsz]

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, do), x2.dtype),
        grid=(do // bo, m // bm, gb),
        in_specs=[
            pl.BlockSpec((1, bm, gk * gsz), lambda j, mi, g: (g, mi, 0)),
            pl.BlockSpec((gk * hg, bo), lambda j, mi, g: (g, j)),
            pl.BlockSpec((1, gk, bo), lambda j, mi, g: (g, 0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bo), lambda j, mi, g: (mi, j)),
        scratch_shapes=[pltpu.VMEM((bm, bo), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(xg, q, scale.astype(jnp.float32).reshape(gb, gk, do))
    return out[:m0]
