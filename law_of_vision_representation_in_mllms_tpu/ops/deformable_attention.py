"""Multi-scale deformable attention (MSDeformAttn) — TPU-native.

The reference's ONLY first-party native op is the MSDeformAttn CUDA kernel
(`C_score/third_party/Mask2Former/.../ops/src/ms_deform_attn_cuda.cu`,
`ms_deform_im2col_cuda.cuh`), used by the vendored Mask2Former/ODISE mask
branch of GeoAware-SC (optional; not on the zero-shot C-score path —
SURVEY.md §2.10). The CUDA kernel is a gather-heavy im2col; on TPU the same
math is a batched bilinear gather + weighted sum that XLA fuses fine — no
Pallas needed because the op is bandwidth-bound gathers, not MXU work.

Semantics (`ms_deform_attn_core` / the CPU fallback): for each query, head,
level and point, bilinearly sample the level's value map at a (normalized)
sampling location and reduce with softmaxed attention weights. Out-of-range
samples contribute zero (the CUDA kernel's zero-padding behavior).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def bilinear_sample(value, loc_x, loc_y):
    """Zero-padded bilinear sampling.

    value: [H, W, C]; loc_x/loc_y: [...] ABSOLUTE pixel-space coords in the
    align_corners=False convention (grid position p samples around p-0.5).
    Returns [..., C].
    """
    h, w, c = value.shape
    x = loc_x - 0.5
    y = loc_y - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[..., None]
    dy = (y - y0)[..., None]

    def tap(ix, iy):
        inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        v = value[iyc, ixc]
        return jnp.where(inb[..., None], v, 0.0)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    top = v00 * (1 - dx) + v01 * dx
    bot = v10 * (1 - dx) + v11 * dx
    return top * (1 - dy) + bot * dy


def ms_deform_attn(value, spatial_shapes: Sequence[Tuple[int, int]],
                   sampling_locations, attention_weights):
    """value: [B, sum(H_l*W_l), M, C_v] flattened multi-level value maps;
    sampling_locations: [B, Q, M, L, P, 2] normalized (x, y) in [0, 1];
    attention_weights: [B, Q, M, L, P] (softmaxed over L*P).
    Returns [B, Q, M*C_v].
    """
    b, _, m, cv = value.shape
    _, q, _, nl, np_, _ = sampling_locations.shape
    starts = []
    s = 0
    for (h, w) in spatial_shapes:
        starts.append(s)
        s += h * w

    out = jnp.zeros((b, q, m, cv), jnp.float32)

    def per_map(lvl_hwc, x_qp, y_qp, w_qp):
        samples = bilinear_sample(lvl_hwc, x_qp, y_qp)   # [Q, P, Cv]
        return jnp.sum(samples * w_qp[..., None], axis=-2)  # [Q, Cv]

    sample_maps = jax.vmap(per_map)                      # over B*M

    for li, (h, w) in enumerate(spatial_shapes):
        lvl = jax.lax.dynamic_slice_in_dim(value, starts[li], h * w, axis=1)
        # [B, H*W, M, Cv] -> [B*M, H, W, Cv]
        lvl = lvl.reshape(b, h, w, m, cv).transpose(0, 3, 1, 2, 4)
        lvl = lvl.reshape(b * m, h, w, cv)
        loc = sampling_locations[:, :, :, li]            # [B,Q,M,P,2]
        x = (loc[..., 0] * w).transpose(0, 2, 1, 3).reshape(b * m, q, np_)
        y = (loc[..., 1] * h).transpose(0, 2, 1, 3).reshape(b * m, q, np_)
        wgt = attention_weights[:, :, :, li].transpose(0, 2, 1, 3)
        wgt = wgt.reshape(b * m, q, np_)
        contrib = sample_maps(lvl, x, y, wgt)            # [B*M, Q, Cv]
        out = out + contrib.reshape(b, m, q, cv).transpose(0, 2, 1, 3)
    return out.reshape(b, q, m * cv)
