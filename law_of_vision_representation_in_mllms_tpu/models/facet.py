"""ViT facet descriptors — the GeoAware-SC `ViTExtractor` equivalent.

The reference (`C_score/model_utils/extractor_dino.py:13-356`) extracts
"facets" (query / key / value / token) from one transformer block via torch
forward hooks, optionally log-binned into multi-scale descriptors.  Here the
same facets come out of `ViTEncoder` functionally: q/k/v are `sow`n into the
Flax `intermediates` collection by the selected block
(`models/vit.py ViTBlock`), and the token facet is simply that block's
output — no hooks, no mutation, one traced graph.

Descriptor layout parity (`extractor_dino.py:316-341 extract_descriptors`):
facet tensors Bxhxtxd are permuted to Bxtxdxh and flattened so the
descriptor channel ordering is d-major over heads; the CLS token is dropped
unless `include_cls`.  Log-binning (`_log_bin`, :268-314) is reproduced with
`lax.reduce_window` average pools (count_include_pad=False semantics) and
clamped-index shifts — fully vectorised instead of the reference's
per-pixel Python loop.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .vit import ViTConfig, ViTEncoder

FACETS = ("query", "key", "value", "token")


def attention_maps(encoder: ViTEncoder, variables: Dict, pixel_values,
                   *, layer: int) -> jnp.ndarray:
    """The 'attn' facet: softmax attention probs [B, h, t, t] of one block
    (`extractor_dino.py:233-234` attn_drop hook)."""
    _, inter = encoder.apply(variables, pixel_values, num_blocks=layer + 1,
                             sow_facets_layer=layer, sow_facets_mode="attn",
                             mutable=["intermediates"])
    return inter["intermediates"][f"block_{layer}"]["facet_attn"][0]


def cls_scores_from_qk(q, k, head_dim: int) -> jnp.ndarray:
    """CLS->patch attention [B, S-1] from sown q/k projections [B, S, H, Dh]
    — one CLS-row softmax (O(S) memory, not the O(S^2) full attn facet),
    mean over heads, CLS column dropped."""
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    logits = jnp.einsum("bhd,bkhd->bhk", q[:, 0], k)
    logits = logits / jnp.sqrt(jnp.float32(head_dim))
    probs = jax.nn.softmax(logits, axis=-1)          # [B, H, S]
    return probs.mean(axis=1)[:, 1:]


def cls_attention_scores(encoder: ViTEncoder, variables: Dict, pixel_values,
                         *, layer: int) -> jnp.ndarray:
    """CLS->patch attention [B, t-1] of one block. The visual-token pruning
    score (`llava.encode_images` prune_score='saliency')."""
    cfg = encoder.cfg
    if not cfg.use_class_token:
        raise ValueError("cls attention scores need a CLS token")
    _, inter = encoder.apply(variables, pixel_values, num_blocks=layer + 1,
                             sow_facets_layer=layer,
                             mutable=["intermediates"])
    blk = inter["intermediates"][f"block_{layer}"]
    return cls_scores_from_qk(blk["facet_q"][0], blk["facet_k"][0],
                              cfg.head_dim)


def extract_saliency_maps(encoder: ViTEncoder, variables: Dict, pixel_values,
                          *, layer: int | None = None,
                          head_idxs=(0, 2, 4, 5)) -> jnp.ndarray:
    """CLS->patch attention saliency, min-max normalized to [0, 1] per
    image: [B, t-1] (`extractor_dino.py:342-356`; the reference hardcodes
    dino_vits8's last layer + heads [0,2,4,5] — both are knobs here)."""
    cfg = encoder.cfg
    if not cfg.use_class_token:
        raise ValueError("saliency maps need a CLS token")
    if any(h >= cfg.num_heads for h in head_idxs):
        raise ValueError(f"head_idxs {tuple(head_idxs)} out of range for "
                         f"{cfg.num_heads} heads")
    if layer is None:
        layer = cfg.num_layers - 1
    probs = attention_maps(encoder, variables, pixel_values, layer=layer)
    sal = probs[:, jnp.asarray(head_idxs), 0, 1:].mean(axis=1)   # [B, t-1]
    lo = sal.min(axis=1, keepdims=True)
    hi = sal.max(axis=1, keepdims=True)
    return (sal - lo) / (hi - lo)


def facet_descriptors(encoder: ViTEncoder, variables: Dict, pixel_values,
                      *, layer: int, facet: str = "token",
                      log_bin: bool = False,
                      include_cls: bool = False) -> jnp.ndarray:
    """Extract per-patch descriptors from one block. Returns [B, 1, t, d'].

    `layer` indexes blocks (0-based, like the reference's `layer=11` for
    ViT-B); `facet='token'` reads the block output, q/k/v read the
    pre-attention projections of that block.
    """
    if facet not in FACETS:
        raise ValueError(f"facet must be one of {FACETS}, got {facet!r}")
    cfg = encoder.cfg
    if facet == "token":
        _, hidden = encoder.apply(variables, pixel_values,
                                  num_blocks=layer + 1,
                                  output_hidden_states=True)
        x = hidden[layer + 1][:, None]                    # [B, 1, t, D]
    else:
        _, inter = encoder.apply(variables, pixel_values,
                                 num_blocks=layer + 1,
                                 sow_facets_layer=layer,
                                 mutable=["intermediates"])
        fac = inter["intermediates"][f"block_{layer}"][f"facet_{facet[0]}"]
        x = fac[0].transpose(0, 2, 1, 3)                  # [B, h, t, dh]

    if cfg.use_class_token and not include_cls:
        x = x[:, :, 1:]
    b, h, t, d = x.shape
    if log_bin:
        if include_cls:
            raise ValueError("log_bin with include_cls is unsupported "
                             "(matches extractor_dino.py:333-334)")
        return _log_bin(x, grid_hw=_grid_hw(cfg, pixel_values.shape))
    # Bxhxtxd -> Bxtxdxh -> Bx1xtx(d*h): d-major channel order
    return x.transpose(0, 2, 3, 1).reshape(b, t, d * h)[:, None]


def _grid_hw(cfg: ViTConfig, img_shape) -> Tuple[int, int]:
    p, st = cfg.patch_size, cfg.stride_
    return (1 + (img_shape[1] - p) // st, 1 + (img_shape[2] - p) // st)


def _avg_pool_cic(x, win: int):
    """Average pool, stride 1, pad win//2, count_include_pad=False.

    x: [B, gh, gw, C]. Matches `torch.nn.AvgPool2d(win, 1, win//2,
    count_include_pad=False)` (`extractor_dino.py:283-287`).
    """
    if win == 1:
        return x
    pad = win // 2
    dims = (1, win, win, 1)
    pads = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    total = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, (1, 1, 1, 1),
                                  pads)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    count = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims,
                                  (1, 1, 1, 1), pads)
    return total / count


def _log_bin(x, grid_hw: Tuple[int, int], hierarchy: int = 2) -> jnp.ndarray:
    """Log-binned descriptor (`extractor_dino.py:268-314`).

    x: [B, h, t, d] facet tensor (CLS already dropped). For each location,
    concatenates 1 + 8*hierarchy bins: the 3x3 neighbourhood of win-3^k
    average-pooled maps at offsets that grow geometrically, edge-clamped.
    Returns [B, 1, t, d*h*(1+8*hierarchy)].
    """
    b, h, t, d = x.shape
    gh, gw = grid_hw
    fmap = x.transpose(0, 2, 3, 1).reshape(b, gh, gw, d * h)
    parts = []
    for k in range(hierarchy):
        win = 3 ** k
        pooled = _avg_pool_cic(fmap, win)
        for dy in (-win, 0, win):
            for dx in (-win, 0, win):
                if k != 0 and dy == 0 and dx == 0:
                    continue
                iy = jnp.clip(jnp.arange(gh) + dy, 0, gh - 1)
                ix = jnp.clip(jnp.arange(gw) + dx, 0, gw - 1)
                parts.append(pooled[:, iy][:, :, ix])
    out = jnp.concatenate(parts, axis=-1)
    return out.reshape(b, t, -1)[:, None]
