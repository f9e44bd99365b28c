"""SAM (Segment Anything) box-prompted segmentation, TPU-first.

Closes the last reference capability with no in-repo equivalent
(VERDICT r2 #9): `C_score/preprocess_mask_sam.py:1-78` creates the
GeoAware-SC foreground masks by running a SamPredictor with ONE box
prompt per image (`predictor.predict(box=..., multimask_output=False)`).
That needs exactly three pieces — the ViT image encoder, the box prompt
encoder, and the two-way mask decoder — not the automatic mask generator,
so that is what this module implements.

Behavior parity is against HF's `transformers.SamModel` (the weight
source `lvr port-sam` consumes; golden-tested on tiny configs in
tests/test_sam.py). TPU-first choices:

- functional params-dict style (like models/llama.py): one jittable
  `segment` covers encode+decode; everything static-shape,
- patch embedding as unfold+matmul (no conv lowering, same as vit.py),
- window partition/unpartition as pure reshape/transpose with static
  padding (`modeling_sam.py` SamVisionLayer.window_partition),
- decomposed relative-position bias via static gather tables
  (`modeling_sam.py` SamVisionAttention.get_decomposed_rel_pos),
- fp32 softmax, bf16-able matmuls via the shared Precision policy.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.precision import Precision, FP32_PRECISION


@dataclasses.dataclass(frozen=True)
class SamVisionCfg:
    image_size: int = 1024
    patch_size: int = 16
    hidden_size: int = 768               # vit-b
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    layer_norm_eps: float = 1e-6

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass(frozen=True)
class SamConfig:
    vision: SamVisionCfg = dataclasses.field(default_factory=SamVisionCfg)
    prompt_hidden: int = 256             # == out_chans
    num_pos_feats: int = 128
    decoder_heads: int = 8
    decoder_layers: int = 2
    decoder_mlp_dim: int = 2048
    iou_head_hidden: int = 256
    iou_head_depth: int = 3
    num_multimask_outputs: int = 3
    # the coordinate frame boxes are given in (SamPredictor input size)
    input_image_size: int = 1024

    @property
    def embed_size(self) -> int:
        return self.vision.grid                     # 64 for vit-b/1024


def sam_vit_b() -> SamConfig:
    return SamConfig()


def sam_vit_h() -> SamConfig:
    return SamConfig(vision=SamVisionCfg(
        hidden_size=1280, num_layers=32, num_heads=16, mlp_dim=5120,
        global_attn_indexes=(7, 15, 23, 31)))


def sam_vit_l() -> SamConfig:
    return SamConfig(vision=SamVisionCfg(
        hidden_size=1024, num_layers=24, num_heads=16, mlp_dim=4096,
        global_attn_indexes=(5, 11, 17, 23)))


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _ln(x, p, eps):
    m = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    v = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
    h = (x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + eps)
    return (h * p["w"] + p["b"]).astype(x.dtype)


def _linear(x, p):
    y = x @ p["w"].astype(x.dtype)
    return y + p["b"].astype(x.dtype) if "b" in p else y


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _rel_pos_table(rel_pos: jnp.ndarray, size: int) -> jnp.ndarray:
    """get_rel_pos for the q_size == k_size case (`modeling_sam.py`
    SamVisionAttention.get_rel_pos): resize the (L, head_dim) table to
    2*size-1 rows (linear, half-pixel — matches torch F.interpolate
    'linear'), then gather [q - k + size - 1] -> [size, size, head_dim].
    The gather table is STATIC (numpy), so XLA sees a constant gather."""
    max_rel = 2 * size - 1
    if rel_pos.shape[0] != max_rel:
        rel_pos = jax.image.resize(rel_pos, (max_rel, rel_pos.shape[1]),
                                   method="linear")
    q = np.arange(size)[:, None]
    k = np.arange(size)[None, :]
    idx = (q - k) + size - 1                       # [size, size]
    return rel_pos[jnp.asarray(idx)]               # [size, size, head_dim]


def _window_attention(x, p, cfg: SamVisionCfg, side: int,
                      precision: Precision):
    """Attention over a [B', side, side, C] block (a window or the whole
    grid) with decomposed rel-pos bias."""
    b, h, w, c = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    qkv = _linear(x.reshape(b, h * w, c), p["qkv"])
    qkv = qkv.reshape(b, h * w, 3, nh, hd)
    q, k, v = (qkv[:, :, i] for i in range(3))     # [B, HW, nh, hd]
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * jnp.float32(hd ** -0.5)

    rh = _rel_pos_table(p["rel_pos_h"], h)         # [h, h, hd]
    rw = _rel_pos_table(p["rel_pos_w"], w)
    qg = q.reshape(b, h, w, nh, hd)
    rel_h = jnp.einsum("bhwnc,hkc->bnhwk", qg, rh.astype(qg.dtype),
                       preferred_element_type=jnp.float32)
    rel_w = jnp.einsum("bhwnc,wkc->bnhwk", qg, rw.astype(qg.dtype),
                       preferred_element_type=jnp.float32)
    bias = rel_h[..., :, None] + rel_w[..., None, :]     # [B,nh,h,w,h,w]
    logits = logits + bias.reshape(b, nh, h * w, h * w)

    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bnqk,bknd->bqnd", probs, v,
                     preferred_element_type=precision.accum_dtype)
    out = out.astype(x.dtype).reshape(b, h * w, nh * hd)
    return _linear(out, p["proj"]).reshape(b, h, w, c)


def _vision_layer(x, p, cfg: SamVisionCfg, window: int,
                  precision: Precision):
    """One SamVisionLayer: windowed (or global) rel-pos attention + MLP."""
    b, h, w, c = x.shape
    res = x
    x = _ln(x, p["ln1"], cfg.layer_norm_eps)
    if window > 0:
        pad_h = (window - h % window) % window
        pad_w = (window - w % window) % window
        xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        ph, pw = h + pad_h, w + pad_w
        xp = xp.reshape(b, ph // window, window, pw // window, window, c)
        xp = jnp.transpose(xp, (0, 1, 3, 2, 4, 5)).reshape(
            -1, window, window, c)
        xp = _window_attention(xp, p["attn"], cfg, window, precision)
        xp = xp.reshape(b, ph // window, pw // window, window, window, c)
        xp = jnp.transpose(xp, (0, 1, 3, 2, 4, 5)).reshape(b, ph, pw, c)
        x = xp[:, :h, :w]
    else:
        x = _window_attention(x, p["attn"], cfg, h, precision)
    x = res + x
    h2 = _ln(x, p["ln2"], cfg.layer_norm_eps)
    h2 = _linear(h2, p["mlp1"])
    h2 = _gelu(h2)
    h2 = _linear(h2, p["mlp2"])
    return x + h2


def encode_image(params: Dict[str, Any], cfg: SamConfig, pixel_values,
                 precision: Precision = FP32_PRECISION):
    """pixel_values [B, S, S, 3] (normalized) -> [B, G, G, out_chans].

    `modeling_sam.py` SamVisionEncoder: conv-strided patch embed
    (expressed as unfold+matmul), + absolute pos embed, 12/24/32 layers
    (windowed except global_attn_indexes), then the 2-conv neck with
    channel LayerNorms."""
    v = cfg.vision
    vp = params["vision"]
    b, s, _, _ = pixel_values.shape
    g = s // v.patch_size
    x = pixel_values.astype(precision.compute_dtype)
    x = x.reshape(b, g, v.patch_size, g, v.patch_size, 3)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        b, g, g, v.patch_size * v.patch_size * 3)
    x = x @ vp["patch_w"].astype(x.dtype) + vp["patch_b"].astype(x.dtype)
    x = x + vp["pos_embed"].astype(x.dtype)

    for i, lp in enumerate(vp["layers"]):
        window = 0 if i in v.global_attn_indexes else v.window_size
        x = _vision_layer(x, lp, v, window, precision)

    # neck: 1x1 conv (matmul) -> LN -> 3x3 conv -> LN, channels kept last
    x = x @ vp["neck_conv1"].astype(x.dtype)
    x = _ln(x, vp["neck_ln1"], 1e-6)
    x = jax.lax.conv_general_dilated(
        x, vp["neck_conv2"].astype(x.dtype), window_strides=(1, 1),
        padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=precision.accum_dtype).astype(x.dtype)
    x = _ln(x, vp["neck_ln2"], 1e-6)
    return x


# ---------------------------------------------------------------------------
# prompt encoder + mask decoder
# ---------------------------------------------------------------------------

def _fourier_pe(params, coords):
    """SamPositionalEmbedding: coords in [0,1] -> [..., 2*num_pos_feats]."""
    pe = params["pe"]                               # [2, num_pos_feats]
    c = (2.0 * coords - 1.0).astype(jnp.float32) @ pe
    c = 2.0 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def image_wide_pe(params: Dict[str, Any], cfg: SamConfig):
    """SamModel.get_image_wide_positional_embeddings, channels-LAST:
    [1, G, G, C]."""
    size = cfg.embed_size
    grid = np.ones((size, size), np.float32)
    y = (grid.cumsum(axis=0) - 0.5) / size
    x = (grid.cumsum(axis=1) - 0.5) / size
    coords = jnp.asarray(np.stack([x, y], axis=-1))
    return _fourier_pe(params, coords)[None]


def embed_boxes(params: Dict[str, Any], cfg: SamConfig, boxes):
    """SamPromptEncoder._embed_boxes: boxes [B, NB, 4] (x0,y0,x1,y1 in the
    `input_image_size` frame) -> sparse embeddings [B, NB, 2, C]."""
    pp = params["prompt"]
    b, nb, _ = boxes.shape
    pts = (boxes + 0.5).reshape(b, nb, 2, 2) / cfg.input_image_size
    emb = _fourier_pe(params, pts)
    corner = jnp.stack([pp["point_embed"][2], pp["point_embed"][3]])
    return emb + corner[None, None]


def decode_masks(params: Dict[str, Any], cfg: SamConfig, image_embeddings,
                 sparse_embeddings, multimask_output: bool = False,
                 precision: Precision = FP32_PRECISION):
    """SamMaskDecoder.forward for the box-prompt path (dense prompt =
    no_mask embedding). image_embeddings [B, G, G, C] channels-last.
    Returns (low-res mask logits [B, NB, n_out, 4G, 4G], iou [B, NB, n_out]).
    """
    dp = params["decoder"]
    pp = params["prompt"]
    b, g, _, c = image_embeddings.shape
    nb = sparse_embeddings.shape[1]
    n_mask_tokens = cfg.num_multimask_outputs + 1

    out_tokens = jnp.concatenate([dp["iou_token"][None],
                                  dp["mask_tokens"]], axis=0)
    out_tokens = jnp.broadcast_to(out_tokens[None, None],
                                  (b, nb, n_mask_tokens + 1, c))
    tokens = jnp.concatenate(
        [out_tokens, sparse_embeddings.astype(out_tokens.dtype)], axis=2)

    dense = pp["no_mask"][None, None, None, :]
    img = image_embeddings + dense.astype(image_embeddings.dtype)
    img = jnp.repeat(img, nb, axis=0).reshape(b * nb, g * g, c)
    img_pe = image_wide_pe(params, cfg).reshape(1, g * g, c)
    img_pe = jnp.broadcast_to(img_pe, (b * nb, g * g, c))

    queries = tokens.reshape(b * nb, -1, c).astype(jnp.float32)
    keys = img.astype(jnp.float32)

    def attn(p, q, k, v, heads):
        qh = _linear(q, p["q"])
        kh = _linear(k, p["k"])
        vh = _linear(v, p["v"])
        d = qh.shape[-1] // heads
        def split(t):
            return jnp.transpose(t.reshape(t.shape[0], -1, heads, d),
                                 (0, 2, 1, 3))
        o = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", split(qh), split(kh))
            / jnp.sqrt(jnp.float32(d)), axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", o, split(vh))
        o = jnp.transpose(o, (0, 2, 1, 3)).reshape(q.shape[0], -1,
                                                   heads * d)
        return _linear(o, p["out"])

    point_pe = queries
    for i, lp in enumerate(dp["layers"]):
        if i == 0:
            # skip_first_layer_pe: the self-attn output REPLACES the
            # queries (no residual) — `modeling_sam.py`
            # SamTwoWayAttentionBlock.forward
            queries = attn(lp["self_attn"], queries, queries, queries,
                           cfg.decoder_heads)
        else:
            q = queries + point_pe
            queries = queries + attn(lp["self_attn"], q, q, queries,
                                     cfg.decoder_heads)
        queries = _ln(queries, lp["ln1"], 1e-6)

        q = queries + point_pe
        k = keys + img_pe
        queries = queries + attn(lp["t2i"], q, k, keys, cfg.decoder_heads)
        queries = _ln(queries, lp["ln2"], 1e-6)

        h2 = _linear(queries, lp["mlp1"])
        h2 = jax.nn.relu(h2)
        queries = queries + _linear(h2, lp["mlp2"])
        queries = _ln(queries, lp["ln3"], 1e-6)

        q = queries + point_pe
        k = keys + img_pe
        keys = keys + attn(lp["i2t"], k, q, queries, cfg.decoder_heads)
        keys = _ln(keys, lp["ln4"], 1e-6)

    q = queries + point_pe
    k = keys + img_pe
    queries = queries + attn(dp["final_t2i"], q, k, keys,
                             cfg.decoder_heads)
    queries = _ln(queries, dp["final_ln"], 1e-6)

    iou_tok = queries[:, 0]
    mask_toks = queries[:, 1:1 + n_mask_tokens]

    # upscale image embeddings 4x with two stride-2 transposed convs
    src = keys.reshape(b * nb, g, g, c)
    up = jax.lax.conv_transpose(
        src, dp["up1_w"].astype(src.dtype), strides=(2, 2),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True) + dp["up1_b"]
    up = _ln(up, dp["up_ln"], 1e-6)
    up = _gelu(up)
    up = jax.lax.conv_transpose(
        up, dp["up2_w"].astype(up.dtype), strides=(2, 2),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True) + dp["up2_b"]
    up = _gelu(up)                                  # [B*NB, 4G, 4G, C/8]

    def ffw(p, x, depth):
        x = jax.nn.relu(_linear(x, p["in"]))
        for lw in p["mid"]:
            x = jax.nn.relu(_linear(x, lw))
        return _linear(x, p["out"])

    hyper = jnp.stack(
        [ffw(dp["hyper"][i], mask_toks[:, i], 3)
         for i in range(n_mask_tokens)], axis=1)    # [B*NB, n_mask, C/8]
    up_flat = up.reshape(b * nb, (4 * g) * (4 * g), -1)
    masks = jnp.einsum("bmc,bpc->bmp", hyper, up_flat)
    masks = masks.reshape(b, nb, n_mask_tokens, 4 * g, 4 * g)
    iou = ffw(dp["iou_head"], iou_tok, cfg.iou_head_depth)
    iou = iou.reshape(b, nb, n_mask_tokens)

    sl = slice(1, None) if multimask_output else slice(0, 1)
    return masks[:, :, sl], iou[:, :, sl]


def segment(params: Dict[str, Any], cfg: SamConfig, pixel_values, boxes,
            multimask_output: bool = False,
            precision: Precision = FP32_PRECISION):
    """End-to-end: normalized pixels + boxes -> (low-res mask logits, iou).
    The jittable unit `lvr sam-masks` runs per batch."""
    emb = encode_image(params, cfg, pixel_values, precision)
    sparse = embed_boxes(params, cfg, boxes)
    return decode_masks(params, cfg, emb, sparse, multimask_output,
                        precision)


def postprocess_mask(low_res_logits, input_hw: Tuple[int, int],
                     original_hw: Tuple[int, int], image_size: int = 1024):
    """SamPredictor-style upscale: low-res logits [h, w] -> boolean mask at
    `original_hw`. input_hw = the pre-padding size inside the
    image_size x image_size model frame."""
    m = jax.image.resize(low_res_logits, (image_size, image_size),
                         method="bilinear")
    m = m[:input_hw[0], :input_hw[1]]
    m = jax.image.resize(m, original_hw, method="bilinear")
    return m > 0.0
