"""One parameterized ViT covering the whole non-diffusion tower zoo.

The reference keeps four near-identical tower wrappers around HF models
(`llava/model/multimodal_encoder/{clip,dinov2,siglip}_encoder.py`); here a
single Flax module expresses all of them via `ViTConfig`:

- CLIP-L/14 @224 & @336 (`openai/clip-vit-large-patch14[-336]`): class token,
  pre-embedding LayerNorm, quick-GELU, patch conv without bias.
- OpenCLIP-L/14 (`laion/CLIP-ViT-L-14-laion2B-s32B-b82K`): same, exact GELU.
- SigLIP-B/16 @224 (`google/siglip-base-patch16-224`): no class token, biased
  patch conv, tanh-GELU.
- DINOv2-L/14 (`facebook/dinov2-large`): class token, LayerScale, exact GELU;
  position embeddings are interpolated to the configured resolution at weight
  *port* time (torch bicubic+antialias, matching HF runtime interpolation)
  so the TPU graph stays static-shape.

TPU-first choices:
- patch embedding is an unfold + matmul (identical math to a stride=p conv,
  but lands directly on the MXU with no conv lowering),
- `feature_layer` compiles only the layers actually needed — the reference
  runs all 24 layers then indexes `hidden_states[-2]`
  (`clip_encoder.py:29-36`), wasting the final block,
- fp32 LayerNorm statistics + softmax with bf16 matmuls.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.precision import Precision, DEFAULT_PRECISION
from ..ops.activations import ACT2FN
from ..ops.attention import mha


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    use_class_token: bool = True
    use_pre_layernorm: bool = True
    patch_bias: bool = False
    use_layerscale: bool = False
    num_channels: int = 3
    # "auto": Pallas flash attention on TPU, XLA attention elsewhere
    attn_impl: str = "auto"
    # Patch-embedding stride. None -> patch_size (standard non-overlapping
    # tiling). A smaller stride extracts overlapping patches for a denser
    # descriptor grid — the GeoAware-SC ViTExtractor's
    # `patch_vit_resolution` trick (`C_score/model_utils/extractor_dino.py`
    # :101-137), expressed as a static config instead of monkey-patching.
    stride: int | None = None

    @property
    def stride_(self) -> int:
        return self.patch_size if self.stride is None else self.stride

    @property
    def grid(self) -> int:
        # 1 + (S - p) // stride == S // p for the standard stride == p case.
        return 1 + (self.image_size - self.patch_size) // self.stride_

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def seq_len(self) -> int:
        return self.num_patches + (1 if self.use_class_token else 0)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    def resolve_layer(self, select_layer: int) -> int:
        """Map an HF-style hidden_states index (e.g. -2) to a layer count.

        HF's hidden_states tuple has num_layers+1 entries (embeddings output
        plus one per block); `resolve_layer(-2) == num_layers - 1` means "run
        num_layers-1 blocks".
        """
        return select_layer % (self.num_layers + 1)


# ---------------------------------------------------------------------------
# Presets for the representations studied in the paper (README.md:66-80).
# ---------------------------------------------------------------------------

def clip_l14(image_size: int = 224, act: str = "quick_gelu") -> ViTConfig:
    return ViTConfig(image_size=image_size, patch_size=14, hidden_size=1024,
                     num_layers=24, num_heads=16, intermediate_size=4096,
                     hidden_act=act, layer_norm_eps=1e-5,
                     use_class_token=True, use_pre_layernorm=True,
                     patch_bias=False)


def siglip_b16(image_size: int = 224) -> ViTConfig:
    return ViTConfig(image_size=image_size, patch_size=16, hidden_size=768,
                     num_layers=12, num_heads=12, intermediate_size=3072,
                     hidden_act="gelu_tanh", layer_norm_eps=1e-6,
                     use_class_token=False, use_pre_layernorm=False,
                     patch_bias=True)


def dinov2_large(image_size: int = 224) -> ViTConfig:
    # use_layerscale=False: LayerScale is FOLDED into the o/fc2 weights
    # at port time (io/hf_port.port_dinov2 — exact, (Wx+b)*l == (W*l)x
    # + b*l), removing two elementwise passes per block. Flip to True to
    # keep explicit lambda params (pre-round-4 checkpoints).
    return ViTConfig(image_size=image_size, patch_size=14, hidden_size=1024,
                     num_layers=24, num_heads=16, intermediate_size=4096,
                     hidden_act="gelu", layer_norm_eps=1e-6,
                     use_class_token=True, use_pre_layernorm=False,
                     patch_bias=True, use_layerscale=False)


def dinov2_base(image_size: int = 224, stride: int | None = None) -> ViTConfig:
    """facebook/dinov2-base — the GeoAware-SC descriptor backbone
    (`C_score/pose_awareness_test.py:56-60` model_dict['base'])."""
    return ViTConfig(image_size=image_size, patch_size=14, hidden_size=768,
                     num_layers=12, num_heads=12, intermediate_size=3072,
                     hidden_act="gelu", layer_norm_eps=1e-6,
                     use_class_token=True, use_pre_layernorm=False,
                     patch_bias=True, use_layerscale=False, stride=stride)


def tiny_vit(image_size: int = 28) -> ViTConfig:
    """Debug/smoke-run tower (also used by CLI tests)."""
    return ViTConfig(image_size=image_size, patch_size=7, hidden_size=32,
                     num_layers=2, num_heads=4, intermediate_size=64)


VIT_PRESETS = {
    "debug/tiny-vit": lambda: tiny_vit(),
    "debug/tiny-vit-112": lambda: tiny_vit(112),   # grid 16 (geoware tests)
    "openai/clip-vit-large-patch14": lambda: clip_l14(224),
    "openai/clip-vit-large-patch14-336": lambda: clip_l14(336),
    "laion/CLIP-ViT-L-14-laion2B-s32B-b82K": lambda: clip_l14(224, act="gelu"),
    "google/siglip-base-patch16-224": lambda: siglip_b16(224),
    "facebook/dinov2-large": lambda: dinov2_large(224),
    "facebook/dinov2-large-336": lambda: dinov2_large(336),
    "facebook/dinov2-base": lambda: dinov2_base(224),
    # GeoAware-SC descriptor resolution: 840px / patch 14 -> 60x60 grid
    # (`C_score/pose_awareness_test.py:66-68` img_size = 840 if DINOV2).
    "facebook/dinov2-base-840": lambda: dinov2_base(840),
}


class _LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics, output cast to compute dtype."""
    eps: float
    precision: Precision

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32,
                         param_dtype=self.precision.param_dtype,
                         name="ln")(x.astype(jnp.float32))
        return y.astype(self.precision.compute_dtype)


class ViTBlock(nn.Module):
    cfg: ViTConfig
    precision: Precision
    causal: bool = False   # reused by the CLIP *text* encoders

    @nn.compact
    def __call__(self, x, sow_facets=False):
        # sow_facets: False | "qkv" (projections only) | "attn" (adds the
        # full S x S softmax probs — memory-heavy, only for the attn facet)
        # | True (both, back-compat)
        cfg, prec = self.cfg, self.precision
        dense = lambda name: nn.Dense(  # noqa: E731
            cfg.hidden_size, dtype=prec.compute_dtype,
            param_dtype=prec.param_dtype, name=name)

        h = _LayerNorm(cfg.layer_norm_eps, prec, name="ln1")(x)
        b, s, _ = h.shape
        # separate q/k/v matmuls measure FASTER than a fused [D,3D] qkv on
        # v5e (249 vs 236 img/s on CLIP-L-336): XLA fuses each projection
        # into its consumer's layout, which the post-split copies break
        q = dense("q")(h).reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = dense("k")(h).reshape(b, s, cfg.num_heads, cfg.head_dim)
        v = dense("v")(h).reshape(b, s, cfg.num_heads, cfg.head_dim)
        if sow_facets:
            # The GeoAware-SC ViTExtractor's q/k/v/attn facet hooks
            # (`extractor_dino.py:198-236`), expressed functionally via
            # Flax's collection mechanism instead of torch forward hooks.
            # q/k/v: [B, S, H, Dh]; attn: softmax probs [B, H, S, S]
            # (the attn_drop hook output). cls handling is the reader's job.
            self.sow("intermediates", "facet_q", q)
            self.sow("intermediates", "facet_k", k)
            self.sow("intermediates", "facet_v", v)
            if sow_facets in (True, "attn"):
                logits = jnp.einsum("bqhd,bkhd->bhqk",
                                    q.astype(jnp.float32),
                                    k.astype(jnp.float32))
                logits = logits / jnp.sqrt(jnp.float32(cfg.head_dim))
                self.sow("intermediates", "facet_attn",
                         jax.nn.softmax(logits, axis=-1))
        impl = cfg.attn_impl
        if impl == "auto":
            # measured on v5e (round 2): XLA attention with bf16 logits +
            # softmax (accum_dtype=bf16, BF16_TOWER_PRECISION) is the
            # fastest ViT config (276 img/s CLIP-336) — the Pallas
            # encoder kernel (ops/encoder_attention.py) only ties XLA
            # (Mosaic runs the D=64 batched dots at ~19 TFLOP/s), and
            # flash loses outright at S<=729
            impl = "xla"
        if impl == "flash":
            from ..ops.flash_attention import flash_mha
            attn = flash_mha(q, k, v, causal=self.causal)
        elif impl == "encoder" and not self.causal:
            from ..ops.encoder_attention import encoder_mha
            attn = encoder_mha(q, k, v)
        elif impl == "tpu_flash" and not self.causal:
            # jax library TPU flash kernel (pallas ops): [B,H,S,D] layout,
            # S padded to a 128-multiple with segment-id masking of the
            # padded KV columns; padded Q rows are sliced off after.
            # MEASURED (v5e, CLIP-L-336 b64): 121 img/s vs 246 XLA — the
            # library kernel hits the same Mosaic D=64 dot ceiling as our
            # encoder kernel (benchmarks/README). Kept opt-in for
            # longer-sequence/larger-head configs where flash wins.
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention, SegmentIds)
            s_p = -(-s // 128) * 128
            pad = [(0, 0), (0, s_p - s), (0, 0), (0, 0)]
            qt = jnp.transpose(jnp.pad(q, pad), (0, 2, 1, 3))
            kt = jnp.transpose(jnp.pad(k, pad), (0, 2, 1, 3))
            vt = jnp.transpose(jnp.pad(v, pad), (0, 2, 1, 3))
            seg = (jnp.arange(s_p) < s).astype(jnp.int32)[None]
            seg = jnp.broadcast_to(seg, (b, s_p))
            out = flash_attention(qt, kt, vt,
                                  segment_ids=SegmentIds(q=seg, kv=seg),
                                  causal=False,
                                  sm_scale=cfg.head_dim ** -0.5)
            attn = jnp.transpose(out, (0, 2, 1, 3))[:, :s]
        elif impl.startswith("encoder2") and not self.causal:
            # round-3 per-head 2D-dot kernel; "encoder2", "encoder2_nt"
            # (no K pre-transpose), "encoder2_pad" (D zero-padded to 128),
            # "_hbN" (N heads per program, sequential dots)
            import re as _re
            from ..ops.encoder_attention import encoder_mha_v2
            hb = _re.search(r"_hb(\d+)", impl)
            attn = encoder_mha_v2(
                q, k, v,
                pretransposed="_nt" not in impl,
                pad_d=128 if "_pad" in impl else None,
                head_block=int(hb.group(1)) if hb else 1)
        elif impl == "xla_post" and not self.causal:
            from ..ops.attention import mha_post
            attn = mha_post(q, k, v, accum_dtype=prec.accum_dtype)
        elif impl == "xla_expclamp" and not self.causal:
            # no-max softmax (311 vs 278 img/s CLIP-336, round 3);
            # exact while attention logits stay under the 85 clamp —
            # see ops.attention.mha_expnomax for the safety analysis
            from ..ops.attention import mha_expnomax
            attn = mha_expnomax(q, k, v, accum_dtype=prec.accum_dtype)
        elif impl == "xla_expclamp_fused" and not self.causal:
            # expclamp + denominator fused into the P·V dot (ones column
            # on V): exp'd logits are read once, not twice — the fastest
            # measured CLIP-336 path (370.6 img/s, +33% over exact XLA)
            from ..ops.attention import mha_expnomax_fused
            attn = mha_expnomax_fused(q, k, v,
                                      accum_dtype=prec.accum_dtype)
        elif impl == "xla_blocked" and not self.causal:
            from ..ops.attention import mha_blocked
            attn = mha_blocked(q, k, v, accum_dtype=prec.accum_dtype)
        else:
            mask = None
            if self.causal:
                from ..ops.attention import causal_mask
                mask = causal_mask(s, s)[None, None]
            attn = mha(q, k, v, mask=mask, accum_dtype=prec.accum_dtype)
        attn = dense("o")(attn.reshape(b, s, cfg.hidden_size))
        if cfg.use_layerscale:
            ls1 = self.param("ls1", nn.initializers.ones,
                             (cfg.hidden_size,), prec.param_dtype)
            attn = attn * ls1.astype(attn.dtype)
        x = x + attn

        h = _LayerNorm(cfg.layer_norm_eps, prec, name="ln2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=prec.compute_dtype,
                     param_dtype=prec.param_dtype, name="fc1")(h)
        h = ACT2FN[cfg.hidden_act](h)
        h = dense("fc2")(h)
        if cfg.use_layerscale:
            ls2 = self.param("ls2", nn.initializers.ones,
                             (cfg.hidden_size,), prec.param_dtype)
            h = h * ls2.astype(h.dtype)
        return x + h


class ViTEncoder(nn.Module):
    """Vision transformer trunk.

    `__call__(pixel_values)` takes NHWC images already preprocessed to the
    tower's normalization, and returns the requested hidden state.
    """
    cfg: ViTConfig
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, pixel_values, *, num_blocks: int | None = None,
                 output_hidden_states: bool = False,
                 sow_facets_layer: int | None = None,
                 sow_facets_mode="qkv") -> Any:
        cfg, prec = self.cfg, self.precision
        b, h, w, c = pixel_values.shape
        p, st = cfg.patch_size, cfg.stride_
        gh = 1 + (h - p) // st
        gw = 1 + (w - p) // st

        # Patch embedding as unfold + matmul (MXU-friendly).
        x = pixel_values.astype(prec.compute_dtype)
        if st == p:
            x = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        else:
            # Overlapping patches (stride < patch): strided gathers along H
            # then W. One-time, bandwidth-bound; the matmul below still
            # dominates. Same (gh, gw, p, p, c) layout as the fast path.
            idx_h = jnp.arange(gh)[:, None] * st + jnp.arange(p)[None, :]
            idx_w = jnp.arange(gw)[:, None] * st + jnp.arange(p)[None, :]
            x = x[:, idx_h]                      # [b, gh, p, w, c]
            x = x[:, :, :, idx_w]                # [b, gh, p, gw, p, c]
            x = x.transpose(0, 1, 3, 2, 4, 5)    # [b, gh, gw, p, p, c]
        x = x.reshape(b, gh * gw, p * p * c)
        kernel = self.param("patch_kernel", nn.initializers.lecun_normal(),
                            (p, p, c, cfg.hidden_size), prec.param_dtype)
        x = x @ kernel.reshape(p * p * c, cfg.hidden_size).astype(x.dtype)
        if cfg.patch_bias:
            pb = self.param("patch_bias", nn.initializers.zeros,
                            (cfg.hidden_size,), prec.param_dtype)
            x = x + pb.astype(x.dtype)

        if cfg.use_class_token:
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, cfg.hidden_size), prec.param_dtype)
            cls = jnp.broadcast_to(cls.astype(x.dtype),
                                   (b, 1, cfg.hidden_size))
            x = jnp.concatenate([cls, x], axis=1)

        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.seq_len, cfg.hidden_size), prec.param_dtype)
        x = x + pos.astype(x.dtype)

        if cfg.use_pre_layernorm:
            x = _LayerNorm(cfg.layer_norm_eps, prec, name="pre_ln")(x)

        n = cfg.num_layers if num_blocks is None else num_blocks
        hidden_states = [x]
        for i in range(n):
            x = ViTBlock(cfg, prec, name=f"block_{i}")(
                x, sow_facets=(sow_facets_mode if i == sow_facets_layer
                               else False))
            if output_hidden_states:
                hidden_states.append(x)

        if output_hidden_states:
            return x, hidden_states
        return x


class ViTTower(nn.Module):
    """The LLaVA-facing tower: hidden-layer selection + CLS handling.

    Mirrors `CLIPVisionTower.feature_select` (`clip_encoder.py:29-36`):
    `select_layer` indexes the HF hidden_states tuple (default -2) and
    `select_feature` in {"patch", "cls_patch"} drops or keeps the class token.
    Only the required `num_blocks` are compiled.
    """
    cfg: ViTConfig
    select_layer: int = -2
    select_feature: str = "patch"
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, pixel_values):
        n = self.cfg.resolve_layer(self.select_layer)
        feats = ViTEncoder(self.cfg, self.precision, name="encoder")(
            pixel_values, num_blocks=n)
        if self.select_feature == "patch" and self.cfg.use_class_token:
            feats = feats[:, 1:]
        elif self.select_feature not in ("patch", "cls_patch"):
            raise ValueError(f"bad select_feature {self.select_feature}")
        return feats

    @property
    def hidden_size(self) -> int:
        return self.cfg.hidden_size

    @property
    def num_patches(self) -> int:
        return self.cfg.num_patches


class CLIPVisionPooled(nn.Module):
    """CLIPVisionModelWithProjection: full trunk -> post-LN on CLS ->
    visual_projection. Used by the SD-image-variations featurizer as the
    image-conditioning encoder (`dift_imsd.py:215-221`)."""
    cfg: ViTConfig
    projection_dim: int
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, pixel_values):
        x = ViTEncoder(self.cfg, self.precision, name="encoder")(pixel_values)
        cls = x[:, 0]
        cls = _LayerNorm(self.cfg.layer_norm_eps, self.precision,
                         name="post_ln")(cls)
        proj = self.param("visual_projection", nn.initializers.normal(0.02),
                          (self.cfg.hidden_size, self.projection_dim),
                          self.precision.param_dtype)
        return cls @ proj.astype(cls.dtype)
