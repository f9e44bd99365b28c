"""SD UNet (1.5 / 2.1 / image-variations / XL) with up-block feature harvest.

The diffusion towers never denoise: they run ONE UNet pass at a fixed
timestep and harvest the hidden state after up_block[i]
(`dift_sd.py MyUNet2DConditionModel.forward:9-155`, early exit past the max
index :120-123). TPU-first: only the up blocks actually harvested are built
at all (the reference builds the full UNet and breaks at runtime), shapes are
static, and the whole pass jits into one program.

Config matches diffusers UNet2DConditionModel checkpoints:
- SD1.5/imsd: block_out (320,640,1280,1280), heads 8 (head_dim = C/8),
  cross_attention_dim 768, conv proj, 3x CrossAttnDown + Down.
- SD2.1: same blocks, heads (5,10,20,20) x dim 64, ctx 1024, linear proj,
  upcast attention.
- SDXL: block_out (320,640,1280), Down + 2x CrossAttnDown, transformer
  depths (0,2,10), ctx 2048, linear proj, text_time addition embedding.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.precision import Precision, DEFAULT_PRECISION
from .diffusion_blocks import (Conv, GroupNorm, ResnetBlock, Downsample,
                               Upsample, SpatialTransformer, TimestepEmbedMLP,
                               timestep_embedding)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    # per-block num heads; None entry => block has no attention
    num_heads: Tuple[Optional[int], ...] = (8, 8, 8, None)
    # per-block transformer depth
    transformer_depth: Tuple[int, ...] = (1, 1, 1, 0)
    use_linear_projection: bool = False
    upcast_attention: bool = False
    norm_groups: int = 32
    addition_embed_type: Optional[str] = None     # "text_time" for XL
    addition_time_embed_dim: int = 256
    addition_pooled_dim: int = 1280               # pooled text embed dim
    head_dim_is_fixed: bool = False               # True => head_dim=64 style

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    def heads_and_dim(self, block_channels: int, heads: Optional[int]):
        if heads is None:
            return None, None
        return heads, block_channels // heads


def sd15_unet() -> UNetConfig:
    return UNetConfig()


def sd21_unet() -> UNetConfig:
    return UNetConfig(cross_attention_dim=1024, num_heads=(5, 10, 20, None),
                      use_linear_projection=True, upcast_attention=True)


def sdxl_unet() -> UNetConfig:
    return UNetConfig(block_out_channels=(320, 640, 1280),
                      cross_attention_dim=2048,
                      num_heads=(None, 10, 20),
                      transformer_depth=(0, 2, 10),
                      use_linear_projection=True,
                      addition_embed_type="text_time",
                      addition_pooled_dim=1280)


# mid block always has attention with the last block's head count
def _mid_heads(cfg: UNetConfig):
    for h in reversed(cfg.num_heads):
        if h is not None:
            return h
    return None


TINY_TEST_CONFIG = UNetConfig(
    block_out_channels=(8, 16), layers_per_block=1, cross_attention_dim=16,
    num_heads=(2, None), transformer_depth=(1, 0), norm_groups=4)


class UNetHarvest(nn.Module):
    """One-step UNet forward returning {i: feature NHWC} for up_ft_indices.

    `pre_up_indices` additionally harvests up-block outputs BEFORE their
    upsampler (keys "pre0", "pre1", ...). These are the ODISE
    FeatureExtractorBackbone taps the GeoAware-SC SD extractor reads
    (`C_score/model_utils/extractor_sd.py` block_indices [2,5,8,11] — the
    last res/attn output at each decoder resolution): for SD1.5 at 960px,
    pre0/pre1/pre2 = 1280ch@15, 1280ch@30, 640ch@60 = s5/s4/s3.
    """
    cfg: UNetConfig
    up_ft_indices: Tuple[int, ...] = (0,)
    precision: Precision = DEFAULT_PRECISION
    pre_up_indices: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states,
                 added_cond=None):
        """sample: [B, H, W, C_latent]; timestep: scalar int; context:
        [B, T, ctx_dim]; added_cond (XL): dict(text_embeds [B, pooled],
        time_ids [B, 6])."""
        cfg, prec = self.cfg, self.precision
        cd = prec.compute_dtype
        b = sample.shape[0]
        n_blocks = len(cfg.block_out_channels)
        max_up = max(self.up_ft_indices + self.pre_up_indices)

        # 1. time (+XL additional) embedding
        ts = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32), (b,))
        t_emb = timestep_embedding(ts, cfg.block_out_channels[0])
        emb = TimestepEmbedMLP(cfg.time_embed_dim, prec,
                               name="time_embedding")(t_emb)
        if cfg.addition_embed_type == "text_time" and added_cond is not None:
            # NOTE: the SDXL featurizer path passes added_cond=None — the
            # reference's MyUNet2DConditionModel.forward never computes the
            # addition embedding (`dift_sd.py:9-155` has no added-cond
            # branch), so conditioning is the time embedding alone.
            time_ids = added_cond["time_ids"].astype(jnp.float32)
            tid_emb = timestep_embedding(time_ids.reshape(-1),
                                         cfg.addition_time_embed_dim)
            tid_emb = tid_emb.reshape(b, -1)
            add = jnp.concatenate(
                [added_cond["text_embeds"].astype(jnp.float32), tid_emb], -1)
            emb = emb + TimestepEmbedMLP(cfg.time_embed_dim, prec,
                                         name="add_embedding")(add.astype(cd))

        ctx = encoder_hidden_states.astype(cd)
        x = Conv(cfg.block_out_channels[0], precision=prec,
                 name="conv_in")(sample.astype(cd))

        # 2. down
        res_stack = [x]
        for i, ch in enumerate(cfg.block_out_channels):
            heads, hdim = cfg.heads_and_dim(ch, cfg.num_heads[i])
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(ch, cfg.norm_groups, precision=prec,
                                name=f"down_{i}_res_{j}")(x, emb)
                if heads is not None:
                    x = SpatialTransformer(
                        ch, heads, hdim, cfg.transformer_depth[i],
                        cfg.cross_attention_dim,
                        cfg.use_linear_projection, cfg.upcast_attention,
                        cfg.norm_groups, prec,
                        name=f"down_{i}_attn_{j}")(x, ctx)
                res_stack.append(x)
            if i < n_blocks - 1:
                x = Downsample(ch, precision=prec,
                               name=f"down_{i}_downsample")(x)
                res_stack.append(x)

        # 3. mid
        mid_ch = cfg.block_out_channels[-1]
        mh, mhd = cfg.heads_and_dim(mid_ch, _mid_heads(cfg))
        x = ResnetBlock(mid_ch, cfg.norm_groups, precision=prec,
                        name="mid_res_0")(x, emb)
        x = SpatialTransformer(mid_ch, mh, mhd,
                               cfg.transformer_depth[-1] or 1,
                               cfg.cross_attention_dim,
                               cfg.use_linear_projection,
                               cfg.upcast_attention, cfg.norm_groups, prec,
                               name="mid_attn")(x, ctx)
        x = ResnetBlock(mid_ch, cfg.norm_groups, precision=prec,
                        name="mid_res_1")(x, emb)

        # 4. up (only blocks <= max harvested index are built)
        rev = list(reversed(cfg.block_out_channels))
        harvested = {}
        for i in range(max_up + 1):
            out_ch = rev[i]
            in_ch = rev[min(i + 1, n_blocks - 1)]
            down_idx = n_blocks - 1 - i
            heads, hdim = cfg.heads_and_dim(out_ch, cfg.num_heads[down_idx])
            n_res = cfg.layers_per_block + 1
            skips = res_stack[-n_res:]
            res_stack = res_stack[:-n_res]
            for j in range(n_res):
                skip = skips[n_res - 1 - j]
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlock(out_ch, cfg.norm_groups, precision=prec,
                                name=f"up_{i}_res_{j}")(x, emb)
                if heads is not None:
                    x = SpatialTransformer(
                        out_ch, heads, hdim, cfg.transformer_depth[down_idx],
                        cfg.cross_attention_dim, cfg.use_linear_projection,
                        cfg.upcast_attention, cfg.norm_groups, prec,
                        name=f"up_{i}_attn_{j}")(x, ctx)
            if i in self.pre_up_indices:
                harvested[f"pre{i}"] = x
            if i < n_blocks - 1:
                x = Upsample(out_ch, precision=prec,
                             name=f"up_{i}_upsample")(x)
            if i in self.up_ft_indices:
                harvested[i] = x
        return harvested
