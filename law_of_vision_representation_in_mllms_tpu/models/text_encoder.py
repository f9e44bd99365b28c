"""CLIP text encoders — prompt conditioning for the SD featurizers.

The featurizers encode a (usually empty) prompt once per model:
- SD1.5/2.1: `pipe.encode_prompt` -> CLIPTextModel last_hidden_state
  (`dift_sd.py:252-258`).
- SDXL: hidden_states[-2] of CLIP-L and OpenCLIP-bigG concatenated +
  bigG pooled text_projection (diffusers StableDiffusionXLPipeline
  .encode_prompt).
- SD3: CLIP-L + CLIP-G hidden_states[-2] concat, zero-padded to the T5
  width, T5 context zeros (text_encoder_3 dropped, `dift_sd3.py:131-132`);
  pooled = concat of both pooled projections.

Same transformer block as the vision towers (models/vit.py ViTBlock) with a
causal mask; golden-tested vs HF CLIPTextModel.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from ..core.precision import Precision, DEFAULT_PRECISION
from .vit import ViTBlock, ViTConfig, _LayerNorm


@dataclasses.dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    max_positions: int = 77
    eos_token_id: int = 49407
    projection_dim: int = 0          # >0: pooled text_projection exists

    def block_cfg(self) -> ViTConfig:
        return ViTConfig(hidden_size=self.hidden_size,
                         num_layers=self.num_layers,
                         num_heads=self.num_heads,
                         intermediate_size=self.intermediate_size,
                         hidden_act=self.hidden_act,
                         layer_norm_eps=self.layer_norm_eps)


def clip_l_text() -> TextConfig:
    return TextConfig()


def clip_sd21_text() -> TextConfig:
    # SD2.1 text encoder: OpenCLIP ViT-H text tower in HF CLIPTextModel form
    return TextConfig(hidden_size=1024, num_layers=23, num_heads=16,
                      intermediate_size=4096, hidden_act="gelu")


def clip_bigg_text() -> TextConfig:
    return TextConfig(hidden_size=1280, num_layers=32, num_heads=20,
                      intermediate_size=5120, hidden_act="gelu",
                      projection_dim=1280)


class CLIPTextEncoder(nn.Module):
    cfg: TextConfig
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, input_ids, *, num_blocks: int | None = None,
                 want_pooled: bool = False):
        """input_ids [B, S] -> (hidden [B, S, D], pooled or None).

        `num_blocks` runs a prefix of the blocks (SDXL/SD3 take
        hidden_states[-2] => num_layers-1 blocks, without final LN).
        Pooled output (needs the full stack + final LN) gathers the eos
        position and applies text_projection when configured.
        """
        cfg, prec = self.cfg, self.precision
        b, s = input_ids.shape
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.hidden_size), prec.param_dtype)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.max_positions, cfg.hidden_size),
                         prec.param_dtype)
        x = tok[input_ids].astype(prec.compute_dtype) + \
            pos[:, :s].astype(prec.compute_dtype)

        n = cfg.num_layers if num_blocks is None else num_blocks
        for i in range(n):
            x = ViTBlock(cfg.block_cfg(), prec, causal=True,
                         name=f"block_{i}")(x)

        if n < cfg.num_layers and not want_pooled:
            return x, None

        hidden = _LayerNorm(cfg.layer_norm_eps, prec, name="final_ln")(x)
        pooled = None
        if want_pooled:
            # HF CLIPTextModel: pooled = hidden at the eos position
            eos = jnp.argmax(
                (input_ids == cfg.eos_token_id).astype(jnp.int32), axis=1)
            pooled = jnp.take_along_axis(hidden, eos[:, None, None],
                                         axis=1)[:, 0]
            if cfg.projection_dim:
                proj = self.param("text_projection",
                                  nn.initializers.normal(0.02),
                                  (cfg.hidden_size, cfg.projection_dim),
                                  prec.param_dtype)
                pooled = pooled @ proj.astype(pooled.dtype)
        return hidden, pooled


def port_clip_text(state_dict, cfg: TextConfig,
                   num_blocks: int | None = None):
    """HF CLIPTextModel(WithProjection) -> CLIPTextEncoder params."""
    from ..io.hf_port import _t, _linear  # reuse helpers

    sd = state_dict
    pre = "text_model"
    params = {
        "token_embedding": _t(sd, f"{pre}.embeddings.token_embedding.weight"),
        "pos_embed": _t(sd, f"{pre}.embeddings.position_embedding.weight"
                        )[None],
        "final_ln": {"ln": {
            "scale": _t(sd, f"{pre}.final_layer_norm.weight"),
            "bias": _t(sd, f"{pre}.final_layer_norm.bias")}},
    }
    n = cfg.num_layers if num_blocks is None else num_blocks
    for i in range(n):
        lp = f"{pre}.encoder.layers.{i}"
        params[f"block_{i}"] = {
            "ln1": {"ln": {"scale": _t(sd, f"{lp}.layer_norm1.weight"),
                           "bias": _t(sd, f"{lp}.layer_norm1.bias")}},
            "q": _linear(sd, f"{lp}.self_attn.q_proj"),
            "k": _linear(sd, f"{lp}.self_attn.k_proj"),
            "v": _linear(sd, f"{lp}.self_attn.v_proj"),
            "o": _linear(sd, f"{lp}.self_attn.out_proj"),
            "ln2": {"ln": {"scale": _t(sd, f"{lp}.layer_norm2.weight"),
                           "bias": _t(sd, f"{lp}.layer_norm2.bias")}},
            "fc1": _linear(sd, f"{lp}.mlp.fc1"),
            "fc2": _linear(sd, f"{lp}.mlp.fc2"),
        }
    if "text_projection.weight" in sd:
        params["text_projection"] = _t(sd, "text_projection.weight").T
    return params
