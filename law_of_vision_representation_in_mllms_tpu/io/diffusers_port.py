"""Port diffusers torch checkpoints (UNet / VAE / DiT / SD3) into our Flax
param pytrees. Host-side, torch-lazy; golden-tested against the vendored
diffusers implementations on tiny random configs (tests/test_diffusion.py).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..models.unet import UNetConfig
from ..models.vae import VAEConfig


def _t(sd, key):
    return sd[key].detach().to("cpu").float().numpy()


def _conv(sd, prefix):
    """torch Conv2d [O,I,kh,kw] -> flax {kernel [kh,kw,I,O], bias}."""
    out = {"kernel": _t(sd, prefix + ".weight").transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd, prefix + ".bias")
    return out


def _dense(sd, prefix):
    out = {"kernel": _t(sd, prefix + ".weight").T}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd, prefix + ".bias")
    return out


def _gn(sd, prefix):
    return {"gn": {"scale": _t(sd, prefix + ".weight"),
                   "bias": _t(sd, prefix + ".bias")}}


def _ln(sd, prefix):
    return {"ln": {"scale": _t(sd, prefix + ".weight"),
                   "bias": _t(sd, prefix + ".bias")}}


def _wrapped_conv(sd, prefix):
    return {"conv": _conv(sd, prefix)}


def _resnet(sd, p):
    out = {
        "norm1": _gn(sd, f"{p}.norm1"),
        "conv1": _wrapped_conv(sd, f"{p}.conv1"),
        "norm2": _gn(sd, f"{p}.norm2"),
        "conv2": _wrapped_conv(sd, f"{p}.conv2"),
    }
    if f"{p}.time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _dense(sd, f"{p}.time_emb_proj")
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _attn_proj(sd, p, linear: bool):
    return _dense(sd, p) if linear else _conv(sd, p)


def _basic_block(sd, p):
    def attn(ap):
        return {
            "to_q": _dense(sd, f"{ap}.to_q"),
            "to_k": _dense(sd, f"{ap}.to_k"),
            "to_v": _dense(sd, f"{ap}.to_v"),
            "to_out": _dense(sd, f"{ap}.to_out.0"),
        }
    return {
        "norm1": _ln(sd, f"{p}.norm1"),
        "attn1": attn(f"{p}.attn1"),
        "norm2": _ln(sd, f"{p}.norm2"),
        "attn2": attn(f"{p}.attn2"),
        "norm3": _ln(sd, f"{p}.norm3"),
        "ff": {"proj_in": _dense(sd, f"{p}.ff.net.0.proj"),
               "proj_out": _dense(sd, f"{p}.ff.net.2")},
    }


def _spatial_transformer(sd, p, linear: bool, depth: int):
    out = {
        "norm": _gn(sd, f"{p}.norm"),
        "proj_in": _attn_proj(sd, f"{p}.proj_in", linear),
        "proj_out": _attn_proj(sd, f"{p}.proj_out", linear),
    }
    for k in range(depth):
        out[f"block_{k}"] = _basic_block(sd, f"{p}.transformer_blocks.{k}")
    return out


def port_unet(state_dict, cfg: UNetConfig,
              up_ft_indices=(0,)) -> Dict:
    """diffusers UNet2DConditionModel -> UNetHarvest params. Only up blocks
    <= max(up_ft_indices) are ported (the rest are never built)."""
    sd = state_dict
    lin = cfg.use_linear_projection
    n = len(cfg.block_out_channels)
    max_up = max(up_ft_indices)
    params = {
        "conv_in": {"conv": _conv(sd, "conv_in")},
        "time_embedding": {"fc1": _dense(sd, "time_embedding.linear_1"),
                           "fc2": _dense(sd, "time_embedding.linear_2")},
    }
    if cfg.addition_embed_type == "text_time":
        params["add_embedding"] = {
            "fc1": _dense(sd, "add_embedding.linear_1"),
            "fc2": _dense(sd, "add_embedding.linear_2")}
    for i in range(n):
        has_attn = cfg.num_heads[i] is not None
        for j in range(cfg.layers_per_block):
            params[f"down_{i}_res_{j}"] = _resnet(
                sd, f"down_blocks.{i}.resnets.{j}")
            if has_attn:
                params[f"down_{i}_attn_{j}"] = _spatial_transformer(
                    sd, f"down_blocks.{i}.attentions.{j}", lin,
                    cfg.transformer_depth[i])
        if i < n - 1:
            params[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")}
    params["mid_res_0"] = _resnet(sd, "mid_block.resnets.0")
    params["mid_res_1"] = _resnet(sd, "mid_block.resnets.1")
    params["mid_attn"] = _spatial_transformer(
        sd, "mid_block.attentions.0", lin,
        cfg.transformer_depth[-1] or 1)
    for i in range(max_up + 1):
        down_idx = n - 1 - i
        has_attn = cfg.num_heads[down_idx] is not None
        for j in range(cfg.layers_per_block + 1):
            params[f"up_{i}_res_{j}"] = _resnet(
                sd, f"up_blocks.{i}.resnets.{j}")
            if has_attn:
                params[f"up_{i}_attn_{j}"] = _spatial_transformer(
                    sd, f"up_blocks.{i}.attentions.{j}", lin,
                    cfg.transformer_depth[down_idx])
        if i < n - 1:
            params[f"up_{i}_upsample"] = {"conv": {
                "conv": _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")}}
    return params


def port_vae_encoder(state_dict, cfg: VAEConfig) -> Dict:
    """diffusers AutoencoderKL (encoder.* + quant_conv) -> VAEEncoder
    params."""
    sd = state_dict
    pre = "encoder"
    n = len(cfg.block_out_channels)
    params = {
        "conv_in": {"conv": _conv(sd, f"{pre}.conv_in")},
        "conv_norm_out": _gn(sd, f"{pre}.conv_norm_out"),
        "conv_out": {"conv": _conv(sd, f"{pre}.conv_out")},
    }
    for i in range(n):
        for j in range(cfg.layers_per_block):
            params[f"down_{i}_res_{j}"] = _resnet(
                sd, f"{pre}.down_blocks.{i}.resnets.{j}")
        if i < n - 1:
            params[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"{pre}.down_blocks.{i}.downsamplers.0.conv")}
    params["mid_res_0"] = _resnet(sd, f"{pre}.mid_block.resnets.0")
    params["mid_res_1"] = _resnet(sd, f"{pre}.mid_block.resnets.1")
    ap = f"{pre}.mid_block.attentions.0"
    params["mid_attn"] = {
        "group_norm": _gn(sd, f"{ap}.group_norm"),
        "to_q": _dense(sd, f"{ap}.to_q"),
        "to_k": _dense(sd, f"{ap}.to_k"),
        "to_v": _dense(sd, f"{ap}.to_v"),
        "to_out": _dense(sd, f"{ap}.to_out.0"),
    }
    if cfg.use_quant_conv:
        params["quant_conv"] = _conv(sd, "quant_conv")
    return params


def port_dit(state_dict, cfg, up_ft_indices=(-1,)) -> Dict:
    """diffusers DiTTransformer2DModel -> DiTHarvest params (class-embedding
    branch intentionally dropped: the featurizer conditions on timestep only,
    `dift_dit.py MyCombinedTimestepLabelEmbeddings`)."""
    sd = state_dict
    resolved = tuple(i % cfg.num_layers for i in up_ft_indices)
    params = {"patch_proj": _conv(sd, "pos_embed.proj")}
    for i in range(max(resolved) + 1):
        p = f"transformer_blocks.{i}"
        params[f"t_embedder_{i}"] = {
            "fc1": _dense(sd, f"{p}.norm1.emb.timestep_embedder.linear_1"),
            "fc2": _dense(sd, f"{p}.norm1.emb.timestep_embedder.linear_2")}
        params[f"block_{i}"] = {
            "norm1": {"linear": _dense(sd, f"{p}.norm1.linear")},
            "attn1": {"to_q": _dense(sd, f"{p}.attn1.to_q"),
                      "to_k": _dense(sd, f"{p}.attn1.to_k"),
                      "to_v": _dense(sd, f"{p}.attn1.to_v"),
                      "to_out": _dense(sd, f"{p}.attn1.to_out.0")},
            "ff": {"proj_in": _dense(sd, f"{p}.ff.net.0.proj"),
                   "proj_out": _dense(sd, f"{p}.ff.net.2")},
        }
    return params


def port_mmdit(state_dict, cfg, up_ft_indices=(-1,)) -> Dict:
    """diffusers SD3Transformer2DModel -> MMDiTHarvest params."""
    sd = state_dict
    resolved = tuple(i % cfg.num_layers for i in up_ft_indices)
    params = {
        "patch_proj": _conv(sd, "pos_embed.proj"),
        "pos_embed": _t(sd, "pos_embed.pos_embed"),
        "timestep_embedder": {
            "fc1": _dense(sd, "time_text_embed.timestep_embedder.linear_1"),
            "fc2": _dense(sd, "time_text_embed.timestep_embedder.linear_2")},
        "text_embedder": {
            "fc1": _dense(sd, "time_text_embed.text_embedder.linear_1"),
            "fc2": _dense(sd, "time_text_embed.text_embedder.linear_2")},
        "context_embedder": _dense(sd, "context_embedder"),
    }
    for i in range(max(resolved) + 1):
        p = f"transformer_blocks.{i}"
        pre_only = i == cfg.num_layers - 1
        blk = {
            "norm1": {"linear": _dense(sd, f"{p}.norm1.linear")},
            "to_q": _dense(sd, f"{p}.attn.to_q"),
            "to_k": _dense(sd, f"{p}.attn.to_k"),
            "to_v": _dense(sd, f"{p}.attn.to_v"),
            "add_q_proj": _dense(sd, f"{p}.attn.add_q_proj"),
            "add_k_proj": _dense(sd, f"{p}.attn.add_k_proj"),
            "add_v_proj": _dense(sd, f"{p}.attn.add_v_proj"),
            "to_out": _dense(sd, f"{p}.attn.to_out.0"),
            "ff": {"proj_in": _dense(sd, f"{p}.ff.net.0.proj"),
                   "proj_out": _dense(sd, f"{p}.ff.net.2")},
        }
        if pre_only:
            blk["norm1_context_linear"] = _dense(
                sd, f"{p}.norm1_context.linear")
        else:
            blk["norm1_context"] = {
                "linear": _dense(sd, f"{p}.norm1_context.linear")}
            blk["to_add_out"] = _dense(sd, f"{p}.attn.to_add_out")
            blk["ff_context"] = {
                "proj_in": _dense(sd, f"{p}.ff_context.net.0.proj"),
                "proj_out": _dense(sd, f"{p}.ff_context.net.2")}
        params[f"block_{i}"] = blk
    return params
