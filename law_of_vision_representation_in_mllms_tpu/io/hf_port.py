"""Port HuggingFace torch checkpoints into this framework's param pytrees.

Host-side only: torch is imported lazily and never touches the TPU compute
path. One name map per model family, checksum-free but golden-tested
(tests/test_vit_towers.py compares every hidden state against the HF torch
implementation on random tiny configs).

Replaces the reference's reliance on `transformers.from_pretrained` inside the
tower wrappers (`llava/model/multimodal_encoder/*_encoder.py`) and the
checkpoint resolution logic of `llava/model/builder.py:27-161`.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..models.vit import ViTConfig


def _t(sd, key):
    """Fetch a torch tensor from a state dict as float32 numpy."""
    return sd[key].detach().to("cpu").float().numpy()


def _linear(sd, prefix):
    out = {"kernel": _t(sd, prefix + ".weight").T}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd, prefix + ".bias")
    return out





def _ln(sd, prefix):
    return {"ln": {"scale": _t(sd, prefix + ".weight"),
                   "bias": _t(sd, prefix + ".bias")}}


def port_clip_vision(state_dict, cfg: ViTConfig) -> Dict:
    """openai/laion CLIPVisionModel -> ViTEncoder params.

    HF layout: vision_model.embeddings.{class_embedding,patch_embedding,
    position_embedding}, vision_model.pre_layrnorm,
    vision_model.encoder.layers.{i}.{layer_norm1,self_attn,layer_norm2,mlp}.
    """
    sd = state_dict
    pre = "vision_model"
    params = {
        "patch_kernel": _t(sd, f"{pre}.embeddings.patch_embedding.weight"
                           ).transpose(2, 3, 1, 0),
        "cls_token": _t(sd, f"{pre}.embeddings.class_embedding"
                        ).reshape(1, 1, -1),
        "pos_embed": _t(sd, f"{pre}.embeddings.position_embedding.weight"
                        )[None],
        "pre_ln": _ln(sd, f"{pre}.pre_layrnorm"),
    }
    for i in range(cfg.num_layers):
        lp = f"{pre}.encoder.layers.{i}"
        if f"{lp}.layer_norm1.weight" not in sd:
            break
        params[f"block_{i}"] = {
            "ln1": _ln(sd, f"{lp}.layer_norm1"),
            "q": _linear(sd, f"{lp}.self_attn.q_proj"),
            "k": _linear(sd, f"{lp}.self_attn.k_proj"),
            "v": _linear(sd, f"{lp}.self_attn.v_proj"),
            "o": _linear(sd, f"{lp}.self_attn.out_proj"),
            "ln2": _ln(sd, f"{lp}.layer_norm2"),
            "fc1": _linear(sd, f"{lp}.mlp.fc1"),
            "fc2": _linear(sd, f"{lp}.mlp.fc2"),
        }
    return params


def port_siglip_vision(state_dict, cfg: ViTConfig) -> Dict:
    """google/siglip SiglipVisionModel (vision_model.*) -> ViTEncoder params."""
    sd = state_dict
    pre = "vision_model" if any(k.startswith("vision_model")
                                for k in sd) else ""
    dot = "." if pre else ""
    params = {
        "patch_kernel": _t(sd, f"{pre}{dot}embeddings.patch_embedding.weight"
                           ).transpose(2, 3, 1, 0),
        "patch_bias": _t(sd, f"{pre}{dot}embeddings.patch_embedding.bias"),
        "pos_embed": _t(sd, f"{pre}{dot}embeddings.position_embedding.weight"
                        )[None],
    }
    for i in range(cfg.num_layers):
        lp = f"{pre}{dot}encoder.layers.{i}"
        if f"{lp}.layer_norm1.weight" not in sd:
            break
        params[f"block_{i}"] = {
            "ln1": _ln(sd, f"{lp}.layer_norm1"),
            "q": _linear(sd, f"{lp}.self_attn.q_proj"),
            "k": _linear(sd, f"{lp}.self_attn.k_proj"),
            "v": _linear(sd, f"{lp}.self_attn.v_proj"),
            "o": _linear(sd, f"{lp}.self_attn.out_proj"),
            "ln2": _ln(sd, f"{lp}.layer_norm2"),
            "fc1": _linear(sd, f"{lp}.mlp.fc1"),
            "fc2": _linear(sd, f"{lp}.mlp.fc2"),
        }
    return params


def port_dinov2(state_dict, cfg: ViTConfig) -> Dict:
    """facebook/dinov2 Dinov2Model -> ViTEncoder params.

    Position embeddings are interpolated (torch bicubic, no antialias — the
    exact HF `interpolate_pos_encoding` path) to `cfg.image_size` at port
    time so the compiled graph never interpolates.
    """
    import torch
    import torch.nn.functional as F

    sd = state_dict
    pos = sd["embeddings.position_embeddings"].detach().float()  # [1,1+N0,D]
    dim = pos.shape[-1]
    n0 = pos.shape[1] - 1
    g0 = int(round(n0 ** 0.5))
    g1 = cfg.grid
    if g0 != g1:
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        patch_pos = patch_pos.reshape(1, g0, g0, dim).permute(0, 3, 1, 2)
        patch_pos = F.interpolate(patch_pos, size=(g1, g1), mode="bicubic",
                                  align_corners=False)
        patch_pos = patch_pos.permute(0, 2, 3, 1).reshape(1, g1 * g1, dim)
        pos = torch.cat([cls_pos, patch_pos], dim=1)
    params = {
        "patch_kernel": _t(
            sd, "embeddings.patch_embeddings.projection.weight"
        ).transpose(2, 3, 1, 0),
        "patch_bias": _t(sd, "embeddings.patch_embeddings.projection.bias"),
        "cls_token": _t(sd, "embeddings.cls_token"),
        "pos_embed": pos.numpy().astype(np.float32),
    }
    for i in range(cfg.num_layers):
        lp = f"encoder.layer.{i}"
        if f"{lp}.norm1.weight" not in sd:
            break
        params[f"block_{i}"] = {
            "ln1": _ln(sd, f"{lp}.norm1"),
            "q": _linear(sd, f"{lp}.attention.attention.query"),
            "k": _linear(sd, f"{lp}.attention.attention.key"),
            "v": _linear(sd, f"{lp}.attention.attention.value"),
            "o": _linear(sd, f"{lp}.attention.output.dense"),
            "ls1": _t(sd, f"{lp}.layer_scale1.lambda1"),
            "ln2": _ln(sd, f"{lp}.norm2"),
            "fc1": _linear(sd, f"{lp}.mlp.fc1"),
            "fc2": _linear(sd, f"{lp}.mlp.fc2"),
            "ls2": _t(sd, f"{lp}.layer_scale2.lambda1"),
        }
    return params


VIT_PORTERS = {
    "clip": port_clip_vision,
    "siglip": port_siglip_vision,
    "dinov2": port_dinov2,
}


def port_vit(family: str, state_dict, cfg: ViTConfig,
             num_blocks: int | None = None) -> Dict:
    """Port a ViT family checkpoint, keeping only the first `num_blocks`."""
    params = VIT_PORTERS[family](state_dict, cfg)
    if num_blocks is not None:
        params = {k: v for k, v in params.items()
                  if not k.startswith("block_")
                  or int(k.split("_")[1]) < num_blocks}
    return params


def port_llama(state_dict, cfg) -> Dict:
    """HF LlamaForCausalLM -> stacked-layer param pytree (models/llama.py).

    Per-layer weights are stacked on a leading axis for the lax.scan trunk.
    """
    sd = state_dict

    def stack(fmt, transpose=True):
        ws = []
        for i in range(cfg.num_layers):
            w = _t(sd, fmt.format(i=i))
            ws.append(w.T if transpose else w)
        return np.stack(ws)

    return {
        "embed": _t(sd, "model.embed_tokens.weight"),
        "layers": {
            "wq": stack("model.layers.{i}.self_attn.q_proj.weight"),
            "wk": stack("model.layers.{i}.self_attn.k_proj.weight"),
            "wv": stack("model.layers.{i}.self_attn.v_proj.weight"),
            "wo": stack("model.layers.{i}.self_attn.o_proj.weight"),
            "gate": stack("model.layers.{i}.mlp.gate_proj.weight"),
            "up": stack("model.layers.{i}.mlp.up_proj.weight"),
            "down": stack("model.layers.{i}.mlp.down_proj.weight"),
            "rms1": stack("model.layers.{i}.input_layernorm.weight",
                          transpose=False),
            "rms2": stack("model.layers.{i}.post_attention_layernorm.weight",
                          transpose=False),
        },
        "final_norm": _t(sd, "model.norm.weight"),
        "lm_head": _t(sd, "lm_head.weight").T,
    }


def port_clip_vision_pooled(state_dict, cfg) -> Dict:
    """CLIPVisionModelWithProjection -> CLIPVisionPooled params."""
    sd = state_dict
    params = {"encoder": port_clip_vision(sd, cfg)}
    params["post_ln"] = _ln(sd, "vision_model.post_layernorm")
    params["visual_projection"] = _t(sd, "visual_projection.weight").T
    return params
