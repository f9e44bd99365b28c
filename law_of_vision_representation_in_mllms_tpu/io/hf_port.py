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
    def _scaled(prefix: str, lam: np.ndarray) -> Dict:
        """LayerScale FOLDED into the preceding projection: the per-
        output-channel lambda commutes with the dense layer
        ((Wx+b)*l == (W*l)x + b*l), so folding at port time removes two
        [B,S,D]-sized elementwise passes per block from the compiled
        graph — measured +7% DINOv2-L throughput (benchmarks/README.md
        round-4 zoo log). Exact in fp32; the weights are cast to the
        compute dtype once either way."""
        lin = _linear(sd, prefix)
        return {"kernel": lin["kernel"] * lam[None, :],
                "bias": lin["bias"] * lam}

    fold = not cfg.use_layerscale
    for i in range(cfg.num_layers):
        lp = f"encoder.layer.{i}"
        if f"{lp}.norm1.weight" not in sd:
            break
        ls1 = _t(sd, f"{lp}.layer_scale1.lambda1")
        ls2 = _t(sd, f"{lp}.layer_scale2.lambda1")
        blk = {
            "ln1": _ln(sd, f"{lp}.norm1"),
            "q": _linear(sd, f"{lp}.attention.attention.query"),
            "k": _linear(sd, f"{lp}.attention.attention.key"),
            "v": _linear(sd, f"{lp}.attention.attention.value"),
            "o": (_scaled(f"{lp}.attention.output.dense", ls1) if fold
                  else _linear(sd, f"{lp}.attention.output.dense")),
            "ln2": _ln(sd, f"{lp}.norm2"),
            "fc1": _linear(sd, f"{lp}.mlp.fc1"),
            "fc2": (_scaled(f"{lp}.mlp.fc2", ls2) if fold
                    else _linear(sd, f"{lp}.mlp.fc2")),
        }
        if not fold:
            blk["ls1"] = ls1
            blk["ls2"] = ls2
        params[f"block_{i}"] = blk
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


def sam_config_from_hf(hf_cfg) -> "SamConfig":
    """Build a models.sam.SamConfig from a transformers SamConfig."""
    from ..models.sam import SamConfig, SamVisionCfg
    v = hf_cfg.vision_config
    return SamConfig(
        vision=SamVisionCfg(
            image_size=v.image_size, patch_size=v.patch_size,
            hidden_size=v.hidden_size, num_layers=v.num_hidden_layers,
            num_heads=v.num_attention_heads, mlp_dim=v.mlp_dim,
            out_chans=v.output_channels, window_size=v.window_size,
            global_attn_indexes=tuple(v.global_attn_indexes),
            layer_norm_eps=v.layer_norm_eps),
        prompt_hidden=hf_cfg.prompt_encoder_config.hidden_size,
        num_pos_feats=v.num_pos_feats,
        decoder_heads=hf_cfg.mask_decoder_config.num_attention_heads,
        decoder_layers=hf_cfg.mask_decoder_config.num_hidden_layers,
        decoder_mlp_dim=hf_cfg.mask_decoder_config.mlp_dim,
        iou_head_hidden=hf_cfg.mask_decoder_config.iou_head_hidden_dim,
        iou_head_depth=hf_cfg.mask_decoder_config.iou_head_depth,
        num_multimask_outputs=hf_cfg.mask_decoder_config
        .num_multimask_outputs,
        input_image_size=hf_cfg.prompt_encoder_config.image_size)


def port_sam(state_dict, cfg) -> Dict:
    """transformers.SamModel -> models.sam params (golden: tests/test_sam).

    Name map per `modeling_sam.py`: vision_encoder.* (rel-pos windowed
    ViT + neck), prompt_encoder.* (fourier PE + corner/point embeddings),
    mask_decoder.* (two-way transformer + upscale + hypernetwork MLPs).
    """
    sd = state_dict
    v = cfg.vision
    p = v.patch_size

    def lin(prefix):
        out = {"w": _t(sd, prefix + ".weight").T}
        if prefix + ".bias" in sd:
            out["b"] = _t(sd, prefix + ".bias")
        return out

    def ln(prefix):
        return {"w": _t(sd, prefix + ".weight"),
                "b": _t(sd, prefix + ".bias")}

    vision = {
        # conv [C,3,P,P] -> (kh,kw,c)-flattened matmul kernel
        "patch_w": _t(sd, "vision_encoder.patch_embed.projection.weight"
                      ).transpose(2, 3, 1, 0).reshape(p * p * 3,
                                                      v.hidden_size),
        "patch_b": _t(sd, "vision_encoder.patch_embed.projection.bias"),
        "pos_embed": _t(sd, "vision_encoder.pos_embed"),
        "neck_conv1": _t(sd, "vision_encoder.neck.conv1.weight"
                         )[:, :, 0, 0].T,
        "neck_ln1": ln("vision_encoder.neck.layer_norm1"),
        "neck_conv2": _t(sd, "vision_encoder.neck.conv2.weight"
                         ).transpose(2, 3, 1, 0),
        "neck_ln2": ln("vision_encoder.neck.layer_norm2"),
        "layers": [],
    }
    for i in range(v.num_layers):
        pre = f"vision_encoder.layers.{i}"
        vision["layers"].append({
            "ln1": ln(pre + ".layer_norm1"),
            "ln2": ln(pre + ".layer_norm2"),
            "attn": {
                "qkv": lin(pre + ".attn.qkv"),
                "proj": lin(pre + ".attn.proj"),
                "rel_pos_h": _t(sd, pre + ".attn.rel_pos_h"),
                "rel_pos_w": _t(sd, pre + ".attn.rel_pos_w"),
            },
            "mlp1": lin(pre + ".mlp.lin1"),
            "mlp2": lin(pre + ".mlp.lin2"),
        })

    prompt = {
        "point_embed": np.stack(
            [_t(sd, f"prompt_encoder.point_embed.{i}.weight")[0]
             for i in range(4)]),
        "not_a_point": _t(sd, "prompt_encoder.not_a_point_embed.weight")[0],
        "no_mask": _t(sd, "prompt_encoder.no_mask_embed.weight")[0],
    }

    def sam_attn(prefix):
        return {"q": lin(prefix + ".q_proj"), "k": lin(prefix + ".k_proj"),
                "v": lin(prefix + ".v_proj"),
                "out": lin(prefix + ".out_proj")}

    def ffw(prefix, depth):
        return {"in": lin(prefix + ".proj_in"),
                "mid": [lin(f"{prefix}.layers.{j}")
                        for j in range(depth - 2)],
                "out": lin(prefix + ".proj_out")}

    n_mask_tokens = cfg.num_multimask_outputs + 1
    decoder = {
        "iou_token": _t(sd, "mask_decoder.iou_token.weight")[0],
        "mask_tokens": _t(sd, "mask_decoder.mask_tokens.weight"),
        "layers": [],
        "final_t2i": sam_attn(
            "mask_decoder.transformer.final_attn_token_to_image"),
        "final_ln": ln("mask_decoder.transformer.layer_norm_final_attn"),
        # ConvTranspose2d [in, out, kh, kw] -> HWOI for
        # lax.conv_transpose(transpose_kernel=True) with HWIO numbers
        "up1_w": _t(sd, "mask_decoder.upscale_conv1.weight"
                    ).transpose(2, 3, 1, 0),
        "up1_b": _t(sd, "mask_decoder.upscale_conv1.bias"),
        "up_ln": ln("mask_decoder.upscale_layer_norm"),
        "up2_w": _t(sd, "mask_decoder.upscale_conv2.weight"
                    ).transpose(2, 3, 1, 0),
        "up2_b": _t(sd, "mask_decoder.upscale_conv2.bias"),
        "hyper": [ffw(f"mask_decoder.output_hypernetworks_mlps.{i}", 3)
                  for i in range(n_mask_tokens)],
        "iou_head": ffw("mask_decoder.iou_prediction_head",
                        cfg.iou_head_depth),
    }
    for i in range(cfg.decoder_layers):
        pre = f"mask_decoder.transformer.layers.{i}"
        decoder["layers"].append({
            "self_attn": sam_attn(pre + ".self_attn"),
            "t2i": sam_attn(pre + ".cross_attn_token_to_image"),
            "i2t": sam_attn(pre + ".cross_attn_image_to_token"),
            "ln1": ln(pre + ".layer_norm1"),
            "ln2": ln(pre + ".layer_norm2"),
            "ln3": ln(pre + ".layer_norm3"),
            "ln4": ln(pre + ".layer_norm4"),
            "mlp1": lin(pre + ".mlp.lin1"),
            "mlp2": lin(pre + ".mlp.lin2"),
        })

    return {
        "pe": _t(sd, "shared_image_embedding.positional_embedding"),
        "vision": vision,
        "prompt": prompt,
        "decoder": decoder,
    }
