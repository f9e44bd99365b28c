"""Port full checkpoints from local HF/diffusers snapshot directories.

`port_weights.py` for the 13-representation zoo (SURVEY.md §7 "weight
porting at scale"): reads a LOCAL snapshot directory (config.json +
*.safetensors / pytorch_model*.bin — no network), maps it through the
family porters, and writes one flat .npz per component (io/param_io.py).

Usage (programmatic or `python -m ...io.port_cli`):
    port_component("clip_vision", "/ckpts/clip-vit-large-patch14-336",
                   "ports/clip336.npz", image_size=336)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from typing import Dict, Optional

from .param_io import save_params


def load_torch_state_dict(src_dir: str) -> Dict:
    """Load every weight shard in a snapshot directory."""
    sd: Dict = {}
    safes = sorted(glob.glob(os.path.join(src_dir, "*.safetensors")))
    if safes:
        from safetensors.torch import load_file
        for f in safes:
            sd.update(load_file(f))
        return sd
    bins = sorted(glob.glob(os.path.join(src_dir, "pytorch_model*.bin")) +
                  glob.glob(os.path.join(src_dir,
                                         "diffusion_pytorch_model*.bin")))
    if not bins:
        raise FileNotFoundError(f"no weight files in {src_dir}")
    import torch
    for f in bins:
        sd.update(torch.load(f, map_location="cpu"))
    return sd


def port_component(kind: str, src_dir: str, out_path: str,
                   **kwargs) -> str:
    sd = load_torch_state_dict(src_dir)
    params = PORTERS[kind](sd, src_dir, **kwargs)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    save_params(out_path, params)
    return out_path


# ---------------------------------------------------------------------------

def _vit(family):
    def port(sd, src_dir, image_size: Optional[int] = None,
             select_layer: int = -2, **_):
        from ..models.vit import VIT_PRESETS, ViTConfig
        from .hf_port import VIT_PORTERS
        import dataclasses
        with open(os.path.join(src_dir, "config.json")) as f:
            hf_cfg = json.load(f)
        vc = hf_cfg.get("vision_config", hf_cfg)
        cfg = ViTConfig(
            image_size=image_size or vc.get("image_size", 224),
            patch_size=vc.get("patch_size", 14),
            hidden_size=vc.get("hidden_size", 1024),
            num_layers=vc.get("num_hidden_layers", 24),
            num_heads=vc.get("num_attention_heads", 16),
            intermediate_size=vc.get("intermediate_size", 4096))
        # family presets carry the structural flags
        base = {"clip": VIT_PRESETS["openai/clip-vit-large-patch14"](),
                "siglip": VIT_PRESETS["google/siglip-base-patch16-224"](),
                "dinov2": VIT_PRESETS["facebook/dinov2-large"]()}[family]
        cfg = dataclasses.replace(
            base, image_size=cfg.image_size, patch_size=cfg.patch_size,
            hidden_size=cfg.hidden_size, num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            intermediate_size=cfg.intermediate_size,
            hidden_act=vc.get("hidden_act", base.hidden_act))
        n_blocks = cfg.resolve_layer(select_layer)
        from .hf_port import port_vit
        return port_vit(family, sd, cfg, num_blocks=n_blocks)
    return port


def _llama(sd, src_dir, **_):
    from ..models.llama import LlamaConfig
    from .hf_port import port_llama
    with open(os.path.join(src_dir, "config.json")) as f:
        hf = json.load(f)
    cfg = LlamaConfig(
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads",
                            hf["num_attention_heads"]),
        rope_theta=hf.get("rope_theta", 10000.0),
        rms_eps=hf.get("rms_norm_eps", 1e-5))
    return port_llama(sd, cfg)


def _clip_text(sd, src_dir, penultimate: bool = False, **_):
    from ..models.text_encoder import TextConfig, port_clip_text
    with open(os.path.join(src_dir, "config.json")) as f:
        hf = json.load(f)
    tc = hf.get("text_config", hf)
    cfg = TextConfig(
        vocab_size=tc["vocab_size"], hidden_size=tc["hidden_size"],
        num_layers=tc["num_hidden_layers"],
        num_heads=tc["num_attention_heads"],
        intermediate_size=tc["intermediate_size"],
        hidden_act=tc.get("hidden_act", "quick_gelu"),
        max_positions=tc.get("max_position_embeddings", 77),
        eos_token_id=tc.get("eos_token_id", 49407),
        projection_dim=tc.get("projection_dim", 0)
        if "text_projection.weight" in sd else 0)
    n = cfg.num_layers - 1 if penultimate else None
    return port_clip_text(sd, cfg, num_blocks=n)


def _unet(style):
    def port(sd, src_dir, up_ft_index: int = 0, **_):
        from ..models import unet as UN
        from .diffusers_port import port_unet
        cfg = {"sd15": UN.sd15_unet, "sd21": UN.sd21_unet,
               "sdxl": UN.sdxl_unet}[style]()
        return port_unet(sd, cfg, (up_ft_index,))
    return port


def _vae(style):
    def port(sd, src_dir, **_):
        from ..models import vae as VA
        from .diffusers_port import port_vae_encoder
        cfg = {"sd": VA.sd_vae, "sdxl": VA.sdxl_vae,
               "sd3": VA.sd3_vae}[style]()
        return port_vae_encoder(sd, cfg)
    return port


def _dit(sd, src_dir, up_ft_index: int = -1, **_):
    from ..models.dit import dit_xl_2
    from .diffusers_port import port_dit
    return port_dit(sd, dit_xl_2(), (up_ft_index,))


def _mmdit(sd, src_dir, up_ft_index: int = -1, **_):
    from ..models.mmdit import sd3_medium
    from .diffusers_port import port_mmdit
    return port_mmdit(sd, sd3_medium(), (up_ft_index,))


def _clip_vision_pooled(sd, src_dir, **_):
    from ..models.vit import clip_l14
    from .hf_port import port_clip_vision_pooled
    return port_clip_vision_pooled(sd, clip_l14(224))


PORTERS = {
    "clip_vision": _vit("clip"),
    "siglip_vision": _vit("siglip"),
    "dinov2": _vit("dinov2"),
    "clip_text": _clip_text,
    "llama": _llama,
    "unet_sd15": _unet("sd15"),
    "unet_sd21": _unet("sd21"),
    "unet_sdxl": _unet("sdxl"),
    "vae_sd": _vae("sd"),
    "vae_sdxl": _vae("sdxl"),
    "vae_sd3": _vae("sd3"),
    "dit": _dit,
    "mmdit": _mmdit,
    "clip_vision_pooled": _clip_vision_pooled,
}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kind", choices=sorted(PORTERS))
    p.add_argument("src_dir")
    p.add_argument("out_path")
    p.add_argument("--image-size", type=int)
    p.add_argument("--select-layer", type=int, default=-2)
    p.add_argument("--up-ft-index", type=int, default=0)
    p.add_argument("--penultimate", action="store_true")
    a = p.parse_args(argv)
    kw = {}
    if a.image_size:
        kw["image_size"] = a.image_size
    kw["select_layer"] = a.select_layer
    kw["up_ft_index"] = a.up_ft_index
    kw["penultimate"] = a.penultimate
    out = port_component(a.kind, a.src_dir, a.out_path, **kw)
    print(f"ported {a.kind} from {a.src_dir} -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
