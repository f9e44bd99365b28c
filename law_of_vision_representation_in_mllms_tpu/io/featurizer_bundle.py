"""Self-contained diffusion-featurizer bundles: ported params + config.

The reference instantiates a full diffusers pipeline per tower at runtime
(`dift_sd.py SDFeaturizer.__init__` loads UNet+VAE+text encoder from the hub
and re-encodes the prompt every forward). TPU-native equivalent: everything
the featurizer needs is ported ONCE into a flat .npz (weights) + .json
sidecar (architecture + harvest config), and the runtime is a pure function
over the loaded pytree. Text conditioning for the fixed per-run prompt
('' throughout the pipeline, `train.py:85`) is precomputed at port time and
stored as a buffer — zero per-step text-encoder cost.

Bundle layout (param_io flat npz):
  vae/...            VAEEncoder params
  backbone/...       UNetHarvest | DiTHarvest | MMDiTHarvest params
  prompt_embeds      [1, T, D] text conditioning (absent for dit/imsd)
  pooled             [1, D] pooled conditioning (sd3 only)
  image_encoder/...  CLIPVisionPooled params (imsd only)
plus `<out>.json`: models.featurizer.config_to_dict(FeaturizerConfig).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

from ..models import featurizer as F
from ..models import unet as UN
from ..models import vae as VA
from .param_io import load_params, save_params


def save_featurizer_bundle(out_path: str, params: Dict,
                           cfg: F.FeaturizerConfig) -> str:
    if not out_path.endswith(".npz"):
        out_path += ".npz"
    save_params(out_path, params)
    with open(out_path + ".json", "w") as f:
        json.dump(F.config_to_dict(cfg), f)
    return out_path


def load_featurizer_bundle(path: str
                           ) -> Tuple[Dict, Optional[F.FeaturizerConfig]]:
    """Returns (params, config-or-None). A plain ported .npz without the
    sidecar loads with config None (the caller falls back to presets)."""
    params = load_params(path)
    sidecar = path + ".json"
    cfg = None
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            cfg = F.config_from_dict(json.load(f))
    return params, cfg


# ---------------------------------------------------------------------------
# Production porting: diffusers snapshot directory -> bundle
# ---------------------------------------------------------------------------

_CLIP_BOS, _CLIP_EOS = 49406, 49407


def _empty_prompt_ids(length: int = 77, pad_id: int = _CLIP_EOS
                      ) -> np.ndarray:
    """Token ids of the empty prompt: [bos, eos, pad...]. SD1.5-style CLIP
    pads with eos; SD2.1/SDXL's second tokenizer pads with 0 ('!')."""
    ids = np.full((1, length), pad_id, np.int32)
    ids[0, 0] = _CLIP_BOS
    ids[0, 1] = _CLIP_EOS
    return ids


def _text_config(src_dir: str):
    from .port_cli import load_torch_state_dict
    from ..models.text_encoder import TextConfig
    with open(os.path.join(src_dir, "config.json")) as f:
        hf = json.load(f)
    tc = hf.get("text_config", hf)
    sd = load_torch_state_dict(src_dir)
    cfg = TextConfig(
        vocab_size=tc["vocab_size"], hidden_size=tc["hidden_size"],
        num_layers=tc["num_hidden_layers"],
        num_heads=tc["num_attention_heads"],
        intermediate_size=tc["intermediate_size"],
        hidden_act=tc.get("hidden_act", "quick_gelu"),
        max_positions=tc.get("max_position_embeddings", 77),
        eos_token_id=tc.get("eos_token_id", _CLIP_EOS),
        projection_dim=(tc.get("projection_dim", 0)
                        if "text_projection.weight" in sd else 0))
    return cfg, sd


def _encode_prompt(src_dir: str, prompt_ids: np.ndarray, *,
                   penultimate: bool, want_pooled: bool = False):
    """Port a CLIP text encoder from `src_dir` and run the fixed prompt
    through it on host (fp32). Returns (hidden [1,T,D], pooled or None)."""
    import jax
    import jax.numpy as jnp
    from ..core.precision import FP32_PRECISION
    from ..models.text_encoder import CLIPTextEncoder, port_clip_text

    cfg, sd = _text_config(src_dir)
    n_blocks = cfg.num_layers - 1 if penultimate else None
    params = port_clip_text(sd, cfg, num_blocks=None if want_pooled
                            else n_blocks)
    enc = CLIPTextEncoder(cfg, FP32_PRECISION)
    hidden, pooled = enc.apply({"params": params},
                               jnp.asarray(prompt_ids),
                               num_blocks=n_blocks,
                               want_pooled=want_pooled)
    hidden = np.asarray(hidden, np.float32)
    return hidden, (None if pooled is None
                    else np.asarray(pooled, np.float32))


def port_featurizer_bundle(kind: str, src_root: str, out_path: str, *,
                           t: int = 1, up_ft_index: Optional[int] = None,
                           ensemble_size: int = 1,
                           img_size: Optional[int] = None,
                           prompt_ids: Optional[np.ndarray] = None,
                           prompt_ids_2: Optional[np.ndarray] = None,
                           config: Optional[F.FeaturizerConfig] = None
                           ) -> str:
    """Assemble a bundle from a local diffusers snapshot directory
    (`unet/ vae/ text_encoder*/ transformer/ image_encoder/` sub-dirs).

    Mirrors the runtime assembly of the reference featurizers:
    `dift_sd.py:224-237` (SD1.5/2.1: UNet+VAE+CLIP text),
    `dift_imsd.py:195-230` (image-variations: CLIP image conditioning),
    `dift_dit.py:117-160` (DiT: timestep-only), `dift_sd3.py:105-135`
    (SD3: dual CLIP, T5 dropped -> zero-padded context).
    """
    from .port_cli import load_torch_state_dict
    from .diffusers_port import (port_dit, port_mmdit, port_unet,
                                 port_vae_encoder)

    name = {
        "sd15": "runwayml/stable-diffusion-v1-5",
        "sd21": "stabilityai/stable-diffusion-2-1",
        "imsd": "lambdalabs/sd-image-variations-diffusers",
        "sdxl": "stabilityai/stable-diffusion-xl-base-1.0",
        "dit": "facebook/DiT-XL-2-512",
        "sd3": "stabilityai/stable-diffusion-3-medium-diffusers",
    }[kind]
    cfg = config or F.FEATURIZER_PRESETS[name]()
    import dataclasses
    cfg = dataclasses.replace(
        cfg, t=t, ensemble_size=ensemble_size,
        up_ft_index=cfg.up_ft_index if up_ft_index is None else up_ft_index,
        img_size=img_size or cfg.img_size)

    def sub(d):
        return load_torch_state_dict(os.path.join(src_root, d))

    params: Dict = {}
    if cfg.family == "dit":
        params["backbone"] = port_dit(sub("transformer"), cfg.dit,
                                      (cfg.up_ft_index,))
        params["vae"] = port_vae_encoder(sub("vae"), cfg.vae)
    elif cfg.family == "sd3":
        params["backbone"] = port_mmdit(sub("transformer"), cfg.mmdit,
                                        (cfg.up_ft_index,))
        params["vae"] = port_vae_encoder(sub("vae"), cfg.vae)
        ids1 = prompt_ids if prompt_ids is not None else _empty_prompt_ids()
        ids2 = (prompt_ids_2 if prompt_ids_2 is not None
                else _empty_prompt_ids(pad_id=0))
        h1, p1 = _encode_prompt(os.path.join(src_root, "text_encoder"),
                                ids1, penultimate=True, want_pooled=True)
        h2, p2 = _encode_prompt(os.path.join(src_root, "text_encoder_2"),
                                ids2, penultimate=True, want_pooled=True)
        clip = np.concatenate([h1, h2], axis=-1)          # [1, 77, 2048]
        clip = np.pad(clip,
                      ((0, 0), (0, 0), (0, cfg.mmdit.context_dim
                                        - clip.shape[-1])))
        # T5 dropped (`dift_sd3.py:131-132`): its 256 context tokens are
        # zeros, as diffusers produces with text_encoder_3=None
        t5 = np.zeros((1, 256, cfg.mmdit.context_dim), np.float32)
        params["prompt_embeds"] = np.concatenate([clip, t5], axis=1)
        params["pooled"] = np.concatenate([p1, p2], axis=-1)  # [1, 2048]
    else:
        params["backbone"] = port_unet(sub("unet"), cfg.unet,
                                       (cfg.up_ft_index,))
        params["vae"] = port_vae_encoder(sub("vae"), cfg.vae)
        if cfg.family == "imsd":
            from .hf_port import port_clip_vision_pooled
            from ..models.vit import clip_l14
            params["image_encoder"] = port_clip_vision_pooled(
                sub("image_encoder"), clip_l14(224))
        elif cfg.family == "sdxl":
            ids1 = (prompt_ids if prompt_ids is not None
                    else _empty_prompt_ids())
            ids2 = (prompt_ids_2 if prompt_ids_2 is not None
                    else _empty_prompt_ids(pad_id=0))
            h1, _ = _encode_prompt(os.path.join(src_root, "text_encoder"),
                                   ids1, penultimate=True)
            h2, _ = _encode_prompt(os.path.join(src_root, "text_encoder_2"),
                                   ids2, penultimate=True)
            params["prompt_embeds"] = np.concatenate([h1, h2], axis=-1)
        else:                                             # sd15 / sd21
            ids = (prompt_ids if prompt_ids is not None
                   else _empty_prompt_ids())
            h, _ = _encode_prompt(os.path.join(src_root, "text_encoder"),
                                  ids, penultimate=False)
            params["prompt_embeds"] = h
    return save_featurizer_bundle(out_path, params, cfg)
