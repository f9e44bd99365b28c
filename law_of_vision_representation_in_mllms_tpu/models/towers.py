"""Tower registry + multi-tower specs.

Reference mapping: `llava/model/llava_arch.py:29-40` (`build_function_mapping`)
routes each HF model id to a builder; specs joined with '.' mean
feature concatenation along the channel dim (`llava_arch.py:164-168`,
`encode_images` concat at :281-284), ',' means MoF with per-tower projectors
(`llava_arch.py:169-181`).

Here a TowerSpec is data: a list of (name, kind, config) entries plus the
join mode. ViT towers run through models/vit.py; diffusion towers through
models/featurizer.py. The precomputed-feature pseudo-tower
(`builder.py:30-31`) becomes `kind="feature"` with a declared hidden size.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

from .vit import ViTConfig, VIT_PRESETS

# hidden sizes of diffusion feature towers
# (`diffusion_encoder.py:22-28` feature_hid_size_mapping)
DIFFUSION_HIDDEN_SIZES = {
    "runwayml/stable-diffusion-v1-5": 1280,
    "stabilityai/stable-diffusion-2-1": 1280,
    "stabilityai/stable-diffusion-xl-base-1.0": 1280,
    "lambdalabs/sd-image-variations-diffusers": 1280,
    "facebook/DiT-XL-2-512": 4608,
    "stabilityai/stable-diffusion-3-medium-diffusers": 6144,
    "runwayml/stable-diffusion-v1-5_feature": 1280,
}

VIT_FAMILIES = {
    "debug/tiny-vit": "clip",
    "openai/clip-vit-large-patch14": "clip",
    "openai/clip-vit-large-patch14-336": "clip",
    "laion/CLIP-ViT-L-14-laion2B-s32B-b82K": "clip",
    "google/siglip-base-patch16-224": "siglip",
    "facebook/dinov2-large": "dinov2",
    "facebook/dinov2-large-336": "dinov2",
}

# default image resolution fed to each diffusion tower
# (`train.py:88` img_size default 768; DiT/SD3 use 512 per
#  `C_score/extract_feature.py:57-62`)
DIFFUSION_IMG_SIZES = {
    "runwayml/stable-diffusion-v1-5": 768,
    "stabilityai/stable-diffusion-2-1": 768,
    "lambdalabs/sd-image-variations-diffusers": 768,
    "stabilityai/stable-diffusion-xl-base-1.0": 512,
    "facebook/DiT-XL-2-512": 512,
    "stabilityai/stable-diffusion-3-medium-diffusers": 512,
}


@dataclasses.dataclass(frozen=True)
class TowerEntry:
    name: str
    kind: str                      # "vit" | "diffusion" | "feature"
    vit_config: Optional[ViTConfig] = None
    vit_family: Optional[str] = None
    hidden_size: int = 0
    num_patches: int = 0
    # diffusion featurizer knobs (`train.py:83-88`)
    up_ft_index: int = 0
    t: int = 1
    prompt: str = ""
    ensemble_size: int = 1
    img_size: int = 768


@dataclasses.dataclass(frozen=True)
class TowerSpec:
    entries: List[TowerEntry]
    join: str                      # "concat" ('.') | "mof" (',') | "single"

    @property
    def mm_hidden_size(self) -> int:
        if self.join == "mof":
            raise ValueError("MoF has per-tower projectors")
        return sum(e.hidden_size for e in self.entries)

    @property
    def num_patches(self) -> int:
        if self.join == "mof":
            # token-interleaved; towers truncated to the common token count
            return len(self.entries) * min(e.num_patches
                                           for e in self.entries)
        n = {e.num_patches for e in self.entries}
        if len(n) != 1:
            raise ValueError(
                f"concat towers must agree on token count, got {n}")
        return n.pop()


def _make_entry(name: str, **overrides) -> TowerEntry:
    if name in VIT_FAMILIES:
        cfg = VIT_PRESETS[name]()
        return TowerEntry(name=name, kind="vit", vit_config=cfg,
                          vit_family=VIT_FAMILIES[name],
                          hidden_size=cfg.hidden_size,
                          num_patches=cfg.num_patches, **overrides)
    if name in DIFFUSION_HIDDEN_SIZES:
        if name.endswith("_feature"):
            return TowerEntry(name=name, kind="feature",
                              hidden_size=DIFFUSION_HIDDEN_SIZES[name],
                              num_patches=576, **overrides)
        img = overrides.pop("img_size", DIFFUSION_IMG_SIZES[name])
        up_ft = overrides.get("up_ft_index", 0)
        grid = diffusion_grid(name, img, up_ft)
        return TowerEntry(name=name, kind="diffusion",
                          hidden_size=DIFFUSION_HIDDEN_SIZES[name],
                          num_patches=grid * grid, img_size=img, **overrides)
    raise ValueError(f"Unknown vision tower: {name}")


def diffusion_grid(name: str, img_size: int, up_ft_index: int = 0) -> int:
    """Spatial grid of a diffusion tower's harvested feature map.

    SD UNets: VAE /8 latent; the harvest happens after up_block[i], whose
    trailing upsampler has already run for all but the final block
    (`dift_sd.py:117-151`). SD1.5/2.1/imsd have 3 downsamplers (4 blocks),
    SDXL has 2 (3 blocks). DiT/SD3 patchify the /8 latent by 2 and the
    featurizer 2x2-unfolds tokens (`dift_dit.py:192-195`), so /32 total.
    E.g. SD1.5 @768, up_ft 0 -> 24x24x1280 = 576 tokens, matching the dummy
    feature shape in `train.py:830-831`.
    """
    latent = img_size // 8
    if "DiT" in name or "diffusion-3" in name:
        return latent // 4
    n_up = 3 if "xl" in name else 4
    mid = latent >> (n_up - 1)
    return mid << min(up_ft_index + 1, n_up - 1)


def parse_tower_spec(spec: str, **overrides) -> TowerSpec:
    """Parse the reference's tower-spec strings.

    '.' joins => channel concat (shared projector); ',' => MoF.
    A single name => single tower.
    """
    if "," in spec:
        names, join = spec.split(","), "mof"
    elif "." in spec and not _is_single_name(spec):
        names, join = _split_dot(spec), "concat"
    else:
        names, join = [spec], "single"
    return TowerSpec(entries=[_make_entry(n, **overrides) for n in names],
                     join=join)


def _is_single_name(spec: str) -> bool:
    return spec in VIT_FAMILIES or spec in DIFFUSION_HIDDEN_SIZES


def _split_dot(spec: str):
    """Split on '.' but tower names themselves contain dots
    (e.g. 'stable-diffusion-2-1' has none, but 'sd1.5' style aliases and
    'patch14-336' do not use '.'; HF ids here are dot-free except version
    numbers in diffusion ids, which we protect by longest-match)."""
    known = sorted(list(VIT_FAMILIES) + list(DIFFUSION_HIDDEN_SIZES),
                   key=len, reverse=True)
    parts, rest = [], spec
    while rest:
        for k in known:
            if rest == k:
                parts.append(k)
                return parts
            if rest.startswith(k + "."):
                parts.append(k)
                rest = rest[len(k) + 1:]
                break
        else:
            parts.append(rest)
            return parts
    return parts
