"""One-step diffusion featurizers — the six diffusion towers as single
jittable programs.

Reference behavior (`diffusion_encoder.py DiffVisionTower` + the four
`dift_*.py` featurizers): VAE-encode the [-1,1] image, sample the posterior,
scale, add noise at a fixed timestep, run the backbone once, harvest the
feature map, ensemble-mean, and flatten to tokens [B, HW, C].

Family differences reproduced exactly:
- sd / imsd (SD1.5, SD2.1, image-variations): DDIM scaled-linear noise
  (`dift_sd.py:177-179`); conditioning = CLIP text embeds (sd) or the CLIP
  image embedding of the 224-bilinear-resized input (imsd,
  `dift_imsd.py:215-221` — NOTE: no CLIP pixel normalization).
- sdxl: same DDIM path; the text_time addition embedding is NEVER computed
  (MyUNet2DConditionModel.forward has no added-cond branch) — conditioning is
  the dual-text-encoder hidden[-2] concat only.
- dit: DDPM linear(0.0001, 0.02) noise; timestep-only adaLN conditioning;
  2x2 token unfold -> 4C channels (`dift_dit.py:192-195`).
- sd3: FlowMatch "add_noise" with RAW integer t (x_t = t x0 + (1-t) eps,
  `scheduling_flow_match_euler_discrete.py:192-206` — t=1 means clean
  latents); pooled text conditioning; same 2x2 unfold.

Prompts are fixed per run ('' in the whole pipeline, `train.py:85`), so text
conditioning is precomputed once (`precompute_text_conditioning`) and stored
with the tower params — zero per-step text-encoder cost, unlike the
reference, which re-encodes the prompt per forward.

Determinism: posterior sampling + noise use an explicit PRNG key
(deterministic=True uses the posterior mean and zero noise — bit-stable
feature caches for A/C-score parity runs).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.precision import Precision, DEFAULT_PRECISION
from . import unet as UN
from . import vae as VA
from . import dit as DT
from . import mmdit as MM
from .diffusion_blocks import ddim_alphas_cumprod, add_noise


@dataclasses.dataclass(frozen=True)
class FeaturizerConfig:
    family: str                       # sd | imsd | sdxl | dit | sd3
    t: int = 1
    up_ft_index: int = 0
    ensemble_size: int = 1
    img_size: int = 768
    unet: Optional[UN.UNetConfig] = None
    vae: Optional[VA.VAEConfig] = None
    dit: Optional[DT.DiTConfig] = None
    mmdit: Optional[MM.MMDiTConfig] = None
    # noise schedule
    beta_schedule: str = "scaled_linear"
    beta_start: float = 0.00085
    beta_end: float = 0.012


FEATURIZER_PRESETS = {
    "runwayml/stable-diffusion-v1-5": lambda: FeaturizerConfig(
        family="sd", unet=UN.sd15_unet(), vae=VA.sd_vae()),
    "stabilityai/stable-diffusion-2-1": lambda: FeaturizerConfig(
        family="sd", unet=UN.sd21_unet(), vae=VA.sd_vae()),
    "lambdalabs/sd-image-variations-diffusers": lambda: FeaturizerConfig(
        family="imsd", unet=UN.sd15_unet(), vae=VA.sd_vae()),
    "stabilityai/stable-diffusion-xl-base-1.0": lambda: FeaturizerConfig(
        family="sdxl", unet=UN.sdxl_unet(), vae=VA.sdxl_vae(), img_size=512),
    "facebook/DiT-XL-2-512": lambda: FeaturizerConfig(
        family="dit", dit=DT.dit_xl_2(), vae=VA.sd_vae(), img_size=512,
        up_ft_index=-1, beta_schedule="linear", beta_start=0.0001,
        beta_end=0.02),
    "stabilityai/stable-diffusion-3-medium-diffusers": lambda:
        FeaturizerConfig(family="sd3", mmdit=MM.sd3_medium(),
                         vae=VA.sd3_vae(), img_size=512, up_ft_index=-1),
}


def feature_grid(cfg: FeaturizerConfig) -> int:
    """Spatial side of the harvested token grid, derived from the ACTUAL
    architecture configs (towers.diffusion_grid hardcodes the production
    block counts; ported tiny/test models need the real math)."""
    vae_down = 2 ** (len(cfg.vae.block_out_channels) - 1)
    latent = cfg.img_size // vae_down
    if cfg.family == "dit":
        return latent // cfg.dit.patch_size // 2      # patchify + 2x2 unfold
    if cfg.family == "sd3":
        return latent // cfg.mmdit.patch_size // 2
    n_up = len(cfg.unet.block_out_channels)
    uf = cfg.up_ft_index % n_up
    mid = latent >> (n_up - 1)
    return mid << min(uf + 1, n_up - 1)


def feature_dim(cfg: FeaturizerConfig) -> int:
    """Channel width of the harvested tokens (the per-tower
    `feature_hid_size_mapping` of `diffusion_encoder.py:22-28`, computed
    instead of hardcoded)."""
    if cfg.family == "dit":
        return 4 * cfg.dit.hidden_size                # 2x2 unfold
    if cfg.family == "sd3":
        return 4 * cfg.mmdit.hidden_size
    n = len(cfg.unet.block_out_channels)
    uf = cfg.up_ft_index % n
    return cfg.unet.block_out_channels[n - 1 - uf]


def config_to_dict(cfg: FeaturizerConfig) -> Dict:
    """JSON-safe dict (bundle sidecar metadata)."""
    return dataclasses.asdict(cfg)


def config_from_dict(d: Dict) -> FeaturizerConfig:
    """Inverse of `config_to_dict` (JSON lists -> config tuples)."""
    def detuple(cls, sub):
        if sub is None:
            return None
        fixed = {k: tuple(v) if isinstance(v, list) else v
                 for k, v in sub.items()}
        return cls(**fixed)
    d = dict(d)
    d["unet"] = detuple(UN.UNetConfig, d.get("unet"))
    d["vae"] = detuple(VA.VAEConfig, d.get("vae"))
    d["dit"] = detuple(DT.DiTConfig, d.get("dit"))
    d["mmdit"] = detuple(MM.MMDiTConfig, d.get("mmdit"))
    return FeaturizerConfig(**d)


def _noisy_latents(params: Dict, cfg: FeaturizerConfig, pixel_values,
                   rng: Optional[jax.Array], *, deterministic: bool,
                   precision: Precision) -> jax.Array:
    """Shared featurization preamble: VAE encode -> (posterior mean |
    sampled) latents -> add noise at step t (flow-matching for sd3, DDIM
    otherwise). `deterministic` zeroes both stochastic inputs so feature
    caches are bit-stable."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_post, r_noise = jax.random.split(rng)
    moments = VA.VAEEncoder(cfg.vae, precision).apply(
        {"params": params["vae"]}, pixel_values)
    if deterministic:
        mean, _ = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
        if cfg.vae.shift_factor:
            mean = mean - cfg.vae.shift_factor
        latents = mean * cfg.vae.scaling_factor
        noise = jnp.zeros_like(latents)
    else:
        latents = VA.sample_latents(moments, r_post, cfg.vae)
        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
    if cfg.family == "sd3":
        noisy = MM.flow_match_add_noise(latents, noise, cfg.t)
    else:
        acp = ddim_alphas_cumprod(beta_start=cfg.beta_start,
                                  beta_end=cfg.beta_end,
                                  schedule=cfg.beta_schedule)
        noisy = add_noise(latents, noise, cfg.t, acp)
    return noisy.astype(precision.compute_dtype)


def extract_features(params: Dict, cfg: FeaturizerConfig, pixel_values,
                     rng: Optional[jax.Array] = None, *,
                     deterministic: bool = False,
                     precision: Precision = DEFAULT_PRECISION,
                     image_embed_fn=None):
    """pixel_values: [B, H, W, 3] in [-1, 1] -> tokens [B, P, C].

    params keys: "vae", "backbone", and conditioning buffers
    ("prompt_embeds" [1,T,D]; sd3 also "pooled" [1,D]); imsd requires
    `image_embed_fn(pixels_224) -> [B, D]` (the pooled CLIP vision encoder,
    its params live in params["image_encoder"]).
    """
    b = pixel_values.shape[0]
    e = cfg.ensemble_size
    if e > 1:
        pixel_values = jnp.repeat(pixel_values, e, axis=0)
    noisy = _noisy_latents(params, cfg, pixel_values, rng,
                           deterministic=deterministic, precision=precision)

    if cfg.family in ("sd", "imsd", "sdxl"):
        if cfg.family == "imsd":
            px224 = jax.image.resize(
                pixel_values, (pixel_values.shape[0], 224, 224, 3),
                method="bilinear")
            ctx = image_embed_fn(params["image_encoder"], px224)[:, None, :]
        else:
            ctx = jnp.broadcast_to(
                params["prompt_embeds"],
                (noisy.shape[0], *params["prompt_embeds"].shape[1:]))
        model = UN.UNetHarvest(cfg.unet, (cfg.up_ft_index,), precision)
        # NOTE: added_cond deliberately absent for sdxl (reference quirk)
        feat = model.apply({"params": params["backbone"]}, noisy, cfg.t,
                           ctx)[cfg.up_ft_index]
        bhw = feat.shape
        tokens = feat.reshape(bhw[0], bhw[1] * bhw[2], bhw[3])
    elif cfg.family == "dit":
        model = DT.DiTHarvest(cfg.dit, (cfg.up_ft_index,), precision)
        tokens = model.apply({"params": params["backbone"]}, noisy,
                             cfg.t)[cfg.up_ft_index]
        tokens = DT.unfold_tokens_2x2(tokens)
    elif cfg.family == "sd3":
        model = MM.MMDiTHarvest(cfg.mmdit, (cfg.up_ft_index,), precision)
        ctx = jnp.broadcast_to(
            params["prompt_embeds"],
            (noisy.shape[0], *params["prompt_embeds"].shape[1:]))
        pooled = jnp.broadcast_to(
            params["pooled"], (noisy.shape[0], *params["pooled"].shape[1:]))
        tokens = model.apply({"params": params["backbone"]}, noisy, cfg.t,
                             ctx, pooled)[cfg.up_ft_index]
        tokens = DT.unfold_tokens_2x2(tokens)
    else:
        raise ValueError(cfg.family)

    if e > 1:
        p, c = tokens.shape[1], tokens.shape[2]
        tokens = tokens.reshape(b, e, p, c).mean(axis=1)
    return tokens


def extract_multiscale_features(params: Dict, cfg: FeaturizerConfig,
                                pixel_values,
                                rng: Optional[jax.Array] = None, *,
                                deterministic: bool = False,
                                precision: Precision = DEFAULT_PRECISION,
                                pre_up_indices: Tuple[int, int, int] =
                                (0, 1, 2)) -> Dict[str, jax.Array]:
    """GeoAware-SC multi-scale SD harvest: {"s3", "s4", "s5"} NHWC maps.

    The reference taps ODISE's FeatureExtractorBackbone at UNet decoder
    blocks [2,5,8,11] (`C_score/model_utils/extractor_sd.py`), i.e. the last
    res/attn output at each decoder resolution BEFORE its upsampler; s2
    (stride 8) is discarded by the consumers (`preprocess_map.py:32`).
    Here: pre-upsample harvest indices 0/1/2 = s5/s4/s3 (strides 64/32/16;
    1280/1280/640 channels for SD1.5 — the AggregationNetwork's
    feature_dims). UNet-family featurizers only; the ported bundle must
    include up blocks through max(pre_up_indices) (port with
    up_ft_index >= 2).
    """
    if cfg.family not in ("sd", "sdxl"):
        raise ValueError("multi-scale harvest is a UNet-family feature "
                         f"(got family={cfg.family!r})")
    noisy = _noisy_latents(params, cfg, pixel_values, rng,
                           deterministic=deterministic, precision=precision)
    ctx = jnp.broadcast_to(
        params["prompt_embeds"],
        (noisy.shape[0], *params["prompt_embeds"].shape[1:]))
    i5, i4, i3 = pre_up_indices
    model = UN.UNetHarvest(cfg.unet, up_ft_indices=(), precision=precision,
                           pre_up_indices=tuple(pre_up_indices))
    got = model.apply({"params": params["backbone"]}, noisy, cfg.t, ctx)
    return {"s5": got[f"pre{i5}"], "s4": got[f"pre{i4}"],
            "s3": got[f"pre{i3}"]}
