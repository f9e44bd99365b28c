"""SD VAE encoder (AutoencoderKL.encode path only).

The featurizers VAE-encode the image, sample the diagonal gaussian, and scale
(`dift_sd.py OneStepSDPipeline.__call__:175`); the decoder is discarded
(`dift_sd.py:231` `vae.decoder = None`) — so only the encoder half exists
here. Behavioral reference: vendored diffusers `models/autoencoders/
autoencoder_kl.py` + `vae.py` Encoder.

SD1.5/2.1 VAE: block_out (128,256,512,512), 2 layers/block, latent 4ch,
scaling 0.18215. SDXL same trunk, scaling 0.13025. SD3: latent 16ch,
scaling 1.5305, shift 0.0609.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.precision import Precision, DEFAULT_PRECISION
from .diffusion_blocks import (Conv, GroupNorm, ResnetBlock, Downsample,
                               VAESelfAttention)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_groups: int = 32
    scaling_factor: float = 0.18215
    shift_factor: float = 0.0
    use_quant_conv: bool = True


def sd_vae() -> VAEConfig:
    return VAEConfig()


def sdxl_vae() -> VAEConfig:
    return VAEConfig(scaling_factor=0.13025)


def sd3_vae() -> VAEConfig:
    return VAEConfig(latent_channels=16, scaling_factor=1.5305,
                     shift_factor=0.0609, use_quant_conv=False)


TINY_TEST_CONFIG = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                             latent_channels=4, norm_groups=4)


class VAEEncoder(nn.Module):
    cfg: VAEConfig
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, pixel_values):
        """pixel_values: [B, H, W, 3] in [-1, 1] -> moments [B, h, w, 2*C]."""
        cfg, prec = self.cfg, self.precision
        x = Conv(cfg.block_out_channels[0], precision=prec,
                 name="conv_in")(pixel_values.astype(prec.compute_dtype))
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(ch, cfg.norm_groups, eps=1e-6,
                                use_temb=False, precision=prec,
                                name=f"down_{i}_res_{j}")(x)
            if i < n - 1:
                x = Downsample(ch, asymmetric_pad=True, precision=prec,
                               name=f"down_{i}_downsample")(x)
        mid = cfg.block_out_channels[-1]
        x = ResnetBlock(mid, cfg.norm_groups, eps=1e-6, use_temb=False,
                        precision=prec, name="mid_res_0")(x)
        x = VAESelfAttention(mid, cfg.norm_groups, precision=prec,
                             name="mid_attn")(x)
        x = ResnetBlock(mid, cfg.norm_groups, eps=1e-6, use_temb=False,
                        precision=prec, name="mid_res_1")(x)
        x = GroupNorm(cfg.norm_groups, 1e-6, prec, name="conv_norm_out")(x)
        x = jax.nn.silu(x)
        x = Conv(2 * cfg.latent_channels, precision=prec, name="conv_out")(x)
        if cfg.use_quant_conv:
            x = nn.Conv(2 * cfg.latent_channels, (1, 1),
                        dtype=prec.compute_dtype,
                        param_dtype=prec.param_dtype, name="quant_conv")(x)
        return x


def sample_latents(moments, rng, cfg: VAEConfig):
    """DiagonalGaussianDistribution.sample() then the pipeline's scaling
    (`dift_sd.py:175`): latents = sample * scaling (- shift for SD3-style
    VAEs is applied as (sample - shift) * scaling)."""
    mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(rng, mean.shape, jnp.float32)
    z = mean + std * eps
    if cfg.shift_factor:
        z = z - cfg.shift_factor
    return z * cfg.scaling_factor
