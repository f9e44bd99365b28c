"""End-to-end one-step featurizer golden tests (deterministic mode: posterior
mean + zero noise) vs a torch composition of the vendored diffusers parts."""

import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference/diffusers/src")

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models import featurizer as F
from law_of_vision_representation_in_mllms_tpu.models import unet as UN
from law_of_vision_representation_in_mllms_tpu.models import vae as VA
from law_of_vision_representation_in_mllms_tpu.models import dit as DT
from law_of_vision_representation_in_mllms_tpu.io.diffusers_port import (
    port_unet, port_vae_encoder, port_dit)

diffusers = pytest.importorskip("diffusers")


def _nhwc(x):
    return np.ascontiguousarray(x.transpose(0, 2, 3, 1))


def _tiny_vae(groups=4):
    from diffusers import AutoencoderKL
    return AutoencoderKL(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(8, 16), layers_per_block=1,
        down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
        up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
        norm_num_groups=groups).eval()


def test_sd_featurizer_deterministic_golden():
    from diffusers import UNet2DConditionModel, DDIMScheduler
    torch.manual_seed(0)
    hf_unet = UNet2DConditionModel(
        sample_size=8, in_channels=4, out_channels=4,
        block_out_channels=(8, 16), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=2,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        norm_num_groups=4).eval()
    hf_vae = _tiny_vae()
    sch = DDIMScheduler(beta_start=0.00085, beta_end=0.012,
                        beta_schedule="scaled_linear",
                        num_train_timesteps=1000)

    rng = np.random.RandomState(0)
    px = (rng.rand(2, 3, 32, 32).astype(np.float32) - 0.5) * 2
    prompt_embeds = rng.randn(1, 5, 16).astype(np.float32)
    t = 261
    scaling = hf_vae.config.scaling_factor

    # torch reference: OneStepSDPipeline semantics, deterministic
    with torch.no_grad():
        post = hf_vae.encode(torch.from_numpy(px)).latent_dist
        latents = post.mean * scaling
        noisy = sch.add_noise(latents, torch.zeros_like(latents),
                              torch.tensor(t))
        ts = torch.tensor([t] * 2)
        temb = hf_unet.time_embedding(hf_unet.time_proj(ts).to(noisy.dtype))
        x = hf_unet.conv_in(noisy)
        res = (x,)
        ctx = torch.from_numpy(prompt_embeds).repeat(2, 1, 1)
        for db in hf_unet.down_blocks:
            if getattr(db, "has_cross_attention", False):
                x, r = db(hidden_states=x, temb=temb,
                          encoder_hidden_states=ctx)
            else:
                x, r = db(hidden_states=x, temb=temb)
            res += r
        x = hf_unet.mid_block(x, temb, encoder_hidden_states=ctx)
        ub = hf_unet.up_blocks[0]
        rs = res[-len(ub.resnets):]
        x = ub(hidden_states=x, temb=temb, res_hidden_states_tuple=rs)
        ref_map = x.numpy()                       # harvested up_ft[0]
    ref_tokens = _nhwc(ref_map).reshape(2, -1, ref_map.shape[1])

    cfg = F.FeaturizerConfig(
        family="sd", t=t, up_ft_index=0, img_size=32,
        unet=UN.UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                           cross_attention_dim=16, num_heads=(2, None),
                           transformer_depth=(1, 0), norm_groups=4),
        vae=VA.VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                         latent_channels=4, norm_groups=4,
                         scaling_factor=scaling))
    params = {
        "vae": port_vae_encoder(hf_vae.state_dict(), cfg.vae),
        "backbone": port_unet(hf_unet.state_dict(), cfg.unet, (0,)),
        "prompt_embeds": jnp.asarray(prompt_embeds),
    }
    got = F.extract_features(params, cfg, jnp.asarray(_nhwc(px)),
                             deterministic=True, precision=FP32_PRECISION)
    np.testing.assert_allclose(np.asarray(got), ref_tokens, atol=5e-4,
                               rtol=1e-3)


def test_dit_featurizer_deterministic_golden():
    from diffusers import DiTTransformer2DModel, DDPMScheduler
    torch.manual_seed(1)
    hf_dit = DiTTransformer2DModel(
        num_attention_heads=2, attention_head_dim=8, in_channels=4,
        num_layers=3, sample_size=8, patch_size=2, num_embeds_ada_norm=10,
        norm_type="ada_norm_zero").eval()
    hf_vae = _tiny_vae()
    sch = DDPMScheduler(beta_start=0.0001, beta_end=0.02,
                        beta_schedule="linear", num_train_timesteps=1000)

    rng = np.random.RandomState(2)
    px = (rng.rand(2, 3, 32, 32).astype(np.float32) - 0.5) * 2
    t = 1
    scaling = hf_vae.config.scaling_factor

    with torch.no_grad():
        post = hf_vae.encode(torch.from_numpy(px)).latent_dist
        latents = post.mean * scaling
        noisy = sch.add_noise(latents, torch.zeros_like(latents),
                              torch.tensor([t, t]))
        # timestep-only DiT harvest at -1 (test_dit_mmdit has the oracle)
        from tests.test_dit_mmdit import _ref_dit_harvest
        ref = _ref_dit_harvest(hf_dit, noisy, t, (-1,))[-1]
        h = w = int(ref.shape[1] ** 0.5)
        r = ref.transpose(2, 1).reshape(2, -1, h, w)
        r = r.unfold(3, 2, 2).unfold(2, 2, 2)
        r = r.reshape(2, -1, h // 2, w // 2, 4).permute(0, 4, 1, 2, 3)
        r = r.reshape(2, -1, h // 2, w // 2)
        ref_tokens = _nhwc(r.numpy()).reshape(2, -1, r.shape[1])

    cfg = F.FeaturizerConfig(
        family="dit", t=t, up_ft_index=-1, img_size=32,
        beta_schedule="linear", beta_start=0.0001, beta_end=0.02,
        dit=DT.DiTConfig(in_channels=4, hidden_size=16, num_layers=3,
                         num_heads=2, sample_size=8),
        vae=VA.VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                         latent_channels=4, norm_groups=4,
                         scaling_factor=scaling))
    params = {
        "vae": port_vae_encoder(hf_vae.state_dict(), cfg.vae),
        "backbone": port_dit(hf_dit.state_dict(), cfg.dit, (-1,)),
    }
    got = F.extract_features(params, cfg, jnp.asarray(_nhwc(px)),
                             deterministic=True, precision=FP32_PRECISION)
    np.testing.assert_allclose(np.asarray(got), ref_tokens, atol=5e-4,
                               rtol=1e-3)


def test_ensemble_mean_and_determinism():
    """ensemble_size>1 averages features over repeated noisy samples, and a
    fixed PRNG key reproduces features exactly."""
    from diffusers import UNet2DConditionModel
    torch.manual_seed(3)
    hf_unet = UNet2DConditionModel(
        sample_size=8, in_channels=4, out_channels=4,
        block_out_channels=(8, 16), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=2,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        norm_num_groups=4).eval()
    hf_vae = _tiny_vae()
    cfg = F.FeaturizerConfig(
        family="sd", t=261, up_ft_index=0, ensemble_size=2, img_size=32,
        unet=UN.UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                           cross_attention_dim=16, num_heads=(2, None),
                           transformer_depth=(1, 0), norm_groups=4),
        vae=VA.VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                         latent_channels=4, norm_groups=4))
    params = {
        "vae": port_vae_encoder(hf_vae.state_dict(), cfg.vae),
        "backbone": port_unet(hf_unet.state_dict(), cfg.unet, (0,)),
        "prompt_embeds": jnp.asarray(
            np.random.RandomState(4).randn(1, 5, 16).astype(np.float32)),
    }
    px = jnp.asarray((np.random.RandomState(5).rand(2, 32, 32, 3)
                      .astype(np.float32) - 0.5) * 2)
    key = jax.random.PRNGKey(42)
    a = F.extract_features(params, cfg, px, key, precision=FP32_PRECISION)
    b = F.extract_features(params, cfg, px, key, precision=FP32_PRECISION)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # 32px -> 16px latent -> mid 8 -> up0 out 16x16 = 256 tokens, C=16
    assert a.shape == (2, 256, 16)  # ensemble collapsed back to B=2


def test_imsd_featurizer_conditioning_golden():
    """image-variations family: conditioning = CLIP image embeds of the
    bilinear-resized RAW [-1,1] pixels (`dift_imsd.py:215-221`), end-to-end
    deterministic vs a torch composition."""
    from diffusers import UNet2DConditionModel, AutoencoderKL, DDIMScheduler
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection
    from law_of_vision_representation_in_mllms_tpu.models.vit import (
        ViTConfig)
    from law_of_vision_representation_in_mllms_tpu.models.tower_runtime import (
        make_image_embed_fn)
    from law_of_vision_representation_in_mllms_tpu.io.hf_port import (
        port_clip_vision_pooled)

    torch.manual_seed(7)
    hf_unet = UNet2DConditionModel(
        sample_size=8, in_channels=4, out_channels=4,
        block_out_channels=(8, 16), layers_per_block=1,
        cross_attention_dim=12, attention_head_dim=2,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        norm_num_groups=4).eval()
    hf_vae = _tiny_vae()
    hf_clip = CLIPVisionModelWithProjection(CLIPVisionConfig(
        hidden_size=16, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, image_size=224, patch_size=32,
        projection_dim=12)).eval()

    vit_cfg = ViTConfig(image_size=224, patch_size=32, hidden_size=16,
                        num_layers=2, num_heads=2, intermediate_size=32)
    clip_params = port_clip_vision_pooled(hf_clip.state_dict(), vit_cfg)
    embed_fn = make_image_embed_fn(vit_cfg, projection_dim=12,
                                   precision=FP32_PRECISION)

    rng = np.random.RandomState(7)
    px = (rng.rand(2, 3, 32, 32).astype(np.float32) - 0.5) * 2
    t = 261
    sch = DDIMScheduler(beta_start=0.00085, beta_end=0.012,
                        beta_schedule="scaled_linear",
                        num_train_timesteps=1000)

    with torch.no_grad():
        px224 = torch.nn.functional.interpolate(
            torch.from_numpy(px), size=(224, 224), mode="bilinear")
        img_emb = hf_clip(px224).image_embeds[:, None, :]   # [B,1,12]
        post = hf_vae.encode(torch.from_numpy(px)).latent_dist
        latents = post.mean * hf_vae.config.scaling_factor
        noisy = sch.add_noise(latents, torch.zeros_like(latents),
                              torch.tensor(t))
        ts = torch.tensor([t] * 2)
        temb = hf_unet.time_embedding(hf_unet.time_proj(ts).to(noisy.dtype))
        x = hf_unet.conv_in(noisy)
        res = (x,)
        for db in hf_unet.down_blocks:
            if getattr(db, "has_cross_attention", False):
                x, r = db(hidden_states=x, temb=temb,
                          encoder_hidden_states=img_emb)
            else:
                x, r = db(hidden_states=x, temb=temb)
            res += r
        x = hf_unet.mid_block(x, temb, encoder_hidden_states=img_emb)
        ub = hf_unet.up_blocks[0]
        x = ub(hidden_states=x, temb=temb,
               res_hidden_states_tuple=res[-len(ub.resnets):])
        ref = _nhwc(x.numpy()).reshape(2, -1, x.shape[1])

    cfg = F.FeaturizerConfig(
        family="imsd", t=t, up_ft_index=0, img_size=32,
        unet=UN.UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                           cross_attention_dim=12, num_heads=(2, None),
                           transformer_depth=(1, 0), norm_groups=4),
        vae=VA.VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                         latent_channels=4, norm_groups=4,
                         scaling_factor=hf_vae.config.scaling_factor))
    params = {
        "vae": port_vae_encoder(hf_vae.state_dict(), cfg.vae),
        "backbone": port_unet(hf_unet.state_dict(), cfg.unet, (0,)),
        "image_encoder": clip_params,
    }
    got = F.extract_features(params, cfg, jnp.asarray(_nhwc(px)),
                             deterministic=True, precision=FP32_PRECISION,
                             image_embed_fn=embed_fn)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3, rtol=1e-2)


def test_sdxl_featurizer_skips_addition_embedding():
    """sdxl family: the reference quirk — text_time addition embedding is
    never computed (MyUNet2DConditionModel has no added-cond branch), so the
    featurizer conditions on the time embedding + prompt context only."""
    from diffusers import UNet2DConditionModel
    torch.manual_seed(9)
    hf_unet = UNet2DConditionModel(
        sample_size=8, in_channels=4, out_channels=4,
        block_out_channels=(8, 16), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=(2, 4),
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        norm_num_groups=4, use_linear_projection=True,
        transformer_layers_per_block=(1, 2),
        addition_embed_type="text_time", addition_time_embed_dim=4,
        projection_class_embeddings_input_dim=8 + 6 * 4).eval()
    hf_vae = _tiny_vae()

    cfg = F.FeaturizerConfig(
        family="sdxl", t=261, up_ft_index=0, img_size=32,
        unet=UN.UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                           cross_attention_dim=16, num_heads=(None, 4),
                           transformer_depth=(0, 2), norm_groups=4,
                           use_linear_projection=True,
                           addition_embed_type="text_time",
                           addition_time_embed_dim=4),
        vae=VA.VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                         latent_channels=4, norm_groups=4,
                         scaling_factor=hf_vae.config.scaling_factor))
    rng = np.random.RandomState(9)
    px = (rng.rand(2, 3, 32, 32).astype(np.float32) - 0.5) * 2
    params = {
        "vae": port_vae_encoder(hf_vae.state_dict(), cfg.vae),
        "backbone": port_unet(hf_unet.state_dict(), cfg.unet, (0,)),
        "prompt_embeds": jnp.asarray(rng.randn(1, 5, 16)
                                     .astype(np.float32)),
    }
    got = F.extract_features(params, cfg, jnp.asarray(_nhwc(px)),
                             deterministic=True, precision=FP32_PRECISION)

    # torch oracle: UNet WITHOUT the addition embedding (reference quirk)
    from diffusers import DDIMScheduler
    sch = DDIMScheduler(beta_start=0.00085, beta_end=0.012,
                        beta_schedule="scaled_linear",
                        num_train_timesteps=1000)
    with torch.no_grad():
        post = hf_vae.encode(torch.from_numpy(px)).latent_dist
        latents = post.mean * hf_vae.config.scaling_factor
        noisy = sch.add_noise(latents, torch.zeros_like(latents),
                              torch.tensor(261))
        ts = torch.tensor([261] * 2)
        temb = hf_unet.time_embedding(
            hf_unet.time_proj(ts).to(noisy.dtype))   # NO add_embedding
        x = hf_unet.conv_in(noisy)
        res = (x,)
        ctx = torch.from_numpy(np.asarray(params["prompt_embeds"])
                               ).repeat(2, 1, 1)
        for db in hf_unet.down_blocks:
            if getattr(db, "has_cross_attention", False):
                x, r = db(hidden_states=x, temb=temb,
                          encoder_hidden_states=ctx)
            else:
                x, r = db(hidden_states=x, temb=temb)
            res += r
        x = hf_unet.mid_block(x, temb, encoder_hidden_states=ctx)
        ub = hf_unet.up_blocks[0]
        x = ub(hidden_states=x, temb=temb,
               res_hidden_states_tuple=res[-len(ub.resnets):],
               encoder_hidden_states=ctx)
        ref = _nhwc(x.numpy()).reshape(2, -1, x.shape[1])
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-3, rtol=1e-2)
