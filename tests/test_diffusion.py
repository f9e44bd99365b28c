"""Golden tests for the diffusion stack vs the vendored diffusers (torch).

The vendored diffusers tree (/root/reference/diffusers/src, v0.30.0.dev0 —
the version the reference pins for SD3 support) serves as the numeric oracle
on tiny random configs, exactly like transformers does for the ViT towers.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

sys.path.insert(0, "/root/reference/diffusers/src")

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models import unet as U
from law_of_vision_representation_in_mllms_tpu.models import vae as V
from law_of_vision_representation_in_mllms_tpu.models.diffusion_blocks import (
    ddim_alphas_cumprod, add_noise, timestep_embedding)
from law_of_vision_representation_in_mllms_tpu.io.diffusers_port import (
    port_unet, port_vae_encoder)

diffusers = pytest.importorskip("diffusers")


def _harvest_ref(hf_unet, sample, t, ctx, up_ft_indices, added_cond=None):
    """Run the vendored UNet exactly like MyUNet2DConditionModel
    (`dift_sd.py:9-155`): full down/mid, up blocks with harvest."""
    unet = hf_unet
    with torch.no_grad():
        ts = torch.tensor([t] * sample.shape[0])
        t_emb = unet.time_proj(ts).to(sample.dtype)
        emb = unet.time_embedding(t_emb)
        if added_cond is not None:
            aug = unet.add_embedding(torch.cat(
                [added_cond["text_embeds"],
                 unet.add_time_proj(added_cond["time_ids"].flatten())
                 .reshape(sample.shape[0], -1).to(sample.dtype)], dim=-1))
            emb = emb + aug
        x = unet.conv_in(sample)
        res = (x,)
        for db in unet.down_blocks:
            if hasattr(db, "has_cross_attention") and db.has_cross_attention:
                x, r = db(hidden_states=x, temb=emb,
                          encoder_hidden_states=ctx)
            else:
                x, r = db(hidden_states=x, temb=emb)
            res += r
        x = unet.mid_block(x, emb, encoder_hidden_states=ctx)
        out = {}
        for i, ub in enumerate(unet.up_blocks):
            if i > max(up_ft_indices):
                break
            rs = res[-len(ub.resnets):]
            res = res[:-len(ub.resnets)]
            if hasattr(ub, "has_cross_attention") and ub.has_cross_attention:
                x = ub(hidden_states=x, temb=emb,
                       res_hidden_states_tuple=rs,
                       encoder_hidden_states=ctx)
            else:
                x = ub(hidden_states=x, temb=emb, res_hidden_states_tuple=rs)
            if i in up_ft_indices:
                out[i] = x
        return out


def _nhwc(x):
    return np.ascontiguousarray(x.transpose(0, 2, 3, 1))


@pytest.mark.parametrize("style", ["sd15", "sd21", "sdxl"])
def test_unet_harvest_golden(style):
    from diffusers import UNet2DConditionModel
    torch.manual_seed(0)
    if style == "sd15":
        hf = UNet2DConditionModel(
            sample_size=8, in_channels=4, out_channels=4,
            block_out_channels=(8, 16), layers_per_block=1,
            cross_attention_dim=16, attention_head_dim=2,
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            norm_num_groups=4)
        cfg = U.UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                           cross_attention_dim=16, num_heads=(2, None),
                           transformer_depth=(1, 0), norm_groups=4)
        up_ft, added = (0, 1), None
    elif style == "sd21":
        hf = UNet2DConditionModel(
            sample_size=8, in_channels=4, out_channels=4,
            block_out_channels=(8, 16), layers_per_block=1,
            cross_attention_dim=16, attention_head_dim=(2, 4),
            down_block_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
            norm_num_groups=4, use_linear_projection=True,
            upcast_attention=True)
        cfg = U.UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                           cross_attention_dim=16, num_heads=(2, 4),
                           transformer_depth=(1, 1), norm_groups=4,
                           use_linear_projection=True, upcast_attention=True)
        up_ft, added = (0,), None
    else:  # sdxl-style text_time addition embedding + depth-2 transformer
        hf = UNet2DConditionModel(
            sample_size=8, in_channels=4, out_channels=4,
            block_out_channels=(8, 16), layers_per_block=1,
            cross_attention_dim=16, attention_head_dim=(2, 4),
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
            norm_num_groups=4, use_linear_projection=True,
            transformer_layers_per_block=(1, 2),
            addition_embed_type="text_time",
            addition_time_embed_dim=4,
            projection_class_embeddings_input_dim=8 + 6 * 4)
        cfg = U.UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                           cross_attention_dim=16, num_heads=(None, 4),
                           transformer_depth=(0, 2), norm_groups=4,
                           use_linear_projection=True,
                           addition_embed_type="text_time",
                           addition_time_embed_dim=4)
        up_ft = (0, 1)
        added = {"text_embeds": torch.randn(2, 8),
                 "time_ids": torch.randn(2, 6)}
    hf = hf.eval()

    rng = np.random.RandomState(0)
    sample = rng.randn(2, 4, 8, 8).astype(np.float32)
    ctx = rng.randn(2, 5, 16).astype(np.float32)
    t = 1

    ref = _harvest_ref(hf, torch.from_numpy(sample), t,
                       torch.from_numpy(ctx), up_ft, added)

    model = U.UNetHarvest(cfg, up_ft, FP32_PRECISION)
    params = port_unet(hf.state_dict(), cfg, up_ft)
    added_j = None
    if added is not None:
        added_j = {"text_embeds": jnp.asarray(added["text_embeds"].numpy()),
                   "time_ids": jnp.asarray(added["time_ids"].numpy())}
    got = model.apply({"params": params},
                      jnp.asarray(_nhwc(sample)), t,
                      jnp.asarray(ctx), added_j)
    for i in up_ft:
        np.testing.assert_allclose(
            np.asarray(got[i]), _nhwc(ref[i].numpy()),
            atol=3e-4, rtol=1e-3)


def test_vae_encoder_golden():
    from diffusers import AutoencoderKL
    torch.manual_seed(1)
    hf = AutoencoderKL(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(8, 16), layers_per_block=1,
        down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
        up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
        norm_num_groups=4).eval()
    cfg = V.VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                      latent_channels=4, norm_groups=4)
    params = port_vae_encoder(hf.state_dict(), cfg)

    rng = np.random.RandomState(2)
    px = rng.randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        post = hf.encode(torch.from_numpy(px)).latent_dist
        ref_moments = torch.cat([post.mean, post.logvar], dim=1).numpy()

    got = V.VAEEncoder(cfg, FP32_PRECISION).apply(
        {"params": params}, jnp.asarray(_nhwc(px)))
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref_moments),
                               atol=3e-5, rtol=1e-3)


def test_ddim_add_noise_golden():
    from diffusers import DDIMScheduler
    sch = DDIMScheduler(beta_start=0.00085, beta_end=0.012,
                        beta_schedule="scaled_linear",
                        num_train_timesteps=1000)
    rng = np.random.RandomState(3)
    lat = rng.randn(2, 4, 4, 4).astype(np.float32)
    noise = rng.randn(2, 4, 4, 4).astype(np.float32)
    for t in (1, 261, 999):
        ref = sch.add_noise(torch.from_numpy(lat), torch.from_numpy(noise),
                            torch.tensor(t)).numpy()
        acp = ddim_alphas_cumprod()
        got = np.asarray(add_noise(jnp.asarray(lat), jnp.asarray(noise), t,
                                   acp))
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_timestep_embedding_golden():
    from diffusers.models.embeddings import get_timestep_embedding
    ts = torch.tensor([0, 1, 10, 999])
    ref = get_timestep_embedding(ts, 32, flip_sin_to_cos=True,
                                 downscale_freq_shift=0.0).numpy()
    got = np.asarray(timestep_embedding(jnp.asarray(ts.numpy()), 32))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_unet_auto_flash_impl_parity(monkeypatch):
    """`diffusion_attn_impl="auto"` routes long self-attentions through the
    Pallas flash kernel inside the real UNet forward (threshold lowered so
    the tiny shapes take the flash branch, incl. the 5-token cross-attn
    kv); must match the exact-softmax forward."""
    from law_of_vision_representation_in_mllms_tpu.models import (
        diffusion_blocks as DB)

    cfg = U.UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                       cross_attention_dim=16, num_heads=(2, None),
                       transformer_depth=(1, 0), norm_groups=4)
    up_ft = (0, 1)
    model = U.UNetHarvest(cfg, up_ft, FP32_PRECISION)
    rng = np.random.RandomState(7)
    sample = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    ctx = jnp.asarray(rng.randn(2, 5, 16).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), sample, 1, ctx)
    try:
        DB.set_attn_impl(None)
        ref = model.apply(params, sample, 1, ctx)
        monkeypatch.setattr(DB, "_AUTO_FLASH_MIN_SEQ", 1)
        DB.set_attn_impl("auto")
        got = model.apply(params, sample, 1, ctx)
    finally:
        DB.set_attn_impl(None)
    for i in up_ft:
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(ref[i]),
                                   atol=2e-5, rtol=1e-4)
