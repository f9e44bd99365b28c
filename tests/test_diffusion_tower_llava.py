"""End-to-end: a diffusion tower (tiny SD UNet) as the LLaVA vision tower,
through splice + decoder loss — the diffLVLM training path
(`llava_arch.py:260-286` with `DiffVisionTower`)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/reference/diffusers/src")

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models import llama as L
from law_of_vision_representation_in_mllms_tpu.models import llava as M
from law_of_vision_representation_in_mllms_tpu.models import unet as UN
from law_of_vision_representation_in_mllms_tpu.models import vae as VA
from law_of_vision_representation_in_mllms_tpu.models import featurizer as F
from law_of_vision_representation_in_mllms_tpu.models.splice import (
    IGNORE_INDEX, IMAGE_TOKEN_INDEX)
from law_of_vision_representation_in_mllms_tpu.models.towers import (
    TowerSpec, TowerEntry)
from law_of_vision_representation_in_mllms_tpu.models.tower_runtime import (
    make_diffusion_apply)
from law_of_vision_representation_in_mllms_tpu.io.diffusers_port import (
    port_unet, port_vae_encoder)

diffusers = pytest.importorskip("diffusers")


def test_llava_with_diffusion_tower_loss():
    from diffusers import UNet2DConditionModel, AutoencoderKL
    torch.manual_seed(0)
    hf_unet = UNet2DConditionModel(
        sample_size=8, in_channels=4, out_channels=4,
        block_out_channels=(8, 16), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=2,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        norm_num_groups=4).eval()
    hf_vae = AutoencoderKL(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(8, 16), layers_per_block=1,
        down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, norm_num_groups=4).eval()

    fcfg = F.FeaturizerConfig(
        family="sd", t=1, up_ft_index=0, img_size=32,
        unet=UN.UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                           cross_attention_dim=16, num_heads=(2, None),
                           transformer_depth=(1, 0), norm_groups=4),
        vae=VA.VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                         latent_channels=4, norm_groups=4))

    # 32px -> latent 16 -> mid 8 -> up0 16x16 = 256 tokens, C=16
    entry = TowerEntry(name="tiny-sd", kind="diffusion", hidden_size=16,
                       num_patches=256, img_size=32)
    cfg = M.LlavaConfig(
        tower_spec=TowerSpec(entries=[entry], join="single"),
        decoder=L.tiny(vocab_size=64, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=4, intermediate_size=64))

    params = M.init_params(jax.random.PRNGKey(0), cfg, FP32_PRECISION,
                           init_towers=False)
    params["towers"] = [{
        "vae": port_vae_encoder(hf_vae.state_dict(), fcfg.vae),
        "backbone": port_unet(hf_unet.state_dict(), fcfg.unet, (0,)),
        "prompt_embeds": jnp.asarray(
            np.random.RandomState(1).randn(1, 5, 16).astype(np.float32)),
    }]

    diffusion_apply = make_diffusion_apply(
        deterministic=True, precision=FP32_PRECISION,
        config_overrides={"tiny-sd": fcfg})

    rng = np.random.RandomState(2)
    b, l = 2, 6
    ids = rng.randint(1, 60, size=(b, l)).astype(np.int32)
    ids[:, 0] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :2] = IGNORE_INDEX
    batch = {
        "input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
        "text_mask": jnp.ones((b, l), bool),
        "pixel_values": [jnp.asarray(
            (rng.rand(b, 32, 32, 3).astype(np.float32) - 0.5) * 2)],
    }
    loss = M.loss_fn(params, cfg, batch, FP32_PRECISION,
                     diffusion_apply=diffusion_apply)
    assert np.isfinite(float(loss))

    # gradient flows to projector+decoder, not to the frozen diffusion tower
    grads = jax.grad(lambda p: M.loss_fn(p, cfg, batch, FP32_PRECISION,
                                         diffusion_apply))(params)
    tower_norm = sum(float(jnp.sum(jnp.abs(g)))
                     for g in jax.tree.leaves(grads["towers"]))
    assert tower_norm == 0.0


def test_precomputed_feature_tower():
    """kind='feature' pass-through: the LazyFeatureDataset path
    (`llava_arch.py:301-302` encode_features)."""
    entry = TowerEntry(name="runwayml/stable-diffusion-v1-5_feature",
                       kind="feature", hidden_size=16, num_patches=8)
    cfg = M.LlavaConfig(
        tower_spec=TowerSpec(entries=[entry], join="single"),
        decoder=L.tiny(vocab_size=64, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=4, intermediate_size=64))
    params = M.init_params(jax.random.PRNGKey(1), cfg, FP32_PRECISION,
                           init_towers=False)
    params["towers"] = [{}]
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(2, 8, 16).astype(np.float32))
    out = M.encode_images(params, cfg, [feats], FP32_PRECISION)
    assert out.shape == (2, 8, 32)
