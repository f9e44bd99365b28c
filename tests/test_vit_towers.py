"""Golden-activation tests: our parameterized ViT vs HF torch on tiny configs.

The reference has no tests at all (SURVEY.md §4); these pin the numerics of
the tower zoo so ported real checkpoints reproduce reference features.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch

from law_of_vision_representation_in_mllms_tpu.core.precision import FP32_PRECISION
from law_of_vision_representation_in_mllms_tpu.models.vit import (
    ViTConfig, ViTEncoder, ViTTower)
from law_of_vision_representation_in_mllms_tpu.io.hf_port import (
    port_clip_vision, port_siglip_vision, port_dinov2)

TINY = dict(image_size=28, patch_size=7, hidden_size=32, num_layers=3,
            num_heads=4, intermediate_size=64)


def _rand_pixels(cfg, batch=2, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(batch, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    return x


def _run_ours(cfg, params, pixels, n_blocks):
    enc = ViTEncoder(cfg, FP32_PRECISION)
    _, hs = enc.apply({"params": params}, jnp.asarray(pixels),
                      num_blocks=n_blocks, output_hidden_states=True)
    return [np.asarray(h) for h in hs]


def _assert_close(ours, theirs, atol=6e-5):
    np.testing.assert_allclose(ours, theirs, atol=atol, rtol=1e-4)


@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
def test_clip_vision_golden(act):
    from transformers import CLIPVisionConfig, CLIPVisionModel
    hf_cfg = CLIPVisionConfig(
        hidden_size=TINY["hidden_size"], intermediate_size=TINY[
            "intermediate_size"], num_hidden_layers=TINY["num_layers"],
        num_attention_heads=TINY["num_heads"], image_size=TINY["image_size"],
        patch_size=TINY["patch_size"], hidden_act=act)
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()

    cfg = ViTConfig(hidden_act=act, use_class_token=True,
                    use_pre_layernorm=True, patch_bias=False, **TINY)
    params = port_clip_vision(hf.state_dict(), cfg)
    pixels = _rand_pixels(cfg)

    with torch.no_grad():
        out = hf(torch.from_numpy(pixels).permute(0, 3, 1, 2),
                 output_hidden_states=True)
    hs_ref = [h.numpy() for h in out.hidden_states]

    hs = _run_ours(cfg, params, pixels, cfg.num_layers)
    assert len(hs) == len(hs_ref)
    for a, b in zip(hs, hs_ref):
        _assert_close(a, b)


def test_siglip_vision_golden():
    from transformers import SiglipVisionConfig, SiglipVisionModel
    hf_cfg = SiglipVisionConfig(
        hidden_size=TINY["hidden_size"], intermediate_size=TINY[
            "intermediate_size"], num_hidden_layers=TINY["num_layers"],
        num_attention_heads=TINY["num_heads"], image_size=TINY["image_size"],
        patch_size=TINY["patch_size"])
    torch.manual_seed(1)
    hf = SiglipVisionModel(hf_cfg).eval()

    cfg = ViTConfig(hidden_act="gelu_tanh", layer_norm_eps=1e-6,
                    use_class_token=False, use_pre_layernorm=False,
                    patch_bias=True, **TINY)
    params = port_siglip_vision(hf.state_dict(), cfg)
    pixels = _rand_pixels(cfg, seed=1)

    with torch.no_grad():
        out = hf(torch.from_numpy(pixels).permute(0, 3, 1, 2),
                 output_hidden_states=True)
    hs_ref = [h.numpy() for h in out.hidden_states]

    hs = _run_ours(cfg, params, pixels, cfg.num_layers)
    for a, b in zip(hs, hs_ref):
        _assert_close(a, b)


def test_dinov2_golden():
    from transformers import Dinov2Config, Dinov2Model
    hf_cfg = Dinov2Config(
        hidden_size=TINY["hidden_size"], intermediate_size=TINY[
            "intermediate_size"], num_hidden_layers=TINY["num_layers"],
        num_attention_heads=TINY["num_heads"], image_size=TINY["image_size"],
        patch_size=TINY["patch_size"], mlp_ratio=2)
    torch.manual_seed(2)
    hf = Dinov2Model(hf_cfg).eval()

    cfg = ViTConfig(hidden_act="gelu", layer_norm_eps=1e-6,
                    use_class_token=True, use_pre_layernorm=False,
                    patch_bias=True, use_layerscale=True, **TINY)
    params = port_dinov2(hf.state_dict(), cfg)
    pixels = _rand_pixels(cfg, seed=2)

    with torch.no_grad():
        out = hf(torch.from_numpy(pixels).permute(0, 3, 1, 2),
                 output_hidden_states=True)
    hs_ref = [h.numpy() for h in out.hidden_states]

    hs = _run_ours(cfg, params, pixels, cfg.num_layers)
    for a, b in zip(hs, hs_ref):
        _assert_close(a, b)


def test_dinov2_pos_interpolation():
    """Port-time pos-embed interpolation == HF runtime interpolation."""
    from transformers import Dinov2Config, Dinov2Model
    hf_cfg = Dinov2Config(
        hidden_size=TINY["hidden_size"], intermediate_size=TINY[
            "intermediate_size"], num_hidden_layers=TINY["num_layers"],
        num_attention_heads=TINY["num_heads"], image_size=14,
        patch_size=7, mlp_ratio=2)  # trained at 2x2 grid
    torch.manual_seed(3)
    hf = Dinov2Model(hf_cfg).eval()

    cfg = ViTConfig(hidden_act="gelu", layer_norm_eps=1e-6,
                    use_class_token=True, use_pre_layernorm=False,
                    patch_bias=True, use_layerscale=True,
                    image_size=28, patch_size=7, hidden_size=32,
                    num_layers=3, num_heads=4, intermediate_size=64)
    params = port_dinov2(hf.state_dict(), cfg)  # interpolates 2x2 -> 4x4
    pixels = _rand_pixels(cfg, seed=3)

    with torch.no_grad():
        out = hf(torch.from_numpy(pixels).permute(0, 3, 1, 2),
                 output_hidden_states=True)
    hs_ref = [h.numpy() for h in out.hidden_states]
    hs = _run_ours(cfg, params, pixels, cfg.num_layers)
    for a, b in zip(hs, hs_ref):
        _assert_close(a, b, atol=1e-4)


def test_tower_select_layer_and_patch_drop():
    """ViTTower(select_layer=-2) == hidden_states[-2] minus CLS, with fewer
    compiled blocks."""
    cfg = ViTConfig(use_class_token=True, use_pre_layernorm=True,
                    patch_bias=False, **TINY)
    tower = ViTTower(cfg, select_layer=-2, select_feature="patch",
                     precision=FP32_PRECISION)
    pixels = jnp.asarray(_rand_pixels(cfg, seed=4))
    variables = tower.init(jax.random.PRNGKey(0), pixels)

    # tower params should only contain blocks 0..num_layers-2
    blocks = [k for k in variables["params"]["encoder"] if
              k.startswith("block_")]
    assert len(blocks) == cfg.num_layers - 1

    feats = tower.apply(variables, pixels)
    assert feats.shape == (2, cfg.num_patches, cfg.hidden_size)

    enc = ViTEncoder(cfg, FP32_PRECISION)
    full_vars = {"params": dict(variables["params"]["encoder"])}
    # add a dummy last block so full encoder can run all layers
    _, hs = enc.apply(full_vars, pixels, num_blocks=cfg.num_layers - 1,
                      output_hidden_states=True)
    np.testing.assert_allclose(np.asarray(feats),
                               np.asarray(hs[-1][:, 1:]), atol=1e-6)


def test_bf16_tower_precision_quality():
    """BF16_TOWER_PRECISION (bf16 attention logits + softmax — the round-2
    throughput default) must stay feature-faithful to the fp32 path:
    per-token cosine > 0.99 on a small ViT. Guards against precision
    regressions in the fast path (the reference runs towers in fp16)."""
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        BF16_TOWER_PRECISION, FP32_PRECISION)
    from law_of_vision_representation_in_mllms_tpu.models.vit import (
        ViTConfig, ViTTower)

    cfg = ViTConfig(image_size=56, patch_size=14, hidden_size=64,
                    num_layers=4, num_heads=4, intermediate_size=128)
    rng = np.random.RandomState(0)
    px = jnp.asarray(rng.randn(2, 56, 56, 3).astype(np.float32))
    t32 = ViTTower(cfg, -2, "patch", FP32_PRECISION)
    params = t32.init(jax.random.PRNGKey(0), px)["params"]
    f32 = np.asarray(t32.apply({"params": params}, px), np.float32)

    t16 = ViTTower(cfg, -2, "patch", BF16_TOWER_PRECISION)
    p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    f16 = np.asarray(t16.apply({"params": p16}, px), np.float32)

    num = (f32 * f16).sum(-1)
    den = (np.linalg.norm(f32, axis=-1) * np.linalg.norm(f16, axis=-1)
           + 1e-8)
    cos = num / den
    assert cos.min() > 0.99, float(cos.min())


def test_tower_fast_act_config_swaps_erf_gelu_only():
    """model.tower_fast_act substitutes tanh-GELU only into erf-gelu
    towers (DINOv2/OpenCLIP); quick-gelu CLIP towers are untouched."""
    from law_of_vision_representation_in_mllms_tpu.core.config import (
        RunConfig)
    from law_of_vision_representation_in_mllms_tpu.train.runner import (
        build_model)
    cfg = RunConfig.from_dict({
        "model": {"vision_tower":
                  "facebook/dinov2-large.openai/clip-vit-large-patch14",
                  "decoder": "tiny", "tower_fast_act": True}})
    model_cfg, _ = build_model(cfg)
    acts = [e.vit_config.hidden_act for e in model_cfg.tower_spec.entries]
    assert acts == ["gelu_tanh", "quick_gelu"]
