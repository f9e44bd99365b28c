"""CLIP text encoder golden tests vs HF CLIPTextModel(WithProjection)."""

import numpy as np
import torch
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models.text_encoder import (
    TextConfig, CLIPTextEncoder, port_clip_text)


def _tiny(proj=0, seed=0):
    from transformers import CLIPTextConfig, CLIPTextModel, \
        CLIPTextModelWithProjection
    hf_cfg = CLIPTextConfig(vocab_size=99, hidden_size=32,
                            intermediate_size=64, num_hidden_layers=3,
                            num_attention_heads=4,
                            max_position_embeddings=16, eos_token_id=98,
                            bos_token_id=97, projection_dim=proj or 32)
    torch.manual_seed(seed)
    cls = CLIPTextModelWithProjection if proj else CLIPTextModel
    hf = cls(hf_cfg).eval()
    cfg = TextConfig(vocab_size=99, hidden_size=32, num_layers=3,
                     num_heads=4, intermediate_size=64, max_positions=16,
                     eos_token_id=98, projection_dim=proj)
    return hf, cfg


def _ids(rng, b=2, s=10):
    ids = rng.randint(1, 96, size=(b, s))
    ids[:, -1] = 98  # eos
    return ids


def test_text_encoder_golden():
    hf, cfg = _tiny()
    rng = np.random.RandomState(0)
    ids = _ids(rng)
    with torch.no_grad():
        out = hf(torch.from_numpy(ids), output_hidden_states=True)
    params = port_clip_text(hf.state_dict(), cfg)
    enc = CLIPTextEncoder(cfg, FP32_PRECISION)
    hidden, pooled = enc.apply({"params": params}, jnp.asarray(ids),
                               want_pooled=True)
    np.testing.assert_allclose(np.asarray(hidden),
                               out.last_hidden_state.numpy(), atol=5e-5,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(pooled),
                               out.pooler_output.numpy(), atol=5e-5,
                               rtol=1e-3)


def test_text_encoder_penultimate_and_projection():
    hf, cfg = _tiny(proj=16, seed=1)
    rng = np.random.RandomState(1)
    ids = _ids(rng)
    with torch.no_grad():
        out = hf(torch.from_numpy(ids), output_hidden_states=True)
    params = port_clip_text(hf.state_dict(), cfg)
    enc = CLIPTextEncoder(cfg, FP32_PRECISION)
    # hidden_states[-2] (SDXL/SD3 protocol): run num_layers-1 blocks
    hidden, _ = enc.apply({"params": params}, jnp.asarray(ids),
                          num_blocks=cfg.num_layers - 1)
    np.testing.assert_allclose(np.asarray(hidden),
                               out.hidden_states[-2].numpy(), atol=5e-5,
                               rtol=1e-3)
    # pooled projection
    _, pooled = enc.apply({"params": params}, jnp.asarray(ids),
                          want_pooled=True)
    np.testing.assert_allclose(np.asarray(pooled),
                               out.text_embeds.numpy(), atol=5e-5, rtol=1e-3)
