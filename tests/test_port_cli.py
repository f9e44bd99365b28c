"""End-to-end port: save a tiny HF snapshot to disk -> port_component ->
load_params -> forward parity with HF."""

import json
import os

import numpy as np
import torch
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.io.param_io import (
    save_params, load_params)
from law_of_vision_representation_in_mllms_tpu.io.port_cli import (
    port_component)


def test_param_io_roundtrip(tmp_path):
    tree = {"a": np.arange(4.0), "layers": [{"k": np.eye(2)},
                                            {"k": np.ones((2, 2))}],
            "nested": {"b": np.zeros(3)}}
    p = str(tmp_path / "p.npz")
    save_params(p, tree)
    back = load_params(p)
    assert isinstance(back["layers"], list) and len(back["layers"]) == 2
    np.testing.assert_array_equal(back["layers"][1]["k"], np.ones((2, 2)))
    np.testing.assert_array_equal(back["a"], np.arange(4.0))


def test_port_component_clip_snapshot(tmp_path):
    from transformers import CLIPVisionConfig, CLIPVisionModel
    hf_cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=3, num_attention_heads=4,
                              image_size=28, patch_size=7,
                              hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()
    snap = tmp_path / "snap"
    hf.save_pretrained(str(snap))  # writes config.json + safetensors

    out = str(tmp_path / "clip.npz")
    port_component("clip_vision", str(snap), out, select_layer=-2)
    params = load_params(out)
    # only blocks 0..num_layers-2 ported for select_layer=-2
    blocks = [k for k in params if k.startswith("block_")]
    assert len(blocks) == 2

    from law_of_vision_representation_in_mllms_tpu.models.vit import (
        ViTConfig, ViTTower)
    cfg = ViTConfig(image_size=28, patch_size=7, hidden_size=32,
                    num_layers=3, num_heads=4, intermediate_size=64)
    tower = ViTTower(cfg, select_layer=-2, precision=FP32_PRECISION)
    px = np.random.RandomState(0).randn(2, 28, 28, 3).astype(np.float32)
    feats = tower.apply({"params": {"encoder": params}}, jnp.asarray(px))
    with torch.no_grad():
        ref = hf(torch.from_numpy(px).permute(0, 3, 1, 2),
                 output_hidden_states=True).hidden_states[-2][:, 1:]
    np.testing.assert_allclose(np.asarray(feats), ref.numpy(), atol=1e-4,
                               rtol=1e-3)


def test_port_component_llama_snapshot(tmp_path):
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM
    hf_cfg = HFLlamaConfig(vocab_size=128, hidden_size=64,
                           intermediate_size=128, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           tie_word_embeddings=False)
    torch.manual_seed(1)
    hf = LlamaForCausalLM(hf_cfg).eval()
    snap = tmp_path / "llama"
    hf.save_pretrained(str(snap))

    out = str(tmp_path / "llama.npz")
    port_component("llama", str(snap), out)
    params = load_params(out)
    assert params["layers"]["wq"].shape == (2, 64, 64)

    from law_of_vision_representation_in_mllms_tpu.models import llama as L
    cfg = L.LlamaConfig(vocab_size=128, hidden_size=64,
                        intermediate_size=128, num_layers=2, num_heads=4,
                        num_kv_heads=2, rms_eps=1e-6)  # HF default eps
    ids = np.random.RandomState(0).randint(0, 128, size=(1, 6))
    params = {k: (jnp.asarray(v) if not isinstance(v, dict) else
                  {kk: jnp.asarray(vv) for kk, vv in v.items()})
              for k, v in params.items()}
    emb = L.embed_tokens(params, jnp.asarray(ids), FP32_PRECISION)
    h, _ = L.forward(params, cfg, emb, jnp.arange(6)[None],
                     precision=FP32_PRECISION)
    got = np.asarray(L.logits_fn(params, h, FP32_PRECISION))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)
