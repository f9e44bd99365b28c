"""LLaMA decoder golden tests vs HF torch, plus KV-cache decode parity."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from law_of_vision_representation_in_mllms_tpu.core.precision import FP32_PRECISION
from law_of_vision_representation_in_mllms_tpu.models import llama
from law_of_vision_representation_in_mllms_tpu.io.hf_port import port_llama


def _tiny_hf(seed=0):
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM
    hf_cfg = HFLlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False)
    torch.manual_seed(seed)
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, max_seq_len=128)
    params = jax.tree.map(jnp.asarray, port_llama(hf.state_dict(), cfg))
    return hf, cfg, params


def test_llama_forward_golden():
    hf, cfg, params = _tiny_hf()
    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.vocab_size, size=(2, 10))

    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()

    embeds = llama.embed_tokens(params, jnp.asarray(ids), FP32_PRECISION)
    positions = jnp.broadcast_to(jnp.arange(10)[None], (2, 10))
    h, _ = llama.forward(params, cfg, embeds, positions,
                         precision=FP32_PRECISION)
    logits = np.asarray(llama.logits_fn(params, h, FP32_PRECISION))
    np.testing.assert_allclose(logits, ref, atol=2e-4, rtol=1e-3)


def test_llama_padded_forward_matches_unpadded():
    _, cfg, params = _tiny_hf(1)
    rng = np.random.RandomState(1)
    ids = rng.randint(0, cfg.vocab_size, size=(1, 8))

    def run(ids_arr, mask, positions):
        embeds = llama.embed_tokens(params, jnp.asarray(ids_arr),
                                    FP32_PRECISION)
        h, _ = llama.forward(params, cfg, embeds, jnp.asarray(positions),
                             attn_mask=jnp.asarray(mask),
                             precision=FP32_PRECISION)
        return np.asarray(llama.logits_fn(params, h, FP32_PRECISION))

    full = run(ids, np.ones((1, 8), bool), np.arange(8)[None])
    padded_ids = np.concatenate([ids, np.zeros((1, 4), np.int64)], axis=1)
    mask = np.concatenate([np.ones((1, 8), bool), np.zeros((1, 4), bool)], 1)
    pos = np.concatenate([np.arange(8), np.zeros(4, np.int64)])[None]
    padded = run(padded_ids, mask, pos)
    np.testing.assert_allclose(padded[:, :8], full, atol=1e-5)


def test_kv_cache_decode_matches_full_forward():
    _, cfg, params = _tiny_hf(2)
    rng = np.random.RandomState(2)
    total = 12
    ids = rng.randint(0, cfg.vocab_size, size=(2, total))

    # full forward
    embeds = llama.embed_tokens(params, jnp.asarray(ids), FP32_PRECISION)
    positions = jnp.broadcast_to(jnp.arange(total)[None], (2, total))
    h, _ = llama.forward(params, cfg, embeds, positions,
                         precision=FP32_PRECISION)
    full_logits = np.asarray(llama.logits_fn(params, h, FP32_PRECISION))

    # prefill 8 + decode 4
    cache = llama.init_cache(cfg, 2, 16, dtype=jnp.float32)
    pre = 8
    h, cache = llama.forward(params, cfg, embeds[:, :pre],
                             positions[:, :pre], cache=cache, cache_index=0,
                             precision=FP32_PRECISION)
    step_logits = [np.asarray(llama.logits_fn(params, h, FP32_PRECISION))]
    for t in range(pre, total):
        h, cache = llama.forward(params, cfg, embeds[:, t:t + 1],
                                 positions[:, t:t + 1], cache=cache,
                                 cache_index=t, precision=FP32_PRECISION)
        step_logits.append(np.asarray(
            llama.logits_fn(params, h, FP32_PRECISION)))

    got = np.concatenate(step_logits, axis=1)
    np.testing.assert_allclose(got, full_logits, atol=1e-4, rtol=1e-3)


def test_causal_lm_loss_masking():
    logits = jnp.asarray(np.random.RandomState(3).randn(2, 6, 16),
                         jnp.float32)
    labels = np.full((2, 6), -100, np.int32)
    labels[0, 2] = 5
    loss = llama.causal_lm_loss(logits, jnp.asarray(labels))
    # only one valid target (position 2, predicted from logits at 1)
    logp = jax.nn.log_softmax(logits[0, 1])
    np.testing.assert_allclose(float(loss), float(-logp[5]), atol=1e-6)
