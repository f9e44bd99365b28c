"""LoRA adapter tests: zero-init no-op, training effect, merge parity."""

import numpy as np
import jax
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models import llama as L
from law_of_vision_representation_in_mllms_tpu.models.lora import (
    LoraConfig, init_lora, merge_lora, lora_freeze_labels)


def _setup(seed=0):
    cfg = L.tiny(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                 num_kv_heads=2, intermediate_size=64)
    params = L.init_params(jax.random.PRNGKey(seed), cfg)
    lcfg = LoraConfig(rank=4, alpha=8.0)
    lora = init_lora(jax.random.PRNGKey(seed + 1), cfg, lcfg)
    ids = np.random.RandomState(seed).randint(0, 64, size=(2, 8))
    emb = L.embed_tokens(params, jnp.asarray(ids), FP32_PRECISION)
    pos = jnp.broadcast_to(jnp.arange(8)[None], (2, 8))
    return cfg, params, lcfg, lora, emb, pos


def _fwd(params, cfg, emb, pos, lora=None, scaling=1.0):
    h, _ = L.forward(params, cfg, emb, pos, precision=FP32_PRECISION,
                     lora=lora, lora_scaling=scaling)
    return np.asarray(h)


def test_zero_init_lora_is_noop():
    cfg, params, lcfg, lora, emb, pos = _setup()
    base = _fwd(params, cfg, emb, pos)
    with_lora = _fwd(params, cfg, emb, pos, lora, lcfg.scaling)
    np.testing.assert_allclose(with_lora, base, atol=1e-6)


def test_nonzero_lora_changes_output_and_merge_matches():
    cfg, params, lcfg, lora, emb, pos = _setup(1)
    # give B factors nonzero values
    lora = {k: (v if k.endswith("_a") else
                jnp.asarray(np.random.RandomState(2)
                            .randn(*v.shape).astype(np.float32) * 0.1))
            for k, v in lora.items()}
    base = _fwd(params, cfg, emb, pos)
    adapted = _fwd(params, cfg, emb, pos, lora, lcfg.scaling)
    assert np.abs(adapted - base).max() > 1e-4

    merged = merge_lora(params, lora, lcfg)
    merged_out = _fwd(merged, cfg, emb, pos)
    np.testing.assert_allclose(merged_out, adapted, atol=1e-4, rtol=1e-3)


def test_lora_freeze_labels():
    cfg, params, lcfg, lora, *_ = _setup(2)
    tree = {"decoder": params, "lora": lora,
            "projector": {"layers": []}, "towers": []}
    labels = lora_freeze_labels(tree)
    assert labels["lora"]["wq_a"] == "train"
    assert labels["decoder"]["embed"] == "freeze"
