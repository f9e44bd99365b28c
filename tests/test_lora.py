"""LoRA adapter tests: zero-init no-op, training effect, merge parity."""

import os

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


def test_lora_training_through_runner(tmp_path):
    """The finetune_lora.sh workflow end-to-end through RunConfig: only
    adapters+projector train, base decoder frozen, LoRA-split save, merge
    changes the decoder."""
    import json
    from law_of_vision_representation_in_mllms_tpu.core.config import (
        RunConfig)
    from law_of_vision_representation_in_mllms_tpu.io.param_io import (
        load_params)
    from law_of_vision_representation_in_mllms_tpu.models.lora import (
        LoraConfig, merge_lora)
    from law_of_vision_representation_in_mllms_tpu.train.runner import (
        run_training, build_model)

    recs = [{"image": "a.jpg", "conversations": [
        {"from": "human", "value": "<image>\ndescribe"},
        {"from": "gpt", "value": "a small thing"}]}] * 8
    with open(tmp_path / "data.json", "w") as f:
        json.dump(recs, f)
    os.makedirs(tmp_path / "feats")
    np.save(tmp_path / "feats" / "a.npy",
            np.random.RandomState(0).randn(576, 1280).astype(np.float32))
    raw = {
        "model": {"vision_tower": "runwayml/stable-diffusion-v1-5_feature",
                  "decoder": "tiny"},
        "train": {"stage": 2, "batch_size": 4, "epochs": 2, "bf16": False,
                  "max_length": 48, "lora_enable": True, "lora_r": 4,
                  "lora_alpha": 8.0,
                  "output_dir": str(tmp_path / "out"), "save_steps": 1000},
        "data": {"data_path": str(tmp_path / "data.json"),
                 "feature_folder": str(tmp_path / "feats")},
        "parallel": {"n_data": 2},
    }
    cfg = RunConfig.from_dict(raw)
    _, params_before = build_model(cfg)
    rc = run_training(cfg)
    assert rc == 0
    losses = [json.loads(l)["loss"]
              for l in open(tmp_path / "out" / "train.jsonl")]
    assert all(np.isfinite(losses)) and losses[-1] < losses[0], losses

    adapters = load_params(str(tmp_path / "out" / "lora_adapters.npz"))
    assert float(np.abs(adapters["wq_b"]).sum()) > 0   # B trained off zero
    # merged decoder differs from base; base-only merge with zero adapters
    # would be identity
    lcfg = LoraConfig(rank=4, alpha=8.0)
    merged = merge_lora(params_before["decoder"],
                        {k: jnp.asarray(v) for k, v in adapters.items()},
                        lcfg)
    dw = float(jnp.abs(merged["layers"]["wq"]
                       - params_before["decoder"]["layers"]["wq"]).max())
    assert dw > 0
