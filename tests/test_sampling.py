"""Sampling decode (models/sampling.py + llava.generate_sample): HF
TopPLogitsWarper parity on the nucleus mask, the `do_sample iff
temperature > 0` routing contract (`lmms_eval/models/llava.py:391-417`),
statistical correctness of the Gumbel-max draw, and exact greedy
degeneration (top_p -> 0 forces argmax, temperature scaling being
monotonic)."""

import numpy as np
import jax
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.models.sampling import (
    sample_token, top_p_mask)


def test_top_p_mask_matches_hf_warper():
    import torch
    from transformers.generation.logits_process import TopPLogitsWarper

    rng = np.random.RandomState(0)
    logits = rng.randn(4, 50).astype(np.float32) * 3
    for top_p in (0.1, 0.5, 0.9, 0.99):
        warped = TopPLogitsWarper(top_p=top_p)(
            None, torch.tensor(logits)).numpy()
        hf_keep = np.isfinite(warped)
        order = np.argsort(-logits, axis=-1)
        sorted_probs = np.take_along_axis(
            np.exp(logits) / np.exp(logits).sum(-1, keepdims=True),
            order, axis=-1)
        keep_sorted = np.asarray(top_p_mask(jnp.asarray(sorted_probs),
                                            top_p))
        ours_keep = np.zeros_like(hf_keep)
        np.put_along_axis(ours_keep, order, keep_sorted, axis=-1)
        assert (ours_keep == hf_keep).all(), top_p


def test_sample_token_greedy_degenerations():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(8, 100).astype(np.float32) * 2)
    greedy = np.asarray(jnp.argmax(logits, axis=-1))
    key = jax.random.PRNGKey(0)
    # temperature <= 0 -> argmax exactly
    assert (np.asarray(sample_token(logits, key, 0.0)) == greedy).all()
    assert (np.asarray(sample_token(logits, key, -1.0)) == greedy).all()
    # top_p -> 0 keeps only the top token at ANY temperature (positive
    # scaling never reorders logits)
    for t in (0.3, 1.0, 4.0):
        out = np.asarray(sample_token(logits, key, t, top_p=1e-9))
        assert (out == greedy).all(), t


def test_sample_token_matches_softmax_distribution():
    """Empirical frequencies of the Gumbel-max draw match the softmax
    at the given temperature (V=8, 4000 draws, loose tolerance)."""
    logits = jnp.asarray([0.5, 2.0, -1.0, 0.0, 1.0, -2.0, 0.2, 1.5],
                         jnp.float32)
    temperature = 0.7
    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(2), n)
    draws = jax.vmap(lambda k: sample_token(logits, k, temperature))(keys)
    freq = np.bincount(np.asarray(draws), minlength=8) / n
    probs = np.asarray(jax.nn.softmax(logits / temperature))
    assert np.abs(freq - probs).max() < 0.03, (freq, probs)


def test_sample_token_top_p_restricts_support():
    """With top_p=0.5 only the smallest nucleus covering half the mass
    is ever drawn."""
    logits = jnp.asarray([3.0, 2.5, 0.0, -1.0, -3.0], jnp.float32)
    probs = np.asarray(jax.nn.softmax(logits))
    keep = np.asarray(top_p_mask(jnp.asarray(np.sort(probs)[::-1].copy()),
                                 0.5))
    n_keep = int(keep.sum())
    keys = jax.random.split(jax.random.PRNGKey(3), 500)
    draws = np.asarray(jax.vmap(
        lambda k: sample_token(logits, k, 1.0, top_p=0.5))(keys))
    assert set(draws.tolist()) == set(range(n_keep)), draws


def test_generate_sample_top_p_tiny_matches_greedy():
    """generate_sample with a degenerate nucleus reproduces
    generate_greedy token-for-token through the full LLaVA path."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_train_step import _tiny
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        FP32_PRECISION)
    from law_of_vision_representation_in_mllms_tpu.models import llava as M
    from law_of_vision_representation_in_mllms_tpu.models.splice import (
        IMAGE_TOKEN_INDEX)

    cfg, params = _tiny()
    rng = np.random.RandomState(5)
    ids = rng.randint(1, 60, size=(2, 9)).astype(np.int32)
    ids[:, 0] = IMAGE_TOKEN_INDEX
    mask = np.ones((2, 9), bool)
    pixels = [jnp.asarray(rng.randn(2, 14, 14, 3).astype(np.float32))]
    common = dict(max_new_tokens=8, eos_id=3, precision=FP32_PRECISION,
                  use_flash=False)
    ref = M.generate_greedy(params, cfg, jnp.asarray(ids),
                            jnp.asarray(mask), pixels, **common)
    out = M.generate_sample(params, cfg, jnp.asarray(ids),
                            jnp.asarray(mask), pixels,
                            rng=jax.random.PRNGKey(7), temperature=1.3,
                            top_p=1e-9, **common)
    assert np.asarray(out).tolist() == np.asarray(ref).tolist()
    # temperature=0 routes to greedy even with an rng present
    out0 = M.generate_sample(params, cfg, jnp.asarray(ids),
                             jnp.asarray(mask), pixels,
                             rng=jax.random.PRNGKey(9), temperature=0.0,
                             **common)
    assert np.asarray(out0).tolist() == np.asarray(ref).tolist()


def test_adapter_sampling_kwargs():
    """LlavaLMM.generate_until honors gen_kwargs temperature/top_p (the
    reference's do_sample routing): top_p -> 0 at temperature > 0 equals
    the greedy output; do_sample=False wins over temperature."""
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        FP32_PRECISION)
    from law_of_vision_representation_in_mllms_tpu.data import (
        SimpleTokenizer, get_template)
    from law_of_vision_representation_in_mllms_tpu.eval.api import Instance
    from law_of_vision_representation_in_mllms_tpu.eval.llava_adapter \
        import LlavaLMM
    from law_of_vision_representation_in_mllms_tpu.models import llama as L
    from law_of_vision_representation_in_mllms_tpu.models import llava as M
    from law_of_vision_representation_in_mllms_tpu.models.towers import (
        TowerSpec, TowerEntry)
    from law_of_vision_representation_in_mllms_tpu.models.vit import (
        ViTConfig)
    from PIL import Image

    vit_cfg = ViTConfig(image_size=224, patch_size=32, hidden_size=16,
                        num_layers=2, num_heads=2, intermediate_size=32)
    entry = TowerEntry(name="openai/clip-vit-large-patch14", kind="vit",
                       vit_config=vit_cfg, vit_family="clip",
                       hidden_size=16, num_patches=vit_cfg.num_patches)
    cfg = M.LlavaConfig(
        tower_spec=TowerSpec(entries=[entry], join="single"),
        decoder=L.tiny(vocab_size=1000, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=4, intermediate_size=64))
    params = M.init_params(jax.random.PRNGKey(0), cfg, FP32_PRECISION)
    lmm = LlavaLMM(params, cfg, SimpleTokenizer(), get_template("v1"),
                   precision=FP32_PRECISION, batch_size=2)
    img = Image.new("RGB", (16, 16), (40, 80, 120))

    def req(kwargs):
        return [Instance("generate_until", {}, i, "t",
                         ("what is this", dict(kwargs)), visual=[img])
                for i in range(2)]

    greedy = lmm.generate_until(req({"max_new_tokens": 6}))
    forced = lmm.generate_until(req({"max_new_tokens": 6,
                                     "temperature": 0.9, "top_p": 1e-9}))
    assert forced == greedy
    off = lmm.generate_until(req({"max_new_tokens": 6,
                                  "temperature": 0.9,
                                  "do_sample": False}))
    assert off == greedy
    # a real sampled call runs and returns strings
    sampled = lmm.generate_until(req({"max_new_tokens": 6,
                                      "temperature": 1.0, "top_p": 0.95}))
    assert len(sampled) == 2 and all(isinstance(s, str) for s in sampled)
    # temperature/top_p are traced operands: sweeping values reuses ONE
    # compiled sampling program (ADVICE r3 — a novel float must not cost
    # a fresh full-graph compile through the axon relay)
    n_fns = len(lmm._gen_fns)
    lmm.generate_until(req({"max_new_tokens": 6,
                            "temperature": 0.7, "top_p": 0.8}))
    lmm.generate_until(req({"max_new_tokens": 6,
                            "temperature": 1.3, "top_p": 0.5}))
    assert len(lmm._gen_fns) == n_fns
    # explicit top_p=0.0 is near-greedy (top token only), not full-vocab
    p0 = lmm.generate_until(req({"max_new_tokens": 6,
                                 "temperature": 0.9, "top_p": 0.0}))
    assert p0 == greedy
