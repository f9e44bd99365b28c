"""Opt-in visual-token pruning (LlavaConfig.visual_keep).

Beyond-reference inference accelerator (PruMerge/FastV-family): keep the
top-K projected image tokens by tower CLS attention (or token norm), static
shapes throughout. visual_keep=None must be EXACT reference parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models import llava
from law_of_vision_representation_in_mllms_tpu.models import llama
from law_of_vision_representation_in_mllms_tpu.models.facet import (
    cls_attention_scores)
from law_of_vision_representation_in_mllms_tpu.models.splice import (
    IGNORE_INDEX, IMAGE_TOKEN_INDEX)
from law_of_vision_representation_in_mllms_tpu.models.vit import ViTEncoder


def _tiny_llava(visual_keep=None, prune_score="auto"):
    cfg = llava.LlavaConfig.build(
        "debug/tiny-vit", decoder=llama.tiny(), visual_keep=visual_keep,
        prune_score=prune_score)
    params = llava.init_params(jax.random.PRNGKey(0), cfg, FP32_PRECISION)
    return cfg, params


def _pixels(cfg, batch=2, seed=0):
    e = cfg.tower_spec.entries[0]
    rng = np.random.RandomState(seed)
    return [jnp.asarray(rng.randn(batch, e.vit_config.image_size,
                                  e.vit_config.image_size,
                                  3).astype(np.float32))]


def test_keep_equal_full_is_noop():
    cfg0, params = _tiny_llava()
    full = cfg0.num_patches
    cfgk, _ = _tiny_llava(visual_keep=full)
    px = _pixels(cfg0)
    base = llava.encode_images(params, cfg0, px, FP32_PRECISION)
    same = llava.encode_images(params, cfgk, px, FP32_PRECISION)
    assert cfgk.num_patches == full
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))


def test_pruned_tokens_are_ordered_subsequence():
    cfg0, params = _tiny_llava()
    keep = cfg0.num_patches // 2
    cfgk, _ = _tiny_llava(visual_keep=keep)
    px = _pixels(cfg0)
    base = np.asarray(llava.encode_images(params, cfg0, px, FP32_PRECISION))
    pruned = np.asarray(llava.encode_images(params, cfgk, px,
                                            FP32_PRECISION))
    assert pruned.shape == (base.shape[0], keep, base.shape[2])
    for b in range(base.shape[0]):
        # each kept token appears in the unpruned sequence, in order
        pos = -1
        for t in range(keep):
            matches = np.where(
                np.all(np.isclose(base[b], pruned[b, t], atol=1e-6),
                       axis=-1))[0]
            assert matches.size >= 1
            assert matches[-1] > pos
            pos = matches[np.searchsorted(matches, pos + 1)]


def test_saliency_scores_drive_selection():
    cfg0, params = _tiny_llava()
    keep = 3
    cfgk, _ = _tiny_llava(visual_keep=keep, prune_score="saliency")
    px = _pixels(cfg0)
    e = cfg0.tower_spec.entries[0]
    n = e.vit_config.resolve_layer(cfg0.select_layer)
    enc = ViTEncoder(e.vit_config, FP32_PRECISION)
    sal = np.asarray(cls_attention_scores(
        enc, {"params": params["towers"][0]["encoder"]}, px[0],
        layer=n - 1))
    want = np.sort(np.argsort(-sal, axis=-1)[:, :keep], axis=-1)

    base = np.asarray(llava.encode_images(params, cfg0, px, FP32_PRECISION))
    pruned = np.asarray(llava.encode_images(params, cfgk, px,
                                            FP32_PRECISION))
    np.testing.assert_allclose(
        pruned, np.take_along_axis(base, want[..., None], axis=1),
        atol=1e-6)


def test_norm_score_fallback_and_saliency_error():
    # feature towers have no CLS attention: auto falls back to norm
    cfg = llava.LlavaConfig.build(
        "runwayml/stable-diffusion-v1-5_feature", decoder=llama.tiny(),
        visual_keep=4)
    params = llava.init_params(jax.random.PRNGKey(1), cfg, FP32_PRECISION)
    feats = jnp.asarray(np.random.RandomState(2).randn(
        1, cfg.tower_spec.entries[0].num_patches,
        cfg.tower_spec.entries[0].hidden_size).astype(np.float32))
    out = llava.encode_images(params, cfg, [feats], FP32_PRECISION)
    assert out.shape[1] == 4

    cfg_s = llava.LlavaConfig.build(
        "runwayml/stable-diffusion-v1-5_feature", decoder=llama.tiny(),
        visual_keep=4, prune_score="saliency")
    with pytest.raises(ValueError, match="saliency"):
        llava.encode_images(params, cfg_s, [feats], FP32_PRECISION)


def test_generate_and_loss_with_pruning():
    cfg, params = _tiny_llava(visual_keep=5)
    px = _pixels(cfg)
    b, l = 2, 12
    rng = np.random.RandomState(3)
    ids = rng.randint(1, 250, size=(b, l)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    mask = np.ones((b, l), bool)
    toks = llava.generate_greedy(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask), px,
        max_new_tokens=3, eos_id=2, precision=FP32_PRECISION,
        use_flash=False)
    assert toks.shape == (b, 3)

    labels = ids.copy()
    labels[:, :2] = IGNORE_INDEX
    loss = llava.loss_fn(params, cfg,
                         {"input_ids": jnp.asarray(ids),
                          "labels": jnp.asarray(labels),
                          "text_mask": jnp.asarray(mask),
                          "pixel_values": px}, FP32_PRECISION)
    assert np.isfinite(float(loss))


def test_saliency_shape_mismatch_errors_for_perceiver():
    """Explicit prune_score='saliency' must error (not silently fall back
    to norm) when the projector resamples tokens away from the ViT grid."""
    cfg = llava.LlavaConfig.build(
        "debug/tiny-vit", decoder=llama.tiny(),
        projector_type="perceiver2x", visual_keep=8,
        prune_score="saliency")
    params = llava.init_params(jax.random.PRNGKey(4), cfg, FP32_PRECISION)
    with pytest.raises(ValueError, match="saliency"):
        llava.encode_images(params, cfg, _pixels(cfg), FP32_PRECISION)
