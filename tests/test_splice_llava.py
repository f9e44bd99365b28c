"""Splice correctness vs a python oracle of the reference loop, and
end-to-end LLaVA tiny-model tests (loss, frozen towers, cached generate)."""

import numpy as np
import jax
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.core.precision import FP32_PRECISION
from law_of_vision_representation_in_mllms_tpu.models import llama as L
from law_of_vision_representation_in_mllms_tpu.models import llava as M
from law_of_vision_representation_in_mllms_tpu.models.splice import (
    splice_plan, splice_embeds, IGNORE_INDEX, IMAGE_TOKEN_INDEX)
from law_of_vision_representation_in_mllms_tpu.models.towers import (
    TowerSpec, TowerEntry)
from law_of_vision_representation_in_mllms_tpu.models.vit import ViTConfig


def _oracle_splice(ids, labels, mask, embeds, img_feats):
    """Reference semantics (`llava_arch.py:380-460`), python loop."""
    out_e, out_l, out_m = [], [], []
    p = img_feats.shape[1]
    l_out = ids.shape[1] + p - 1
    d = embeds.shape[-1]
    for b in range(ids.shape[0]):
        row_ids = ids[b][mask[b]]
        row_lbl = labels[b][mask[b]]
        row_emb = embeds[b][mask[b]]
        if (row_ids == IMAGE_TOKEN_INDEX).any():
            pos = int(np.where(row_ids == IMAGE_TOKEN_INDEX)[0][0])
            e = np.concatenate([row_emb[:pos], img_feats[b],
                                row_emb[pos + 1:]])
            lab = np.concatenate([row_lbl[:pos],
                                  np.full(p, IGNORE_INDEX, np.int32),
                                  row_lbl[pos + 1:]])
        else:
            e, lab = row_emb, row_lbl
        n = len(e)
        pad = l_out - n
        out_e.append(np.concatenate([e, np.zeros((pad, d), e.dtype)]))
        out_l.append(np.concatenate([lab, np.full(pad, IGNORE_INDEX,
                                                  np.int32)]))
        out_m.append(np.concatenate([np.ones(n, bool), np.zeros(pad, bool)]))
    return np.stack(out_e), np.stack(out_l), np.stack(out_m)


def test_splice_matches_oracle():
    rng = np.random.RandomState(0)
    b, l, p, d = 3, 9, 4, 8
    ids = rng.randint(0, 50, size=(b, l)).astype(np.int32)
    labels = rng.randint(0, 50, size=(b, l)).astype(np.int32)
    mask = np.ones((b, l), bool)
    # row 0: image at 2; row 1: image at 0; row 2: text-only with padding
    ids[0, 2] = IMAGE_TOKEN_INDEX
    ids[1, 0] = IMAGE_TOKEN_INDEX
    mask[2, 6:] = False
    labels[0, 2] = IGNORE_INDEX
    labels[1, 0] = IGNORE_INDEX
    labels[2, 6:] = IGNORE_INDEX

    embeds = rng.randn(b, l, d).astype(np.float32)
    img = rng.randn(b, p, d).astype(np.float32)

    plan = splice_plan(jnp.asarray(ids), jnp.asarray(labels),
                       jnp.asarray(mask), p)
    got_e = np.asarray(splice_embeds(plan, jnp.asarray(embeds),
                                     jnp.asarray(img)))
    ref_e, ref_l, ref_m = _oracle_splice(ids, labels, mask, embeds, img)

    got_m = np.asarray(plan.attn_mask)
    np.testing.assert_array_equal(got_m, ref_m)
    np.testing.assert_array_equal(np.asarray(plan.labels)[ref_m],
                                  ref_l[ref_m])
    np.testing.assert_allclose(got_e[ref_m], ref_e[ref_m], atol=1e-6)
    # positions count valid tokens 0..n-1
    np.testing.assert_array_equal(
        np.asarray(plan.positions)[0][:5], np.arange(5))


def _tiny_llava(seed=0):
    vit_cfg = ViTConfig(image_size=14, patch_size=7, hidden_size=16,
                        num_layers=2, num_heads=2, intermediate_size=32,
                        use_class_token=True, use_pre_layernorm=True,
                        patch_bias=False)
    entry = TowerEntry(name="tiny", kind="vit", vit_config=vit_cfg,
                       vit_family="clip", hidden_size=16,
                       num_patches=vit_cfg.num_patches)
    cfg = M.LlavaConfig(
        tower_spec=TowerSpec(entries=[entry], join="single"),
        decoder=L.tiny(vocab_size=64, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=4, intermediate_size=64),
        projector_type="mlp2x_gelu")
    params = M.init_params(jax.random.PRNGKey(seed), cfg, FP32_PRECISION)
    return cfg, params


def _tiny_batch(cfg, rng, b=2, l=8):
    ids = rng.randint(1, 60, size=(b, l)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :3] = IGNORE_INDEX
    mask = np.ones((b, l), bool)
    px = rng.randn(b, 14, 14, 3).astype(np.float32)
    return {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
            "text_mask": jnp.asarray(mask), "pixel_values": [jnp.asarray(px)]}


def test_llava_loss_and_frozen_towers():
    cfg, params = _tiny_llava()
    batch = _tiny_batch(cfg, np.random.RandomState(0))

    loss, grads = jax.value_and_grad(
        lambda p: M.loss_fn(p, cfg, batch, FP32_PRECISION))(params)
    assert np.isfinite(float(loss))
    # towers are frozen via stop_gradient
    tower_norm = sum(float(jnp.sum(jnp.abs(g)))
                     for g in jax.tree.leaves(grads["towers"]))
    assert tower_norm == 0.0
    proj_norm = sum(float(jnp.sum(jnp.abs(g)))
                    for g in jax.tree.leaves(grads["projector"]))
    assert proj_norm > 0.0


def test_generate_matches_uncached_greedy():
    cfg, params = _tiny_llava(1)
    rng = np.random.RandomState(1)
    batch = _tiny_batch(cfg, rng, b=2, l=6)
    max_new = 5

    got = np.asarray(M.generate_greedy(
        params, cfg, batch["input_ids"], batch["text_mask"],
        batch["pixel_values"], max_new_tokens=max_new, eos_id=0,
        precision=FP32_PRECISION))

    # oracle: full re-forward each step, no cache
    from law_of_vision_representation_in_mllms_tpu.models.splice import (
        splice_plan, splice_embeds)
    plan = splice_plan(batch["input_ids"],
                       jnp.full_like(batch["input_ids"], IGNORE_INDEX),
                       batch["text_mask"], cfg.num_patches)
    img = M.encode_images(params, cfg, batch["pixel_values"], FP32_PRECISION)
    txt = L.embed_tokens(params["decoder"], batch["input_ids"],
                         FP32_PRECISION)
    embeds = splice_embeds(plan, txt, img)
    n_valid = np.asarray(jnp.sum(plan.attn_mask, axis=1))

    for b in range(2):
        e = np.asarray(embeds[b])[np.asarray(plan.attn_mask[b])]
        toks = []
        for t in range(max_new):
            el = jnp.asarray(e)[None]
            pos = jnp.arange(el.shape[1])[None]
            h, _ = L.forward(params["decoder"], cfg.decoder, el, pos,
                             precision=FP32_PRECISION)
            logits = L.logits_fn(params["decoder"], h, FP32_PRECISION)
            nxt = int(jnp.argmax(logits[0, -1]))
            toks.append(nxt)
            if nxt == 0:
                break
            ne = np.asarray(L.embed_tokens(params["decoder"],
                                           jnp.asarray([[nxt]]),
                                           FP32_PRECISION))[0]
            e = np.concatenate([e, ne])
        np.testing.assert_array_equal(got[b][:len(toks)], toks)


def test_mof_multi_tower():
    """',' join: per-tower projectors + token interleave."""
    from law_of_vision_representation_in_mllms_tpu.models.towers import (
        parse_tower_spec)
    spec = parse_tower_spec("debug/tiny-vit,debug/tiny-vit")
    assert spec.join == "mof"
    cfg = M.LlavaConfig(
        tower_spec=spec,
        decoder=L.tiny(vocab_size=64, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=4, intermediate_size=64))
    params = M.init_params(jax.random.PRNGKey(0), cfg, FP32_PRECISION)
    assert isinstance(params["projector"], list) and \
        len(params["projector"]) == 2
    px = jnp.asarray(np.random.RandomState(0)
                     .randn(2, 28, 28, 3).astype(np.float32))
    out = M.encode_images(params, cfg, [px, px], FP32_PRECISION)
    # 16 patches per tiny tower, interleaved -> 32 tokens
    assert out.shape == (2, 32, 32)
    assert cfg.num_patches == 32
    # loss runs end-to-end with the interleaved tokens
    rng = np.random.RandomState(1)
    ids = rng.randint(1, 60, size=(2, 6)).astype(np.int32)
    ids[:, 0] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :2] = IGNORE_INDEX
    batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
             "text_mask": jnp.ones((2, 6), bool),
             "pixel_values": [px, px]}
    assert np.isfinite(float(M.loss_fn(params, cfg, batch,
                                       FP32_PRECISION)))


def test_splice_fuzz_vs_oracle():
    """Randomized campaign: random batch/lengths/patch counts, image token
    anywhere (or absent), random mid-row padding masks — static-shape
    splice must match the reference-loop oracle everywhere valid."""
    for trial in range(12):
        rng = np.random.RandomState(300 + trial)
        b = int(rng.randint(1, 5))
        l = int(rng.randint(4, 20))
        p = int(rng.randint(1, 8))
        d = int(rng.choice([4, 8]))
        ids = rng.randint(0, 50, size=(b, l)).astype(np.int32)
        labels = rng.randint(0, 50, size=(b, l)).astype(np.int32)
        mask = np.ones((b, l), bool)
        for r in range(b):
            n_valid = int(rng.randint(2, l + 1))
            mask[r, n_valid:] = False
            if rng.rand() < 0.8:                     # image row
                ids[r, rng.randint(0, n_valid)] = IMAGE_TOKEN_INDEX
        embeds = rng.randn(b, l, d).astype(np.float32)
        img = rng.randn(b, p, d).astype(np.float32)
        plan = splice_plan(jnp.asarray(ids), jnp.asarray(labels),
                           jnp.asarray(mask), p)
        got_e = np.asarray(splice_embeds(plan, jnp.asarray(embeds),
                                         jnp.asarray(img)))
        ref_e, ref_l, ref_m = _oracle_splice(ids, labels, mask, embeds,
                                             img)
        np.testing.assert_array_equal(np.asarray(plan.attn_mask), ref_m,
                                      err_msg=f"trial {trial}")
        np.testing.assert_array_equal(np.asarray(plan.labels)[ref_m],
                                      ref_l[ref_m],
                                      err_msg=f"trial {trial}")
        np.testing.assert_allclose(got_e[ref_m], ref_e[ref_m], atol=1e-6,
                                   err_msg=f"trial {trial}")
