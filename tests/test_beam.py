"""Beam-search decode (llava.generate_beam): k=1 greedy degeneration,
a transparent host-loop numpy oracle for the beam bookkeeping (seed
top-k, frozen-EOS freezing, candidate top-k, cache-reorder-by-parent,
sequence-score finalize), and the adapter's num_beams routing — the
reference forwards num_beams to HF generate
(`lmms_eval/models/llava.py:395-418`)."""

import numpy as np
import jax
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models import llama as L
from law_of_vision_representation_in_mllms_tpu.models import llava as M
from law_of_vision_representation_in_mllms_tpu.models.splice import (
    IGNORE_INDEX, IMAGE_TOKEN_INDEX, splice_plan, splice_embeds)

from test_train_step import _tiny


def _req(rng, b, l):
    ids = rng.randint(5, 60, size=(b, l)).astype(np.int32)
    ids[:, 0] = IMAGE_TOKEN_INDEX
    mask = np.ones((b, l), bool)
    pixels = [jnp.asarray(rng.randn(b, 14, 14, 3).astype(np.float32))]
    return jnp.asarray(ids), jnp.asarray(mask), pixels


def test_beam_k1_matches_greedy():
    cfg, params = _tiny()
    rng = np.random.RandomState(0)
    ids, mask, px = _req(rng, 2, 9)
    common = dict(max_new_tokens=8, eos_id=3, precision=FP32_PRECISION,
                  use_flash=False)
    ref = M.generate_greedy(params, cfg, ids, mask, px, **common)
    out = M.generate_beam(params, cfg, ids, mask, px, num_beams=1,
                          **common)
    assert np.asarray(out).tolist() == np.asarray(ref).tolist()


def _oracle_beam(params, cfg, ids, mask, px, *, max_new, eos, k,
                 length_penalty=1.0):
    """Host-loop beam search with the SAME semantics as generate_beam,
    scoring every candidate prefix by a FULL uncached forward (cache
    parity is test_llama's job; this checks the beam bookkeeping)."""
    prec = FP32_PRECISION
    plan = splice_plan(ids, jnp.full_like(ids, IGNORE_INDEX), mask,
                       cfg.num_patches)
    img = M.encode_images(params, cfg, px, prec, None)
    txt = L.embed_tokens(params["decoder"], ids, prec)
    prompt_embeds = splice_embeds(plan, txt, img)       # [1, l_out, D]
    l_out = prompt_embeds.shape[1]

    def next_lp(gen):
        g = len(gen)
        emb = prompt_embeds
        if g:
            ge = L.embed_tokens(params["decoder"],
                                jnp.asarray([gen], jnp.int32), prec)
            emb = jnp.concatenate([emb, ge], axis=1)
        attn = jnp.ones((1, l_out + g), bool)
        pos = jnp.arange(l_out + g)[None]
        h, _ = L.forward(params["decoder"], cfg.decoder, emb, pos,
                         attn_mask=attn, precision=prec)
        lp = jax.nn.log_softmax(
            L.logits_fn(params["decoder"], h[:, -1:], prec)[0, -1]
            .astype(jnp.float32))
        return np.asarray(lp, np.float64)

    lp0 = next_lp([])
    order = np.argsort(-lp0, kind="stable")[:k]
    beams = [[int(t)] for t in order]
    scores = [float(lp0[t]) for t in order]
    done = [t == eos for t in order]
    vocab = lp0.shape[0]
    for _ in range(max_new - 1):
        cand = np.full((k, vocab), -np.inf)
        for j in range(k):
            if done[j]:
                cand[j, eos] = scores[j]
            else:
                cand[j] = scores[j] + next_lp(beams[j])
        flat = np.argsort(-cand.reshape(-1), kind="stable")[:k]
        beams = [beams[f // vocab] + [int(f % vocab)] for f in flat]
        scores = [float(cand.reshape(-1)[f]) for f in flat]
        done = [done[f // vocab] or (f % vocab) == eos for f in flat]
    finals = []
    for j in range(k):
        seq = beams[j]
        length = seq.index(eos) + 1 if eos in seq else max_new
        finals.append(scores[j] / (length ** length_penalty))
    best = beams[int(np.argmax(finals))]
    # eos-pad like generate_beam
    if eos in best:
        i = best.index(eos)
        best = best[:i] + [eos] * (max_new - i)
    return best


def test_beam_matches_host_oracle():
    cfg, params = _tiny(3)
    rng = np.random.RandomState(7)
    for seed, k, max_new in ((0, 2, 5), (1, 3, 6)):
        ids, mask, px = _req(np.random.RandomState(seed), 1, 7)
        out = M.generate_beam(params, cfg, ids, mask, px, num_beams=k,
                              max_new_tokens=max_new, eos_id=3,
                              precision=FP32_PRECISION, use_flash=False)
        ref = _oracle_beam(params, cfg, ids, mask, px, max_new=max_new,
                           eos=3, k=k)
        assert np.asarray(out)[0].tolist() == ref, (k, max_new)


def test_beam_never_worse_than_greedy():
    """The best beam's sequence score is >= the greedy sequence's score
    (greedy is always in the width-k>=1 search space at step 1... not in
    general, but with the same scoring the beam WINNER must score at
    least as high as ANY beam, and greedy's continuation is beam 1's
    prefix at k where it survives — assert on the common case across
    seeds rather than prove it)."""
    cfg, params = _tiny(5)
    for seed in range(3):
        ids, mask, px = _req(np.random.RandomState(10 + seed), 1, 8)
        common = dict(max_new_tokens=6, eos_id=3,
                      precision=FP32_PRECISION, use_flash=False)
        greedy = np.asarray(M.generate_greedy(
            params, cfg, ids, mask, px, **common))[0].tolist()
        beam = np.asarray(M.generate_beam(
            params, cfg, ids, mask, px, num_beams=4, **common))[0].tolist()
        oracle = lambda seq: _seq_score(params, cfg, ids, mask, px, seq)
        assert oracle(beam) >= oracle(greedy) - 1e-5, (beam, greedy)


def _seq_score(params, cfg, ids, mask, px, seq, eos=3, lp_pen=1.0):
    """score/len**penalty of a generated sequence under the model, same
    formula as generate_beam's finalize."""
    prec = FP32_PRECISION
    plan = splice_plan(ids, jnp.full_like(ids, IGNORE_INDEX), mask,
                       cfg.num_patches)
    img = M.encode_images(params, cfg, px, prec, None)
    txt = L.embed_tokens(params["decoder"], ids, prec)
    emb = splice_embeds(plan, txt, img)
    l_out = emb.shape[1]
    length = seq.index(eos) + 1 if eos in seq else len(seq)
    toks = seq[:length]
    ge = L.embed_tokens(params["decoder"], jnp.asarray([toks], jnp.int32),
                        prec)
    full = jnp.concatenate([emb, ge], axis=1)
    attn = jnp.ones((1, full.shape[1]), bool)
    pos = jnp.arange(full.shape[1])[None]
    h, _ = L.forward(params["decoder"], cfg.decoder, full, pos,
                     attn_mask=attn, precision=prec)
    lp = jax.nn.log_softmax(
        L.logits_fn(params["decoder"], h, prec).astype(jnp.float32),
        axis=-1)
    total = 0.0
    for i, t in enumerate(toks):
        total += float(lp[0, l_out - 1 + i, t])
    return total / (length ** lp_pen)


def test_adapter_num_beams():
    """gen_kwargs num_beams routes through the adapter: num_beams=1
    equals the default path; num_beams=3 runs and returns strings."""
    from law_of_vision_representation_in_mllms_tpu.data import (
        SimpleTokenizer, get_template)
    from law_of_vision_representation_in_mllms_tpu.eval.api import Instance
    from law_of_vision_representation_in_mllms_tpu.eval.llava_adapter \
        import LlavaLMM
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
    params = M.init_params(jax.random.PRNGKey(2), cfg, FP32_PRECISION)
    lmm = LlavaLMM(params, cfg, SimpleTokenizer(), get_template("v1"),
                   precision=FP32_PRECISION, batch_size=2)
    img = Image.new("RGB", (16, 16), (20, 60, 90))

    def req(kwargs):
        return [Instance("generate_until", {}, i, "t",
                         ("describe", dict(kwargs)), visual=[img])
                for i in range(2)]

    base = lmm.generate_until(req({"max_new_tokens": 5}))
    one = lmm.generate_until(req({"max_new_tokens": 5, "num_beams": 1}))
    assert one == base
    three = lmm.generate_until(req({"max_new_tokens": 5, "num_beams": 3}))
    assert len(three) == 2 and all(isinstance(s, str) for s in three)
