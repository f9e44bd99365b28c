"""Prompt-lookup speculative decoding: exact greedy equivalence (the
defining property — speculation must be lossless for argmax decoding)
plus actual multi-token acceptance on repetitive inputs."""

import numpy as np
import jax
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models import llama as L
from law_of_vision_representation_in_mllms_tpu.models.speculative import (
    decode_prompt_lookup)


def _greedy_reference(params, cfg, ids, max_new, eos_id=2):
    """Token-at-a-time greedy with a cache (mirrors llava.generate_greedy's
    decode loop, decoder-only)."""
    b, l = ids.shape
    t_max = l + max_new
    cache = L.init_cache(cfg, b, t_max, jnp.float32)
    emb = L.embed_tokens(params, ids, FP32_PRECISION)
    pos = jnp.broadcast_to(jnp.arange(l)[None], (b, l))
    h, cache = L.forward(params, cfg, emb, pos,
                         attn_mask=jnp.arange(t_max)[None] < l,
                         cache=cache, cache_index=0,
                         precision=FP32_PRECISION)
    tok = jnp.argmax(L.logits_fn(params, h[:, -1:], FP32_PRECISION)[:, -1],
                     axis=-1).astype(jnp.int32)
    out = [tok]
    done = jnp.zeros((b,), bool)
    for t in range(max_new - 1):
        emb = L.embed_tokens(params, tok[:, None], FP32_PRECISION)
        p = jnp.full((b, 1), l + t, jnp.int32)
        h, cache = L.forward(params, cfg, emb, p,
                             attn_mask=jnp.arange(t_max)[None] < l + t + 1,
                             cache=cache, cache_index=l + t,
                             precision=FP32_PRECISION)
        nxt = jnp.argmax(L.logits_fn(params, h, FP32_PRECISION)[:, -1],
                         axis=-1).astype(jnp.int32)
        done = done | (tok == eos_id)
        tok = jnp.where(done, eos_id, nxt)
        out.append(tok)
    return jnp.stack(out, axis=1)


def _tiny(seed=0):
    cfg = L.tiny(vocab_size=97, hidden_size=32, num_layers=2, num_heads=4,
                 num_kv_heads=4, intermediate_size=64)
    params = L.init_params(jax.random.PRNGKey(seed), cfg, jnp.float32)
    return cfg, params


def test_speculative_equals_greedy_random_prompt():
    cfg, params = _tiny()
    rng = np.random.RandomState(0)
    for bsz, g in ((1, 4), (2, 8)):
        ids = jnp.asarray(rng.randint(3, 97, size=(bsz, 12)), jnp.int32)
        ref = _greedy_reference(params, cfg, ids, max_new=10)
        got, rounds = decode_prompt_lookup(
            params, cfg, ids, max_new_tokens=10, draft_len=g,
            precision=FP32_PRECISION)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        assert int(rounds) <= 10


def test_speculative_accepts_on_repetitive_prompt():
    """A prompt whose greedy continuation repeats structure from the
    prompt must accept drafts: fewer verification rounds than tokens."""
    cfg, params = _tiny(seed=3)
    rng = np.random.RandomState(1)
    base = rng.randint(3, 97, size=8)
    # model-agnostic repetition: loop the same 8-gram many times so the
    # greedy continuation (whatever it is) has matching history bigrams
    ids = jnp.asarray(np.tile(base, 6)[None], jnp.int32)
    ref = _greedy_reference(params, cfg, ids, max_new=16)
    got, rounds = decode_prompt_lookup(
        params, cfg, ids, max_new_tokens=16, draft_len=8,
        precision=FP32_PRECISION)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # losslessness is asserted above; this asserts the SPEED property
    assert int(rounds) < 16, f"no drafts accepted ({int(rounds)} rounds)"


def test_speculative_int8_kv_cache_equals_greedy():
    """kv_quant='int8' inside the speculative loop (the verify forward
    writes/reads the quantized cache) must stay greedy-equivalent: in
    fp32 compute the per-(slot,head) scales round-trip argmax-stably on
    a tiny model, and acceptance must still happen on repetitive input
    (the bench_speculative LVR_KV_QUANT path)."""
    cfg, params = _tiny(seed=3)
    rng = np.random.RandomState(1)
    base = rng.randint(3, 97, size=8)
    ids = jnp.asarray(np.tile(base, 6)[None], jnp.int32)
    dense, rounds_dense = decode_prompt_lookup(
        params, cfg, ids, max_new_tokens=16, draft_len=8,
        precision=FP32_PRECISION)
    kv8, rounds_kv8 = decode_prompt_lookup(
        params, cfg, ids, max_new_tokens=16, draft_len=8,
        precision=FP32_PRECISION, kv_quant="int8")
    np.testing.assert_array_equal(np.asarray(kv8), np.asarray(dense))
    assert int(rounds_kv8) < 16, \
        f"no drafts accepted with int8 KV ({int(rounds_kv8)} rounds)"


def test_speculative_eos_padding():
    """After the first eos, output is eos-padded exactly like greedy."""
    cfg, params = _tiny(seed=5)
    rng = np.random.RandomState(2)
    ids = jnp.asarray(rng.randint(3, 97, size=(2, 10)), jnp.int32)
    ref = _greedy_reference(params, cfg, ids, max_new=12, eos_id=5)
    got, _ = decode_prompt_lookup(params, cfg, ids, max_new_tokens=12,
                                  draft_len=4, eos_id=5,
                                  precision=FP32_PRECISION)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_llava_generate_speculative_equals_greedy():
    """Full LLaVA path (tower -> splice -> decode), ragged right-padded
    batch: speculative output must equal generate_greedy exactly."""
    from law_of_vision_representation_in_mllms_tpu.models import llava as M
    from law_of_vision_representation_in_mllms_tpu.models.splice import (
        IMAGE_TOKEN_INDEX)
    from law_of_vision_representation_in_mllms_tpu.models.towers import (
        TowerSpec, TowerEntry)
    from law_of_vision_representation_in_mllms_tpu.models.vit import (
        ViTConfig)

    vit_cfg = ViTConfig(image_size=64, patch_size=16, hidden_size=16,
                        num_layers=2, num_heads=2, intermediate_size=32)
    entry = TowerEntry(name="openai/clip-vit-large-patch14", kind="vit",
                       vit_config=vit_cfg, vit_family="clip",
                       hidden_size=16, num_patches=vit_cfg.num_patches)
    cfg = M.LlavaConfig(
        tower_spec=TowerSpec(entries=[entry], join="single"),
        decoder=L.tiny(vocab_size=211, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=4, intermediate_size=64))
    params = M.init_params(jax.random.PRNGKey(1), cfg, FP32_PRECISION)

    rng = np.random.RandomState(4)
    b, l = 2, 14
    ids = rng.randint(3, 211, size=(b, l)).astype(np.int32)
    ids[:, 0] = IMAGE_TOKEN_INDEX
    mask = np.ones((b, l), bool)
    mask[1, -4:] = False          # ragged: row 1 is right-padded
    px = jnp.asarray(rng.randn(b, 64, 64, 3).astype(np.float32))

    ref = M.generate_greedy(params, cfg, jnp.asarray(ids),
                            jnp.asarray(mask), [px], max_new_tokens=9,
                            eos_id=2, precision=FP32_PRECISION,
                            use_flash=False)
    got, rounds = M.generate_speculative(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask), [px],
        max_new_tokens=9, eos_id=2, draft_len=4,
        precision=FP32_PRECISION, use_flash=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert int(rounds) <= 9
