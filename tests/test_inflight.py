"""In-flight batching engine (models/inflight.py): per-request greedy
equivalence with `llava.generate_greedy`, including staggered admissions
where a new request joins slots mid-decode of its neighbours — the
continuous-batching property the reference gets from sglang
(`lmms_eval/models/llava_sglang.py`)."""

import numpy as np
import jax
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models import llava as M
from law_of_vision_representation_in_mllms_tpu.models.inflight import (
    InflightEngine)
from law_of_vision_representation_in_mllms_tpu.models.splice import (
    IMAGE_TOKEN_INDEX)

from test_train_step import _tiny


def _request(rng, l):
    ids = rng.randint(1, 60, size=(1, l)).astype(np.int32)
    ids[:, 0] = IMAGE_TOKEN_INDEX
    mask = np.ones((1, l), bool)
    pixels = [rng.randn(1, 14, 14, 3).astype(np.float32)]
    return ids, mask, pixels


def _reference(params, cfg, ids, mask, pixels, max_new, eos_id):
    toks = M.generate_greedy(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask),
        [jnp.asarray(p) for p in pixels], max_new_tokens=max_new,
        eos_id=eos_id, precision=FP32_PRECISION, use_flash=False)
    row = np.asarray(toks)[0].tolist()
    if eos_id in row:
        row = row[:row.index(eos_id)]
    return row


def test_inflight_matches_generate_greedy():
    cfg, params = _tiny()
    eos = 3
    eng = InflightEngine(params, cfg, eos_id=eos, n_slots=2,
                         prompt_cap=32, gen_cap=16, chunk=4,
                         precision=FP32_PRECISION, use_flash=False)
    try:
        rng = np.random.RandomState(0)
        reqs = [_request(rng, l) for l in (8, 12, 8)]
        max_new = [10, 6, 10]
        refs = [_reference(params, cfg, *r, m, eos)
                for r, m in zip(reqs, max_new)]
        # 3 requests through 2 slots: the third admits into whichever slot
        # frees first, mid-decode of the survivor
        handles = [eng.submit(r[0], r[1], r[2], m)
                   for r, m in zip(reqs, max_new)]
        outs = [h.result(timeout=120).tolist() for h in handles]
        assert outs == refs, (outs, refs)
        assert eng.dispatches >= 1
    finally:
        eng.shutdown()


def test_inflight_staggered_admission():
    """Submit request B only after request A has started decoding."""
    import time
    cfg, params = _tiny(1)
    eos = 3
    eng = InflightEngine(params, cfg, eos_id=eos, n_slots=2,
                         prompt_cap=32, gen_cap=16, chunk=2,
                         precision=FP32_PRECISION, use_flash=False)
    try:
        rng = np.random.RandomState(1)
        ra, rb = _request(rng, 8), _request(rng, 16)
        ref_a = _reference(params, cfg, *ra, 12, eos)
        ref_b = _reference(params, cfg, *rb, 12, eos)
        ha = eng.submit(*ra, 12)
        for _ in range(200):                   # wait for A to be mid-flight
            if eng.dispatches >= 1:
                break
            time.sleep(0.05)
        hb = eng.submit(*rb, 12)
        assert ha.result(timeout=120).tolist() == ref_a
        assert hb.result(timeout=120).tolist() == ref_b
    finally:
        eng.shutdown()


def test_inflight_rejects_overlong_prompt():
    cfg, params = _tiny(2)
    eng = InflightEngine(params, cfg, eos_id=3, n_slots=1,
                         prompt_cap=16, gen_cap=8,
                         precision=FP32_PRECISION, use_flash=False)
    try:
        rng = np.random.RandomState(2)
        ids, mask, pixels = _request(rng, 24)
        try:
            eng.submit(ids, mask, pixels, 4)
            assert False, "expected ValueError"
        except ValueError as e:
            assert "prompt_cap" in str(e)
    finally:
        eng.shutdown()


def test_inflight_cancel_frees_slot():
    """cancel() retires the slot early; a queued request then admits and
    completes with the correct greedy output."""
    import time
    cfg, params = _tiny(3)
    eos = 3
    eng = InflightEngine(params, cfg, eos_id=eos, n_slots=1,
                         prompt_cap=32, gen_cap=16, chunk=2,
                         precision=FP32_PRECISION, use_flash=False)
    try:
        rng = np.random.RandomState(4)
        ra, rb = _request(rng, 8), _request(rng, 8)
        ref_b = _reference(params, cfg, *rb, 8, eos)
        ha = eng.submit(*ra, 16)
        for _ in range(200):
            if eng.dispatches >= 1:
                break
            time.sleep(0.05)
        ha.cancel()
        hb = eng.submit(*rb, 8)
        assert hb.result(timeout=120).tolist() == ref_b
        ha.event.wait(timeout=60)
        assert ha.event.is_set()            # cancelled request completed
        # pre-admission cancel: fails fast without a prefill
        hc = eng.submit(*ra, 16)
        hd = eng.submit(*rb, 8)             # queued behind hc
        hc.cancel()
        assert hd.result(timeout=120).tolist() == ref_b
    finally:
        eng.shutdown()


def test_inflight_negotiated_layouts_parity():
    """negotiate_layouts=True (the 7B-scale AOT path: AUTO boundary
    layouts, one-time param/cache relayout) matches the default engine
    and generate_greedy exactly."""
    cfg, params = _tiny(5)
    eos = 3
    eng = InflightEngine(params, cfg, eos_id=eos, n_slots=2,
                         prompt_cap=32, gen_cap=16, chunk=4,
                         precision=FP32_PRECISION, use_flash=False,
                         negotiate_layouts=True)
    try:
        rng = np.random.RandomState(6)
        reqs = [_request(rng, l) for l in (8, 12)]
        refs = [_reference(params, cfg, *r, 10, eos) for r in reqs]
        handles = [eng.submit(r[0], r[1], r[2], 10) for r in reqs]
        outs = [h.result(timeout=180).tolist() for h in handles]
        assert outs == refs, (outs, refs)
        assert eng._param_formats is not None
    finally:
        eng.shutdown()


def test_inflight_prefix_cache():
    """Prompt-KV caching (`prefix_cache=N`, the sglang RadixAttention
    full-match case): a repeat prompt admits from the store with zero
    prefill and still matches generate_greedy exactly; a different
    prompt — or the same text with a different IMAGE — misses; the LRU
    evicts beyond capacity."""
    cfg, params = _tiny(9)
    eos = 3
    eng = InflightEngine(params, cfg, eos_id=eos, n_slots=2,
                         prompt_cap=32, gen_cap=16, chunk=3,
                         precision=FP32_PRECISION, use_flash=False,
                         prefix_cache=2)
    try:
        rng = np.random.RandomState(11)
        ra, rb = _request(rng, 8), _request(rng, 12)
        ref_a = _reference(params, cfg, *ra, 8, eos)
        ref_b = _reference(params, cfg, *rb, 8, eos)
        assert eng.submit(*ra, 8).result(timeout=120).tolist() == ref_a
        assert eng.prefix_hits == 0
        assert eng.submit(*ra, 8).result(timeout=120).tolist() == ref_a
        assert eng.prefix_hits == 1            # repeat prompt: hit
        assert eng.submit(*rb, 8).result(timeout=120).tolist() == ref_b
        assert eng.prefix_hits == 1            # new prompt: miss
        rc = (ra[0].copy(), ra[1].copy(), [p + 1.0 for p in ra[2]])
        ref_c = _reference(params, cfg, *rc, 8, eos)
        assert eng.submit(*rc, 8).result(timeout=120).tolist() == ref_c
        assert eng.prefix_hits == 1            # same text, new image: miss
        assert eng.stats()["prefix_entries"] == 2   # ra evicted (LRU cap)
        assert eng.submit(*ra, 8).result(timeout=120).tolist() == ref_a
        assert eng.prefix_hits == 1            # evicted: miss + re-store
        assert eng.submit(*ra, 8).result(timeout=120).tolist() == ref_a
        assert eng.prefix_hits == 2            # freshest again: hit
    finally:
        eng.shutdown()


def test_inflight_prefix_cache_byte_budget():
    """`prefix_cache_bytes` bounds the store by BYTES (the production
    bound for large models — at 7B one stored prompt row is ~800 MB, so
    an entry-count LRU alone OOMs the chip): byte accounting tracks
    inserts AND evictions, the budget evicts below the entry cap, and
    the newest entry survives even when it alone exceeds the budget."""
    cfg, params = _tiny(9)
    eos = 3
    eng = InflightEngine(params, cfg, eos_id=eos, n_slots=2,
                         prompt_cap=32, gen_cap=16, chunk=3,
                         precision=FP32_PRECISION, use_flash=False,
                         prefix_cache=8, prefix_cache_bytes=1)
    try:
        rng = np.random.RandomState(11)
        ra, rb = _request(rng, 8), _request(rng, 12)
        ref_a = _reference(params, cfg, *ra, 8, eos)
        assert eng.submit(*ra, 8).result(timeout=120).tolist() == ref_a
        st = eng.stats()
        # one entry survives its own over-budget insert (never empty)
        assert st["prefix_entries"] == 1
        entry_bytes = st["prefix_bytes"]
        assert entry_bytes > 1                 # real row bytes counted
        eng.submit(*rb, 8).result(timeout=120)
        st = eng.stats()
        assert st["prefix_entries"] == 1       # budget evicted ra
        # eviction SUBTRACTED ra's bytes (not accumulated)
        assert st["prefix_bytes"] < 2 * entry_bytes
        # repeat rb now hits the surviving entry
        n_hits = eng.prefix_hits
        eng.submit(*rb, 8).result(timeout=120)
        assert eng.prefix_hits == n_hits + 1
    finally:
        eng.shutdown()

    # a budget large enough for both entries keeps both
    eng = InflightEngine(params, cfg, eos_id=eos, n_slots=2,
                         prompt_cap=32, gen_cap=16, chunk=3,
                         precision=FP32_PRECISION, use_flash=False,
                         prefix_cache=8,
                         prefix_cache_bytes=4 * entry_bytes)
    try:
        rng = np.random.RandomState(11)
        ra, rb = _request(rng, 8), _request(rng, 12)
        eng.submit(*ra, 8).result(timeout=120)
        eng.submit(*rb, 8).result(timeout=120)
        assert eng.stats()["prefix_entries"] == 2
    finally:
        eng.shutdown()


def test_inflight_prefix_cache_negotiated():
    """prefix_cache composes with the 7B-scale negotiated-layouts AOT
    path: store entries live in the negotiated k=1 local-cache format and
    hits install without layout conversions."""
    cfg, params = _tiny(13)
    eos = 3
    eng = InflightEngine(params, cfg, eos_id=eos, n_slots=2,
                         prompt_cap=32, gen_cap=16, chunk=4,
                         precision=FP32_PRECISION, use_flash=False,
                         negotiate_layouts=True, prefix_cache=2)
    try:
        rng = np.random.RandomState(12)
        ra = _request(rng, 8)
        ref_a = _reference(params, cfg, *ra, 10, eos)
        assert eng.submit(*ra, 10).result(timeout=180).tolist() == ref_a
        assert eng.submit(*ra, 10).result(timeout=180).tolist() == ref_a
        assert eng.prefix_hits == 1
    finally:
        eng.shutdown()


def test_inflight_per_slot_sampling():
    """Mixed greedy/sampled slots in ONE step program: a greedy request
    and a degenerate-nucleus sampled request (top_p -> 0 forces argmax
    at any temperature) both reproduce generate_greedy exactly while
    decoding concurrently; a truly sampled request completes within its
    budget."""
    cfg, params = _tiny(15)
    eos = 3
    eng = InflightEngine(params, cfg, eos_id=eos, n_slots=3,
                         prompt_cap=32, gen_cap=16, chunk=3,
                         precision=FP32_PRECISION, use_flash=False)
    try:
        rng = np.random.RandomState(21)
        ra, rb, rc = _request(rng, 8), _request(rng, 12), _request(rng, 8)
        ref_a = _reference(params, cfg, *ra, 10, eos)
        ref_b = _reference(params, cfg, *rb, 10, eos)
        ha = eng.submit(*ra, 10)                                  # greedy
        hb = eng.submit(*rb, 10, temperature=1.7, top_p=1e-9)     # =argmax
        hc = eng.submit(*rc, 10, temperature=1.0, top_p=0.95)     # sampled
        assert ha.result(timeout=180).tolist() == ref_a
        assert hb.result(timeout=180).tolist() == ref_b
        out_c = hc.result(timeout=180).tolist()
        assert len(out_c) <= 10
        assert all(0 <= t < cfg.decoder.vocab_size for t in out_c)
    finally:
        eng.shutdown()


def test_inflight_batched_admission():
    """5 concurrent mixed-length requests through 3 slots: the burst
    admits via batched (b=k) prefills and every request still matches
    generate_greedy exactly."""
    cfg, params = _tiny(7)
    eos = 4
    eng = InflightEngine(params, cfg, eos_id=eos, n_slots=3,
                         prompt_cap=32, gen_cap=16, chunk=3,
                         precision=FP32_PRECISION, use_flash=False)
    try:
        rng = np.random.RandomState(8)
        reqs = [_request(rng, l) for l in (6, 9, 17, 6, 12)]
        max_new = [10, 4, 8, 12, 6]
        refs = [_reference(params, cfg, *r, m, eos)
                for r, m in zip(reqs, max_new)]
        handles = [eng.submit(r[0], r[1], r[2], m)
                   for r, m in zip(reqs, max_new)]
        outs = [h.result(timeout=180).tolist() for h in handles]
        assert outs == refs, (outs, refs)
        assert eng.admissions == 5
    finally:
        eng.shutdown()


def test_inflight_partial_prefix_reuse():
    """Partial-prefix KV reuse (VERDICT r3 #7): a prompt sharing a long
    leading run (incl. the same image) with a stored entry admits by
    reusing the first p spliced KV positions and prefilling only the
    text suffix — output still matches generate_greedy exactly; the
    combined prompt is stored, so an exact repeat then full-hits."""
    cfg, params = _tiny(17)
    eos = 3
    eng = InflightEngine(params, cfg, eos_id=eos, n_slots=2,
                         prompt_cap=32, gen_cap=16, chunk=3,
                         precision=FP32_PRECISION, use_flash=False,
                         prefix_cache=4, prefix_block=8)
    try:
        rng = np.random.RandomState(31)
        base_ids, mask, pixels = _request(rng, 24)
        # request B: same first 20 tokens + same image, different tail
        ids_b = base_ids.copy()
        ids_b[0, 20:] = rng.randint(1, 60, size=4)
        ref_a = _reference(params, cfg, base_ids, mask, pixels, 8, eos)
        ref_b = _reference(params, cfg, ids_b, mask, pixels, 8, eos)

        out_a = eng.submit(base_ids, mask, pixels, 8).result(timeout=120)
        assert out_a.tolist() == ref_a
        assert eng.partial_hits == 0
        out_b = eng.submit(ids_b, mask, pixels, 8).result(timeout=120)
        assert out_b.tolist() == ref_b
        assert eng.partial_hits == 1          # suffix-only admission
        # exact repeat of B now FULL-hits (combined entry stored)
        out_b2 = eng.submit(ids_b, mask, pixels, 8).result(timeout=120)
        assert out_b2.tolist() == ref_b
        assert eng.prefix_hits == 1 and eng.partial_hits == 1
        # different image: no partial reuse (pixkey mismatch)
        px_c = [p + 1.0 for p in pixels]
        ids_c = base_ids.copy()
        ids_c[0, 21:] = rng.randint(1, 60, size=3)
        ref_c = _reference(params, cfg, ids_c, mask, px_c, 8, eos)
        out_c = eng.submit(ids_c, mask, px_c, 8).result(timeout=120)
        assert out_c.tolist() == ref_c
        assert eng.partial_hits == 1
    finally:
        eng.shutdown()


def test_inflight_partial_prefix_negotiated():
    """Partial reuse composes with the negotiated-layouts AOT path (the
    7B contract): the suffix program is pinned to the k=1 local-cache
    format."""
    cfg, params = _tiny(19)
    eos = 3
    eng = InflightEngine(params, cfg, eos_id=eos, n_slots=2,
                         prompt_cap=32, gen_cap=16, chunk=4,
                         precision=FP32_PRECISION, use_flash=False,
                         negotiate_layouts=True, prefix_cache=2,
                         prefix_block=8)
    try:
        rng = np.random.RandomState(33)
        ids_a, mask, pixels = _request(rng, 24)
        ids_b = ids_a.copy()
        ids_b[0, 21:] = rng.randint(1, 60, size=3)
        ref_a = _reference(params, cfg, ids_a, mask, pixels, 8, eos)
        ref_b = _reference(params, cfg, ids_b, mask, pixels, 8, eos)
        assert eng.submit(ids_a, mask, pixels,
                          8).result(timeout=180).tolist() == ref_a
        assert eng.submit(ids_b, mask, pixels,
                          8).result(timeout=180).tolist() == ref_b
        assert eng.partial_hits == 1
    finally:
        eng.shutdown()


def test_inflight_kv_quant_int8():
    """The engine runs on an int8 KV cache (cfg.kv_quant): the global
    cache, local prefill caches, and the prompt-KV store all carry the
    4-D scale leaves (the splice/extract tree ops are rank-agnostic),
    and per-request outputs match generate_greedy under the SAME
    quantized cache."""
    import dataclasses
    cfg, params = _tiny(21)
    cfg = dataclasses.replace(cfg, kv_quant="int8")
    eos = 3
    eng = InflightEngine(params, cfg, eos_id=eos, n_slots=2,
                         prompt_cap=32, gen_cap=16, chunk=4,
                         precision=FP32_PRECISION, use_flash=False,
                         prefix_cache=4)
    try:
        assert eng.cache["k"].dtype == jnp.int8
        assert eng.cache["k_scale"].shape == eng.cache["k"].shape[:-1]
        rng = np.random.RandomState(22)
        reqs = [_request(rng, l) for l in (8, 8, 12)]
        refs = [_reference(params, cfg, *r, 8, eos) for r in reqs]
        for r, want in zip(reqs, refs):
            assert eng.submit(*r, 8).result(timeout=120).tolist() == want
        # repeat the first prompt: served from the quantized KV store
        assert eng.submit(*reqs[0], 8).result(
            timeout=120).tolist() == refs[0]
        assert eng.prefix_hits == 1
    finally:
        eng.shutdown()
