"""Flash-decode Pallas kernel (ops/decode_attention.py): parity with the
dense decode attention (`models/llama._decode_attention` — itself
parity-locked to the batched-dot `_attention` the HF goldens cover) for
MHA/GQA, bf16/int8 caches, ragged tile boundaries, and masks with holes
(the inflight engine's short-prompt slots are valid-prefix + invalid
tail + valid gen region)."""

import numpy as np
import jax
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.models.llama import (
    _attention)
from law_of_vision_representation_in_mllms_tpu.ops.decode_attention \
    import decode_attention
from law_of_vision_representation_in_mllms_tpu.ops.quant import quantize_kv


def _case(rng, b, t, nh, nkv, dh, holes=False):
    q = jnp.asarray(rng.randn(b, 1, nh, dh), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, nkv, dh), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, nkv, dh), jnp.float32)
    m = np.ones((b, t), bool)
    for i in range(b):                       # ragged valid lengths
        m[i, rng.randint(2, t):] = False
    if holes:                                # invalid mid-run + valid tail
        m[:, t // 3: t // 2] = False
        m[:, -1] = True
    mask = jnp.asarray(m)[:, None, None, :]
    return q, k, v, mask


def _assert_close(got, want, tol=2e-5):
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


def test_decode_kernel_matches_dense_mha():
    rng = np.random.RandomState(0)
    q, k, v, mask = _case(rng, b=3, t=40, nh=4, nkv=4, dh=32)
    want = _attention(q, k, v, mask)
    got = decode_attention(q, k, v, mask, block_t=16)
    _assert_close(got, want)


def test_decode_kernel_matches_dense_gqa():
    rng = np.random.RandomState(1)
    q, k, v, mask = _case(rng, b=2, t=33, nh=8, nkv=2, dh=16)
    want = _attention(q, k, v, mask)
    got = decode_attention(q, k, v, mask, block_t=16)   # ragged: 33/16
    _assert_close(got, want)


def test_decode_kernel_mask_holes():
    rng = np.random.RandomState(2)
    q, k, v, mask = _case(rng, b=2, t=50, nh=4, nkv=4, dh=32, holes=True)
    want = _attention(q, k, v, mask)
    got = decode_attention(q, k, v, mask, block_t=16)
    _assert_close(got, want)


def test_decode_kernel_int8_cache():
    rng = np.random.RandomState(3)
    q, k, v, mask = _case(rng, b=2, t=37, nh=4, nkv=4, dh=32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    want = _attention(q, kq, vq, mask, k_scale=ks, v_scale=vs)
    got = decode_attention(q, kq, vq, mask, ks, vs, block_t=16)
    _assert_close(got, want)


def test_decode_kernel_stacked_mha_direct():
    """The 3D MHA specialization of the stacked kernel (the 7B shape
    family) matches the dense path, bf16-style f32 and int8 caches,
    ragged tiles."""
    from law_of_vision_representation_in_mllms_tpu.ops.decode_attention \
        import decode_attention_stacked
    rng = np.random.RandomState(7)
    b, t, nh, dh, L = 2, 37, 4, 32, 3
    q = jnp.asarray(rng.randn(b, 1, nh, dh), jnp.float32)
    ck = jnp.asarray(rng.randn(L, b, t, nh, dh), jnp.float32)
    cv = jnp.asarray(rng.randn(L, b, t, nh, dh), jnp.float32)
    m = np.ones((b, t), bool)
    m[0, 20:] = False
    m[1, 9:13] = False                        # hole
    mask = jnp.asarray(m)[:, None, None, :]
    for li in (0, 2):
        want = _attention(q, ck[li], cv[li], mask)
        got = decode_attention_stacked(q, ck, cv, li, mask, block_t=16)
        _assert_close(got, want)
    # int8 cache + per-layer scales
    kq = np.empty((L, b, t, nh, dh), np.int8)
    ks = np.empty((L, b, t, nh), np.float32)
    vq, vs = kq.copy(), ks.copy()
    for li in range(L):
        a, s_ = quantize_kv(ck[li])
        kq[li], ks[li] = np.asarray(a), np.asarray(s_)
        a, s_ = quantize_kv(cv[li])
        vq[li], vs[li] = np.asarray(a), np.asarray(s_)
    kq, ks = jnp.asarray(kq), jnp.asarray(ks)
    vq, vs = jnp.asarray(vq), jnp.asarray(vs)
    want = _attention(q, kq[1], vq[1], mask, k_scale=ks[1], v_scale=vs[1])
    got = decode_attention_stacked(q, kq, vq, 1, mask, ks, vs, block_t=16)
    _assert_close(got, want)


import pytest


@pytest.mark.parametrize("impl", ["pallas", "pallas_stacked"])
@pytest.mark.parametrize("kvq", [None, "int8"])
def test_decode_kernel_routes_from_forward(impl, kvq):
    """cfg.decode_attn='pallas'/'pallas_stacked' drives the kernel
    through the full decode step and matches the xla route's tokens
    (the stacked variant block-indexes the [L,B,T,KV,D] cache directly
    — no per-layer slice)."""
    import dataclasses
    from law_of_vision_representation_in_mllms_tpu.models import llama as L
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        FP32_PRECISION)
    cfg = L.tiny(vocab_size=97, hidden_size=64, num_layers=2, num_heads=4,
                 num_kv_heads=2, intermediate_size=64)
    params = L.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.RandomState(4)
    ids = jnp.asarray(rng.randint(3, 97, size=(2, 9)), jnp.int32)

    def decode(cfg):
        b, l = ids.shape
        t_max = l + 4
        cache = L.init_cache(cfg, b, t_max, jnp.float32, quant=kvq)
        emb = L.embed_tokens(params, ids, FP32_PRECISION)
        pos = jnp.broadcast_to(jnp.arange(l)[None], (b, l))
        h, cache = L.forward(params, cfg, emb, pos,
                             attn_mask=jnp.arange(t_max)[None] < l,
                             cache=cache, cache_index=0,
                             precision=FP32_PRECISION)
        tok = jnp.argmax(L.logits_fn(params, h[:, -1:], FP32_PRECISION
                                     )[:, -1], -1).astype(jnp.int32)
        out = [tok]
        for t in range(3):
            emb = L.embed_tokens(params, tok[:, None], FP32_PRECISION)
            p = jnp.full((b, 1), l + t, jnp.int32)
            h, cache = L.forward(
                params, cfg, emb, p,
                attn_mask=jnp.arange(t_max)[None] < l + t + 1,
                cache=cache, cache_index=l + t,
                precision=FP32_PRECISION)
            tok = jnp.argmax(L.logits_fn(params, h, FP32_PRECISION
                                         )[:, -1], -1).astype(jnp.int32)
            out.append(tok)
        return np.asarray(jnp.stack(out, 1))

    ref = decode(cfg)
    got = decode(dataclasses.replace(cfg, decode_attn=impl))
    np.testing.assert_array_equal(got, ref)
