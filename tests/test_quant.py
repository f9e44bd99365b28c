"""Weight-only int8 decode quantization (ops/quant.py).

The reference serves with bitsandbytes load_in_8bit
(`llava/train/train.py:908-932`); here int8 is the decode-bandwidth
lever (param-read floor halves). Contract tests: quantization error is
bounded and the matmul identity holds exactly; decode paths (greedy,
chunked, beam, logits) run quantized end-to-end and match the dense
model bit-for-bit when the weights are exactly int8-representable.
"""

import numpy as np
import jax
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models import llama as L
from law_of_vision_representation_in_mllms_tpu.models import llava as M
from law_of_vision_representation_in_mllms_tpu.ops.quant import (
    DECODER_TARGETS, dequantize_int8, int8_matmul, quantize_decoder,
    quantize_int8)

from test_train_step import _tiny
from test_beam import _req


def test_quantize_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    w = rng.randn(64, 128).astype(np.float32) * 0.02
    q = quantize_int8(jnp.asarray(w), axis=-2)
    assert q["q8"].dtype == jnp.int8 and q["scale"].shape == (1, 128)
    deq = np.asarray(dequantize_int8(q))
    # symmetric per-channel: |err| <= scale/2 per element
    err = np.abs(deq - w)
    bound = np.asarray(q["scale"])[0] / 2 + 1e-9
    assert (err <= bound[None, :]).all()


def test_quantize_exact_for_representable_weights():
    rng = np.random.RandomState(1)
    ints = rng.randint(-127, 128, size=(32, 16)).astype(np.float32)
    ints[0] = 127.0            # pin the per-channel max so scale recovers
    w = ints * 0.003
    q = quantize_int8(jnp.asarray(w), axis=-2)
    np.testing.assert_allclose(np.asarray(dequantize_int8(q)), w,
                               rtol=1e-6, atol=1e-9)


def test_int8_matmul_matches_dequant_matmul():
    rng = np.random.RandomState(2)
    w = rng.randn(48, 32).astype(np.float32) * 0.05
    x = rng.randn(3, 5, 48).astype(np.float32)
    q = quantize_int8(jnp.asarray(w), axis=-2)
    got = np.asarray(int8_matmul(jnp.asarray(x), q))
    ref = np.asarray(x @ np.asarray(dequantize_int8(q)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def _representable_decoder(params):
    """Round every decoder matmul weight to its own int8 grid, so
    quantization becomes exact and decode parity can be asserted
    bit-for-bit."""
    dec = dict(params["decoder"])
    layers = dict(dec["layers"])
    for t in DECODER_TARGETS:
        layers[t] = dequantize_int8(quantize_int8(layers[t], axis=-2))
    dec["layers"] = layers
    dec["lm_head"] = dequantize_int8(quantize_int8(dec["lm_head"], axis=-2))
    out = dict(params)
    out["decoder"] = dec
    return out


def test_quantized_generate_matches_dense_on_representable_weights():
    cfg, params = _tiny()
    params = _representable_decoder(params)
    qparams = dict(params)
    qparams["decoder"] = quantize_decoder(params["decoder"])
    # resident weight bytes actually shrink
    from law_of_vision_representation_in_mllms_tpu.ops.quant import (
        quantized_bytes)
    assert quantized_bytes(qparams["decoder"]) < \
        quantized_bytes(params["decoder"])

    ids, mask, px = _req(np.random.RandomState(3), 2, 9)
    common = dict(max_new_tokens=8, eos_id=3, precision=FP32_PRECISION,
                  use_flash=False)
    dense = np.asarray(M.generate_greedy(params, cfg, ids, mask, px,
                                         **common))
    quant = np.asarray(M.generate_greedy(qparams, cfg, ids, mask, px,
                                         **common))
    assert dense.tolist() == quant.tolist()

    beam_d = np.asarray(M.generate_beam(params, cfg, ids, mask, px,
                                        num_beams=2, **common))
    beam_q = np.asarray(M.generate_beam(qparams, cfg, ids, mask, px,
                                        num_beams=2, **common))
    assert beam_d.tolist() == beam_q.tolist()


def test_quantized_chunked_decoder_runs():
    from law_of_vision_representation_in_mllms_tpu.models.decode import (
        ChunkedGreedyDecoder)
    cfg, params = _tiny()
    params = _representable_decoder(params)
    qparams = dict(params)
    qparams["decoder"] = quantize_decoder(params["decoder"])
    ids, mask, px = _req(np.random.RandomState(4), 2, 9)
    ref = np.asarray(M.generate_greedy(
        params, cfg, ids, mask, px, max_new_tokens=8, eos_id=3,
        precision=FP32_PRECISION, use_flash=False))
    dec = ChunkedGreedyDecoder(qparams, cfg, eos_id=3,
                               precision=FP32_PRECISION, chunk=4)
    got = np.asarray(dec.generate(ids, mask, px, max_new_tokens=8))
    assert got.tolist() == ref.tolist()


def test_quantized_lora_delta_applies():
    """LoRA adapters stay dense on top of a quantized base."""
    from law_of_vision_representation_in_mllms_tpu.models.lora import (
        LoraConfig, init_lora)
    cfg, params = _tiny()
    qdec = quantize_decoder(params["decoder"])
    lcfg = LoraConfig(rank=2, targets=("wq",))
    lora = init_lora(jax.random.PRNGKey(0), cfg.decoder, lcfg)
    # non-zero B so the delta is visible
    lora["wq_b"] = jnp.ones_like(lora["wq_b"]) * 0.1
    rng = np.random.RandomState(5)
    emb = jnp.asarray(rng.randn(1, 4, cfg.decoder.hidden_size)
                      .astype(np.float32))
    pos = jnp.arange(4)[None]
    base, _ = L.forward(qdec, cfg.decoder, emb, pos,
                        precision=FP32_PRECISION)
    with_lora, _ = L.forward(qdec, cfg.decoder, emb, pos,
                             precision=FP32_PRECISION, lora=lora,
                             lora_scaling=lcfg.scaling)
    assert not np.allclose(np.asarray(base), np.asarray(with_lora))


def test_build_lmm_quantize_knob(tmp_path):
    """model.quantize=int8 routes through the eval runner's build path."""
    from law_of_vision_representation_in_mllms_tpu.ops.quant import (
        is_quantized)
    from test_cli_runners import _tiny_train_config
    from law_of_vision_representation_in_mllms_tpu.core.config import (
        RunConfig)
    from law_of_vision_representation_in_mllms_tpu.eval.runner import (
        build_lmm)
    d = _tiny_train_config(tmp_path)
    d["model"]["vision_tower"] = "debug/tiny-vit"   # eval needs a real tower
    d["model"]["quantize"] = "int8"
    cfg = RunConfig.from_dict(d)
    lmm = build_lmm(cfg)
    assert is_quantized(lmm.params["decoder"]["layers"]["wq"])
    assert is_quantized(lmm.params["decoder"]["lm_head"])


# ---- int4 (grouped scales) ----

def test_int4_roundtrip_error_bound():
    from law_of_vision_representation_in_mllms_tpu.ops.quant import (
        dequantize_int4, quantize_int4)
    rng = np.random.RandomState(6)
    w = rng.randn(128, 64).astype(np.float32) * 0.02
    q = quantize_int4(jnp.asarray(w), group_size=32)
    # packed: two 4-bit codes per int8 byte along the contraction
    assert q["q4"].dtype == jnp.int8 and q["q4"].shape == (64, 64)
    assert q["scale"].shape == (4, 64)
    deq = np.asarray(dequantize_int4(q))
    # symmetric per-(group, channel): |err| <= scale/2 per element
    scale = np.asarray(q["scale"])                       # [G, do]
    bound = np.repeat(scale, 32, axis=0) / 2 + 1e-9      # [di, do]
    assert (np.abs(deq - w) <= bound).all()


def test_int4_exact_for_representable_weights():
    from law_of_vision_representation_in_mllms_tpu.ops.quant import (
        dequantize_int4, quantize_int4)
    rng = np.random.RandomState(7)
    ints = rng.randint(-7, 8, size=(64, 16)).astype(np.float32)
    ints[0] = 7.0
    ints[32] = 7.0          # pin each group's max so scales recover
    w = ints * 0.003
    q = quantize_int4(jnp.asarray(w), group_size=32)
    np.testing.assert_allclose(np.asarray(dequantize_int4(q)), w,
                               rtol=1e-6, atol=1e-9)


def test_int4_matmul_matches_dequant_matmul():
    from law_of_vision_representation_in_mllms_tpu.ops.quant import (
        dequantize_int4, int4_matmul, quantize_int4)
    rng = np.random.RandomState(8)
    w = rng.randn(96, 32).astype(np.float32) * 0.05
    x = rng.randn(3, 5, 96).astype(np.float32)
    for gs in (None, 32):
        q = quantize_int4(jnp.asarray(w), group_size=gs)
        got = np.asarray(int4_matmul(jnp.asarray(x), q))
        ref = np.asarray(x @ np.asarray(dequantize_int4(q)))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_int4_grouped_scales_beat_per_channel():
    """The accuracy rationale for group_size: outlier rows stop
    inflating the whole channel's scale."""
    from law_of_vision_representation_in_mllms_tpu.ops.quant import (
        dequantize_int4, quantize_int4)
    rng = np.random.RandomState(9)
    w = rng.randn(128, 8).astype(np.float32) * 0.01
    w[0] += 1.0                      # one outlier row per channel
    wj = jnp.asarray(w)
    err_pc = np.abs(np.asarray(dequantize_int4(
        quantize_int4(wj, group_size=None))) - w).mean()
    err_g = np.abs(np.asarray(dequantize_int4(
        quantize_int4(wj, group_size=32))) - w).mean()
    assert err_g < err_pc / 2


def test_int4_generate_matches_dense_on_representable_weights():
    from law_of_vision_representation_in_mllms_tpu.ops.quant import (
        dequantize_int4, quantize_int4)
    cfg, params = _tiny()
    gs = 4   # tiny hidden sizes; any divisor works
    dec = dict(params["decoder"])
    layers = dict(dec["layers"])
    for t in DECODER_TARGETS:
        layers[t] = dequantize_int4(
            quantize_int4(layers[t], group_size=gs), jnp.float32)
    dec["layers"] = layers
    dec["lm_head"] = dequantize_int4(
        quantize_int4(dec["lm_head"], group_size=gs), jnp.float32)
    params = dict(params)
    params["decoder"] = dec
    qparams = dict(params)
    qparams["decoder"] = quantize_decoder(params["decoder"], bits=4,
                                          group_size=gs)
    ids, mask, px = _req(np.random.RandomState(10), 2, 9)
    common = dict(max_new_tokens=8, eos_id=3, precision=FP32_PRECISION,
                  use_flash=False)
    dense = np.asarray(M.generate_greedy(params, cfg, ids, mask, px,
                                         **common))
    quant = np.asarray(M.generate_greedy(qparams, cfg, ids, mask, px,
                                         **common))
    assert dense.tolist() == quant.tolist()


def test_int4_kernel_matches_xla_path():
    """Pallas decode kernel (interpret mode on CPU) vs the XLA
    formulation, on a production-shaped tile (gsz=128 -> hg=64 passes
    the lane/sublane gate)."""
    from law_of_vision_representation_in_mllms_tpu.ops.int4_kernel import (
        int4_matmul_kernel, kernel_supported)
    from law_of_vision_representation_in_mllms_tpu.ops.quant import (
        dequantize_int4, quantize_int4)
    rng = np.random.RandomState(11)
    w = rng.randn(256, 256).astype(np.float32) * 0.05
    q = quantize_int4(jnp.asarray(w), group_size=128)
    assert kernel_supported(q["q4"], q["scale"])
    # x exactly bf16-representable so kernel (bf16 operands, f32
    # accumulate) and f32 reference agree to float rounding
    x = np.asarray(jnp.asarray(
        rng.randn(3, 256).astype(np.float32)).astype(jnp.bfloat16)
    ).astype(np.float32)
    got = np.asarray(int4_matmul_kernel(
        jnp.asarray(x), q["q4"], q["scale"], interpret=True))
    ref = x @ np.asarray(dequantize_int4(q))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_int4_kernel_gate_rejects_tiny_shapes():
    from law_of_vision_representation_in_mllms_tpu.ops.int4_kernel import (
        kernel_supported)
    from law_of_vision_representation_in_mllms_tpu.ops.quant import (
        quantize_int4)
    q = quantize_int4(jnp.ones((64, 16)), group_size=32)   # gsz=32 < 128
    assert not kernel_supported(q["q4"], q["scale"])


def test_build_lmm_quantize_int4_knob(tmp_path):
    from law_of_vision_representation_in_mllms_tpu.ops.quant import (
        is_quantized)
    from test_cli_runners import _tiny_train_config
    from law_of_vision_representation_in_mllms_tpu.core.config import (
        RunConfig)
    from law_of_vision_representation_in_mllms_tpu.eval.runner import (
        build_lmm)
    d = _tiny_train_config(tmp_path)
    d["model"]["vision_tower"] = "debug/tiny-vit"
    d["model"]["quantize"] = "int4"
    cfg = RunConfig.from_dict(d)
    lmm = build_lmm(cfg)
    assert "q4" in lmm.params["decoder"]["layers"]["wq"]
    assert is_quantized(lmm.params["decoder"]["lm_head"])


def test_int4_kernel_large_m_branch_matches():
    """M>64 routes the single K=gsz dot (prefill shape); parity vs the
    dequantized reference."""
    from law_of_vision_representation_in_mllms_tpu.ops.int4_kernel import (
        int4_matmul_kernel)
    from law_of_vision_representation_in_mllms_tpu.ops.quant import (
        dequantize_int4, quantize_int4)
    rng = np.random.RandomState(12)
    w = rng.randn(256, 128).astype(np.float32) * 0.05
    q = quantize_int4(jnp.asarray(w), group_size=128)
    x = np.asarray(jnp.asarray(
        rng.randn(96, 256).astype(np.float32)).astype(jnp.bfloat16)
    ).astype(np.float32)
    got = np.asarray(int4_matmul_kernel(
        jnp.asarray(x), q["q4"], q["scale"], interpret=True))
    ref = x @ np.asarray(dequantize_int4(q))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_int4_kernel_vjp_matches_xla_grad():
    """The kernel path's custom VJP (QLoRA train: dL/dx through the
    frozen int4 base, ops/quant._int4_kernel_mm_bwd) vs jax.grad of the
    XLA dequant-matmul formulation, interpret mode on CPU."""
    from law_of_vision_representation_in_mllms_tpu.ops.quant import (
        _int4_kernel_mm, dequantize_int4, quantize_int4)
    rng = np.random.RandomState(13)
    w = rng.randn(256, 128).astype(np.float32) * 0.05
    q = quantize_int4(jnp.asarray(w), group_size=128)
    x = np.asarray(jnp.asarray(
        rng.randn(6, 256).astype(np.float32)).astype(jnp.bfloat16)
    ).astype(np.float32)
    t = jnp.asarray(rng.randn(6, 128).astype(np.float32))

    def via_kernel(xv):
        return jnp.sum(_int4_kernel_mm(xv, q["q4"], q["scale"], True) * t)

    def via_xla(xv):
        return jnp.sum((xv @ dequantize_int4(q, jnp.float32)) * t)

    gk = jax.grad(via_kernel)(jnp.asarray(x))
    gx = jax.grad(via_xla)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                               rtol=2e-3, atol=2e-3)
    # scale cotangent exists (zeros); the int codes get float0
    gs = jax.grad(lambda s: jnp.sum(_int4_kernel_mm(
        jnp.asarray(x), q["q4"], s, True)))(q["scale"])
    assert not np.any(np.asarray(gs))


# ---------------------------------------------------------------------------
# int8 KV-cache quantization (ops/quant.quantize_kv + llama int8 cache)
# ---------------------------------------------------------------------------

def test_quantize_kv_grid_roundtrip_exact():
    """Vectors already on an int8 grid roundtrip losslessly."""
    from law_of_vision_representation_in_mllms_tpu.ops.quant import (
        quantize_kv)
    rng = np.random.RandomState(0)
    codes = rng.randint(-127, 128, size=(2, 3, 2, 8)).astype(np.float32)
    codes[..., 0] = 127.0                      # pin maxabs per vector
    scale = 0.03125
    x = jnp.asarray(codes * scale)
    q, s = quantize_kv(x)
    np.testing.assert_array_equal(np.asarray(q), codes.astype(np.int8))
    np.testing.assert_allclose(np.asarray(s), scale, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(q).astype(np.float32)
                               * np.asarray(s)[..., None],
                               np.asarray(x), rtol=1e-6)


def _decode_logits(cfg, params, batch, kv_quant, steps=4):
    """Prefill + `steps` cached greedy decode steps; returns the stacked
    per-step logits and tokens (the quantized cache path under test)."""
    import dataclasses
    cfg = dataclasses.replace(cfg, kv_quant=kv_quant)
    ids, mask = batch["input_ids"], batch["text_mask"]
    b, l = ids.shape
    from law_of_vision_representation_in_mllms_tpu.models.splice import (
        IGNORE_INDEX, splice_plan, splice_embeds)
    plan = splice_plan(ids, jnp.full_like(ids, IGNORE_INDEX), mask,
                       cfg.num_patches)
    img = M.encode_images(params, cfg, batch["pixel_values"],
                          FP32_PRECISION)
    txt = L.embed_tokens(params["decoder"], ids, FP32_PRECISION)
    embeds = splice_embeds(plan, txt, img)
    l_out = embeds.shape[1]
    t_max = l_out + steps
    cache = L.init_cache(cfg.decoder, b, t_max, jnp.float32,
                         quant=cfg.kv_quant)
    slot_valid = jnp.concatenate(
        [plan.attn_mask, jnp.zeros((b, steps), bool)], axis=1)
    h, cache = L.forward(params["decoder"], cfg.decoder, embeds,
                         plan.positions, attn_mask=slot_valid, cache=cache,
                         cache_index=0, precision=FP32_PRECISION)
    n_valid = jnp.sum(plan.attn_mask, axis=1)
    h_last = jnp.take_along_axis(
        h, jnp.maximum(n_valid - 1, 0)[:, None, None], axis=1)[:, 0]
    tok = jnp.argmax(
        L.logits_fn(params["decoder"], h_last[:, None], FP32_PRECISION)
        [:, -1], axis=-1).astype(jnp.int32)
    pos = n_valid
    outs, toks = [], []
    for t in range(steps):
        emb = L.embed_tokens(params["decoder"], tok[:, None],
                             FP32_PRECISION)
        sv = jnp.concatenate(
            [plan.attn_mask,
             jnp.broadcast_to(jnp.arange(steps) <= t, (b, steps))], axis=1)
        h, cache = L.forward(params["decoder"], cfg.decoder, emb,
                             pos[:, None], attn_mask=sv, cache=cache,
                             cache_index=l_out + t,
                             precision=FP32_PRECISION)
        logits = L.logits_fn(params["decoder"], h, FP32_PRECISION)[:, -1]
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        outs.append(np.asarray(logits))
        toks.append(np.asarray(tok))
        pos = pos + 1
    if cfg.kv_quant:
        assert cache["k"].dtype == jnp.int8
        assert cache["k_scale"].shape == cache["k"].shape[:-1]
    return np.stack(outs), np.stack(toks)


def test_kv_quant_decode_logits_close_mha():
    from test_splice_llava import _tiny_batch, _tiny_llava
    cfg, params = _tiny_llava(3)
    batch = _tiny_batch(cfg, np.random.RandomState(3), b=2, l=6)
    dense, tok_d = _decode_logits(cfg, params, batch, None)
    quant, tok_q = _decode_logits(cfg, params, batch, "int8")
    # int8 per-vector quantization noise on K/V perturbs logits at the
    # ~1% level; greedy tokens agree on this fixed seed
    err = np.abs(quant - dense).max() / (np.abs(dense).max() + 1e-9)
    assert err < 0.05, err
    np.testing.assert_array_equal(tok_q, tok_d)


def test_kv_quant_decode_logits_close_gqa():
    cfg, params = _tiny(seed=5, heads=4, kv=2)
    from test_train_step import _batch
    batch = _batch(np.random.RandomState(5), b=2, l=8)
    dense, tok_d = _decode_logits(cfg, params, batch, None)
    quant, tok_q = _decode_logits(cfg, params, batch, "int8")
    err = np.abs(quant - dense).max() / (np.abs(dense).max() + 1e-9)
    assert err < 0.05, err
    np.testing.assert_array_equal(tok_q, tok_d)


def test_kv_quant_generate_paths_agree():
    """generate_greedy and the chunked decoder share the int8-cache math
    bit-for-bit (same contract as the dense chunked-parity test)."""
    import dataclasses
    from law_of_vision_representation_in_mllms_tpu.models.decode import (
        ChunkedGreedyDecoder)
    from test_splice_llava import _tiny_batch, _tiny_llava
    cfg, params = _tiny_llava(1)
    cfg = dataclasses.replace(cfg, kv_quant="int8")
    batch = _tiny_batch(cfg, np.random.RandomState(1), b=2, l=6)
    want = np.asarray(M.generate_greedy(
        params, cfg, batch["input_ids"], batch["text_mask"],
        batch["pixel_values"], max_new_tokens=7, eos_id=0,
        precision=FP32_PRECISION))
    dec = ChunkedGreedyDecoder(params, cfg, eos_id=0,
                               precision=FP32_PRECISION, chunk=3)
    got = dec.generate(batch["input_ids"], batch["text_mask"],
                       batch["pixel_values"], max_new_tokens=7)
    np.testing.assert_array_equal(got, want)
