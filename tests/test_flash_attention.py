"""Flash-attention kernel vs the reference mha, incl. padding and causal."""

import numpy as np
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.ops.attention import (
    mha, causal_mask)
from law_of_vision_representation_in_mllms_tpu.ops.flash_attention import (
    flash_mha)


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32))


def test_flash_matches_mha_noncausal():
    b, s, h, d = 2, 100, 4, 32          # deliberately non-multiple of 128
    q, k, v = (_rand((b, s, h, d), i) for i in range(3))
    ref = np.asarray(mha(q, k, v))
    got = np.asarray(flash_mha(q, k, v, block_q=128, block_k=128,
                               interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_flash_matches_mha_causal():
    b, s, h, d = 1, 130, 2, 16
    q, k, v = (_rand((b, s, h, d), 10 + i) for i in range(3))
    ref = np.asarray(mha(q, k, v, mask=causal_mask(s, s)[None, None]))
    got = np.asarray(flash_mha(q, k, v, causal=True, block_q=128,
                               block_k=128, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_flash_multi_block_k():
    b, s, h, d = 1, 300, 2, 32
    q, k, v = (_rand((b, s, h, d), 20 + i) for i in range(3))
    ref = np.asarray(mha(q, k, v))
    got = np.asarray(flash_mha(q, k, v, block_q=128, block_k=128,
                               interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_decoder_prefill_flash_matches_xla():
    """LLaMA prefill with the flash path == XLA path (right padding)."""
    import jax
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        FP32_PRECISION)
    from law_of_vision_representation_in_mllms_tpu.models import llama as L

    cfg = L.tiny(vocab_size=64, hidden_size=64, num_layers=2, num_heads=4,
                 num_kv_heads=2, max_seq_len=64)
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    ids = np.random.RandomState(0).randint(0, 64, size=(2, 12))
    embeds = L.embed_tokens(params, jnp.asarray(ids), FP32_PRECISION)
    pos = jnp.broadcast_to(jnp.arange(12)[None], (2, 12))
    mask = np.ones((2, 12), bool)
    mask[1, 9:] = False  # right padding

    h_ref, _ = L.forward(params, cfg, embeds, pos,
                         attn_mask=jnp.asarray(mask),
                         precision=FP32_PRECISION)
    h_flash, _ = L.forward(params, cfg, embeds, pos,
                           attn_mask=jnp.asarray(mask),
                           precision=FP32_PRECISION, use_flash=True)
    # valid positions agree (pad positions may differ and are masked out)
    np.testing.assert_allclose(np.asarray(h_flash)[mask],
                               np.asarray(h_ref)[mask], atol=2e-4,
                               rtol=1e-3)


def test_trainable_flash_grads_match_xla():
    """Custom-VJP flash gradients == autodiff through the XLA mha."""
    import jax
    from law_of_vision_representation_in_mllms_tpu.ops.flash_attention import (
        flash_mha_trainable)

    b, s, h, d = 1, 100, 2, 16
    q, k, v = (_rand((b, s, h, d), 40 + i) for i in range(3))
    tgt = _rand((b, s, h, d), 50)

    def loss_ref(q, k, v):
        return jnp.sum((mha(q, k, v, mask=causal_mask(s, s)[None, None])
                        - tgt) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum((flash_mha_trainable(q, k, v, causal=True,
                                            interpret=True) - tgt) ** 2)

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    got_grads = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for g_ref, g_got in zip(ref_grads, got_grads):
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   atol=2e-4, rtol=1e-3)


def test_trainable_flash_forward_matches():
    from law_of_vision_representation_in_mllms_tpu.ops.flash_attention import (
        flash_mha_trainable)
    b, s, h, d = 2, 70, 2, 8
    q, k, v = (_rand((b, s, h, d), 60 + i) for i in range(3))
    ref = np.asarray(mha(q, k, v))
    got = np.asarray(flash_mha_trainable(q, k, v, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_training_step_with_flash():
    """Full LLaVA train step with flash attention (interpret on CPU):
    loss/grads finite and close to the XLA-attention step."""
    import jax
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        FP32_PRECISION)
    from law_of_vision_representation_in_mllms_tpu.models import llava as M
    from law_of_vision_representation_in_mllms_tpu.models import llama as L
    from law_of_vision_representation_in_mllms_tpu.models.splice import (
        IGNORE_INDEX, IMAGE_TOKEN_INDEX)
    from law_of_vision_representation_in_mllms_tpu.models.towers import (
        parse_tower_spec)

    cfg = M.LlavaConfig(tower_spec=parse_tower_spec("debug/tiny-vit"),
                        decoder=L.tiny(vocab_size=64, hidden_size=32,
                                       num_layers=2, num_heads=4,
                                       num_kv_heads=2,
                                       intermediate_size=64))
    params = M.init_params(jax.random.PRNGKey(0), cfg, FP32_PRECISION)
    rng = np.random.RandomState(0)
    ids = rng.randint(1, 60, size=(2, 6)).astype(np.int32)
    ids[:, 0] = IMAGE_TOKEN_INDEX
    labels = ids.copy(); labels[:, :2] = IGNORE_INDEX
    batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
             "text_mask": jnp.ones((2, 6), bool),
             "pixel_values": [jnp.asarray(
                 rng.randn(2, 28, 28, 3).astype(np.float32))]}

    l_ref, g_ref = jax.value_and_grad(
        lambda p: M.loss_fn(p, cfg, batch, FP32_PRECISION))(params)
    l_fl, g_fl = jax.value_and_grad(
        lambda p: M.loss_fn(p, cfg, batch, FP32_PRECISION,
                            use_flash=True))(params)
    np.testing.assert_allclose(float(l_fl), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fl)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4,
                                   rtol=1e-3)


def test_flash_alibi_matches_biased_mha():
    """In-kernel ALiBi bias vs the unfused mha with the same additive
    bias (the reference Triton kernel's bias capability,
    `mpt/flash_attn_triton.py` — expressed as per-head slopes)."""
    from law_of_vision_representation_in_mllms_tpu.models.mpt import (
        alibi_bias, alibi_slopes)
    b, s, h, d = 2, 130, 4, 16
    q, k, v = (_rand((b, s, h, d), 30 + i) for i in range(3))
    slopes = alibi_slopes(h)
    bias = alibi_bias(h, s)[None]                      # [1,H,1,S]
    ref = np.asarray(mha(q, k, v, bias=bias,
                         mask=causal_mask(s, s)[None, None]))
    got = np.asarray(flash_mha(q, k, v, causal=True, alibi_slopes=slopes,
                               block_q=128, block_k=128, interpret=True))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_trainable_flash_alibi_grads_match_xla():
    import jax
    from law_of_vision_representation_in_mllms_tpu.models.mpt import (
        alibi_bias, alibi_slopes)
    from law_of_vision_representation_in_mllms_tpu.ops.flash_attention \
        import flash_mha_trainable
    b, s, h, d = 1, 96, 2, 16
    q, k, v = (_rand((b, s, h, d), 40 + i) for i in range(3))
    slopes = alibi_slopes(h)
    bias = alibi_bias(h, s)[None]

    def loss_ref(q, k, v):
        o = mha(q, k, v, bias=bias, mask=causal_mask(s, s)[None, None])
        return jnp.sum(o * o)

    def loss_flash(q, k, v):
        o = flash_mha_trainable(q, k, v, causal=True, alibi_slopes=slopes,
                                block_q=128, block_k=128, interpret=True)
        return jnp.sum(o * o)

    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=5e-5, rtol=1e-3)
