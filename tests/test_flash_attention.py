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
