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
