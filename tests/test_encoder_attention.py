"""Fused encoder-attention kernel (ops/encoder_attention.py) parity tests.

Runs in interpreter mode on CPU (fp32 -> exact parity with the XLA path);
the compiled kernel is exercised on TPU by benchmarks/run_all.py. The
production ViT default remains XLA attention (see models/vit.py attn_impl
notes); the kernel stays available via attn_impl="encoder".
"""

import jax
import jax.numpy as jnp
import numpy as np

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.ops.attention import mha
from law_of_vision_representation_in_mllms_tpu.ops.encoder_attention import (
    encoder_mha)


def test_encoder_mha_matches_xla():
    rng = np.random.RandomState(0)
    for (b, s, h, d) in [(2, 77, 4, 16), (1, 577, 16, 64), (2, 196, 12, 64),
                         (1, 128, 8, 32)]:
        q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
        k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
        v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
        want = mha(q, k, v)
        got = encoder_mha(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)


def test_encoder_mha_padding_is_exact():
    """The padded-denominator correction must be exact: a sequence padded
    to the next 128 multiple scores identically to the unpadded math."""
    rng = np.random.RandomState(1)
    b, s, h, d = 2, 130, 8, 32          # pads 130 -> 256
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    got = encoder_mha(q, k, v, block_q=128)
    want = mha(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_vit_attn_impl_encoder():
    from law_of_vision_representation_in_mllms_tpu.models.vit import (
        ViTConfig, ViTTower)
    import dataclasses
    cfg = ViTConfig(image_size=28, patch_size=7, hidden_size=32,
                    num_layers=2, num_heads=4, intermediate_size=64)
    rng = np.random.RandomState(2)
    px = jnp.asarray(rng.randn(2, 28, 28, 3).astype(np.float32))
    t_xla = ViTTower(cfg, -2, "patch", FP32_PRECISION)
    params = t_xla.init(jax.random.PRNGKey(0), px)["params"]
    want = t_xla.apply({"params": params}, px)
    t_enc = ViTTower(dataclasses.replace(cfg, attn_impl="encoder"), -2,
                     "patch", FP32_PRECISION)
    got = t_enc.apply({"params": params}, px)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)
