"""Ring attention over an 8-device mesh vs single-device attention."""

import numpy as np
import jax
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.ops.attention import (
    mha, causal_mask)
from law_of_vision_representation_in_mllms_tpu.ops.ring_attention import (
    make_ring_attention)
from law_of_vision_representation_in_mllms_tpu.parallel import make_mesh


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32))


def test_ring_attention_matches_full():
    mesh = make_mesh(n_data=8, n_model=1)
    b, s, h, d = 2, 64, 4, 16          # 8 tokens per device
    q, k, v = (_rand((b, s, h, d), i) for i in range(3))
    ref = np.asarray(mha(q, k, v))
    ring = make_ring_attention(mesh, causal=False)
    got = np.asarray(jax.jit(ring)(q, k, v))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_ring_attention_3axis_mesh():
    """Ring axis embedded in a (data, seq, model) mesh: batch shards over
    ``data``, sequence rotates over ``seq``, ``model`` axis left free —
    the context-parallel layout for long-context decoding."""
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(n_data=2, n_seq=2, n_model=2)
    assert mesh.axis_names == ("data", "seq", "model")
    b, s, h, d = 2, 32, 4, 16          # 16 tokens per seq shard
    q, k, v = (_rand((b, s, h, d), 20 + i) for i in range(3))
    ref = np.asarray(mha(q, k, v, mask=causal_mask(s, s)[None, None]))
    ring = make_ring_attention(mesh, axis_name="seq", causal=True,
                               spec=P("data", "seq", None, None))
    got = np.asarray(jax.jit(ring)(q, k, v))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_ring_attention_causal():
    mesh = make_mesh(n_data=8, n_model=1)
    b, s, h, d = 1, 40, 2, 8
    q, k, v = (_rand((b, s, h, d), 10 + i) for i in range(3))
    ref = np.asarray(mha(q, k, v, mask=causal_mask(s, s)[None, None]))
    ring = make_ring_attention(mesh, causal=True)
    got = np.asarray(jax.jit(ring)(q, k, v))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)
