"""A-score parity tests: jnp path vs a numpy oracle written to the reference
semantics (`A_score/compute.py`), and the Pallas kernel vs the jnp path."""

import numpy as np
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.metrics.a_score import (
    a_score, a_score_from_arrays, a_score_pairwise)
from law_of_vision_representation_in_mllms_tpu.ops.a_score_pallas import (
    max_cos_pallas)


def _oracle_max_cos(target, anchor, eps=1e-10):
    """Straight transliteration of the reference math in numpy."""
    t = target / (np.linalg.norm(target, axis=-1, keepdims=True) + eps)
    a = anchor / (np.linalg.norm(anchor, axis=-1, keepdims=True) + eps)
    sim = t @ a.T
    return sim.max(axis=1).mean()


def test_a_score_matches_oracle():
    rng = np.random.RandomState(0)
    n, st, sa, d = 7, 20, 24, 16
    target = rng.randn(n, st, d).astype(np.float32)
    a336 = rng.randn(n, sa, d).astype(np.float32)
    a224 = rng.randn(n, sa, d).astype(np.float32)

    per_img_336 = np.array([_oracle_max_cos(target[i], a336[i])
                            for i in range(n)])
    per_img_224 = np.array([_oracle_max_cos(target[i], a224[i])
                            for i in range(n)])
    expect = (per_img_336.mean() + per_img_224.mean()) / 2

    got = float(a_score(jnp.asarray(target), jnp.asarray(a336),
                        jnp.asarray(a224)))
    np.testing.assert_allclose(got, expect, atol=1e-6)

    got_pair = np.asarray(a_score_pairwise(jnp.asarray(target),
                                           jnp.asarray(a336)))
    np.testing.assert_allclose(got_pair, per_img_336, atol=1e-6)


def test_a_score_ragged_lists():
    rng = np.random.RandomState(1)
    target = [rng.randn(10 + i, 8).astype(np.float32) for i in range(5)]
    a336 = [rng.randn(12 + i, 8).astype(np.float32) for i in range(5)]
    a224 = [rng.randn(9 + i, 8).astype(np.float32) for i in range(5)]

    s336 = np.mean([_oracle_max_cos(t, a) for t, a in zip(target, a336)])
    s224 = np.mean([_oracle_max_cos(t, a) for t, a in zip(target, a224)])
    expect = (s336 + s224) / 2

    got = a_score_from_arrays(target, a336, a224)
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_pallas_kernel_matches_jnp():
    rng = np.random.RandomState(2)
    n, st, sa, d = 3, 16, 24, 64
    target = rng.randn(n, st, d).astype(np.float32)
    anchor = rng.randn(n, sa, d).astype(np.float32)

    expect = np.array([_oracle_max_cos(target[i], anchor[i])
                       for i in range(n)])
    got = np.asarray(max_cos_pallas(jnp.asarray(target), jnp.asarray(anchor),
                                    block_d=32, interpret=True))
    np.testing.assert_allclose(got, expect, atol=1e-6)
