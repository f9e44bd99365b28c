"""A score: cross-modal alignment of a vision representation.

Reference semantics (`A_score/compute.py:1-86`): for each of 100 images, take
the post-projector embeddings (LLM space, [seq, 4096]) of the target
representation and of the two anchors (CLIP@336 and CLIP@224 stage-1 models);
L2-normalize rows (norm + 1e-10 in the denominator), compute the target x
anchor cosine-similarity matrix, take the max over anchor tokens, mean over
target tokens; average over images, then over the two anchors.

TPU-native design: the whole 100-image loop is one batched einsum under jit
(the reference loops image-by-image in torch on 1 GPU). Padding-safe masked
variants support ragged sequence lengths. The hot op (S_t x S_a cosine matrix
-> row max -> mean) is also available as a fused Pallas kernel
(`ops/a_score_pallas.py`) that never materializes the similarity matrix in
HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-10


def _normalize(x, eps: float = EPS):
    """Row L2-normalization with the reference's `norm + eps` convention
    (`A_score/compute.py:12-15`)."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / (n + eps)


def max_cos_similarity(target, anchor, *, target_mask=None, anchor_mask=None,
                       precision=jax.lax.Precision.HIGHEST):
    """mean_t max_a cos(target_t, anchor_a).

    Args:
      target: [..., St, D]
      anchor: [..., Sa, D]
      target_mask / anchor_mask: optional boolean [..., S] validity masks for
        padded batches.

    Returns: [...] scalar per batch element (fp32).
    """
    t = _normalize(target.astype(jnp.float32))
    a = _normalize(anchor.astype(jnp.float32))
    sim = jnp.einsum("...td,...ad->...ta", t, a, precision=precision)
    if anchor_mask is not None:
        sim = jnp.where(anchor_mask[..., None, :], sim, -jnp.inf)
    m = jnp.max(sim, axis=-1)
    if target_mask is not None:
        m = jnp.where(target_mask, m, 0.0)
        return jnp.sum(m, axis=-1) / jnp.maximum(
            jnp.sum(target_mask, axis=-1), 1)
    return jnp.mean(m, axis=-1)


@jax.jit
def a_score_pairwise(target, anchor):
    """Batched per-image max-cos: target [N, St, D], anchor [N, Sa, D] ->
    [N]. On TPU this dispatches to the fused Pallas kernel
    (`ops/a_score_pallas.py`) — measured 2.1x faster than the XLA path at
    the protocol shape (8.7 vs 18.7 ms, benchmarks/results.json round 2) —
    and falls back to the jnp path elsewhere (CPU tests assert parity
    between the two)."""
    if jax.default_backend() == "tpu":
        from ..ops.a_score_pallas import max_cos_pallas
        return max_cos_pallas(target, anchor)
    return max_cos_similarity(target, anchor)


def a_score(target, anchor336, anchor224, *, target_mask=None,
            anchor336_mask=None, anchor224_mask=None) -> jnp.ndarray:
    """The full A score: mean over images, then mean over the two anchors
    (`A_score/compute.py:75-81`).

    All inputs [N, S, D] (N=100 in the reference protocol). Returns a scalar.
    """
    s336 = max_cos_similarity(target, anchor336, target_mask=target_mask,
                              anchor_mask=anchor336_mask)
    s224 = max_cos_similarity(target, anchor224, target_mask=target_mask,
                              anchor_mask=anchor224_mask)
    return (jnp.mean(s336) + jnp.mean(s224)) / 2


def a_score_from_arrays(target_list, anchor336_list, anchor224_list) -> float:
    """Host convenience: lists of per-image [S_i, D] arrays with ragged S_i.

    Pads to the max length with masks; numerically identical to the
    reference's per-image loop.
    """
    import numpy as np

    def pad(stack):
        smax = max(x.shape[0] for x in stack)
        d = stack[0].shape[1]
        out = np.zeros((len(stack), smax, d), np.float32)
        mask = np.zeros((len(stack), smax), bool)
        for i, x in enumerate(stack):
            out[i, :x.shape[0]] = x
            mask[i, :x.shape[0]] = True
        return jnp.asarray(out), jnp.asarray(mask)

    t, tm = pad(target_list)
    a336, am336 = pad(anchor336_list)
    a224, am224 = pad(anchor224_list)
    return float(a_score(t, a336, a224, target_mask=tm,
                         anchor336_mask=am336, anchor224_mask=am224))


@jax.jit
def language_align_score(target, anchor224):
    """The `llava/eval/language_align.py:1-69` variant: max-cos alignment
    against the CLIP224 anchor only (used for clipdino reps). Returns the
    mean over images."""
    return jnp.mean(max_cos_similarity(target, anchor224))
