"""AnyRes multi-crop handling: resolution selection, grid shapes, unpad
masks, token assembly, and masked splice."""

import numpy as np
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.models.anyres import (
    select_best_resolution, get_anyres_image_grid_shape, unpad_valid_mask,
    assemble_anyres_tokens)
from law_of_vision_representation_in_mllms_tpu.models.splice import (
    splice_plan, IGNORE_INDEX, IMAGE_TOKEN_INDEX)


PINPOINTS = [(336, 672), (672, 336), (672, 672), (1008, 336), (336, 1008)]


def test_select_best_resolution():
    # tall image prefers the tall candidate
    assert select_best_resolution((300, 900), PINPOINTS) == (336, 1008)
    assert select_best_resolution((900, 300), PINPOINTS) == (1008, 336)
    assert select_best_resolution((600, 600), PINPOINTS) == (672, 672)


def test_grid_shape():
    assert get_anyres_image_grid_shape((900, 300), PINPOINTS, 336) == (3, 1)
    assert get_anyres_image_grid_shape((600, 600), PINPOINTS, 336) == (2, 2)


def test_unpad_valid_mask():
    # 2x2 crops of 4x4 features = 8x8 canvas; wide original -> rows masked
    m = unpad_valid_mask((2, 2), 4, original_size=(200, 100))
    assert m.shape == (8, 8)
    assert m[2:6].all() and not m[:2].any() and not m[6:].any()
    # tall original -> columns masked
    m2 = unpad_valid_mask((2, 2), 4, original_size=(100, 200))
    assert m2[:, 2:6].all() and not m2[:, :2].any()


def test_assemble_and_masked_splice():
    rng = np.random.RandomState(0)
    p, d, g = 4, 8, 2           # base 4 tokens, 2x2 feature grid per crop
    base = rng.randn(p, d).astype(np.float32)
    crops = rng.randn(4, p, d).astype(np.float32)     # 2x2 crops
    tokens, valid = assemble_anyres_tokens(base, crops, (2, 2), (200, 100),
                                           g)
    assert tokens.shape == (p + 16, d)
    assert valid[:p].all()
    assert valid.sum() < len(valid)                   # some tokens masked

    # masked splice: invalid image tokens never become valid positions
    ids = np.asarray([[5, IMAGE_TOKEN_INDEX, 7, 8]], np.int32)
    labels = np.full_like(ids, IGNORE_INDEX)
    mask = np.ones_like(ids, bool)
    iv = valid[None, :]
    plan = splice_plan(jnp.asarray(ids), jnp.asarray(labels),
                       jnp.asarray(mask), p + 16,
                       image_valid=jnp.asarray(iv))
    n_valid = int(np.asarray(plan.attn_mask).sum())
    assert n_valid == 3 + int(valid.sum())            # 3 text + valid image
