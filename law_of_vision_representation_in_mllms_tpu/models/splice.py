"""Static-shape image-token splice.

The reference rebuilds each batch with Python loops and variable shapes
(`llava/model/llava_arch.py:293-478`): it finds IMAGE_TOKEN_INDEX (-200) in
each sample, splits the text around it, inserts the projected patch
embeddings, re-pads and truncates. That's host logic that XLA can't compile.

Here the splice is a single fixed-shape gather + select:

  out_len = text_len + num_patches - 1   (one image token per sample)

For output position j with image position p (per sample):
  j <  p              -> text token j
  p <= j < p+P        -> image patch j-p
  j >= p+P            -> text token j-P+1

Labels over the image span become IGNORE_INDEX (-100); text-only samples
(p == text_len, i.e. "no image") keep their text and mask the trailing pad.
Everything is `vmap`-able and jit-stable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

IGNORE_INDEX = -100
IMAGE_TOKEN_INDEX = -200


class Spliced(NamedTuple):
    positions_map: jnp.ndarray   # [B, L_out] gather index into text, or -1
    is_image: jnp.ndarray        # [B, L_out] bool
    image_index: jnp.ndarray     # [B, L_out] index into patches (clamped)
    attn_mask: jnp.ndarray       # [B, L_out] bool validity
    labels: jnp.ndarray          # [B, L_out] int32
    positions: jnp.ndarray       # [B, L_out] int32 RoPE positions


def find_image_positions(input_ids):
    """Index of the first IMAGE_TOKEN_INDEX per row; rows without an image
    token get text_len (splice becomes a no-op append of masked patches)."""
    is_img = input_ids == IMAGE_TOKEN_INDEX
    any_img = jnp.any(is_img, axis=1)
    first = jnp.argmax(is_img, axis=1)
    return jnp.where(any_img, first, input_ids.shape[1]), any_img


def splice_plan(input_ids, labels, text_mask, num_patches: int,
                image_valid=None) -> Spliced:
    """Compute the gather/select plan.

    Args:
      input_ids: [B, L] with -200 at the (single) image slot.
      labels: [B, L] with IGNORE_INDEX for non-target tokens.
      text_mask: [B, L] bool — True for real (non-pad) text tokens.
      num_patches: P, static.
      image_valid: optional [B, P] bool — validity of each image token
        (anyres unpad masking, models/anyres.py); default all-valid.

    Returns Spliced with arrays of length L_out = L + P - 1.
    """
    b, l = input_ids.shape
    p = num_patches
    l_out = l + p - 1

    img_pos, has_img = find_image_positions(input_ids)    # [B]
    img_pos = img_pos[:, None]                            # [B,1]
    has_img = has_img[:, None]

    j = jnp.arange(l_out)[None, :]                        # [1,L_out]
    before = j < img_pos
    in_img = (j >= img_pos) & (j < img_pos + p) & has_img
    text_idx = jnp.where(before, j, j - p + 1)
    text_idx = jnp.clip(text_idx, 0, l - 1)

    # valid output positions: text tokens that exist, or image patches
    text_valid = jnp.take_along_axis(text_mask, text_idx, axis=1)
    # text-only rows would re-gather text in the tail region [L, L+P-1);
    # those slots are pad, not duplicates
    dup_tail = (~has_img) & (j >= l)
    img_idx = jnp.clip(j - img_pos, 0, p - 1)
    if image_valid is not None:
        img_ok = jnp.take_along_axis(image_valid, img_idx, axis=1)
    else:
        img_ok = jnp.ones_like(in_img)
    out_valid = jnp.where(in_img, img_ok, text_valid & ~dup_tail)
    # the -200 slot itself always falls in in_img, never in the text gather

    lbl = jnp.take_along_axis(labels, text_idx, axis=1)
    lbl = jnp.where(in_img | ~out_valid, IGNORE_INDEX, lbl)

    positions = jnp.cumsum(out_valid.astype(jnp.int32), axis=1) - 1
    positions = jnp.maximum(positions, 0)

    return Spliced(positions_map=text_idx, is_image=in_img,
                   image_index=img_idx,
                   attn_mask=out_valid, labels=lbl, positions=positions)


def splice_embeds(plan: Spliced, text_embeds, image_feats):
    """Assemble output embeddings.

    text_embeds: [B, L, D] (image slot embedding is garbage, overwritten);
    image_feats: [B, P, D] projected patches.
    Returns [B, L_out, D].
    """
    gathered_text = jnp.take_along_axis(
        text_embeds, plan.positions_map[..., None], axis=1)
    gathered_img = jnp.take_along_axis(
        image_feats, plan.image_index[..., None], axis=1)
    return jnp.where(plan.is_image[..., None], gathered_img, gathered_text)
