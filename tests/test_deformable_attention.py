"""MSDeformAttn vs a numpy transliteration of the reference's pytorch
fallback (`ms_deform_attn_core_pytorch` semantics: grid_sample bilinear,
zero padding, align_corners=False)."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.ops.deformable_attention import (
    ms_deform_attn, bilinear_sample)


def _torch_oracle(value, shapes, locs, weights):
    """Mask2Former's pytorch fallback, transliterated."""
    b, _, m, cv = value.shape
    _, q, _, nl, p, _ = locs.shape
    value_list = value.split([h * w for h, w in shapes], dim=1)
    out = torch.zeros(b, q, m, cv)
    for li, (h, w) in enumerate(shapes):
        v = value_list[li].reshape(b, h, w, m, cv).permute(0, 3, 4, 1, 2)
        v = v.reshape(b * m, cv, h, w)
        grid = 2 * locs[:, :, :, li] - 1                 # [B,Q,M,P,2]
        grid = grid.permute(0, 2, 1, 3, 4).reshape(b * m, q, p, 2)
        sampled = F.grid_sample(v, grid, mode="bilinear",
                                padding_mode="zeros", align_corners=False)
        sampled = sampled.reshape(b, m, cv, q, p)
        wgt = weights[:, :, :, li].permute(0, 2, 1, 3)    # [B,M,Q,P]
        out += (sampled * wgt[:, :, None]).sum(-1).permute(0, 3, 1, 2)
    return out.reshape(b, q, m * cv)


def test_bilinear_sample_matches_grid_sample():
    rng = np.random.RandomState(0)
    h, w, c = 5, 7, 3
    val = rng.randn(h, w, c).astype(np.float32)
    xs = rng.rand(11).astype(np.float32) * (w + 2) - 1   # incl. out-of-range
    ys = rng.rand(11).astype(np.float32) * (h + 2) - 1
    got = np.asarray(bilinear_sample(jnp.asarray(val), jnp.asarray(xs),
                                     jnp.asarray(ys)))
    v = torch.from_numpy(val).permute(2, 0, 1)[None]
    gx = 2 * torch.from_numpy(xs) / w - 1
    gy = 2 * torch.from_numpy(ys) / h - 1
    grid = torch.stack([gx, gy], -1)[None, None]          # [1,1,11,2]
    ref = F.grid_sample(v, grid, mode="bilinear", padding_mode="zeros",
                        align_corners=False)[0, :, 0].T.numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_ms_deform_attn_matches_torch():
    rng = np.random.RandomState(1)
    b, m, cv, q, p = 2, 2, 4, 6, 3
    shapes = [(4, 6), (2, 3)]
    total = sum(h * w for h, w in shapes)
    value = rng.randn(b, total, m, cv).astype(np.float32)
    locs = rng.rand(b, q, m, len(shapes), p, 2).astype(np.float32)
    wraw = rng.rand(b, q, m, len(shapes), p).astype(np.float32)
    w = wraw / wraw.sum(axis=(-2, -1), keepdims=True)

    got = np.asarray(ms_deform_attn(jnp.asarray(value), shapes,
                                    jnp.asarray(locs), jnp.asarray(w)))
    ref = _torch_oracle(torch.from_numpy(value), shapes,
                        torch.from_numpy(locs), torch.from_numpy(w)).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)
