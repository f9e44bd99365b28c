"""C-score parity tests: jnp implementation vs a torch transliteration of the
reference math (`C_score/utils/utils_correspondence.py`, `pck_train.py`)."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.metrics import c_score as C


# ---- torch oracle (reference semantics) -----------------------------------

def _oracle_soft_argmax(corr, beta=0.02):
    b, htwt, h, w = corr.size()
    ht = wt = int(np.sqrt(htwt))
    x_normal = torch.tensor(np.linspace(-1, 1, w)).float()
    y_normal = torch.tensor(np.linspace(-1, 1, h)).float()
    corr = torch.exp(corr / beta) / torch.exp(corr / beta).sum(
        dim=1, keepdim=True)
    corr = corr.view(-1, ht, wt, h, w)
    grid_x = corr.sum(dim=1)
    grid_x = (grid_x * x_normal.view(b, w, 1, 1)).sum(dim=1, keepdim=True)
    grid_y = corr.sum(dim=2)
    grid_y = (grid_y * y_normal.view(b, h, 1, 1)).sum(dim=1, keepdim=True)
    return grid_x, grid_y


def _oracle_get_flow(corr, flow_window, num_patches):
    hsws, htwt = corr.size()
    hs = ws = ht = wt = num_patches
    if flow_window > 0:
        max_index_flatten = torch.argmax(corr, dim=-1)
        max_index_x = max_index_flatten % num_patches
        max_index_y = max_index_flatten // num_patches
        corr = corr.view(-1, num_patches, num_patches)
        offset_range = torch.arange(-flow_window, flow_window + 1)
        oy, ox = torch.meshgrid(offset_range, offset_range, indexing="ij")
        ox, oy = ox.flatten(), oy.flatten()
        wx = (max_index_x[:, None] + ox[None]).clamp(0, num_patches - 1)
        wy = (max_index_y[:, None] + oy[None]).clamp(0, num_patches - 1)
        bi = torch.arange(corr.shape[0])[:, None]
        mask = torch.zeros_like(corr)
        mask[bi, wy, wx] = 1
        corr = corr * mask
    x = corr.reshape(-1, ht, wt, hsws)
    gx, gy = _oracle_soft_argmax(x.permute(0, 3, 1, 2))
    m = torch.cat((gx, gy), dim=1)
    flow = torch.zeros_like(m)
    flow[:, 0] = (m[:, 0] + 1) * (wt - 1) / 2.0
    flow[:, 1] = (m[:, 1] + 1) * (ht - 1) / 2.0
    return flow.permute(0, 2, 3, 1)


def _oracle_transfer(sim, kps, num_patches, anno_size, window=5):
    sim_t = torch.from_numpy(np.asarray(sim))
    idx = (num_patches / anno_size * kps[:, 1]).astype(np.int32) * \
        num_patches + (num_patches / anno_size * kps[:, 0]).astype(np.int32)
    anno_stride = anno_size / num_patches
    flow = _oracle_get_flow(sim_t, window, num_patches).reshape(-1, 2)
    fk = flow[idx]
    nx = fk[:, 0].clamp(0, num_patches - 1)
    ny = fk[:, 1].clamp(0, num_patches - 1)
    x = nx * anno_stride + anno_stride // 2
    y = ny * anno_stride + anno_stride // 2
    return torch.stack([x, y]).permute(1, 0).numpy()


# ---- tests -----------------------------------------------------------------

def test_flow_matches_oracle():
    rng = np.random.RandomState(0)
    n = 8
    sim = rng.rand(n * n, n * n).astype(np.float32) * 2 - 1
    got = np.asarray(C.soft_argmax_flow(jnp.asarray(sim), n, window=2))
    ref = _oracle_get_flow(torch.from_numpy(sim), 2, n).numpy()[0]
    ref = ref.reshape(-1, 2)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_flow_gaussian_and_plain():
    rng = np.random.RandomState(1)
    n = 6
    sim = rng.rand(n * n, n * n).astype(np.float32)
    # plain soft-argmax (window 0)
    got = np.asarray(C.soft_argmax_flow(jnp.asarray(sim), n, window=0))
    ref = _oracle_get_flow(torch.from_numpy(sim), 0, n).numpy().reshape(-1, 2)
    np.testing.assert_allclose(got, ref, atol=2e-4)
    # gaussian variant at least runs and stays in range
    g = np.asarray(C.soft_argmax_flow(jnp.asarray(sim), n, window=-3))
    assert g.min() >= 0 and g.max() <= n - 1


def test_transfer_keypoints_matches_oracle():
    rng = np.random.RandomState(2)
    n, anno = 8, 64
    sim = (rng.rand(n * n, n * n).astype(np.float32) * 2 - 1)
    kps = rng.rand(5, 2).astype(np.float32) * (anno - 1)
    got = np.asarray(C.transfer_keypoints(jnp.asarray(sim),
                                          jnp.asarray(kps), n, anno))
    ref = _oracle_transfer(sim, kps, n, anno)
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_pck_batch_end_to_end():
    """Identical images must transfer keypoints onto themselves
    (PCK@0.10 == 1 with a generous threshold)."""
    rng = np.random.RandomState(3)
    b, p, c, n, anno, k = 3, 64, 16, 8, 64, 6
    desc = rng.randn(b, p, c).astype(np.float32)
    kps = (rng.rand(b, k, 2) * (anno - 1)).astype(np.float32)
    vis = np.ones((b, k), bool)
    vis[0, -2:] = False
    thr = np.full((b,), anno, np.float32)

    (res, pred) = C.compute_pck_batch(
        jnp.asarray(desc), jnp.asarray(desc), jnp.asarray(kps),
        jnp.asarray(kps), jnp.asarray(vis), jnp.asarray(thr),
        num_patches=n, anno_size=anno)
    # self-similarity: predicted patch == own patch center; err <= stride
    assert float(res.per_kpt[0]) == 1.0          # alpha=0.10 * 64 = 6.4 > err
    assert float(res.per_img[0]) == 1.0
    assert int(res.n_kpts) == int(vis.sum())


def test_two_feature_concat():
    rng = np.random.RandomState(4)
    a = rng.randn(2, 10, 4).astype(np.float32)
    b = rng.randn(2, 10, 6).astype(np.float32)
    cat = np.asarray(C.concat_two_features(jnp.asarray(a), jnp.asarray(b)))
    assert cat.shape == (2, 10, 10)
    na = a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
    np.testing.assert_allclose(cat[..., :4], na, atol=1e-6)


def test_flip_eval_primitives():
    from law_of_vision_representation_in_mllms_tpu.metrics.flip_eval import (
        permute_indices, flip_keypoints, mutual_nn_distance,
        select_flip_predictions)

    # docstring examples from the reference
    assert permute_indices([1, 2, [0, 3]],
                           [True, True, True, False]) == [0, 1, 2, 3]
    assert permute_indices([1, 2, [0, 3]], None) == [3, 1, 2, 0]

    kps = np.asarray([[10.0, 5.0, 1.0], [30.0, 7.0, 1.0]])
    flipped = flip_keypoints(kps, 64, [1, 0])
    np.testing.assert_allclose(flipped[0], [34.0, 7.0, 1.0])
    np.testing.assert_allclose(flipped[1], [54.0, 5.0, 1.0])

    rng = np.random.RandomState(0)
    d = rng.randn(16, 8).astype(np.float32)
    # identical sets: mutual-NN distance ~0 (fp32 cancellation noise only)
    assert float(mutual_nn_distance(jnp.asarray(d), jnp.asarray(d))) < 1e-2
    other = rng.randn(16, 8).astype(np.float32)
    assert float(mutual_nn_distance(jnp.asarray(d),
                                    jnp.asarray(other))) > 0.1

    pred = np.zeros((2, 2))
    pred_flip = np.ones((2, 2))
    kps1 = np.asarray([[10.0, 5.0, 1.0], [30.0, 7.0, 1.0]])
    kps2 = kps1.copy()
    vis = np.asarray([True, True])
    # mirror closer -> flipped predictions win for flip-visible kps
    out = select_flip_predictions(pred, pred_flip, kps1, kps2, 0.1, 0.5,
                                  vis, [[0, 1]], 64)
    np.testing.assert_allclose(out, pred_flip)
    # original closer -> unchanged
    out2 = select_flip_predictions(pred, pred_flip, kps1, kps2, 0.5, 0.1,
                                   vis, [[0, 1]], 64)
    np.testing.assert_allclose(out2, pred)


def test_resize_feature_grid():
    rng = np.random.RandomState(5)
    tokens = jnp.asarray(rng.randn(2, 16, 3).astype(np.float32))  # 4x4
    out = C.resize_feature_grid(tokens, 8)
    assert out.shape == (2, 64, 3)
    # constant maps stay constant under bilinear resampling
    const = jnp.ones((1, 16, 3))
    np.testing.assert_allclose(np.asarray(C.resize_feature_grid(const, 6)),
                               1.0, atol=1e-6)
