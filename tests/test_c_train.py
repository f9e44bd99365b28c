"""Supervised C-score training stack: aggregation net, losses, train step."""

import numpy as np
import jax
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.metrics.aggregation import (
    AggregationNetwork, DummyAggregation, soft_argmax_displacement)
from law_of_vision_representation_in_mllms_tpu.metrics.c_losses import (
    clip_loss, dense_epe_loss, self_contrastive_loss)
from law_of_vision_representation_in_mllms_tpu.train.c_score_train import (
    CTrainConfig, init_c_train, make_c_train_step)


def test_dummy_aggregation_identity():
    net = DummyAggregation()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 8),
                    jnp.float32)
    p = net.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(net.apply(p, x)), np.asarray(x))


def test_aggregation_network_shapes_and_mixing():
    dims = (8, 16)
    net = AggregationNetwork(feature_dims=dims, projection_dim=8,
                             num_norm_groups=4)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 6, 6, sum(dims)),
                    jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x)["params"]
    out = net.apply({"params": params}, x)
    assert out.shape == (2, 6, 6, 8)
    assert "logit_scale" in params and "mixing_weights" in params
    assert params["mixing_weights"].shape == (2,)


def test_displacement_is_flow_minus_grid():
    rng = np.random.RandomState(2)
    n = 6
    # identity similarity -> the mapping is (approximately) the grid itself,
    # so the displacement is ~0
    sim = np.eye(n * n, dtype=np.float32)
    disp = np.asarray(soft_argmax_displacement(jnp.asarray(sim), n))
    assert np.abs(disp).max() < 0.2


def test_clip_loss_prefers_matched():
    rng = np.random.RandomState(3)
    d = rng.randn(6, 8).astype(np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    matched = float(clip_loss(jnp.asarray(d), jnp.asarray(d),
                              jnp.asarray(np.log(1 / 0.07))))
    shuffled = float(clip_loss(jnp.asarray(d), jnp.asarray(d[::-1].copy()),
                               jnp.asarray(np.log(1 / 0.07))))
    assert matched < shuffled


def test_c_train_step_decreases_loss():
    dims = (8, 16)
    n = 4   # 4x4 patch grid
    net = AggregationNetwork(feature_dims=dims, projection_dim=8,
                             num_norm_groups=4)
    cfg = CTrainConfig(learning_rate=3e-3, total_steps=100, num_patches=n,
                       dense_obj=True)
    state, opt = init_c_train(net, cfg, jax.random.PRNGKey(0),
                              (n, n, sum(dims)))
    step = jax.jit(make_c_train_step(net, cfg, opt))

    rng = np.random.RandomState(4)
    b, k = 2, 5
    batch = {
        "feat1": jnp.asarray(rng.randn(b, n, n, sum(dims)), jnp.float32),
        "feat2": jnp.asarray(rng.randn(b, n, n, sum(dims)), jnp.float32),
        "kp_idx1": jnp.asarray(rng.randint(0, n * n, (b, k))),
        "kp_idx2": jnp.asarray(rng.randint(0, n * n, (b, k))),
        "kp_valid": jnp.ones((b, k), jnp.float32),
        "gt_flow": jnp.asarray(rng.randn(b, k, 2), jnp.float32),
    }
    losses = []
    for _ in range(10):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_self_contrastive_runs():
    x = jnp.asarray(np.random.RandomState(5).randn(1, 6, 6, 4), jnp.float32)
    val = float(self_contrastive_loss(x, jax.random.PRNGKey(0)))
    assert np.isfinite(val)


def test_c_train_runner_end_to_end(tmp_path):
    """Full supervised loop on a synthetic SPair tree + feature cache."""
    import os
    from tests.test_spair import _make_synthetic_spair
    from law_of_vision_representation_in_mllms_tpu.train.c_score_runner import (
        run_c_training)

    root = str(tmp_path / "SPair-71k")
    _make_synthetic_spair(root, n_pairs=3)
    feat_dir = str(tmp_path / "feats")
    os.makedirs(feat_dir)
    rng = np.random.RandomState(0)
    g, dims = 4, (8, 8)
    for p in range(3):
        for idx in (2 * p, 2 * p + 1):
            np.save(f"{feat_dir}/img{idx}.npy",
                    rng.randn(g * g, sum(dims)).astype(np.float32))
    res = run_c_training(root, feat_dir, feature_dims=dims, num_patches=g,
                         anno_size=64, categories=["cat"],
                         projection_dim=8, steps=10, batch_size=2,
                         out_dir=str(tmp_path / "out"))
    assert 0.0 <= res["best_pck"] <= 1.0
    assert os.path.exists(tmp_path / "out" / "best.npz")
    assert len(res["history"]) >= 1
