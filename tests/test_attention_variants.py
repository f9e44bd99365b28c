"""Parity tests for the round-3 XLA attention variants (ops/attention.py).

`mha_post` (normalize after P·V) and `mha_blocked` (K-blocked online
softmax) must match the reference `mha` path exactly in fp32 — both are
algebraic rewrites of the same softmax, not approximations. Perf
measurements of the variants live in benchmarks/README.md.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.ops.attention import (
    mha, mha_blocked, mha_post)


SHAPES = [(2, 77, 4, 16), (1, 577, 16, 64), (2, 130, 8, 32)]


def _qkv(rng, b, s, h, d):
    return (jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
            for _ in range(3))


def test_mha_post_matches_mha():
    rng = np.random.RandomState(0)
    for (b, s, h, d) in SHAPES:
        q, k, v = _qkv(rng, b, s, h, d)
        np.testing.assert_allclose(
            np.asarray(mha_post(q, k, v)), np.asarray(mha(q, k, v)),
            atol=2e-5, rtol=1e-4)


def test_mha_post_mask_bias():
    rng = np.random.RandomState(1)
    b, s, h, d = 2, 64, 4, 16
    q, k, v = _qkv(rng, b, s, h, d)
    bias = jnp.asarray(rng.randn(1, h, s, s).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, 1, s, s) > 0.3)
    want = mha(q, k, v, bias=bias, mask=mask)
    got = mha_post(q, k, v, bias=bias, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_mha_blocked_matches_mha():
    """Block sizes that tile evenly AND ones that force padding of the last
    KV block (577 -> 5x128=640) — the padded-column masking must be exact."""
    rng = np.random.RandomState(2)
    for (b, s, h, d) in SHAPES:
        q, k, v = _qkv(rng, b, s, h, d)
        want = mha(q, k, v)
        for block_k in (64, 128, 256):
            got = mha_blocked(q, k, v, block_k=block_k)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5, rtol=1e-4,
                                       err_msg=f"s={s} block_k={block_k}")


def test_mha_blocked_scan_matches_unrolled():
    rng = np.random.RandomState(3)
    b, s, h, d = 1, 200, 4, 32
    q, k, v = _qkv(rng, b, s, h, d)
    got_scan = mha_blocked(q, k, v, block_k=64, unroll=False)
    got_unr = mha_blocked(q, k, v, block_k=64, unroll=True)
    np.testing.assert_allclose(np.asarray(got_scan), np.asarray(got_unr),
                               atol=1e-6, rtol=1e-6)


def test_mha_blocked_cross_attention_shapes():
    rng = np.random.RandomState(4)
    b, sq, skv, h, d = 2, 50, 177, 4, 16
    q = jnp.asarray(rng.randn(b, sq, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, skv, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, skv, h, d).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(mha_blocked(q, k, v, block_k=64)),
        np.asarray(mha(q, k, v)), atol=2e-5, rtol=1e-4)


def test_vit_attn_impl_variants():
    from law_of_vision_representation_in_mllms_tpu.models.vit import (
        ViTConfig, ViTTower)
    cfg = ViTConfig(image_size=28, patch_size=7, hidden_size=32,
                    num_layers=2, num_heads=4, intermediate_size=64)
    rng = np.random.RandomState(5)
    px = jnp.asarray(rng.randn(2, 28, 28, 3).astype(np.float32))
    t_xla = ViTTower(cfg, -2, "patch", FP32_PRECISION)
    params = t_xla.init(jax.random.PRNGKey(0), px)["params"]
    want = t_xla.apply({"params": params}, px)
    for impl in ("xla_post", "xla_blocked", "xla_expclamp",
                 "xla_expclamp_fused"):
        t = ViTTower(dataclasses.replace(cfg, attn_impl=impl), -2,
                     "patch", FP32_PRECISION)
        got = t.apply({"params": params}, px)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5, rtol=1e-4, err_msg=impl)


def test_mha_post_grad_matches_mha():
    """mha_post must stay trainable (towers unfreeze in some ablations)."""
    rng = np.random.RandomState(6)
    b, s, h, d = 1, 33, 2, 8
    q, k, v = _qkv(rng, b, s, h, d)

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v) ** 2)

    g_ref = jax.grad(lambda *a: loss(mha, *a), argnums=(0, 1, 2))(q, k, v)
    g_post = jax.grad(lambda *a: loss(mha_post, *a), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_post):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=1e-4, rtol=1e-3)


def test_mha_expnomax_matches_mha():
    """No-max softmax is EXACT (to bf16-equivalent tolerance) whenever
    logits stay under the clamp — here fp32 random logits are ~N(0, 4)."""
    from law_of_vision_representation_in_mllms_tpu.ops.attention import (
        mha_expnomax)
    rng = np.random.RandomState(7)
    for (b, s, h, d) in SHAPES:
        q, k, v = _qkv(rng, b, s, h, d)
        np.testing.assert_allclose(
            np.asarray(mha_expnomax(q, k, v)), np.asarray(mha(q, k, v)),
            atol=2e-5, rtol=1e-4)


def test_mha_expnomax_clamp_and_underflow_guards():
    from law_of_vision_representation_in_mllms_tpu.ops.attention import (
        mha_expnomax)
    rng = np.random.RandomState(8)
    b, s, h, d = 1, 8, 1, 4
    q, k, v = _qkv(rng, b, s, h, d)
    # logits driven far above the clamp: output stays FINITE (saturates
    # toward uniform-over-clamped rather than inf/nan)
    big = mha_expnomax(q * 300.0, k * 300.0, v, clamp=85.0)
    assert np.isfinite(np.asarray(big)).all()
    # an all-underflow row (uniformly huge negative logits): zeros, not NaN
    qq = jnp.ones((b, s, h, d), jnp.float32) * 200.0
    kk = -jnp.ones((b, s, h, d), jnp.float32) * 200.0
    out = mha_expnomax(qq, kk, v)
    assert np.isfinite(np.asarray(out)).all()


def test_mha_expnomax_fused_matches_mha():
    """Denominator-in-the-dot variant (ones column on V): same math as
    mha_expnomax — exact vs `mha` under the clamp — plus the same
    clamp/underflow guards."""
    from law_of_vision_representation_in_mllms_tpu.ops.attention import (
        mha_expnomax_fused)
    rng = np.random.RandomState(9)
    for (b, s, h, d) in SHAPES:
        q, k, v = _qkv(rng, b, s, h, d)
        np.testing.assert_allclose(
            np.asarray(mha_expnomax_fused(q, k, v)),
            np.asarray(mha(q, k, v)), atol=2e-5, rtol=1e-4)
    b, s, h, d = 1, 8, 1, 4
    q, k, v = _qkv(rng, b, s, h, d)
    big = mha_expnomax_fused(q * 300.0, k * 300.0, v, clamp=85.0)
    assert np.isfinite(np.asarray(big)).all()
    qq = jnp.ones((b, s, h, d), jnp.float32) * 200.0
    kk = -jnp.ones((b, s, h, d), jnp.float32) * 200.0
    out = mha_expnomax_fused(qq, kk, v)
    assert np.isfinite(np.asarray(out)).all()


def test_vit_tower_attn_impl_plumbing():
    """model.tower_attn_impl reaches the ViT config through build_model."""
    from law_of_vision_representation_in_mllms_tpu.core.config import (
        RunConfig)
    from law_of_vision_representation_in_mllms_tpu.train.runner import (
        build_model)
    cfg = RunConfig.from_dict({
        "model": {"vision_tower": "debug/tiny-vit", "decoder": "tiny",
                  "tower_attn_impl": "xla_expclamp"},
        "train": {"bf16": False}})
    model_cfg, _params = build_model(cfg)
    assert model_cfg.tower_spec.entries[0].vit_config.attn_impl == \
        "xla_expclamp"


def test_diffusion_attn_impl_config_plumbing_and_parity():
    """model.diffusion_attn_impl selects the no-max softmax inside the
    diffusion blocks (diffusion_blocks.set_attn_impl) and the fast path
    matches the exact path on a tiny UNet forward."""
    from law_of_vision_representation_in_mllms_tpu.core.config import (
        RunConfig)
    from law_of_vision_representation_in_mllms_tpu.models import (
        diffusion_blocks as DB)
    from law_of_vision_representation_in_mllms_tpu.train.runner import (
        build_model)

    q = jnp.asarray(np.random.RandomState(0).randn(2, 16, 2, 8), jnp.float32)
    k = jnp.asarray(np.random.RandomState(1).randn(2, 16, 2, 8), jnp.float32)
    v = jnp.asarray(np.random.RandomState(2).randn(2, 16, 2, 8), jnp.float32)
    try:
        DB.set_attn_impl(None)
        exact = np.asarray(DB._attn(q, k, v, jnp.float32))
        cfg = RunConfig.from_dict({
            "model": {"vision_tower": "debug/tiny-vit", "decoder": "tiny",
                      "diffusion_attn_impl": "xla_expclamp_fused"},
            "train": {"bf16": False}})
        build_model(cfg)   # plumbing: build_model must install the impl
        assert DB._ATTN_IMPL_OVERRIDE == "xla_expclamp_fused"
        fast = np.asarray(DB._attn(q, k, v, jnp.float32))
    finally:
        DB.set_attn_impl(None)
    np.testing.assert_allclose(fast, exact, atol=2e-5, rtol=1e-4)


def test_diffusion_attn_flash_and_auto_parity(monkeypatch):
    """"flash" routes every diffusion attention through the Pallas flash
    kernel; "auto" picks flash at/above _AUTO_FLASH_MIN_SEQ (SD1.5@768's
    seq-9216 self-attentions) and the fused no-max softmax below. Both
    must match the exact softmax (cross-attention shapes included —
    UNet kv is the 77-token prompt)."""
    from law_of_vision_representation_in_mllms_tpu.models import (
        diffusion_blocks as DB)

    rng = np.random.RandomState(3)
    cases = [
        ("self", (2, 160, 2, 8), (2, 160, 2, 8)),
        ("cross", (2, 160, 2, 8), (2, 13, 2, 8)),
    ]
    for _, qs, ks in cases:
        q = jnp.asarray(rng.randn(*qs), jnp.float32)
        k = jnp.asarray(rng.randn(*ks), jnp.float32)
        v = jnp.asarray(rng.randn(*ks), jnp.float32)
        try:
            DB.set_attn_impl(None)
            exact = np.asarray(DB._attn(q, k, v, jnp.float32))
            DB.set_attn_impl("flash")
            flash = np.asarray(DB._attn(q, k, v, jnp.float32))
            # auto, short branch (seq < threshold -> fused no-max)
            DB.set_attn_impl("auto")
            auto_short = np.asarray(DB._attn(q, k, v, jnp.float32))
            # auto, long branch (force the flash side of the split)
            monkeypatch.setattr(DB, "_AUTO_FLASH_MIN_SEQ", 64)
            auto_long = np.asarray(DB._attn(q, k, v, jnp.float32))
            monkeypatch.setattr(DB, "_AUTO_FLASH_MIN_SEQ", 4096)
        finally:
            DB.set_attn_impl(None)
        np.testing.assert_allclose(flash, exact, atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(auto_short, exact, atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(auto_long, flash, atol=1e-6)
