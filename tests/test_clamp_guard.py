"""Runtime clamp guard for the fused no-max softmax (ops/clamp_guard.py,
VERDICT r3 #5): the `xla_expclamp*` production defaults are exact only
while attention logits stay under the clamp; the guard validates that
on the first batch of any real checkpoint and fails loudly otherwise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models.vit import (
    ViTConfig, ViTTower)
from law_of_vision_representation_in_mllms_tpu.ops import attention as A
from law_of_vision_representation_in_mllms_tpu.ops import clamp_guard as G


def test_capture_collects_expclamp_maxes():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 4, 2, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 4, 2, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 4, 2, 8).astype(np.float32))

    def fn(q, k, v):
        A.mha_expnomax(q, k, v)
        A.mha_expnomax_fused(q * 2, k * 2, v)
        return jnp.float32(0)

    m = G.max_expclamp_logit(fn, q, k, v)
    scale = 8 ** -0.5
    logits = np.einsum("bqhd,bkhd->bhqk", np.asarray(q),
                       np.asarray(k)) * scale
    expect = max(logits.max(), (logits * 4).max())
    np.testing.assert_allclose(m, expect, rtol=1e-5)
    # no expclamp call traced -> -inf (guard treats it as inactive)
    assert G.max_expclamp_logit(lambda q, k, v: A.mha(q, k, v),
                                q, k, v) == float("-inf")


def test_guard_passes_normal_and_raises_hot_checkpoint():
    cfg = ViTConfig(image_size=14, patch_size=7, hidden_size=16,
                    num_layers=2, num_heads=2, intermediate_size=32,
                    attn_impl="xla_expclamp_fused")
    tower = ViTTower(cfg, select_layer=-2, select_feature="patch",
                     precision=FP32_PRECISION)
    px = jnp.asarray(np.random.RandomState(1)
                     .randn(2, 14, 14, 3).astype(np.float32))
    params = tower.init(jax.random.PRNGKey(0), px)

    m = G.check_clamp_headroom(
        lambda p: tower.apply(params, p), px, label="tiny tower")
    assert np.isfinite(m) and m < 75.0

    # a "hot" checkpoint: blow up the q projection so logits exceed the
    # clamp headroom — the guard must refuse the fused path
    hot = jax.tree.map(lambda x: x, params)
    blk = hot["params"]["encoder"]["block_0"]
    blk["q"]["kernel"] = blk["q"]["kernel"] * 3000.0
    with pytest.raises(G.ClampGuardError):
        G.check_clamp_headroom(lambda p: tower.apply(hot, p), px,
                               label="hot tower")


def test_adapter_first_batch_guard(monkeypatch):
    """LlavaLMM runs the guard once on its first encoded batch when a
    tower ships an expclamp impl, and raises for a hot checkpoint."""
    from law_of_vision_representation_in_mllms_tpu.data import (
        SimpleTokenizer, get_template)
    from law_of_vision_representation_in_mllms_tpu.eval.api import Instance
    from law_of_vision_representation_in_mllms_tpu.eval.llava_adapter \
        import LlavaLMM
    from law_of_vision_representation_in_mllms_tpu.models import llama as L
    from law_of_vision_representation_in_mllms_tpu.models import llava as M
    from law_of_vision_representation_in_mllms_tpu.models.towers import (
        TowerSpec, TowerEntry)
    from PIL import Image

    vit_cfg = ViTConfig(image_size=224, patch_size=32, hidden_size=16,
                        num_layers=2, num_heads=2, intermediate_size=32,
                        attn_impl="xla_expclamp_fused")
    entry = TowerEntry(name="openai/clip-vit-large-patch14", kind="vit",
                       vit_config=vit_cfg, vit_family="clip",
                       hidden_size=16, num_patches=vit_cfg.num_patches)
    cfg = M.LlavaConfig(
        tower_spec=TowerSpec(entries=[entry], join="single"),
        decoder=L.tiny(vocab_size=100, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=4, intermediate_size=64))
    params = M.init_params(jax.random.PRNGKey(0), cfg, FP32_PRECISION)
    lmm = LlavaLMM(params, cfg, SimpleTokenizer(), get_template("v1"),
                   precision=FP32_PRECISION, batch_size=1)
    img = Image.new("RGB", (16, 16), (10, 20, 30))
    req = [Instance("generate_until", {}, 0, "t",
                    ("hi", {"max_new_tokens": 4}), visual=[img])]
    out = lmm.generate_until(req)
    assert lmm._clamp_checked and len(out) == 1

    # hot checkpoint -> first batch raises
    hot = jax.tree.map(lambda x: x, params)
    blk = hot["towers"][0]["encoder"]["block_0"]
    blk["q"]["kernel"] = blk["q"]["kernel"] * 5000.0
    lmm2 = LlavaLMM(hot, cfg, SimpleTokenizer(), get_template("v1"),
                    precision=FP32_PRECISION, batch_size=1)
    with pytest.raises(G.ClampGuardError):
        lmm2.generate_until(req)

    # LVR_CLAMP_GUARD=0 bypasses
    monkeypatch.setenv("LVR_CLAMP_GUARD", "0")
    lmm3 = LlavaLMM(hot, cfg, SimpleTokenizer(), get_template("v1"),
                    precision=FP32_PRECISION, batch_size=1)
    assert len(lmm3.generate_until(req)) == 1


def test_guard_skipped_for_exact_softmax():
    """No expclamp impl configured -> zero extra work (no compile)."""
    from law_of_vision_representation_in_mllms_tpu.pipeline.features import (
        make_vit_extractor)
    cfg = ViTConfig(image_size=14, patch_size=7, hidden_size=16,
                    num_layers=1, num_heads=2, intermediate_size=32)
    tower = ViTTower(cfg, -2, "patch", FP32_PRECISION)
    px = jnp.zeros((1, 14, 14, 3))
    params = tower.init(jax.random.PRNGKey(0), px)["params"]
    fn = make_vit_extractor(cfg, params, precision=FP32_PRECISION)
    # plain jitted fn, not the guarded wrapper
    assert fn.__name__ != "guarded"
