"""Switch variant and perceiver projector tests."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models.switch import (
    init_switch, apply_switch, switch_loss_fn, switch_freeze_labels)
from law_of_vision_representation_in_mllms_tpu.models.perceiver import (
    init_perceiver_projector, apply_perceiver_projector)


def test_switch_math_and_freeze():
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.randn(2, 5, 8).astype(np.float32))
    sp = init_switch(jax.random.PRNGKey(0), 8)
    out = apply_switch(sp, h, sigma=0.5)
    expect = np.asarray(h) + 0.5 * (np.asarray(h) @ np.asarray(sp["w"]))
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)

    params = {"switch": sp, "decoder": {"x": jnp.zeros(3)},
              "towers": [], "projector": {"layers": []}}
    labels = switch_freeze_labels(params)
    assert labels["switch"]["w"] == "train"
    assert labels["decoder"]["x"] == "freeze"


def test_switch_loss_end_to_end():
    from law_of_vision_representation_in_mllms_tpu.models import llama as L
    from law_of_vision_representation_in_mllms_tpu.models import llava as M
    from law_of_vision_representation_in_mllms_tpu.models.splice import (
        IGNORE_INDEX, IMAGE_TOKEN_INDEX)
    from law_of_vision_representation_in_mllms_tpu.models.towers import (
        TowerSpec, TowerEntry)
    from law_of_vision_representation_in_mllms_tpu.models.vit import ViTConfig

    vit_cfg = ViTConfig(image_size=14, patch_size=7, hidden_size=16,
                        num_layers=2, num_heads=2, intermediate_size=32)
    entry = TowerEntry(name="tiny", kind="vit", vit_config=vit_cfg,
                       vit_family="clip", hidden_size=16,
                       num_patches=vit_cfg.num_patches)
    cfg = M.LlavaConfig(
        tower_spec=TowerSpec(entries=[entry], join="single"),
        decoder=L.tiny(vocab_size=64, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=4, intermediate_size=64))
    params = M.init_params(jax.random.PRNGKey(0), cfg, FP32_PRECISION)
    params["switch"] = init_switch(jax.random.PRNGKey(1), 32)

    rng = np.random.RandomState(0)
    ids = rng.randint(1, 60, size=(2, 6)).astype(np.int32)
    ids[:, 0] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :2] = IGNORE_INDEX
    batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
             "text_mask": jnp.ones((2, 6), bool),
             "pixel_values": [jnp.asarray(
                 rng.randn(2, 14, 14, 3).astype(np.float32))]}
    loss, grads = jax.value_and_grad(
        lambda p: switch_loss_fn(p, cfg, batch, 1.0, FP32_PRECISION))(params)
    assert np.isfinite(float(loss))
    assert float(jnp.sum(jnp.abs(grads["switch"]["w"]))) > 0


def test_perceiver_projector_golden():
    """vs a torch transliteration of the reference PerceiverResampler."""
    import torch.nn as tnn
    from einops import rearrange, repeat

    d, inner, heads, hd, nl = 16, 32, 4, 8, 6
    depth = 2
    params = init_perceiver_projector(
        jax.random.PRNGKey(0), depth, d, 24, num_latents=nl, heads=heads,
        head_dim=hd, ff_mult=2)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 10, d).astype(np.float32)

    got = np.asarray(apply_perceiver_projector(
        params, jnp.asarray(x), FP32_PRECISION))
    assert got.shape == (2, nl, 24)

    # torch oracle with the same weights
    def t(a):
        return torch.from_numpy(np.asarray(a))

    lat = t(params["latents"]).repeat(2, 1, 1)
    xt = t(x)
    for lp in params["layers"]:
        xm = torch.nn.functional.layer_norm(
            xt, (d,), t(lp["norm_media"]["scale"]),
            t(lp["norm_media"]["bias"]))
        lm = torch.nn.functional.layer_norm(
            lat, (d,), t(lp["norm_latents"]["scale"]),
            t(lp["norm_latents"]["bias"]))
        q = lm @ t(lp["to_q"])
        kv = torch.cat([xm, lm], dim=1) @ t(lp["to_kv"])
        k, v = kv.chunk(2, dim=-1)
        q = rearrange(q, "b n (h d) -> b h n d", h=heads) * hd ** -0.5
        k = rearrange(k, "b n (h d) -> b h n d", h=heads)
        v = rearrange(v, "b n (h d) -> b h n d", h=heads)
        sim = torch.einsum("bhid,bhjd->bhij", q, k)
        sim = sim - sim.amax(dim=-1, keepdim=True)
        attn = sim.softmax(dim=-1)
        o = torch.einsum("bhij,bhjd->bhid", attn, v)
        o = rearrange(o, "b h n d -> b n (h d)")
        lat = lat + o @ t(lp["to_out"])
        h2 = torch.nn.functional.layer_norm(
            lat, (d,), t(lp["ff_norm"]["scale"]), t(lp["ff_norm"]["bias"]))
        h2 = torch.nn.functional.gelu(h2 @ t(lp["ff_in"]))
        lat = lat + h2 @ t(lp["ff_out"])
    lat = torch.nn.functional.layer_norm(
        lat, (d,), t(params["final_norm"]["scale"]),
        t(params["final_norm"]["bias"]))
    ref = lat @ t(params["proj"]["kernel"]) + t(params["proj"]["bias"])
    np.testing.assert_allclose(got, ref.numpy(), atol=3e-5, rtol=1e-3)


def test_language_align_variant():
    from law_of_vision_representation_in_mllms_tpu.metrics.a_score import (
        language_align_score)
    rng = np.random.RandomState(1)
    t_arr = jnp.asarray(rng.randn(4, 6, 8).astype(np.float32))
    s = float(language_align_score(t_arr, t_arr))
    assert abs(s - 1.0) < 1e-5  # self-alignment is exactly 1
