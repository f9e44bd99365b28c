"""Full-size models trace correctly (jax.eval_shape: real vicuna-7b +
CLIP-L-336 shapes, zero memory) — catches shape/config bugs at production
scale that tiny-config tests can't."""

import jax
import jax.numpy as jnp
import numpy as np

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    DEFAULT_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models import llama as L
from law_of_vision_representation_in_mllms_tpu.models import llava as M
from law_of_vision_representation_in_mllms_tpu.models.splice import (
    IMAGE_TOKEN_INDEX)


def _abstract(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


def _param_shapes(cfg):
    """Abstract LLaVA params without materializing anything."""
    return jax.eval_shape(
        lambda k: M.init_params(k, cfg, DEFAULT_PRECISION),
        jax.random.PRNGKey(0))


def test_vicuna7b_clip336_loss_traces():
    cfg = M.LlavaConfig.build("openai/clip-vit-large-patch14-336")
    assert cfg.decoder.hidden_size == 4096
    assert cfg.num_patches == 576

    params = _param_shapes(cfg)
    # 7B decoder: ~6.74e9 params
    n_dec = sum(int(np.prod(s.shape))
                for s in jax.tree.leaves(params["decoder"]))
    assert 6.5e9 < n_dec < 7.0e9
    # tower = CLIP-L with the final block skipped (select_layer -2)
    n_tow = sum(int(np.prod(s.shape))
                for s in jax.tree.leaves(params["towers"]))
    assert 2.6e8 < n_tow < 3.1e8

    b, l = 4, 2048 - 575          # spliced length = reference max 2048
    batch = {
        "input_ids": jax.ShapeDtypeStruct((b, l), jnp.int32),
        "labels": jax.ShapeDtypeStruct((b, l), jnp.int32),
        "text_mask": jax.ShapeDtypeStruct((b, l), jnp.bool_),
        "pixel_values": [jax.ShapeDtypeStruct((b, 336, 336, 3),
                                              jnp.float32)],
    }
    out = jax.eval_shape(
        lambda p, bt: M.loss_fn(p, cfg, bt, DEFAULT_PRECISION), params,
        batch)
    assert out.shape == () and out.dtype == jnp.float32


def test_dual_tower_7b_traces():
    cfg = M.LlavaConfig.build(
        "openai/clip-vit-large-patch14-336.facebook/dinov2-large-336")
    assert cfg.tower_spec.mm_hidden_size == 2048
    assert cfg.num_patches == 576
    params = _param_shapes(cfg)
    b, l = 2, 512
    batch = {
        "input_ids": jax.ShapeDtypeStruct((b, l), jnp.int32),
        "labels": jax.ShapeDtypeStruct((b, l), jnp.int32),
        "text_mask": jax.ShapeDtypeStruct((b, l), jnp.bool_),
        "pixel_values": [jax.ShapeDtypeStruct((b, 336, 336, 3),
                                              jnp.float32)] * 2,
    }
    out = jax.eval_shape(
        lambda p, bt: M.loss_fn(p, cfg, bt, DEFAULT_PRECISION), params,
        batch)
    assert out.shape == ()


def test_vicuna7b_generate_traces():
    cfg = M.LlavaConfig.build("openai/clip-vit-large-patch14-336")
    params = _param_shapes(cfg)
    b, l, new = 2, 128, 32
    out = jax.eval_shape(
        lambda p: M.generate_greedy(
            p, cfg,
            jnp.zeros((b, l), jnp.int32),
            jnp.ones((b, l), bool),
            [jnp.zeros((b, 336, 336, 3))],
            max_new_tokens=new, eos_id=2, precision=DEFAULT_PRECISION,
            use_flash=False),
        params)
    assert out.shape == (b, new)


def test_grad_shapes_7b_stage2():
    """Gradients trace at 7B scale too (the full stage-2 backward)."""
    cfg = M.LlavaConfig.build("openai/clip-vit-large-patch14-336")
    params = _param_shapes(cfg)
    b, l = 2, 256
    batch = {
        "input_ids": jax.ShapeDtypeStruct((b, l), jnp.int32),
        "labels": jax.ShapeDtypeStruct((b, l), jnp.int32),
        "text_mask": jax.ShapeDtypeStruct((b, l), jnp.bool_),
        "pixel_values": [jax.ShapeDtypeStruct((b, 336, 336, 3),
                                              jnp.float32)],
    }
    grads = jax.eval_shape(
        lambda p, bt: jax.grad(
            lambda pp: M.loss_fn(pp, cfg, bt, DEFAULT_PRECISION,
                                 remat=True))(p),
        params, batch)
    assert grads["decoder"]["layers"]["wq"].shape == (32, 4096, 4096)
