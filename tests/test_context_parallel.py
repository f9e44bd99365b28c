"""Context-parallel decoder (llama.forward(cp=...)) vs the dense path.

Ring attention embedded in the real trunk on a (data=2, seq=2, model=2)
mesh: GQA heads, right-padded batch, loss + gradient parity. The
reference has no context parallelism (sequences capped at 2048,
SURVEY.md §5) — this is TPU-native long-context headroom.
"""

import numpy as np
import jax
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models import llama as L
from law_of_vision_representation_in_mllms_tpu.ops.ring_attention import (
    ContextParallel)
from law_of_vision_representation_in_mllms_tpu.parallel import make_mesh


def _setup(seed=0):
    cfg = L.tiny()                       # nh=4, nkv=2 (GQA), L=2
    rng = jax.random.PRNGKey(seed)
    params = L.init_params(rng, cfg)
    b, s = 2, 32
    embeds = jnp.asarray(np.random.RandomState(1).randn(
        b, s, cfg.hidden_size).astype(np.float32)) * 0.1
    positions = jnp.broadcast_to(jnp.arange(s), (b, s))
    attn_mask = jnp.asarray(
        np.array([[True] * s, [True] * (s - 8) + [False] * 8]))
    return cfg, params, embeds, positions, attn_mask


def test_cp_forward_matches_dense():
    cfg, params, embeds, positions, attn_mask = _setup()
    mesh = make_mesh(n_data=2, n_seq=2, n_model=2)
    cp = ContextParallel(mesh)

    ref, _ = jax.jit(lambda p, e: L.forward(
        p, cfg, e, positions, attn_mask=attn_mask,
        precision=FP32_PRECISION))(params, embeds)
    got, _ = jax.jit(lambda p, e: L.forward(
        p, cfg, e, positions, attn_mask=attn_mask, cp=cp,
        precision=FP32_PRECISION))(params, embeds)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_cp_train_runner_trajectory_matches(tmp_path):
    """`parallel.seq: 2` through run_training: the CP loss trajectory
    matches the seq=1 run (same seeds, fp32)."""
    import json
    import os
    from law_of_vision_representation_in_mllms_tpu.core.config import (
        RunConfig)
    from law_of_vision_representation_in_mllms_tpu.train.runner import (
        run_training)
    from tests.test_cli_runners import _tiny_train_config

    base = _tiny_train_config(tmp_path)
    losses = {}
    for seq in (1, 2):
        d = json.loads(json.dumps(base))
        d["parallel"]["seq"] = seq
        d["train"]["output_dir"] = str(tmp_path / f"out{seq}")
        assert run_training(RunConfig.from_dict(d)) == 0
        lines = open(os.path.join(
            d["train"]["output_dir"], "train.jsonl")).read().strip()
        losses[seq] = [json.loads(ln)["loss"] for ln in lines.split("\n")]
    assert all(np.isfinite(l) for l in losses[2]), losses[2]
    np.testing.assert_allclose(losses[2], losses[1], rtol=2e-4)


def test_cp_grad_and_remat_parity():
    cfg, params, embeds, positions, attn_mask = _setup(3)
    mesh = make_mesh(n_data=2, n_seq=4, n_model=1)
    cp = ContextParallel(mesh, head_axis=None)
    labels = jnp.asarray(np.random.RandomState(2).randint(
        0, cfg.vocab_size, (2, 32)))
    labels = jnp.where(attn_mask, labels, -100)

    def loss(p, cp_arg, remat):
        h, _ = L.forward(p, cfg, embeds, positions, attn_mask=attn_mask,
                         cp=cp_arg, remat=remat,
                         precision=FP32_PRECISION)
        return L.causal_lm_loss(L.logits_fn(p, h), labels)

    l_ref, g_ref = jax.jit(jax.value_and_grad(
        lambda p: loss(p, None, False)))(params)
    l_cp, g_cp = jax.jit(jax.value_and_grad(
        lambda p: loss(p, cp, False)))(params)
    l_cpr, _ = jax.jit(jax.value_and_grad(
        lambda p: loss(p, cp, True)))(params)

    np.testing.assert_allclose(float(l_cp), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(float(l_cpr), float(l_ref), rtol=1e-5)
    from jax import flatten_util
    flat_r, _ = flatten_util.ravel_pytree(g_ref)
    flat_c, _ = flatten_util.ravel_pytree(g_cp)
    np.testing.assert_allclose(np.asarray(flat_c), np.asarray(flat_r),
                               atol=3e-5, rtol=1e-3)
