"""Training-step tests: loss decreases, stage-1 freezes decoder, and the
full sharded train step runs on an 8-device virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.core.precision import FP32_PRECISION
from law_of_vision_representation_in_mllms_tpu.models import llama as L
from law_of_vision_representation_in_mllms_tpu.models import llava as M
from law_of_vision_representation_in_mllms_tpu.models.splice import (
    IGNORE_INDEX, IMAGE_TOKEN_INDEX)
from law_of_vision_representation_in_mllms_tpu.models.towers import (
    TowerSpec, TowerEntry)
from law_of_vision_representation_in_mllms_tpu.models.vit import ViTConfig
from law_of_vision_representation_in_mllms_tpu.train import (
    TrainConfig, make_train_step, init_train_state)
from law_of_vision_representation_in_mllms_tpu.train.train_step import (
    param_shardings, shard_batch_specs)


def _tiny(seed=0, heads=4, kv=4, hidden=32):
    vit_cfg = ViTConfig(image_size=14, patch_size=7, hidden_size=16,
                        num_layers=2, num_heads=2, intermediate_size=32)
    entry = TowerEntry(name="tiny", kind="vit", vit_config=vit_cfg,
                       vit_family="clip", hidden_size=16,
                       num_patches=vit_cfg.num_patches)
    cfg = M.LlavaConfig(
        tower_spec=TowerSpec(entries=[entry], join="single"),
        decoder=L.tiny(vocab_size=64, hidden_size=hidden, num_layers=2,
                       num_heads=heads, num_kv_heads=kv,
                       intermediate_size=64))
    params = M.init_params(jax.random.PRNGKey(seed), cfg, FP32_PRECISION)
    return cfg, params


def _batch(rng, b=4, l=8):
    ids = rng.randint(1, 60, size=(b, l)).astype(np.int32)
    ids[:, 0] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :2] = IGNORE_INDEX
    return {"input_ids": jnp.asarray(ids),
            "labels": jnp.asarray(labels),
            "text_mask": jnp.ones((b, l), bool),
            "pixel_values": [jnp.asarray(
                rng.randn(b, 14, 14, 3).astype(np.float32))]}


def test_stage1_trains_projector_only_and_loss_decreases():
    cfg, params = _tiny()
    tcfg = TrainConfig(stage=1, learning_rate=1e-2, total_steps=50)
    state, opt = init_train_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, opt, FP32_PRECISION))

    dec_before = jax.tree.map(lambda x: np.asarray(x).copy(),
                              state["params"]["decoder"])
    batch = _batch(np.random.RandomState(0))
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses

    # decoder untouched in stage 1
    for a, b in zip(jax.tree.leaves(dec_before),
                    jax.tree.leaves(state["params"]["decoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stage2_trains_decoder_too():
    cfg, params = _tiny(1)
    tcfg = TrainConfig(stage=2, learning_rate=1e-3, total_steps=50)
    state, opt = init_train_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, opt, FP32_PRECISION))
    before = np.asarray(state["params"]["decoder"]["layers"]["wq"]).copy()
    batch = _batch(np.random.RandomState(1))
    state, _ = step(state, batch)
    state, _ = step(state, batch)
    after = np.asarray(state["params"]["decoder"]["layers"]["wq"])
    assert np.abs(after - before).max() > 0
    # towers always frozen
    for a, b in zip(jax.tree.leaves(params["towers"]),
                    jax.tree.leaves(state["params"]["towers"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_train_step_on_mesh(mesh8):
    """Full stage-2 step with TP(2) x DP(4) shardings on the virtual mesh."""
    cfg, params = _tiny(2, heads=4, kv=2, hidden=32)
    tcfg = TrainConfig(stage=2, learning_rate=1e-3, total_steps=10)

    shardings = param_shardings(params, cfg, mesh8)
    params = jax.device_put(params, shardings)
    state, opt = init_train_state(params, tcfg)
    step = make_train_step(cfg, tcfg, opt, FP32_PRECISION)

    batch = _batch(np.random.RandomState(2), b=8)
    batch = jax.device_put(batch, shard_batch_specs(batch, mesh8))

    jit_step = jax.jit(step)
    state, metrics = jit_step(state, batch)
    state, metrics = jit_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # TP sharding actually applied to decoder weights
    wq = state["params"]["decoder"]["layers"]["wq"]
    assert len(wq.sharding.device_set) == 8


def test_remat_matches_no_remat():
    """Gradient checkpointing changes memory, not math."""
    cfg, params = _tiny(3)
    batch = _batch(np.random.RandomState(3))
    for remat in (False, True):
        tcfg = TrainConfig(stage=2, learning_rate=1e-3, total_steps=10,
                           remat=remat)
        state, opt = init_train_state(params, tcfg)
        step = jax.jit(make_train_step(cfg, tcfg, opt, FP32_PRECISION))
        _, m = step(state, batch)
        if remat:
            np.testing.assert_allclose(float(m["loss"]), base_loss,
                                       rtol=1e-6)
            np.testing.assert_allclose(float(m["grad_norm"]), base_gnorm,
                                       rtol=1e-5)
        else:
            base_loss, base_gnorm = float(m["loss"]), float(m["grad_norm"])


def test_sharded_generate_on_mesh(mesh8):
    """Greedy decode with a TP(2)-sharded decoder on the virtual mesh."""
    cfg, params = _tiny(5, heads=4, kv=2, hidden=32)
    shardings = param_shardings(params, cfg, mesh8)
    params = jax.device_put(params, shardings)
    rng = np.random.RandomState(5)
    ids = rng.randint(1, 60, size=(8, 6)).astype(np.int32)
    ids[:, 0] = IMAGE_TOKEN_INDEX
    px = jnp.asarray(rng.randn(8, 14, 14, 3).astype(np.float32))

    toks = M.generate_greedy(params, cfg, jnp.asarray(ids),
                             jnp.ones((8, 6), bool), [px],
                             max_new_tokens=4, eos_id=0,
                             precision=FP32_PRECISION, use_flash=False)
    assert np.asarray(toks).shape == (8, 4)


def test_grad_accum_parity(mesh8):
    """grad_accum=2 over a duplicated batch must match grad_accum=1 over
    the single batch exactly (mean-of-means grads)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        FP32_PRECISION)
    from law_of_vision_representation_in_mllms_tpu.models import llama, llava
    from law_of_vision_representation_in_mllms_tpu.models.splice import (
        IGNORE_INDEX, IMAGE_TOKEN_INDEX)
    from law_of_vision_representation_in_mllms_tpu.models.towers import (
        TowerSpec, TowerEntry)
    from law_of_vision_representation_in_mllms_tpu.models.vit import (
        ViTConfig)
    from law_of_vision_representation_in_mllms_tpu.train.train_step import (
        TrainConfig, init_train_state, make_train_step)

    vit_cfg = ViTConfig(image_size=28, patch_size=14, hidden_size=32,
                        num_layers=2, num_heads=4, intermediate_size=64)
    entry = TowerEntry(name="t", kind="vit", vit_config=vit_cfg,
                       vit_family="clip", hidden_size=32,
                       num_patches=vit_cfg.num_patches)
    cfg = llava.LlavaConfig(
        tower_spec=TowerSpec(entries=[entry], join="single"),
        decoder=llama.tiny(vocab_size=128, hidden_size=32, num_layers=2,
                           num_heads=4, num_kv_heads=2,
                           intermediate_size=64))
    params = llava.init_params(jax.random.PRNGKey(0), cfg, FP32_PRECISION)

    rng = np.random.RandomState(0)
    b, l = 4, 10
    ids = rng.randint(1, 120, size=(b, l)).astype(np.int32)
    ids[:, 0] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :2] = IGNORE_INDEX
    px = rng.randn(b, 28, 28, 3).astype(np.float32)
    one = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
           "text_mask": jnp.ones((b, l), bool),
           "pixel_values": [jnp.asarray(px)]}
    two = jax.tree.map(lambda x: jnp.concatenate([x, x]), one)

    results = []
    for accum, batch in ((1, one), (2, two)):
        tcfg = TrainConfig(stage=2, learning_rate=1e-3, total_steps=10,
                           grad_accum=accum)
        state, opt = init_train_state(params, tcfg)
        step = jax.jit(make_train_step(cfg, tcfg, opt, FP32_PRECISION))
        state, m = step(state, batch)
        results.append((float(m["loss"]),
                        np.asarray(state["params"]["projector"]["layers"]
                                   [0]["kernel"])))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-6)
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-5,
                               atol=1e-7)


def test_remat_dots_policy_matches_no_remat():
    """remat_policy='dots' (save matmul outputs, recompute elementwise +
    batched attention dots) changes memory/recompute, not math."""
    cfg, params = _tiny(3)
    batch = _batch(np.random.RandomState(3))
    tcfg0 = TrainConfig(stage=2, learning_rate=1e-3, total_steps=10)
    state0, opt0 = init_train_state(params, tcfg0)
    step0 = jax.jit(make_train_step(cfg, tcfg0, opt0, FP32_PRECISION))
    _, m0 = step0(state0, batch)
    tcfg = TrainConfig(stage=2, learning_rate=1e-3, total_steps=10,
                       remat=True, remat_policy="dots")
    state, opt = init_train_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, opt, FP32_PRECISION))
    _, m = step(state, batch)
    np.testing.assert_allclose(float(m["loss"]), float(m0["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m["grad_norm"]),
                               float(m0["grad_norm"]), rtol=1e-5)


def test_nonfinite_batch_skips_update_then_recovers():
    """The production guard: a NaN-poisoned batch must (a) report
    skipped_nonfinite=1, (b) leave params AND optimizer moments bit-exact
    (the select-zero formulation applies +0), and (c) not poison later
    steps. The schedule count still advances (HF-Trainer AMP parity)."""
    cfg, params = _tiny(3)
    tcfg = TrainConfig(stage=2, learning_rate=1e-3, total_steps=50)
    state, opt = init_train_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, opt, FP32_PRECISION))

    rng = np.random.RandomState(3)
    clean = _batch(rng)
    state, m0 = step(state, clean)
    assert float(m0["skipped_nonfinite"]) == 0.0

    params_before = jax.tree.map(lambda x: np.asarray(x).copy(),
                                 state["params"])
    poisoned = dict(clean)
    px = np.asarray(clean["pixel_values"][0]).copy()
    px[0, 0, 0, 0] = np.nan
    poisoned["pixel_values"] = [jnp.asarray(px)]
    state, m1 = step(state, poisoned)
    assert float(m1["skipped_nonfinite"]) == 1.0
    for a, b in zip(jax.tree.leaves(params_before),
                    jax.tree.leaves(state["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # moments stay finite (grads were select-zeroed before opt.update)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(state["opt_state"]))

    # recovery: the next clean step trains normally
    state, m2 = step(state, clean)
    assert float(m2["skipped_nonfinite"]) == 0.0
    assert np.isfinite(float(m2["loss"]))
    # decoder weights moved on the clean step
    before_wq = params_before["decoder"]["layers"]["wq"]
    after_wq = np.asarray(state["params"]["decoder"]["layers"]["wq"])
    assert np.abs(after_wq - before_wq).max() > 0


def test_fused_adamw_matches_optax_chain():
    """FusedAdamW (default) vs the optax chain it replaces: same params
    after several steps, both stages, with weight decay and warmup in
    play. fp32 so the comparison is numerics, not rounding."""
    for stage in (1, 2):
        cfg, params = _tiny(7)
        kw = dict(stage=stage, learning_rate=1e-3, weight_decay=0.01,
                  total_steps=20, warmup_ratio=0.1)
        s_f, opt_f = init_train_state(params, TrainConfig(**kw))
        s_o, opt_o = init_train_state(params,
                                      TrainConfig(fused_optimizer=False,
                                                  **kw))
        step_f = jax.jit(make_train_step(cfg, TrainConfig(**kw), opt_f,
                                         FP32_PRECISION))
        step_o = jax.jit(make_train_step(
            cfg, TrainConfig(fused_optimizer=False, **kw), opt_o,
            FP32_PRECISION))
        rng = np.random.RandomState(11)
        for i in range(3):
            b = _batch(rng)
            s_f, m_f = step_f(s_f, b)
            s_o, m_o = step_o(s_o, b)
            np.testing.assert_allclose(float(m_f["loss"]),
                                       float(m_o["loss"]), rtol=1e-6)
        for a, b2 in zip(jax.tree.leaves(s_f["params"]),
                         jax.tree.leaves(s_o["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                       rtol=2e-5, atol=2e-7)
        # frozen subtrees carry no moments in either formulation
        import optax as _ox
        frozen_mu = s_f["opt_state"]["mu"]["towers"]
        assert all(isinstance(x, _ox.MaskedNode)
                   for x in jax.tree.leaves(
                       frozen_mu, is_leaf=lambda n: isinstance(
                           n, _ox.MaskedNode)))


def _int4_representable(params, gs=4):
    """Round every decoder matmul weight (+lm_head) to its int4 grid so a
    quantized run and a dense run compute identical numbers."""
    from law_of_vision_representation_in_mllms_tpu.ops.quant import (
        DECODER_TARGETS, dequantize_int4, quantize_int4)
    dec = dict(params["decoder"])
    layers = dict(dec["layers"])
    for t in DECODER_TARGETS:
        layers[t] = dequantize_int4(quantize_int4(layers[t],
                                                  group_size=gs),
                                    jnp.float32)
    dec["layers"] = layers
    dec["lm_head"] = dequantize_int4(quantize_int4(dec["lm_head"],
                                                   group_size=gs),
                                     jnp.float32)
    out = dict(params)
    out["decoder"] = dec
    return out


def test_qlora_int4_base_matches_dense_frozen_base():
    """QLoRA (reference `train.py:908-932` load_in_4bit + peft): training
    with an int4-quantized frozen decoder base must walk the same loss
    trajectory and the same adapter updates as the dense run, when the
    dense base sits exactly on the int4 grid."""
    from law_of_vision_representation_in_mllms_tpu.models.lora import (
        LoraConfig, init_lora)
    from law_of_vision_representation_in_mllms_tpu.ops.quant import (
        quantize_decoder)
    gs = 4
    cfg, params = _tiny(11)
    params = _int4_representable(params, gs)
    lora = init_lora(jax.random.PRNGKey(99), cfg.decoder,
                     LoraConfig(rank=2, alpha=4.0))
    # break the zero-init symmetry so adapter grads are nonzero from
    # step one (B starts at zero; give A real values, keep B zero)
    lora = {k: (v + 0.01 if k.endswith("_a") else v)
            for k, v in lora.items()}
    tcfg = TrainConfig(stage=2, learning_rate=1e-2, total_steps=20,
                       lora_rank=2, lora_alpha=4.0)

    def run(base_params):
        p = dict(base_params)
        p["lora"] = jax.tree.map(jnp.copy, lora)
        state, opt = init_train_state(p, tcfg)
        step = jax.jit(make_train_step(cfg, tcfg, opt, FP32_PRECISION))
        batch = _batch(np.random.RandomState(5))
        losses = []
        for _ in range(4):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        return losses, state

    qparams = dict(params)
    qparams["decoder"] = quantize_decoder(params["decoder"], bits=4,
                                          group_size=gs)
    dense_losses, dense_state = run(params)
    q_losses, q_state = run(qparams)

    np.testing.assert_allclose(q_losses, dense_losses, rtol=1e-5)
    assert dense_losses[-1] < dense_losses[0], dense_losses
    # adapters took the same updates (the quant path associates the
    # per-group dots differently, so float rounding differs at ~1e-7
    # per step; AdamW's 1/sqrt(v) amplifies that near zero)
    for (ka, a), (kb, b) in zip(
            sorted(dense_state["params"]["lora"].items()),
            sorted(q_state["params"]["lora"].items())):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)
    # the quantized base is bit-identical after training (frozen ints)
    for a, b in zip(jax.tree.leaves(qparams["decoder"]),
                    jax.tree.leaves(q_state["params"]["decoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_qlora_grad_accum_runs_with_int_base():
    """Microbatched accumulation over a quantized frozen base: the int
    leaves take scalar-zero grad placeholders through the scan."""
    from law_of_vision_representation_in_mllms_tpu.models.lora import (
        LoraConfig, init_lora)
    from law_of_vision_representation_in_mllms_tpu.ops.quant import (
        quantize_decoder)
    cfg, params = _tiny(12)
    params = dict(params)
    params["decoder"] = quantize_decoder(params["decoder"], bits=4,
                                         group_size=4)
    params["lora"] = init_lora(jax.random.PRNGKey(7), cfg.decoder,
                               LoraConfig(rank=2, alpha=4.0))
    tcfg = TrainConfig(stage=2, learning_rate=1e-2, total_steps=20,
                       lora_rank=2, lora_alpha=4.0, grad_accum=2)
    state, opt = init_train_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, opt, FP32_PRECISION))
    batch = _batch(np.random.RandomState(6))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["skipped_nonfinite"]) == 0.0


def test_qlora_sharded_step_on_mesh(mesh8):
    """Quantized frozen base under TP(2) x DP(4): the packed codes carry
    the dense weight's TP spec, scales replicate."""
    from law_of_vision_representation_in_mllms_tpu.models.lora import (
        LoraConfig, init_lora)
    from law_of_vision_representation_in_mllms_tpu.ops.quant import (
        quantize_decoder)
    cfg, params = _tiny(13, heads=4, kv=2, hidden=32)
    params = dict(params)
    params["decoder"] = quantize_decoder(params["decoder"], bits=8)
    params["lora"] = init_lora(jax.random.PRNGKey(8), cfg.decoder,
                               LoraConfig(rank=2, alpha=4.0))
    tcfg = TrainConfig(stage=2, learning_rate=1e-3, total_steps=10,
                       lora_rank=2, lora_alpha=4.0)
    shardings = param_shardings(params, cfg, mesh8)
    params = jax.device_put(params, shardings)
    state, opt = init_train_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, opt, FP32_PRECISION))
    batch = _batch(np.random.RandomState(7), b=8)
    batch = jax.device_put(batch, shard_batch_specs(batch, mesh8))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    q8 = state["params"]["decoder"]["layers"]["wq"]["q8"]
    assert len(q8.sharding.device_set) == 8
