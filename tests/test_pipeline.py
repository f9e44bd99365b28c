"""Pipeline-parallel trunk (parallel/pipeline.py): exact parity of the
GPipe-scheduled forward/backward against the plain scan trunk, and the
full sharded train step on a (data, stage, model) mesh.

The reference has no pipeline parallelism (SURVEY §2.9) — these tests pin
the TPU-native extension's correctness instead of a behavior-parity
oracle: the pipelined math must be EXACTLY the unpipelined math.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models import llama as L
from law_of_vision_representation_in_mllms_tpu.models import llava as M
from law_of_vision_representation_in_mllms_tpu.parallel.pipeline import (
    PipelineParallel, forward_pipelined)
from law_of_vision_representation_in_mllms_tpu.parallel.mesh import make_mesh
from law_of_vision_representation_in_mllms_tpu.train import (
    TrainConfig, make_train_step, init_train_state)
from law_of_vision_representation_in_mllms_tpu.train.train_step import (
    param_shardings, shard_batch_specs)

from test_train_step import _tiny, _batch


def _trunk_inputs(b=4, s=16, layers=4):
    cfg = L.tiny(num_layers=layers)
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    embeds = jnp.asarray(rng.randn(b, s, cfg.hidden_size).astype(np.float32))
    positions = jnp.broadcast_to(jnp.arange(s), (b, s))
    attn_mask = jnp.asarray(rng.rand(b, s) > 0.2)
    return cfg, params, embeds, positions, attn_mask


def _mesh_ds(n_data=2, n_stage=2):
    devs = np.array(jax.devices()[:n_data * n_stage])
    return Mesh(devs.reshape(n_data, n_stage), ("data", "stage"))


def test_forward_parity_vs_scan_trunk():
    cfg, params, embeds, positions, attn_mask = _trunk_inputs()
    # both paths end with the final RMSNorm — outputs compare directly
    ref, _ = jax.jit(lambda p, e: L.forward(
        p, cfg, e, positions, attn_mask=attn_mask,
        precision=FP32_PRECISION))(params, embeds)

    mesh = _mesh_ds()
    for m in (2, 4):                      # M == S and M > S schedules
        pp = PipelineParallel(mesh, microbatches=m)
        with mesh:
            got = jax.jit(lambda p, e: forward_pipelined(
                p, cfg, e, positions, attn_mask=attn_mask, pp=pp,
                precision=FP32_PRECISION))(params, embeds)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


def test_grad_parity_and_remat():
    cfg, params, embeds, positions, attn_mask = _trunk_inputs()

    def loss_ref(p):
        h, _ = L.forward(p, cfg, embeds, positions, attn_mask=attn_mask,
                         precision=FP32_PRECISION)
        return jnp.mean(h.astype(jnp.float32) ** 2)

    g_ref = jax.jit(jax.grad(loss_ref))(params)
    mesh = _mesh_ds()
    pp = PipelineParallel(mesh, microbatches=4)
    for remat in (False, True):
        def loss_pp(p):
            h = forward_pipelined(p, cfg, embeds, positions,
                                  attn_mask=attn_mask, pp=pp,
                                  precision=FP32_PRECISION, remat=remat)
            return jnp.mean(h.astype(jnp.float32) ** 2)

        with mesh:
            g_pp = jax.jit(jax.grad(loss_pp))(params)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pp)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=3e-5, rtol=1e-4)


def test_sharded_train_step_pp_matches_single_device():
    """3 optimizer steps on a dp2 x pp2 x tp2 mesh == unsharded steps
    (3 so post-warmup updated params are exercised, not just step-1 grads —
    the warmup schedule's first step is lr 0), plus the same trajectory
    with ZeRO-2 optimizer sharding composed on top."""
    cfg, params = _tiny(heads=4, kv=4, hidden=32)
    tcfg = TrainConfig(stage=2, learning_rate=1e-3, total_steps=50)
    batch = _batch(np.random.RandomState(3))

    # single-device reference trajectory
    state, opt = init_train_state(
        jax.tree.map(jnp.copy, params), tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, opt, FP32_PRECISION))
    ref_losses = []
    for _ in range(3):
        state, m = step(state, batch)
        ref_losses.append(float(m["loss"]))
    assert ref_losses[2] != ref_losses[0]    # params actually moved

    mesh = make_mesh(n_data=2, n_model=2, n_stage=2)
    assert set(mesh.axis_names) == {"data", "stage", "model"}
    pp = PipelineParallel(mesh, microbatches=2)
    for zero in (0, 2):
        if zero:
            from law_of_vision_representation_in_mllms_tpu.train \
                .train_step import init_sharded_train_state
            state2, opt2, *_ = init_sharded_train_state(
                jax.tree.map(jnp.copy, params), tcfg, cfg, mesh,
                zero=2, pipeline=True)
        else:
            sharded = jax.device_put(
                params, param_shardings(params, cfg, mesh, pipeline=True))
            state2, opt2 = init_train_state(sharded, tcfg)
        with mesh:
            step2 = jax.jit(make_train_step(cfg, tcfg, opt2,
                                            FP32_PRECISION,
                                            mesh=mesh, pp=pp))
            batch2 = jax.device_put(batch, shard_batch_specs(batch, mesh))
            pp_losses = []
            for _ in range(3):
                state2, m2 = step2(state2, batch2)
                pp_losses.append(float(m2["loss"]))
        np.testing.assert_allclose(pp_losses, ref_losses, atol=1e-5,
                                   rtol=1e-5)


def test_pp_train_runner_trajectory_matches(tmp_path):
    """`parallel.pipeline: 2` through run_training: the pipelined loss
    trajectory matches the pipeline=1 run (same seeds, fp32)."""
    import json
    import os
    from law_of_vision_representation_in_mllms_tpu.core.config import (
        RunConfig)
    from law_of_vision_representation_in_mllms_tpu.train.runner import (
        run_training)
    from tests.test_cli_runners import _tiny_train_config

    base = _tiny_train_config(tmp_path)
    losses = {}
    for stages in (1, 2):
        d = json.loads(json.dumps(base))
        d["parallel"]["pipeline"] = stages
        d["train"]["output_dir"] = str(tmp_path / f"out{stages}")
        assert run_training(RunConfig.from_dict(d)) == 0
        lines = open(os.path.join(
            d["train"]["output_dir"], "train.jsonl")).read().strip()
        losses[stages] = [json.loads(ln)["loss"]
                          for ln in lines.split("\n")]
    assert all(np.isfinite(l) for l in losses[2]), losses[2]
    np.testing.assert_allclose(losses[2], losses[1], rtol=2e-4)


def test_pp_grad_accum_and_remat_ticks():
    """grad_accum=2 with the pipelined trunk matches grad_accum=2 with the
    plain trunk; remat_ticks (tick-level checkpointing) changes nothing
    numerically."""
    cfg, params = _tiny(heads=4, kv=4, hidden=32)
    tcfg = TrainConfig(stage=2, learning_rate=1e-3, total_steps=50,
                       grad_accum=2)
    batch = _batch(np.random.RandomState(5))

    state, opt = init_train_state(jax.tree.map(jnp.copy, params), tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, opt, FP32_PRECISION))
    ref = []
    for _ in range(3):
        state, m = step(state, batch)
        ref.append(float(m["loss"]))

    mesh = make_mesh(n_data=2, n_model=1, n_stage=2)
    for remat_ticks in (False, True):
        pp = PipelineParallel(mesh, microbatches=2,
                              remat_ticks=remat_ticks)
        sharded = jax.device_put(
            params, param_shardings(params, cfg, mesh, pipeline=True))
        st2, opt2 = init_train_state(sharded, tcfg)
        with mesh:
            step2 = jax.jit(make_train_step(cfg, tcfg, opt2,
                                            FP32_PRECISION, mesh=mesh,
                                            pp=pp))
            b2 = jax.device_put(batch, shard_batch_specs(batch, mesh))
            got = []
            for _ in range(3):
                st2, m2 = step2(st2, b2)
                got.append(float(m2["loss"]))
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_pp_flash_attention_parity():
    """use_flash=True through the vmapped stage step (Pallas custom-VJP
    under vmap, interpret mode on CPU) matches the flash plain trunk."""
    cfg, params, embeds, positions, _ = _trunk_inputs()
    full = jnp.ones(positions.shape, bool)   # flash assumes right padding
    ref, _ = jax.jit(lambda p, e: L.forward(
        p, cfg, e, positions, attn_mask=full, precision=FP32_PRECISION,
        use_flash=True))(params, embeds)
    mesh = _mesh_ds()
    pp = PipelineParallel(mesh, microbatches=2)
    with mesh:
        got = jax.jit(lambda p, e: forward_pipelined(
            p, cfg, e, positions, attn_mask=full, pp=pp,
            precision=FP32_PRECISION, use_flash=True))(params, embeds)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_pp_rejects_bad_compositions():
    cfg, params, embeds, positions, attn_mask = _trunk_inputs(layers=3)
    mesh = _mesh_ds()
    pp = PipelineParallel(mesh)
    # layers not divisible by stages
    try:
        forward_pipelined(params, cfg, embeds, positions,
                          attn_mask=attn_mask, pp=pp,
                          precision=FP32_PRECISION)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "divisible" in str(e)
    # loss_fn guard: pp + lora
    cfg2, params2 = _tiny()
    params2["lora"] = {}
    try:
        M.loss_fn(params2, cfg2, _batch(np.random.RandomState(0)),
                  FP32_PRECISION, pp=pp)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "LoRA" in str(e)
