"""Stage-1 / stage-2 training steps, GSPMD-sharded.

Reference training (`llava/train/train.py:899-1136` + deepspeed ZeRO-2/3):
- stage 1 ("pretrain"): towers + decoder frozen, only the mm_projector
  trains (lr 1e-3, cosine, warmup 0.03 — `scripts/v1_5/train/pretrain.sh`).
- stage 2 ("finetune"): projector + decoder train, towers stay frozen
  (lr 2e-5 — `scripts/v1_5/train/finetune.sh`).

TPU-native: one jitted `train_step` over a (data, model) mesh. Decoder
weights use Megatron-style TP specs on the "model" axis; the ZeRO levels
(`parallel/fsdp.py`) additionally shard params and/or AdamW moments on the
"data" axis — `zero=2` matches `scripts/zero2.json` (optimizer-state
partitioning), `zero=3` matches `scripts/zero3.json` (parameter
partitioning), and host offload of the moments matches
`scripts/zero3_offload.json`. XLA inserts every collective. Freezing uses
`optax.multi_transform` with `set_to_zero` for frozen subtrees, so frozen
params carry no optimizer state at all.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.precision import Precision, DEFAULT_PRECISION
from ..models import llama, llava


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    stage: int = 1                    # 1: projector-only, 2: full finetune
    learning_rate: float = 1e-3      # stage-2 default: 2e-5
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03       # pretrain.sh:24
    total_steps: int = 1000
    max_grad_norm: float = 1.0
    b1: float = 0.9
    b2: float = 0.999
    remat: bool = False              # per-block gradient checkpointing
    # remat save policy: "block" re-runs each block fwd in the backward
    # (~25% extra FLOPs at 1.4B stage-2); "dots" saves matmul outputs and
    # recomputes only elementwise + batched attention dots (more
    # activation memory, near-zero recompute) — models/llama._remat
    remat_policy: str = "block"
    use_flash: bool = False          # Pallas flash attention in training
    # microbatch gradient accumulation: the global batch splits into
    # `grad_accum` sequential microbatches inside one jitted step
    # (HF TrainingArguments gradient_accumulation_steps equivalent)
    grad_accum: int = 1
    # LoRA finetune (reference `finetune_lora.sh`: --lora_enable --lora_r
    # 128 --lora_alpha 256): rank>0 expects params["lora"] adapters; the
    # decoder base freezes, adapters + projector train
    lora_rank: int = 0
    lora_alpha: float = 256.0
    # "Switch" representation-steering ablation (train_switch.py:895-898):
    # nonzero sigma expects params["switch"]; ONLY W trains
    switch_sigma: float = 0.0
    # single-fusion AdamW (FusedAdamW below) instead of the optax
    # chain+apply_updates pipeline; False keeps the optax path (the
    # parity oracle in tests/test_train_step.py)
    fused_optimizer: bool = True

    @property
    def lora_scaling(self) -> float:
        return self.lora_alpha / self.lora_rank if self.lora_rank else 1.0


def _freeze_labels(params, stage: int):
    """'train' / 'freeze' label tree. Towers never train (reference freezes
    them in both stages, `train.py:1024-1031`). With LoRA adapters present,
    the decoder base freezes and the adapters train (peft semantics; the
    projector keeps training via --mm_projector_lr, `train.py:969-985`)."""
    if "switch" in params:
        # only W trains (`train_switch.py:895-898`)
        labels = jax.tree.map(lambda _: "freeze", params)
        labels["switch"] = jax.tree.map(lambda _: "train",
                                        params["switch"])
        return labels
    labels = jax.tree.map(lambda _: "train", params)
    labels["towers"] = jax.tree.map(lambda _: "freeze", params["towers"])
    if stage == 1 or "lora" in params:
        labels["decoder"] = jax.tree.map(lambda _: "freeze",
                                         params["decoder"])
    return labels


def _make_schedule(cfg: TrainConfig):
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=cfg.learning_rate,
        warmup_steps=max(1, int(cfg.warmup_ratio * cfg.total_steps)),
        decay_steps=cfg.total_steps, end_value=0.0)


class FusedAdamW:
    """AdamW with clip + nonfinite guard + schedule folded into ONE
    elementwise fusion per leaf: read {g, mu, nu, p}, write
    {mu', nu', p'}.

    Motivation (measured, benchmarks/probe_train_decomp.py): the optax
    pipeline `multi_transform(chain(clip_by_global_norm, adamw))` +
    select-zero guard + `apply_updates` costs 69 ms of the 325 ms 1.4B
    stage-2 step — it materializes the clipped-grad tree, promotes the
    updates tree to fp32 through bias correction (2x param bytes), and
    re-reads the params in apply_updates. The HBM floor for the update
    is ~20 GB ≈ 36 ms at the measured 619 GB/s sustained read
    (benchmarks/probe_decode_bw.py). Fusing the whole per-leaf update
    into one kernel reaches for that floor.

    Semantics mirror the optax chain exactly (parity-tested in
    tests/test_train_step.py):
    - clip: g *= max_grad_norm / max(gnorm, max_grad_norm);
    - AdamW bias correction at t = count+1 (optax scale_by_adam), eps
      1e-8 after the sqrt, additive weight decay wd*p, and
      lr = schedule(count) read at the PRE-increment count (optax
      scale_by_schedule);
    - frozen leaves (the `_freeze_labels` tree) carry no moments
      (optax.MaskedNode, the same sentinel optax.masked stores) and
      never move;
    - nonfinite guard: the clip scale select-zeros the grads before the
      moment update and the applied delta select-zeros, so a skipped
      step applies +0 and decays the moments once — identical to the
      select-zero formulation this replaces;
    - moments are stored in the param dtype (bf16 moments at bf16
      params, like optax mu_dtype=None); per-leaf math runs in fp32 and
      casts back (optax promotes to fp32 through bias correction too).
    """

    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        self.schedule = _make_schedule(cfg)

    def init(self, params):
        labels = _freeze_labels(params, self.cfg.stage)

        def moment(p, lab):
            return jnp.zeros_like(p) if lab == "train" \
                else optax.MaskedNode()
        mu = jax.tree.map(moment, params, labels)
        return {"count": jnp.zeros((), jnp.int32), "mu": mu,
                "nu": jax.tree.map(jnp.copy, mu)}

    def apply(self, params, grads, state, finite, gnorm):
        """(params, grads, opt_state, finite-flag, global_norm(grads))
        -> (new_params, new_opt_state)."""
        cfg = self.cfg
        labels = _freeze_labels(params, cfg.stage)
        count = state["count"]
        lr = self.schedule(count).astype(jnp.float32)
        t = count + 1
        c1 = 1.0 - jnp.asarray(cfg.b1, jnp.float32) ** t
        c2 = 1.0 - jnp.asarray(cfg.b2, jnp.float32) ** t
        mgn = jnp.asarray(cfg.max_grad_norm, jnp.float32)
        scale = mgn / jnp.maximum(gnorm.astype(jnp.float32), mgn)
        fin = finite.astype(jnp.float32)

        leaves, treedef = jax.tree_util.tree_flatten(params)
        lab_l = treedef.flatten_up_to(labels)
        g_l = treedef.flatten_up_to(grads)
        mu_l = treedef.flatten_up_to(state["mu"])
        nu_l = treedef.flatten_up_to(state["nu"])
        new_p, new_mu, new_nu = [], [], []
        for p, lab, g, m, v in zip(leaves, lab_l, g_l, mu_l, nu_l):
            if lab != "train":
                new_p.append(p)
                new_mu.append(m)
                new_nu.append(v)
                continue
            # a true select, not scale*0: NaN grads must not reach the
            # moments (NaN * 0 == NaN)
            g32 = jnp.where(finite, g.astype(jnp.float32) * scale, 0.0)
            m32 = cfg.b1 * m.astype(jnp.float32) + (1.0 - cfg.b1) * g32
            v32 = cfg.b2 * v.astype(jnp.float32) + (1.0 - cfg.b2) * (g32
                                                                     * g32)
            u = (m32 / c1) / (jnp.sqrt(v32 / c2) + 1e-8)
            if cfg.weight_decay:
                u = u + cfg.weight_decay * p.astype(jnp.float32)
            # `fin` (not lax.select) so the zero fuses multiplicatively
            delta = (-lr * fin) * u
            new_p.append((p.astype(jnp.float32) + delta).astype(p.dtype))
            new_mu.append(m32.astype(m.dtype))
            new_nu.append(v32.astype(v.dtype))
        return (jax.tree_util.tree_unflatten(treedef, new_p),
                {"count": t,
                 "mu": jax.tree_util.tree_unflatten(treedef, new_mu),
                 "nu": jax.tree_util.tree_unflatten(treedef, new_nu)})


def make_optimizer(params, cfg: TrainConfig):
    if cfg.fused_optimizer:
        return FusedAdamW(cfg)
    adamw = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(_make_schedule(cfg), b1=cfg.b1, b2=cfg.b2,
                    weight_decay=cfg.weight_decay),
    )
    return optax.multi_transform(
        {"train": adamw, "freeze": optax.set_to_zero()},
        _freeze_labels(params, cfg.stage))


def param_partition_tree(params, model_cfg: llava.LlavaConfig, mesh: Mesh,
                         *, zero: int = 0, min_size: int | None = None,
                         pipeline: bool = False):
    """PartitionSpec tree: decoder gets Megatron TP specs; `zero>=3`
    additionally shards every large leaf (towers, projector, decoder) on the
    data axis — the ZeRO-3 / FSDP placement (`scripts/zero3.json:16-28`).
    `pipeline=True` shards the stacked-layer leading axis on the mesh's
    stage axis (parallel/pipeline.py) instead."""
    from ..parallel import fsdp
    if min_size is None:
        min_size = fsdp.MIN_SIZE_TO_SHARD
    dec_specs = llama.param_partition_specs(model_cfg.decoder)
    if pipeline:
        if zero >= 3:
            raise ValueError("pipeline parallelism composes with zero<=2 "
                             "(stage-sharded layers; re-sharding them on "
                             "the data axis is not supported)")
        from ..parallel.pipeline import pp_layer_specs
        dec_specs["layers"] = pp_layer_specs(dec_specs)
    specs = jax.tree.map(lambda leaf: P(*([None] * jnp.ndim(leaf))), params)

    from ..ops.quant import is_quantized

    def dec_spec(leaf, s):
        # quantized frozen base (QLoRA): the packed codes keep the dense
        # weight's TP spec (same axis order, halved contraction dim);
        # the grouped scales replicate (tiny, and their group axis need
        # not divide the mesh)
        if is_quantized(leaf):
            return {k: (s if k in ("q8", "q4") else
                        P(*([None] * jnp.ndim(v))))
                    for k, v in leaf.items()}
        return s
    specs["decoder"] = jax.tree.map(
        dec_spec, params["decoder"], dec_specs, is_leaf=is_quantized)
    if zero >= 3:
        specs = fsdp.fsdp_param_specs(params, specs, mesh,
                                      min_size=min_size)
    return specs


def param_shardings(params, model_cfg: llava.LlavaConfig, mesh: Mesh,
                    *, zero: int = 0, min_size: int | None = None,
                    pipeline: bool = False):
    """NamedSharding tree for the params (see `param_partition_tree`)."""
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        param_partition_tree(params, model_cfg, mesh, zero=zero,
                             min_size=min_size, pipeline=pipeline),
        is_leaf=lambda x: isinstance(x, P))


def init_train_state(params, train_cfg: TrainConfig):
    opt = make_optimizer(params, train_cfg)
    return {"params": params, "opt_state": opt.init(params),
            "step": jnp.zeros((), jnp.int32)}, opt


def init_sharded_train_state(params, train_cfg: TrainConfig,
                             model_cfg: llava.LlavaConfig, mesh: Mesh, *,
                             zero: int = 2,
                             offload_opt_state: bool = False,
                             offload_params: bool = False,
                             min_size: int | None = None,
                             pipeline: bool = False):
    """ZeRO init: the optimizer state is BORN sharded (jit with
    out_shardings), never materialized replicated — at 7B the replicated
    moments alone would be 54 GB/chip.

    Returns (state, opt, opt_to_device, opt_to_host, params_to_device,
    params_to_host); the sharding-tree pairs are for `make_train_step` when
    `offload_opt_state` places the moments — and `offload_params` the
    parameters (deepspeed offload_param) — in pinned_host memory
    (`scripts/zero3_offload.json` equivalent)."""
    from ..parallel import fsdp
    if min_size is None:
        min_size = fsdp.MIN_SIZE_TO_SHARD
    p_specs = param_partition_tree(params, model_cfg, mesh, zero=zero,
                                   min_size=min_size, pipeline=pipeline)
    p_shard = jax.tree.map(lambda s: NamedSharding(mesh, s), p_specs,
                           is_leaf=lambda x: isinstance(x, P))
    params = jax.device_put(params, p_shard)
    opt = make_optimizer(params, train_cfg)
    o_shapes = jax.eval_shape(opt.init, params)
    o_specs = fsdp.derived_state_specs(o_shapes, p_specs, mesh,
                                       shard_derived=zero >= 2,
                                       min_size=min_size)
    o_dev = fsdp.shardings(o_specs, mesh)
    opt_state = jax.jit(opt.init, out_shardings=o_dev)(params)
    o_host = p_host = p_dev = None
    if offload_opt_state:
        # initial host placement happens OUTSIDE jit (out_shardings with
        # memory kinds trips the SPMD partitioner on some backends); the
        # train step keeps it host-resident via device_put inside jit.
        o_host = fsdp.offload_shardings(o_shapes, o_specs, mesh)
        opt_state = jax.device_put(opt_state, o_host)
    if offload_params:
        p_dev = fsdp.shardings(p_specs, mesh)
        p_host = fsdp.offload_shardings(params, p_specs, mesh)
        params = jax.device_put(params, p_host)
    state = {"params": params, "opt_state": opt_state,
             "step": jnp.zeros((), jnp.int32)}
    return (state, opt, o_dev if offload_opt_state else None, o_host,
            p_dev, p_host)


def make_train_step(model_cfg: llava.LlavaConfig, train_cfg: TrainConfig,
                    opt, precision: Precision = DEFAULT_PRECISION,
                    diffusion_apply=None, opt_to_device=None,
                    opt_to_host=None, params_to_device=None,
                    params_to_host=None, mesh: Mesh | None = None,
                    cp=None, pp=None):
    """Returns step(state, batch) -> (state, metrics); jit/pjit-ready.

    opt_to_device/opt_to_host: optional sharding trees for host-offloaded
    optimizer state (ZeRO-offload): moments live in pinned_host between
    steps and are device_put in only for the update.
    params_to_device/params_to_host: the same for the parameters (deepspeed
    zero3_offload's offload_param): params live in pinned_host between steps
    and stream to HBM for the forward/backward/update.

    mesh: pass when grad_accum > 1 on a multi-device mesh — the microbatch
    reshape [B,...] -> [a, B/a, ...] needs an explicit sharding constraint
    (P(None, 'data')) or GSPMD may replicate the whole batch when the data
    axis does not divide the accumulation factor."""

    def loss(params, batch):
        # stop_gradient on FROZEN weights (same label tree the optimizer
        # freezes with): activation grads still flow THROUGH the frozen
        # decoder to the projector, but XLA never emits the frozen
        # weight-grad matmuls the optimizer would discard via set_to_zero.
        # At 1.4B stage-1 that pass is ~1/3 of the hardware FLOPs
        # (benchmarks/README round-4 accounting). This also matches HF/
        # deepspeed clipping semantics (`train.py:1024-1031` freezes via
        # requires_grad=False, so frozen params never enter the grad-norm).
        labels = _freeze_labels(params, train_cfg.stage)
        params = jax.tree.map(
            lambda p, lab: jax.lax.stop_gradient(p) if lab == "freeze"
            else p, params, labels)
        if train_cfg.switch_sigma:
            from ..models.switch import switch_loss_fn
            return switch_loss_fn(params, model_cfg, batch,
                                  train_cfg.switch_sigma, precision,
                                  diffusion_apply)
        return llava.loss_fn(params, model_cfg, batch, precision,
                             diffusion_apply, remat=train_cfg.remat,
                             remat_policy=train_cfg.remat_policy,
                             use_flash=train_cfg.use_flash,
                             lora_scaling=train_cfg.lora_scaling, cp=cp,
                             pp=pp)

    def sanitize(grads, params):
        # QLoRA (int4/int8 frozen base + LoRA adapters, reference
        # `train.py:908-932` bitsandbytes + peft): the quantized frozen
        # weights are integer leaves, so `allow_int=True` hands back
        # float0 grads for them. Replace those with scalar f32 zeros so
        # global_norm / accumulation / the nonfinite guard treat the
        # tree uniformly; the optimizer never reads them (the label
        # tree freezes the whole decoder whenever LoRA is present).
        return jax.tree.map(
            lambda g, p: jnp.zeros((), jnp.float32)
            if jnp.issubdtype(jnp.asarray(p).dtype, jnp.integer) else g,
            grads, params)

    def grad_fn(params, batch):
        a = train_cfg.grad_accum
        if a <= 1:
            l, g = jax.value_and_grad(loss, allow_int=True)(params, batch)
            return l, sanitize(g, params)
        # microbatch the global batch: lax.scan keeps compile size flat in
        # `a` and the accumulator buffers live in-place

        def split(x):
            y = x.reshape(a, x.shape[0] // a, *x.shape[1:])
            if mesh is not None and "data" in mesh.shape:
                spec = P(None, "data", *([None] * (y.ndim - 2)))
                y = jax.lax.with_sharding_constraint(
                    y, NamedSharding(mesh, spec))
            return y
        micro = jax.tree.map(split, batch)

        def body(carry, mb):
            l_acc, g_acc = carry
            l, g = jax.value_and_grad(loss, allow_int=True)(params, mb)
            return (l_acc + l,
                    jax.tree.map(jnp.add, g_acc, sanitize(g, params))), ()

        zeros = jax.tree.map(
            lambda p: jnp.zeros((), jnp.float32)
            if jnp.issubdtype(jnp.asarray(p).dtype, jnp.integer)
            else jnp.zeros_like(p), params)
        (l_sum, g_sum), _ = jax.lax.scan(body, (jnp.zeros(()), zeros),
                                         micro)
        inv = 1.0 / a
        return l_sum * inv, jax.tree.map(lambda g: g * inv, g_sum)

    def step(state, batch):
        params_in = state["params"]
        if params_to_device is not None:
            params_in = jax.device_put(params_in, params_to_device)
        l, grads = grad_fn(params_in, batch)
        gnorm = optax.global_norm(grads)
        # production guard (absent in the reference): skip the update when
        # the loss/grads go non-finite instead of poisoning the params.
        # NOT a lax.cond: a conditional cannot alias its operands into its
        # outputs, so XLA copies the full params+optimizer state through
        # the branch boundary (measured −20% on the 1.4B stage-2 step).
        # Instead: select-zero the grads (protects the moments from NaNs)
        # and select-zero the UPDATES — the update-select fuses into
        # apply_updates' add, so params are read+written exactly once and
        # a skipped step applies +0. The schedule count still advances on
        # a skipped step (HF Trainer parity: lr_scheduler.step() runs even
        # when the AMP/overflow optimizer step is skipped); the one
        # deviation is that a skipped step also decays the AdamW moments
        # once (zero-grad update) — benign for a rare overflow event.
        finite = jnp.isfinite(l) & jnp.isfinite(gnorm)
        opt_in = state["opt_state"]
        if opt_to_device is not None:
            opt_in = jax.device_put(opt_in, opt_to_device)
        if isinstance(opt, FusedAdamW):
            # guard + clip + AdamW + apply in one fusion per leaf
            params, opt_state = opt.apply(params_in, grads, opt_in,
                                          finite, gnorm)
        else:
            grads = jax.tree.map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
            updates, opt_state = opt.update(grads, opt_in, params_in)
            updates = jax.tree.map(
                lambda u: jnp.where(finite, u, jnp.zeros_like(u)),
                updates)
            params = optax.apply_updates(params_in, updates)
        if opt_to_host is not None:
            opt_state = jax.device_put(opt_state, opt_to_host)
        if params_to_host is not None:
            params = jax.device_put(params, params_to_host)
        new_state = {"params": params, "opt_state": opt_state,
                     "step": state["step"] + 1}
        return new_state, {"loss": l, "grad_norm": gnorm,
                           "skipped_nonfinite": 1.0 - finite.astype(
                               jnp.float32),
                           "step": state["step"] + 1}

    return step


def shard_batch_specs(batch, mesh: Mesh):
    """Data-parallel batch sharding (leading axis on 'data')."""
    def spec(x):
        return NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
    return jax.tree.map(spec, batch)
