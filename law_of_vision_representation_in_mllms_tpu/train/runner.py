"""Training runner: RunConfig -> stage-1/2 training loop.

The `deepspeed llava/train/train.py` + `scripts/v1_5/train/{pretrain,
finetune}.sh` equivalent as one function: build model/datasets from config,
jit the sharded train step, loop with the modality-grouped sampler, log
JSONL metrics, checkpoint via orbax (projector-only save in stage 1).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import RunConfig
from ..core.precision import DEFAULT_PRECISION, FP32_PRECISION
from ..data import (SupervisedDataset, FeatureDataset, collate_batch,
                    length_grouped_indices, get_template, SimpleTokenizer)
from ..io.checkpoint import (save_train_state, save_projector,
                             latest_checkpoint, restore_train_state,
                             load_projector)
from ..models import llama, llava
from ..models.towers import parse_tower_spec
from ..models.tower_runtime import make_diffusion_apply
from ..parallel import make_mesh
from ..train import (TrainConfig, make_train_step, init_train_state,
                     init_sharded_train_state)
from ..train.train_step import param_shardings, shard_batch_specs
from ..utils import MetricsLogger, rank0_print


def build_tokenizer(cfg: RunConfig):
    if cfg.model.tokenizer:
        from transformers import AutoTokenizer
        return AutoTokenizer.from_pretrained(cfg.model.tokenizer)
    # the hash-tokenizer fallback must emit ids inside the decoder's vocab
    # (a tiny decoder has vocab 256; 32000-range labels would be ignored)
    vocab = llama.tiny().vocab_size if cfg.model.decoder == "tiny" else 32000
    return SimpleTokenizer(vocab_size=vocab)


def build_model(cfg: RunConfig, rng=None):
    import dataclasses
    tower_kw = dict(up_ft_index=cfg.model.up_ft_index, t=cfg.model.t,
                    ensemble_size=cfg.model.ensemble_size)
    if cfg.model.img_size:
        tower_kw["img_size"] = cfg.model.img_size
    spec = parse_tower_spec(cfg.model.vision_tower, **tower_kw)
    if cfg.model.tower_attn_impl:
        # e.g. xla_expclamp_fused — the measured-fastest CLIP path
        # (opt-in; ops.attention.mha_expnomax documents the exactness
        # condition)
        spec = dataclasses.replace(spec, entries=[
            dataclasses.replace(
                e, vit_config=dataclasses.replace(
                    e.vit_config, attn_impl=cfg.model.tower_attn_impl))
            if e.kind == "vit" else e
            for e in spec.entries])
    if cfg.model.tower_fast_act:
        # erf-GELU -> tanh-GELU substitution (core/config.py rationale);
        # only towers whose hidden_act is the exact erf "gelu" change
        spec = dataclasses.replace(spec, entries=[
            dataclasses.replace(
                e, vit_config=dataclasses.replace(
                    e.vit_config, hidden_act="gelu_tanh"))
            if e.kind == "vit" and e.vit_config.hidden_act == "gelu"
            else e
            for e in spec.entries])
    if cfg.model.diffusion_attn_impl:
        # same opt-in for the UNet/DiT towers (+14% SD1.5@768 featurize);
        # trace-time switch — set before any diffusion tower is jitted
        from ..models.diffusion_blocks import set_attn_impl
        set_attn_impl(cfg.model.diffusion_attn_impl)

    # ported tower weights (model.tower_weights, one path per entry).
    # Diffusion bundles carry their architecture in the .json sidecar; the
    # entry's token grid / channel width are recomputed from it so tiny
    # test models and non-default harvests get correct splice shapes.
    tower_params = [None] * len(spec.entries)
    overrides = {}
    paths = cfg.model.tower_weights or []
    if paths and len(paths) != len(spec.entries):
        raise ValueError(
            f"model.tower_weights has {len(paths)} paths for "
            f"{len(spec.entries)} tower entries")
    if paths:
        from ..io.featurizer_bundle import load_featurizer_bundle
        from ..models import featurizer as F
        entries = list(spec.entries)
        for i, p in enumerate(paths):
            if not p:
                continue
            loaded, fcfg = load_featurizer_bundle(p)
            tower_params[i] = jax.tree.map(jnp.asarray, loaded)
            if fcfg is not None and entries[i].kind == "diffusion":
                fcfg = dataclasses.replace(
                    fcfg, t=entries[i].t,
                    ensemble_size=entries[i].ensemble_size)
                overrides[entries[i].name] = fcfg
                grid = F.feature_grid(fcfg)
                entries[i] = dataclasses.replace(
                    entries[i], hidden_size=F.feature_dim(fcfg),
                    num_patches=grid * grid, img_size=fcfg.img_size,
                    up_ft_index=fcfg.up_ft_index)
        spec = dataclasses.replace(spec, entries=entries)

    if cfg.model.decoder == "vicuna-7b":
        dec = llama.vicuna_7b()
    elif cfg.model.decoder == "tiny":
        dec = llama.tiny()
    else:
        raise ValueError(f"unknown decoder {cfg.model.decoder}")
    if cfg.model.decoder_layers:
        dec = dataclasses.replace(dec, num_layers=cfg.model.decoder_layers)
    if cfg.model.decode_attn:
        dec = dataclasses.replace(dec, decode_attn=cfg.model.decode_attn)
    model_cfg = llava.LlavaConfig(
        tower_spec=spec, decoder=dec,
        projector_type=cfg.model.projector_type,
        select_layer=cfg.model.select_layer,
        select_feature=cfg.model.select_feature,
        featurizer_overrides=overrides or None,
        visual_keep=cfg.model.visual_keep,
        prune_score=cfg.model.prune_score,
        kv_quant=cfg.model.kv_quant)
    params = llava.init_params(rng or jax.random.PRNGKey(cfg.train.seed),
                               model_cfg)
    for i, tp in enumerate(tower_params):
        if tp is not None:
            params["towers"][i] = tp
    if cfg.model.checkpoint:
        path = latest_checkpoint(cfg.model.checkpoint) or \
            cfg.model.checkpoint
        state = restore_train_state(path, {"params": params})
        params = state["params"]
    if cfg.train.pretrain_mm_mlp_adapter:
        params["projector"] = jax.tree.map(
            jnp.asarray, load_projector(cfg.train.pretrain_mm_mlp_adapter))
    return model_cfg, params


def run_training(cfg: RunConfig) -> int:
    precision = DEFAULT_PRECISION if cfg.train.bf16 else FP32_PRECISION
    tokenizer = build_tokenizer(cfg)
    template = get_template("plain" if cfg.train.stage == 1
                            else cfg.model.conv_template)
    model_cfg, params = build_model(cfg)

    if cfg.data.feature_folder:
        ds = FeatureDataset(cfg.data.data_path, cfg.data.feature_folder,
                            template, tokenizer,
                            max_length=cfg.train.max_length)
    else:
        ds = SupervisedDataset(cfg.data.data_path, cfg.data.image_folder,
                               model_cfg.tower_spec, template, tokenizer,
                               pad_square=cfg.data.image_aspect_ratio
                               == "pad", max_length=cfg.train.max_length)

    mesh = make_mesh(n_data=cfg.parallel.n_data,
                     n_model=cfg.parallel.n_model,
                     n_seq=cfg.parallel.seq,
                     n_stage=cfg.parallel.pipeline)
    cp = pp = None
    if cfg.parallel.seq > 1:
        # spliced sequences pad to a seq-axis multiple inside loss_fn, so
        # any max_length works
        from ..ops.ring_attention import ContextParallel
        cp = ContextParallel(
            mesh, head_axis="model" if cfg.parallel.n_model > 1 else None)
    if cfg.parallel.pipeline > 1:
        from ..parallel.pipeline import PipelineParallel
        pp = PipelineParallel(mesh,
                              microbatches=cfg.parallel.pp_microbatches,
                              remat_ticks=cfg.parallel.pp_remat_ticks)
        if model_cfg.decoder.num_layers % pp.n_stages:
            raise ValueError(
                f"decoder layers {model_cfg.decoder.num_layers} must "
                f"divide over {pp.n_stages} pipeline stages")
        if cfg.train.batch_size % (pp.n_micro *
                                   max(1, cfg.train.grad_accum)):
            raise ValueError(
                f"batch_size {cfg.train.batch_size} must divide into "
                f"{pp.n_micro} pipeline microbatches (x grad_accum)")
    n_data = mesh.shape["data"]
    if cfg.train.batch_size % n_data:
        raise ValueError(f"batch_size {cfg.train.batch_size} must divide "
                         f"over the data axis ({n_data} ways)")
    steps_per_epoch = max(1, len(ds) // cfg.train.batch_size)
    total = steps_per_epoch * cfg.train.epochs
    if cfg.train.batch_size % max(1, cfg.train.grad_accum):
        raise ValueError("batch_size must divide by grad_accum")
    if cfg.train.grad_accum > 1 and \
            (cfg.train.batch_size // cfg.train.grad_accum) % n_data:
        raise ValueError(
            f"microbatch {cfg.train.batch_size // cfg.train.grad_accum} "
            f"must divide over the data axis ({n_data} ways)")
    if cfg.train.quantize_base:
        # QLoRA / quantized-frozen-base training (`train.py:908-932`
        # load_in_{4,8}bit + peft): the decoder must be frozen — the
        # integer weights cannot take gradient updates.
        if not (cfg.train.lora_enable or cfg.train.stage == 1):
            raise ValueError(
                "train.quantize_base requires a frozen decoder "
                "(stage 1 or lora_enable)")
        from ..ops.quant import quantize_decoder
        bits = {"int8": 8, "int4": 4}.get(cfg.train.quantize_base)
        if bits is None:
            raise ValueError(
                f"train.quantize_base must be int4/int8, got "
                f"{cfg.train.quantize_base!r}")
        params["decoder"] = quantize_decoder(params["decoder"], bits=bits)
    if cfg.train.lora_enable:
        from ..models.lora import LoraConfig, init_lora
        params["lora"] = init_lora(
            jax.random.PRNGKey(cfg.train.seed + 1), model_cfg.decoder,
            LoraConfig(rank=cfg.train.lora_r, alpha=cfg.train.lora_alpha))
    if cfg.train.switch_enable:
        from ..models.switch import init_switch
        params["switch"] = init_switch(
            jax.random.PRNGKey(cfg.train.seed + 2),
            model_cfg.decoder.hidden_size)
    tcfg = TrainConfig(stage=cfg.train.stage,
                       learning_rate=cfg.train.learning_rate,
                       weight_decay=cfg.train.weight_decay,
                       warmup_ratio=cfg.train.warmup_ratio,
                       total_steps=total,
                       remat=cfg.train.gradient_checkpointing,
                       remat_policy=cfg.train.remat_policy,
                       fused_optimizer=cfg.train.fused_optimizer,
                       grad_accum=cfg.train.grad_accum,
                       lora_rank=cfg.train.lora_r if cfg.train.lora_enable
                       else 0,
                       lora_alpha=cfg.train.lora_alpha,
                       switch_sigma=cfg.train.switch_sigma
                       if cfg.train.switch_enable else 0.0)
    if cfg.parallel.zero:
        state, opt, opt_dev, opt_host, p_dev, p_host = \
            init_sharded_train_state(
                params, tcfg, model_cfg, mesh, zero=cfg.parallel.zero,
                offload_opt_state=cfg.parallel.offload_opt_state,
                offload_params=cfg.parallel.offload_params,
                pipeline=pp is not None)
    else:
        params = jax.device_put(
            params, param_shardings(params, model_cfg, mesh,
                                    pipeline=pp is not None))
        state, opt = init_train_state(params, tcfg)
        opt_dev = opt_host = p_dev = p_host = None

    diffusion_apply = None
    if any(e.kind == "diffusion" for e in model_cfg.tower_spec.entries):
        diffusion_apply = make_diffusion_apply(
            precision=precision,
            config_overrides=model_cfg.featurizer_overrides)
    # donate the state: params/moments update in place (the old state is
    # dead the moment the step returns), halving train-state peak HBM —
    # at 1.4B stage-2 the non-donated step kept two full state copies
    # (~18 GB) live across the update and the optimizer pass measured
    # 2.3x slower (benchmarks/probe_train_decomp round-4 log). NOT with
    # host offload: donating pinned_host buffers trips jit's aliasing
    # ("memory kind mismatch" — the in-jit device_put round-trip means
    # the state was never two device copies there anyway).
    donate = (0,) if (opt_host is None and p_host is None) else ()
    step_fn = jax.jit(make_train_step(model_cfg, tcfg, opt, precision,
                                      diffusion_apply, opt_to_device=opt_dev,
                                      opt_to_host=opt_host,
                                      params_to_device=p_dev,
                                      params_to_host=p_host, mesh=mesh,
                                      cp=cp, pp=pp),
                      donate_argnums=donate)

    logger = MetricsLogger(cfg.train.output_dir, "train",
                           every=cfg.train.logging_steps)
    step = 0
    for epoch in range(cfg.train.epochs):
        if cfg.train.group_by_modality_length and hasattr(ds, "lengths"):
            order = length_grouped_indices(ds.lengths(),
                                           cfg.train.batch_size, 1,
                                           seed=cfg.train.seed + epoch)
        else:
            order = np.random.default_rng(
                cfg.train.seed + epoch).permutation(len(ds))

        def make_batch(sl):
            samples = [ds[int(i)] for i in sl]
            batch = collate_batch(samples, max_length=cfg.train.max_length)
            batch = {k: ([jnp.asarray(x) for x in v] if isinstance(v, list)
                         else jnp.asarray(v)) for k, v in batch.items()}
            return jax.device_put(batch, shard_batch_specs(batch, mesh))

        slices = [order[s:s + cfg.train.batch_size]
                  for s in range(0, len(order) - cfg.train.batch_size + 1,
                                 cfg.train.batch_size)]
        # batch N+1 decodes/collates on a host thread while step N runs on
        # device (the reference's DataLoader num_workers overlap)
        from ..utils.prefetch import map_prefetch
        for batch in map_prefetch(make_batch, slices, depth=2):
            state, metrics = step_fn(state, batch)
            step += 1
            logger.log(step, {"loss": metrics["loss"],
                              "grad_norm": metrics["grad_norm"],
                              "epoch": epoch})
            if step % cfg.train.save_steps == 0:
                save_train_state(cfg.train.output_dir, state, step,
                                 keep=cfg.train.save_total_limit or None)

    if cfg.train.stage == 1:
        save_projector(cfg.train.output_dir, state["params"]["projector"],
                       config={"mm_projector_type":
                               cfg.model.projector_type,
                               "mm_hidden_size":
                               model_cfg.tower_spec.mm_hidden_size},
                       proj_type=cfg.model.projector_type
                       if model_cfg.tower_spec.join != "mof" else None)
        rank0_print(f"stage-1 projector saved to {cfg.train.output_dir}")
    elif cfg.train.switch_enable:
        import os as _os
        from ..io.param_io import save_params as _save
        _save(_os.path.join(cfg.train.output_dir, "switch.npz"),
              jax.tree.map(np.asarray, state["params"]["switch"]))
        rank0_print(f"switch W saved to {cfg.train.output_dir}")
    elif cfg.train.lora_enable:
        # LoRA-split save (`train.py:1122-1132`): adapters + the non-LoRA
        # trainables (projector), NOT the frozen base
        import os as _os
        from ..io.param_io import save_params as _save
        _save(_os.path.join(cfg.train.output_dir, "lora_adapters.npz"),
              jax.tree.map(np.asarray, state["params"]["lora"]))
        save_projector(cfg.train.output_dir, state["params"]["projector"],
                       config={"lora_r": cfg.train.lora_r,
                               "lora_alpha": cfg.train.lora_alpha})
        rank0_print(f"LoRA adapters saved to {cfg.train.output_dir}")
    else:
        save_train_state(cfg.train.output_dir, state, step)
    logger.close()
    return 0
