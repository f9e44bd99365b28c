"""Benchmark suite (BASELINE.json metric families): vision-tower
images/sec/chip across the ViT zoo, A-score wall-clock (Pallas vs XLA),
C-score PCK wall-clock, and LLaVA greedy-decode samples/sec.

Run on the real TPU chip: `python benchmarks/run_all.py [--quick]`.
Writes benchmarks/results.json and prints one JSON record per metric.

Measurement notes for this environment (axon relay): execution is deferred
until data is fetched, identical dispatches can be cached, so every
iteration varies its inputs and the loop ends with a scalar fetch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def _timed(fn, warm_args, iter_args, fetch):
    fetch(fn(*warm_args))
    t0 = time.perf_counter()
    out = None
    for args in iter_args:
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / len(iter_args)


V5E_PEAK_TFLOPS = 197.0          # bf16
# A100 torch-eager basis (same method as BASELINE.md's CLIP 300 img/s
# estimate): torch eager inference lands at ~40% of the A100's 312 TFLOP/s
# bf16 peak on conv/attention backbones => per-family baseline img/s =
# 125 TFLOP/s / (FLOPs per image from XLA cost analysis).
A100_EAGER_TFLOPS = 0.40 * 312.0


def _cost_flops(jitted, *args):
    """Total FLOPs of one call via XLA cost analysis (None on failure)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _perf_fields(rec, flops_per_call, dt, imgs_per_call=None):
    """Attach tflops_s / mfu / vs_baseline to a throughput record
    (VERDICT r2 #5: per-family accounting, not just CLIP)."""
    if not flops_per_call:
        return rec
    tflops_s = flops_per_call / dt / 1e12
    rec["tflops_s"] = round(tflops_s, 1)
    rec["mfu"] = round(tflops_s / V5E_PEAK_TFLOPS, 3)
    if imgs_per_call and rec.get("unit", "").startswith("images/sec"):
        flops_per_img = flops_per_call / imgs_per_call
        a100_est = A100_EAGER_TFLOPS * 1e12 / flops_per_img
        rec["a100_eager_est_img_s"] = round(a100_est, 1)
        rec["vs_baseline"] = round(rec["value"] / a100_est, 2)
    return rec


def bench_towers(results, quick=False):
    import jax
    import jax.numpy as jnp
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        BF16_TOWER_PRECISION)
    from law_of_vision_representation_in_mllms_tpu.models.vit import (
        VIT_PRESETS, ViTTower)

    prec = BF16_TOWER_PRECISION
    names = ["openai/clip-vit-large-patch14-336",
             "openai/clip-vit-large-patch14",
             "google/siglip-base-patch16-224",
             "facebook/dinov2-large",
             "laion/CLIP-ViT-L-14-laion2B-s32B-b82K"]
    if quick:
        names = names[:1]
    # LVR_TOWER_NAMES: comma-separated substring filter over the zoo;
    # LVR_TOWER_BATCH: per-dispatch batch (batch-scaling studies for the
    # short-sequence towers whose b64 dispatches underfill the MXU)
    name_filter = os.environ.get("LVR_TOWER_NAMES")
    if name_filter:
        keys = [k.strip() for k in name_filter.split(",") if k.strip()]
        names = [n for n in names if any(k in n for k in keys)]
    batch = int(os.environ.get("LVR_TOWER_BATCH", "64"))
    iters = 4 if quick else 10
    rng = np.random.RandomState(0)
    # LVR_TOWER_ATTN measures the whole zoo with the production fast-path
    # opt-in (`model.tower_attn_impl`); rows get a metric suffix
    tower_attn = os.environ.get("LVR_TOWER_ATTN")
    # LVR_TOWER_ACT=gelu_tanh measures the fast-act opt-in
    # (model.tower_fast_act; only erf-gelu towers substitute)
    tower_act = os.environ.get("LVR_TOWER_ACT")
    sfx = f"_{tower_attn}" if tower_attn else ""
    if tower_act:
        sfx += f"_{tower_act}"
    if batch != 64:
        sfx += f"_b{batch}"
    for name in names:
        cfg = VIT_PRESETS[name]()
        if tower_attn:
            import dataclasses as _dc
            cfg = _dc.replace(cfg, attn_impl=tower_attn)
        if tower_act and cfg.hidden_act == "gelu":
            import dataclasses as _dc
            cfg = _dc.replace(cfg, hidden_act=tower_act)
        tower = ViTTower(cfg, select_layer=-2,
                         select_feature="cls_patch"
                         if "siglip" in name else "patch", precision=prec)
        px = jnp.asarray(rng.randn(batch, cfg.image_size, cfg.image_size, 3)
                         .astype(np.float32))
        v = jax.jit(tower.init)(jax.random.PRNGKey(0), px)
        v = jax.tree.map(lambda x: x.astype(jnp.bfloat16), v)
        fn = jax.jit(lambda vv, p: tower.apply(vv, p))
        dt = _timed(lambda p: fn(v, p), (px,),
                    [(px * (1.01 + 0.003 * i),) for i in range(iters)],
                    lambda o: float(jnp.sum(o)))
        row = _perf_fields(
            {"metric": f"tower_throughput/{name}{sfx}",
             "value": round(batch / dt, 2),
             "unit": "images/sec/chip"},
            _cost_flops(fn, v, px), dt, imgs_per_call=batch)
        if ("siglip" in name and tower_attn == "xla_expclamp_fused"
                and batch == 64 and not tower_act):
            # the decomposition below was derived for the official b=64
            # exact-act row only; the b256/b512 and gelu_tanh variants
            # have their own (unanalyzed) gaps — don't stamp them
            row["note"] = (
                "per-family speed-of-light, documented (benchmarks/"
                "README.md 'Round-4 ViT-zoo decomposition'): "
                "non-attention matmuls at 85% MFU, [196,64] D=64 "
                "attention dots at the small-head-dim batched-dot "
                "device ceiling (bounded by three independent flash "
                "implementations, rounds 2-3), softmax residue is one "
                "irreducible exp round-trip; the residual vs_baseline "
                "gap is lane padding an eager GPU kernel never pays at "
                "this shape")
        results.append(row)


def bench_diffusion(results, quick=False):
    """Single-pass diffusion featurization throughput at REAL production
    architectures (random weights — throughput is weight-value-independent).
    This is the reference's heaviest per-step compute: a full VAE-encode +
    backbone pass per training step (`llava_arch.py:260-286`,
    `dift_sd.py:157-188`)."""
    import jax
    import jax.numpy as jnp
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        BF16_TOWER_PRECISION)
    from law_of_vision_representation_in_mllms_tpu.models import (
        featurizer as F)
    from law_of_vision_representation_in_mllms_tpu.models import unet as UN
    from law_of_vision_representation_in_mllms_tpu.models import vae as VA
    from law_of_vision_representation_in_mllms_tpu.models import dit as DT
    from law_of_vision_representation_in_mllms_tpu.models import mmdit as MM

    prec = BF16_TOWER_PRECISION
    fams = ["runwayml/stable-diffusion-v1-5",
            "stabilityai/stable-diffusion-xl-base-1.0",
            "facebook/DiT-XL-2-512",
            "stabilityai/stable-diffusion-3-medium-diffusers"]
    if quick:
        fams = fams[:1]
    pick = os.environ.get("LVR_BENCH_FAMILY")
    if pick:
        fams = [f for f in fams if pick in f]
    batch = 8
    iters = 2 if quick else 4
    rng0 = jax.random.PRNGKey(0)
    np_rng = np.random.RandomState(4)
    for name in fams:
        cfg = F.FEATURIZER_PRESETS[name]()
        short = name.split("/")[-1]
        px = jnp.asarray(np_rng.rand(batch, cfg.img_size, cfg.img_size, 3)
                         .astype(np.float32) * 2 - 1)
        lat_hw = cfg.img_size // (2 ** (len(cfg.vae.block_out_channels) - 1))
        latents = jnp.zeros((1, lat_hw, lat_hw, cfg.vae.latent_channels),
                            jnp.bfloat16)
        params = {"vae": jax.jit(VA.VAEEncoder(cfg.vae, prec).init)(
            rng0, px[:1])["params"]}
        if cfg.family == "dit":
            mod = DT.DiTHarvest(cfg.dit, (cfg.up_ft_index,), prec)
            params["backbone"] = jax.jit(mod.init)(rng0, latents, 1)["params"]
        elif cfg.family == "sd3":
            mod = MM.MMDiTHarvest(cfg.mmdit, (cfg.up_ft_index,), prec)
            ctx = jnp.zeros((1, 333, cfg.mmdit.context_dim), jnp.bfloat16)
            pooled = jnp.zeros((1, cfg.mmdit.pooled_dim), jnp.bfloat16)
            params["backbone"] = jax.jit(mod.init)(rng0, latents, 1, ctx, pooled)["params"]
            params["prompt_embeds"] = ctx
            params["pooled"] = pooled
        else:
            mod = UN.UNetHarvest(cfg.unet, (cfg.up_ft_index,), prec)
            ctx = jnp.zeros((1, 77, cfg.unet.cross_attention_dim),
                            jnp.bfloat16)
            params["backbone"] = jax.jit(mod.init)(rng0, latents, 1, ctx)["params"]
            params["prompt_embeds"] = ctx
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

        # The HEADLINE measurement runs the PRODUCTION attention impl —
        # `lvr make-config` emits diffusion_attn_impl=xla_expclamp_fused
        # for every diffusion rep (round-3 ViT winner applied to
        # diffusion_blocks._attn, which reaches UNet AND DiT/MMDiT) —
        # while the exact-softmax path and (for >=4096-token
        # self-attention, e.g. SD1.5@768's 96x96 blocks) the Pallas
        # flash "auto" routing are recorded as secondary fields. The
        # FLOP basis for mfu/vs_baseline stays the EXACT program's
        # cost analysis: the A100-eager baseline runs exact softmax,
        # and the fused path's ones-column trick must not inflate its
        # own denominator.
        fn = jax.jit(lambda p, x: F.extract_features(
            p, cfg, x, deterministic=True, precision=prec))
        exact_flops = _cost_flops(fn, params, px)
        if cfg.family in ("sd", "imsd", "sdxl"):
            # max self-attention seq = latent res at the first UNet
            # level that HAS attention (SDXL's level 0 is attn-free)
            lvl0 = next(i for i, h in enumerate(cfg.unet.num_heads)
                        if h is not None)
            max_seq = (lat_hw // (2 ** lvl0)) ** 2
        else:  # dit/sd3 patchify 2x2 -> seq 1024 at 512px
            pc = cfg.dit if cfg.family == "dit" else cfg.mmdit
            max_seq = (lat_hw // pc.patch_size) ** 2
        impls = ["xla_expclamp_fused", None]        # None = exact
        if os.environ.get("LVR_DIFFUSION_FAST", "1") != "1":
            impls = [None]
        if max_seq >= 4096 and len(impls) > 1:
            impls.append("auto")
        rec = None
        for j, impl in enumerate(impls):
            if impl is not None:
                os.environ["LVR_DIFFUSION_ATTN"] = impl
            try:
                fnj = (fn if impl is None else
                       jax.jit(lambda p, x: F.extract_features(
                           p, cfg, x, deterministic=True, precision=prec)))
                dtj = _timed(
                    lambda x: fnj(params, x), (px,),
                    [(px * (1.01 + 0.01 * j - 0.002 * i),)
                     for i in range(iters)],
                    lambda o: float(jnp.sum(o.astype(jnp.float32))))
            finally:
                if impl is not None:
                    del os.environ["LVR_DIFFUSION_ATTN"]
            if rec is None:
                rec = _perf_fields(
                    {"metric": f"diffusion_featurize/{short}",
                     "value": round(batch / dtj, 2),
                     "unit": "images/sec/chip",
                     "img_size": cfg.img_size,
                     "attn_impl": impl or "exact"},
                    exact_flops, dtj, imgs_per_call=batch)
            else:
                key = (impl.removeprefix("xla_") if impl else "exact")
                rec[key + "_img_s"] = round(batch / dtj, 2)
        results.append(rec)


def bench_a_score(results, quick=False):
    import jax.numpy as jnp
    from law_of_vision_representation_in_mllms_tpu.metrics.a_score import (
        a_score_pairwise)
    from law_of_vision_representation_in_mllms_tpu.ops.a_score_pallas import (
        max_cos_pallas)

    n, s, d = (20, 576, 4096) if quick else (100, 576, 4096)
    rng = np.random.RandomState(1)
    t_arr = jnp.asarray(rng.randn(n, s, d).astype(np.float32))
    a_arr = jnp.asarray(rng.randn(n, s, d).astype(np.float32))
    for name, fn in (("pallas", lambda x: max_cos_pallas(x, a_arr)),
                     ("xla", lambda x: a_score_pairwise(x, a_arr))):
        dt = _timed(fn, (t_arr,),
                    [(t_arr * (1.01 + 0.01 * i),) for i in range(5)],
                    lambda o: float(o.sum()))
        results.append({"metric": f"a_score_100x576x4096/{name}",
                        "value": round(1000 * dt * (100 / n), 3),
                        "unit": "ms/protocol-run"})


def bench_c_score(results, quick=False):
    import jax.numpy as jnp
    from law_of_vision_representation_in_mllms_tpu.metrics.c_score import (
        compute_pck_batch)

    pairs, p, c, npatch = (10, 576, 768, 24) if quick else (50, 576, 768, 24)
    rng = np.random.RandomState(2)
    d1 = jnp.asarray(rng.randn(pairs, p, c).astype(np.float32))
    d2 = jnp.asarray(rng.randn(pairs, p, c).astype(np.float32))
    kps = jnp.asarray((rng.rand(pairs, 20, 2) * 800).astype(np.float32))
    vis = jnp.ones((pairs, 20), bool)
    thr = jnp.full((pairs,), 500.0)

    def fn(x):
        res, _ = compute_pck_batch(x, d2, kps, kps, vis, thr,
                                   num_patches=npatch, anno_size=840)
        return res.per_img
    dt = _timed(fn, (d1,), [(d1 * (1.01 + 0.01 * i),) for i in range(5)],
                lambda o: float(o.sum()))
    results.append({"metric": f"c_score_pck_{pairs}pairs",
                    "value": round(1000 * dt, 2), "unit": "ms/batch"})


def bench_decode(results, quick=False):
    import jax
    import jax.numpy as jnp
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        Precision)
    from law_of_vision_representation_in_mllms_tpu.models import llama, llava
    from law_of_vision_representation_in_mllms_tpu.models.splice import (
        IMAGE_TOKEN_INDEX)

    prec = Precision(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    dec = llama.LlamaConfig(vocab_size=32000, hidden_size=2048,
                            intermediate_size=5632, num_layers=16,
                            num_heads=16, num_kv_heads=16)
    cfg = llava.LlavaConfig.build("openai/clip-vit-large-patch14-336",
                                  decoder=dec)
    # LVR_TOWER_ATTN=xla_expclamp_fused measures the composite with the
    # production fast-tower opt-in (`model.tower_attn_impl`) — the same
    # knob `lvr eval`/`lvr serve` expose.
    tower_attn = os.environ.get("LVR_TOWER_ATTN")
    if tower_attn:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, tower_spec=_dc.replace(
            cfg.tower_spec, entries=[
                _dc.replace(e, vit_config=_dc.replace(
                    e.vit_config, attn_impl=tower_attn))
                if e.kind == "vit" else e
                for e in cfg.tower_spec.entries]))
    params = llava.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    b, l, new = 8, 64, 16
    rng = np.random.RandomState(3)
    ids = rng.randint(1, 32000, size=(b, l)).astype(np.int32)
    ids[:, 0] = IMAGE_TOKEN_INDEX
    px = jnp.asarray(rng.randn(b, 336, 336, 3).astype(np.float32))

    def make_gen(n_new):
        @jax.jit
        def gen(p, i, pxv):
            return llava.generate_greedy(p, cfg, i, jnp.ones_like(i, bool),
                                         [pxv], max_new_tokens=n_new,
                                         eos_id=2, precision=prec)
        return gen
    gen16 = make_gen(new)
    iters = 3 if quick else 6
    dt = _timed(lambda pxv: gen16(params, jnp.asarray(ids), pxv), (px,),
                [(px * (1.01 + 0.01 * i),) for i in range(iters)],
                lambda o: int(o[0, 0]))
    sfx = f"_{tower_attn}" if tower_attn else ""
    results.append({"metric": "llava_1p4b_generate_b8_new16" + sfx,
                    "value": round(b / dt, 2), "unit": "samples/sec"})
    # NOTE: this metric amortizes the ViT forward + 640-token prefill over
    # only 16 generated tokens — it is a *short-answer eval-loop* metric,
    # not a decode-speed metric (kept for round-over-round comparability)
    results.append({"metric": "llava_1p4b_decode_tok_s" + sfx,
                    "value": round(b * new / dt, 1), "unit": "tokens/sec"})
    # pure decode throughput: marginal cost of 48 extra tokens
    gen64 = make_gen(64)
    dt64 = _timed(lambda pxv: gen64(params, jnp.asarray(ids), pxv), (px,),
                  [(px * (1.01 + 0.01 * i),) for i in range(iters)],
                  lambda o: int(o[0, 0]))
    per_step = (dt64 - dt) / 48
    results.append({"metric": "llava_1p4b_pure_decode_tok_s" + sfx,
                    "value": round(b / per_step, 1), "unit": "tokens/sec"})


def bench_visual_prune(results, quick=False):
    """Composite eval-loop throughput with opt-in visual-token pruning
    (`LlavaConfig.visual_keep`) at keep=288/144 of 576 tokens — the same
    1.4B model/workload as bench_decode's llava_1p4b_generate_b8_new16.
    Measured (v5e-1): none 47.2 -> 288: 60.9 (+29%) -> 144: 74.8 (+59%)
    samples/sec."""
    import jax
    import jax.numpy as jnp
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        Precision)
    from law_of_vision_representation_in_mllms_tpu.models import llama, llava
    from law_of_vision_representation_in_mllms_tpu.models.splice import (
        IMAGE_TOKEN_INDEX)

    prec = Precision(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    dec = llama.LlamaConfig(vocab_size=32000, hidden_size=2048,
                            intermediate_size=5632, num_layers=16,
                            num_heads=16, num_kv_heads=16)
    b, l, new = 8, 64, 16
    rng = np.random.RandomState(3)
    ids = rng.randint(1, 32000, size=(b, l)).astype(np.int32)
    ids[:, 0] = IMAGE_TOKEN_INDEX
    px = jnp.asarray(rng.randn(b, 336, 336, 3).astype(np.float32))
    keeps = (288,) if quick else (288, 144)
    for keep in keeps:
        cfg = llava.LlavaConfig.build("openai/clip-vit-large-patch14-336",
                                      decoder=dec, visual_keep=keep)
        params = llava.init_params(jax.random.PRNGKey(0), cfg)
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

        @jax.jit
        def gen(p, i, pxv, _cfg=cfg):
            return llava.generate_greedy(p, _cfg, i, jnp.ones_like(i, bool),
                                         [pxv], max_new_tokens=new,
                                         eos_id=2, precision=prec)
        iters = 3 if quick else 6
        dt = _timed(lambda pxv: gen(params, jnp.asarray(ids), pxv), (px,),
                    [(px * (1.01 + 0.01 * i),) for i in range(iters)],
                    lambda o: int(o[0, 0]))
        results.append({"metric": f"llava_1p4b_generate_b8_keep{keep}",
                        "value": round(b / dt, 2), "unit": "samples/sec"})


def bench_train(results, quick=False):
    """Stage-1 (projector-train, frozen tower+decoder weights) train-step
    throughput at 1.4B scale, b8 x 576-image+64-text tokens — the
    reference's per-step workload shape (`train.py` pretrain stage,
    batch 16/GPU). Reports trained tokens/sec/chip."""
    import jax
    import jax.numpy as jnp
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        Precision)
    from law_of_vision_representation_in_mllms_tpu.models import llama, llava
    from law_of_vision_representation_in_mllms_tpu.models.splice import (
        IGNORE_INDEX, IMAGE_TOKEN_INDEX)
    from law_of_vision_representation_in_mllms_tpu.train.train_step import (
        TrainConfig, init_train_state, make_train_step)

    prec = Precision(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    dec = llama.LlamaConfig(vocab_size=32000, hidden_size=2048,
                            intermediate_size=5632, num_layers=16,
                            num_heads=16, num_kv_heads=16)
    cfg = llava.LlavaConfig.build("openai/clip-vit-large-patch14-336",
                                  decoder=dec)
    # LVR_TOWER_ATTN=xla_expclamp_fused measures the training step with
    # the production fast-tower config (make-config default; the frozen
    # tower fwd is ~12% of stage-1 step FLOPs)
    tower_attn = os.environ.get("LVR_TOWER_ATTN")
    if tower_attn:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, tower_spec=_dc.replace(
            cfg.tower_spec, entries=[
                _dc.replace(e, vit_config=_dc.replace(
                    e.vit_config, attn_impl=tower_attn))
                if e.kind == "vit" else e
                for e in cfg.tower_spec.entries]))
    params = llava.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    # LVR_TRAIN_REMAT_POLICY=dots saves matmul outputs instead of block
    # boundaries: the backward skips the ~25%-of-step block-recompute
    # (the measured stage-2 MFU gap term — README round-4 accounting)
    rpol = os.environ.get("LVR_TRAIN_REMAT_POLICY", "block")
    # LVR_TRAIN_ACCUM=2: sequential microbatches inside one step — b/2
    # activation memory at the same global batch (lets remat=none fit)
    accum = int(os.environ.get("LVR_TRAIN_ACCUM", "1"))
    use_remat = rpol != "none"
    tcfg = TrainConfig(stage=1, learning_rate=1e-3, total_steps=100,
                       remat=use_remat, remat_policy=rpol,
                       use_flash=True, grad_accum=accum)
    state, opt = init_train_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, opt, prec),
                   donate_argnums=(0,))

    b, l = 8, 64
    rng = np.random.RandomState(5)
    ids = rng.randint(1, 32000, size=(b, l)).astype(np.int32)
    ids[:, 0] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :2] = IGNORE_INDEX
    px = jnp.asarray(rng.randn(b, 336, 336, 3).astype(np.float32))

    sref = [state]

    def one(pxv):
        batch = {"input_ids": jnp.asarray(ids),
                 "labels": jnp.asarray(labels),
                 "text_mask": jnp.ones((b, l), bool),
                 "pixel_values": [pxv]}
        # the step donates its input state; thread the new one through
        sref[0], metrics = step(sref[0], batch)
        return metrics
    iters = 2 if quick else 5
    dt = _timed(one, (px,),
                [(px * (1.01 + 0.01 * i),) for i in range(iters)],
                lambda m: float(m["loss"]))
    toks = b * (l - 1 + cfg.num_patches)   # spliced sequence length
    # ANALYTIC FLOPs (XLA cost analysis counts a lax.scan body ONCE, so
    # it under-reports the 16-layer scanned decoder ~4x — measured 24 vs
    # ~81 TFLOP/s). Decoder matmul params: per layer 4h^2 attn + 3hI
    # MLP, plus embed+unembed 2Vh; attention adds 4T^2h per layer-sample
    # fwd (QK^T + PV). Stage 1 (projector-only): tower fwd + decoder fwd
    # (2NP) + activation-grad backward (2NP; no weight grads for frozen
    # params). Stage 2: + weight-grad pass over decoder (6NP total).
    dh, di, dl, dv = (dec.hidden_size, dec.intermediate_size,
                      dec.num_layers, dec.vocab_size)
    n_dec = dl * (4 * dh * dh + 3 * dh * di) + 2 * dv * dh
    t_seq = l - 1 + cfg.num_patches
    attn_fwd = 4.0 * dl * t_seq * t_seq * dh * b
    tower_fwd = 0.382e12 * b            # CLIP-L-336 (BASELINE.md basis)
    f_fwd = 2.0 * n_dec * toks + attn_fwd
    flops_s1 = tower_fwd + 2 * f_fwd    # fwd + activation-grad bwd
    flops_s2 = tower_fwd + 3 * f_fwd    # + weight-grad pass
    results.append(_perf_fields(
        {"metric": "llava_1p4b_stage1_train_tok_s"
                   + ("" if rpol == "block" else f"_remat_{rpol}")
                   + ("" if accum == 1 else f"_accum{accum}"),
         "value": round(toks / dt, 1), "unit": "tokens/sec/chip",
         "flops_basis": "analytic (scan bodies undercounted by XLA "
                        "cost analysis)"},
        flops_s1, dt))

    # stage-2 full finetune (decoder+projector train, tower frozen) — the
    # reference's finetune.sh workload. Same shapes; bf16 AdamW moments
    # keep 1.4B params+moments+grads ~11 GB on one chip. Free the stage-1
    # state/program first: stage-2 peak (params+moments+grads+remat
    # activations) plus a live stage-1 state can RESOURCE_EXHAUST the chip.
    # The stage-1 step DONATES its state, so the original `params` buffers
    # are dead — recover the live params from the final state before
    # dropping it (moments/step are freed; params stay referenced).
    params = sref[0]["params"]
    del state, opt, step, one, sref
    tcfg2 = TrainConfig(stage=2, learning_rate=2e-5, total_steps=100,
                        remat=use_remat, remat_policy=rpol,
                        use_flash=True, grad_accum=accum)
    state2, opt2 = init_train_state(params, tcfg2)
    step2 = jax.jit(make_train_step(cfg, tcfg2, opt2, prec),
                    donate_argnums=(0,))

    sref2 = [state2]

    def one2(pxv):
        batch = {"input_ids": jnp.asarray(ids),
                 "labels": jnp.asarray(labels),
                 "text_mask": jnp.ones((b, l), bool),
                 "pixel_values": [pxv]}
        sref2[0], metrics = step2(sref2[0], batch)
        return metrics
    try:
        dt2 = _timed(one2, (px,),
                     [(px * (1.02 + 0.01 * i),) for i in range(iters)],
                     lambda m: float(m["loss"]))
    except Exception as e:
        if "RESOURCE_EXHAUSTED" in str(e):
            # stage-2 (params+moments+grads+activations) does not fit
            # under this remat/accum combination — a legitimate sweep
            # outcome (e.g. remat=none), not a suite failure
            print(f"stage-2 skipped (OOM) under remat={rpol} "
                  f"accum={accum}", file=sys.stderr)
            return
        raise
    results.append(_perf_fields(
        {"metric": "llava_1p4b_stage2_train_tok_s"
                   + ("" if rpol == "block" else f"_remat_{rpol}")
                   + ("" if accum == 1 else f"_accum{accum}"),
         "value": round(toks / dt2, 1),
         "unit": "tokens/sec/chip",
         "flops_basis": "analytic (scan bodies undercounted by XLA "
                        "cost analysis)"},
        flops_s2, dt2))


def bench_train_7b(results, quick=False):
    """Vicuna-7B QLoRA training measured on ONE v5e chip (VERDICT r4 #1).

    Reference workload: `llava/train/train.py:908-985` (load_in_4bit +
    peft LoRA r128/a256, `scripts/v1_5/train/finetune_lora.sh`) — the
    reference runs its 7B stages on 8 GPUs; here the int4 frozen base
    (3.35 GB packed) + LoRA/projector + remat fits ONE 16 GB chip.

    LVR_TRAIN7B_STAGE=1: projector-only over the quantized frozen base
    (pretrain.sh semantics); =2 (default): LoRA r128 + projector train
    (finetune_lora.sh). LVR_TRAIN_REMAT_POLICY sweeps block/dots/none.
    Explicit-only (`--only train7b`): ~3.4 GB init + multi-minute 7B
    train-step compile through the relay."""
    import jax
    import jax.numpy as jnp
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        Precision)
    from law_of_vision_representation_in_mllms_tpu.models import llama, llava
    from law_of_vision_representation_in_mllms_tpu.models.lora import (
        LoraConfig, init_lora)
    from law_of_vision_representation_in_mllms_tpu.models.splice import (
        IGNORE_INDEX, IMAGE_TOKEN_INDEX)
    from law_of_vision_representation_in_mllms_tpu.train.train_step import (
        TrainConfig, init_train_state, make_train_step)

    prec = Precision(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    tiny = bool(os.environ.get("LVR_TRAIN7B_TINY"))   # CPU smoke test
    if tiny:
        jax.config.update("jax_platforms", "cpu")
        dec = llama.LlamaConfig(vocab_size=512, hidden_size=256,
                                intermediate_size=512, num_layers=2,
                                num_heads=4, num_kv_heads=4)
        cfg = llava.LlavaConfig.build("debug/tiny-vit", decoder=dec)
    else:
        dec = llama.vicuna_7b()
        cfg = llava.LlavaConfig.build("openai/clip-vit-large-patch14-336",
                                      decoder=dec)
    # production tower fast path (make-config default)
    import dataclasses as _dc
    cfg = _dc.replace(cfg, tower_spec=_dc.replace(
        cfg.tower_spec, entries=[
            _dc.replace(e, vit_config=_dc.replace(
                e.vit_config, attn_impl="xla_expclamp_fused"))
            if e.kind == "vit" else e
            for e in cfg.tower_spec.entries]))
    stage = int(os.environ.get("LVR_TRAIN7B_STAGE", "2"))
    rpol = os.environ.get("LVR_TRAIN_REMAT_POLICY", "block")
    accum = int(os.environ.get("LVR_TRAIN_ACCUM", "1"))
    rank = 128 if stage == 2 else 0

    # tower + projector init dense bf16; the 7B base is born int4-packed
    # (never a 13.4 GB dense intermediate, same as the decode bench)
    params = llava.init_params(jax.random.PRNGKey(0), cfg, precision=prec,
                               init_decoder=False)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    params["decoder"] = _random_quant_decoder(dec, bits=4, group_size=128)
    if rank:
        params["lora"] = init_lora(jax.random.PRNGKey(1), dec,
                                   LoraConfig(rank=rank, alpha=256.0),
                                   dtype=jnp.bfloat16)
    tcfg = TrainConfig(stage=stage,
                       learning_rate=1e-3 if stage == 1 else 2e-4,
                       total_steps=100, remat=rpol != "none",
                       remat_policy=rpol, use_flash=True,
                       grad_accum=accum, lora_rank=rank, lora_alpha=256.0)
    state, opt = init_train_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, opt, prec),
                   donate_argnums=(0,))

    b = int(os.environ.get("LVR_TRAIN7B_B", "8" if not tiny else "2"))
    l = 64 if not tiny else 16
    isz = cfg.tower_spec.entries[0].vit_config.image_size
    rng = np.random.RandomState(7)
    ids = rng.randint(1, dec.vocab_size, size=(b, l)).astype(np.int32)
    ids[:, 0] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :2] = IGNORE_INDEX
    px = jnp.asarray(rng.randn(b, isz, isz, 3).astype(np.float32))
    sref = [state]

    def one(pxv):
        batch = {"input_ids": jnp.asarray(ids),
                 "labels": jnp.asarray(labels),
                 "text_mask": jnp.ones((b, l), bool),
                 "pixel_values": [pxv]}
        sref[0], metrics = step(sref[0], batch)
        return metrics

    iters = 2 if quick else 4
    try:
        dt = _timed(one, (px,),
                    [(px * (1.01 + 0.01 * i),) for i in range(iters)],
                    lambda m: float(m["loss"]))
    except Exception as e:
        if "RESOURCE_EXHAUSTED" in str(e):
            print(f"7B stage-{stage} OOM under remat={rpol} accum={accum} "
                  f"b={b}", file=sys.stderr)
            results.append({
                "metric": f"vicuna7b_qlora_stage{stage}_train_tok_s"
                          + ("" if rpol == "block" else f"_remat_{rpol}")
                          + ("" if b == 8 else f"_b{b}"),
                "error": f"RESOURCE_EXHAUSTED remat={rpol} accum={accum}"})
            return
        raise

    # loss trajectory on a (near-)fixed batch: the donated state threads
    # through, px varies at 1e-4 scale to defeat the relay's
    # identical-dispatch cache without moving the objective
    traj = []
    for i in range(6):
        traj.append(round(float(one(px * (1.0 + 1e-4 * i))["loss"]), 4))
    mem = {}
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        for k_src, k_dst in (("bytes_in_use", "hbm_gb_in_use"),
                             ("peak_bytes_in_use", "hbm_gb_peak")):
            if k_src in ms:
                mem[k_dst] = round(ms[k_src] / 2**30, 2)
    except Exception:
        pass

    toks = b * (l - 1 + cfg.num_patches)
    # useful-FLOPs basis (same accounting as bench_train; remat recompute
    # NOT counted): stage 1 = tower fwd + decoder fwd + activation-grad
    # bwd (no weight grads, everything but the projector is frozen);
    # stage 2 QLoRA adds only the adapter weight-grad/fwd terms — the
    # 6.7B base stays frozen so its weight-grad pass never runs
    dh, di, dl, dv = (dec.hidden_size, dec.intermediate_size,
                      dec.num_layers, dec.vocab_size)
    n_dec = dl * (4 * dh * dh + 3 * dh * di) + 2 * dv * dh
    t_seq = l - 1 + cfg.num_patches
    attn_fwd = 4.0 * dl * t_seq * t_seq * dh * b
    tower_fwd = 0.382e12 * b
    f_fwd = 2.0 * n_dec * toks + attn_fwd
    n_lora = 0
    if rank:
        dims = {"wq": (dh, dh), "wk": (dh, dh), "wv": (dh, dh),
                "wo": (dh, dh), "gate": (dh, di), "up": (dh, di),
                "down": (di, dh)}
        n_lora = dl * sum(rank * (a + c) for a, c in dims.values())
    flops = tower_fwd + 2 * f_fwd + 3 * (2.0 * n_lora * toks)
    row = {"metric": ("smoke_" if tiny else "")
                     + f"vicuna7b_qlora_stage{stage}_train_tok_s"
                     + ("" if rpol == "block" else f"_remat_{rpol}")
                     + ("" if accum == 1 else f"_accum{accum}")
                     + ("" if b == 8 else f"_b{b}"),
           "value": round(toks / dt, 1), "unit": "tokens/sec/chip",
           "flops_basis": "analytic useful-FLOPs (frozen int4 base: no "
                          "weight-grad pass; remat recompute excluded)",
           "loss_trajectory": traj, **mem}
    assert traj[-1] < traj[0], f"loss did not decrease: {traj}"
    results.append(_perf_fields(row, flops, dt))


def _random_quant_decoder(cfg, bits=8, group_size=128):
    """Random weight-only-quantized LLaMA decoder params (benchmarking:
    the matmul weights are initialized DIRECTLY as int8/int4 + scales
    in one program — no 13.4 GB dense intermediate ever exists)."""
    import jax
    import jax.numpy as jnp

    def _qinit(k):
        d, i, hd = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
        nh, nkv, L = cfg.num_heads, cfg.num_kv_heads, cfg.num_layers
        keys = jax.random.split(k, 10)

        def q(kk, *shape):
            if bits == 4:
                # packed nibbles (ops/quant leaf format): [..., di//2, do]
                pshape = shape[:-2] + (shape[-2] // 2, shape[-1])
                k1, k2 = jax.random.split(kk)
                lo = jax.random.randint(k1, pshape, -7, 8, jnp.int8)
                hi = jax.random.randint(k2, pshape, -7, 8, jnp.int8)
                packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF),
                                        jnp.left_shift(hi, 4))
                return {"q4": packed.astype(jnp.int8),
                        "scale": jnp.full(
                            shape[:-2] + (shape[-2] // group_size,
                                          shape[-1]), 4e-3, jnp.float32)}
            return {"q8": jax.random.randint(kk, shape, -127, 128,
                                             jnp.int8),
                    "scale": jnp.full(shape[:-2] + (1, shape[-1]),
                                      2e-4, jnp.float32)}

        return {
            "embed": jax.random.normal(
                keys[0], (cfg.vocab_size, d), jnp.bfloat16) * 0.02,
            "layers": {
                "wq": q(keys[1], L, d, nh * hd),
                "wk": q(keys[2], L, d, nkv * hd),
                "wv": q(keys[3], L, d, nkv * hd),
                "wo": q(keys[4], L, nh * hd, d),
                "gate": q(keys[5], L, d, i),
                "up": q(keys[6], L, d, i),
                "down": q(keys[7], L, i, d),
                "rms1": jnp.ones((L, d), jnp.bfloat16),
                "rms2": jnp.ones((L, d), jnp.bfloat16),
            },
            "final_norm": jnp.ones((d,), jnp.bfloat16),
            "lm_head": q(keys[8], d, cfg.vocab_size),
        }
    return jax.jit(_qinit)(jax.random.PRNGKey(0))


def _random_int8_decoder(cfg):
    """Back-compat alias (probe_decode_bw imports this name)."""
    return _random_quant_decoder(cfg, bits=8)


def bench_decode_7b(results, quick=False):
    """Flagship-scale (vicuna-7b) decoder on ONE v5e chip: 13.4 GB bf16
    params. Measures the 512-token flash prefill in-program, per-step
    decode via a host-driven loop (donated KV cache), and chunked decode
    with negotiated boundary layouts.

    The per-step host-loop number includes the axon relay's ~30 ms
    per-dispatch latency and is a LOWER bound. The chunked path
    (LVR_DECODE_CHUNK, default 8) amortizes that latency over the chunk;
    it requires the negotiated-layout compile — with default layouts the
    chunk program OOMs at 7B (benchmarks/README.md round-3 log). Run
    explicitly (`--only decode7b`)."""
    import jax
    import jax.numpy as jnp
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        Precision)
    from law_of_vision_representation_in_mllms_tpu.models import llama

    prec = Precision(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    cfg = llama.vicuna_7b()
    # LVR_DECODE_ATTN=pallas: flash-decode kernel (ops/decode_attention)
    # instead of the single-pass XLA formulation for the s==1 steps
    dattn = os.environ.get("LVR_DECODE_ATTN")
    if dattn:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, decode_attn=dattn)
    quant = os.environ.get("LVR_DECODE_QUANT", "")
    if quant in ("int8", "int4"):
        # weight-only int8/int4 decode (ops/quant.py): resident params
        # drop 13.4 -> ~6.9 / ~3.6 GB and the param-read floor shrinks
        # with them. Decode dynamics are identical to the dense bench
        # (random argmax walk).
        params = _random_quant_decoder(cfg, bits=4 if quant == "int4"
                                       else 8)
    else:
        params = jax.jit(
            lambda k: llama.init_params(k, cfg, jnp.bfloat16))(
                jax.random.PRNGKey(0))
    # batch 2 is the historical record; the decode step reads all 13.4 GB
    # of weights once per step regardless of batch, so tokens/sec scales
    # nearly linearly in b until the cache/activation term bites —
    # LVR_DECODE_B=8 measures that point
    b = int(os.environ.get("LVR_DECODE_B", "2"))
    # LVR_KV_QUANT=int8: int8 KV cache (ops/quant.quantize_kv) — at
    # b16/T545 the bf16 cache read is ~4.6 GB/step, rivaling the 6.7 GB
    # int8 param read; int8 codes halve it (the round-4 roofline's b8
    # bottleneck term). Composes with LVR_DECODE_QUANT.
    kvq = os.environ.get("LVR_KV_QUANT") or None
    # LVR_DECODE_L shrinks the prompt window: the same decode program
    # over a tiny cache isolates the per-step cache/attention term BY
    # MEASUREMENT (step@l512 - step@l48 = the T~545-slot read+attend
    # cost) instead of by roofline guesswork
    l = int(os.environ.get("LVR_DECODE_L", "512"))
    n_new = 33
    t_max = l + n_new
    rng = np.random.RandomState(3)
    ids = jnp.asarray(rng.randint(1, 32000, size=(b, l)).astype(np.int32))

    def _prefill(p, i):
        cache = llama.init_cache(cfg, b, t_max, jnp.bfloat16, quant=kvq)
        pos = jnp.broadcast_to(jnp.arange(l)[None], (b, l))
        valid = jnp.concatenate(
            [jnp.ones((b, l), bool), jnp.zeros((b, n_new), bool)], 1)
        emb = llama.embed_tokens(p, i, prec)
        h, cache = llama.forward(p, cfg, emb, pos, attn_mask=valid,
                                 cache=cache, cache_index=0,
                                 precision=prec, use_flash=True)
        tok = jnp.argmax(llama.logits_fn(p, h[:, -1:], prec)[:, -1],
                         -1).astype(jnp.int32)
        return cache, tok

    prefill = jax.jit(_prefill)

    iters = 2 if quick else 4
    qsuf = ((f"_{quant}" if quant else "") + ("_kv8" if kvq else "")
            + ({"pallas": "_pattn", "pallas_stacked": "_psattn"}
               .get(dattn or "", ""))
            + ("" if l == 512 else f"_l{l}"))
    dt = _timed(lambda i: prefill(params, i), (ids,),
                [(jnp.roll(ids, k, axis=1),) for k in range(1, iters + 1)],
                lambda o: int(o[1][0]))
    tflops = 2 * 6.74e9 * b * l / dt / 1e12
    results.append({"metric": f"vicuna7b_prefill512_b{b}_ms{qsuf}",
                    "value": round(dt * 1000, 1), "unit": "ms",
                    "tflops_s": round(tflops, 1)})

    import functools

    @functools.partial(jax.jit, donate_argnums=(1,))
    def one_step(p, cache, tok, t):
        # t is TRACED: the write index advances every call, so successive
        # dispatches are never byte-identical (the axon relay caches
        # identical dispatches — CLAUDE.md bench rule)
        e = llama.embed_tokens(p, tok[:, None], prec)
        sv = jnp.concatenate(
            [jnp.ones((b, l), bool),
             jnp.broadcast_to(jnp.arange(n_new)[None] <= t[:, None] - l,
                              (b, n_new))], 1)
        h, cache = llama.forward(p, cfg, e, t[:, None], attn_mask=sv,
                                 cache=cache, cache_index=t[0],
                                 precision=prec)
        nxt = jnp.argmax(llama.logits_fn(p, h, prec)[:, -1],
                         -1).astype(jnp.int32)
        return cache, nxt

    t_arr = jnp.full((b,), l, jnp.int32)
    if not quant:   # host-loop row is a relay-bound lower bound; skip
        cache, tok = prefill(params, ids)   # for int8 (compile budget)
        steps = 8 if quick else min(24, n_new - 1)
        # compile + warm at an offset OUTSIDE the measured 0..steps-1
        # range: after the re-prefill the cache/tok values repeat, so a
        # warm at t_arr+0 would make the first measured dispatch byte-
        # identical and the axon relay would serve it from cache
        cache, tok = one_step(params, cache, tok, t_arr + jnp.int32(steps))
        int(tok[0])
        cache, tok = prefill(params, ids)
        t0 = time.perf_counter()
        for i in range(steps):
            cache, tok = one_step(params, cache, tok,
                                  t_arr + jnp.int32(i))
        _ = int(tok[0])
        per_step = (time.perf_counter() - t0) / steps
        results.append({
            "metric": "vicuna7b_decode_step_hostloop_tok_s"
                      + ("" if b == 2 else f"_b{b}"),
            "value": round(b / per_step, 1), "unit": "tokens/sec",
            "note": "LOWER bound: includes axon relay per-dispatch latency "
                    "(param-read HBM roofline = 61 steps/s); superseded by "
                    "the negotiated-layout chunked path below"})

    # ---- chunked decode (VERDICT r2 #2): fixed small scan per dispatch,
    # compiled with NEGOTIATED boundary layouts (models/layouts.py). With
    # default layouts XLA hoists whole-tensor layout-conversion copies of
    # the stacked wq/wk/wv (3x1 GB) plus both KV-cache halves out of the
    # token loop and the program OOMs at compile (benchmarks/README.md
    # round-3 log). AUTO boundary layouts drop those temps to zero; the
    # live params are relaid out once (consuming each source buffer) and
    # prefill is pinned to the same formats.
    chunk = int(os.environ.get("LVR_DECODE_CHUNK", "8"))
    from jax import lax
    from jax.experimental.layout import Format, Layout
    from law_of_vision_representation_in_mllms_tpu.models import (
        layouts as LY)

    def chunk_steps(p, cache, tok, t0):
        def body(carry, i):
            cache, tok = carry
            t = t0 + i
            e = llama.embed_tokens(p, tok[:, None], prec)
            sv = jnp.concatenate(
                [jnp.ones((b, l), bool),
                 jnp.broadcast_to(jnp.arange(n_new)[None] <= t[:, None] - l,
                                  (b, n_new))], 1)
            h, cache = llama.forward(p, cfg, e, t[:, None], attn_mask=sv,
                                     cache=cache, cache_index=t[0],
                                     precision=prec)
            nxt = jnp.argmax(llama.logits_fn(p, h, prec)[:, -1],
                             -1).astype(jnp.int32)
            return (cache, nxt), tok
        (cache, tok), toks = lax.scan(body, (cache, tok),
                                      jnp.arange(chunk))
        return cache, tok, jnp.transpose(toks)

    try:
        p_shapes = LY.shape_spec(params)
        cache_s = jax.eval_shape(
            lambda: llama.init_cache(cfg, b, t_max, jnp.bfloat16,
                                     quant=kvq))
        sds = jax.ShapeDtypeStruct
        # LVR_CHUNK_CACHE_AUTO=0 pins the KV cache to its default layout
        # (only the params negotiate): XLA then hoists the 545 MB cache
        # conversions inside the program (they fit; the 3 GB weight
        # copies were the OOM) — measured because the AUTO cache layout
        # (0,2,3,1,4) may pessimize the per-step update/read.
        cache_auto = os.environ.get("LVR_CHUNK_CACHE_AUTO", "1") == "1"
        c_spec = Format(Layout.AUTO) if cache_auto else None
        chunk_c = jax.jit(
            chunk_steps, donate_argnums=(1,),
            in_shardings=(LY.auto_spec(p_shapes), c_spec, None, None),
            out_shardings=(c_spec, None, None),
        ).lower(p_shapes, cache_s, sds((b,), jnp.int32),
                sds((b,), jnp.int32)).compile()
        p_fmts = chunk_c.input_formats[0][0]
        c_fmts = chunk_c.input_formats[0][1] if cache_auto else None
        prefill_pinned = jax.jit(
            _prefill, in_shardings=(p_fmts, None),
            out_shardings=(c_fmts, None),
        ).lower(p_shapes, sds((b, l), jnp.int32)).compile()
        params = LY.relayout(params, p_fmts, consume=True)

        cache, tok = prefill_pinned(params, ids)
        n_chunks = max(1, (n_new - 1) // chunk)
        # warm at an offset outside the measured {0, chunk, 2*chunk, ...}
        # set: after the re-prefill the cache/tok values repeat, so a warm
        # at t_arr+0 would make the measured ci=0 dispatch byte-identical
        # and the axon relay would serve it from cache (CLAUDE.md rule)
        cache, tok, _ = chunk_c(params, cache, tok, t_arr + jnp.int32(1))
        int(tok[0])
        cache, tok = prefill_pinned(params, ids)
        t0c = time.perf_counter()
        for ci in range(n_chunks):
            cache, tok, toks = chunk_c(params, cache, tok,
                                       t_arr + jnp.int32(ci * chunk))
        _ = int(tok[0])
        per_tok = (time.perf_counter() - t0c) / (n_chunks * chunk)
        results.append({
            "metric": "vicuna7b_decode_chunked_tok_s"
                      + ("" if b == 2 else f"_b{b}") + qsuf
                      + ("" if cache_auto else "_cachedef"),
            "value": round(b / per_tok, 1), "unit": "tokens/sec",
            "chunk": chunk,
            "cache_layout": "auto" if cache_auto else "default",
            "note": f"{chunk}-step in-program scan per dispatch, "
                    "negotiated boundary layouts (wq/wk/wv relaid "
                    "contracting-dim-minor, models/layouts.py); relay "
                    f"latency amortized {chunk}x vs the host loop"})
    except Exception as e:  # noqa: BLE001 — record compile-budget failures
        results.append({
            "metric": "vicuna7b_decode_chunked_tok_s"
                      + ("" if b == 2 else f"_b{b}") + qsuf, "value": None,
            "unit": "tokens/sec", "chunk": chunk,
            "note": ("chunked scan failed to compile: "
                     f"{type(e).__name__}: {str(e)[:300]}")})


def bench_speculative(results, quick=False):
    """Prompt-lookup speculative decode at 1.4B (models/speculative.py):
    greedy-equivalent output, multiple tokens per parameter read. Two
    workloads: copy-heavy (512-token prompt of repeated 32-grams — the
    OCR/doc-VQA regime prompt lookup targets) and random (worst case,
    speculation never accepts). tokens/sec counts NEW tokens over the
    whole call (prefill included); `rounds` = verification forwards
    actually run. Compare llava_1p4b_pure_decode_tok_s (1725 = 74% of
    the param-read roofline) — acceptance >1 token/round beats the
    roofline by construction."""
    import jax
    import jax.numpy as jnp
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        Precision)
    from law_of_vision_representation_in_mllms_tpu.models import llama
    from law_of_vision_representation_in_mllms_tpu.models.speculative \
        import decode_prompt_lookup

    prec = Precision(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    # LVR_SPEC_7B=1: the flagship-scale speculative row (VERDICT r3 #2)
    # — vicuna-7B with negotiated boundary layouts (the same AUTO-layout
    # AOT contract as the 7B chunk program; default layouts hoist 3 GB
    # of weight conversions out of the verify loop) and weight-only int8
    # under LVR_DECODE_QUANT=int8.
    spec_7b = os.environ.get("LVR_SPEC_7B", "0") == "1"
    if spec_7b:
        dec = llama.vicuna_7b()
        q = os.environ.get("LVR_DECODE_QUANT", "")
        if q in ("int8", "int4"):
            params = _random_quant_decoder(dec, bits=4 if q == "int4"
                                           else 8)
        else:
            params = jax.jit(
                lambda k: llama.init_params(k, dec, jnp.bfloat16))(
                    jax.random.PRNGKey(0))
        b = int(os.environ.get("LVR_DECODE_B", "4"))
    else:
        dec = llama.LlamaConfig(vocab_size=32000, hidden_size=2048,
                                intermediate_size=5632, num_layers=16,
                                num_heads=16, num_kv_heads=16)
        params = llama.init_params(jax.random.PRNGKey(0), dec,
                                   jnp.bfloat16)
        b = 8
    l, new, g = 512, 128, 8
    rng = np.random.RandomState(7)
    base = rng.randint(3, 32000, size=32)
    rep = np.tile(base, l // 32)[None].repeat(b, 0).astype(np.int32)
    rand = rng.randint(3, 32000, size=(b, l)).astype(np.int32)

    iters = 2 if quick else 4
    # LVR_KV_QUANT=int8: int8 KV cache inside the speculative loop (the
    # verify forward writes/reads the quantized cache; composes with
    # LVR_DECODE_QUANT weight quant, same contract as bench_decode_7b)
    kvq = os.environ.get("LVR_KV_QUANT") or None
    if spec_7b:
        from law_of_vision_representation_in_mllms_tpu.models import (
            layouts as LY)

        def fn(p, ids):
            return decode_prompt_lookup(
                p, dec, ids, max_new_tokens=new, draft_len=g,
                eos_id=-1, precision=prec, kv_quant=kvq)
        sds = jax.ShapeDtypeStruct
        spec_c = jax.jit(
            fn, in_shardings=(LY.auto_spec(LY.shape_spec(params)), None),
        ).lower(LY.shape_spec(params),
                sds((b, l), jnp.int32)).compile()
        params = LY.relayout(params, spec_c.input_formats[0][0],
                             consume=True)
        runner = spec_c
    else:
        runner = lambda p, ids: decode_prompt_lookup(  # noqa: E731
            p, dec, ids, max_new_tokens=new, draft_len=g,
            eos_id=-1, precision=prec, kv_quant=kvq)
    workloads = (("copyheavy", rep),) if spec_7b \
        else (("copyheavy", rep), ("random", rand))
    for tag, ids_np in workloads:
        def run(ids):
            out, rounds = runner(params, ids)
            return out, rounds
        # vary prompt VALUES per iteration (relay value-cache rule);
        # shifting preserves the repetition structure
        variants = [jnp.asarray((ids_np + 17 * (i + 1)) % 31990 + 3)
                    for i in range(iters + 1)]
        out, rounds = run(variants[0])
        int(out[0, 0])
        t0 = time.perf_counter()
        rr = []
        for v in variants[1:]:
            out, rounds = run(v)
            rr.append(rounds)
        int(out[0, 0])
        dt = (time.perf_counter() - t0) / iters
        mean_rounds = float(np.mean([int(r) for r in rr]))
        qv = os.environ.get("LVR_DECODE_QUANT", "")
        qsuf = f"_{qv}" if (spec_7b and qv in ("int8", "int4")) else ""
        if kvq == "int8":
            qsuf += "_kv8"
        results.append({
            "metric": (f"vicuna7b_spec_decode_{tag}_tok_s_b{b}{qsuf}"
                       if spec_7b
                       else f"llava_1p4b_spec_decode_{tag}_tok_s"),
            "value": round(b * new / dt, 1), "unit": "tokens/sec",
            "rounds_per_128_tokens": round(mean_rounds, 1),
            "note": f"prompt-lookup speculation, draft_len 8, b{b}, "
                    "512-tok prompt + 128 new (prefill included in the "
                    "denominator); greedy-equivalent output"
                    + ("; negotiated boundary layouts" if spec_7b
                       else "")})

    # NOTE: a FULL-llava speculative composite (tower + splice + prefill
    # + while_loop decode in one jit) exceeds this environment's remote
    # compile budget at 1.4B (>30 min; the same limitation as the 7B
    # in-program decode scan, see bench_decode_7b). The llava-path
    # speculation (`llava.generate_speculative`) is exact-parity tested
    # on CPU (tests/test_speculative.py); its on-chip benefit is bounded
    # by the decoder-level numbers above since tower+prefill are
    # speculation-invariant.


def bench_serve(results, quick=False):
    """End-to-end SERVING throughput: the 1.4B LLaVA behind `lvr serve`'s
    HTTP server (dynamic batching, window 50 ms), driven by 8 concurrent
    clients with distinct prompts. Measures the full production path —
    HTTP parse -> image decode -> batch coalescing -> tower+prefill+16-token
    decode -> JSON response — against the raw in-process generate number
    (llava_1p4b_generate_b8_new16). Explicit-only (`--only serve`)."""
    import json as _json
    import threading
    import urllib.request
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        Precision)
    from law_of_vision_representation_in_mllms_tpu.data import (
        SimpleTokenizer, get_template)
    from law_of_vision_representation_in_mllms_tpu.eval.llava_adapter \
        import LlavaLMM
    from law_of_vision_representation_in_mllms_tpu.models import llama, llava
    from law_of_vision_representation_in_mllms_tpu.serve import LMMServer

    prec = Precision(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    # LVR_SERVE_7B=1: the FLAGSHIP-scale serving row (VERDICT r3 #10) —
    # vicuna-7B decoder behind the inflight engine with negotiated
    # layouts (the 7B contract) and weight-only int8 (6.9 GB resident;
    # bf16 params + slot cache would not fit the 16 GB chip next to the
    # tower). 4 slots, 16-token budgets.
    serve_7b = os.environ.get("LVR_SERVE_7B", "0") == "1"
    if serve_7b:
        dec = llama.vicuna_7b()
    else:
        dec = llama.LlamaConfig(vocab_size=32000, hidden_size=2048,
                                intermediate_size=5632, num_layers=16,
                                num_heads=16, num_kv_heads=16)
    cfg = llava.LlavaConfig.build("openai/clip-vit-large-patch14-336",
                                  decoder=dec)
    if serve_7b:
        params = llava.init_params(jax.random.PRNGKey(0), cfg,
                                   init_decoder=False)
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        params["decoder"] = _random_int8_decoder(dec)
    else:
        params = llava.init_params(jax.random.PRNGKey(0), cfg)
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    # LVR_SERVE_BACKEND selects the decode backend behind the server —
    # the same `model.gen_backend` knob `lvr serve` exposes — so the
    # chunked/speculative gains are measured on the shipped serving path
    # (VERDICT r2 #3), not only in decoder microbenchmarks.
    backend = os.environ.get("LVR_SERVE_BACKEND", "greedy")
    # LVR_SERVE_INFLIGHT=1 serves through the continuous-batching slot
    # engine (models/inflight.py, `lvr serve --inflight`) instead of the
    # wave batcher — 8 slots so the 8 concurrent clients all decode
    # simultaneously with per-slot positions.
    inflight = os.environ.get("LVR_SERVE_INFLIGHT", "0") == "1" or serve_7b
    # LVR_SERVE_PREFIX=1: inflight + prompt-KV caching under a CANNED
    # workload — each client re-sends its own fixed prompt+image every
    # round (the retry / shared-system-prompt serving case), so warm
    # rounds populate the store and measured rounds admit via pure KV
    # installs (zero prefill/tower work; `lvr serve --prefix-cache`).
    prefix = os.environ.get("LVR_SERVE_PREFIX", "0") == "1"
    inflight = inflight or prefix
    lmm = LlavaLMM(params, cfg, SimpleTokenizer(), get_template("v1"),
                   precision=prec, batch_size=8, gen_backend=backend,
                   negotiate_layouts=serve_7b)
    srv = LMMServer(lmm, model_name="vicuna-7b" if serve_7b
                    else "llava-1.4b", port=0,
                    max_batch=8, batch_window_ms=50, inflight=inflight,
                    inflight_kwargs={"n_slots": 4 if serve_7b else 8,
                                     "prompt_cap": 64,
                                     "gen_cap": 16, "chunk": 4,
                                     "prefix_cache": 64 if prefix else 0}
                    if inflight else None)
    srv.start_background()

    import base64
    from io import BytesIO
    rng = np.random.RandomState(11)
    canned = {}

    def post(i, round_id):
        if prefix and i in canned:
            b64, text = canned[i]            # exact repeat -> store hit
        else:
            img = Image.fromarray(
                rng.randint(0, 255, (336, 336, 3), dtype=np.uint8))
            buf = BytesIO()
            img.save(buf, format="PNG")
            b64 = base64.b64encode(buf.getvalue()).decode()
            # distinct prompt + image per request (relay value-cache
            # rule; decode dispatches still vary via cache/rng state)
            text = (f"describe item {i} now" if prefix
                    else f"describe item {round_id}-{i} now")
            canned[i] = (b64, text)
        payload = {"max_tokens": 16, "messages": [{"role": "user",
                   "content": [
                       {"type": "text", "text": text},
                       {"type": "image_url", "image_url": {
                           "url": f"data:image/png;base64,{b64}"}}]}]}
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/chat/completions",
            data=_json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            return _json.loads(r.read())

    def fire_round(n, round_id):
        outs = [None] * n

        def hit(i):
            outs[i] = post(i, round_id)
        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # a failed request would time the error path, not the model
        assert all(o and o.get("choices") for o in outs), \
            f"serve round {round_id} had failed requests: {outs}"

    fire_round(8, 0)     # compile + warm
    fire_round(8, 1)     # warm relay
    rounds = 2 if quick else 4
    t0 = time.perf_counter()
    for r in range(rounds):
        fire_round(8, 2 + r)
    dt = (time.perf_counter() - t0) / rounds
    if prefix:
        st = srv.worker.engine.stats()
        # the measured rounds must actually have admitted from the store
        assert st["prefix_hits"] >= 8 * rounds, st
    srv.shutdown()
    results.append({"metric": ("vicuna7b_serve_http_samples_s_int8"
                               if serve_7b
                               else "llava_1p4b_serve_http_samples_s")
                              + ("" if backend == "greedy"
                                 else f"_{backend}")
                              + ("_prefix_cache" if prefix else
                                 "_inflight" if inflight else ""),
                    "value": round(8 / dt, 2), "unit": "samples/sec",
                    "note": "8 concurrent HTTP clients, dynamic batching "
                            "(window 50 ms), 16 new tokens; compare "
                            "llava_1p4b_generate_b8_new16. LOWER bound in "
                            "this environment: each HTTP round is a fresh "
                            "host-side dispatch through the axon relay "
                            "(~0.3-0.5 s latency), the same artifact as "
                            "the 7B host-loop decode note"})




def bench_pipeline(results, quick=False):
    """The production law pipeline END-TO-END through the real CLI on
    the TPU (VERDICT r4 #3) — one driver-visible artifact for the chain
    the reference runs as ~6 manual tools (`run_embed_extract.sh:1-44`,
    README.md:137-160):

      lvr extract-features  (CLIP-L-336 + CLIP-L-224 + SD1.5 bundle)
      lvr extract-embeds    (each rep -> post-projector 4096-dim dumps)
      lvr a-score           (reps vs CLIP-336/224 anchors)
      lvr c-score           (each rep's SPair PCK)
      lvr policy fit        (AC table assembled from the run's scores)

    Every phase is a SUBPROCESS of `python -m ...cli` — the actual user
    entrypoint, not library calls. Towers are REAL production
    architectures with random weights (no checkpoints in this env; each
    phase's numerics have their own HF goldens — this artifact claims
    the CHAIN executes on-chip, with per-phase wall-clock). The decoder
    is vicuna-WIDTH (hidden 4096 -> true LLM embedding space) at depth 2
    via model.decoder_layers: the embed/a/c phases never run decoder
    blocks, and 13.4 GB of unused random blocks would just burn init
    time. make-config's production tower opts are set (fused attention;
    fast-act stays off here — CLIP/SD don't default it). The clamp
    guard (ops/clamp_guard.py) rides the fused tower path as in
    production.

    LVR_PIPELINE_TINY=1: debug towers + tiny torch-SD bundle, CPU
    (pre-flight smoke; row prefixed smoke_, not merged by the driver).
    Explicit-only (`--only pipeline`)."""
    import shutil
    import subprocess
    import tempfile
    import yaml
    from PIL import Image

    tiny = bool(os.environ.get("LVR_PIPELINE_TINY"))
    # LVR_PIPELINE_REPS subsets the rep list (e.g. "clip,clip224" drops
    # the SD phases — the heaviest compiles — on degraded-relay days;
    # every CLI phase still executes). clip+clip224 minimum: they are
    # the A-score anchors.
    reps = [r for r in
            os.environ.get("LVR_PIPELINE_REPS", "clip,clip224,sd"
                           ).split(",") if r]
    assert {"clip", "clip224"} <= set(reps), reps
    root = tempfile.mkdtemp(prefix="lvr_pipeline_")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tests"))
    from test_spair import _make_synthetic_spair

    env = dict(os.environ)
    if tiny:
        env["LVR_PLATFORM"] = "cpu"

    def cli(*args, timeout=3600):
        t0 = time.perf_counter()
        r = subprocess.run([sys.executable, "-m",
                            "law_of_vision_representation_in_mllms_tpu.cli",
                            *args], cwd=repo, env=env,
                           capture_output=True, text=True, timeout=timeout)
        dt = time.perf_counter() - t0
        # full phase output to a debug log: the driver row truncates the
        # error to ~200 chars, which buried the first on-chip failure
        with open("/tmp/lvr_pipeline_phase.log", "a") as f:
            f.write(f"\n=== lvr {' '.join(args)} rc={r.returncode} "
                    f"{dt:.1f}s\n{r.stdout[-4000:]}\n{r.stderr[-8000:]}\n")
        if r.returncode != 0:
            raise RuntimeError(
                f"lvr {args[0]} rc={r.returncode}: {r.stderr[-2000:]}")
        return dt, r.stdout

    # ---- workspace: SPair tree + benchmark task + configs -------------
    rng = np.random.RandomState(0)
    spair = f"{root}/SPair-71k"
    n_pairs = 3 if tiny else 4
    _make_synthetic_spair(spair, n_pairs=n_pairs)
    isz = (64, 48) if tiny else (512, 384)
    for i in range(2 * n_pairs):
        arr = rng.randint(0, 255, (12, 9, 3)).astype(np.uint8)
        Image.fromarray(arr).resize(isz, Image.BILINEAR).save(
            f"{spair}/JPEGImages/cat/img{i}.jpg")
    bench_dir = f"{root}/bench"
    os.makedirs(bench_dir, exist_ok=True)
    docs = []
    n_docs = 4 if tiny else 8
    for i in range(n_docs):
        arr = rng.randint(0, 255, (12, 9, 3)).astype(np.uint8)
        Image.fromarray(arr).resize(isz, Image.BILINEAR).save(
            f"{bench_dir}/b{i}.jpg")
        docs.append({"image": f"b{i}.jpg", "question": f"color {i}?",
                     "options": ["red", "blue"], "answer": "A"})
    with open(f"{bench_dir}/q.json", "w") as f:
        json.dump(docs, f)
    task = f"{bench_dir}/task.yaml"
    with open(task, "w") as f:
        yaml.safe_dump({
            "task": "pipe_bench", "dataset_path": f"{bench_dir}/q.json",
            "dataset_backend": "json", "image_root": bench_dir,
            "output_type": "generate_until",
            "doc_to_text": "mmbench_en.doc_to_text",
            "doc_to_visual": "common.doc_to_visual",
            "process_results": "mmbench_en.process_results",
            "aggregation": "mean",
            "generation_kwargs": {"max_new_tokens": 4}}, f)

    # SD bundle: REAL production architecture (SD1.5 UNet+VAE presets),
    # random weights, saved through the real bundle IO
    if tiny:
        import pathlib
        from test_diffusion_cli import _write_bundle
        bundle, fcfg = _write_bundle(pathlib.Path(root))
        grids = {"clip": 4, "clip224": 4, "sd": 16}   # tiny-vit extracts
        # at 28px (processor_for_tower) -> 4x4 patch grid
        towers = {"clip": "debug/tiny-vit", "clip224": "debug/tiny-vit",
                  "sd": "runwayml/stable-diffusion-v1-5"}
        dec = {"decoder": "tiny"}
    else:
        from law_of_vision_representation_in_mllms_tpu.models import (
            featurizer as F)
        # the bundle's random params are built ON CPU IN A SUBPROCESS:
        # the driver must never init the axon backend itself — its CLI
        # phases are TPU subprocesses and the tunnel serves one process
        # at a time (the first on-chip pipeline run failed this way)
        bundle = f"{root}/sd15.npz"
        if "sd" in reps:
            r = subprocess.run([sys.executable, "-m",
                                "benchmarks._build_sd_bundle", bundle],
                               cwd=repo, capture_output=True, text=True,
                               timeout=1800)
            if r.returncode != 0:
                raise RuntimeError(f"bundle build: {r.stderr[-1500:]}")
        fcfg = F.FEATURIZER_PRESETS["runwayml/stable-diffusion-v1-5"]()
        grids = {"clip": 24, "clip224": 16, "sd": F.feature_grid(fcfg)}
        towers = {"clip": "openai/clip-vit-large-patch14-336",
                  "clip224": "openai/clip-vit-large-patch14",
                  "sd": "runwayml/stable-diffusion-v1-5"}
        dec = {"decoder": "vicuna-7b", "decoder_layers": 2}

    cfgs = {}
    for r in reps:
        m = {"vision_tower": towers[r], **dec}
        if r == "sd":
            m["tower_weights"] = [bundle]
            if not tiny:
                m["diffusion_attn_impl"] = "xla_expclamp_fused"
        elif not tiny:
            m["tower_attn_impl"] = "xla_expclamp_fused"
        cfgs[r] = f"{root}/{r}.yaml"
        with open(cfgs[r], "w") as f:
            yaml.safe_dump({"model": m, "train": {"bf16": not tiny}}, f)

    phases = {}
    scores = {}

    # ---- 1. offline feature extraction (SPair images, per rep) --------
    # batch sizes match the zoo/diffusion benches' shapes (b64 ViT /
    # b8 SD): on a degraded-relay day a NEW program shape can take
    # >60 min to compile (attempt 3 timed out exactly there), while
    # matching shapes can hit the relay's persistent compile cache.
    # Timeout 7200: compile variance per CLAUDE.md, observed worse.
    for r in reps:
        bs = "4" if tiny else ("8" if r == "sd" else "64")
        dt, _ = cli("extract-features", "--config", cfgs[r],
                    "--images", f"{spair}/JPEGImages/cat",
                    "--out-dir", f"{root}/feats_{r}", "--batch-size", bs,
                    timeout=7200)
        phases[f"extract_features_{r}_s"] = round(dt, 1)

    # ---- 2. A-score embedding dumps (per rep + anchor roles) ----------
    for r in reps:
        dt, _ = cli("extract-embeds", "--config", cfgs[r], "--task", task,
                    "--out-dir", f"{root}/embeds/{r}_t",
                    "--limit", str(n_docs), timeout=7200)
        phases[f"extract_embeds_{r}_s"] = round(dt, 1)
    # anchors: the CLIP-336/224 dumps under their anchor names
    shutil.copytree(f"{root}/embeds/clip_t", f"{root}/embeds/clip336")
    shutil.copytree(f"{root}/embeds/clip224_t", f"{root}/embeds/clip224")

    # ---- 3. A score ----------------------------------------------------
    dt, out = cli("a-score", "--base-folder", f"{root}/embeds",
                  "--reps", *[f"{r}_t" for r in reps],
                  "--n-images", str(n_docs))
    phases["a_score_s"] = round(dt, 1)
    a_scores = json.loads(out)
    scores["a"] = a_scores
    # identity sanity: the clip reps ARE their own anchors — both must
    # dominate the unrelated SD rep (when SD is in the rep subset)
    if "sd" in reps:
        assert min(a_scores["clip_t"], a_scores["clip224_t"]) \
            >= a_scores["sd_t"] - 1e-6, a_scores

    # ---- 4. C score (per rep) ------------------------------------------
    c_scores = {}
    for r in reps:
        dt, out = cli("c-score", "--spair-dir", spair,
                      "--feature-dir", f"{root}/feats_{r}",
                      "--num-patches", str(grids[r]),
                      "--anno-size", "840" if not tiny else "64",
                      "--categories", "cat")
        phases[f"c_score_{r}_s"] = round(dt, 1)
        c_scores[r] = 100.0 * json.loads(out)["per_img_pck"][0]
    scores["c"] = c_scores

    # ---- 5. policy fit on the run's own assembled AC table ------------
    from law_of_vision_representation_in_mllms_tpu.policy.data import (
        ACTable, BENCHMARKS, write_ac_csv)
    perf = {b: np.asarray([50.0 + 3.0 * i + 0.1 * len(b)
                           for i in range(len(reps))])
            for b in BENCHMARKS}   # synthetic perf: fit mechanics only
    table = ACTable(
        models=reps,
        perf=perf,
        a={b: np.asarray([a_scores[f"{r}_t"] for r in reps])
           for b in BENCHMARKS},
        c=np.asarray([c_scores[r] for r in reps]))
    csv_path = f"{root}/ac.csv"
    write_ac_csv(csv_path, table)
    dt, out = cli("policy", "fit", "--csv", csv_path,
                  "--benchmark", "mme")
    phases["policy_fit_s"] = round(dt, 1)
    scores["policy_fit"] = out.strip()

    row = {"metric": ("smoke_" if tiny else "") + "pipeline_e2e_tpu",
           "value": round(sum(phases.values()), 1), "unit": "s total",
           "phases": phases, "scores": scores,
           "note": "full law chain through `python -m ...cli` "
                   "subprocesses on " + ("CPU (tiny smoke)" if tiny else
                   "the real chip") + "; production towers, random "
                   "weights (numerics golden-tested separately)"}
    results.append(row)
    print(json.dumps(row), flush=True)
    shutil.rmtree(root, ignore_errors=True)


def bench_serve_hetero(results, quick=False):
    """Heterogeneous serving workload (VERDICT r3 #3): Poisson arrivals,
    mixed prompt lengths and token budgets, measured per-request latency
    (p50/p95) AND throughput on the shipped HTTP path. This is the
    workload the inflight scheduler exists for — a short request must
    not wait out a long neighbour. LVR_SERVE_MODE selects
    wave | inflight | inflight_prefix (one process per mode; explicit
    `--only serve_hetero`). All modes replay the SAME seeded schedules:
    LVR_HETERO_N requests per seed (default 24; the statistical rows use
    200) x LVR_HETERO_SEEDS (comma list, default "17"), exp(0.15 s)
    inter-arrival, text lengths 4-48 words, budgets {8,16,32}, one
    shared image with a shared system preamble — in prefix mode the
    preamble makes every admission after the first a partial-prefix (or
    full) store hit. Reports per-seed p50/p95/p99 + throughput and the
    cross-seed mean/min/max (VERDICT r4 weak #6: the round-4 row was one
    24-request single-seed run). LVR_HETERO_7B=1 serves vicuna-7B with
    weight-only int8 + negotiated layouts (4 slots) instead of the
    1.4B."""
    import base64
    import json as _json
    import threading
    import urllib.request
    from io import BytesIO
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        Precision)
    from law_of_vision_representation_in_mllms_tpu.data import (
        SimpleTokenizer, get_template)
    from law_of_vision_representation_in_mllms_tpu.eval.llava_adapter \
        import LlavaLMM
    from law_of_vision_representation_in_mllms_tpu.models import (
        llama, llava)
    from law_of_vision_representation_in_mllms_tpu.serve import LMMServer

    mode = os.environ.get("LVR_SERVE_MODE", "inflight")
    # LVR_HETERO_TINY=1: CPU smoke of the full control path (server,
    # warmup, schedule replay, prefix-hit assertion) on a tiny model —
    # run before burning TPU tunnel time on an untested flow
    tiny = os.environ.get("LVR_HETERO_TINY", "0") == "1"
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    prec = Precision(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    hetero_7b = os.environ.get("LVR_HETERO_7B", "0") == "1"
    if tiny:
        dec = llama.LlamaConfig(vocab_size=1024, hidden_size=64,
                                intermediate_size=128, num_layers=2,
                                num_heads=4, num_kv_heads=4)
        cfg = llava.LlavaConfig.build("debug/tiny-vit", decoder=dec)
    elif hetero_7b:
        dec = llama.vicuna_7b()
        cfg = llava.LlavaConfig.build("openai/clip-vit-large-patch14-336",
                                      decoder=dec)
        # int8 KV cache: at 7B every prefix-store entry is a full
        # prompt-length KV row (l_out_max=767 -> ~800 MB in bf16, ~400 MB
        # int8) and the first hetero run OOM'd mid-warmup filling a
        # 64-entry bf16 store next to the 6.7 GB int8 weights; int8 cache
        # + the 4-entry LRU below keep the store ~1.6 GB. Partial-prefix
        # hits only need ONE stored entry sharing the preamble, so a
        # small LRU does not cost hits.
        import dataclasses as _dc
        cfg = _dc.replace(cfg, kv_quant="int8")
    else:
        dec = llama.LlamaConfig(vocab_size=32000, hidden_size=2048,
                                intermediate_size=5632, num_layers=16,
                                num_heads=16, num_kv_heads=16)
        cfg = llava.LlavaConfig.build("openai/clip-vit-large-patch14-336",
                                      decoder=dec)
    if hetero_7b:
        # int8 weights (6.9 GB resident: bf16 would not fit next to the
        # slot cache) + negotiated layouts — the 7B serving contract
        params = llava.init_params(jax.random.PRNGKey(0), cfg,
                                   init_decoder=False)
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        params["decoder"] = _random_int8_decoder(dec)
    else:
        params = llava.init_params(jax.random.PRNGKey(0), cfg)
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    inflight = mode != "wave"
    n_slots = 4 if hetero_7b else 8
    lmm = LlavaLMM(params, cfg, SimpleTokenizer(), get_template("v1"),
                   precision=prec, batch_size=n_slots,
                   gen_backend="greedy", negotiate_layouts=hetero_7b)
    srv = LMMServer(lmm, model_name="vicuna-7b" if hetero_7b
                    else "llava-1.4b", port=0,
                    max_batch=n_slots, batch_window_ms=50,
                    inflight=inflight,
                    inflight_kwargs={"n_slots": n_slots,
                                     "prompt_cap": 192,
                                     "gen_cap": 32, "chunk": 4,
                                     "prefix_cache":
                                         64 if mode == "inflight_prefix"
                                         else 0,
                                     # 7B: bound the store by BYTES (the
                                     # production bound) — ~400 MB per
                                     # int8 row, so 2 GB ≈ 5 entries;
                                     # partial hits need only one
                                     "prefix_cache_bytes":
                                         2 << 30 if hetero_7b else 0,
                                     "prefix_block": 64}
                    if inflight else None)
    srv.start_background()

    rng = np.random.RandomState(17)
    img = Image.fromarray(rng.randint(0, 255, (336, 336, 3),
                                      dtype=np.uint8))
    buf = BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    # long enough that the shared spliced prefix (template preamble +
    # 576-token image span + this text) clears the NEXT prefix_block=64
    # boundary past the image span — partial matches must round down to
    # a position beyond idx_img + num_patches (inflight.py constraint)
    system = ("you are a careful and precise visual assistant that "
              "answers with short factual statements about the provided "
              "picture and never speculates beyond what is visible "
              "always keep answers brief plain and grounded in the "
              "image content describe objects colors counts spatial "
              "relations and any legible text exactly as seen")

    n = int(os.environ.get("LVR_HETERO_N", "12" if quick else "24"))
    seeds = [int(x) for x in
             os.environ.get("LVR_HETERO_SEEDS", "17").split(",")]

    def schedule(seed):
        r = np.random.RandomState(seed)
        return (r.randint(4, 49, size=n),          # mixed prompt lengths
                r.choice([8, 16, 32], size=n),     # mixed token budgets
                np.cumsum(r.exponential(0.15, size=n)))  # Poisson arrivals

    def payload(i, tag, words, budgets):
        q = " ".join(f"w{(i * 7 + j) % 53}" for j in range(words[i]))
        # image part FIRST (llava convention): the spliced image span +
        # shared preamble form the common KV prefix the partial-prefix
        # store reuses (inflight._match_partial_prefix requires the
        # image inside the shared part)
        return {"max_tokens": int(budgets[i]),
                "messages": [{"role": "user", "content": [
                    {"type": "image_url", "image_url": {
                        "url": f"data:image/png;base64,{b64}"}},
                    {"type": "text",
                     "text": f"{system}\n{tag}{i} {q}"}]}]}

    def post(pl):
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/chat/completions",
            data=_json.dumps(pl).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=600) as r:
                return _json.loads(r.read())
        except urllib.error.HTTPError as e:
            # surface the server-side error message (the 400 body) —
            # without this the first 7B OOM showed up as 18 opaque
            # "Bad Request" tracebacks
            body = e.read().decode(errors="replace")[:500]
            raise RuntimeError(f"HTTP {e.code}: {body}") from None

    # compile + warm every program shape OUTSIDE the measured window:
    # the engine buckets prompt lengths, so sweep the word-length range
    # at every budget (covers all buckets any seed can hit), twice for
    # the relay
    warm_words = np.asarray([4, 12, 20, 28, 36, 48] * 3)
    warm_budgets = np.asarray([8, 16, 32]).repeat(6)
    for tag in ("warm-a-", "warm-b-"):
        threads = [threading.Thread(
            target=post, args=(payload(i, tag, warm_words, warm_budgets),))
            for i in range(len(warm_words))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    per_seed = []
    for seed in seeds:
        words, budgets, arrivals = schedule(seed)
        lat = [None] * n
        errs = []

        def client(i, t0):
            wait = t0 + arrivals[i] - time.perf_counter()
            if wait > 0:
                time.sleep(wait)
            s0 = time.perf_counter()
            try:
                out = post(payload(i, f"run{seed}-", words, budgets))
                assert out.get("choices")
            except Exception as e:  # noqa: BLE001
                errs.append((i, e))
                return
            lat[i] = time.perf_counter() - s0

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(i, t0))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        assert not errs, errs[:3]
        lat_arr = np.asarray([l for l in lat if l is not None])
        per_seed.append({
            "seed": seed, "samples_s": round(n / dt, 2),
            "p50_s": round(float(np.percentile(lat_arr, 50)), 2),
            "p95_s": round(float(np.percentile(lat_arr, 95)), 2),
            "p99_s": round(float(np.percentile(lat_arr, 99)), 2),
            "mean_s": round(float(lat_arr.mean()), 2)})

    stats = srv.worker.engine.stats() if inflight else {}
    if mode == "inflight_prefix":
        # the shared preamble + image must actually reuse stored KV
        assert stats.get("prefix_hits", 0) \
            + stats.get("partial_hits", 0) >= len(seeds) * (n - 1), stats
    srv.shutdown()

    def agg(key):
        v = [ps[key] for ps in per_seed]
        out = {key: round(float(np.mean(v)), 2)}
        if len(v) > 1:
            out[key.replace("_s", "_minmax_s")] = [min(v), max(v)]
        return out

    row_sink = [] if tiny else results     # tiny smoke: print, don't persist
    row = {"metric": ("llava_7b_int8_serve_hetero_" if hetero_7b
                      else "llava_1p4b_serve_hetero_") + mode,
           "value": round(float(np.mean([ps["samples_s"]
                                         for ps in per_seed])), 2),
           "unit": "samples/sec",
           "n_requests": n, "seeds": seeds,
           "note": "Poisson arrivals (exp 0.15 s), prompt lengths 4-48 "
                   "words + shared preamble, budgets {8,16,32} tokens, "
                   f"{n_slots} slots / max_batch {n_slots}; same seeded "
                   "schedules across modes; cross-seed mean (per-seed "
                   "breakdown attached). Latency includes queueing. "
                   "Axon-relay dispatch latency (~0.3-0.5 s/round-trip) "
                   "rides every number."}
    for k in ("p50_s", "p95_s", "p99_s", "mean_s"):
        row.update(agg(k))
    if len(per_seed) > 1:
        v = [ps["samples_s"] for ps in per_seed]
        row["samples_s_minmax"] = [min(v), max(v)]
    row["per_seed"] = per_seed
    row_sink.append(row)
    if tiny:
        print("TINY SMOKE OK", json.dumps(row_sink[0]), flush=True)
    if stats:
        print(f"engine stats: {stats}", flush=True)



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", choices=["towers", "diffusion", "a", "c",
                                       "decode", "decode7b", "prune",
                                       "train", "train7b", "serve",
                                       "serve_hetero", "spec",
                                       "pipeline"])
    args = ap.parse_args()
    results = []
    todo = {"towers": bench_towers, "diffusion": bench_diffusion,
            "a": bench_a_score, "c": bench_c_score, "decode": bench_decode,
            "decode7b": bench_decode_7b, "prune": bench_visual_prune,
            "train": bench_train, "train7b": bench_train_7b,
            "serve": bench_serve,
            "serve_hetero": bench_serve_hetero,
            "spec": bench_speculative, "pipeline": bench_pipeline}
    if args.only:
        todo = {args.only: todo[args.only]}
    else:
        del todo["decode7b"]          # explicit-only (slow at 13.4 GB)
        del todo["serve"]             # explicit-only (starts an HTTP server)
        del todo["serve_hetero"]      # explicit-only (starts an HTTP server)
        del todo["pipeline"]          # explicit-only (multi-subprocess CLI chain)
    for name, fn in todo.items():
        try:
            fn(results, quick=args.quick)
        except Exception as e:  # keep the suite running
            results.append({"metric": f"{name}", "error": str(e)[:200]})
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results.json")
    # merge with prior runs (families are commonly run one at a time on the
    # shared TPU tunnel)
    merged = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                merged = {r["metric"]: r for r in json.load(f)
                          if "error" not in r}
        except Exception:
            merged = {}
    for r in results:
        if not r["metric"].startswith("smoke_"):   # CPU smoke rows
            merged[r["metric"]] = r
    with open(out, "w") as f:
        json.dump(list(merged.values()), f, indent=1)
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
