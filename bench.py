"""Per-chip vision-tower feature-extraction throughput benchmark.

Headline metric: the flagship representation (CLIP-L/14-336, the
reference's default `--vision_tower openai/clip-vit-large-patch14-336`)
running the LLaVA feature path: ViT trunk to hidden_states[-2], CLS
dropped — i.e. exactly what training/eval executes per image
(`llava/model/multimodal_encoder/clip_encoder.py:29-48`) — in bf16 on one
TPU chip.

The reference publishes no throughput numbers (BASELINE.json
"published": {}); `vs_baseline` is measured against an estimated A100
PyTorch eager baseline of 300 images/sec for HF CLIPVisionModel-336 at
batch 64 bf16 (driver target: >=2x per chip; the v5e-1 roofline analysis
in BASELINE.md bounds one chip at ~400 img/s practical).

The headline runs the denominator-fused no-max softmax attention
(`attn_impl="xla_expclamp_fused"`, round-3: +33% over exact-XLA
attention — pre-exp logits never reach HBM, and P @ [V|1] computes the
numerator and row-sums in one MXU pass so the exp'd logits are read
once; ops/attention.mha_expnomax_fused). Equivalence is validated
against an fp32 oracle (benchmarks/validate_expclamp.py, run with
LVR_BENCH_VALIDATE=1): the fast path must be no less accurate than the
exact-softmax bf16 path itself.

The single JSON line additionally carries `extra`: XLA-cost-analysis
TFLOP/s + MFU for the headline, and the SD1.5@768 diffusion featurizer
(the reference's heaviest tower family) with its own A100-eager basis —
so the driver-visible BENCH covers more than CLIP (VERDICT r2 #5).
"""

import json
import os
import time

# single source for the cost-analysis helper and roofline constants
from benchmarks.run_all import (_cost_flops, A100_EAGER_TFLOPS,
                                V5E_PEAK_TFLOPS)

A100_TORCH_BASELINE_IMG_S = 300.0


def bench_clip(extra):
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        BF16_TOWER_PRECISION)
    from law_of_vision_representation_in_mllms_tpu.models.vit import (
        VIT_PRESETS, ViTTower)

    # full-bf16 incl. attention softmax — the reference towers run fp16
    prec = BF16_TOWER_PRECISION
    cfg = VIT_PRESETS["openai/clip-vit-large-patch14-336"]()
    # HEADLINE path: the denominator-fused no-max softmax (attn_impl
    # "xla_expclamp_fused"), the fastest measured production
    # configuration (370.6 vs 311.2 img/s for plain expclamp vs 278 for
    # exact XLA, benchmarks/attn_sweep.py 2026-08-17;
    # ops/attention.mha_expnomax_fused documents the exactness
    # condition; fp32-oracle validation below).
    tower = ViTTower(
        dataclasses.replace(cfg, attn_impl="xla_expclamp_fused"),
        select_layer=-2, select_feature="patch", precision=prec)
    tower_exact = ViTTower(cfg, select_layer=-2, select_feature="patch",
                           precision=prec)

    batch = 64
    rng = np.random.RandomState(0)
    px = jnp.asarray(rng.randn(batch, cfg.image_size, cfg.image_size, 3)
                     .astype(np.float32))
    variables = jax.jit(tower.init)(jax.random.PRNGKey(0), px)
    variables = jax.tree.map(lambda x: x.astype(jnp.bfloat16), variables)

    fn = jax.jit(lambda v, p: tower.apply(v, p))
    fn_exact = jax.jit(lambda v, p: tower_exact.apply(v, p))
    # Through the axon relay, execution is deferred until data is fetched
    # (block_until_ready is not sufficient) — force a scalar fetch each call
    # and vary inputs so nothing is dispatch-cached.
    float(jnp.sum(fn(variables, px)))              # compile + warm
    float(jnp.sum(fn(variables, px * 1.5)))        # warm relay path

    # Equivalence validation lives in benchmarks/validate_expclamp.py
    # (fp32-oracle gate: the fast path must be no less accurate than the
    # exact-softmax bf16 path; LAST RUN 2026-08-17 on xla_expclamp_fused:
    # RMS-vs-fp32 see benchmarks/results.json
    # expclamp_fp32_oracle_validation row).
    # Kept out of the default bench: the extra fp32+exact tower compiles
    # cost ~10-15 min through this environment's remote compile helper.
    # Run with LVR_BENCH_VALIDATE=1 to gate in-process.
    if os.environ.get("LVR_BENCH_VALIDATE"):
        from benchmarks.validate_expclamp import validate
        extra.update(validate(cfg, tower, tower_exact, variables, px))

    def timed(f):
        t0 = time.perf_counter()
        iters = 10
        for i in range(iters):
            out = f(variables, px * (1.01 + 0.003 * i))
        _ = float(jnp.sum(out))
        return (time.perf_counter() - t0) / iters

    dt = timed(fn)
    del fn_exact  # measured 277.03 img/s (2026-08-17); see BASELINE.md

    flops = _cost_flops(fn, variables, px)
    if flops:
        extra["clip_tflops_s"] = round(flops / dt / 1e12, 1)
        extra["clip_mfu"] = round(flops / dt / 1e12 / V5E_PEAK_TFLOPS, 3)
    return batch / dt


def bench_sd15(extra):
    """SD1.5@768 featurize (VAE encode + UNet up-0 harvest, b8) — the
    diffusion-family representative (`dift_sd.py:224-276` workload).

    Measures the PRODUCTION configuration: `lvr make-config SD1.5` emits
    `model.diffusion_attn_impl=xla_expclamp_fused` (the measured winner,
    +14% over the exact softmax; same clamp-85 exactness condition and
    fp32-oracle validation as the CLIP headline — ops/attention.py,
    benchmarks/README.md), so the bench runs what the shipped configs
    run. The library default stays the exact softmax."""
    import os as _os
    _os.environ["LVR_DIFFUSION_ATTN"] = "xla_expclamp_fused"
    import jax
    import jax.numpy as jnp
    import numpy as np
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        BF16_TOWER_PRECISION)
    from law_of_vision_representation_in_mllms_tpu.models import (
        featurizer as F)
    from law_of_vision_representation_in_mllms_tpu.models import unet as UN
    from law_of_vision_representation_in_mllms_tpu.models import vae as VA

    prec = BF16_TOWER_PRECISION
    cfg = F.FEATURIZER_PRESETS["runwayml/stable-diffusion-v1-5"]()
    batch = 8
    rng = np.random.RandomState(4)
    px = jnp.asarray(rng.rand(batch, cfg.img_size, cfg.img_size, 3)
                     .astype(np.float32) * 2 - 1)
    lat_hw = cfg.img_size // (2 ** (len(cfg.vae.block_out_channels) - 1))
    latents = jnp.zeros((1, lat_hw, lat_hw, cfg.vae.latent_channels),
                        jnp.bfloat16)
    rng0 = jax.random.PRNGKey(0)
    params = {"vae": jax.jit(VA.VAEEncoder(cfg.vae, prec).init)(
        rng0, px[:1])["params"]}
    mod = UN.UNetHarvest(cfg.unet, (cfg.up_ft_index,), prec)
    ctx = jnp.zeros((1, 77, cfg.unet.cross_attention_dim), jnp.bfloat16)
    params["backbone"] = jax.jit(mod.init)(rng0, latents, 1, ctx)["params"]
    params["prompt_embeds"] = ctx
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    fn = jax.jit(lambda p, x: F.extract_features(
        p, cfg, x, deterministic=True, precision=prec))
    float(jnp.sum(fn(params, px).astype(jnp.float32)))
    float(jnp.sum(fn(params, px * 0.99).astype(jnp.float32)))
    iters = 4
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(params, px * (1.01 - 0.002 * i))
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters

    img_s = batch / dt
    extra["sd15_featurize_img_s"] = round(img_s, 2)
    extra["sd15_attn_impl"] = "xla_expclamp_fused"
    flops = _cost_flops(fn, params, px)
    if flops:
        extra["sd15_tflops_s"] = round(flops / dt / 1e12, 1)
        extra["sd15_mfu"] = round(flops / dt / 1e12 / V5E_PEAK_TFLOPS, 3)
        a100_est = A100_EAGER_TFLOPS * 1e12 / (flops / batch)
        extra["sd15_a100_eager_est_img_s"] = round(a100_est, 1)
        extra["sd15_vs_baseline"] = round(img_s / a100_est, 2)


def bench_dinov2(extra):
    """DINOv2-L with the round-4 production config (fused no-max softmax
    + tanh-GELU fast-act, `model.tower_fast_act`): the last ViT-zoo
    family to beat its A100-eager basis (834 img/s, vs_baseline 1.04 —
    benchmarks/README.md round-4 zoo decomposition; fp32-oracle
    validation in benchmarks/validate_fast_act.py)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        BF16_TOWER_PRECISION)
    from law_of_vision_representation_in_mllms_tpu.models.vit import (
        VIT_PRESETS, ViTTower)

    cfg = dataclasses.replace(VIT_PRESETS["facebook/dinov2-large"](),
                              attn_impl="xla_expclamp_fused",
                              hidden_act="gelu_tanh")
    tower = ViTTower(cfg, select_layer=-2, select_feature="patch",
                     precision=BF16_TOWER_PRECISION)
    batch = 64
    rng = np.random.RandomState(2)
    px = jnp.asarray(rng.randn(batch, 224, 224, 3).astype(np.float32))
    v = jax.jit(tower.init)(jax.random.PRNGKey(0), px)
    v = jax.tree.map(lambda x: x.astype(jnp.bfloat16), v)
    fn = jax.jit(lambda vv, p: tower.apply(vv, p))
    float(jnp.sum(fn(v, px)))
    float(jnp.sum(fn(v, px * 1.5)))
    iters = 8
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(v, px * (1.01 + 0.003 * i))
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    img_s = batch / dt
    extra["dinov2l_fastact_img_s"] = round(img_s, 2)
    flops = _cost_flops(fn, v, px)
    if flops:
        a100_est = A100_EAGER_TFLOPS * 1e12 / (flops / batch)
        extra["dinov2l_vs_baseline"] = round(img_s / a100_est, 2)


def main():
    extra = {}
    img_s = bench_clip(extra)
    try:
        bench_sd15(extra)
    except Exception as e:              # the headline must still print
        extra["sd15_error"] = type(e).__name__
    try:
        bench_dinov2(extra)
    except Exception as e:
        extra["dinov2_error"] = type(e).__name__
    print(json.dumps({
        "metric": "clip_l14_336_feature_extraction",
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / A100_TORCH_BASELINE_IMG_S, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    try:
        main()
    except RuntimeError as e:
        # The axon tunnel recovers from a killed TPU job in ~5 minutes,
        # during which backend init fails with UNAVAILABLE (observed
        # 2026-08-17: a whole bench run lost to one wedged window). A
        # fresh process is required to retry — jax caches the failed
        # backend — so re-exec ourselves a bounded number of times.
        tries = int(os.environ.get("LVR_BENCH_RETRY", "0"))
        if "UNAVAILABLE" not in str(e) or tries >= 4:
            raise
        import sys
        print(f"backend unavailable (retry {tries + 1}/4 in 120s): {e}",
              file=sys.stderr, flush=True)
        time.sleep(120)
        os.environ["LVR_BENCH_RETRY"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
