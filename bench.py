"""Per-chip vision-tower feature-extraction throughput benchmark.

Measures the flagship representation (CLIP-L/14-336, the reference's default
`--vision_tower openai/clip-vit-large-patch14-336`) running the LLaVA feature
path: ViT trunk to hidden_states[-2], CLS dropped — i.e. exactly what
training/eval executes per image (`llava/model/multimodal_encoder/
clip_encoder.py:29-48`) — in bf16 on one TPU chip.

The reference publishes no throughput numbers (BASELINE.json "published": {});
`vs_baseline` is measured against an estimated A100 PyTorch eager baseline of
300 images/sec for HF CLIPVisionModel-336 at batch 64 bf16 (driver target:
>=2x per chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

A100_TORCH_BASELINE_IMG_S = 300.0


def main():
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
    tower = ViTTower(cfg, select_layer=-2, select_feature="patch",
                     precision=prec)

    batch = 64
    rng = np.random.RandomState(0)
    px = jnp.asarray(rng.randn(batch, cfg.image_size, cfg.image_size, 3)
                     .astype(np.float32))
    variables = jax.jit(tower.init)(jax.random.PRNGKey(0), px)
    variables = jax.tree.map(lambda x: x.astype(jnp.bfloat16), variables)

    fn = jax.jit(lambda v, p: tower.apply(v, p))
    # Through the axon relay, execution is deferred until data is fetched
    # (block_until_ready is not sufficient) — force a scalar fetch each call
    # and vary inputs so nothing is dispatch-cached.
    float(jnp.sum(fn(variables, px)))              # compile + warm
    float(jnp.sum(fn(variables, px * 1.5)))        # warm relay path

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(variables, px * (1.01 + 0.003 * i))
    _ = float(jnp.sum(out))
    dt = time.perf_counter() - t0

    img_s = batch * iters / dt
    print(json.dumps({
        "metric": "clip_l14_336_feature_extraction",
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / A100_TORCH_BASELINE_IMG_S, 3),
    }))


if __name__ == "__main__":
    main()
