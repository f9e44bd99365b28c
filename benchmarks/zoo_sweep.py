"""Per-family ViT-zoo decomposition sweep (round 4, VERDICT r3 #1).

Generalizes attn_sweep.py's op-substitution method to DINOv2-L and
SigLIP-B — the two zoo members still below their A100-eager bases after
round 3. Each variant swaps ONE op and measures whole-tower throughput
at the bench shape (b64, bf16, xla_expclamp_fused production impl), so
the budget decomposes into measured terms instead of hypotheses.

Variants:
  full          production config (DINOv2: LayerScale folded at port)
  ls_explicit   DINOv2 only: explicit lambda params (the round-3 config)
  ident         attention replaced by identity (everything-but-attention)
  nosoftmax     both attention matmuls, no softmax between
  act:<name>    activation substituted (quick_gelu/gelu/gelu_tanh)

Usage: timeout 3000 python benchmarks/zoo_sweep.py <preset-substr> \
       [variant ...]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    BF16_TOWER_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models.vit import (
    VIT_PRESETS, ViTTower)


def measure(preset: str, variant: str, batch: int = 64,
            iters: int = 10) -> float:
    import law_of_vision_representation_in_mllms_tpu.ops.attention as A
    cfg = VIT_PRESETS[preset]()
    cfg = dataclasses.replace(cfg, attn_impl="xla_expclamp_fused")
    orig_fused = A.mha_expnomax_fused
    if variant == "ls_explicit":
        cfg = dataclasses.replace(cfg, use_layerscale=True)
    elif variant == "ident":
        A.mha_expnomax_fused = \
            lambda q, k, v, **kw: q
    elif variant == "nosoftmax":
        def _nosm(q, k, v, scale=None, clamp=None,
                  accum_dtype=jnp.bfloat16):
            d = q.shape[-1]
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=accum_dtype)
            p = (s * jnp.asarray(1e-3, accum_dtype)).astype(q.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                              preferred_element_type=accum_dtype
                              ).astype(q.dtype) * (d ** -0.5)
        A.mha_expnomax_fused = _nosm
    elif variant.startswith("act:"):
        cfg = dataclasses.replace(cfg, hidden_act=variant[4:])
    elif variant != "full":
        raise SystemExit(f"unknown variant {variant}")

    try:
        tower = ViTTower(cfg, select_layer=-2,
                         select_feature="cls_patch"
                         if "siglip" in preset else "patch",
                         precision=BF16_TOWER_PRECISION)
        rng = np.random.RandomState(0)
        px = jnp.asarray(rng.randn(batch, cfg.image_size, cfg.image_size, 3)
                         .astype(np.float32))
        variables = jax.jit(tower.init)(jax.random.PRNGKey(0), px)
        variables = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                                 variables)
        fn = jax.jit(lambda v, p: tower.apply(v, p))
        float(jnp.sum(fn(variables, px)))
        float(jnp.sum(fn(variables, px * 1.5)))
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = fn(variables, px * (1.01 + 0.003 * i))
        _ = float(jnp.sum(out))
        dt = time.perf_counter() - t0
        return batch * iters / dt
    finally:
        A.mha_expnomax_fused = orig_fused


if __name__ == "__main__":
    key = sys.argv[1]
    preset = next(p for p in VIT_PRESETS if key in p)
    variants = sys.argv[2:] or ["full", "ident", "nosoftmax"]
    for v in variants:
        img_s = measure(preset, v)
        print(f"{preset} {v}: {img_s:.1f} img/s", flush=True)
