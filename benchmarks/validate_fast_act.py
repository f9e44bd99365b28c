"""fp32-oracle validation of the fast-act (tanh-GELU) tower opt-in.

Question (same shape as validate_expclamp.py's): does substituting the
tanh approximation for the exact erf GELU in a bf16 DINOv2-class tower
move the features beyond what bf16 rounding already does? Method: run
the SAME random-weight DINOv2-L tower three ways on one batch —

  fp32 + exact erf GELU          (the oracle)
  bf16 + exact erf GELU          (production exact path)
  bf16 + tanh GELU               (model.tower_fast_act)

and report std-normalized RMS of each bf16 variant against the oracle.
The opt-in is justified iff rms(tanh) ~= rms(exact): the activation
approximation is then below the bf16 noise floor that the exact path
already carries. (Analytically max|tanh-gelu - erf-gelu| ~= 1e-3 at
|x|~2, ~0.05% of the activation scale — bf16 ulp at x~2 is 0.8%.)

Run on the real chip: `timeout 1800 python benchmarks/validate_fast_act.py`.
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    BF16_TOWER_PRECISION, FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models.vit import (
    VIT_PRESETS, ViTTower)


def run(act: str, prec, px, v, preset):
    """Apply with SHARED weights `v` cast to the precision's param dtype
    (initializing per-precision would sample different weights: the
    flax initializers draw directly in param_dtype)."""
    cfg = VIT_PRESETS[preset]()
    cfg = dataclasses.replace(cfg, hidden_act=act,
                              attn_impl="xla_expclamp_fused")
    tower = ViTTower(cfg, select_layer=-2, select_feature="patch",
                     precision=prec)
    vv = jax.tree.map(lambda x: x.astype(prec.param_dtype), v)
    return np.asarray(jax.jit(tower.apply)(vv, px), np.float32)


def init_fp32(px, key, preset):
    cfg = VIT_PRESETS[preset]()
    tower = ViTTower(cfg, select_layer=-2, select_feature="patch",
                     precision=FP32_PRECISION)
    return jax.jit(tower.init)(key, px)


def main():
    rng = np.random.RandomState(0)
    px = jnp.asarray(rng.randn(8, 224, 224, 3).astype(np.float32))
    key = jax.random.PRNGKey(0)
    for preset in ("facebook/dinov2-base", "facebook/dinov2-large"):
        v = init_fp32(px, key, preset)
        oracle = run("gelu", FP32_PRECISION, px, v, preset)
        exact = run("gelu", BF16_TOWER_PRECISION, px, v, preset)
        fast = run("gelu_tanh", BF16_TOWER_PRECISION, px, v, preset)
        std = oracle.std()

        def rms(a, b):
            return float(np.sqrt(np.mean((a - b) ** 2)) / std)

        print(f"{preset}:")
        print(f"  exact_bf16_rms_vs_fp32: {rms(exact, oracle):.5f}")
        print(f"  tanh_bf16_rms_vs_fp32:  {rms(fast, oracle):.5f}")
        print(f"  tanh_vs_exact_bf16_rms: {rms(fast, exact):.5f}")


if __name__ == "__main__":
    main()
