"""fp32-oracle validation of the xla_expclamp headline path.

Raw bf16-vs-bf16 output deltas between the fast and exact attention paths
are dominated by 23 layers of rounding-path divergence (ANY reordering of
the same math drifts comparably), so the meaningful equivalence check is
against an fp32 oracle: the no-max path must be NO LESS accurate than the
exact-softmax bf16 path itself.

Standalone run (real TPU): `python benchmarks/validate_expclamp.py
[impl]` (default xla_expclamp_fused, the headline path).
LAST RESULT (2026-08-17, CLIP-L-336 b64 random-init, via
LVR_BENCH_VALIDATE=1 bench.py):
  xla_expclamp_fused rms_vs_fp32 = 0.01455 vs exact bf16 0.01466
  xla_expclamp       rms_vs_fp32 = 0.01455 (earlier same-day run)
— both fast paths match the exact path's accuracy to within noise (the
denominator fusion reorders the same fp32 row-sum, so the identical
deltas are expected). bench.py cites this; rerun after any
attention-path change.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def validate(cfg, tower_fast, tower_exact, variables, px):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        FP32_PRECISION)
    from law_of_vision_representation_in_mllms_tpu.models.vit import (
        ViTTower)

    tower32 = ViTTower(cfg, select_layer=-2, select_feature="patch",
                       precision=FP32_PRECISION)
    v32 = jax.tree.map(lambda x: x.astype(jnp.float32), variables)
    ref = np.asarray(jax.jit(
        lambda v, p: tower32.apply(v, p))(v32, px), np.float32)
    a = np.asarray(jax.jit(
        lambda v, p: tower_fast.apply(v, p))(variables, px), np.float32)
    b = np.asarray(jax.jit(
        lambda v, p: tower_exact.apply(v, p))(variables, px), np.float32)
    denom = max(1e-6, float(np.std(ref)))
    err_fast = float(np.sqrt(np.mean((a - ref) ** 2))) / denom
    err_exact = float(np.sqrt(np.mean((b - ref) ** 2))) / denom
    out = {"expclamp_rms_vs_fp32": round(err_fast, 5),
           "exact_bf16_rms_vs_fp32": round(err_exact, 5)}
    assert err_fast <= 1.5 * err_exact + 1e-4, (
        f"expclamp less accurate than the exact bf16 path: {out}")
    return out


def main():
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from law_of_vision_representation_in_mllms_tpu.core.precision import (
        BF16_TOWER_PRECISION)
    from law_of_vision_representation_in_mllms_tpu.models.vit import (
        VIT_PRESETS, ViTTower)

    import sys as _sys
    impl = _sys.argv[1] if len(_sys.argv) > 1 else "xla_expclamp_fused"
    cfg = VIT_PRESETS["openai/clip-vit-large-patch14-336"]()
    fast = ViTTower(dataclasses.replace(cfg, attn_impl=impl),
                    select_layer=-2, select_feature="patch",
                    precision=BF16_TOWER_PRECISION)
    exact = ViTTower(cfg, select_layer=-2, select_feature="patch",
                     precision=BF16_TOWER_PRECISION)
    rng = np.random.RandomState(0)
    px = jnp.asarray(rng.randn(64, cfg.image_size, cfg.image_size, 3)
                     .astype(np.float32))
    variables = jax.jit(fast.init)(jax.random.PRNGKey(0), px)
    variables = jax.tree.map(lambda x: x.astype(jnp.bfloat16), variables)
    print(validate(cfg, fast, exact, variables, px))


if __name__ == "__main__":
    main()
