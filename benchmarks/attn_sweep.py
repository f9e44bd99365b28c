"""ViT attention-impl sweep on the real TPU chip (round-3 experiment).

Measures CLIP-L-336 (B=64, the flagship bench shape) end-to-end tower
throughput for each candidate attention implementation, following the
axon-relay methodology in benchmarks/README.md (vary inputs by value,
force a scalar fetch, warm twice). One process, one impl at a time —
results merge by hand into README's kernel-policy section.

Usage: timeout 1200 python benchmarks/attn_sweep.py [impl ...]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    BF16_TOWER_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models.vit import (
    VIT_PRESETS, ViTTower)


def measure(impl: str, batch: int = 64, iters: int = 10) -> float:
    import law_of_vision_representation_in_mllms_tpu.models.vit as V
    cfg = VIT_PRESETS["openai/clip-vit-large-patch14-336"]()
    if ":" in impl:  # e.g. xla_blocked:256
        impl_name, block = impl.split(":")
        import law_of_vision_representation_in_mllms_tpu.ops.attention as A
        orig = A.mha_blocked
        A.mha_blocked = lambda *a, **kw: orig(
            *a, **{**kw, "block_k": int(block)})
    elif impl == "ident":
        # diagnostic: attention replaced by identity — times everything
        # BUT attention (dense matmuls, LN, GELU, residuals)
        V.mha = lambda q, k, v, mask=None, accum_dtype=None: q
        impl_name = "xla"
    elif impl == "nosoftmax":
        # diagnostic: the two attention matmuls with NO softmax between
        # (logits written+read once; garbage numerics, real dataflow)
        def _nosm(q, k, v, mask=None, accum_dtype=jnp.bfloat16):
            d = q.shape[-1]
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=accum_dtype)
            p = (logits * jnp.asarray(1e-3, accum_dtype)).astype(q.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                              preferred_element_type=accum_dtype
                              ).astype(q.dtype) * (d ** -0.5)
        V.mha = _nosm
        impl_name = "xla"
    elif impl == "expclamp":
        # no-max softmax: exp(min(s, 60)) fuses into dot1's output fusion
        # (no separate max read pass); normalize after PV. Exact whenever
        # the true row max is < 60 (bf16 exp overflows at 88).
        def _ec(q, k, v, mask=None, accum_dtype=jnp.bfloat16):
            d = q.shape[-1]
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=accum_dtype)
            s = s * jnp.asarray(d ** -0.5, accum_dtype)
            p = jnp.exp(jnp.minimum(s, jnp.asarray(60, accum_dtype)))
            l = jnp.sum(p.astype(jnp.float32), axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v,
                           preferred_element_type=accum_dtype)
            den = jnp.transpose(l, (0, 2, 1))[..., None]
            return (o.astype(jnp.float32) / den).astype(q.dtype)
        V.mha = _ec
        impl_name = "xla"
    else:
        impl_name = impl
    cfg = dataclasses.replace(cfg, attn_impl=impl_name)
    tower = ViTTower(cfg, select_layer=-2, select_feature="patch",
                     precision=BF16_TOWER_PRECISION)
    rng = np.random.RandomState(0)
    px = jnp.asarray(rng.randn(batch, cfg.image_size, cfg.image_size, 3)
                     .astype(np.float32))
    variables = jax.jit(tower.init)(jax.random.PRNGKey(0), px)
    variables = jax.tree.map(lambda x: x.astype(jnp.bfloat16), variables)
    fn = jax.jit(lambda v, p: tower.apply(v, p))
    float(jnp.sum(fn(variables, px)))
    float(jnp.sum(fn(variables, px * 1.5)))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(variables, px * (1.01 + 0.003 * i))
    _ = float(jnp.sum(out))
    dt = time.perf_counter() - t0
    return batch * iters / dt


if __name__ == "__main__":
    impls = sys.argv[1:] or ["xla", "xla_post", "xla_blocked:128",
                             "xla_blocked:320"]
    for impl in impls:
        batch = 64
        if "@" in impl:                  # e.g. xla_expclamp@128
            impl, b = impl.rsplit("@", 1)
            batch = int(b)
        img_s = measure(impl, batch=batch)
        print(f"{impl}@{batch}: {img_s:.1f} img/s", flush=True)
