"""Stage-2 train-step decomposition probe (VERDICT r3 #4).

Attributes the measured stage-2 step time to forward / backward /
optimizer by timing three programs at the exact bench_train shapes
(b8, 64 text + 576 image tokens, 1.4B decoder, CLIP-L-336 tower):

  P1  jit(loss)                       -> T_fwd
  P2  jit(value_and_grad(loss))       -> T_fwd + T_bwd (incl. remat
                                         recompute under policy)
  P3  jit(full step)                  -> + clip/AdamW/schedule/guard

so T_bwd = P2 - P1 and T_opt = P3 - P2. Run once per remat policy of
interest (LVR_TRAIN_REMAT_POLICY, default block). Each timing varies
dispatch values (relay value-cache rule) and fetches a scalar.

Run: timeout 3600 python benchmarks/probe_train_decomp.py
"""

import os
import sys
import time  # noqa: F401  (kept for parity with sibling probes)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp

from run_all import _timed  # noqa: E402
from law_of_vision_representation_in_mllms_tpu.core.precision import (
    Precision)
from law_of_vision_representation_in_mllms_tpu.models import llama, llava
from law_of_vision_representation_in_mllms_tpu.models.splice import (
    IGNORE_INDEX, IMAGE_TOKEN_INDEX)
from law_of_vision_representation_in_mllms_tpu.train.train_step import (
    TrainConfig, init_train_state, make_train_step, _freeze_labels)


def main():
    prec = Precision(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    dec = llama.LlamaConfig(vocab_size=32000, hidden_size=2048,
                            intermediate_size=5632, num_layers=16,
                            num_heads=16, num_kv_heads=16)
    cfg = llava.LlavaConfig.build("openai/clip-vit-large-patch14-336",
                                  decoder=dec)
    params = llava.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    rpol = os.environ.get("LVR_TRAIN_REMAT_POLICY", "block")
    fused = os.environ.get("LVR_TRAIN_FUSED_OPT", "1") == "1"
    tcfg = TrainConfig(stage=2, learning_rate=2e-5, total_steps=100,
                       remat=rpol != "none", remat_policy=rpol,
                       use_flash=True, fused_optimizer=fused)
    state, opt = init_train_state(params, tcfg)

    b, l = 8, 64
    rng = np.random.RandomState(5)
    ids = rng.randint(1, 32000, size=(b, l)).astype(np.int32)
    ids[:, 0] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :2] = IGNORE_INDEX
    px = jnp.asarray(rng.randn(b, 336, 336, 3).astype(np.float32))

    def batch_of(pxv):
        return {"input_ids": jnp.asarray(ids),
                "labels": jnp.asarray(labels),
                "text_mask": jnp.ones((b, l), bool),
                "pixel_values": [pxv]}

    def loss(p, pxv):
        # SAME freeze as make_train_step's loss: stage-2 stop-gradients the
        # frozen tower weights, so P2's backward matches the real step's
        # (without this, P2 pays tower weight-grad matmuls the step never
        # emits and T_opt = P3 - P2 goes negative).
        labels = _freeze_labels(p, tcfg.stage)
        p = jax.tree.map(
            lambda w, lab: jax.lax.stop_gradient(w) if lab == "freeze"
            else w, p, labels)
        return llava.loss_fn(p, cfg, batch_of(pxv), prec,
                             remat=tcfg.remat, remat_policy=rpol,
                             use_flash=True)

    iters = 5
    variants = [(px * (1.01 + 0.01 * i),) for i in range(iters)]

    fwd = jax.jit(loss)
    t_fwd = _timed(lambda v: fwd(params, v), (px,), variants, float)
    print(f"P1 fwd-only            : {t_fwd*1e3:7.1f} ms", flush=True)

    vg = jax.jit(jax.value_and_grad(loss))
    t_vg = _timed(lambda v: vg(params, v), (px,), variants,
                  lambda o: float(o[0]))
    print(f"P2 fwd+bwd ({rpol:5s})   : {t_vg*1e3:7.1f} ms "
          f"(bwd = {(t_vg-t_fwd)*1e3:.1f} ms, "
          f"bwd/fwd = {(t_vg-t_fwd)/t_fwd:.2f})", flush=True)

    step = jax.jit(make_train_step(cfg, tcfg, opt, prec),
                   donate_argnums=(0,))
    sref = [state]

    def one(pxv):
        sref[0], m = step(sref[0], batch_of(pxv))
        return m
    t_step = _timed(one, (px,), variants, lambda m: float(m["loss"]))
    toks = b * (l - 1 + cfg.num_patches)
    print(f"P3 full step ({'fused' if fused else 'optax'})   : "
          f"{t_step*1e3:7.1f} ms "
          f"(opt+guard = {(t_step-t_vg)*1e3:.1f} ms) "
          f"-> {toks/t_step:.0f} tok/s", flush=True)


if __name__ == "__main__":
    main()
