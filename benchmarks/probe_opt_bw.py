"""Optimizer-pass bandwidth probe (VERDICT r3 #4 follow-up).

The fused AdamW measures 64.9 ms on the 1.4B stage-2 step
(probe_train_decomp); the naive floor from the 619 GB/s sustained READ
(probe_decode_bw) is ~36 ms. This probe separates "fusion failed" from
"read+write streams sustain less than pure reads" by timing, at the
exact 1.4B stacked-layer shapes:

  T1  triad  p' = p + 0.001*g           (read 2 trees, write 1)
  T2  the full FusedAdamW.apply         (read g,m,v,p + gnorm pass,
                                         write m',v',p')

Both donate their inputs (in-place buffer reuse, like the train step's
state). GB/s(T1) is the device's elementwise r+w ceiling; if T2's
effective GB/s matches T1's, the fused optimizer is AT the hardware
floor and 64.9 ms is the honest number.

Run: timeout 1800 python benchmarks/probe_opt_bw.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.models import llama
from law_of_vision_representation_in_mllms_tpu.train.train_step import (
    TrainConfig, FusedAdamW)


def tree_bytes(t):
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(t))


def main():
    cfg = llama.LlamaConfig(vocab_size=32000, hidden_size=2048,
                            intermediate_size=5632, num_layers=16,
                            num_heads=16, num_kv_heads=16)
    params = jax.jit(
        lambda k: llama.init_params(k, cfg, jnp.bfloat16))(
            jax.random.PRNGKey(0))
    nbytes = tree_bytes(params)
    print(f"param tree: {nbytes/1e9:.2f} GB bf16", flush=True)

    # T1: triad over the tree
    @jax.jit
    def triad(p, g, s):
        return jax.tree.map(lambda a, b: a + s * b, p, g)

    grads = jax.jit(lambda p: jax.tree.map(
        lambda x: x * 1e-3 + 1e-6, p))(params)
    def fetch(t):
        # the axon relay defers execution until data is FETCHED
        # (block_until_ready is not sufficient — bench.py note)
        return float(jax.tree.leaves(t)[0].reshape(-1)[0])

    out = triad(params, grads, jnp.bfloat16(0.001))
    fetch(out)
    best = None
    for i in range(4):
        t0 = time.perf_counter()
        out = triad(out, grads, jnp.bfloat16(0.001 + 1e-4 * i))
        fetch(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    bw1 = 3 * nbytes / best / 1e9
    print(f"T1 triad: {best*1e3:.1f} ms for r{2*nbytes/1e9:.1f}+"
          f"w{nbytes/1e9:.1f} GB = {bw1:.0f} GB/s elementwise r+w",
          flush=True)
    del out

    # T2: isolated fused update at stage-2 labels (params tree must look
    # like a train tree: wrap as {"decoder":..., "towers":{}, ...})
    ptree = {"projector": {}, "towers": {}, "decoder": params}
    gtree = {"projector": {}, "towers": {}, "decoder": grads}
    tcfg = TrainConfig(stage=2, learning_rate=2e-5, total_steps=100)
    opt = FusedAdamW(tcfg)
    state = jax.jit(opt.init)(ptree)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def apply(p, g, s, gn):
        return opt.apply(p, g, s, jnp.bool_(True), gn)

    gn = jnp.float32(0.5)
    p2, s2 = apply(ptree, gtree, state, gn)
    fetch(p2)
    best = None
    for i in range(4):
        t0 = time.perf_counter()
        p2, s2 = apply(p2, gtree, s2, gn + 0.1 + 0.01 * i)
        fetch(p2)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    traffic = 7 * nbytes + nbytes      # r: g,m,v,p + gnorm re-read; w: m,v,p
    print(f"T2 fused AdamW: {best*1e3:.1f} ms for ~{traffic/1e9:.1f} GB "
          f"= {traffic/best/1e9:.0f} GB/s effective "
          f"(floor at T1 rate = {traffic/bw1/1e6:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
