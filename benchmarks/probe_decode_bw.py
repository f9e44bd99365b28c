"""Sustained-HBM-read probe for the 7B decode roofline (VERDICT r3 #2).

The decode "param-read floor" used so far divides weight bytes by the
v5e's PEAK HBM bandwidth (819 GB/s). Real streaming reads sustain less;
this probe measures what a pure read of the decode working set actually
achieves, giving the honest denominator for "X% of achievable".

Method: sum-reduce the full int8 and bf16 7B weight trees (a reduction
reads every byte once and writes ~nothing), timed over relay-distinct
dispatches (each iteration adds a different scalar to one leaf's first
element — value-cache rule).

Run: timeout 1800 python benchmarks/probe_decode_bw.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np

from law_of_vision_representation_in_mllms_tpu.models import llama
from run_all import _random_int8_decoder  # noqa: E402


def probe(params, label):
    nbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))

    @jax.jit
    def readall(p, salt):
        tot = salt.astype(jnp.float32)
        for leaf in jax.tree.leaves(p):
            tot = tot + jnp.sum(leaf.astype(jnp.float32))
        return tot

    float(readall(params, jnp.float32(0.5)))
    float(readall(params, jnp.float32(1.5)))
    iters = 6
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = readall(params, jnp.float32(2.01 + 0.13 * i))
    _ = float(out)
    dt = (time.perf_counter() - t0) / iters
    bw = nbytes / dt / 1e9
    print(f"{label}: {nbytes/1e9:.2f} GB in {dt*1e3:.1f} ms "
          f"= {bw:.0f} GB/s sustained read "
          f"({bw/819*100:.0f}% of the 819 GB/s peak)", flush=True)
    return bw


def main():
    cfg = llama.vicuna_7b()
    q = _random_int8_decoder(cfg)
    probe(q, "int8 7B tree (~6.9 GB)")
    del q
    dense = jax.jit(lambda k: llama.init_params(k, cfg, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    probe(dense, "bf16 7B tree (13.5 GB)")


if __name__ == "__main__":
    main()
