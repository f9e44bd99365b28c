"""Isolate the flash-decode kernel's TPU lowering from its chunk-program
integration.

The stacked kernel crashed Mosaic's compile helper (INTERNAL, exit 1)
inside the 7B chunk program twice — generic AND 3D-MHA bodies — which
leaves two hypotheses: (a) the kernel itself does not lower at 7B
shapes; (b) the integration does — the chunk program compiles with
NEGOTIATED (auto) boundary layouts, and a pallas_call demands
default-layout operands, so the AOT layout negotiation may be what
dies. This probe jits the kernel STANDALONE (default layouts, no scan)
at the 7B decode shape and times it: if it compiles and streams near
the DMA floor, hypothesis (b) — rerun the bench with
LVR_CHUNK_CACHE_AUTO=0; if it crashes here too, the kernel needs
further lowering work (recorded as a negative result either way).

Usage: python benchmarks/probe_pallas_decode.py [stacked|plain] [kv8]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "stacked"
    kv8 = "kv8" in sys.argv[2:]
    from law_of_vision_representation_in_mllms_tpu.ops import (
        decode_attention as DA)

    L, B, T, KV, D = (2, 16, 545, 32, 128)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, 1, KV, D), jnp.bfloat16)
    mask = jnp.asarray(np.ones((B, T), bool))
    if kv8:
        ck = jnp.asarray(
            rng.randint(-127, 127, (L, B, T, KV, D)), jnp.int8)
        cv = jnp.asarray(
            rng.randint(-127, 127, (L, B, T, KV, D)), jnp.int8)
        ks = jnp.asarray(rng.rand(L, B, T, KV), jnp.float32) * 0.05
        vs = jnp.asarray(rng.rand(L, B, T, KV), jnp.float32) * 0.05
    else:
        ck = jnp.asarray(rng.randn(L, B, T, KV, D), jnp.bfloat16)
        cv = jnp.asarray(rng.randn(L, B, T, KV, D), jnp.bfloat16)
        ks = vs = None

    if variant == "stacked":
        def fn(q, li):
            return DA.decode_attention_stacked(q, ck, cv, li, mask,
                                               ks, vs)
        jfn = jax.jit(fn)
        out = jfn(q, jnp.int32(0))
        print("compiled:", out.shape, flush=True)
        # time: L sequential calls/iter emulates one decode step's
        # attention term across layers (cache bytes = L*B*T*KV*D*(2|1))
        iters = 8
        t0 = time.perf_counter()
        acc = None
        for i in range(iters):
            for li in range(L):
                acc = jfn(q * (1.01 + 0.003 * i), jnp.int32(li))
        float(jnp.sum(acc.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        byte = 1 if kv8 else 2
        gb = L * B * T * KV * D * 2 * byte / 1e9
        print({"metric": "probe_pallas_decode_stacked"
                         + ("_kv8" if kv8 else ""),
               "ms_per_step_2layers": round(dt * 1e3, 2),
               "cache_gb": round(gb, 2),
               "gb_s": round(gb / dt, 1)}, flush=True)
    else:
        def fn(q):
            return DA.decode_attention(q, ck[0], cv[0], mask,
                                       None if ks is None else ks[0],
                                       None if vs is None else vs[0])
        jfn = jax.jit(fn)
        out = jfn(q)
        print("compiled:", out.shape, flush=True)
        iters = 8
        t0 = time.perf_counter()
        for i in range(iters):
            out = jfn(q * (1.01 + 0.003 * i))
        float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        byte = 1 if kv8 else 2
        gb = B * T * KV * D * 2 * byte / 1e9
        print({"metric": "probe_pallas_decode_plain"
                         + ("_kv8" if kv8 else ""),
               "ms_per_call": round(dt * 1e3, 2),
               "cache_gb": round(gb, 2), "gb_s": round(gb / dt, 1)},
              flush=True)


if __name__ == "__main__":
    main()
