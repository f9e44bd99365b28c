"""int4 probe (packed-nibble format, ops/quant.py).

History: native jnp.int4 (S4) array dispatch crashes this environment's
remote backend (RecursionError in _array_shard_arg), so int4 weights are
packed two-per-int8-byte and unpacked with sign-extending shifts inside
the program. The open question this probe answers on-chip: does the
unpack+interleave FUSE into the dot's operand read (weight stream = 0.5
byte/weight — half of int8) or does XLA materialize the unpacked bf16
tensor (2 bytes/weight — WORSE than int8)?

Run: timeout 900 python benchmarks/probe_int4.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.ops.quant import (
    dequantize_int4, int4_matmul, int8_matmul, quantize_int4,
    quantize_int8)


def main():
    print("devices:", jax.devices(), flush=True)

    # 1. pack/unpack + matmul parity on-chip
    rng = np.random.RandomState(0)
    w = rng.randn(256, 128).astype(np.float32) * 0.05
    x = jnp.asarray(rng.randn(4, 256).astype(np.float32))
    for gs in (None, 64):
        qw = quantize_int4(jnp.asarray(w), group_size=gs)
        got = np.asarray(jax.jit(int4_matmul)(x, qw))
        ref = np.asarray(x) @ np.asarray(jax.jit(dequantize_int4)(qw))
        err = np.abs(got - ref).max()
        assert err < 1e-2, (gs, err)
        print(f"1. int4_matmul parity ok (group_size={gs}, "
              f"max err {err:.2e})", flush=True)

    # 2. decode-shaped matvec: per-dispatch time at [8,4096]x[4096,11008],
    # 64 sequential matvecs per dispatch (relay-amortized, like a decode
    # step's layer loop). bytes/matvec tells fused vs materialized.
    di, do, b, reps = 4096, 11008, 8, 64
    wbig = (rng.randn(di, do) * 0.02).astype(np.float32)
    xb = jnp.asarray(rng.randn(b, di).astype(np.float32), jnp.bfloat16)
    cases = [
        ("bf16", jnp.asarray(wbig, jnp.bfloat16), lambda a, ww: a @ ww,
         di * do * 2),
        ("int8", quantize_int8(jnp.asarray(wbig)), int8_matmul,
         di * do),
        ("int4 g128", quantize_int4(jnp.asarray(wbig), group_size=128),
         int4_matmul, di * do // 2),
    ]
    for label, qw, mm, nbytes in cases:
        @jax.jit
        def f(a, q=qw, mm=mm):
            def body(i, acc):
                y = mm(a + acc[:, :1] * 1e-9, q)   # loop-dependent input
                return acc + y[:, :di] if y.shape[-1] >= di \
                    else acc + jnp.pad(y, ((0, 0), (0, di - y.shape[-1])))
            return jax.lax.fori_loop(0, reps, body,
                                     jnp.zeros((b, di), a.dtype))
        float(jnp.sum(f(xb)))          # compile
        best = None
        for i in range(3):
            t0 = time.perf_counter()
            out = f(xb * (1.01 + 0.003 * i))
            _ = float(jnp.sum(out))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        per = best / reps
        print(f"2. {label}: {per*1e6:.0f} us/matvec "
              f"({nbytes/per/1e9:.0f} GB/s weight stream)", flush=True)


if __name__ == "__main__":
    main()
