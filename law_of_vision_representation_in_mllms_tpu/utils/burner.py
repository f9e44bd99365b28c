"""Chip burn-in / keep-busy loop (`gpu.py:1-62` parity — the reference ships
a DataParallel CIFAR burner that loops forever to keep GPUs warm).

TPU version: an endless bf16 matmul chain at a requested utilization duty
cycle. CLI: `python -m law_of_vision_representation_in_mllms_tpu.utils.burner
[--seconds N] [--size 4096]`.
"""

from __future__ import annotations

import argparse
import time


def burn(seconds: float = 60.0, size: int = 4096, report_every: float = 5.0
         ) -> float:
    import jax
    import jax.numpy as jnp

    x = jnp.ones((size, size), jnp.bfloat16)

    @jax.jit
    def chain(x, s):
        for _ in range(8):
            x = (x @ x) * s
        return x

    t0 = time.perf_counter()
    last = t0
    n = 0
    while time.perf_counter() - t0 < seconds:
        out = chain(x, jnp.bfloat16(1.0 + 1e-6 * n))
        _ = float(out[0, 0])       # force execution (relay defers)
        n += 1
        now = time.perf_counter()
        if now - last > report_every:
            tflops = 8 * 2 * size ** 3 * n / (now - t0) / 1e12
            print(f"burner: {n} chains, {tflops:.0f} TFLOP/s sustained")
            last = now
    return n


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=60.0)
    p.add_argument("--size", type=int, default=4096)
    p.parse_args()
    a = p.parse_args()
    burn(a.seconds, a.size)
