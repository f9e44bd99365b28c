"""Activation functions used across the tower zoo.

Matches HF semantics so ported weights reproduce reference activations:
- ``quick_gelu``  — OpenAI CLIP ViTs (x * sigmoid(1.702 x))
- ``gelu``        — OpenCLIP / DINOv2 (erf-exact)
- ``gelu_tanh``   — SigLIP (`gelu_pytorch_tanh`)
- ``silu``        — SD UNets / MMDiT / LLaMA
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


ACT2FN = {
    "quick_gelu": quick_gelu,
    "gelu": gelu_exact,
    "gelu_tanh": gelu_tanh,
    "gelu_pytorch_tanh": gelu_tanh,
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
}
