"""Precision policy for the whole framework.

TPU-first defaults: bf16 compute (MXU-native), fp32 params and fp32
accumulation (``preferred_element_type``). Tests on CPU use fp32 everywhere.

The reference mixes hard-coded fp16/bf16 casts per tower
(`llava/model/multimodal_encoder/siglip_encoder.py:62-64`,
`dift_sd.py:226-230`); here one policy object is threaded through every model.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # dtype used for softmax / layernorm statistics and matmul accumulation
    accum_dtype: jnp.dtype = jnp.float32

    def cast(self, x):
        return x.astype(self.compute_dtype)


DEFAULT_PRECISION = Precision()
FP32_PRECISION = Precision(compute_dtype=jnp.float32)

# Frozen-tower inference: EVERYTHING bf16, including attention logits and
# softmax (accum_dtype flows into ops.attention.mha's softmax). Measured
# +11% on CLIP-L-336 v5e throughput vs fp32 softmax — the [B,H,S,S] logits
# are the tower's HBM bottleneck, and halving them is faithful to the
# reference, whose towers run wholesale in fp16 (`clip_encoder.py:33`,
# `siglip_encoder.py:62-64` hardcode .half()).
BF16_TOWER_PRECISION = Precision(param_dtype=jnp.bfloat16,
                                 compute_dtype=jnp.bfloat16,
                                 accum_dtype=jnp.bfloat16)
