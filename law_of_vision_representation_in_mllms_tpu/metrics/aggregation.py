"""Aggregation / post-processing networks for supervised correspondence.

Reference: `C_score/model_utils/projection_network.py` —
- `DummyAggregationNetwork` (identity scale; the zero-shot C-score path),
- `AggregationNetwork`: one GN-bottleneck ResNet block per feature layer
  (ODISE-style; kernel sizes [1,3,1]) whose outputs are blended with
  softmax mixing weights; CLIP-style logit scales as trainable scalars.

and `C_score/model_utils/corr_map_model.py Correlation2Displacement`: the
correlation map -> soft-argmax *displacement* (the eval-time flow minus the
identity grid).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.precision import Precision, FP32_PRECISION
from .c_score import soft_argmax_flow


class DummyAggregation(nn.Module):
    """Identity with a scalar parameter (`projection_network.py:7-13`)."""

    @nn.compact
    def __call__(self, x):
        s = self.param("dummy", nn.initializers.ones, ())
        return x * s


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 convs with GroupNorm + ReLU, additive shortcut
    (detectron2-style, `model_utils/resnet.py BottleneckBlock`)."""
    bottleneck_channels: int
    out_channels: int
    num_groups: int = 32
    kernel_sizes: Tuple[int, int, int] = (1, 3, 1)

    @nn.compact
    def __call__(self, x):
        def conv_gn(y, feats, k, name):
            y = nn.Conv(feats, (k, k), padding="SAME", use_bias=False,
                        name=f"{name}_conv")(y)
            return nn.GroupNorm(num_groups=min(self.num_groups, feats),
                                name=f"{name}_gn")(y)

        k1, k2, k3 = self.kernel_sizes
        sc = x
        if x.shape[-1] != self.out_channels:
            sc = conv_gn(x, self.out_channels, 1, "shortcut")
        h = jax.nn.relu(conv_gn(x, self.bottleneck_channels, k1, "conv1"))
        h = jax.nn.relu(conv_gn(h, self.bottleneck_channels, k2, "conv2"))
        h = conv_gn(h, self.out_channels, k3, "conv3")
        return jax.nn.relu(h + sc)


class AggregationNetwork(nn.Module):
    """Blend per-layer bottlenecked features with softmax mixing weights.

    __call__ input: [B, H, W, C_cat] where C_cat concatenates the per-layer
    channels in `feature_dims` order; output [B, H, W, projection_dim].
    """
    feature_dims: Sequence[int] = (640, 1280, 1280, 768)
    projection_dim: int = 384
    num_norm_groups: int = 32
    contrastive_temp: float = 10.0

    @nn.compact
    def __call__(self, x):
        mixing = self.param("mixing_weights", nn.initializers.ones,
                            (len(self.feature_dims),))
        # trainable CLIP logit scales (used by the losses)
        self.param("logit_scale", lambda k: jnp.asarray(np.log(1 / 0.07),
                                                        jnp.float32))
        self.param("self_logit_scale",
                   lambda k: jnp.asarray(np.log(self.contrastive_temp),
                                         jnp.float32))
        w = jax.nn.softmax(mixing)
        out = None
        start = 0
        for i, dim in enumerate(self.feature_dims):
            feats = x[..., start:start + dim]
            start += dim
            y = BottleneckBlock(self.projection_dim // 4,
                                self.projection_dim,
                                self.num_norm_groups,
                                name=f"bottleneck_{i}")(feats)
            y = y * w[i]
            out = y if out is None else out + y
        return out


def soft_argmax_displacement(sim, num_patches: int, *, window: int = 0,
                             beta: float = 0.02):
    """Correlation2Displacement forward: the soft-argmax mapping MINUS the
    identity grid (`corr_map_model.py:58-73` subtracts the meshgrid, unlike
    the eval-time `get_flow`). sim: [..., S, T] -> [..., S, 2]."""
    n = num_patches
    mapping = soft_argmax_flow(sim, n, window=window, beta=beta)
    s_idx = jnp.arange(n * n)
    grid = jnp.stack([(s_idx % n).astype(jnp.float32),
                      (s_idx // n).astype(jnp.float32)], axis=-1)
    return mapping - grid
