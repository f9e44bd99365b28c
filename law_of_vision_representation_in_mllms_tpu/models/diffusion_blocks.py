"""Shared building blocks for the diffusion towers (VAE / SD UNets).

Behavioral reference: the vendored diffusers 0.30
(`/root/reference/diffusers/src/diffusers/models/{resnet.py,attention.py,
embeddings.py,unets/unet_2d_blocks.py}`), reimplemented TPU-first in Flax:
NHWC conv layout, fp32 GroupNorm statistics, bf16 matmuls with fp32
accumulation, and no in-place anything. Weight porting transposes torch
[O,I,kh,kw] conv kernels to [kh,kw,I,O].
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.precision import Precision, DEFAULT_PRECISION
from ..ops.attention import mha


_ATTN_IMPL_OVERRIDE: Optional[str] = None


def set_attn_impl(impl: Optional[str]) -> None:
    """Select the diffusion-tower attention impl (None = exact softmax).

    Production entry: `model.diffusion_attn_impl` in RunConfig (the
    runners call this before building towers); "xla_expclamp_fused"
    measured +14% SD1.5@768 featurize (benchmarks/results.json). Read at
    TRACE time — flip before the first jit of a diffusion tower.
    """
    global _ATTN_IMPL_OVERRIDE
    _ATTN_IMPL_OVERRIDE = impl


def current_attn_impl() -> Optional[str]:
    """The impl `_attn` will resolve at the next trace (override or
    LVR_DIFFUSION_ATTN). Used by ops/clamp_guard wiring to decide
    whether a first-batch logit-headroom check is needed."""
    import os
    return _ATTN_IMPL_OVERRIDE or os.environ.get("LVR_DIFFUSION_ATTN")


# seq length at/above which "auto" routes to the Pallas flash kernel:
# at SD1.5@768 the 96x96 self-attentions (seq 9216) write [B,H,S,S]
# logits = ~1.3 GB/image/layer of HBM traffic under any XLA softmax;
# flash never materializes them. Short sequences stay on the fused
# no-max softmax (the measured ViT winner — Pallas loses there).
_AUTO_FLASH_MIN_SEQ = 4096


def _attn(q, k, v, accum_dtype):
    """UNet/transformer attention dispatch. `set_attn_impl` (or the
    LVR_DIFFUSION_ATTN env var) selects:

    - None (default): exact softmax (ops.attention.mha).
    - "xla_expclamp" / "xla_expclamp_fused": the no-max softmax
      (ops.attention.mha_expnomax{,_fused} — the round-3 ViT winners;
      the UNet's seq<=2304 self-attentions share the logits-HBM profile).
    - "flash": ops.flash_attention.flash_mha for every attention.
    - "auto": flash for self-attentions with seq >= 4096 (SD1.5@768's
      96x96 blocks), fused no-max softmax below.

    Read at trace time, so flipping requires a fresh jit (process) —
    benchmark-measured in benchmarks/run_all.py."""
    import os
    impl = _ATTN_IMPL_OVERRIDE or os.environ.get("LVR_DIFFUSION_ATTN")
    if impl == "xla_expclamp":
        from ..ops.attention import mha_expnomax
        return mha_expnomax(q, k, v, accum_dtype=accum_dtype)
    if impl == "auto" and q.shape[1] < _AUTO_FLASH_MIN_SEQ:
        impl = "xla_expclamp_fused"
    if impl == "xla_expclamp_fused":
        from ..ops.attention import mha_expnomax_fused
        return mha_expnomax_fused(q, k, v, accum_dtype=accum_dtype)
    if impl in ("flash", "auto"):
        from ..ops.flash_attention import flash_mha
        return flash_mha(q, k, v).astype(q.dtype)
    return mha(q, k, v, accum_dtype=accum_dtype)


def timestep_embedding(timesteps, dim: int, *, flip_sin_to_cos: bool = True,
                       freq_shift: float = 0.0, max_period: float = 10000.0):
    """Sinusoidal timestep embedding (`embeddings.py get_timestep_embedding`).

    timesteps: [B] float/int -> [B, dim] fp32.
    """
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = jnp.exp(exponent)[None] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class GroupNorm(nn.Module):
    """GroupNorm with statistics in the precision policy's accum dtype
    (fp32 by default; bf16 under BF16_TOWER_PRECISION — forcing fp32 here
    materializes an fp32 copy of every activation around each norm, which
    at VAE-encoder resolutions is gigabytes of extra HBM traffic per pass;
    the reference runs these nets wholesale in fp16, `dift_sd.py:226`)."""
    num_groups: int
    eps: float
    precision: Precision

    @nn.compact
    def __call__(self, x):
        sd = self.precision.accum_dtype
        y = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps,
                         dtype=sd,
                         param_dtype=self.precision.param_dtype,
                         name="gn")(x.astype(sd))
        return y.astype(self.precision.compute_dtype)


class Conv(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride),
                       padding=[(self.padding, self.padding)] * 2,
                       dtype=self.precision.compute_dtype,
                       param_dtype=self.precision.param_dtype,
                       name="conv")(x)


class TimestepEmbedMLP(nn.Module):
    """linear -> silu -> linear (`embeddings.py TimestepEmbedding`)."""
    dim: int
    precision: Precision

    @nn.compact
    def __call__(self, t_emb):
        cd = self.precision.compute_dtype
        h = nn.Dense(self.dim, dtype=cd,
                     param_dtype=self.precision.param_dtype,
                     name="fc1")(t_emb.astype(cd))
        h = jax.nn.silu(h)
        return nn.Dense(self.dim, dtype=cd,
                        param_dtype=self.precision.param_dtype,
                        name="fc2")(h)


class ResnetBlock(nn.Module):
    """GN -> silu -> conv -> (+temb) -> GN -> silu -> conv -> + shortcut
    (`resnet.py ResnetBlock2D`, default config)."""
    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    use_temb: bool = True
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, x, temb=None):
        prec = self.precision
        h = GroupNorm(self.groups, self.eps, prec, name="norm1")(x)
        h = jax.nn.silu(h)
        h = Conv(self.out_channels, precision=prec, name="conv1")(h)
        if self.use_temb and temb is not None:
            t = jax.nn.silu(temb)
            t = nn.Dense(self.out_channels, dtype=prec.compute_dtype,
                         param_dtype=prec.param_dtype,
                         name="time_emb_proj")(t)
            h = h + t[:, None, None, :]
        h = GroupNorm(self.groups, self.eps, prec, name="norm2")(h)
        h = jax.nn.silu(h)
        h = Conv(self.out_channels, precision=prec, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1),
                        dtype=prec.compute_dtype,
                        param_dtype=prec.param_dtype,
                        name="conv_shortcut")(x)
        return x + h


class Downsample(nn.Module):
    """stride-2 conv3x3 with asymmetric (0,1) padding
    (`resnet.py Downsample2D` with padding=0 -> F.pad (0,1,0,1)) — note SD
    UNets use padding=1 symmetric; the VAE encoder uses the asymmetric pad."""
    out_channels: int
    asymmetric_pad: bool = False
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, x):
        if self.asymmetric_pad:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = 0
        else:
            pad = 1
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                       padding=[(pad, pad)] * 2,
                       dtype=self.precision.compute_dtype,
                       param_dtype=self.precision.param_dtype,
                       name="conv")(x)


class Upsample(nn.Module):
    """nearest x2 then conv3x3 (`resnet.py Upsample2D`)."""
    out_channels: int
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return Conv(self.out_channels, precision=self.precision,
                    name="conv")(x)


class CrossAttention(nn.Module):
    """diffusers Attention: q/k/v without bias, out with bias."""
    query_dim: int
    heads: int
    head_dim: int
    context_dim: Optional[int] = None
    upcast: bool = False
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, x, context=None):
        prec = self.precision
        cd = prec.compute_dtype
        inner = self.heads * self.head_dim
        ctx = x if context is None else context
        dense = lambda feats, name, bias: nn.Dense(  # noqa: E731
            feats, use_bias=bias, dtype=cd, param_dtype=prec.param_dtype,
            name=name)
        b, s, _ = x.shape
        t = ctx.shape[1]
        q = dense(inner, "to_q", False)(x).reshape(b, s, self.heads,
                                                   self.head_dim)
        k = dense(inner, "to_k", False)(ctx).reshape(b, t, self.heads,
                                                     self.head_dim)
        v = dense(inner, "to_v", False)(ctx).reshape(b, t, self.heads,
                                                     self.head_dim)
        if self.upcast:
            q, k, v = q.astype(jnp.float32), k.astype(jnp.float32), \
                v.astype(jnp.float32)
        o = _attn(q, k, v, prec.accum_dtype).astype(cd)
        return dense(self.query_dim, "to_out", True)(o.reshape(b, s, inner))


class FeedForwardGEGLU(nn.Module):
    """LN already applied by caller; geglu: proj to 2*inner, gelu-gate
    (`attention.py FeedForward` default geglu)."""
    dim: int
    mult: int = 4
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, x):
        prec = self.precision
        cd = prec.compute_dtype
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=cd, param_dtype=prec.param_dtype,
                     name="proj_in")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=cd, param_dtype=prec.param_dtype,
                        name="proj_out")(h)


class LayerNorm(nn.Module):
    eps: float
    precision: Precision
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32,
                         use_bias=self.use_bias, use_scale=self.use_scale,
                         param_dtype=self.precision.param_dtype,
                         name="ln")(x.astype(jnp.float32))
        return y.astype(self.precision.compute_dtype)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> geglu FF, pre-LN residuals
    (`attention.py BasicTransformerBlock`)."""
    dim: int
    heads: int
    head_dim: int
    context_dim: int
    upcast: bool = False
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, x, context):
        prec = self.precision
        h = LayerNorm(1e-5, prec, name="norm1")(x)
        x = x + CrossAttention(self.dim, self.heads, self.head_dim,
                               upcast=self.upcast, precision=prec,
                               name="attn1")(h)
        h = LayerNorm(1e-5, prec, name="norm2")(x)
        x = x + CrossAttention(self.dim, self.heads, self.head_dim,
                               context_dim=self.context_dim,
                               upcast=self.upcast, precision=prec,
                               name="attn2")(h, context)
        h = LayerNorm(1e-5, prec, name="norm3")(x)
        return x + FeedForwardGEGLU(self.dim, precision=prec, name="ff")(h)


class SpatialTransformer(nn.Module):
    """Transformer2DModel: GN -> proj_in -> blocks -> proj_out -> +residual.

    use_linear_projection False (SD1.5): 1x1 convs; True (SD2.1/XL): dense
    after flattening.
    """
    channels: int
    heads: int
    head_dim: int
    depth: int
    context_dim: int
    use_linear_projection: bool = False
    upcast: bool = False
    groups: int = 32
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, x, context):
        prec = self.precision
        b, h, w, c = x.shape
        residual = x
        y = GroupNorm(self.groups, 1e-6, prec, name="norm")(x)
        if self.use_linear_projection:
            y = y.reshape(b, h * w, c)
            y = nn.Dense(self.channels, dtype=prec.compute_dtype,
                         param_dtype=prec.param_dtype, name="proj_in")(y)
        else:
            y = nn.Conv(self.channels, (1, 1), dtype=prec.compute_dtype,
                        param_dtype=prec.param_dtype, name="proj_in")(y)
            y = y.reshape(b, h * w, self.channels)
        for i in range(self.depth):
            y = BasicTransformerBlock(self.channels, self.heads,
                                      self.head_dim, self.context_dim,
                                      upcast=self.upcast, precision=prec,
                                      name=f"block_{i}")(y, context)
        if self.use_linear_projection:
            y = nn.Dense(c, dtype=prec.compute_dtype,
                         param_dtype=prec.param_dtype, name="proj_out")(y)
            y = y.reshape(b, h, w, c)
        else:
            y = y.reshape(b, h, w, self.channels)
            y = nn.Conv(c, (1, 1), dtype=prec.compute_dtype,
                        param_dtype=prec.param_dtype, name="proj_out")(y)
        return y + residual


class VAESelfAttention(nn.Module):
    """Single-head GN self-attention in the VAE mid block
    (diffusers `Attention` with spatial norm / group norm)."""
    channels: int
    groups: int = 32
    eps: float = 1e-6
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, x):
        prec = self.precision
        b, h, w, c = x.shape
        y = GroupNorm(self.groups, self.eps, prec, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        dense = lambda name, bias=True: nn.Dense(  # noqa: E731
            self.channels, use_bias=bias, dtype=prec.compute_dtype,
            param_dtype=prec.param_dtype, name=name)
        q = dense("to_q")(y)[:, :, None, :]   # single head
        k = dense("to_k")(y)[:, :, None, :]
        v = dense("to_v")(y)[:, :, None, :]
        o = mha(q.reshape(b, h * w, 1, c), k.reshape(b, h * w, 1, c),
                v.reshape(b, h * w, 1, c), accum_dtype=prec.accum_dtype)
        o = dense("to_out")(o.reshape(b, h * w, c))
        return x + o.reshape(b, h, w, c)


def ddim_alphas_cumprod(num_steps: int = 1000, beta_start: float = 0.00085,
                        beta_end: float = 0.012,
                        schedule: str = "scaled_linear"):
    """DDIM alphas_cumprod for SD (`schedulers/scheduling_ddim.py`)."""
    if schedule == "scaled_linear":
        betas = jnp.linspace(beta_start ** 0.5, beta_end ** 0.5, num_steps,
                             dtype=jnp.float32) ** 2
    elif schedule == "linear":
        betas = jnp.linspace(beta_start, beta_end, num_steps,
                             dtype=jnp.float32)
    else:
        raise ValueError(schedule)
    return jnp.cumprod(1.0 - betas)


def add_noise(latents, noise, t, alphas_cumprod):
    """DDIMScheduler.add_noise: sqrt(acp_t) x0 + sqrt(1-acp_t) eps."""
    acp = alphas_cumprod[t]
    return (jnp.sqrt(acp) * latents.astype(jnp.float32)
            + jnp.sqrt(1.0 - acp) * noise.astype(jnp.float32)
            ).astype(latents.dtype)
