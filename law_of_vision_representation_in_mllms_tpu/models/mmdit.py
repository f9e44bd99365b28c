"""SD3 MMDiT feature extractor (stabilityai/stable-diffusion-3-medium).

Behavioral reference: `dift_sd3.py MySD3Transformer2DModell:12-90` over
diffusers `SD3Transformer2DModel`: patchify + cropped position embedding,
timestep+pooled-text conditioning, N joint transformer blocks (dual-stream:
latent tokens and context tokens each with their own adaLN-Zero and
projections, one shared attention over the concatenated sequence), harvesting
the LATENT-stream hidden states at the requested block indices. T5
(text_encoder_3) is dropped (`dift_sd3.py:131-132`) — its context slots are
zeros from the pipeline's padding. Only blocks up to the max harvested index
are built.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.precision import Precision, DEFAULT_PRECISION
from .diffusion_blocks import timestep_embedding, TimestepEmbedMLP
from .dit import AdaLNZero, FFGeluTanh
from .diffusion_blocks import _attn


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    in_channels: int = 16
    hidden_size: int = 1536
    num_layers: int = 24
    num_heads: int = 24
    patch_size: int = 2
    context_dim: int = 4096          # T5/CLIP joint context width
    pooled_dim: int = 2048           # pooled CLIP-L + bigG
    pos_embed_max_size: int = 192

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def sd3_medium() -> MMDiTConfig:
    return MMDiTConfig()


TINY_TEST_CONFIG = MMDiTConfig(in_channels=4, hidden_size=16, num_layers=2,
                               num_heads=2, context_dim=24, pooled_dim=12,
                               pos_embed_max_size=8)


class JointBlock(nn.Module):
    """MMDiT dual-stream block (`attention.py JointTransformerBlock`)."""
    cfg: MMDiTConfig
    context_pre_only: bool = False
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, x, ctx, cond):
        cfg, prec = self.cfg, self.precision
        cd = prec.compute_dtype
        d = cfg.hidden_size
        b, s, _ = x.shape
        t = ctx.shape[1]
        hd = cfg.head_dim

        hx, gate_msa, shift_mlp, scale_mlp, gate_mlp = AdaLNZero(
            d, prec, name="norm1")(x, cond)
        if self.context_pre_only:
            # AdaLayerNormContinuous: linear(silu(cond)) -> (scale, shift)
            mod = nn.Dense(2 * d, dtype=cd, param_dtype=prec.param_dtype,
                           name="norm1_context_linear")(
                jax.nn.silu(cond.astype(cd)))
            scale_c, shift_c = jnp.split(mod, 2, axis=-1)
            hc = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                              dtype=jnp.float32, name="norm1_context_norm")(
                ctx.astype(jnp.float32)).astype(cd)
            hc = hc * (1 + scale_c[:, None]) + shift_c[:, None]
        else:
            hc, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = AdaLNZero(
                d, prec, name="norm1_context")(ctx, cond)

        dense = lambda name: nn.Dense(d, dtype=cd,  # noqa: E731
                                      param_dtype=prec.param_dtype, name=name)
        # joint attention: concat [latent, context] along sequence
        q = jnp.concatenate([dense("to_q")(hx), dense("add_q_proj")(hc)], 1)
        k = jnp.concatenate([dense("to_k")(hx), dense("add_k_proj")(hc)], 1)
        v = jnp.concatenate([dense("to_v")(hx), dense("add_v_proj")(hc)], 1)
        q = q.reshape(b, s + t, cfg.num_heads, hd)
        k = k.reshape(b, s + t, cfg.num_heads, hd)
        v = v.reshape(b, s + t, cfg.num_heads, hd)
        # routed through the diffusion attention dispatch so
        # model.diffusion_attn_impl reaches DiT/MMDiT too
        o = _attn(q, k, v, prec.accum_dtype)
        o = o.reshape(b, s + t, d)
        attn_x, attn_c = o[:, :s], o[:, s:]

        x = x + gate_msa[:, None] * dense("to_out")(attn_x)
        h = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         dtype=jnp.float32, name="norm2")(
            x.astype(jnp.float32)).astype(cd)
        h = h * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        x = x + gate_mlp[:, None] * FFGeluTanh(d, precision=prec,
                                               name="ff")(h)

        if self.context_pre_only:
            return x, None
        ctx = ctx + c_gate_msa[:, None] * dense("to_add_out")(attn_c)
        h = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         dtype=jnp.float32, name="norm2_context")(
            ctx.astype(jnp.float32)).astype(cd)
        h = h * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        ctx = ctx + c_gate_mlp[:, None] * FFGeluTanh(
            d, precision=prec, name="ff_context")(h)
        return x, ctx


class MMDiTHarvest(nn.Module):
    cfg: MMDiTConfig
    up_ft_indices: Tuple[int, ...] = (-1,)
    precision: Precision = DEFAULT_PRECISION

    def _resolved(self):
        return tuple(i % self.cfg.num_layers for i in self.up_ft_indices)

    @nn.compact
    def __call__(self, latents, timestep, context, pooled):
        """latents [B,h,w,C]; context [B,T,context_dim]; pooled
        [B,pooled_dim]. Returns {index: [B, N, hidden]} latent-stream states."""
        cfg, prec = self.cfg, self.precision
        cd = prec.compute_dtype
        b, h, w, c = latents.shape
        p = cfg.patch_size
        gh, gw = h // p, w // p

        x = nn.Conv(cfg.hidden_size, (p, p), strides=(p, p), padding="VALID",
                    dtype=cd, param_dtype=prec.param_dtype,
                    name="patch_proj")(latents.astype(cd))
        x = x.reshape(b, gh * gw, cfg.hidden_size)
        # cropped position embedding (SD3 PatchEmbed with pos_embed_max_size):
        # stored as a buffer over the max grid; center-crop to (gh, gw)
        pos = self.param("pos_embed",
                         nn.initializers.zeros,
                         (1, cfg.pos_embed_max_size * cfg.pos_embed_max_size,
                          cfg.hidden_size), jnp.float32)
        m = cfg.pos_embed_max_size
        top, left = (m - gh) // 2, (m - gw) // 2
        pos2d = pos.reshape(1, m, m, cfg.hidden_size)
        pos_crop = pos2d[:, top:top + gh, left:left + gw].reshape(
            1, gh * gw, cfg.hidden_size)
        x = x + pos_crop.astype(cd)

        ts = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32), (b,))
        t_emb = timestep_embedding(ts, 256, freq_shift=0.0)
        cond = TimestepEmbedMLP(cfg.hidden_size, prec,
                                name="timestep_embedder")(t_emb)
        cond = cond + TimestepEmbedMLP(cfg.hidden_size, prec,
                                       name="text_embedder")(
            pooled.astype(cd))

        ctx = nn.Dense(cfg.hidden_size, dtype=cd,
                       param_dtype=prec.param_dtype,
                       name="context_embedder")(context.astype(cd))

        resolved = self._resolved()
        harvested = {}
        for i in range(max(resolved) + 1):
            pre_only = i == cfg.num_layers - 1
            x, ctx = JointBlock(cfg, pre_only, prec,
                                name=f"block_{i}")(x, ctx, cond)
            if i in resolved:
                orig = self.up_ft_indices[resolved.index(i)]
                harvested[orig] = x
        return harvested


def flow_match_add_noise(latents, noise, t, num_train_timesteps: int = 1000):
    """FlowMatchEulerDiscreteScheduler.add_noise as the reference invokes it
    (`dift_sd3.py:112` with integer t): x_t = t*x0 + (1-t)*noise — NOTE the
    raw (unnormalized) integer t, reproducing the reference's behavior where
    t=1 returns the clean latents."""
    t = jnp.asarray(t, jnp.float32)
    return (t * latents.astype(jnp.float32)
            + (1.0 - t) * noise.astype(jnp.float32)).astype(latents.dtype)
