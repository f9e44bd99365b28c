"""DiT-XL/2 feature extractor (facebook/DiT-XL-2-512).

Behavioral reference: `dift_dit.py` (MyDiTTransformer2DModel + the
timestep-only conditioning swap `MyCombinedTimestepLabelEmbeddings:9-16` that
strips class conditioning) over diffusers `DiTTransformer2DModel`.

Structure: patchify (conv p=2 on the VAE latent) + fixed 2D sincos position
embeddings, then N adaLN-Zero blocks (self-attention with qkv bias, tanh-GELU
MLP, per-block timestep modulation). Hidden states are harvested after the
requested block indices (negative indices count from the end); only blocks up
to the max harvested index are built. The 2x2 token unfold
(`dift_dit.py:192-195`) lives in `unfold_tokens_2x2`.
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
from .diffusion_blocks import _attn


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    in_channels: int = 4
    hidden_size: int = 1152
    num_layers: int = 28
    num_heads: int = 16
    patch_size: int = 2
    sample_size: int = 64           # latent grid (512 / 8)
    timestep_freq_shift: float = 1.0  # CombinedTimestepLabelEmbeddings

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def dit_xl_2() -> DiTConfig:
    return DiTConfig()


TINY_TEST_CONFIG = DiTConfig(hidden_size=16, num_layers=3, num_heads=2,
                             sample_size=8)


def sincos_pos_embed_2d(embed_dim: int, grid_h: int, grid_w: int,
                        base_size: int = 16, interpolation_scale: float = 1.0,
                        scale_by_base: bool = False) -> np.ndarray:
    """diffusers `get_2d_sincos_pos_embed` (embeddings.py): half the dim
    encodes the grid y, half the x, each as [sin, cos] over 10000^(-2i/d)."""
    def axis(pos, dim):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gh = np.arange(grid_h, dtype=np.float32)
    gw = np.arange(grid_w, dtype=np.float32)
    if scale_by_base:
        gh = gh / (grid_h / base_size) / interpolation_scale
        gw = gw / (grid_w / base_size) / interpolation_scale
    grid = np.meshgrid(gw, gh)                      # x varies fastest
    grid = np.stack(grid)                           # [2, h, w]
    emb_x = axis(grid[0], embed_dim // 2)
    emb_y = axis(grid[1], embed_dim // 2)
    return np.concatenate([emb_x, emb_y], axis=1).astype(np.float32)


class AdaLNZero(nn.Module):
    """linear(silu(cond)) -> 6 modulation tensors; LN without affine."""
    dim: int
    precision: Precision

    @nn.compact
    def __call__(self, x, cond):
        prec = self.precision
        cd = prec.compute_dtype
        mod = nn.Dense(6 * self.dim, dtype=cd,
                       param_dtype=prec.param_dtype,
                       name="linear")(jax.nn.silu(cond.astype(cd)))
        parts = jnp.split(mod, 6, axis=-1)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = parts
        h = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         dtype=jnp.float32,
                         name="norm")(x.astype(jnp.float32)).astype(cd)
        h = h * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return h, gate_msa, shift_mlp, scale_mlp, gate_mlp


class SelfAttentionBias(nn.Module):
    """qkv with bias, out with bias (DiT attention_bias=True)."""
    dim: int
    heads: int
    precision: Precision

    @nn.compact
    def __call__(self, x):
        prec = self.precision
        cd = prec.compute_dtype
        b, s, _ = x.shape
        hd = self.dim // self.heads
        dense = lambda name: nn.Dense(self.dim, dtype=cd,  # noqa: E731
                                      param_dtype=prec.param_dtype, name=name)
        q = dense("to_q")(x).reshape(b, s, self.heads, hd)
        k = dense("to_k")(x).reshape(b, s, self.heads, hd)
        v = dense("to_v")(x).reshape(b, s, self.heads, hd)
        # routed through the diffusion attention dispatch so
        # model.diffusion_attn_impl reaches DiT/MMDiT too
        o = _attn(q, k, v, prec.accum_dtype)
        return dense("to_out")(o.reshape(b, s, self.dim))


class FFGeluTanh(nn.Module):
    dim: int
    mult: int = 4
    precision: Precision = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, x):
        prec = self.precision
        cd = prec.compute_dtype
        h = nn.Dense(self.dim * self.mult, dtype=cd,
                     param_dtype=prec.param_dtype, name="proj_in")(x)
        h = jax.nn.gelu(h, approximate=True)
        return nn.Dense(self.dim, dtype=cd, param_dtype=prec.param_dtype,
                        name="proj_out")(h)


class DiTBlock(nn.Module):
    cfg: DiTConfig
    precision: Precision

    @nn.compact
    def __call__(self, x, t_cond):
        cfg, prec = self.cfg, self.precision
        h, gate_msa, shift_mlp, scale_mlp, gate_mlp = AdaLNZero(
            cfg.hidden_size, prec, name="norm1")(x, t_cond)
        attn = SelfAttentionBias(cfg.hidden_size, cfg.num_heads, prec,
                                 name="attn1")(h)
        x = x + gate_msa[:, None] * attn
        h = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False,
                         dtype=jnp.float32,
                         name="norm3")(x.astype(jnp.float32)
                                       ).astype(prec.compute_dtype)
        h = h * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        h = FFGeluTanh(cfg.hidden_size, precision=prec, name="ff")(h)
        return x + gate_mlp[:, None] * h


class DiTHarvest(nn.Module):
    """Run blocks, harvest token hidden states at the given indices."""
    cfg: DiTConfig
    up_ft_indices: Tuple[int, ...] = (-1,)
    precision: Precision = DEFAULT_PRECISION

    def _resolved(self):
        return tuple(i % self.cfg.num_layers for i in self.up_ft_indices)

    @nn.compact
    def __call__(self, latents, timestep):
        """latents: [B, h, w, C] noisy VAE latents; timestep scalar.
        Returns {original_index: [B, N, hidden]}."""
        cfg, prec = self.cfg, self.precision
        cd = prec.compute_dtype
        b, h, w, c = latents.shape
        p = cfg.patch_size
        gh, gw = h // p, w // p

        x = nn.Conv(cfg.hidden_size, (p, p), strides=(p, p), padding="VALID",
                    dtype=cd, param_dtype=prec.param_dtype,
                    name="patch_proj")(latents.astype(cd))
        x = x.reshape(b, gh * gw, cfg.hidden_size)
        # HF PatchEmbed rescales grid coords by (grid/base) when run at a
        # non-native resolution (diffusers embeddings.py PatchEmbed.forward)
        base = cfg.sample_size // cfg.patch_size
        pos = sincos_pos_embed_2d(cfg.hidden_size, gh, gw, base_size=base,
                                  scale_by_base=(gh != base or gw != base))
        x = x + jnp.asarray(pos, cd)[None]

        # per-block timestep conditioning (class stripped,
        # `dift_dit.py MyCombinedTimestepLabelEmbeddings`)
        ts = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32), (b,))
        t_emb = timestep_embedding(ts, 256,
                                   freq_shift=cfg.timestep_freq_shift)

        resolved = self._resolved()
        harvested = {}
        for i in range(max(resolved) + 1):
            cond = TimestepEmbedMLP(cfg.hidden_size, prec,
                                    name=f"t_embedder_{i}")(t_emb)
            x = DiTBlock(cfg, prec, name=f"block_{i}")(x, cond)
            if i in resolved:
                orig = self.up_ft_indices[resolved.index(i)]
                harvested[orig] = x
        return harvested


def unfold_tokens_2x2(tokens):
    """[B, N, C] row-major token grid -> [B, (h/2)(w/2), 4C]
    (`dift_dit.py:192-195`): output channel = offset*C + c with offset =
    x_offset*2 + y_offset, matching the torch double-unfold order."""
    b, n, c = tokens.shape
    h = w = int(round(n ** 0.5))
    grid = tokens.reshape(b, h // 2, 2, w // 2, 2, c)   # [B,y2,yo,x2,xo,C]
    # torch order: offset = xo*2 + yo -> put xo before yo
    grid = grid.transpose(0, 1, 3, 4, 2, 5)             # [B,y2,x2,xo,yo,C]
    grid = grid.reshape(b, (h // 2) * (w // 2), 4 * c)
    return grid
