"""Golden tests for DiT and SD3-MMDiT harvest vs the vendored diffusers,
including the timestep-only conditioning swap and the 2x2 token unfold."""

import sys

import numpy as np
import pytest
import jax.numpy as jnp
import torch

sys.path.insert(0, "/root/reference/diffusers/src")

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models import dit as D
from law_of_vision_representation_in_mllms_tpu.models import mmdit as M
from law_of_vision_representation_in_mllms_tpu.io.diffusers_port import (
    port_dit, port_mmdit)

diffusers = pytest.importorskip("diffusers")


def _nhwc(x):
    return np.ascontiguousarray(x.transpose(0, 2, 3, 1))


def _tiny_hf_dit():
    from diffusers import DiTTransformer2DModel
    torch.manual_seed(0)
    return DiTTransformer2DModel(
        num_attention_heads=2, attention_head_dim=8, in_channels=4,
        num_layers=3, sample_size=8, patch_size=2, num_embeds_ada_norm=10,
        norm_type="ada_norm_zero").eval()


def _ref_dit_harvest(hf, latents, t, up_ft_indices):
    """MyDiTTransformer2DModel semantics: per-block timestep-ONLY
    conditioning (class embedding stripped), harvest hidden states."""
    with torch.no_grad():
        x = hf.pos_embed(latents)
        n = len(hf.transformer_blocks)
        ts = torch.full((latents.shape[0],), t, dtype=torch.long)
        out = {}
        for i, block in enumerate(hf.transformer_blocks):
            # emulate the swapped MyCombinedTimestepLabelEmbeddings
            emb_mod = block.norm1.emb
            t_proj = emb_mod.time_proj(ts)
            cond = emb_mod.timestep_embedder(t_proj.to(x.dtype))
            mod = block.norm1.linear(torch.nn.functional.silu(cond))
            shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
                mod.chunk(6, dim=1)
            h = block.norm1.norm(x) * (1 + scale_msa[:, None]) + \
                shift_msa[:, None]
            attn = block.attn1(h)
            x = x + gate_msa.unsqueeze(1) * attn
            h = block.norm3(x) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
            x = x + gate_mlp.unsqueeze(1) * block.ff(h)
            if i - n in up_ft_indices:
                out[i - n] = x
            elif i in up_ft_indices:
                out[i] = x
        return out


def test_dit_harvest_golden():
    hf = _tiny_hf_dit()
    cfg = D.DiTConfig(in_channels=4, hidden_size=16, num_layers=3,
                      num_heads=2, sample_size=8)
    rng = np.random.RandomState(0)
    lat = rng.randn(2, 4, 8, 8).astype(np.float32)
    up_ft = (-1, 0)

    ref = _ref_dit_harvest(hf, torch.from_numpy(lat), 1, up_ft)
    params = port_dit(hf.state_dict(), cfg, up_ft)
    got = D.DiTHarvest(cfg, up_ft, FP32_PRECISION).apply(
        {"params": params}, jnp.asarray(_nhwc(lat)), 1)
    for i in up_ft:
        np.testing.assert_allclose(np.asarray(got[i]), ref[i].numpy(),
                                   atol=3e-4, rtol=1e-3)


def test_unfold_matches_torch():
    rng = np.random.RandomState(1)
    b, n, c = 2, 16, 3   # 4x4 grid
    tokens = rng.randn(b, n, c).astype(np.float32)
    h = w = 4
    t = torch.from_numpy(tokens)
    ref = t.transpose(2, 1).reshape(b, -1, h, w)
    ref = ref.unfold(3, 2, 2).unfold(2, 2, 2)
    ref = ref.reshape(b, -1, h // 2, w // 2, 4).permute(0, 4, 1, 2, 3)
    ref = ref.reshape(b, -1, h // 2, w // 2)              # [B, 4C, 2, 2]
    ref_tokens = ref.reshape(b, 4 * c, -1).transpose(2, 1).numpy()

    got = np.asarray(D.unfold_tokens_2x2(jnp.asarray(tokens)))
    np.testing.assert_allclose(got, ref_tokens, atol=1e-6)


def test_mmdit_harvest_golden():
    from diffusers import SD3Transformer2DModel
    torch.manual_seed(2)
    hf = SD3Transformer2DModel(
        sample_size=8, patch_size=2, in_channels=4, num_layers=2,
        attention_head_dim=8, num_attention_heads=2,
        joint_attention_dim=24, caption_projection_dim=16,
        pooled_projection_dim=12, out_channels=4,
        pos_embed_max_size=8).eval()
    cfg = M.MMDiTConfig(in_channels=4, hidden_size=16, num_layers=2,
                        num_heads=2, context_dim=24, pooled_dim=12,
                        pos_embed_max_size=8)
    rng = np.random.RandomState(3)
    lat = rng.randn(2, 4, 8, 8).astype(np.float32)
    ctx = rng.randn(2, 7, 24).astype(np.float32)
    pooled = rng.randn(2, 12).astype(np.float32)
    up_ft = (-1, 0)

    # reference harvest (MySD3Transformer2DModell semantics)
    with torch.no_grad():
        x = hf.pos_embed(torch.from_numpy(lat))
        temb = hf.time_text_embed(torch.full((2,), 1, dtype=torch.long),
                                  torch.from_numpy(pooled))
        c = hf.context_embedder(torch.from_numpy(ctx))
        ref = {}
        n = len(hf.transformer_blocks)
        for i, block in enumerate(hf.transformer_blocks):
            c, x = block(hidden_states=x, encoder_hidden_states=c, temb=temb)
            if i - n in up_ft:
                ref[i - n] = x
            elif i in up_ft:
                ref[i] = x

    params = port_mmdit(hf.state_dict(), cfg, up_ft)
    got = M.MMDiTHarvest(cfg, up_ft, FP32_PRECISION).apply(
        {"params": params}, jnp.asarray(_nhwc(lat)), 1,
        jnp.asarray(ctx), jnp.asarray(pooled))
    for i in up_ft:
        np.testing.assert_allclose(np.asarray(got[i]), ref[i].numpy(),
                                   atol=5e-4, rtol=1e-3)


def test_flow_match_add_noise_golden():
    sys.path.insert(0, "/root/reference/diffusers/src")
    from diffusers.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler)
    sch = FlowMatchEulerDiscreteScheduler()
    rng = np.random.RandomState(4)
    lat = rng.randn(2, 4, 4, 4).astype(np.float32)
    noise = rng.randn(2, 4, 4, 4).astype(np.float32)
    t = torch.full((2,), 1, dtype=torch.long)
    ref = sch.add_noise(torch.from_numpy(lat), torch.from_numpy(noise),
                        t).numpy()
    got = np.asarray(M.flow_match_add_noise(
        jnp.asarray(lat), jnp.asarray(noise),
        jnp.full((2, 1, 1, 1), 1.0)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_dit_fast_attn_impl_equivalent():
    """`model.diffusion_attn_impl` now reaches DiT/MMDiT (the dispatch in
    diffusion_blocks._attn): the fused no-max softmax must match the
    exact path at fp32 on the DiT forward."""
    import jax
    from law_of_vision_representation_in_mllms_tpu.models import (
        diffusion_blocks as DB)

    cfg = D.DiTConfig(in_channels=4, hidden_size=16, num_layers=3,
                      num_heads=2, sample_size=8)
    rng = np.random.RandomState(5)
    lat = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    mod = D.DiTHarvest(cfg, (-1,), FP32_PRECISION)
    params = mod.init(jax.random.PRNGKey(0), lat, 1)
    try:
        DB.set_attn_impl(None)
        ref = mod.apply(params, lat, 1)[-1]
        DB.set_attn_impl("xla_expclamp_fused")
        got = mod.apply(params, lat, 1)[-1]
    finally:
        DB.set_attn_impl(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
