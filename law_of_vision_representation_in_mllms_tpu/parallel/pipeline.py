"""Pipeline parallelism for the decoder trunk (GPipe schedule, GSPMD-native).

The reference has no pipeline parallelism (SURVEY §2.9: deepspeed ZeRO over
NCCL only — `scripts/zero2.json`, `scripts/zero3.json`); this is scaling
headroom for decoders that exceed one chip even fully sharded. The design is
the standard JAX/TPU formulation (scaling-book pipelining recipe) expressed
in pure `jit` — no shard_map, no hand-written collectives:

- The stacked layer params `[L, ...]` (models/llama.py layout) reshape to
  `[S, L/S, ...]` with the leading axis sharded on the mesh's ``stage``
  axis: each stage group holds L/S contiguous layers.
- Activations circulate in a ``[S, microbatch, seq, d]`` buffer, also
  stage-sharded. One pipeline tick = ``jnp.roll(+1)`` along the stage axis
  (a shifted concat of two slices along a sharded axis — the SPMD
  partitioner lowers it to a neighbour CollectivePermute over ICI, the
  GPipe hand-off) + a fresh microbatch inserted at stage 0 + a vmapped
  per-stage layer scan (compute stays local: every operand is sharded on
  the vmapped axis).
- GPipe schedule: M microbatches drain through S stages in M + S - 1
  ticks; stage k processes microbatch t - k at tick t. Microbatch-specific
  tensors (positions for RoPE, key-validity mask) circulate alongside the
  activations so each stage always sees its microbatch's metadata. The
  bubble fraction is the usual (S-1)/(M+S-1); raise ``microbatches`` to
  amortize.
- Differentiable end to end (roll / dynamic_update / vmap / scan all have
  exact transposes), so `jax.grad` of the training loss yields the GPipe
  backward schedule for free; `remat=True` checkpoints each layer, bounding
  live activations to one microbatch per stage.

Composition: DP ("data" shards the microbatch dim), TP ("model" shards the
per-layer weight dims — the specs below keep the Megatron axes). ZeRO-2
composes (optimizer specs derive from param specs); ZeRO-3 re-sharding of
stage-sharded leaves is rejected for now. Embedding / final-norm / lm_head
stay replicated — at 7B they are ~4% of params — and the last stage's
hidden states broadcast once per microbatch for the (light) logits+loss.

Non-goals (v1): LoRA adapters and context parallelism do not compose with
pp; the KV-cached decode path keeps its own chunked-scan design
(models/decode.py) — pp serves training/prefill-style passes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.precision import Precision, DEFAULT_PRECISION
from ..models import llama as L


@dataclasses.dataclass(frozen=True)
class PipelineParallel:
    """Handle threaded through `llava.loss_fn` (like ContextParallel)."""
    mesh: Mesh
    stage_axis: str = "stage"
    # GPipe microbatch count; None -> one per stage (max bubble, min memory)
    microbatches: Optional[int] = None
    # checkpoint each pipeline tick: the backward recomputes a tick's
    # stage forwards instead of saving every tick's circulating
    # [S, mb, s, d] carry — cuts saved pipeline activations ~(M+S-1)-fold
    # on top of per-layer remat, for one extra forward of recompute
    remat_ticks: bool = False

    @property
    def n_stages(self) -> int:
        return self.mesh.shape[self.stage_axis]

    @property
    def n_micro(self) -> int:
        return self.microbatches or self.n_stages


def pp_layer_specs(dec_specs: dict, stage_axis: str = "stage") -> dict:
    """Rewrite the decoder's stacked-layer PartitionSpecs so the leading
    (layer) axis shards on the stage axis — composes with the Megatron TP
    axes on the remaining dims (`llama.param_partition_specs`)."""
    return {k: P(stage_axis, *tuple(s)[1:])
            for k, s in dec_specs["layers"].items()}


def _mesh_axes(mesh: Mesh):
    return set(mesh.axis_names)


def forward_pipelined(params, cfg: L.LlamaConfig, embeds, positions, *,
                      attn_mask=None, pp: PipelineParallel,
                      precision: Precision = DEFAULT_PRECISION,
                      use_flash: bool = False, remat: bool = False):
    """Pipelined trunk forward: `llama.forward` semantics for the no-cache
    (training / prefill-style) pass, GPipe-scheduled over pp.n_stages.

    Returns hidden [B, S, D] after the final RMSNorm (same contract as
    `llama.forward(...)[0]`).
    """
    mesh, ax = pp.mesh, pp.stage_axis
    S, M = pp.n_stages, pp.n_micro
    b, s, d = embeds.shape
    if cfg.num_layers % S:
        raise ValueError(f"num_layers {cfg.num_layers} not divisible by "
                         f"{S} pipeline stages")
    if b % M:
        raise ValueError(f"batch {b} not divisible by {M} microbatches")
    mb = b // M
    lps = cfg.num_layers // S
    cd = precision.compute_dtype
    has_data = "data" in _mesh_axes(mesh)

    def cons(x, *spec):
        spec = spec + (None,) * (x.ndim - len(spec))
        return lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))

    # ---- inputs: [B, ...] -> [M, mb, ...], mb dim data-sharded -----------
    def to_micro(x):
        y = x.reshape(M, mb, *x.shape[1:])
        return cons(y, None, "data") if has_data else y

    h = to_micro(embeds.astype(cd))
    pos = to_micro(positions)
    km = to_micro(attn_mask.astype(jnp.bool_) if attn_mask is not None
                  else jnp.ones((b, s), jnp.bool_))

    # ---- stage-resident weights: [L, ...] -> [S, L/S, ...] ---------------
    base = L.param_partition_specs(cfg)["layers"]

    def stage_weight(x, spec):
        y = x.reshape(S, lps, *x.shape[1:])
        rest = tuple(a if a in _mesh_axes(mesh) else None
                     for a in tuple(spec)[1:])
        return cons(y, ax, None, *rest)

    w = jax.tree.map(stage_weight, dict(params["layers"]), base)

    # ---- one stage: scan its local layers over one microbatch ------------
    def stage_fwd(wl, h_mb, pos_mb, km_mb):
        cos, sin = L.rope_tables(cfg, pos_mb)
        causal = pos_mb[:, None, :] <= pos_mb[:, :, None]       # [mb,s,s]
        mask = causal[:, None] & km_mb[:, None, None, :]        # [mb,1,s,s]

        def body(carry, lp):
            out, _ = L._layer(cfg, carry, lp, cos, sin, mask, None, None,
                              precision, use_flash=use_flash)
            return out, ()

        if remat:
            body = jax.checkpoint(body)
        out, _ = lax.scan(body, h_mb, wl)
        return out

    # ---- GPipe ticks ------------------------------------------------------
    def cons_state(st):
        return {k: cons(v, ax, "data") if has_data else cons(v, ax)
                for k, v in st.items()}

    state = cons_state({
        "h": jnp.zeros((S, mb, s, d), cd),
        "pos": jnp.zeros((S, mb, s), positions.dtype),
        "km": jnp.zeros((S, mb, s), jnp.bool_),
    })
    feed = {"h": h, "pos": pos, "km": km}
    outs = jnp.zeros((M, mb, s, d), cd)
    if has_data:
        outs = cons(outs, None, "data")

    def tick(carry, t):
        st, acc = carry
        # hand-off: stage i -> i+1 (the [S-1] -> [0] wraparound is garbage
        # and is immediately overwritten by the fresh feed below)
        st = jax.tree.map(lambda x: jnp.roll(x, 1, axis=0), st)
        fi = jnp.minimum(t, M - 1)      # ticks >= M re-feed a drained mb
        fresh = jax.tree.map(
            lambda x: lax.dynamic_index_in_dim(x, fi, 0, keepdims=False),
            feed)
        st = jax.tree.map(
            lambda buf, f: lax.dynamic_update_index_in_dim(buf, f, 0, 0),
            st, fresh)
        st = cons_state(st)
        st = {**st, "h": jax.vmap(stage_fwd)(w, st["h"], st["pos"],
                                             st["km"])}
        st = cons_state(st)
        # the microbatch exiting the last stage at tick t is exactly
        # t-(S-1); early ticks (<S-1, pipeline still filling) clamp to 0
        # and their garbage is overwritten when the real mb 0 exits
        acc = lax.dynamic_update_index_in_dim(
            acc, st["h"][S - 1], jnp.maximum(t - (S - 1), 0), 0)
        return (st, acc), ()

    if pp.remat_ticks:
        tick = jax.checkpoint(tick)
    (_, outs), _ = lax.scan(tick, (state, outs),
                            jnp.arange(M + S - 1, dtype=jnp.int32))
    hidden = outs.reshape(b, s, d)
    if has_data:
        hidden = cons(hidden, "data")
    return L.rms_norm(hidden, params["final_norm"], cfg.rms_eps)
