"""Ring attention — sequence/context parallelism over a mesh axis.

The reference has NO long-context machinery (SURVEY.md §5: sequences capped
at 2048, no ring attention / Ulysses / context parallel); this is TPU-native
headroom: shard the sequence over a mesh axis, keep each device's Q block
resident, and rotate K/V blocks around the ring with `lax.ppermute` while
accumulating online-softmax partials (flash-style across devices). The
collectives ride ICI; wall-clock is max(compute, ring hop), and no device
ever materializes the full [S, S] score matrix or the full K/V.

Supports the real decoder workload (`models/llama.forward(cp=...)`):
grouped-query attention (K/V rotate at their TRUE kv-head size — repeating
heads before the ring would multiply ICI traffic by the group factor) and a
per-key validity mask for right-padded batches (the [B, S_local] mask shard
rotates with its K/V block).

Use under `shard_map` with q/k/v sharded on the sequence dimension:

    attn = shard_map(partial(ring_attention, axis_name="seq"),
                     mesh, in_specs=P("data", "seq", None, None) * 3,
                     out_specs=P("data", "seq", None, None))
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class ContextParallel:
    """How to embed ring attention in a model's mesh.

    seq_axis carries the ring; data_axis (optional) shards batch;
    head_axis (optional) composes with tensor parallelism — attention is
    head-parallel, so the TP axis needs no collectives inside the ring.
    Axes present in the mesh but set to None here are gathered by
    shard_map (correct, but wasteful — name them when they shard q/k/v).
    """
    mesh: object
    seq_axis: str = "seq"
    data_axis: str | None = "data"
    head_axis: str | None = "model"


def ring_attention(q, k, v, *, axis_name: str, causal: bool = False,
                   scale: float | None = None, kv_mask=None):
    """q: LOCAL shard [B, S_local, H, D]; k/v: [B, S_local, KV, D] with
    H % KV == 0 (GQA: query head h reads kv head h // (H/KV), HF
    repeat_interleave semantics — same mapping as `llama._attention`);
    kv_mask: optional [B, S_local] bool key validity (False = padded key,
    attended by nobody). All already inside shard_map.

    Returns the local output shard [B, S_local, H, D].
    """
    b, sl, nh, d = q.shape
    nkv = k.shape[2]
    g = nh // nkv
    if scale is None:
        scale = d ** -0.5
    n = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)

    qf = (q.astype(jnp.float32) * scale).reshape(b, sl, nkv, g, d)
    # jax >= 0.8 shard_map tracks varying-manual-axes: the scan carry must
    # enter marked device-varying exactly like its outputs. Deriving the
    # init from q inherits q's full varying set (e.g. {data, seq, model}
    # on a 3-axis mesh), which pcast over just the ring axis would not.
    zq = qf[:, :, :, :, :1].transpose(0, 2, 3, 1, 4) * 0.0  # [B,KV,G,Sl,1]
    m = zq + NEG_INF
    l = zq
    acc = jnp.zeros((b, nkv, g, sl, d), jnp.float32) + zq
    if kv_mask is None:
        # all-true, but varying like k (it rides the rotating carry)
        kv_mask = jnp.logical_or(k[:, :, 0, 0] == 0, True)
    kv_mask = kv_mask.astype(jnp.bool_)

    q_pos = idx * sl + jnp.arange(sl)                       # global q rows

    def step(carry, step_i):
        m, l, acc, k_cur, v_cur, mask_cur = carry
        src = (idx - step_i) % n                            # k_cur's owner
        k_pos = src * sl + jnp.arange(sl)
        s = jnp.einsum("bqhgd,bkhd->bhgqk", qf,
                       k_cur.astype(jnp.float32))
        valid = mask_cur[:, None, None, None, :]            # [B,1,1,1,Sk]
        if causal:
            ok = k_pos[None, :] <= q_pos[:, None]           # [Sq, Sk]
            valid = valid & ok[None, None, None]
        s = jnp.where(valid, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_new)
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("bhgqk,bkhd->bhgqd", p,
                        v_cur.astype(jnp.float32))
        acc_new = acc * alpha + pv
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_nxt = lax.ppermute(k_cur, axis_name, perm)
        v_nxt = lax.ppermute(v_cur, axis_name, perm)
        mask_nxt = lax.ppermute(mask_cur, axis_name, perm)
        return (m_new, l_new, acc_new, k_nxt, v_nxt, mask_nxt), ()

    (m, l, acc, _, _, _), _ = lax.scan(step, (m, l, acc, k, v, kv_mask),
                                       jnp.arange(n))
    out = acc / jnp.maximum(l, 1e-30)                       # [B,KV,G,Sl,D]
    out = out.transpose(0, 3, 1, 2, 4).reshape(b, sl, nh, d)
    return out.astype(q.dtype)


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        from jax import shard_map  # jax >= 0.8 (no check_rep arg)
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs)
    except ImportError:
        from jax.experimental.shard_map import shard_map
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def make_ring_attention(mesh, *, axis_name: str = "data",
                        causal: bool = False, spec=None, with_mask=False):
    """shard_map-wrapped ring attention over full [B, S, H, D] arrays.

    ``spec`` overrides the q/k/v PartitionSpec — pass the full-mesh
    layout (e.g. P("data", "seq", "model", None)) when the mesh carries
    batch/TP axes besides the ring axis; collectives still ride only
    ``axis_name``. With ``with_mask`` the returned fn takes a fourth
    [B, S] bool key-validity argument (sharded on the spec's first two
    axes)."""
    from jax.sharding import PartitionSpec as P

    if spec is None:
        spec = P(None, axis_name, None, None)
    fn = functools.partial(ring_attention, axis_name=axis_name,
                           causal=causal)
    if with_mask:
        mask_spec = P(spec[0], spec[1])
        wrapped = lambda q, k, v, mask: fn(q, k, v, kv_mask=mask)  # noqa: E731
        return _shard_map(wrapped, mesh,
                          (spec, spec, spec, mask_spec), spec)
    return _shard_map(fn, mesh, (spec, spec, spec), spec)


def make_cp_attention(cp: ContextParallel, *, causal: bool = True):
    """Decoder-attention entry for `llama.forward(cp=...)`: returns
    fn(q, k, v, key_valid) with q/k/v laid out
    P(data_axis, seq_axis, head_axis, None)."""
    from jax.sharding import PartitionSpec as P

    spec = P(cp.data_axis, cp.seq_axis, cp.head_axis, None)
    return make_ring_attention(cp.mesh, axis_name=cp.seq_axis,
                               causal=causal, spec=spec, with_mask=True)
