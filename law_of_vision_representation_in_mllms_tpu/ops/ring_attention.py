"""Ring attention — sequence/context parallelism over a mesh axis.

The reference has NO long-context machinery (SURVEY.md §5: sequences capped
at 2048, no ring attention / Ulysses / context parallel); this is TPU-native
headroom: shard the sequence over a mesh axis, keep each device's Q block
resident, and rotate K/V blocks around the ring with `lax.ppermute` while
accumulating online-softmax partials (flash-style across devices). The
collectives ride ICI; wall-clock is max(compute, ring hop), and no device
ever materializes the full [S, S] score matrix or the full K/V.

Use under `shard_map` with q/k/v sharded on the sequence dimension:

    attn = shard_map(partial(ring_attention, axis_name="data"),
                     mesh, in_specs=P(None, "data", None, None) * 3,
                     out_specs=P(None, "data", None, None))
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e30


def ring_attention(q, k, v, *, axis_name: str, causal: bool = False,
                   scale: float | None = None):
    """q, k, v: LOCAL shards [B, S_local, H, D] (already inside shard_map).

    Returns the local output shard [B, S_local, H, D].
    """
    b, sl, h, d = q.shape
    if scale is None:
        scale = d ** -0.5
    n = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)

    qf = q.astype(jnp.float32) * scale
    # jax >= 0.8 shard_map tracks varying-manual-axes: the scan carry must
    # enter marked device-varying exactly like its outputs. Deriving the
    # init from q inherits q's full varying set (e.g. {data, seq} on a
    # 3-axis mesh), which pcast over just the ring axis would not.
    zq = qf[:, :, :, :1].transpose(0, 2, 1, 3) * 0.0      # [B, H, Sl, 1]
    m = zq + NEG_INF
    l = zq
    acc = jnp.zeros((b, h, sl, d), jnp.float32) + zq

    q_pos = idx * sl + jnp.arange(sl)                       # global q rows

    def step(carry, step_i):
        m, l, acc, k_cur, v_cur = carry
        src = (idx - step_i) % n                            # k_cur's owner
        k_pos = src * sl + jnp.arange(sl)
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, k_cur.astype(jnp.float32))
        if causal:
            ok = k_pos[None, :] <= q_pos[:, None]           # [Sq, Sk]
            s = jnp.where(ok[None, None], s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        if causal:
            p = jnp.where(ok[None, None], p, 0.0)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("bhqk,bkhd->bhqd", p, v_cur.astype(jnp.float32))
        acc_new = acc * alpha + pv
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_nxt = lax.ppermute(k_cur, axis_name, perm)
        v_nxt = lax.ppermute(v_cur, axis_name, perm)
        return (m_new, l_new, acc_new, k_nxt, v_nxt), ()

    (m, l, acc, _, _), _ = lax.scan(step, (m, l, acc, k, v),
                                    jnp.arange(n))
    out = acc / jnp.maximum(l, 1e-30)
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)


def make_ring_attention(mesh, *, axis_name: str = "data",
                        causal: bool = False, spec=None):
    """shard_map-wrapped ring attention over full [B, S, H, D] arrays.

    ``spec`` overrides the q/k/v PartitionSpec — pass the full-mesh
    layout (e.g. P("data", "seq", "model", None)) when the mesh carries
    batch/TP axes besides the ring axis; collectives still ride only
    ``axis_name``."""
    from jax.sharding import PartitionSpec as P

    if spec is None:
        spec = P(None, axis_name, None, None)
    fn = functools.partial(ring_attention, axis_name=axis_name,
                           causal=causal)
    try:
        from jax import shard_map  # jax >= 0.8 (no check_rep arg)
        return shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec)
    except ImportError:
        from jax.experimental.shard_map import shard_map
        return shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_rep=False)
