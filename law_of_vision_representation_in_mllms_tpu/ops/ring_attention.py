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
    m = jnp.full((b, h, sl, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, sl, 1), jnp.float32)
    acc = jnp.zeros((b, h, sl, d), jnp.float32)
    # jax >= 0.8 shard_map tracks varying-manual-axes: the scan carry must
    # enter already marked device-varying like its outputs
    if hasattr(lax, "pcast"):
        m, l, acc = (lax.pcast(x, axis_name, to="varying")
                     for x in (m, l, acc))
    elif hasattr(lax, "pvary"):  # jax 0.8
        m, l, acc = (lax.pvary(x, axis_name) for x in (m, l, acc))

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
                        causal: bool = False):
    """shard_map-wrapped ring attention over full [B, S, H, D] arrays."""
    from jax.sharding import PartitionSpec as P

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
