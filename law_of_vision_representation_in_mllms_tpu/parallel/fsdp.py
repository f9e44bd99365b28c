"""ZeRO/FSDP-equivalent sharding: params + optimizer state on the data axis.

The reference trains with deepspeed ZeRO-2 (`scripts/zero2.json:16-23` —
optimizer-state + gradient partitioning), ships ZeRO-3 configs
(`scripts/zero3.json:16-28` — parameter partitioning) and a CPU-offload
variant (`scripts/zero3_offload.json`). The TPU-native equivalent is pure
placement: NamedShardings that put every large tensor's biggest free dim on
the "data" mesh axis and let GSPMD insert the all-gathers (ZeRO-3 forward /
backward) and reduce-scatters (gradient partitioning) that deepspeed
implements by hand over NCCL.

Three levels, mirroring the reference configs:

- ``zero=0``  TP-only (decoder Megatron specs, everything else replicated) —
  round-1 behavior, fine for small models.
- ``zero=2``  params stay TP/replicated; AdamW moments shard on "data".
- ``zero=3``  params AND moments shard on "data" (on top of any TP dims).

Host offload (``zero3_offload.json`` equivalent) places the moments in
``pinned_host`` memory; the train step device_puts them in for the update
and back out after (`make_train_step(opt_to_device=..., opt_to_host=...)`).

Memory math (why this matters): vicuna-7B stage-2 is ~6.7e9 params. fp32
params + fp32 mu + fp32 nu = ~81 GB replicated — 5x a 16 GB v5e chip. 8-way
ZeRO-3 brings it to ~10 GB/chip before activations. `memory_report` does
this accounting for any state tree; `__graft_entry__.dryrun_multichip`
asserts it via `jax.eval_shape` on the real 7B config.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaves smaller than this many elements stay replicated: sharding tiny
# norm vectors buys nothing and costs a collective each (same idea as
# deepspeed's reduce_bucket_size thresholds).
MIN_SIZE_TO_SHARD = 1 << 16


def _spec_axes(spec: P):
    """Mesh axes used per dim, normalized to tuples."""
    out = []
    for dim in spec:
        if dim is None:
            out.append(())
        elif isinstance(dim, (tuple, list)):
            out.append(tuple(dim))
        else:
            out.append((dim,))
    return out


def fsdp_spec(shape, base: Optional[P], n_shard: int, *,
              axis: str = "data",
              min_size: int = MIN_SIZE_TO_SHARD) -> P:
    """Add `axis` to the largest dim of `shape` not already sharded by
    `base` and divisible by n_shard. Idempotent: if `base` already uses
    `axis`, returns `base` unchanged."""
    base = base if base is not None else P(*([None] * len(shape)))
    dims = _spec_axes(base) + [()] * (len(shape) - len(base))
    if any(axis in d for d in dims):
        return base
    if n_shard <= 1 or math.prod(shape) < min_size:
        return base
    candidates = [i for i, d in enumerate(shape)
                  if not dims[i] and d % n_shard == 0]
    if not candidates:
        return base
    best = max(candidates, key=lambda i: shape[i])
    new_dims = [
        (tuple(d) if len(d) != 1 else d[0]) if d else None for d in dims]
    new_dims[best] = axis
    return P(*new_dims)


def fsdp_param_specs(params, base_specs, mesh: Mesh, *,
                     axis: str = "data",
                     min_size: int = MIN_SIZE_TO_SHARD):
    """ZeRO-3 spec tree: `base_specs` (TP or replicated) + data-axis
    sharding on every large leaf."""
    n = mesh.shape[axis]

    def one(leaf, spec):
        return fsdp_spec(np.shape(leaf), spec, n, axis=axis,
                         min_size=min_size)
    # flattening follows `params`; each P in base_specs rides along as the
    # corresponding leaf (P is a tuple, but flatten_up_to keeps it whole)
    return jax.tree.map(one, params, base_specs)


# ---------------------------------------------------------------------------
# Derived state sharding (optimizer moments etc.) via path matching
# ---------------------------------------------------------------------------

def _try_walk(tree, path) -> Optional[P]:
    """Walk `tree` by tree-path keys; succeed only if the full path lands on
    a PartitionSpec."""
    from jax.tree_util import DictKey, SequenceKey
    node = tree
    for k in path:
        if isinstance(node, P):
            return None
        if isinstance(node, dict) and isinstance(k, DictKey) \
                and k.key in node:
            node = node[k.key]
        elif isinstance(node, (list, tuple)) and isinstance(k, SequenceKey) \
                and k.idx < len(node):
            node = node[k.idx]
        else:
            return None
    return node if isinstance(node, P) else None


def derived_state_specs(state_shapes, param_specs, mesh: Mesh, *,
                        shard_derived: bool = True, axis: str = "data",
                        min_size: int = MIN_SIZE_TO_SHARD):
    """Spec tree for any state whose leaves mirror param subtrees (optimizer
    moments, EMA copies, the full train state...).

    Each leaf is matched to its param spec by the longest tree-path suffix
    that resolves inside `param_specs` (optax moment trees carry the param
    path verbatim: `...mu['decoder']['layers']['wq']`). Unmatched leaves
    (step counters, schedule state) replicate. With `shard_derived`, matched
    leaves additionally get the ZeRO data-axis dim — this is what makes
    zero=2 shard the moments while the params stay replicated."""
    n = mesh.shape[axis]

    def choose(path, leaf):
        spec = None
        for i in range(len(path)):
            spec = _try_walk(param_specs, path[i:])
            if spec is not None:
                break
        shape = np.shape(leaf)
        if spec is None or len(spec) > len(shape):
            spec = None if len(shape) else P()
        if spec is None:
            spec = P(*([None] * len(shape)))
        if shard_derived and len(shape):
            spec = fsdp_spec(shape, spec, n, axis=axis, min_size=min_size)
        return spec

    return jax.tree_util.tree_map_with_path(choose, state_shapes)


def shardings(specs, mesh: Mesh, memory_kind: Optional[str] = None):
    """Spec tree -> NamedSharding tree (optionally in a host memory space)."""
    def one(s):
        ns = NamedSharding(mesh, s)
        return ns.with_memory_kind(memory_kind) if memory_kind else ns
    return jax.tree.map(one, specs, is_leaf=lambda x: isinstance(x, P))


def offload_shardings(shapes, specs, mesh: Mesh, *,
                      memory_kind: str = "pinned_host",
                      min_size: int = 1 << 12):
    """Host-offload shardings: large leaves go to `memory_kind`, small ones
    (step counters, scalars) stay in device memory — XLA rejects host
    placement annotations on side-effect-free scalar constants, and
    offloading them would buy nothing anyway."""
    def one(shape, s):
        ns = NamedSharding(mesh, s)
        size = int(np.prod(np.shape(shape))) if np.shape(shape) else 1
        return ns.with_memory_kind(memory_kind) if size >= min_size else ns
    return jax.tree.map(one, shapes, specs)


# ---------------------------------------------------------------------------
# Memory accounting
# ---------------------------------------------------------------------------

def _leaf_bytes(leaf) -> int:
    size = int(np.prod(np.shape(leaf))) if np.shape(leaf) else 1
    dtype = getattr(leaf, "dtype", None)
    return size * (np.dtype(dtype).itemsize if dtype is not None else 4)


def _shard_factor(spec: P, mesh: Mesh) -> int:
    f = 1
    for axes in _spec_axes(spec):
        for a in axes:
            f *= mesh.shape[a]
    return f


def memory_report(tree, specs, mesh: Mesh) -> Dict[str, Any]:
    """Per-chip memory accounting for a (state, spec) pair. `tree` can hold
    arrays or `jax.eval_shape` ShapeDtypeStructs — nothing is materialized."""
    leaves = jax.tree.leaves(tree)
    spec_leaves = jax.tree.leaves(specs,
                                  is_leaf=lambda x: isinstance(x, P))
    assert len(leaves) == len(spec_leaves), \
        (len(leaves), len(spec_leaves))
    total = 0
    per_chip = 0
    unsharded = 0
    for leaf, spec in zip(leaves, spec_leaves):
        b = _leaf_bytes(leaf)
        total += b
        per_chip += -(-b // _shard_factor(spec, mesh))
        if _shard_factor(spec, mesh) == 1 and b >= 1 << 20:
            unsharded += b
    return {
        "total_bytes": total,
        "per_chip_bytes": per_chip,
        "per_chip_gb": per_chip / (1 << 30),
        "replicated_large_bytes": unsharded,
        "n_devices": mesh.size,
    }
