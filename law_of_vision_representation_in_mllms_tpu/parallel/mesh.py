"""Device mesh + sharding helpers.

The reference scales with deepspeed ZeRO-2/3 over NCCL
(`scripts/zero2.json`, `scripts/zero3.json`, `default_config.yaml`). The
TPU-native equivalent is a single 2-D `jax.sharding.Mesh` with axes

- ``data``  — batch sharding (DDP / ZeRO falls out of GSPMD param sharding),
- ``model`` — tensor parallelism for the 7B decoder (optional; size 1 by
  default on a v5e-8),
- ``seq``   — optional context parallelism (``n_seq > 1``): decoder
  activations shard over the sequence dimension and attention runs the
  ring kernel (`ops/ring_attention.py`), K/V blocks rotating over ICI.
  Long-context headroom beyond the reference's 2048 cap (SURVEY §5).

XLA emits all collectives (psum / all-gather / reduce-scatter) over ICI; there
is no hand-written communication backend.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None, n_seq: int = 1, n_stage: int = 1) -> Mesh:
    """Build a (data[, stage][, seq], model) mesh over the given (default:
    all) devices; the optional axes appear only when their size > 1.
    Ordering: ``model`` innermost (per-layer TP collectives are the most
    frequent — keep them most ICI-adjacent), then ``seq`` (ring hops),
    ``stage`` (one neighbour permute per pipeline tick,
    `parallel/pipeline.py`), with ``data`` (gradient psum once per step)
    outermost."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_seq * n_stage)
    dims = [("data", n_data), ("stage", n_stage), ("seq", n_seq),
            ("model", n_model)]
    dims = [(name, n) for name, n in dims
            if n > 1 or name in ("data", "model")]
    total = int(np.prod([n for _, n in dims]))
    if total > len(devices):
        raise ValueError(
            f"mesh {'x'.join(str(n) for _, n in dims)} > "
            f"{len(devices)} devices")
    arr = np.array(devices[:total]).reshape([n for _, n in dims])
    return Mesh(arr, axis_names=tuple(name for name, _ in dims))


def local_mesh() -> Mesh:
    """All local devices on the data axis (the common single-host case)."""
    return make_mesh(n_model=1)


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def with_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Multi-host runtime init — the reference's
    `dist.init_process_group("nccl")` (`extract.py:254`) / deepspeed
    launcher equivalent. On TPU pods `jax.distributed.initialize()`
    auto-discovers the topology; explicit args serve CPU/GPU clusters.
    Idempotent: returns False ONLY when already initialized — any real
    init failure (bad coordinator, timeout) raises, because silently
    falling back to single-host would make every host run the full job
    independently (clobbering shared output dirs)."""
    import jax

    kwargs = {}
    if coordinator_address:
        kwargs = {"coordinator_address": coordinator_address,
                  "num_processes": num_processes,
                  "process_id": process_id}
    try:
        jax.distributed.initialize(**kwargs)
        return True
    except RuntimeError as e:
        if "already" in str(e).lower():
            return False
        raise


def process_shard(items, process_index: int | None = None,
                  process_count: int | None = None):
    """Rank-slice a document list (the eval harness's data parallelism).

    Replaces the reference's `DistributedSampler` doc sharding
    (`llava/feature/extract.py:213`, lmms-eval rank slicing).
    """
    i = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    return items[i::n]
