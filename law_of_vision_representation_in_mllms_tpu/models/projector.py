"""mm_projector zoo: linear | mlpNx_gelu | identity | perceiverNx.

Mirrors `llava/model/multimodal_projector/builder.py:33-58` (regex-dispatched
projector types; `mlp2x_gelu` is the stage-1/2 default) and the
PerceiverResampler variant (`perceiver_helpers.py`).

Functional: `init_projector` builds a param pytree, `apply_projector` runs it.
The projector is the ONLY trainable module in stage-1 training
(`llava/train/train.py:1050-1061`), so keeping it a standalone pytree makes
the stage-1 optimizer state trivially small and the orbax "projector-only"
checkpoint a one-liner.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..core.precision import Precision, DEFAULT_PRECISION


def parse_projector_type(name: str):
    if name in ("linear", "identity"):
        return name, None
    m = re.match(r"^mlp(\d+)x_gelu$", name)
    if m:
        return "mlp", int(m.group(1))
    m = re.match(r"^perceiver(\d+)x$", name)
    if m:
        return "perceiver", int(m.group(1))
    raise ValueError(f"Unknown projector type: {name}")


def init_projector(rng, proj_type: str, mm_hidden_size: int,
                   hidden_size: int, dtype=jnp.float32) -> Dict[str, Any]:
    """Param pytree only (the projector *type* lives in the model config so
    the pytree stays pure arrays for jax transforms)."""
    kind, depth = parse_projector_type(proj_type)
    if kind == "identity":
        return {"layers": []}

    def dense(key, din, dout):
        k1, _ = jax.random.split(key)
        bound = (6.0 / (din + dout)) ** 0.5
        return {"kernel": jax.random.uniform(k1, (din, dout), dtype,
                                             -bound, bound),
                "bias": jnp.zeros((dout,), dtype)}

    if kind == "linear":
        return {"layers": [dense(rng, mm_hidden_size, hidden_size)]}
    if kind == "mlp":
        keys = jax.random.split(rng, depth)
        layers = [dense(keys[0], mm_hidden_size, hidden_size)]
        layers += [dense(keys[i], hidden_size, hidden_size)
                   for i in range(1, depth)]
        return {"layers": layers}
    raise NotImplementedError(
        "perceiver projector: see models/perceiver.py")  # added separately


def apply_projector(params, feats,
                    precision: Precision = DEFAULT_PRECISION):
    """feats: [B, P, mm_hidden] -> [B, P, hidden]. GELU between layers
    (none for the single-layer 'linear' case, no-op for 'identity')."""
    cd = precision.compute_dtype
    x = feats.astype(cd)
    for i, lp in enumerate(params["layers"]):
        if i > 0:
            x = jax.nn.gelu(x, approximate=False)
        x = x @ lp["kernel"].astype(cd) + lp["bias"].astype(cd)
    return x


def port_projector(state_dict, proj_type: str, prefix: str = "") -> Dict:
    """Port HF `mm_projector.bin` weights (keys like
    `model.mm_projector.0.weight`) into the pytree above."""
    import numpy as np

    kind, depth = parse_projector_type(proj_type)
    if kind == "identity":
        return {"layers": []}
    layers = []
    idxs = sorted({int(k[len(prefix):].split(".")[0])
                   for k in state_dict if k.startswith(prefix)
                   and k[len(prefix):].split(".")[0].isdigit()})
    for i in idxs:
        w = state_dict.get(f"{prefix}{i}.weight")
        if w is None:
            continue
        layers.append({
            "kernel": np.asarray(w.detach().float().numpy().T),
            "bias": np.asarray(
                state_dict[f"{prefix}{i}.bias"].detach().float().numpy()),
        })
    return {"layers": layers}
