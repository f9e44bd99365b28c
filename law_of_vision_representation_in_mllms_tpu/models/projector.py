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
    # perceiverNx: depth-N PerceiverResampler + Linear, reference defaults
    # (`builder.py:54-57` passes only dim/depth)
    from .perceiver import init_perceiver_projector
    return init_perceiver_projector(rng, depth, mm_hidden_size, hidden_size,
                                    dtype=dtype)


def apply_projector(params, feats,
                    precision: Precision = DEFAULT_PRECISION):
    """feats: [B, P, mm_hidden] -> [B, P, hidden] (mlp/linear/identity) or
    [B, 64, hidden] (perceiver resampling). GELU between mlp layers (none
    for the single-layer 'linear' case, no-op for 'identity')."""
    if "latents" in params:
        # NOTE: the model path assumes the reference builder's defaults
        # (heads=8, 64 latents — `builder.py:54-57` passes only dim/depth).
        # Perceivers with custom heads/latents must call
        # apply_perceiver_projector directly with explicit heads.
        from .perceiver import apply_perceiver_projector, DEFAULT_HEADS
        return apply_perceiver_projector(params, feats, precision,
                                         heads=DEFAULT_HEADS)
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
    if kind == "perceiver":
        return _port_perceiver(state_dict, depth, prefix)
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
    base = prefix.rstrip(".")
    wkey = f"{base}.weight" if base else "weight"
    if not layers and wkey in state_dict:
        # 'linear' checkpoints are a bare nn.Linear (builder.py:9-10):
        # keys `model.mm_projector.weight`, no Sequential index
        layers.append({
            "kernel": np.asarray(
                state_dict[wkey].detach().float().numpy().T),
            "bias": np.asarray(
                state_dict[wkey[:-len("weight")] + "bias"]
                .detach().float().numpy()),
        })
    return {"layers": layers}


def export_projector_torch_sd(projector_params: Dict,
                              proj_type: str = "mlp2x_gelu") -> Dict:
    """Inverse of `port_projector`: a torch state dict in the reference's
    `mm_projector.bin` layout, so reference finetunes can consume our
    stage-1 output (`--pretrain_mm_mlp_adapter`, train.py:969-983).
    Sequential index 2*i skips the GELUs between Linears."""
    import numpy as np
    import torch

    kind, _ = parse_projector_type(proj_type)
    layers = projector_params["layers"]
    sd = {}
    if kind == "linear":
        names = ["model.mm_projector"]
    else:
        names = [f"model.mm_projector.{2 * i}" for i in range(len(layers))]
    for name, layer in zip(names, layers):
        sd[f"{name}.weight"] = torch.from_numpy(
            np.asarray(layer["kernel"], np.float32).T.copy())
        sd[f"{name}.bias"] = torch.from_numpy(
            np.asarray(layer["bias"], np.float32).copy())
    return sd


def _port_perceiver(state_dict, depth: int, prefix: str = "") -> Dict:
    """Port `nn.Sequential(PerceiverResampler, Linear)` torch weights
    (`builder.py:54-57`): module 0 is the resampler (latents, layers.{i}.0
    attention + layers.{i}.1 FeedForward=LN/Linear/GELU/Linear, final
    norm), module 1 the output Linear."""
    import numpy as np

    def t(key):
        return np.asarray(state_dict[prefix + key].detach().float().numpy())

    def ln(key):
        return {"scale": t(key + ".weight"), "bias": t(key + ".bias")}

    layers = []
    for i in range(depth):
        p = f"0.layers.{i}."
        layers.append({
            "norm_media": ln(p + "0.norm_media"),
            "norm_latents": ln(p + "0.norm_latents"),
            "to_q": t(p + "0.to_q.weight").T,
            "to_kv": t(p + "0.to_kv.weight").T,
            "to_out": t(p + "0.to_out.weight").T,
            "ff_norm": ln(p + "1.0"),
            "ff_in": t(p + "1.1.weight").T,
            "ff_out": t(p + "1.3.weight").T,
        })
    return {
        "latents": t("0.latents"),
        "layers": layers,
        "final_norm": ln("0.norm"),
        "proj": {"kernel": t("1.weight").T, "bias": t("1.bias")},
    }
