"""Checkpointing (orbax): full train state, projector-only stage-1 saves,
and auto-resume.

Reference behavior being replaced:
- stage 1 saves ONLY `mm_projector.bin` + config
  (`llava/train/llava_trainer.py:167-192`);
- stage 2 consumes `--pretrain_mm_mlp_adapter` (`llava_arch.py:183-197`);
- auto-resume picks the latest checkpoint glob (`train.py:1114-1117`).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_train_state(ckpt_dir: str, state: Dict[str, Any], step: int,
                     keep: Optional[int] = None) -> str:
    """Save `checkpoint-{step}`; with `keep`, prune the oldest checkpoints
    beyond the newest `keep` (HF Trainer save_total_limit semantics)."""
    ocp = _ocp()
    path = os.path.join(os.path.abspath(ckpt_dir), f"checkpoint-{step}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)
    if keep:
        import shutil
        steps = sorted(
            int(d.split("-")[-1]) for d in os.listdir(ckpt_dir)
            if d.startswith("checkpoint-") and d.split("-")[-1].isdigit())
        for s in steps[:-keep]:
            shutil.rmtree(os.path.join(os.path.abspath(ckpt_dir),
                                       f"checkpoint-{s}"),
                          ignore_errors=True)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for d in os.listdir(ckpt_dir):
        if d.startswith("checkpoint-") and d.split("-")[-1].isdigit():
            steps.append(int(d.split("-")[-1]))
    if not steps:
        return None
    return os.path.join(os.path.abspath(ckpt_dir),
                        f"checkpoint-{max(steps)}")


def restore_train_state(path: str, template: Dict[str, Any]
                        ) -> Dict[str, Any]:
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


def save_projector(ckpt_dir: str, projector_params: Dict,
                   config: Optional[Dict] = None,
                   proj_type: Optional[str] = None) -> str:
    """Stage-1 projector-only checkpoint (mm_projector.bin equivalent).

    With `proj_type`, ALSO writes the reference's torch `mm_projector.bin`
    layout (via `export_projector_torch_sd`) so a reference finetune can
    consume our stage-1 output directly (`--pretrain_mm_mlp_adapter`)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    flat = {}
    is_mof = isinstance(projector_params, (list, tuple))
    trees = list(projector_params) if is_mof else [projector_params]
    for t, tree in enumerate(trees):
        pfx = f"proj{t}." if is_mof else ""
        for i, layer in enumerate(tree["layers"]):
            for k, v in layer.items():
                flat[f"{pfx}layers.{i}.{k}"] = np.asarray(v)
    path = os.path.join(ckpt_dir, "mm_projector.npz")
    np.savez(path, **flat)
    if (proj_type is not None and "perceiver" not in proj_type
            and isinstance(projector_params, dict)):
        import torch

        from ..models.projector import export_projector_torch_sd
        torch.save(export_projector_torch_sd(projector_params, proj_type),
                   os.path.join(ckpt_dir, "mm_projector.bin"))
    if config is not None:
        with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
            json.dump(config, f, indent=1)
    return path


def load_projector(path: str) -> Dict:
    """Load a projector-only checkpoint back into the param pytree
    (a list of per-tower projectors for MoF saves)."""
    if os.path.isdir(path):
        path = os.path.join(path, "mm_projector.npz")
    data = np.load(path)

    def _tree(keys, pfx):
        n = 1 + max(int(k[len(pfx):].split(".")[1]) for k in keys)
        layers = []
        for i in range(n):
            layers.append({k.split(".")[-1]: data[k] for k in keys
                           if k.startswith(f"{pfx}layers.{i}.")})
        return {"layers": layers}

    if any(k.startswith("proj0.") for k in data.files):
        out = []
        t = 0
        while any(k.startswith(f"proj{t}.") for k in data.files):
            keys = [k for k in data.files if k.startswith(f"proj{t}.")]
            out.append(_tree(keys, f"proj{t}."))
            t += 1
        return out
    return _tree(list(data.files), "")


def load_projector_from_torch(path: str) -> Dict:
    """Port a reference `mm_projector.bin` (torch) checkpoint."""
    import torch

    from ..models.projector import port_projector
    sd = torch.load(path, map_location="cpu")
    prefix = "model.mm_projector." if any(
        k.startswith("model.mm_projector.") for k in sd) else ""
    depth = len({k for k in sd if k.endswith(".weight")})
    return port_projector(sd, f"mlp{depth}x_gelu" if depth > 1 else "linear",
                          prefix=prefix)


def load_pretrained(model_dir: str, base_params: Dict[str, Any], *,
                    lora_cfg=None) -> Dict[str, Any]:
    """Resolve a checkpoint directory the way `llava/model/builder.py
    load_pretrained_model:27-161` does: full train state, LoRA adapters
    (merged into the decoder), or a projector-only artifact — whichever is
    present — applied over `base_params`.
    """
    import jax
    import jax.numpy as jnp

    params = base_params
    latest = latest_checkpoint(model_dir)
    if latest is not None:
        state = restore_train_state(latest, {"params": base_params})
        return state["params"]
    lora_path = os.path.join(model_dir, "lora.npz")
    if os.path.exists(lora_path):
        from ..io.param_io import load_params
        from ..models.lora import LoraConfig, merge_lora
        lora = jax.tree.map(jnp.asarray, load_params(lora_path))
        params = dict(params)
        params["decoder"] = merge_lora(params["decoder"], lora,
                                       lora_cfg or LoraConfig())
    proj_path = os.path.join(model_dir, "mm_projector.npz")
    if os.path.exists(proj_path):
        params = dict(params)
        params["projector"] = jax.tree.map(jnp.asarray,
                                           load_projector(proj_path))
    torch_proj = os.path.join(model_dir, "mm_projector.bin")
    if os.path.exists(torch_proj):
        params = dict(params)
        params["projector"] = jax.tree.map(
            jnp.asarray, load_projector_from_torch(torch_proj))
    return params
