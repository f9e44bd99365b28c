"""The "Switch" representation-steering variant.

Reference: `llava/model/language_model/llava_llama_switch.py:19-135` +
`llava/train/train_switch.py:895-898` — a single trainable square matrix W
applied to the decoder's final hidden state as

    h' = h + sigma * W(h)        (sigma: fixed scale, default 1.0)

with EVERYTHING else frozen (only W trains). Here it is a 20-line functional
wrapper over the decoder plus a train-config stage; the freeze falls out of
the same optax.multi_transform masking used for stage 1.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..core.precision import Precision, DEFAULT_PRECISION


def init_switch(rng, hidden_size: int, dtype=jnp.float32) -> Dict[str, Any]:
    return {"w": (jax.random.normal(rng, (hidden_size, hidden_size))
                  * 0.02).astype(dtype)}


def apply_switch(switch_params, hidden, sigma: float = 1.0,
                 precision: Precision = DEFAULT_PRECISION):
    """hidden [B, S, D] -> steered hidden."""
    w = switch_params["w"].astype(hidden.dtype)
    return hidden + jnp.asarray(sigma, hidden.dtype) * (hidden @ w)


def switch_loss_fn(params, model_cfg, batch, sigma: float = 1.0,
                   precision: Precision = DEFAULT_PRECISION,
                   diffusion_apply=None):
    """LLaVA loss with the switch applied before the LM head. params carries
    an extra 'switch' subtree; all other subtrees are frozen by the
    optimizer labels."""
    from ..models import llama as L
    from ..models import llava as M
    from ..models.splice import splice_plan, splice_embeds

    plan = splice_plan(batch["input_ids"], batch["labels"],
                       batch["text_mask"], model_cfg.num_patches)
    img = M.encode_images(params, model_cfg, batch["pixel_values"],
                          precision, diffusion_apply)
    txt = L.embed_tokens(params["decoder"], batch["input_ids"], precision)
    embeds = splice_embeds(plan, txt, img)
    h, _ = L.forward(params["decoder"], model_cfg.decoder, embeds,
                     plan.positions, attn_mask=plan.attn_mask,
                     precision=precision)
    h = apply_switch(params["switch"], h, sigma, precision)
    logits = L.logits_fn(params["decoder"], h, precision)
    return L.causal_lm_loss(logits, plan.labels)


def switch_freeze_labels(params) -> Dict:
    """optax.multi_transform labels: only the switch trains
    (`train_switch.py:895-898`)."""
    labels = jax.tree.map(lambda _: "freeze", params)
    labels["switch"] = jax.tree.map(lambda _: "train", params["switch"])
    return labels
