"""Runtime safety guard for the no-max fused-softmax attention paths.

`mha_expnomax` / `mha_expnomax_fused` (the `xla_expclamp*` impls that
win every ViT/diffusion family benchmark — BASELINE.md) are EXACT only
while attention logits stay under their clamp (85 by default, ~3.7
units below bf16/fp32 exp overflow). The exactness condition was
validated on random weights and on the literature's reported ViT logit
ranges; this module closes the remaining hole for arbitrary REAL
checkpoints (VERDICT r3 #5): run the model's first batch once with the
logit-max capture hook active and fail loudly if the observed max is
within `margin` of the clamp — in which case the exact softmax
(`attn_impl=None`/"xla") is the correct setting for that checkpoint.

Amortization: the check costs ONE extra compile + forward of the
guarded function (tower-only, first batch). Disable with
LVR_CLAMP_GUARD=0 once a checkpoint is known-good.
"""

from __future__ import annotations

import logging
import os
from typing import Callable

import jax
import jax.numpy as jnp

from . import attention as _attn

log = logging.getLogger(__name__)

DEFAULT_MARGIN = 10.0


class ClampGuardError(RuntimeError):
    pass


def guard_enabled() -> bool:
    return os.environ.get("LVR_CLAMP_GUARD", "1") != "0"


def max_expclamp_logit(fn: Callable, *args) -> float:
    """Trace `fn(*args)` with the expclamp logit-max capture active and
    return the max attention logit observed across every expclamp call
    (−inf if none were traced — i.e. no expclamp path ran)."""
    def wrapped(*a):
        with _attn.capture_logit_maxes() as acc:
            fn(*a)
            if not acc:
                return jnp.float32(-jnp.inf)
            return jnp.max(jnp.stack(acc))
    from ..utils.retry import retry_transient
    # the guard compile is the first (and slowest) remote compile of an
    # extraction process — the relay's transient broken-pipe failures
    # have killed it twice; bounded retry, transport errors only
    return retry_transient(lambda: float(jax.jit(wrapped)(*args)),
                           label="clamp guard compile")


def check_clamp_headroom(fn: Callable, *args, clamp: float = 85.0,
                         margin: float = DEFAULT_MARGIN,
                         label: str = "model") -> float:
    """First-batch guard: assert the model's attention logits leave
    `margin` of headroom under the expclamp clamp. Returns the observed
    max (−inf when no expclamp path is active). Raises ClampGuardError
    when the fused path would be (near-)inexact for this checkpoint."""
    m = max_expclamp_logit(fn, *args)
    if m >= clamp - margin:
        raise ClampGuardError(
            f"{label}: max attention logit {m:.1f} is within {margin} of "
            f"the expclamp clamp {clamp} — the fused no-max softmax "
            f"(attn_impl='xla_expclamp*') is not exact for this "
            f"checkpoint. Use the exact softmax (drop the attn_impl "
            f"override) or raise the clamp after validating against the "
            f"fp32 oracle (benchmarks/validate_expclamp.py). Set "
            f"LVR_CLAMP_GUARD=0 to bypass.")
    if m != float("-inf"):
        log.info("clamp guard: %s max attention logit %.2f "
                 "(clamp %.0f, margin %.0f) — fused softmax exact",
                 label, m, clamp, margin)
    return m
