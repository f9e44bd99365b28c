"""Explicit device-layout negotiation for decode-time programs.

Why this exists: at 7B, the chunked-decode token-scan program fails to
compile on a 16 GB v5e chip — XLA prefers contracting-dim-minor operand
layouts for the decode matvecs and, when the params arrive in default
layout, it materializes whole-tensor layout-conversion copies of the
stacked wq/wk/wv (3x1 GB) plus both KV-cache halves and hoists them out
of the token loop (3.53 GB of HLO temps on top of 13.4 GB of params;
see benchmarks/README.md "7B chunked-decode compile OOM"). Unrolling
and `optimization_barrier` do not stop the hoist.

The TPU-native fix: compile the decode program with
`Format(Layout.AUTO)` on the params/cache arguments so XLA *demands*
its preferred layouts at the program boundary instead of converting
internally (temps drop to 0), read the negotiated formats back from the
compiled executable, relay out the live params once (leaf-wise,
consuming each source buffer so peak HBM grows by one leaf, not by the
whole tree), and pin every other program that shares those params
(prefill, later chunk shapes) to the same concrete formats.

The reference never needs this: torch stores weights [out, in] (the
layout XLA negotiates here) and eagerly dispatches per-op
(`/root/reference/llava/eval/lmms-eval/lmms_eval/models/llava.py:291-440`
decodes through HF generate). Under XLA the layout is a compiler
contract, so it must be negotiated explicitly.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.experimental.layout import Format, Layout


def auto_spec(tree: Any) -> Any:
    """A pytree of `Format(Layout.AUTO)` congruent to `tree` — pass as
    in_shardings/out_shardings to let XLA pick boundary layouts. AUTO
    requires the AOT path (`.lower(...).compile()`)."""
    auto = Format(Layout.AUTO)
    return jax.tree.map(lambda _: auto, tree)


def shape_spec(tree: Any) -> Any:
    """ShapeDtypeStruct pytree of `tree` (for AOT lowering)."""
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


def relayout(tree: Any, formats: Any, *, consume: bool = False) -> Any:
    """device_put each leaf of `tree` into its negotiated Format.

    Leaves whose current layout already matches pass through untouched
    (the common case for everything but the decode-transposed weights).
    With `consume=True` each source buffer is deleted as soon as its
    relaid copy is ready, capping peak HBM at +1 leaf — REQUIRED at 7B
    (a whole-tree second copy would not fit). Callers sharing the tree
    must re-read it after a consuming relayout: the old leaves are dead.
    """
    leaves, treedef = jax.tree.flatten(tree)
    fmts = treedef.flatten_up_to(formats)
    out = []
    for a, f in zip(leaves, fmts):
        cur: Optional[Format] = getattr(a, "format", None)
        # inputs the program does not read come back as Format(layout=None)
        want = getattr(f, "layout", None)
        if want is None or cur is None or cur.layout == want:
            out.append(a)
            continue
        b = jax.device_put(a, f)
        b.block_until_ready()
        # device_put may no-op (return the source) if it judges the
        # layouts equivalent — never delete the buffer we are returning
        if consume and b is not a and hasattr(a, "delete"):
            a.delete()
        out.append(b)
    return jax.tree.unflatten(treedef, out)
