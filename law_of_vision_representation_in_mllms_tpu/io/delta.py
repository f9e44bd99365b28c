"""Delta-weight utilities over the .npz param format.

The reference distributes LLaVA weights as deltas against the base LLaMA
and reconstitutes them with `llava/model/apply_delta.py:12-37` /
`make_delta.py` (torch state-dict arithmetic); `consolidate.py` re-saves a
sharded checkpoint as one artifact. Here the same three operations work on
the flattened `io.param_io` .npz files (the format every porter in this
repo emits):

- keys present only in the delta (the reference's mm_projector case) pass
  through unchanged,
- shape-mismatched keys must be row/col EXTENSIONS of the base (the
  reference's extended-vocab embed_tokens/lm_head case): the base adds
  into the leading slice,
- `make_delta` is the exact inverse of `apply_delta` (round-trip tested).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _load_flat(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _combine(a: Dict[str, np.ndarray], b: Dict[str, np.ndarray],
             sign: int) -> Dict[str, np.ndarray]:
    """out[k] = a[k] + sign*b[k]; b-only keys error, a-only pass through;
    a[k] may EXTEND b[k] (vocab growth) — b applies to the leading slice."""
    out = {}
    for k, av in a.items():
        if k not in b:
            out[k] = av                      # projector-style new weights
            continue
        bv = b[k]
        if av.shape == bv.shape:
            out[k] = av + sign * bv
        else:
            if av.ndim != bv.ndim or any(
                    x < y for x, y in zip(av.shape, bv.shape)):
                raise ValueError(
                    f"{k}: shape {av.shape} does not extend {bv.shape}")
            av = av.copy()
            sl = tuple(slice(0, s) for s in bv.shape)
            av[sl] = av[sl] + sign * bv
            out[k] = av
    extra = set(b) - set(a)
    if extra:
        raise ValueError(f"keys missing from the target/delta side: "
                         f"{sorted(extra)[:5]}...")
    return out


def apply_delta(base_path: str, delta_path: str, target_path: str) -> int:
    """target = delta + base (`apply_delta.py:12-37`). Returns key count."""
    base = _load_flat(base_path)
    delta = _load_flat(delta_path)
    out = _combine(delta, base, +1)
    np.savez(target_path, **out)
    return len(out)


def make_delta(base_path: str, target_path: str, delta_path: str) -> int:
    """delta = target - base (`make_delta.py` inverse op)."""
    base = _load_flat(base_path)
    target = _load_flat(target_path)
    out = _combine(target, base, -1)
    np.savez(delta_path, **out)
    return len(out)


def consolidate(ckpt_path: str, out_path: str) -> int:
    """Orbax train-state checkpoint -> one flat params .npz
    (`consolidate.py`: re-save a sharded training artifact as a single
    deployable file). Works template-free via orbax's raw restore."""
    import orbax.checkpoint as ocp
    from .param_io import save_params
    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(ckpt_path)
    params = state.get("params", state)
    save_params(out_path, params)
    with np.load(out_path) as z:
        return len(z.files)
