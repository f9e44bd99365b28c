"""A-score runner: the `A_score/compute.py` driver over dumped embeddings.

Directory protocol matches the reference (`run_embed_extract.sh:28-35` +
`A_score/compute.py:7-31`): `<base>/<rep>/tensor_{1..N}.npy` per benchmark,
anchors 'clip336' and 'clip224'. Loads everything, pads ragged lengths, and
computes all reps in one batched device pass.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..metrics.a_score import a_score_from_arrays


def _load_dir(path: str, n: int = 100) -> Optional[List[np.ndarray]]:
    out = []
    for i in range(1, n + 1):
        p = os.path.join(path, f"tensor_{i}.npy")
        if not os.path.exists(p):
            return None
        out.append(np.load(p))
    return out


def compute_a_scores(base_folder: str, reps: Sequence[str], *,
                     anchors=("clip336", "clip224"), n_images: int = 100
                     ) -> Dict[str, float]:
    a336 = _load_dir(os.path.join(base_folder, anchors[0]), n_images)
    a224 = _load_dir(os.path.join(base_folder, anchors[1]), n_images)
    if a336 is None or a224 is None:
        raise FileNotFoundError(
            f"anchor embeddings missing under {base_folder}")
    results = {}
    for rep in reps:
        target = _load_dir(os.path.join(base_folder, rep), n_images)
        if target is None:
            continue
        results[rep] = a_score_from_arrays(target, a336, a224)
    return results
