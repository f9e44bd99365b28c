"""GeoAware-SC foreground-mask creation with the in-repo SAM.

The reference's `C_score/preprocess_mask_sam.py:1-78` walks a dataset
dir, square-pads every image to ANNO_SIZE=960, box-prompts a
SamPredictor with the annotation bbox, and writes `{name}_mask.png` plus
a horizontally flipped `{name}_mask_flip.png` into a parallel
`features/` tree — the files `metrics/flip_eval.py` and the GeoAware
mask branch ingest. This module reproduces that flow on the TPU-native
SAM (models/sam.py); `lvr sam-masks` is the CLI.

Weights: `lvr port-sam --pretrained <local facebook/sam-vit-* snapshot>`
writes the param bundle this pipeline loads.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np

# SamProcessor normalization (ImageNet mean/std in 0-255 units) — what
# SamPredictor.set_image applies before the encoder.
_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_STD = np.array([58.395, 57.12, 57.375], np.float32)


def square_pad(img, target: int):
    """`utils_correspondence.resize(..., to_pil=True)` semantics: scale the
    long side to `target`, CENTER the short side on a zero canvas."""
    from PIL import Image
    w, h = img.size
    canvas = np.zeros((target, target, 3), np.uint8)
    if h <= w:
        nh = int(np.around(target * h / w))
        img = img.resize((target, nh), Image.LANCZOS)
        y0 = (target - nh) // 2
        canvas[y0:y0 + nh] = np.asarray(img)
        offset = (0, y0)
    else:
        nw = int(np.around(target * w / h))
        img = img.resize((nw, target), Image.LANCZOS)
        x0 = (target - nw) // 2
        canvas[:, x0:x0 + nw] = np.asarray(img)
        offset = (x0, 0)
    return canvas, offset


def pad_box(box_xyxy, orig_wh: Tuple[int, int], target: int):
    """`preprocess_kps_pad` for a corner box: scale by target/max(w,h),
    shift by the centering offset."""
    w, h = orig_wh
    scale = target / max(w, h)
    b = np.asarray(box_xyxy, np.float32) * scale
    if h < w:
        b[[1, 3]] += (target - int(np.around(target * h / w))) // 2
    elif w < h:
        b[[0, 2]] += (target - int(np.around(target * w / h))) // 2
    return b


def segment_box(params, cfg, canvas: np.ndarray, box: np.ndarray,
                jit_cache={}):
    """Box-prompted mask for one square uint8 image (the SamPredictor
    predict(box=..., multimask_output=False) call)."""
    import jax
    import jax.numpy as jnp
    from ..models import sam as S

    anno = canvas.shape[0]
    size = cfg.vision.image_size
    key = (id(params), size)
    if key not in jit_cache:
        jit_cache[key] = jax.jit(
            lambda p, px, bx: S.segment(p, cfg, px, bx,
                                        multimask_output=False))
    from PIL import Image
    img = Image.fromarray(canvas).resize((size, size), Image.BILINEAR)
    px = (np.asarray(img, np.float32) - _MEAN) / _STD
    bx = box * (cfg.input_image_size / anno)
    masks, _iou = jit_cache[key](params,
                                 jnp.asarray(px[None]),
                                 jnp.asarray(bx[None, None]))
    low = masks[0, 0, 0]
    m = S.postprocess_mask(low, input_hw=(size, size),
                           original_hw=(anno, anno), image_size=size)
    return np.asarray(m)


def run_sam_masks(params, cfg, base_dir: str, *, anno_size: int = 960,
                  spair: bool = False, limit: int | None = None) -> int:
    """Walk base_dir for .jpg files (preprocess_mask_sam.py main loop),
    writing {features}/{name}_mask.png + _mask_flip.png. Returns count."""
    from PIL import Image

    files = sorted(
        os.path.join(sub, f) for sub, _dirs, fs in os.walk(base_dir)
        for f in fs if f.endswith(".jpg"))
    if limit:
        files = files[:limit]
    n = 0
    for path in files:
        pil = Image.open(path).convert("RGB")
        w, h = pil.size
        canvas, _ = square_pad(pil, anno_size)
        jpath = path.replace(".jpg", ".json").replace("JPEGImages",
                                                      "ImageAnnotation")
        with open(jpath) as f:
            data = json.load(f)
        box = np.asarray(data["bndbox" if spair else "bbox"], np.float32)
        if not spair:
            box[2:] += box[:2]                     # xywh -> xyxy
        box = pad_box(box, (w, h), anno_size)
        mask = segment_box(params, cfg, canvas, box)

        out_dir = os.path.dirname(path).replace("JPEGImages", "features")
        os.makedirs(out_dir, exist_ok=True)
        base = os.path.splitext(os.path.basename(path))[0]
        arr = (np.clip(mask, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(out_dir,
                                               f"{base}_mask.png"))
        Image.fromarray(arr[:, ::-1]).save(
            os.path.join(out_dir, f"{base}_mask_flip.png"))
        n += 1
    return n
