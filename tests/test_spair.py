"""SPair loader tests on a synthetic on-disk dataset, end-to-end with the
batched C-score evaluation."""

import json
import os

import numpy as np
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.metrics import spair as S
from law_of_vision_representation_in_mllms_tpu.metrics.c_score import (
    compute_pck_batch)


def _make_synthetic_spair(root, category="cat", n_pairs=3, num_kps=6):
    os.makedirs(f"{root}/PairAnnotation/test", exist_ok=True)
    os.makedirs(f"{root}/ImageAnnotation/{category}", exist_ok=True)
    os.makedirs(f"{root}/JPEGImages/{category}", exist_ok=True)
    rng = np.random.RandomState(0)
    for p in range(n_pairs):
        for side, idx in (("src", 2 * p), ("trg", 2 * p + 1)):
            name = f"img{idx}"
            w, h = int(rng.randint(80, 160)), int(rng.randint(80, 160))
            kps = {}
            for i in range(num_kps):
                if rng.rand() < 0.8:
                    kps[str(i)] = [float(rng.randint(0, w)),
                                   float(rng.randint(0, h))]
                else:
                    kps[str(i)] = None
            with open(f"{root}/ImageAnnotation/{category}/{name}.json",
                      "w") as f:
                json.dump({"kps": kps, "imsize": [w, h]}, f)
            if side == "src":
                src = (name, w, h)
            else:
                trg = (name, w, h)
        pair = {
            "category": category,
            "src_imname": src[0] + ".jpg", "trg_imname": trg[0] + ".jpg",
            "src_imsize": [src[1], src[2], 3],
            "trg_imsize": [trg[1], trg[2], 3],
            "src_bndbox": [5, 5, src[1] - 5, src[2] - 5],
            "trg_bndbox": [5, 5, trg[1] - 5, trg[2] - 5],
        }
        with open(f"{root}/PairAnnotation/test/{p:06d}:{category}.json",
                  "w") as f:
            json.dump(pair, f)


def test_spair_load_and_eval(tmp_path):
    root = str(tmp_path / "SPair-71k")
    _make_synthetic_spair(root)
    pairs = S.load_spair_data(root, "cat", size=64)
    assert len(pairs.files) == 6
    assert pairs.kps.shape[0] == 6
    # kps on the canvas
    assert pairs.kps[..., :2].max() <= 64
    assert (pairs.thresholds > 0).all()

    # identical descriptors for both sides -> self-transfer, high PCK@0.10
    n_patches, c = 8, 12
    rng = np.random.RandomState(1)
    feats = rng.randn(6, n_patches * n_patches, c).astype(np.float32)
    feats[1::2] = feats[0::2]
    batch = S.batch_pairs(pairs, feats, max_kps=pairs.kps.shape[1])
    # make kps2 == kps1 so self-transfer is exact
    batch["kps2"] = batch["kps1"]
    res, pred = compute_pck_batch(
        jnp.asarray(batch["desc1"]), jnp.asarray(batch["desc2"]),
        jnp.asarray(batch["kps1"]), jnp.asarray(batch["kps2"]),
        jnp.asarray(batch["vis"]), jnp.asarray(batch["thresholds"]),
        num_patches=n_patches, anno_size=64)
    assert float(res.per_kpt[0]) > 0.9


def test_geoware_masks_shape():
    tables = S.load_geoware_tables()
    assert "cat" in tables["SPAIR_GEO_AWARE"]
    # synthetic pairs object covering group logic
    import dataclasses
    kps = np.zeros((4, 5, 3))
    kps[:, :, 2] = 1
    pairs = S.SPairPairs(files=["a"] * 4, kps=kps,
                         thresholds=np.ones(2, np.float32),
                         used_kps=np.arange(5))
    masks = S.geo_aware_masks(pairs, "cat", tables)
    assert masks.shape == (2, 5)
    # keypoints 2,3 form a symmetry group in 'cat' -> geo-aware when visible
    assert masks[:, 2].all() and masks[:, 3].all()


def test_weighted_aggregate():
    per_cat = [
        {"per_kpt": [0.5, 0.2, 0.1], "per_img": [0.6, 0.3, 0.2],
         "n_kpts": 10, "n_pairs": 2},
        {"per_kpt": [1.0, 0.8, 0.5], "per_img": [1.0, 0.9, 0.6],
         "n_kpts": 30, "n_pairs": 6},
    ]
    agg = S.weighted_aggregate(per_cat)
    np.testing.assert_allclose(agg["per_kpt"][0],
                               (0.5 * 10 + 1.0 * 30) / 40)
    np.testing.assert_allclose(agg["per_img"][0],
                               (0.6 * 2 + 1.0 * 6) / 8)


def test_ap10k_loader(tmp_path):
    import json as _json
    root = str(tmp_path / "ap-10k")
    os.makedirs(f"{root}/PairAnnotation/test", exist_ok=True)
    os.makedirs(f"{root}/ImageAnnotation/cat", exist_ok=True)
    rng = np.random.RandomState(0)
    for idx in range(4):
        anno = {"width": 100, "height": 80, "bbox": [5, 5, 60, 40],
                "keypoints": [float(v) for kp in range(5)
                              for v in (rng.randint(0, 100),
                                        rng.randint(0, 80), 2)]}
        with open(f"{root}/ImageAnnotation/cat/img{idx}.json", "w") as f:
            _json.dump(anno, f)
    for p in range(2):
        pair = {"src_json_path": f"{root}/ImageAnnotation/cat/img{2*p}.json",
                "trg_json_path":
                    f"{root}/ImageAnnotation/cat/img{2*p+1}.json"}
        with open(f"{root}/PairAnnotation/test/{p:06d}:cat.json", "w") as f:
            _json.dump(pair, f)
    pairs = S.load_ap10k_data(root, "cat", size=64, subsample=None)
    assert pairs.kps.shape[0] == 4
    # visibility flag halved: 2 -> 1
    assert pairs.kps[..., 2].max() == 1.0
    assert (pairs.thresholds > 0).all()


def test_pascal_loader(tmp_path):
    from PIL import Image
    root = tmp_path / "PF-dataset-PASCAL"
    os.makedirs(root)
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    for n in ("a.jpg", "b.jpg"):
        Image.new("RGB", (60, 40)).save(img_dir / n)
    with open(root / "test_pairs_pf_pascal.csv", "w") as f:
        f.write("source_image,target_image,class,XA,YA,XB,YB\n")
        f.write("imgs/a.jpg,imgs/b.jpg,8,10;20;30,5;15;25,12;22;32,"
                "6;16;26\n")
    pairs = S.load_pascal_data(str(root), "cat", size=64)
    assert len(pairs.files) == 2
    assert pairs.kps.shape[1] == 3          # 3 used keypoints
    np.testing.assert_allclose(pairs.thresholds, [64.0])
