"""Pipeline drivers: feature extraction -> C score end-to-end on a synthetic
SPair tree; A-score runner over dumped embeddings; checkpoint round-trips."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.io.checkpoint import (
    save_projector, load_projector, save_train_state, latest_checkpoint,
    restore_train_state)
from law_of_vision_representation_in_mllms_tpu.models.vit import ViTConfig
from law_of_vision_representation_in_mllms_tpu.models.projector import (
    init_projector)
from law_of_vision_representation_in_mllms_tpu.pipeline import (
    extract_tower_features, make_vit_extractor, compute_a_scores,
    run_c_score)
from law_of_vision_representation_in_mllms_tpu.data.image_processing import (
    ImageProcessorConfig)
from tests.test_spair import _make_synthetic_spair


def test_extract_and_c_score_end_to_end(tmp_path):
    from law_of_vision_representation_in_mllms_tpu.models.vit import ViTTower
    root = str(tmp_path / "SPair-71k")
    _make_synthetic_spair(root, n_pairs=3)
    # create the actual jpgs referenced by the pairs
    from PIL import Image
    img_dir = f"{root}/JPEGImages/cat"
    names = set()
    for p in range(3):
        for idx in (2 * p, 2 * p + 1):
            names.add(f"img{idx}.jpg")
    for n in names:
        Image.new("RGB", (64, 48), (10 * len(n), 80, 30)).save(
            f"{img_dir}/{n}")

    cfg = ViTConfig(image_size=28, patch_size=7, hidden_size=32,
                    num_layers=2, num_heads=4, intermediate_size=64)
    tower = ViTTower(cfg, select_layer=-1, select_feature="patch",
                     precision=FP32_PRECISION)
    params = tower.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 28, 28, 3)))["params"]
    fn = jax.jit(lambda px: tower.apply({"params": params}, px))

    proc = ImageProcessorConfig("clip", size=28, crop=28)
    feat_dir = str(tmp_path / "features")
    paths = sorted(f"{img_dir}/{n}" for n in names)
    written = extract_tower_features(fn, paths, proc, feat_dir,
                                     batch_size=4)
    assert len(written) == len(names)
    f0 = np.load(written[0])
    assert f0.shape == (cfg.num_patches, cfg.hidden_size)

    res = run_c_score(root, feat_dir, suffix="", num_patches=cfg.grid,
                      anno_size=64, categories=["cat"])
    assert len(res["per_img"]) == 3
    assert 0.0 <= res["per_img"][0] <= 1.0
    assert "geo" in res


def test_extract_process_sharding(tmp_path):
    from PIL import Image
    imgs = []
    for i in range(5):
        p = str(tmp_path / f"i{i}.jpg")
        Image.new("RGB", (32, 32), (i * 40, 10, 10)).save(p)
        imgs.append(p)
    proc = ImageProcessorConfig("diff", size=16, crop=16)
    fn = lambda px: px.reshape(px.shape[0], -1, 3)  # trivial featurizer
    out = str(tmp_path / "out")
    w0 = extract_tower_features(fn, imgs, proc, out, batch_size=2,
                                process_index=0, process_count=2)
    w1 = extract_tower_features(fn, imgs, proc, out, batch_size=2,
                                process_index=1, process_count=2)
    assert len(w0) + len(w1) == 5
    assert not set(w0) & set(w1)


def test_a_score_runner(tmp_path):
    rng = np.random.RandomState(0)
    base = str(tmp_path)
    for rep in ("clip336", "clip224", "dino"):
        os.makedirs(f"{base}/{rep}")
        for i in range(1, 6):
            np.save(f"{base}/{rep}/tensor_{i}.npy",
                    rng.randn(7 + i, 16).astype(np.float32))
    scores = compute_a_scores(base, ["dino", "clip336"], n_images=5)
    assert 0 <= scores["dino"] <= 1
    # a rep scored against itself as target uses identical tensors for the
    # 336 anchor -> its max-cos there is exactly 1
    assert scores["clip336"] > scores["dino"]


def test_checkpoint_roundtrip(tmp_path):
    proj = init_projector(jax.random.PRNGKey(0), "mlp2x_gelu", 16, 32)
    d = str(tmp_path / "stage1")
    save_projector(d, proj, config={"mm_projector_type": "mlp2x_gelu"})
    back = load_projector(d)
    for a, b in zip(jax.tree.leaves(proj), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    state = {"params": {"w": jnp.arange(4.0)}, "step": jnp.asarray(7)}
    ck = str(tmp_path / "ckpts")
    save_train_state(ck, state, 7)
    save_train_state(ck, jax.tree.map(lambda x: x * 2, state), 9)
    latest = latest_checkpoint(ck)
    assert latest.endswith("checkpoint-9")
    got = restore_train_state(latest, jax.tree.map(np.zeros_like, state))
    np.testing.assert_allclose(np.asarray(got["params"]["w"]),
                               np.arange(4.0) * 2)


def test_load_pretrained_resolution(tmp_path):
    """load_pretrained resolves projector-only and LoRA artifacts."""
    import jax
    import jax.numpy as jnp
    from law_of_vision_representation_in_mllms_tpu.io.checkpoint import (
        load_pretrained)
    from law_of_vision_representation_in_mllms_tpu.io.param_io import (
        save_params)
    from law_of_vision_representation_in_mllms_tpu.models import llama as L
    from law_of_vision_representation_in_mllms_tpu.models.lora import (
        LoraConfig, init_lora)

    dec_cfg = L.tiny(vocab_size=32, hidden_size=16, num_layers=2,
                     num_heads=2, num_kv_heads=2, intermediate_size=32)
    base = {"decoder": L.init_params(jax.random.PRNGKey(0), dec_cfg),
            "projector": init_projector(jax.random.PRNGKey(1),
                                        "mlp2x_gelu", 8, 16),
            "towers": []}

    d = str(tmp_path / "ckpt")
    # projector-only artifact
    proj2 = init_projector(jax.random.PRNGKey(2), "mlp2x_gelu", 8, 16)
    save_projector(d, proj2)
    out = load_pretrained(d, base)
    np.testing.assert_allclose(
        np.asarray(out["projector"]["layers"][0]["kernel"]),
        np.asarray(proj2["layers"][0]["kernel"]))

    # LoRA artifact merges into the decoder
    lcfg = LoraConfig(rank=2, alpha=4.0)
    lora = init_lora(jax.random.PRNGKey(3), dec_cfg, lcfg)
    lora = jax.tree.map(
        lambda x: x + 0.1 if x.ndim == 3 else x, lora)  # nonzero B
    save_params(os.path.join(d, "lora.npz"), lora)
    out2 = load_pretrained(d, base, lora_cfg=lcfg)
    assert np.abs(np.asarray(out2["decoder"]["layers"]["wq"])
                  - np.asarray(base["decoder"]["layers"]["wq"])).max() > 0


def test_checkpoint_retention(tmp_path):
    """save_total_limit prunes old step checkpoints (HF Trainer parity)."""
    from law_of_vision_representation_in_mllms_tpu.io.checkpoint import (
        save_train_state, latest_checkpoint)
    state = {"params": {"w": jnp.ones((4,))},
             "step": jnp.zeros((), jnp.int32)}
    for s in (10, 20, 30, 40):
        save_train_state(str(tmp_path), state, s, keep=2)
    kept = sorted(d for d in os.listdir(tmp_path)
                  if d.startswith("checkpoint-"))
    assert kept == ["checkpoint-30", "checkpoint-40"]
    assert latest_checkpoint(str(tmp_path)).endswith("checkpoint-40")


def test_c_score_ap10k_dataset(tmp_path):
    """AP-10k reaches the C-score CLI path (`utils_dataset.py:151-207`
    dispatch) — synthetic fixture, per-img PCK in range."""
    import json
    from law_of_vision_representation_in_mllms_tpu.pipeline import (
        run_c_score)

    root = str(tmp_path / "ap10k")
    os.makedirs(f"{root}/PairAnnotation/test", exist_ok=True)
    os.makedirs(f"{root}/ImageAnnotation/dog", exist_ok=True)
    rng = np.random.RandomState(0)
    n_kp = 5
    for p in range(3):
        sides = {}
        for side, idx in (("src", 2 * p), ("trg", 2 * p + 1)):
            w, h = int(rng.randint(60, 100)), int(rng.randint(60, 100))
            kp = []
            for _ in range(n_kp):
                kp += [float(rng.randint(0, w)), float(rng.randint(0, h)),
                       2.0]
            anno = {"keypoints": kp, "width": w, "height": h,
                    "bbox": [2, 2, w - 4, h - 4]}
            apath = f"{root}/ImageAnnotation/dog/img{idx}.json"
            with open(apath, "w") as f:
                json.dump(anno, f)
            sides[side] = apath
        with open(f"{root}/PairAnnotation/test/{p:06d}:dog.json",
                  "w") as f:
            json.dump({"src_json_path": sides["src"],
                       "trg_json_path": sides["trg"]}, f)

    feat_dir = str(tmp_path / "feats")
    os.makedirs(feat_dir)
    for idx in range(6):
        np.save(f"{feat_dir}/img{idx}.npy",
                rng.randn(16, 8).astype(np.float32))

    res = run_c_score(root, feat_dir, num_patches=4, anno_size=64,
                      categories=["dog"], dataset="ap10k", subsample=None)
    assert 0.0 <= res["per_img"][0] <= 1.0
    assert "geo" not in res          # geo masks are SPair-only


def test_projector_torch_export_roundtrip(tmp_path):
    """Stage-1 interop: our mm_projector.bin export loads through the
    torch-port path bit-exactly, for both mlp2x_gelu and bare linear."""
    import torch
    from law_of_vision_representation_in_mllms_tpu.io.checkpoint import (
        load_projector_from_torch)
    from law_of_vision_representation_in_mllms_tpu.models.projector import (
        export_projector_torch_sd, init_projector)

    for ptype in ("mlp2x_gelu", "linear"):
        proj = init_projector(jax.random.PRNGKey(0), ptype, 16, 24)
        d = tmp_path / ptype
        save_projector(str(d), proj, proj_type=ptype)
        bin_path = d / "mm_projector.bin"
        assert bin_path.exists()
        back = load_projector_from_torch(str(bin_path))
        assert len(back["layers"]) == len(proj["layers"])
        for a, b in zip(proj["layers"], back["layers"]):
            np.testing.assert_allclose(np.asarray(a["kernel"], np.float32),
                                       b["kernel"], atol=1e-7)
            np.testing.assert_allclose(np.asarray(a["bias"], np.float32),
                                       b["bias"], atol=1e-7)
        # the exported layout matches the reference key naming
        sd = torch.load(bin_path, map_location="cpu")
        if ptype == "linear":
            assert set(sd) == {"model.mm_projector.weight",
                               "model.mm_projector.bias"}
        else:
            assert "model.mm_projector.2.weight" in sd


def test_projector_mof_save_load_roundtrip(tmp_path):
    """MoF stage-1 saves a LIST of per-tower projectors."""
    from law_of_vision_representation_in_mllms_tpu.models.projector import (
        init_projector)
    projs = [init_projector(jax.random.PRNGKey(i), "mlp2x_gelu", 8, 12)
             for i in range(2)]
    d = str(tmp_path / "mof")
    save_projector(d, projs)
    back = load_projector(d)
    assert isinstance(back, list) and len(back) == 2
    for orig, got in zip(projs, back):
        for a, b in zip(orig["layers"], got["layers"]):
            np.testing.assert_array_equal(np.asarray(a["kernel"]),
                                          b["kernel"])
