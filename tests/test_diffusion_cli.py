"""Diffusion towers end-to-end through the CLI (VERDICT-r1 missing #2).

Round 1 could only drive diffusion featurizers from hand-written test code;
these tests exercise the full production path: port -> bundle -> `lvr
extract-features` -> `lvr c-score`, `lvr eval`, and `lvr train`, purely
through RunConfig/CLI. Reference equivalents: `C_score/extract_feature.py`,
`llava/feature/extract.py`, `lmms_eval` with a diffLVLM checkpoint.
"""

import json
import os
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
import yaml

sys.path.insert(0, "/root/reference/diffusers/src")
diffusers = pytest.importorskip("diffusers")

from law_of_vision_representation_in_mllms_tpu.cli import main as cli_main
from law_of_vision_representation_in_mllms_tpu.core.config import RunConfig
from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.io.diffusers_port import (
    port_unet, port_vae_encoder)
from law_of_vision_representation_in_mllms_tpu.io.featurizer_bundle import (
    load_featurizer_bundle, port_featurizer_bundle, save_featurizer_bundle)
from law_of_vision_representation_in_mllms_tpu.models import featurizer as F
from law_of_vision_representation_in_mllms_tpu.models import unet as UN
from law_of_vision_representation_in_mllms_tpu.models import vae as VA

from tests.test_spair import _make_synthetic_spair


def _tiny_torch_sd():
    from diffusers import UNet2DConditionModel, AutoencoderKL
    torch.manual_seed(0)
    hf_unet = UNet2DConditionModel(
        sample_size=8, in_channels=4, out_channels=4,
        block_out_channels=(8, 16), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=2,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        norm_num_groups=4).eval()
    hf_vae = AutoencoderKL(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(8, 16), layers_per_block=1,
        down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, norm_num_groups=4).eval()
    fcfg = F.FeaturizerConfig(
        family="sd", t=1, up_ft_index=0, img_size=32,
        unet=UN.UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                           cross_attention_dim=16, num_heads=(2, None),
                           transformer_depth=(1, 0), norm_groups=4),
        vae=VA.VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                         latent_channels=4, norm_groups=4))
    return hf_unet, hf_vae, fcfg


def _write_bundle(tmp_path):
    hf_unet, hf_vae, fcfg = _tiny_torch_sd()
    params = {
        "vae": port_vae_encoder(hf_vae.state_dict(), fcfg.vae),
        "backbone": port_unet(hf_unet.state_dict(), fcfg.unet, (0,)),
        "prompt_embeds": np.random.RandomState(1).randn(
            1, 5, 16).astype(np.float32),
    }
    return save_featurizer_bundle(str(tmp_path / "sd_tiny.npz"), params,
                                  fcfg), fcfg


def test_feature_grid_and_dim():
    _, _, fcfg = _tiny_torch_sd()
    assert F.feature_grid(fcfg) == 16          # 32px -> latent 16 -> up0 16
    assert F.feature_dim(fcfg) == 16
    # production presets reproduce the reference's hardcoded tables
    sd15 = F.FEATURIZER_PRESETS["runwayml/stable-diffusion-v1-5"]()
    assert F.feature_grid(sd15) == 24 and F.feature_dim(sd15) == 1280
    sdxl = F.FEATURIZER_PRESETS[
        "stabilityai/stable-diffusion-xl-base-1.0"]()
    assert F.feature_dim(sdxl) == 1280
    dit = F.FEATURIZER_PRESETS["facebook/DiT-XL-2-512"]()
    assert F.feature_grid(dit) == 16 and F.feature_dim(dit) == 4608
    sd3 = F.FEATURIZER_PRESETS[
        "stabilityai/stable-diffusion-3-medium-diffusers"]()
    assert F.feature_grid(sd3) == 16 and F.feature_dim(sd3) == 6144


def test_extract_features_and_c_score_cli(tmp_path, capsys):
    """tiny-SD SPair feature extraction -> C score, all through `lvr`."""
    bundle, fcfg = _write_bundle(tmp_path)
    root = str(tmp_path / "SPair-71k")
    _make_synthetic_spair(root, n_pairs=3)
    from PIL import Image
    img_dir = f"{root}/JPEGImages/cat"
    for idx in range(6):
        Image.new("RGB", (64, 48), (10 * idx, 80, 30)).save(
            f"{img_dir}/img{idx}.jpg")

    cfg_yaml = str(tmp_path / "run.yaml")
    with open(cfg_yaml, "w") as f:
        yaml.safe_dump({
            "model": {"vision_tower": "runwayml/stable-diffusion-v1-5",
                      "decoder": "tiny",
                      "tower_weights": [bundle]},
            "train": {"bf16": False}}, f)

    feat_dir = str(tmp_path / "features")
    rc = cli_main(["extract-features", "--config", cfg_yaml,
                   "--images", img_dir, "--out-dir", feat_dir,
                   "--batch-size", "4"])
    assert rc == 0
    f0 = np.load(f"{feat_dir}/img0.npy")
    assert f0.shape == (256, 16)               # 16x16 grid, C=16
    # deterministic featurization: a second run is bit-identical
    rc = cli_main(["extract-features", "--config", cfg_yaml,
                   "--images", img_dir, "--out-dir",
                   str(tmp_path / "features2"), "--batch-size", "4"])
    assert rc == 0
    np.testing.assert_array_equal(
        f0, np.load(str(tmp_path / "features2" / "img0.npy")))

    capsys.readouterr()
    rc = cli_main(["c-score", "--spair-dir", root, "--feature-dir",
                   feat_dir, "--num-patches", "16", "--anno-size", "64",
                   "--categories", "cat"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert 0.0 <= out["per_img_pck"][0] <= 1.0


def test_eval_cli_with_diffusion_tower(tmp_path, capsys):
    """tiny-SD LLaVA benchmark eval purely through `lvr eval`."""
    bundle, _ = _write_bundle(tmp_path)
    docs = [{"question": "Shape?", "options": ["circle", "square"],
             "answer": "A"},
            {"question": "Color?", "options": ["red", "blue"],
             "answer": "B"}]
    d = tmp_path / "t"
    os.makedirs(d)
    with open(d / "q.json", "w") as f:
        json.dump(docs, f)
    from law_of_vision_representation_in_mllms_tpu.eval.tasks import (
        task_yaml)
    with open(task_yaml("mmbench_en")) as f:
        tcfg = yaml.safe_load(f)
    tcfg["dataset_path"] = str(d / "q.json")
    tcfg["image_root"] = str(d)
    tpath = str(d / "task.yaml")
    with open(tpath, "w") as f:
        yaml.safe_dump(tcfg, f)

    cfg_yaml = str(tmp_path / "run.yaml")
    with open(cfg_yaml, "w") as f:
        yaml.safe_dump({
            "model": {"vision_tower": "runwayml/stable-diffusion-v1-5",
                      "decoder": "tiny",
                      "tower_weights": [bundle]},
            "train": {"bf16": False}}, f)
    out_json = str(tmp_path / "res.json")
    rc = cli_main(["eval", "--config", cfg_yaml, "--tasks", tpath,
                   "--output", out_json])
    assert rc == 0
    res = json.load(open(out_json))
    assert 0.0 <= res["mmbench_en"]["value"] <= 1.0


def test_train_cli_with_diffusion_tower(tmp_path):
    """tiny-SD stage-1 training from images through `lvr train`."""
    bundle, _ = _write_bundle(tmp_path)
    from PIL import Image
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    recs = []
    for i in range(4):
        Image.new("RGB", (48, 40), (40 * i, 90, 10)).save(
            img_dir / f"i{i}.jpg")
        recs.append({"image": f"i{i}.jpg", "conversations": [
            {"from": "human", "value": "<image>\ndescribe"},
            {"from": "gpt", "value": f"thing {i}"}]})
    with open(tmp_path / "data.json", "w") as f:
        json.dump(recs, f)
    cfg_yaml = str(tmp_path / "run.yaml")
    with open(cfg_yaml, "w") as f:
        yaml.safe_dump({
            "model": {"vision_tower": "runwayml/stable-diffusion-v1-5",
                      "decoder": "tiny",
                      "tower_weights": [bundle]},
            "train": {"stage": 1, "batch_size": 2, "epochs": 1,
                      "bf16": False, "max_length": 32,
                      "output_dir": str(tmp_path / "out"),
                      "save_steps": 1000},
            "data": {"data_path": str(tmp_path / "data.json"),
                     "image_folder": str(img_dir)},
            "parallel": {"n_data": 2}}, f)
    rc = cli_main(["train", "--config", cfg_yaml])
    assert rc == 0
    losses = [json.loads(l)["loss"]
              for l in open(tmp_path / "out" / "train.jsonl")]
    assert losses and all(np.isfinite(losses)), losses
    assert os.path.exists(tmp_path / "out" / "mm_projector.npz")


def test_port_featurizer_bundle_from_snapshot(tmp_path):
    """The production port path: a diffusers snapshot directory (unet/,
    vae/, text_encoder/) -> bundle, with the prompt conditioning
    golden-checked against HF CLIPTextModel."""
    from transformers import CLIPTextConfig, CLIPTextModel
    hf_unet, hf_vae, fcfg = _tiny_torch_sd()
    hf_unet.save_pretrained(tmp_path / "unet")
    hf_vae.save_pretrained(tmp_path / "vae")
    torch.manual_seed(1)
    text = CLIPTextModel(CLIPTextConfig(
        vocab_size=99, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, projection_dim=16,
        max_position_embeddings=12)).eval()
    text.save_pretrained(tmp_path / "text_encoder")

    ids = np.array([[49406 % 99, 5, 7, 2, 2]], np.int32)
    out = port_featurizer_bundle(
        "sd15", str(tmp_path), str(tmp_path / "bundle.npz"),
        img_size=32, prompt_ids=ids, config=fcfg)
    params, cfg2 = load_featurizer_bundle(out)
    assert cfg2 is not None and cfg2.img_size == 32
    assert cfg2.unet.block_out_channels == (8, 16)

    with torch.no_grad():
        want = text(torch.from_numpy(ids.astype(np.int64))
                    ).last_hidden_state.numpy()
    np.testing.assert_allclose(params["prompt_embeds"], want,
                               atol=2e-5, rtol=1e-3)

    feats = F.extract_features(
        jax.tree.map(jnp.asarray, params), cfg2,
        jnp.asarray(np.random.RandomState(0).randn(
            1, 32, 32, 3).astype(np.float32)).clip(-1, 1),
        deterministic=True, precision=FP32_PRECISION)
    assert feats.shape == (1, 256, 16)
