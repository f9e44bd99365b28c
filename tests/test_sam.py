"""SAM (models/sam.py) golden tests vs transformers.SamModel on tiny
random configs — encoder hidden states, box-prompted mask logits, IoU
scores, and the postprocessing path used by `lvr sam-masks`."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from law_of_vision_representation_in_mllms_tpu.io.hf_port import (
    port_sam, sam_config_from_hf)
from law_of_vision_representation_in_mllms_tpu.models import sam as S


def _tiny_hf(seed=0, window=2, global_idx=(1,)):
    from transformers import (SamConfig, SamMaskDecoderConfig, SamModel,
                              SamPromptEncoderConfig, SamVisionConfig)
    vc = SamVisionConfig(hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64,
                         mlp_dim=64, image_size=64, patch_size=8,
                         window_size=window,
                         global_attn_indexes=list(global_idx),
                         output_channels=16, num_pos_feats=8)
    pc = SamPromptEncoderConfig(hidden_size=16, image_embedding_size=8,
                                image_size=64, patch_size=8)
    mc = SamMaskDecoderConfig(hidden_size=16, num_hidden_layers=2,
                              num_attention_heads=2, mlp_dim=32,
                              iou_head_hidden_dim=16)
    cfg = SamConfig(vision_config=vc.to_dict(),
                    prompt_encoder_config=pc.to_dict(),
                    mask_decoder_config=mc.to_dict())
    torch.manual_seed(seed)
    model = SamModel(cfg).eval()
    return model, cfg


def test_sam_image_encoder_golden():
    model, hf_cfg = _tiny_hf()
    cfg = sam_config_from_hf(model.config)
    params = port_sam(model.state_dict(), cfg)
    rng = np.random.RandomState(0)
    px = rng.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = model.get_image_embeddings(
            torch.from_numpy(px).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(S.encode_image(params, cfg, jnp.asarray(px)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               atol=2e-4, rtol=1e-3)


def test_sam_box_masks_golden():
    """Full box-prompted path: logits + iou vs SamModel forward, both
    multimask settings, 2 boxes per image."""
    model, _ = _tiny_hf(seed=1)
    cfg = sam_config_from_hf(model.config)
    params = port_sam(model.state_dict(), cfg)
    rng = np.random.RandomState(1)
    px = rng.randn(1, 64, 64, 3).astype(np.float32)
    boxes = np.array([[[4.0, 6.0, 40.0, 50.0],
                       [10.0, 10.0, 30.0, 28.0]]], np.float32)
    for multi in (False, True):
        with torch.no_grad():
            out = model(pixel_values=torch.from_numpy(px).permute(
                0, 3, 1, 2),
                input_boxes=torch.from_numpy(boxes),
                multimask_output=multi)
        masks, iou = S.segment(params, cfg, jnp.asarray(px),
                               jnp.asarray(boxes), multimask_output=multi)
        np.testing.assert_allclose(np.asarray(masks),
                                   out.pred_masks.numpy(),
                                   atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(iou),
                                   out.iou_scores.numpy(),
                                   atol=5e-4, rtol=1e-3)


def test_sam_global_attention_layer():
    """A config where BOTH layers are global (window 0 everywhere) plus a
    different window size exercises the rel-pos table paths."""
    model, _ = _tiny_hf(seed=2, window=4, global_idx=(0, 1))
    cfg = sam_config_from_hf(model.config)
    params = port_sam(model.state_dict(), cfg)
    rng = np.random.RandomState(2)
    px = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = model.get_image_embeddings(
            torch.from_numpy(px).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(S.encode_image(params, cfg, jnp.asarray(px)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               atol=2e-4, rtol=1e-3)


def test_sam_postprocess_mask():
    """postprocess_mask matches the SamPredictor upscale-crop-resize
    contract: a blob in the low-res logits lands at the right place and
    scale in the original frame."""
    low = np.full((32, 32), -5.0, np.float32)
    low[8:16, 4:12] = 5.0          # active region in low-res frame
    # model frame 64, image occupied the top-left 48x32 (input_hw), and
    # the original image was 96x64
    m = S.postprocess_mask(jnp.asarray(low), input_hw=(48, 32),
                           original_hw=(96, 64), image_size=64)
    m = np.asarray(m)
    assert m.shape == (96, 64)
    # low-res active box [8:16, 4:12] of 32 -> model frame x2 = [16:32,
    # 8:24]; crop keeps it; scale to original (x2 both dims)
    assert m[40, 30]               # center of the blob
    assert not m[10, 10] and not m[90, 60]
    frac = m.mean()
    assert 0.04 < frac < 0.2       # blob-sized, not empty/everything


def test_sam_mask_pipeline_roundtrip(tmp_path):
    """`lvr sam-masks` over a toy image dir + bbox json: writes
    {name}_mask.png and {name}_mask_flip.png like
    `preprocess_mask_sam.py:70-78`, with the flip being the mirror."""
    from PIL import Image
    from law_of_vision_representation_in_mllms_tpu.pipeline.sam_masks import (
        run_sam_masks)
    import json
    import os

    model, _ = _tiny_hf(seed=3)
    cfg = sam_config_from_hf(model.config)
    params = port_sam(model.state_dict(), cfg)

    img_dir = tmp_path / "JPEGImages" / "cat"
    os.makedirs(img_dir)
    Image.new("RGB", (80, 60), (90, 120, 40)).save(img_dir / "im0.jpg")
    ann_dir = tmp_path / "ImageAnnotation" / "cat"
    os.makedirs(ann_dir)
    with open(ann_dir / "im0.json", "w") as f:
        json.dump({"bbox": [10, 10, 40, 30]}, f)   # x, y, w, h

    n = run_sam_masks(params, cfg, str(tmp_path / "JPEGImages"),
                      anno_size=64, spair=False)
    assert n == 1
    out_dir = tmp_path / "features" / "cat"
    mask = np.asarray(Image.open(out_dir / "im0_mask.png"))
    flip = np.asarray(Image.open(out_dir / "im0_mask_flip.png"))
    assert mask.shape == (64, 64)
    assert set(np.unique(mask)) <= {0, 255}
    np.testing.assert_array_equal(flip, mask[:, ::-1])


def test_sam_masks_cli(tmp_path):
    """`lvr sam-masks` end-to-end from a saved HF snapshot."""
    import json
    import os
    from PIL import Image
    from law_of_vision_representation_in_mllms_tpu.cli import main as cli_main

    model, _ = _tiny_hf(seed=4)
    snap = tmp_path / "snap"
    model.save_pretrained(snap)

    img_dir = tmp_path / "data" / "JPEGImages" / "dog"
    os.makedirs(img_dir)
    Image.new("RGB", (50, 70), (30, 60, 90)).save(img_dir / "d1.jpg")
    ann_dir = tmp_path / "data" / "ImageAnnotation" / "dog"
    os.makedirs(ann_dir)
    with open(ann_dir / "d1.json", "w") as f:
        json.dump({"bbox": [5, 10, 30, 40]}, f)

    rc = cli_main(["sam-masks", "--snapshot", str(snap),
                   "--images", str(tmp_path / "data" / "JPEGImages"),
                   "--anno-size", "64"])
    assert rc == 0
    out = tmp_path / "data" / "features" / "dog" / "d1_mask.png"
    assert out.exists()
    assert (tmp_path / "data" / "features" / "dog"
            / "d1_mask_flip.png").exists()
