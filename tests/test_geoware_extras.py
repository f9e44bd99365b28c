"""GeoAware-SC extras: co-PCA fusion, facet descriptors, pose awareness.

Oracles: torch re-implementations of `C_score/utils/utils_correspondence.py
co_pca` (exact SVD), `C_score/model_utils/extractor_dino.py` facet hooks
(computed from HF Dinov2 weights) and `_log_bin` (numpy loops), and the
`pose_awareness_test.py` mean masked-NN distance loop.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.io.hf_port import port_dinov2
from law_of_vision_representation_in_mllms_tpu.metrics.geoware_extras import (
    classify_pose, co_pca, fuse_descriptors, grid_to_descriptors,
    masked_nn_mean_distance, pose_awareness_eval, resize_mask_nearest)
from law_of_vision_representation_in_mllms_tpu.models.facet import (
    _log_bin, facet_descriptors)
from law_of_vision_representation_in_mllms_tpu.models.vit import (
    ViTConfig, ViTEncoder)

TINY = dict(image_size=28, patch_size=7, hidden_size=32, num_layers=3,
            num_heads=4, intermediate_size=64)


# ---------------------------------------------------------------------------
# co_pca
# ---------------------------------------------------------------------------

def _torch_co_pca(f1, f2, dims):
    """Reference co_pca (`utils_correspondence.py:144-224`) with exact SVD
    in place of torch.pca_lowrank. f1/f2: {name: [1,C,H,W] torch}."""
    red1, red2 = {}, {}
    for name, dim in zip(("s5", "s4", "s3"), dims):
        a = f1[name].reshape(f1[name].shape[1], -1)
        b = f2[name].reshape(f2[name].shape[1], -1)
        feats = torch.cat([a, b], dim=-1).permute(1, 0)      # [(ta+tb), C]
        mean = feats.mean(dim=0, keepdim=True)
        centered = feats - mean
        _, _, vh = torch.linalg.svd(centered, full_matrices=False)
        reduced = centered @ vh[:dim].T                       # [(ta+tb), dim]
        half = reduced.shape[0] // 2
        h1, w1 = f1[name].shape[-2:]
        h2, w2 = f2[name].shape[-2:]
        red1[name] = reduced[:half].permute(1, 0).reshape(1, dim, h1, w1)
        red2[name] = reduced[half:].permute(1, 0).reshape(1, dim, h2, w2)

    def gather(red):
        s4hw = red["s4"].shape[-2:]
        s3hw = red["s3"].shape[-2:]
        s5u = TF.interpolate(red["s5"], size=s4hw, mode="bilinear",
                             align_corners=False)
        s45 = torch.cat([red["s4"], s5u], dim=1)
        return torch.cat(
            [red["s3"], TF.interpolate(s45, size=s3hw, mode="bilinear",
                                       align_corners=False)], dim=1)
    return gather(red1), gather(red2)


def _dists(a, b):
    """All-pairs L2 distances between [t,C] and [t,C]."""
    return np.linalg.norm(a[:, None] - b[None], axis=-1)


def test_co_pca_matches_torch_oracle():
    rng = np.random.RandomState(0)
    dims = (5, 4, 3)
    shapes = {"s5": (2, 2, 12), "s4": (4, 4, 10), "s3": (8, 8, 6)}
    f1 = {k: rng.randn(1, *s).astype(np.float32) for k, s in shapes.items()}
    f2 = {k: rng.randn(1, *s).astype(np.float32) for k, s in shapes.items()}

    ours1, ours2 = co_pca({k: jnp.asarray(v) for k, v in f1.items()},
                          {k: jnp.asarray(v) for k, v in f2.items()}, dims)
    ours1, ours2 = np.asarray(ours1), np.asarray(ours2)
    assert ours1.shape == (1, 8, 8, sum(dims))

    t1 = {k: torch.from_numpy(v).permute(0, 3, 1, 2) for k, v in f1.items()}
    t2 = {k: torch.from_numpy(v).permute(0, 3, 1, 2) for k, v in f2.items()}
    ref1, ref2 = _torch_co_pca(t1, t2, dims)
    ref1 = ref1.permute(0, 2, 3, 1).numpy()
    ref2 = ref2.permute(0, 2, 3, 1).numpy()

    # PCA component signs differ between SVD implementations, but both
    # images share one projection, so all cross-image distances (the only
    # thing the protocol consumes) must match — per channel block, which
    # pins the (s3, s4, s5) concat order since the dims differ.
    blocks = {"s3": (0, 3), "s4": (3, 7), "s5": (7, 12)}
    for name, (lo, hi) in blocks.items():
        d_ours = _dists(ours1.reshape(-1, 12)[:, lo:hi],
                        ours2.reshape(-1, 12)[:, lo:hi])
        d_ref = _dists(ref1.reshape(-1, 12)[:, lo:hi],
                       ref2.reshape(-1, 12)[:, lo:hi])
        np.testing.assert_allclose(d_ours, d_ref, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# facet descriptors (golden vs HF Dinov2)
# ---------------------------------------------------------------------------

def _tiny_dinov2():
    from transformers import Dinov2Config, Dinov2Model
    hf_cfg = Dinov2Config(
        hidden_size=TINY["hidden_size"],
        intermediate_size=TINY["intermediate_size"],
        num_hidden_layers=TINY["num_layers"],
        num_attention_heads=TINY["num_heads"],
        image_size=TINY["image_size"], patch_size=TINY["patch_size"],
        mlp_ratio=2)
    torch.manual_seed(3)
    hf = Dinov2Model(hf_cfg).eval()
    cfg = ViTConfig(hidden_act="gelu", layer_norm_eps=1e-6,
                    use_class_token=True, use_pre_layernorm=False,
                    patch_bias=True, use_layerscale=True, **TINY)
    return hf, cfg, port_dinov2(hf.state_dict(), cfg)


def test_token_facet_golden():
    hf, cfg, params = _tiny_dinov2()
    pixels = np.random.RandomState(4).randn(
        2, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    enc = ViTEncoder(cfg, FP32_PRECISION)
    layer = 1
    desc = facet_descriptors(enc, {"params": params},
                             jnp.asarray(pixels), layer=layer, facet="token")
    with torch.no_grad():
        out = hf(torch.from_numpy(pixels).permute(0, 3, 1, 2),
                 output_hidden_states=True)
    ref = out.hidden_states[layer + 1][:, 1:].numpy()      # CLS dropped
    assert desc.shape == (2, 1, ref.shape[1], ref.shape[2])
    np.testing.assert_allclose(np.asarray(desc)[:, 0], ref,
                               atol=6e-5, rtol=1e-4)


@pytest.mark.parametrize("facet", ["query", "key", "value"])
def test_qkv_facet_golden(facet):
    hf, cfg, params = _tiny_dinov2()
    pixels = np.random.RandomState(5).randn(
        1, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    enc = ViTEncoder(cfg, FP32_PRECISION)
    layer = 2
    desc = facet_descriptors(enc, {"params": params},
                             jnp.asarray(pixels), layer=layer, facet=facet)

    with torch.no_grad():
        out = hf(torch.from_numpy(pixels).permute(0, 3, 1, 2),
                 output_hidden_states=True)
        h = out.hidden_states[layer]                       # block input
        blk = hf.encoder.layer[layer]
        normed = blk.norm1(h)
        proj = getattr(blk.attention.attention, facet)(normed)
        bsz, t, _ = proj.shape
        heads = TINY["num_heads"]
        dh = TINY["hidden_size"] // heads
        per_head = proj.reshape(bsz, t, heads, dh).permute(0, 2, 1, 3)
        # extractor_dino.py:316-341: Bxhxtxd -> Bxtxdxh -> flatten (d-major)
        ref = per_head[:, :, 1:].permute(0, 2, 3, 1).reshape(
            bsz, t - 1, dh * heads).numpy()
    np.testing.assert_allclose(np.asarray(desc)[:, 0], ref,
                               atol=6e-5, rtol=1e-4)


def test_log_bin_matches_loop_oracle():
    rng = np.random.RandomState(6)
    gh, gw, h, d = 4, 5, 2, 3
    x = rng.randn(1, h, gh * gw, d).astype(np.float32)

    ours = np.asarray(_log_bin(jnp.asarray(x), (gh, gw)))

    # numpy oracle: extractor_dino.py:268-314 verbatim (loops + avg pools
    # with count_include_pad=False and edge-clamped out-of-range bins)
    D = d * h
    fmap = x.transpose(0, 2, 3, 1).reshape(gh, gw, D)
    pools = {}
    for k in range(2):
        win = 3 ** k
        pooled = np.zeros_like(fmap)
        pad = win // 2
        for y in range(gh):
            for xx in range(gw):
                ys = slice(max(0, y - pad), min(gh, y + pad + 1))
                xs = slice(max(0, xx - pad), min(gw, xx + pad + 1))
                pooled[y, xx] = fmap[ys, xs].mean(axis=(0, 1))
        pools[k] = pooled
    ref = np.zeros((gh, gw, D * 17), np.float32)
    for y in range(gh):
        for xx in range(gw):
            part = 0
            for k in range(2):
                win = 3 ** k
                for i in range(y - win, y + win + 1, win):
                    for j in range(xx - win, xx + win + 1, win):
                        if i == y and j == xx and k != 0:
                            continue
                        ci = min(max(i, 0), gh - 1)
                        cj = min(max(j, 0), gw - 1)
                        ref[y, xx, part * D:(part + 1) * D] = pools[k][ci, cj]
                        part += 1
    np.testing.assert_allclose(ours[0, 0], ref.reshape(gh * gw, -1),
                               atol=1e-5, rtol=1e-5)


def test_stride_override_patch_embedding():
    """Overlapping-stride unfold == explicit sliding-window oracle, and the
    grid formula matches `extractor_dino.py:245-246`."""
    cfg = ViTConfig(image_size=28, patch_size=7, stride=3, hidden_size=32,
                    num_layers=1, num_heads=4, intermediate_size=64,
                    use_class_token=False, use_pre_layernorm=False,
                    patch_bias=False)
    assert cfg.grid == 8                       # 1 + (28-7)//3
    enc = ViTEncoder(cfg, FP32_PRECISION)
    pixels = np.random.RandomState(7).randn(1, 28, 28, 3).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(pixels))
    _, hs = enc.apply(variables, jnp.asarray(pixels), num_blocks=0,
                      output_hidden_states=True)
    emb = np.asarray(hs[0])                    # [1, 64, 32], pos added

    kernel = np.asarray(variables["params"]["patch_kernel"]).reshape(-1, 32)
    pos = np.asarray(variables["params"]["pos_embed"])
    ref = np.zeros((64, 32), np.float32)
    for gy in range(8):
        for gx in range(8):
            patch = pixels[0, gy * 3:gy * 3 + 7, gx * 3:gx * 3 + 7]
            ref[gy * 8 + gx] = patch.reshape(-1) @ kernel
    np.testing.assert_allclose(emb[0], ref + pos[0], atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# masked NN distance + pose protocol
# ---------------------------------------------------------------------------

def test_masked_nn_mean_distance_matches_loop():
    rng = np.random.RandomState(8)
    grid, c = 4, 6
    src = rng.randn(1, 1, grid * grid, c).astype(np.float32)
    tgt = rng.randn(1, 1, grid * grid, c).astype(np.float32)
    mask = (rng.rand(grid, grid) > 0.4).astype(np.float32)

    got = float(masked_nn_mean_distance(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask),
        grid=grid, res=grid))

    # pose_awareness_test.py:196-207: per masked src patch, min L2 to any
    # target patch; mean
    dists = []
    for i in range(grid * grid):
        if mask.reshape(-1)[i] == 1:
            d = np.linalg.norm(tgt[0, 0] - src[0, 0, i], axis=-1)
            dists.append(d.min())
    np.testing.assert_allclose(got, np.mean(dists), rtol=1e-5)


def test_resize_mask_nearest_matches_torch():
    rng = np.random.RandomState(9)
    m = (rng.rand(5, 7) > 0.5).astype(np.float32)
    ours = resize_mask_nearest(m, 11)
    ref = TF.interpolate(torch.from_numpy(m)[None, None], size=(11, 11),
                         mode="nearest")[0, 0].numpy()
    np.testing.assert_array_equal(ours, ref)


def test_classify_pose_votes():
    # back-vs-front: 2 of 3 sets say front is closer -> 'f'; left-right ->
    # 'l'. 4-way: argmin per set = [1, 1, 2] -> bincount argmax = 1 ('f').
    d = np.zeros(12)
    d[[0, 4, 8]] = [3.0, 3.0, 1.0]      # back
    d[[1, 5, 9]] = [1.0, 1.0, 3.0]      # front
    d[[2, 6, 10]] = [2.0, 2.0, 2.0]     # left
    d[[3, 7, 11]] = [2.5, 2.5, 2.5]     # right
    bf, lr, four = classify_pose(d)
    assert (bf, lr, four) == ("f", "l", "f")

    res = pose_awareness_eval([d, d], ["f", "r"])
    # 'f' in (bf_ind, lr_ind) = ('f','l'); 'r' is not
    assert res["correct_2"] == 0.5
    assert res["correct_4"] == 0.5
    assert res["correct_2_fb"] == 1.0 and res["correct_2_lr"] == 0.0


# ---------------------------------------------------------------------------
# end-to-end CLI pipeline (tiny models)
# ---------------------------------------------------------------------------

def _tiny_sd3_bundle(tmp_path):
    """Init (not port) a 3-resolution tiny SD featurizer bundle."""
    from law_of_vision_representation_in_mllms_tpu.io.featurizer_bundle \
        import save_featurizer_bundle
    from law_of_vision_representation_in_mllms_tpu.models import (
        featurizer as F, unet as UN, vae as VA)
    fcfg = F.FeaturizerConfig(
        family="sd", t=1, up_ft_index=2, img_size=112,
        unet=UN.UNetConfig(block_out_channels=(8, 16, 16),
                           layers_per_block=1, cross_attention_dim=16,
                           num_heads=(2, None, None),
                           transformer_depth=(1, 0, 0), norm_groups=4),
        vae=VA.VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                         latent_channels=4, norm_groups=4))
    rng = jax.random.PRNGKey(0)
    px = jnp.zeros((1, 112, 112, 3), jnp.float32)
    vae_params = VA.VAEEncoder(fcfg.vae, FP32_PRECISION).init(rng, px)
    lat = jnp.zeros((1, 56, 56, 4), jnp.float32)
    ctx = jnp.zeros((1, 5, 16), jnp.float32)
    un = UN.UNetHarvest(fcfg.unet, up_ft_indices=(), pre_up_indices=(0, 1, 2),
                        precision=FP32_PRECISION)
    un_params = un.init(rng, lat, 1, ctx)
    params = {"vae": vae_params["params"], "backbone": un_params["params"],
              "prompt_embeds": np.random.RandomState(1).randn(
                  1, 5, 16).astype(np.float32)}
    return save_featurizer_bundle(str(tmp_path / "sd_tiny.npz"), params,
                                  fcfg)


def test_geoware_pipeline_e2e(tmp_path):
    """`lvr preprocess-map` + `lvr pose-awareness` run end-to-end on tiny
    models (SD at 32px -> latent 16 -> s3 grid 16 == tiny-vit-112's DINO
    grid) and produce valid metrics."""
    from PIL import Image
    from law_of_vision_representation_in_mllms_tpu.cli import main as cli
    from law_of_vision_representation_in_mllms_tpu.io.param_io import (
        save_params)
    from law_of_vision_representation_in_mllms_tpu.models.vit import (
        VIT_PRESETS)

    sd_bundle = _tiny_sd3_bundle(tmp_path)
    dcfg = VIT_PRESETS["debug/tiny-vit-112"]()
    enc = ViTEncoder(dcfg, FP32_PRECISION)
    dv = enc.init(jax.random.PRNGKey(1),
                  jnp.zeros((1, 112, 112, 3), jnp.float32))
    dino_npz = str(tmp_path / "dino_tiny.npz")
    save_params(dino_npz, dv["params"])

    rng = np.random.RandomState(11)
    tdir = tmp_path / "templates"
    gdir = tmp_path / "targets"
    tdir.mkdir(), gdir.mkdir()
    for i in range(12):
        Image.fromarray(rng.randint(0, 255, (40, 36, 3), np.uint8)).save(
            tdir / f"t{i:02d}.png")
    labels = {}
    for i, pose in enumerate(["l", "r"]):
        name = f"img{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (36, 44, 3), np.uint8)).save(
            gdir / name)
        labels[name] = pose
    lpath = tmp_path / "labels.json"
    lpath.write_text(json.dumps(labels))

    feat_dir = str(tmp_path / "feats")
    common = ["--sd-bundle", sd_bundle, "--dino-bundle", dino_npz,
              "--dino-tower", "debug/tiny-vit-112", "--real-size", "32",
              "--dino-size", "112", "--layer", "1", "--no-flips"]
    assert cli(["preprocess-map", str(tdir), feat_dir] + common) == 0
    assert cli(["preprocess-map", str(gdir), feat_dir] + common) == 0
    assert os.path.exists(os.path.join(feat_dir, "t00_sd.npz"))
    assert os.path.exists(os.path.join(feat_dir, "img0_dino.npy"))

    out = tmp_path / "pose.json"
    assert cli(["pose-awareness", str(tdir), str(gdir), str(lpath),
                feat_dir, "--res", "16", "--output", str(out)]) == 0
    got = json.loads(out.read_text())
    assert set(got["results"]) >= {"correct_2", "correct_4", "n"}
    assert got["results"]["n"] == 2
    assert len(got["rows"][0]) == 12


def test_attn_facet_and_saliency_golden():
    """'attn' facet == HF Dinov2 attention probs; saliency = normalized
    CLS->patch attention of selected heads (`extractor_dino.py:342-356`)."""
    from law_of_vision_representation_in_mllms_tpu.models.facet import (
        attention_maps, extract_saliency_maps)
    hf, cfg, params = _tiny_dinov2()
    # sdpa attention returns attentions=None; rebuild eager on same weights
    from transformers import Dinov2Model
    eager_cfg = hf.config
    eager_cfg._attn_implementation = "eager"
    hf_eager = Dinov2Model(eager_cfg).eval()
    hf_eager.load_state_dict(hf.state_dict())
    hf = hf_eager
    pixels = np.random.RandomState(12).randn(
        2, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    enc = ViTEncoder(cfg, FP32_PRECISION)
    layer = 2
    probs = np.asarray(attention_maps(enc, {"params": params},
                                      jnp.asarray(pixels), layer=layer))
    with torch.no_grad():
        out = hf(torch.from_numpy(pixels).permute(0, 3, 1, 2),
                 output_attentions=True)
    ref = out.attentions[layer].numpy()
    np.testing.assert_allclose(probs, ref, atol=2e-5, rtol=1e-4)

    sal = np.asarray(extract_saliency_maps(
        enc, {"params": params}, jnp.asarray(pixels), layer=layer,
        head_idxs=(0, 2)))
    cls_attn = ref[:, [0, 2], 0, 1:].mean(axis=1)
    lo = cls_attn.min(axis=1, keepdims=True)
    hi = cls_attn.max(axis=1, keepdims=True)
    np.testing.assert_allclose(sal, (cls_attn - lo) / (hi - lo),
                               atol=1e-5, rtol=1e-4)
    assert sal.shape == (2, cfg.num_patches)


# ---------------------------------------------------------------------------
# ODISE / SAM mask-file format parity (VERDICT r3 #9)
# ---------------------------------------------------------------------------

def test_mask_file_format_parity(tmp_path):
    """_load_mask ingests masks in the exact formats the reference's
    preprocessors write: preprocess_mask_sam.py:72-78 saves
    `{stem}_mask.png` as a {0,255} single-channel PNG via cv2.imwrite;
    an ODISE get_mask export is a float {0,1} .npy. Resizing must match
    torch F.interpolate(mode='nearest') (pose_awareness_test.py:179)."""
    from PIL import Image
    from law_of_vision_representation_in_mllms_tpu.pipeline.geoware import (
        _load_mask)

    rng = np.random.RandomState(0)
    m = (rng.rand(960, 960) > 0.6)
    # the reference writer: cv2.imwrite(path, np.clip(mask,0,1)*255) on a
    # bool SAM mask -> uint8 grayscale PNG with values {0,255}
    Image.fromarray((m * 255).astype(np.uint8), mode="L").save(
        tmp_path / "img1_mask.png")
    got = _load_mask(str(tmp_path), "img1", 60)
    ref = TF.interpolate(torch.from_numpy(m.astype(np.float32))[None, None],
                         size=(60, 60), mode="nearest")[0, 0].numpy()
    np.testing.assert_array_equal(got, ref)

    # ODISE-style float {0,1} .npy export
    np.save(tmp_path / "img2_mask.npy", m.astype(np.float32))
    got2 = _load_mask(str(tmp_path), "img2", 60)
    np.testing.assert_array_equal(got2, ref)

    # missing file -> all-ones (the reference's mask=False behaviour)
    np.testing.assert_array_equal(_load_mask(str(tmp_path), "img3", 8),
                                  np.ones((8, 8), np.float32))


def test_panoptic_to_binary_mask_matches_reference_semantics():
    """panoptic_to_binary_mask vs a literal port of extractor_sd.py:249-286
    get_mask's id-matching loop (torch oracle)."""
    from law_of_vision_representation_in_mllms_tpu.pipeline.geoware import (
        panoptic_to_binary_mask)

    classes = ["person", "potted plant", "tv", "dog"]
    seg = np.array([[0, 1, 1], [2, 2, 3], [3, 3, 0]])
    info = [{"id": 1, "category_id": 3},      # dog
            {"id": 2, "category_id": 0},      # person
            {"id": 3, "category_id": 2}]      # tv

    def oracle(category):
        convert = {"aeroplane": "airplane", "motorbike": "motorcycle",
                   "pottedplant": "potted plant", "tvmonitor": "tv"}
        if isinstance(category, list):
            category = [convert.get(c, c) for c in category]
        elif category in convert:
            category = convert[category]
        target = []
        for item in info:
            name = classes[item["category_id"]]
            if isinstance(category, list):
                for c in category:
                    if c in name:
                        target.append(item["id"])
            elif category in name:
                target.append(item["id"])
        s = torch.from_numpy(seg).float()
        out = torch.zeros_like(s)
        for i in target:
            out += (s == i).float()
        if not target or out.sum() < 6:
            out = torch.ones_like(s)
        return out.numpy()

    for cat in ("dog", "tvmonitor", ["person", "dog"], "zebra", "tv"):
        np.testing.assert_array_equal(
            panoptic_to_binary_mask(seg, info, classes, cat), oracle(cat))
