"""Data layer tests: templates, label masking, collation, samplers,
on-disk datasets."""

import json
import os

import numpy as np

from law_of_vision_representation_in_mllms_tpu.data import (
    get_template, preprocess_sources, tokenizer_image_token,
    SimpleTokenizer, SupervisedDataset, FeatureDataset, collate_batch,
    length_grouped_indices)
from law_of_vision_representation_in_mllms_tpu.models.splice import (
    IGNORE_INDEX, IMAGE_TOKEN_INDEX)
from law_of_vision_representation_in_mllms_tpu.models.towers import (
    parse_tower_spec)

TOK = SimpleTokenizer()

CONV = [
    {"from": "human", "value": "<image>\nWhat is in the picture?"},
    {"from": "gpt", "value": "A cat on a mat."},
    {"from": "human", "value": "What color?"},
    {"from": "gpt", "value": "Orange."},
]


def test_tokenizer_image_token():
    ids = tokenizer_image_token("hello <image> world", TOK)
    assert ids[0] == TOK.bos_token_id
    assert IMAGE_TOKEN_INDEX in ids
    assert ids.count(IMAGE_TOKEN_INDEX) == 1


def test_preprocess_v1_masks_only_assistant():
    ids, labels = preprocess_sources(CONV, get_template("v1"), TOK)
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
    assert len(ids) == len(labels)
    tgt = labels != IGNORE_INDEX
    assert tgt.sum() > 0
    # supervised positions carry their own token ids
    np.testing.assert_array_equal(ids[tgt], labels[tgt])
    # the image token is never supervised
    assert labels[np.where(ids == IMAGE_TOKEN_INDEX)[0][0]] == IGNORE_INDEX
    # both assistant turns are supervised (two separate target spans)
    spans = np.diff(np.concatenate([[0], tgt.astype(int), [0]]))
    assert (spans == 1).sum() == 2


def test_preprocess_plain_stage1():
    ids, labels = preprocess_sources(CONV[:2], get_template("plain"), TOK)
    # stage 1 keeps only <image> + caption: exactly bos, -200, caption
    assert ids[1] == IMAGE_TOKEN_INDEX
    assert (labels[:2] == IGNORE_INDEX).all()
    assert (labels[2:] != IGNORE_INDEX).all()


def test_collate_bucketing():
    samples = []
    for n in (5, 9, 33):
        samples.append({"input_ids": np.arange(n, dtype=np.int32),
                        "labels": np.arange(n, dtype=np.int32),
                        "pixel_values": [np.zeros((4, 4, 3), np.float32)],
                        "has_image": True})
    batch = collate_batch(samples)
    assert batch["input_ids"].shape == (3, 64)     # power-of-two bucket
    assert batch["text_mask"][0].sum() == 5
    assert (batch["labels"][0][5:] == IGNORE_INDEX).all()
    assert batch["pixel_values"][0].shape == (3, 4, 4, 3)


def test_length_grouped_indices_modality():
    lengths = np.asarray([10, 20, -5, 30, -8, 40, 50, -2])
    idx = length_grouped_indices(lengths, batch_size=2, world_size=1, seed=0)
    assert sorted(idx.tolist()) == list(range(8))
    # full megabatches (first 3 of 2 each: 2 mm-full + 1 txt-full) are
    # modality-homogeneous; leftovers trail at the end
    for i in range(0, 6, 2):
        signs = np.sign(lengths[idx[i:i + 2]])
        assert len(set(signs.tolist())) == 1


def test_supervised_and_feature_datasets(tmp_path):
    from PIL import Image
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    Image.new("RGB", (40, 30), (120, 50, 20)).save(img_dir / "a.jpg")
    records = [
        {"image": "a.jpg", "conversations": CONV[:2]},
        {"conversations": [{"from": "human", "value": "hi"},
                           {"from": "gpt", "value": "hello"}]},
    ]
    data_path = tmp_path / "data.json"
    with open(data_path, "w") as f:
        json.dump(records, f)

    spec = parse_tower_spec(
        "openai/clip-vit-large-patch14.facebook/dinov2-large")
    ds = SupervisedDataset(str(data_path), str(img_dir), spec,
                           get_template("v1"), TOK)
    s0 = ds[0]
    assert len(s0["pixel_values"]) == 2            # one per tower
    assert s0["pixel_values"][0].shape == (224, 224, 3)
    assert ds.lengths()[0] > 0 and ds.lengths()[1] < 0

    feat_dir = tmp_path / "feats"
    os.makedirs(feat_dir)
    np.save(feat_dir / "a.npy", np.ones((8, 16), np.float32))
    fds = FeatureDataset(str(data_path), str(feat_dir), get_template("v1"),
                         TOK, feature_shape=(8, 16))
    assert fds[0]["pixel_values"][0].shape == (8, 16)
    assert (fds[1]["pixel_values"][0] == 0).all()  # text-only dummy


def test_tower_spec_parsing_variants():
    from law_of_vision_representation_in_mllms_tpu.models.towers import (
        parse_tower_spec)
    # dot-concat of ViT + diffusion tower (ids contain no ambiguous dots)
    spec = parse_tower_spec(
        "openai/clip-vit-large-patch14.facebook/dinov2-large")
    assert spec.join == "concat" and len(spec.entries) == 2
    assert spec.mm_hidden_size == 2048
    # single diffusion tower name parses as single (despite the '-v1-5')
    spec2 = parse_tower_spec("runwayml/stable-diffusion-v1-5")
    assert spec2.join == "single" and spec2.entries[0].kind == "diffusion"
    assert spec2.entries[0].num_patches == 576         # 24x24 @768 up_ft 0
    # ViT + SD concat
    spec3 = parse_tower_spec(
        "openai/clip-vit-large-patch14.runwayml/stable-diffusion-v1-5")
    assert [e.kind for e in spec3.entries] == ["vit", "diffusion"]
