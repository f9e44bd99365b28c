"""Native feature-cache loader: batch load, pack, gather — vs numpy."""

import numpy as np
import pytest

from law_of_vision_representation_in_mllms_tpu.io import native_cache as nc


@pytest.fixture(scope="module")
def npy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("feats")
    rng = np.random.RandomState(0)
    paths, ref = [], []
    for i in range(7):
        a = rng.randn(6, 16).astype(np.float32)
        p = str(d / f"f{i}.npy")
        np.save(p, a)
        paths.append(p)
        ref.append(a)
    return paths, np.stack(ref)


def test_native_builds():
    assert nc.native_available(), "native loader failed to build"


def test_batch_load_matches_numpy(npy_dir):
    paths, ref = npy_dir
    got = nc.batch_load(paths, (6, 16))
    np.testing.assert_array_equal(got, ref)


def test_pack_and_gather(tmp_path, npy_dir):
    paths, ref = npy_dir
    pack_path = str(tmp_path / "cache.lvrpack")
    nc.pack(paths, (6, 16), pack_path)
    cache = nc.PackedCache(pack_path, (6, 16))
    assert cache.count == 7
    idx = [3, 0, 6, 3]
    got = cache.gather(idx)
    np.testing.assert_array_equal(got, ref[idx])
    cache.close()


def test_batch_load_fallback(monkeypatch, npy_dir):
    paths, ref = npy_dir
    monkeypatch.setattr(nc, "_load_lib", lambda build=True: None)
    got = nc.batch_load(paths[:3], (6, 16))
    np.testing.assert_array_equal(got, ref[:3])


def test_feature_dataset_with_packed_cache(tmp_path):
    import json
    from law_of_vision_representation_in_mllms_tpu.data import (
        FeatureDataset, get_template, SimpleTokenizer)

    rng = np.random.RandomState(1)
    feats = [rng.randn(8, 16).astype(np.float32) for _ in range(2)]
    paths = []
    for i, f in enumerate(feats):
        p = str(tmp_path / f"s{i}.npy")
        np.save(p, f)
        paths.append(p)
    pack_path = str(tmp_path / "train.lvrpack")
    nc.pack(paths, (8, 16), pack_path)

    recs = [{"image": f"s{i}.jpg",
             "conversations": [{"from": "human", "value": "<image>\nq"},
                               {"from": "gpt", "value": "a"}]}
            for i in range(2)]
    with open(tmp_path / "d.json", "w") as f:
        json.dump(recs, f)
    ds = FeatureDataset(str(tmp_path / "d.json"), "", get_template("v1"),
                        SimpleTokenizer(), feature_shape=(8, 16),
                        packed_cache=pack_path)
    for i in range(2):
        np.testing.assert_array_equal(ds[i]["pixel_values"][0], feats[i])
