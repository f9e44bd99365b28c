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
