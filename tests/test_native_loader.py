"""Native C++ batch loader: build, correctness vs numpy, prefetch,
fallback path, and a small gather throughput sanity check."""

import os
import time

import numpy as np
import pytest

from vae_captioning_tpu.data.native_loader import (
    RawImageStore, load_library, pack_images_to_raw)


@pytest.fixture(scope="module")
def packed(tmp_path_factory, mini_coco):
    out = str(tmp_path_factory.mktemp("raw") / "images.bin")
    index = pack_images_to_raw(
        [os.path.join(mini_coco, "images", "train2014")], out, size=64)
    return out, index


def test_library_builds():
    lib = load_library()
    assert lib is not None, "g++ toolchain expected in this environment"


def test_pack_and_meta(packed):
    out, index = packed
    assert len(index) == 10
    assert os.path.getsize(out) == 10 * 64 * 64 * 3
    assert os.path.exists(out + ".meta.json")


def test_native_gather_matches_numpy(packed):
    out, index = packed
    native = RawImageStore(out, num_threads=4)
    fallback = RawImageStore(out, force_numpy=True)
    names = list(index)[::-1][:7]  # reversed order, odd count
    a = native.get_batch(names)
    b = fallback.get_batch(names)
    assert a.shape == (7, 64, 64, 3) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)
    native.close()


def test_native_gather_repeated_and_interleaved(packed):
    out, index = packed
    store = RawImageStore(out, num_threads=2)
    names = list(index)
    # repeated rows in one request must all be filled
    req = [names[3], names[3], names[0], names[3]]
    got = store.get_batch(req)
    np.testing.assert_array_equal(got[0], got[1])
    np.testing.assert_array_equal(got[1], got[3])
    # many sequential jobs through the same pool (generation handling)
    for i in range(20):
        got = store.get_batch([names[i % len(names)]])
        assert got.shape == (1, 64, 64, 3)
    store.close()


def test_prefetch_is_safe(packed):
    out, index = packed
    store = RawImageStore(out)
    store.prefetch(list(index)[:5])
    got = store.get_batch(list(index)[:5])
    assert got.shape[0] == 5
    store.close()


def test_unknown_name_raises(packed):
    out, _ = packed
    store = RawImageStore(out)
    with pytest.raises(KeyError):
        store.get_batch(["missing.jpg"])
    store.close()


def test_gather_throughput(packed):
    """Native gather of 500 batches should comfortably beat 100 MB/s —
    a loose bound that still catches pathological serialization."""
    out, index = packed
    store = RawImageStore(out, num_threads=4)
    names = list(index) * 4  # 40 records/batch
    store.get_batch(names)  # warm
    t0 = time.perf_counter()
    n = 50
    for _ in range(n):
        store.get_batch(names)
    dt = time.perf_counter() - t0
    mb = n * len(names) * 64 * 64 * 3 / 1e6
    assert mb / dt > 100, f"native gather too slow: {mb/dt:.1f} MB/s"
    store.close()
