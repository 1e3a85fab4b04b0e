"""Native IO runtime tests: builds libmingio.so, validates against numpy."""

import os

import numpy as np
import pytest

from mingunivision_tpu.utils.native_io import SafetensorsFile, load_native, normalize_images_chw


@pytest.fixture(scope="module")
def st_file(tmp_path_factory):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    tensors = {
        "small": rng.standard_normal((16,)).astype(np.float32),
        "weight2d": rng.standard_normal((64, 48)).astype(np.float32),
        "big": rng.standard_normal((256, 512)).astype(np.float32),
        "ints": rng.integers(-5, 5, (8, 8)).astype(np.int8),
    }
    path = tmp_path_factory.mktemp("st") / "model.safetensors"
    save_file(tensors, str(path))
    return str(path), tensors


class TestNativeBuild:
    def test_library_builds_and_loads(self):
        lib = load_native()
        assert lib is not None, "libmingio.so failed to build (g++ expected in image)"
        assert lib.mingio_version() >= 2


class TestSafetensorsFile:
    def test_read_matches_numpy(self, st_file):
        path, tensors = st_file
        f = SafetensorsFile(path)
        assert set(f.keys()) == set(tensors.keys())
        for name, want in tensors.items():
            got = f.read(name)
            assert got.dtype == want.dtype
            np.testing.assert_array_equal(got, want)
        f.close()

    def test_read_transposed(self, st_file):
        path, tensors = st_file
        f = SafetensorsFile(path)
        got = f.read_transposed2d("weight2d")
        np.testing.assert_array_equal(got, tensors["weight2d"].T)
        got = f.read_transposed2d("big")
        np.testing.assert_array_equal(got, tensors["big"].T)
        f.close()

    def test_bad_name_raises(self, st_file):
        path, _ = st_file
        f = SafetensorsFile(path)
        with pytest.raises(KeyError):
            f.info("nope")
        f.close()


class TestImageNormalize:
    def test_matches_numpy_reference(self):
        rng = np.random.default_rng(1)
        batch = rng.integers(0, 256, (2, 32, 48, 3), np.uint8)
        got = normalize_images_chw(batch, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
        want = (batch.astype(np.float32) / 255.0 - 0.5) / 0.5
        want = np.transpose(want, (0, 3, 1, 2))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_clip_mean_std(self):
        rng = np.random.default_rng(2)
        batch = rng.integers(0, 256, (1, 16, 16, 3), np.uint8)
        mean = (0.48145466, 0.4578275, 0.40821073)
        std = (0.26862954, 0.26130258, 0.27577711)
        got = normalize_images_chw(batch, mean, std)
        want = np.transpose((batch.astype(np.float32) / 255.0 - np.asarray(mean)) / np.asarray(std), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestPrefetchQueue:
    def test_async_matches_sync(self):
        from mingunivision_tpu.utils.native_io import PrefetchQueue, normalize_images_chw

        rng = np.random.default_rng(0)
        q = PrefetchQueue(num_threads=2)
        batches = [rng.integers(0, 255, (2, 16, 12, 3), np.uint8) for _ in range(4)]
        tickets = [q.submit(b) for b in batches]
        got = {}
        for _ in range(4):
            res = q.get(block=True)
            assert res is not None
            t, arr = res
            got[t] = arr
        assert sorted(got) == tickets
        for t, b in zip(tickets, batches):
            want = normalize_images_chw(b)
            np.testing.assert_allclose(got[t], want, rtol=1e-6, atol=1e-6)
        assert q.get(block=False) is None
        q.close()
