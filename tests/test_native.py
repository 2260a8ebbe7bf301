"""Native (C++) packer: builds, matches the numpy fallback, parallel-safe."""

import numpy as np
import pytest

from tpumcia.io import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("g++ unavailable; native path untestable")
    return lib


def _numpy_pack(arrays, target_hw):
    from tpumcia.preprocess.normalize import center_crop_or_pad

    return np.stack(
        [np.asarray(center_crop_or_pad(a[None], target_hw))[0] for a in arrays]
    )


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_pack_matches_numpy(lib, rng, dtype):
    arrays = []
    for _ in range(17):
        h, w = rng.integers(5, 50, size=2)
        arrays.append((rng.random((h, w, 3)) * 250).astype(dtype))
    for target in [(32, 32), (48, 16), (8, 8)]:
        got = native.pack_objects(arrays, target)
        want = _numpy_pack(arrays, target)
        np.testing.assert_array_equal(got, want)


def test_pack_identity(lib, rng):
    a = (rng.random((20, 20, 2)) * 255).astype(np.uint8)
    out = native.pack_objects([a], (20, 20))
    np.testing.assert_array_equal(out[0], a)


def test_quantize_matches_reference(lib, rng):
    src = (rng.random((3, 50, 50, 2)) * 65535).astype(np.uint16)
    got = native.quantize_u16(src, levels=256)
    np.testing.assert_array_equal(got, (src >> 8).astype(np.uint8))
    got64 = native.quantize_u16(src, levels=64)
    want64 = np.minimum((src.astype(np.int64) * 64) >> 16, 63).astype(np.uint8)
    np.testing.assert_array_equal(got64, want64)


def test_quantize_agrees_with_device_quantizer(lib, rng):
    from tpumcia.preprocess.normalize import quantize_to_levels

    src = (rng.random((2, 16, 16, 1)) * 65535).astype(np.uint16)
    host = native.quantize_u16(src, levels=256)
    dev = np.asarray(quantize_to_levels(src, levels=256, src_levels=65536))
    np.testing.assert_array_equal(host, dev.astype(np.uint8))


@pytest.mark.slow
def test_pack_large_parallel(lib, rng):
    arrays = [
        (rng.random((rng.integers(10, 80), rng.integers(10, 80), 1)) * 255).astype(
            np.uint8
        )
        for _ in range(200)
    ]
    got = native.pack_objects(arrays, (64, 64), num_threads=8)
    want = _numpy_pack(arrays, (64, 64))
    np.testing.assert_array_equal(got, want)
