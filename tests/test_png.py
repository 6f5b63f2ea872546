"""PNG codec tests: lossless round-trip bit-exact, lossy PSNR >= 40 dB
(BASELINE.json:input_hint invariant)."""

import numpy as np

from loc2vec_spark.png_codec import (decode_png, encode_png, encode_pngq,
                                     psnr)


def test_rgb_roundtrip_bit_exact():
    rng = np.random.Generator(np.random.PCG64(42))
    for shape in [(64, 64, 3), (16, 16, 3), (1, 1, 3), (7, 13, 3)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(arr)), arr)


def test_gray_roundtrip_bit_exact():
    rng = np.random.Generator(np.random.PCG64(43))
    arr = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(arr)), arr)


def test_lossy_psnr_over_40db():
    rng = np.random.Generator(np.random.PCG64(44))
    arr = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    dec = decode_png(encode_pngq(arr, bits=5))
    assert psnr(arr, dec) >= 40.0


def test_psnr_identical_is_inf():
    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    assert psnr(arr, arr) == float("inf")


def test_bad_signature_raises():
    import pytest
    with pytest.raises(ValueError):
        decode_png(b"not a png at all....")
