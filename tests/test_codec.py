"""Codec kernel tests: lossless round-trip, bounded lossy error (PSNR band),
stamp recovery under quantization, phash determinism."""

import numpy as np
import pytest

from mdvalidate_spark.functions import codec


def test_lossless_roundtrip_exact():
    arr = codec.base_image(3, 64, 48)
    out, fmt, w, h = codec.decode(codec.encode(arr, "png"))
    assert fmt == "png" and (w, h) == (64, 48)
    assert np.array_equal(out, arr)


@pytest.mark.parametrize("fmt,lo,hi", [("jpeg", 40.0, 60.0), ("webp", 40.0, 55.0)])
def test_lossy_psnr_band(fmt, lo, hi):
    arr = codec.base_image(5, 128, 128)
    out, dfmt, w, h = codec.decode(codec.encode(arr, fmt))
    p = codec.psnr(out, arr)
    assert dfmt == fmt and (w, h) == (128, 128)
    assert lo <= p <= hi, p


def test_stamp_survives_lossy_compression():
    for pid in (0, 7, 123456, 2**31 - 1):
        arr = codec.base_image(pid, 64, 64)
        out, *_ = codec.decode(codec.encode(arr, "webp"))
        assert codec.read_pattern_id(out) == pid & ((1 << 32) - 1)


def test_phash_deterministic_and_spread():
    vals = {codec.phash_of_pattern(i) for i in range(100)}
    assert len(vals) == 100
    assert codec.phash_of_pattern(7) == codec.phash_of_pattern(7)
    for v in vals:
        assert -(2**63) <= v < 2**63  # valid Spark long


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        codec.decode(b"not an image at all")
    with pytest.raises(ValueError):
        codec.decode(None)


def test_psnr_inf_for_identical():
    a = codec.base_image(1, 16, 16)
    assert codec.psnr(a, a) == float("inf")
