"""Baseline JPEG codec (operators/jpeg.py) — round-trip PSNR goldens at
the north_star's >=40 dB lossy bar, decoder robustness (subsampling,
odd sizes, grayscale, restarts-free streams, corrupt bytes), and the
Spark-side pipeline integration via decode_image's magic sniff."""

import numpy as np
import pytest

from loc2vec_spark.operators.jpeg import (decode_jpeg, encode_jpeg,
                                          _quality_tables)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _tile(h=64, w=64, seed=3) -> np.ndarray:
    """Smooth synthetic map-tile-like RGB content (bands + gradients —
    the regime JPEG is built for; pure noise has no 40 dB encode)."""
    y = np.linspace(0, 4 * np.pi, h)[:, None]
    x = np.linspace(0, 3 * np.pi, w)[None, :]
    base = np.sin(x) * np.cos(y) * 0.5 + 0.5
    rng = np.random.default_rng(seed)
    img = np.stack([base * 200 + 20,
                    base[::-1] * 160 + 50,
                    np.linspace(0, 1, h)[:, None] * np.ones((h, w)) * 180],
                   axis=-1)
    img += rng.normal(0, 1.5, img.shape)   # mild sensor-ish noise
    return np.clip(img, 0, 255).astype(np.uint8)


def test_roundtrip_psnr_40db_bar():
    """decode(encode(x)) at quality 90/95 clears the BASELINE.json
    north_star bar for lossy tiles (PSNR >= 40 dB)."""
    img = _tile()
    for q in (90, 95):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        assert out.shape == img.shape and out.dtype == np.uint8
        assert _psnr(img, out) >= 40.0, q


def test_roundtrip_subsampled_and_odd_sizes():
    img = _tile(37, 29, seed=9)
    for sub in (False, True):
        out = decode_jpeg(encode_jpeg(img, quality=95, subsample=sub))
        assert out.shape == img.shape
        # 4:2:0 halves chroma resolution — bar is clean decode + ~32 dB
        # fidelity on this chroma-gradient-heavy 37x29 tile, not the
        # 4:4:4 number (measured 32.45; luma-only PSNR stays >40)
        assert _psnr(img, out) >= (40.0 if not sub else 32.0), sub


def test_roundtrip_grayscale():
    g = _tile()[:, :, 0]
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == g.shape and out.ndim == 2
    assert _psnr(g, out) >= 40.0


def test_quality_dial_monotone():
    img = _tile()
    ps = [_psnr(img, decode_jpeg(encode_jpeg(img, quality=q)))
          for q in (50, 75, 90, 100)]
    assert ps == sorted(ps), ps
    assert ps[-1] >= 50.0          # q100 ~ lossless on smooth content


def test_deterministic_bytes_and_pixels():
    img = _tile(seed=1)
    e1, e2 = encode_jpeg(img, 85), encode_jpeg(img, 85)
    assert e1 == e2
    assert np.array_equal(decode_jpeg(e1), decode_jpeg(e2))


def test_quality_tables_zigzag_dc_first():
    """DQT is written in zigzag order: entry 0 is the DC term (16 for
    luma at q=50 scale 100)."""
    lum, chr_ = _quality_tables(50)
    assert lum[0] == 16 and chr_[0] == 17


def test_corrupt_and_nonbaseline_raise():
    img = _tile()
    enc = bytearray(encode_jpeg(img, 90))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")
    # flip SOF0 -> SOF2 (progressive): loud refusal, not garbage pixels
    i = bytes(enc).find(b"\xff\xc0")
    prog = bytes(enc[:i + 1]) + b"\xc2" + bytes(enc[i + 2:])
    with pytest.raises(ValueError):
        decode_jpeg(prog)
    with pytest.raises(Exception):
        decode_jpeg(bytes(enc[: len(enc) // 2]))  # truncated stream


def test_jpeg_flows_whole_image_pipeline(spark):
    """JPEG tiles ride decode_stats / image_quality / phash unchanged
    (decode_image magic sniff); corrupt JPEG rows quarantine."""
    from loc2vec_spark.operators.images import (decode_stats,
                                                image_quality,
                                                phash_images)

    img = _tile()
    rows = [("jpg#0", bytearray(encode_jpeg(img, 95))),
            ("jpg#bad", bytearray(b"\xff\xd8\xff\xdb garbage")),
            ]
    df = spark.createDataFrame(rows, "image_id STRING, bytes BINARY")

    stats = {r["image_id"]: r for r in decode_stats(df).collect()}
    assert stats["jpg#0"]["ok"] and stats["jpg#0"]["h"] == 64
    assert abs(stats["jpg#0"]["mean_px"] - float(img.mean())) < 2.0
    assert not stats["jpg#bad"]["ok"]

    q = {r["image_id"]: r for r in image_quality(df).collect()}
    assert q["jpg#0"]["ok"] and q["jpg#0"]["sharpness"] is not None
    assert not q["jpg#bad"]["ok"]

    ph = {r["image_id"]: r["phash"]
          for r in phash_images(df).collect()}
    # perceptual: phash of the JPEG decode matches the source pixels'
    from loc2vec_spark.operators.images import _ahash64
    assert ph["jpg#0"] == _ahash64(decode_jpeg(encode_jpeg(img, 95)))
    src = _ahash64(img)
    assert bin(ph["jpg#0"] ^ src).count("1") <= 3   # near-dup distance


def test_nonbaseline_variants_refused_loudly():
    """r3 review: 4-component (CMYK) frames, multi-scan files, and
    single-component frames with sampling factors must not decode to
    garbage."""
    img = _tile()
    enc = encode_jpeg(img, 90)
    i = enc.find(b"\xff\xc0")
    # patch SOF0 ncomp 3 -> 4 (length field left alone: parse reads
    # ncomp first and must refuse before touching component bytes)
    patched = enc[:i + 9] + b"\x04" + enc[i + 10:]
    with pytest.raises(ValueError, match="component"):
        decode_jpeg(patched)
    # patch SOS ns 3 -> 1 (a multi-scan-style partial scan)
    j = enc.find(b"\xff\xda")
    partial = enc[:j + 4] + b"\x01" + enc[j + 5:]
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg(partial)


def test_grayscale_sampling_factors_normalized():
    """A one-component frame's sampling factors are meaningless (ITU
    T.81 A.2: single-component scan MCU = one data unit); a file whose
    sole component declares 2x2 must decode identically to 1x1."""
    g = _tile()[:, :, 0]
    enc = encode_jpeg(g, 95)
    base = decode_jpeg(enc)
    i = enc.find(b"\xff\xc0")
    # SOF0 layout: marker(2) len(2) prec(1) h(2) w(2) ncomp(1) then
    # per-component (id, samp, tq) — samp byte is at i+11
    assert enc[i + 10] == 1  # component id
    patched = enc[:i + 11] + b"\x22" + enc[i + 12:]
    assert np.array_equal(decode_jpeg(patched), base)
