"""EXIF APP1/TIFF writer + parser + exif_gps_df operator tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from loc2vec_spark.operators import exif
from loc2vec_spark.operators.jpeg import encode_jpeg


def _jpeg_with(lat_e6, lon_e6, **kw):
    base = encode_jpeg(np.full((8, 8), 128, np.uint8))
    return exif.splice_app1(base, exif.build_exif_app1(
        lat_e6, lon_e6, **kw))


def test_roundtrip_exact_both_byte_orders():
    cases = [(51507220, -127590), (-33868820, 151209300),
             (0, 0), (-90000000, 180000000)]
    for bo in ("II", "MM"):
        for lat_e6, lon_e6 in cases:
            r = exif.parse_exif(_jpeg_with(
                lat_e6, lon_e6, orientation=6,
                datetime_str="2024:03:05 12:34:56", byte_order=bo))
            assert r["orientation"] == 6
            assert r["datetime"] == "2024:03:05 12:34:56"
            assert round(r["lat"] * 1e6) == lat_e6
            assert round(r["lon"] * 1e6) == lon_e6


def test_conventional_dms_rationals_parse():
    """A hand-built GPS IFD with real degree/minute/second rationals
    (not the planted single-slot form) parses to the right degrees."""
    app1 = bytearray(exif.build_exif_app1(0, 0, byte_order="II"))
    # overwrite the lat rationals (offset: marker 2 + len 2 + exif 6
    # + tiff lat_off 124) with 51 deg 30' 26.1"
    import struct
    base = 2 + 2 + 6 + 124
    vals = [(51, 1), (30, 1), (261, 10)]
    for i, (n, d) in enumerate(vals):
        app1[base + 8 * i:base + 8 * i + 8] = struct.pack("<II", n, d)
    jpeg = exif.splice_app1(
        encode_jpeg(np.full((8, 8), 128, np.uint8)), bytes(app1))
    r = exif.parse_exif(jpeg)
    assert abs(r["lat"] - (51 + 30 / 60 + 26.1 / 3600)) < 1e-9


def test_no_exif_and_no_app1_return_nones():
    base = encode_jpeg(np.full((8, 8), 128, np.uint8))
    assert exif.parse_exif(base) == {
        "orientation": None, "datetime": None, "lat": None, "lon": None}


def test_quarantine_contract_on_corruption():
    """Every structural corruption raises ValueError (never a crash,
    slice error, or silent junk) — the shared media-probe contract."""
    good = _jpeg_with(1234567, -7654321)
    with pytest.raises(ValueError):
        exif.parse_exif(b"\x00\x01")                 # not a JPEG
    with pytest.raises(ValueError):
        exif.parse_exif(good[:2] + b"\xff\xe1\xff\xff" + good[4:])
    # mutation fuzz over the APP1 region: parse must return a dict or
    # raise ValueError, nothing else
    rng = np.random.default_rng(3)
    raised, parsed = 0, 0
    for _ in range(300):
        buf = bytearray(good)
        for _ in range(rng.integers(1, 4)):
            buf[int(rng.integers(2, min(len(buf), 220)))] = \
                int(rng.integers(0, 256))
        try:
            r = exif.parse_exif(bytes(buf))
            assert isinstance(r, dict)
            parsed += 1
        except ValueError:
            raised += 1
    assert raised > 0 and parsed > 0  # both outcomes exercised


def test_exif_gps_df_dead_letters_inline(spark):
    import pandas as pd
    rows = [("a", _jpeg_with(10000000, 20000000)),
            ("b", b"\x00garbage"),
            ("c", None),
            ("d", _jpeg_with(-5000000, -6000000, byte_order="MM"))]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["image_id", "bytes"]))
    out = {r["image_id"]: r for r in exif.exif_gps_df(df).collect()}
    assert out["a"]["ok"] and round(out["a"]["lat"] * 1e6) == 10000000
    assert out["d"]["ok"] and round(out["d"]["lon"] * 1e6) == -6000000
    assert not out["b"]["ok"] and out["b"]["err"]
    assert not out["c"]["ok"] and out["c"]["err"] == "NULL bytes"


def test_exif_feeds_tiling(spark):
    """The EXIF path composes into cell assignment: ok rows carry real
    lat/lon that with_cells tiles without any caption."""
    import pandas as pd

    from loc2vec_spark import cells
    rows = [(str(i), _jpeg_with(i * 1000000 - 5000000, i * 2000000))
            for i in range(10)]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["image_id", "bytes"]))
    got = (exif.exif_gps_df(df).filter("ok")
           .withColumn("cell", F.expr(cells.cell_sql("lat", "lon", 9)))
           .select("image_id", "lat", "lon", "cell").collect())
    assert len(got) == 10
    for r in got:
        expect = int(cells.latlon_to_cell(
            np.array([r["lat"]]), np.array([r["lon"]]), 9)[0])
        assert r["cell"] == expect
