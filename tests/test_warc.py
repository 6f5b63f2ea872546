"""WARC container: writer<->walker round-trip (plain + gzip members),
prefix salvage on mid-archive corruption, the parser-hardening contract
(Content-Length bounds, gzip trailer verification, inflation cap), and
the read_warc dead-letter split."""

import pathlib
import zlib

import pytest

from loc2vec_spark.operators import warc as W


def _records(n=3):
    return [{"uri": f"http://example.test/page/{i}",
             "date": f"2026-01-0{i + 1}T00:00:00Z",
             "status": 200 if i % 2 == 0 else 404,
             "content_type": "text/html",
             "body": f"<html><body><p>doc {i} body</p></body></html>"
                     .encode()}
            for i in range(n)]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(gz):
    recs = _records()
    out = W.parse_warc(W.build_warc(recs, gzip_members=gz))
    assert len(out) == 3
    for want, got in zip(recs, out):
        assert got["warc_type"] == "response"
        assert got["uri"] == want["uri"]
        assert got["date"] == want["date"]
        assert got["status"] == want["status"]
        assert got["content_type"] == "text/html"
        assert got["body"] == want["body"]


def test_salvage_prefix_before_corruption():
    data = bytearray(W.build_warc(_records()))
    # smash the second record's WARC/ magic
    second = data.index(b"WARC/1.0", 1)
    data[second:second + 4] = b"JUNK"
    recs, err = W.parse_warc_safe(bytes(data))
    assert len(recs) == 1 and recs[0]["uri"].endswith("/0")
    assert "record 1" in err
    with pytest.raises(ValueError, match="record 1"):
        W.parse_warc(bytes(data))


def test_truncated_archive_quarantines_tail():
    data = W.build_warc(_records())
    cut = data[: len(data) - 10]  # inside record 2's terminator/body
    recs, err = W.parse_warc_safe(cut)
    assert len(recs) == 2
    assert err is not None


def test_content_length_overrun_rejected():
    data = W.build_warc(_records(1))
    # inflate the WARC Content-Length header beyond the file
    bad = data.replace(b"Content-Length: ", b"Content-Length: 9", 1)
    recs, err = W.parse_warc_safe(bad)
    assert recs == [] and "overruns" in err


def test_gzip_trailer_verified():
    data = W.build_warc(_records(2), gzip_members=True)
    recs, err = W.parse_warc_safe(data[:-5])  # cut the final CRC/ISIZE
    assert err is not None and "gzip" in err
    # conservative: decompression failure quarantines the archive
    assert recs == []


def test_inflation_cap(monkeypatch):
    monkeypatch.setattr(W, "MAX_INFLATE", 1 << 12)
    big = [{"uri": "http://example.test/big",
            "date": "2026-01-01T00:00:00Z", "status": 200,
            "content_type": "text/plain", "body": b"a" * (1 << 16)}]
    data = W.build_warc(big, gzip_members=True)
    assert len(data) < (1 << 12)  # compresses far below the cap
    recs, err = W.parse_warc_safe(data)
    assert recs == [] and "cap" in err


def test_read_warc_dead_letter_split(spark, tmp_path: pathlib.Path):
    (tmp_path / "clean.warc.gz").write_bytes(
        W.build_warc(_records(3), gzip_members=True))
    broken = bytearray(W.build_warc(_records(2)))
    second = broken.index(b"WARC/1.0", 1)
    broken[second:second + 4] = b"JUNK"
    (tmp_path / "broken.warc").write_bytes(bytes(broken))

    good, quarantine = W.read_warc(spark, str(tmp_path / "*"))
    g = good.toPandas().sort_values("uri").reset_index(drop=True)
    q = quarantine.toPandas()
    # 3 clean + 1 salvaged prefix record
    assert len(g) == 4
    assert set(g["status"]) == {200, 404}
    assert all(b"<p>doc" in bytes(b) for b in g["body"])
    assert len(q) == 1 and "broken.warc" in q["path"][0]
    assert "record 1" in q["err"][0]
