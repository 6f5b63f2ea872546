"""S1-S4/J1/J3 directory-as-table sources over real PNG trees."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from loc2vec_spark import sources
from loc2vec_spark.png_codec import encode_png

CHANNELS = ["roads", "rails", "buildings"]


@pytest.fixture(scope="module")
def png_tree(tmp_path_factory):
    """root/<channel>/output_<id>.png — the reference's exact layout.

    id 'x9' is missing from the last channel (squeeze must drop it);
    one file is not a real PNG (S4 predicate must flag it)."""
    root = tmp_path_factory.mktemp("tree")
    rng = np.random.default_rng(7)
    for ch in CHANNELS:
        os.makedirs(root / ch, exist_ok=True)
        for i in range(5):
            arr = rng.integers(0, 255, size=(6, 4, 3), dtype=np.uint8)
            (root / ch / f"output_img{i}.png").write_bytes(encode_png(arr))
    # uncommon id: present in first two channels only
    for ch in CHANNELS[:2]:
        arr = rng.integers(0, 255, size=(6, 4, 3), dtype=np.uint8)
        (root / ch / "output_x9.png").write_bytes(encode_png(arr))
    # corrupt file (named .png, not a png)
    (root / CHANNELS[0] / "output_bad.png").write_bytes(b"not a png at all")
    return str(root)


def test_scan_ids_channels_dims(spark, png_tree):
    tree = sources.read_image_tree(spark, png_tree)
    rows = tree.collect()
    # 3*5 good + 2 uncommon + 1 corrupt
    assert len(rows) == 18
    ids = {r["image_id"] for r in rows}
    assert "img0" in ids and "x9" in ids and "bad" in ids
    good = [r for r in rows if r["fmt"] == "png"]
    # IHDR probe: width=4, height=6 — read in SQL, no decode
    assert all(r["w"] == 4 and r["h"] == 6 for r in good)
    bad = [r for r in rows if r["fmt"] is None]
    assert [r["image_id"] for r in bad] == ["bad"]
    assert {r["channel"] for r in rows} == set(CHANNELS)


def test_validate_channels_counts(spark, png_tree):
    tree = sources.read_image_tree(spark, png_tree)
    v = sources.validate_channels(tree.filter(F.col("fmt") == "png"))
    assert v["channels"] == 3
    assert v["equal"] is False  # x9 missing from one channel
    assert v["counts"]["buildings"] == 5


def test_squeeze_keeps_only_complete_ids(spark, png_tree):
    tree = sources.read_image_tree(spark, png_tree) \
                  .filter(F.col("fmt") == "png")
    kept = sources.squeeze(tree)
    ids = {r["image_id"] for r in kept.select("image_id").distinct()
           .collect()}
    assert ids == {f"img{i}" for i in range(5)}
    assert kept.count() == 15  # 5 ids x 3 channels

    dropped = sources.dropped_by_squeeze(tree)
    got = {r["image_id"]: r["n_channels"] for r in dropped.collect()}
    assert got == {"x9": 2}


def test_channel_align_wide_rows(spark, png_tree):
    tree = sources.read_image_tree(spark, png_tree) \
                  .filter(F.col("fmt") == "png")
    wide = sources.channel_align(sources.squeeze(tree))
    rows = wide.collect()
    assert len(rows) == 5
    r0 = next(r for r in rows if r["image_id"] == "img0")
    assert sorted(r0["channels"].keys()) == sorted(CHANNELS)
    assert r0["w"] == 4 and r0["h"] == 6
    # bytes in the map decode back (spot-check plumbing end-to-end)
    from loc2vec_spark.png_codec import decode_png
    arr = decode_png(bytes(r0["channels"]["roads"]))
    assert arr.shape == (6, 4, 3)


def test_anchor_tables_pairing(spark, png_tree):
    tabs = sources.anchor_tables(spark, png_tree, png_tree)
    assert set(tabs) == {"anchor", "positive"}
    a = sources.squeeze(tabs["anchor"].filter(F.col("fmt") == "png"))
    p = sources.squeeze(tabs["positive"].filter(F.col("fmt") == "png"))
    paired = (a.select("image_id", "channel").join(
        p.select("image_id", "channel"), ["image_id", "channel"]))
    assert paired.count() == 15


def test_read_documents_jsonl_quarantines_bad_lines(spark, tmp_path):
    from loc2vec_spark import sources
    p = tmp_path / "dump.jsonl"
    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en", '
        '"source": "web", "n_chars": 11}',
        'this is not json at all {{{',
        '{"doc_id": 2, "text": "bonjour", "lang": "fr", '
        '"source": "web", "n_chars": 7}',
        '{"text": "no id field", "lang": "en", "source": "web", '
        '"n_chars": 11}',
    ]
    p.write_text("\n".join(lines) + "\n")
    good, quar = sources.read_documents(spark, str(p))
    g = good.toPandas().sort_values("doc_id")
    assert list(g.doc_id) == [1, 2]
    assert set(good.columns) == {"doc_id", "text", "lang", "source",
                                 "n_chars"}
    q = quar.toPandas()
    # the unparseable line arrives raw; the null-id row is also held out
    assert len(q) == 2
    assert any("not json" in (r or "") for r in q.raw)


def test_read_documents_csv_roundtrip(spark, tmp_path):
    from loc2vec_spark import sources
    p = tmp_path / "dump.csv"
    p.write_text("doc_id,text,lang,source,n_chars\n"
                 "1,alpha,en,web,5\n"
                 "oops,not-a-bigint,en,web,xyz\n"
                 "2,beta,de,web,4\n")
    good, quar = sources.read_documents(spark, str(p), fmt="csv")
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    assert quar.count() == 1
