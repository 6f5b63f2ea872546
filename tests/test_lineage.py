"""Checkpoint/resume + salting tests (SURVEY.md §5.2 item 5)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from loc2vec_spark import lineage
from loc2vec_spark.operators import geo


@pytest.fixture()
def pts(spark, fixture_dir):
    images = spark.read.parquet(f"{fixture_dir}/images.parquet")
    return geo.with_cells(geo.with_latlon(images), resolutions=(7,)) \
              .select("image_id", "cell_r7")


def test_write_then_resume_skips_done(spark, pts, tmp_path):
    out = str(tmp_path / "tiles")
    idx = lineage.write_resumable(pts, out, cell_col="cell_r7",
                                  id_col="image_id")
    assert len(idx) == pts.select("cell_r7").distinct().count()
    total = sum(r["rows"] for r in idx.values())
    assert total == pts.count()
    # second run: everything committed -> nothing to do
    idx2 = lineage.write_resumable(pts, out, cell_col="cell_r7",
                                   id_col="image_id")
    assert idx2 == {}
    # written data complete and readable
    back = spark.read.parquet(out)
    assert back.count() == total


def test_resume_completes_partial_run(spark, pts, tmp_path):
    out = str(tmp_path / "tiles")
    cells_all = [r.cell_r7 for r in
                 pts.select("cell_r7").distinct().collect()]
    half = set(cells_all[: len(cells_all) // 2])
    # simulate a killed job: only half the partitions committed
    part1 = pts.filter(F.col("cell_r7").isin([int(c) for c in half]))
    lineage.write_resumable(part1, out, cell_col="cell_r7",
                            id_col="image_id")
    assert lineage.done_partitions(out) == {int(c) for c in half}
    # re-run with the FULL input: only missing partitions are processed
    idx = lineage.write_resumable(pts, out, cell_col="cell_r7",
                                  id_col="image_id")
    assert set(idx) == {int(c) for c in cells_all} - {int(c) for c in half}
    back = spark.read.parquet(out)
    assert back.count() == pts.count()  # no duplicates, no gaps
    # manifests verify: recompute checksums from what landed on disk
    for c, rec in idx.items():
        got = back.filter(F.col("cell_r7") == c) \
                  .agg(F.expr("bit_xor(xxhash64(image_id))")).collect()[0][0]
        assert got == rec["checksum"]


def test_salting_splits_hot_cells(spark, pts, tmp_path):
    out = str(tmp_path / "salted")
    # fixture: 3 urban cells carry ~80% of rows; force them to split
    lineage.write_partitioned(pts, out, cell_col="cell_r7",
                              id_col="image_id", salt_target=30)
    back = spark.read.parquet(out)
    per = back.groupBy("cell_r7", "salt").count()
    hot = per.groupBy("cell_r7").agg(F.countDistinct("salt").alias("ns")) \
             .filter(F.col("ns") > 1)
    assert hot.count() >= 3  # each urban cell got salted
    # salting never loses rows
    assert back.count() == pts.count()


def test_compact_partitions_preserves_content_and_resume(spark, tmp_path):
    """Small-file compaction: file counts drop, bytes/rows/checksums and
    resume semantics are untouched."""
    import pandas as pd

    from loc2vec_spark.lineage import (compact_partitions, done_partitions,
                                       resume_filter, write_partitioned)

    out = str(tmp_path / "compact_me")
    pdf = pd.DataFrame({
        "doc_id": range(4000),
        "cell": [i % 5 for i in range(4000)],
        "payload": [f"row_{i}" for i in range(4000)]})
    # 16 shuffle partitions -> ~16 files PER cell partition
    df = spark.createDataFrame(pdf).repartition(16)
    write_partitioned(df, out, cell_col="cell", id_col="doc_id")
    before = spark.read.parquet(out).orderBy("doc_id").collect()
    done_before = done_partitions(out)

    stats = compact_partitions(spark, out, cell_col="cell")
    assert stats["partitions_compacted"] == 5
    assert stats["files_after"] == 5  # tiny data -> 1 file per cell
    assert stats["files_before"] > 5 * 10

    # content identical, manifests + resume untouched
    assert spark.read.parquet(out).orderBy("doc_id").collect() == before
    assert done_partitions(out) == done_before
    assert resume_filter(spark.createDataFrame(pdf), out,
                         cell_col="cell").count() == 0

    # idempotent: second compaction is a no-op
    stats2 = compact_partitions(spark, out, cell_col="cell")
    assert stats2["partitions_compacted"] == 0
    assert stats2["files_after"] == stats2["files_before"] == 5


def test_compact_skips_hive_default_partition(spark, tmp_path):
    """NULL-cell rows land in __HIVE_DEFAULT_PARTITION__; compaction
    must skip that dir, not abort the whole run on int() (review r2)."""
    import pandas as pd

    from loc2vec_spark.lineage import compact_partitions, write_partitioned

    out = str(tmp_path / "with_nulls")
    pdf = pd.DataFrame({
        "doc_id": range(400),
        # nullable Int64: a plain None list would float-cast the column
        # and write "cell=0.0" dirs the engine never produces
        "cell": pd.array([None if i % 7 == 0 else i % 3
                          for i in range(400)], dtype="Int64"),
        "payload": ["x" * 10] * 400})
    df = spark.createDataFrame(pdf).repartition(8)
    write_partitioned(df, out, cell_col="cell", id_col="doc_id")
    stats = compact_partitions(spark, out, cell_col="cell")
    assert stats["partitions_compacted"] == 3  # the 3 real cells only
    back = spark.read.parquet(out)
    assert back.count() == 400  # NULL-cell rows untouched and present
    assert back.filter("cell IS NULL").count() == len(
        [i for i in range(400) if i % 7 == 0])


def test_compact_salted_layout(spark, tmp_path):
    """Salted layouts (the engine's own hot-cell writer) compact per
    (cell, salt) leaf — r2 verdict item 3 closed: previously a loud
    NotImplementedError. Content, per-CELL manifests and resume
    semantics survive; untouched leaves keep their files."""
    import pandas as pd

    from loc2vec_spark.lineage import (compact_partitions, done_partitions,
                                       resume_filter, write_partitioned)

    out = str(tmp_path / "salted_compact")
    # cell 0 is hot (3000 rows -> 3 salt leaves at target 1000), cells
    # 1-2 cold (salt=0 only); 10 append runs accrete files per leaf
    pdf = pd.DataFrame({
        "doc_id": range(5000),
        "cell": [0 if i % 5 < 3 else (i % 5) - 2 for i in range(5000)],
        "payload": ["x" * 50] * 5000})
    df = spark.createDataFrame(pdf).repartition(8)
    write_partitioned(df, out, cell_col="cell", id_col="doc_id",
                      salt_target=1000)
    for _ in range(9):
        write_partitioned(df, out, cell_col="cell", id_col="doc_id",
                          salt_target=1000, mode="append",
                          return_index=False)

    before = spark.read.parquet(out)
    rows_before = before.count()
    sum_before = before.agg(F.sum("doc_id")).first()[0]
    leaves = {k for k, _ in lineage._leaf_partitions(out, "cell")}
    assert all(len(k) == 2 for k in leaves)  # salted layout everywhere
    assert len({k for k in leaves if k[0] == 0}) >= 2  # hot cell split
    done_before = done_partitions(out)

    stats = compact_partitions(spark, out, cell_col="cell")
    assert stats["partitions_compacted"] == len(leaves)
    assert stats["files_after"] == len(leaves)  # tiny data -> 1/leaf
    assert stats["files_before"] >= len(leaves) * 10

    after = spark.read.parquet(out)
    assert after.count() == rows_before
    assert after.agg(F.sum("doc_id")).first()[0] == sum_before
    # per-CELL manifest rows and resume behavior unchanged
    assert done_partitions(out) == done_before
    assert resume_filter(spark.createDataFrame(pdf), out,
                         cell_col="cell").count() == 0
    # idempotent
    stats2 = compact_partitions(spark, out, cell_col="cell")
    assert stats2["partitions_compacted"] == 0
    assert stats2["files_after"] == stats2["files_before"] == len(leaves)


def test_compact_mixed_layout_refuses_even_under_threshold(spark, tmp_path):
    """r3 review: mixedness is checked over ALL leaves, not just the
    compaction plan — a mixed tree whose flat cells are under the file
    threshold previously slipped past and died inside
    spark.read.parquet with an opaque partition-discovery error. Loose
    parquet files inside a salted cell dir likewise refuse loudly."""
    import shutil

    import pandas as pd

    from loc2vec_spark.lineage import compact_partitions, write_partitioned

    out = str(tmp_path / "mixed")
    pdf = pd.DataFrame({"doc_id": range(3000),
                        "cell": [i % 2 for i in range(3000)],
                        "payload": ["x" * 40] * 3000})
    df = spark.createDataFrame(pdf).repartition(4)
    write_partitioned(df, out, cell_col="cell", id_col="doc_id",
                      salt_target=1000)
    for _ in range(9):
        write_partitioned(df, out, cell_col="cell", id_col="doc_id",
                          salt_target=1000, mode="append",
                          return_index=False)
    # graft one FLAT cell (single small file — under every threshold)
    flat = str(tmp_path / "flat_src")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [9991], "payload": ["y"]})) \
        .coalesce(1).write.parquet(flat)
    dst = os.path.join(out, "cell=7")
    os.makedirs(dst)
    for f in os.listdir(flat):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(flat, f), os.path.join(dst, f))
    with pytest.raises(ValueError, match="mixed flat/salted"):
        compact_partitions(spark, out, cell_col="cell")

    # loose parquet file inside a salted cell dir -> corrupt layout
    os.remove(os.path.join(dst, os.listdir(dst)[0]))
    os.rmdir(dst)
    salted_cell = os.path.join(out, "cell=0")
    shutil.copy(os.path.join(flat, [f for f in os.listdir(flat)
                                    if f.endswith(".parquet")][0]),
                os.path.join(salted_cell, "loose.parquet"))
    with pytest.raises(ValueError, match="loose parquet"):
        compact_partitions(spark, out, cell_col="cell")


def test_compact_ignores_empty_cell_dir(spark, tmp_path):
    """r3 review: a data-free cell dir (interrupted writer) must not be
    classified as a flat leaf — it previously aborted compaction of a
    healthy salted tree with a false 'mixed layout' error."""
    import pandas as pd

    from loc2vec_spark.lineage import compact_partitions, write_partitioned

    out = str(tmp_path / "with_empty")
    pdf = pd.DataFrame({"doc_id": range(2000),
                        "cell": [i % 2 for i in range(2000)],
                        "payload": ["x" * 40] * 2000})
    df = spark.createDataFrame(pdf).repartition(4)
    for mode in ["overwrite"] + ["append"] * 9:
        write_partitioned(df, out, cell_col="cell", id_col="doc_id",
                          salt_target=800, mode=mode,
                          return_index=False)
    os.makedirs(os.path.join(out, "cell=99"))   # stray empty dir
    stats = compact_partitions(spark, out, cell_col="cell")
    assert stats["partitions_compacted"] > 0
    assert spark.read.parquet(out).count() == 20000
