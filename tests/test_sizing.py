"""F11 size estimation + auto-broadcast + arrow batch probe.

Reference parity: utils.py:112-123 (mem estimate), optim.py:21-46
(double-until-OOM batch search — reproduced by construction)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from loc2vec_spark import sizing


@pytest.fixture(scope="module")
def small_big(spark):
    small = spark.createDataFrame(
        pd.DataFrame({"k": np.arange(100), "tag": ["x"] * 100}))
    big = spark.range(0, 50_000).withColumn(
        "k", (F.col("id") % 100).cast("long")).withColumn(
        "payload", F.md5(F.col("id").cast("string")))
    return small, big


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_plan_stats_known_for_parquet(spark):
    df = spark.read.parquet("/root/testdata/sf0.01/region.parquet")
    size = sizing.plan_size_bytes(df)
    assert size is not None and 0 < size < 10 * 1024 * 1024


def test_sampled_estimate_tracks_data_size(spark):
    # sampled path specifically: plan stats assume ~20-byte strings and
    # cannot see a computed 500-byte pad — the sampler must
    narrow = spark.range(0, 10_000).select(F.col("id"))
    wide = spark.range(0, 10_000).select(
        F.col("id"), F.repeat(F.lit("z"), 500).alias("pad"))
    n = sizing.sampled_size_bytes(narrow)
    w = sizing.sampled_size_bytes(wide)
    assert w > n * 5  # 500-byte pad must dominate the estimate


def test_auto_broadcast_picks_broadcast_for_small_side(spark, small_big):
    small, big = small_big
    j = sizing.auto_broadcast_join(big, small, "k")
    assert "BroadcastHashJoin" in _plan(j)
    assert j.count() == 50_000


def test_auto_broadcast_flips_sides(spark, small_big):
    small, big = small_big
    # small side passed LEFT: must still broadcast small, not big
    j = sizing.auto_broadcast_join(small, big, "k")
    assert "BroadcastHashJoin" in _plan(j)
    assert j.count() == 50_000


def test_auto_broadcast_declines_over_threshold(spark, small_big):
    small, big = small_big
    # silence Catalyst's own auto-broadcast so the plan shows only what
    # THIS helper decided; over budget -> no hint -> sort-merge
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = sizing.auto_broadcast_join(big, small, "k", threshold_bytes=1)
        assert "BroadcastHashJoin" not in _plan(j)
        hinted = sizing.auto_broadcast_join(big, small, "k")
        assert "BroadcastHashJoin" in _plan(hinted)
        assert j.count() == 50_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_left_join_flip_preserves_semantics(spark, small_big):
    small, big = small_big
    extra = spark.createDataFrame(
        pd.DataFrame({"k": [100_000], "tag": ["orphan"]}))
    small2 = small.union(extra)
    j = sizing.auto_broadcast_join(small2, big, "k", how="left")
    # orphan key survives a left join regardless of which side broadcast
    assert j.filter("tag = 'orphan'").count() == 1
    assert j.count() == 50_001


def test_arrow_batch_doubling_respects_budget(spark):
    df = spark.range(0, 200_000).withColumn(
        "pad", F.repeat(F.lit("y"), 100))
    n = sizing.arrow_batch_records(df, mem_budget_bytes=1024 * 1024,
                                   max_records=1 << 20)
    # power of two, fits budget, next double would not
    assert n & (n - 1) == 0
    width = 108  # ~100-byte pad + id; sampled width is close to this
    assert n * width <= 4 * 1024 * 1024
    assert n >= 1024


def test_arrow_batch_halves_at_row_count(spark):
    df = spark.range(0, 100).select(F.col("id"))
    n = sizing.arrow_batch_records(df, mem_budget_bytes=1 << 30,
                                   max_records=1 << 20)
    assert n == 64  # doubled past 100 rows -> halved back (optim.py:27-29)


def test_arrow_batch_clamps_at_max(spark):
    df = spark.range(0, 10_000_000).select(F.col("id"))
    n = sizing.arrow_batch_records(df, mem_budget_bytes=1 << 40,
                                   max_records=4096)
    assert n == 4096


def test_apply_sets_session_conf(spark):
    df = spark.range(0, 100_000).select(F.col("id"))
    n = sizing.apply_arrow_batch(df, mem_budget_bytes=1 << 20)
    assert spark.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch") == str(n)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
