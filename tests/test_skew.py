"""Skew handling: AQE skew-join split + explicit salting, proven on plans.

North_rule: "partitioning / shuffle / skew handled explicitly". Two
mechanisms, both asserted here:
- runtime: AQE splits a skewed sort-merge-join partition (plan shows
  ``skew=true`` once the adaptive plan finalizes);
- static: lineage.salted subdivides hot cells ahead of grouping.
"""

import pytest
from pyspark.sql import functions as F

from loc2vec_spark.lineage import salted

_SKEW_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "4KB",
}


@pytest.fixture()
def skew_conf(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONF}
    for k, v in _SKEW_CONF.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join(spark, skew_conf):
    # 200k-row left side, 90% of rows on one key; pad makes the hot
    # partition big enough to cross the (lowered) skew threshold
    # pad must be incompressible: shuffle partition sizes are measured on
    # COMPRESSED bytes, and a constant pad lz4-compresses below the skew
    # threshold no matter how many rows pile on the hot key
    left = spark.range(200_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(
            F.col("id") % 1000).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"))
    right = spark.range(1000).select(F.col("id").alias("k"),
                                     F.lit("r").alias("tag"))
    # collect() drives THIS DataFrame's own QueryExecution (a write or a
    # derived count would execute a different one, leaving this plan
    # un-finalized). The pad column must survive to the output, else
    # column pruning drops it from the shuffle and nothing is skewed.
    j = left.join(right, "k")
    assert len(j.collect()) == 200_000
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, "AQE did not split the skewed partition"


def test_salted_bounds_hot_cells(spark):
    df = spark.range(50_000).select(
        F.when(F.col("id") % 10 < 8, F.lit(111)).otherwise(
            F.col("id") % 100).alias("cell"),
        F.col("id").alias("image_id"))
    out = salted(df, cell_col="cell", id_col="image_id",
                 target_rows=5_000)
    sizes = (out.groupBy("cell", "salt").count().collect())
    hot = [r for r in sizes if r["cell"] == 111]
    assert len(hot) == 8  # ceil(40k / 5k) sub-partitions
    assert all(r["count"] < 10_000 for r in hot)
    # cold cells untouched (salt 0)
    cold = [r for r in sizes if r["cell"] != 111]
    assert all(r["salt"] == 0 for r in cold)
    # lossless: same rows, just sub-partitioned
    assert out.count() == 50_000
