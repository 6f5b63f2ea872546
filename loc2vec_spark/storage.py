"""Bucketed-table storage: co-located joins with zero shuffle (§4.3).

The flagship pipelines join repeatedly on ``image_id`` (channel align J1,
anchor-positive J2, embedding attach). On a cluster those joins shuffle
both sides every run — unless the tables are written bucketed on the join
key, in which case Spark proves the partitioning matches and plans a
sort-merge join with NO Exchange on either side. At 10^12 rows this turns
the most expensive recurring shuffle into a free co-located join; it is
the plain-parquet analog of an Iceberg bucket-partition spec (SURVEY.md
§7.0 documents the real-Iceberg switch).

Bucketed writes require the session catalog (``saveAsTable``): buckets
are recorded in table metadata, not in the files, so ``spark.table`` must
be used to read them back with the bucketing fact available to Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, *, bucket_col: str,
                   n_buckets: int = 64,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed, sorted parquet table.

    Sorting within buckets lets the co-located sort-merge join skip its
    sort as well (plan shows neither Exchange nor Sort on this side).
    """
    (df.write.mode(mode).format("parquet")
       .bucketBy(n_buckets, bucket_col)
       .sortBy(bucket_col)
       .saveAsTable(table))


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket spec (``spark.table``; a
    plain path read would lose the bucketing metadata)."""
    return spark.table(table)


def bucketed_join_is_shuffle_free(a: DataFrame, b: DataFrame,
                                  on: str) -> bool:
    """True when the a-b SORT-MERGE equi-join plans without any shuffle
    Exchange — i.e. Catalyst proved both sides already hash-partitioned
    by the key (bucket co-location).

    The merge hint matters for the *test*, not production: on toy tables
    the planner would pick a broadcast join (trivially shuffle-free) and
    skip the bucketing proof entirely; at the 10^12-row scale this
    module targets, neither side is broadcastable and sort-merge is what
    the planner picks on its own."""
    plan = (a.join(b.hint("merge"), on)
             ._jdf.queryExecution().executedPlan().toString())
    return ("SortMergeJoin" in plan
            and "Exchange hashpartitioning" not in plan)


def zorder_by(df: DataFrame, i_col: str, j_col: str, *, bits: int = 8,
              n_files: int = 32) -> DataFrame:
    """Z-order (Morton) clustering for 2-D min/max data skipping.

    Interleaves the bits of two non-negative integer columns (cell i/j —
    ``cells.ij_sql`` output) into a ``__z`` key, range-partitions on it,
    and sorts within partitions — so each output file covers a compact
    square-ish (i, j) region. Parquet footer min/max stats on ``i_col``/
    ``j_col`` then prune 2-D range predicates (a k-ring probe, a bbox
    scan) to a handful of files; a 1-D lat-sort layout leaves every file
    spanning the full other dimension and prunes nothing on it.

    Scale shape: ``repartitionByRange`` samples boundaries (no global
    single-task sort — the NTILE formulation in the ``zorder_locality``
    oracle is the deterministic small-scale face of exactly this) and
    the write stays fully parallel. This is the plain-parquet analog of
    Iceberg/Delta ``ZORDER BY`` table maintenance.
    """
    from pyspark.sql import functions as F

    from .functions import morton_sql
    z = F.expr(morton_sql(i_col, j_col, bits))
    return (df.withColumn("__z", z)
              .repartitionByRange(n_files, "__z")
              .sortWithinPartitions("__z")
              .drop("__z"))
