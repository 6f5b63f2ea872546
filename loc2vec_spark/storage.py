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


def _exact_partition_keys(spark: SparkSession, n: int) -> list[int]:
    """One bigint key per target partition: the smallest ``id`` with
    ``pmod(murmur3(id), n) == p`` for each ``p`` in ``0..n-1``.

    ``df.repartition(n, col)`` routes rows by ``pmod(hash(col), n)``
    where ``hash`` is the same Murmur3 (seed 42) that ``F.hash``
    computes, so routing each z-bucket through its probed key places it
    in exactly one partition — a bijective, fully deterministic layout.
    The probe is one bounded job (64·n candidate ids, n rows collected);
    with 64·n uniform hashes the odds of an unhit partition are
    ``n·((n-1)/n)^(64n) < 1e-27`` even at n=1, and the guard below
    turns the impossible miss into a loud error rather than a bad
    layout.
    """
    from pyspark.sql import functions as F

    rows = (spark.range(0, max(4096, 64 * n))
                 .select(F.pmod(F.hash("id"), F.lit(n)).alias("p"), "id")
                 .groupBy("p").agg(F.min("id").alias("k"))
                 .collect())
    keys = {r["p"]: r["k"] for r in rows}
    if len(keys) < n:
        raise ValueError(f"partition-key probe hit {len(keys)}/{n} "
                         "partitions; widen the probe range")
    return [keys[p] for p in range(n)]


def zorder_by(df: DataFrame, i_col: str, j_col: str, *, bits: int = 8,
              n_files: int = 32, deterministic: bool = True) -> DataFrame:
    """Z-order (Morton) clustering for 2-D min/max data skipping.

    Interleaves the bits of two non-negative integer columns (cell i/j —
    ``cells.ij_sql`` output) into a ``__z`` key, partitions on it, and
    sorts within partitions — so each output file covers a compact
    square-ish (i, j) region. Parquet footer min/max stats on ``i_col``/
    ``j_col`` then prune 2-D range predicates (a k-ring probe, a bbox
    scan) to a handful of files; a 1-D lat-sort layout leaves every file
    spanning the full other dimension and prunes nothing on it.

    ``deterministic=True`` (default): each file is an EXACT z-range —
    ``bucket = (z * n_files) >> (2 * bits)`` (pure integer math), routed
    bijectively to shuffle partitions via probed Murmur3 keys. The
    layout is a pure function of the data: byte-identical across runs,
    sessions, and prior RDD history, which is the engine's
    reproducible-layout claim (SURVEY §7.0) — and when ``n_files``
    divides the z-range at a quadrant boundary (any power of four),
    every file is an exact Morton quadrant. The trade: heavy spatial
    skew (hot cities) makes fixed z-ranges uneven in ROWS per file;
    raise ``n_files`` or pass ``deterministic=False`` to let
    ``repartitionByRange`` sample row-balanced boundaries instead
    (balanced files, but boundary placement varies with the sampling
    seed, i.e. with session history).

    Scale shape: both modes are one shuffle and a fully parallel write —
    no global single-task sort. The NTILE formulation in the
    ``zorder_locality`` oracle is the small-scale SQL face of the same
    clustering. This is the plain-parquet analog of Iceberg/Delta
    ``ZORDER BY`` table maintenance.
    """
    from pyspark.sql import functions as F

    from .functions import morton_sql
    # z < 4^bits, and the deterministic bucket is (z * n_files) >> 2b:
    # the product must fit a BIGINT or rows silently route through a
    # wrapped-negative bucket (element_at with a negative index reads
    # from the END of the key array — wrong-but-valid partitions, no
    # error). Refuse loudly instead (review r4).
    if 2 * bits + max(n_files - 1, 1).bit_length() > 62:
        raise ValueError(
            f"bits={bits} with n_files={n_files} overflows the 63-bit "
            f"z*n_files bucket product; lower bits or n_files")
    z = F.expr(morton_sql(i_col, j_col, bits))
    if not deterministic:
        return (df.withColumn("__z", z)
                  .repartitionByRange(n_files, "__z")
                  .sortWithinPartitions("__z")
                  .drop("__z"))
    keys = _exact_partition_keys(df.sparkSession, n_files)
    bucket = F.shiftright(z * F.lit(n_files), 2 * bits)
    key = F.element_at(
        F.array(*[F.lit(k).cast("bigint") for k in keys]),
        (bucket + F.lit(1)).cast("int"))
    return (df.withColumn("__z", z)
              .withColumn("__zk", key)
              .repartition(n_files, "__zk")
              .sortWithinPartitions("__z")
              .drop("__z", "__zk"))
