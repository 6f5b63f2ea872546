"""As-of (temporal) join — the classic operator Spark's API lacks.

For every left row, attach the value of the most recent right row with
``right.ts <= left.ts`` for the same key. The naive formulations both
die at scale: a theta-join ``ON r.ts <= l.ts`` explodes to the full
per-key cross product before aggregation, and per-key ``collect +
searchsorted`` is driver-bound. The scale formulation here is the
union-tag trick:

1. union right rows (carrying their value) with left rows (NULL value),
   tagged by side;
2. one window per key ordered by (ts, side, id): a right row sorts
   BEFORE any left row with the same timestamp (inclusive as-of
   semantics), later right rows overwrite earlier ones;
3. ``last_value(... ignore nulls)`` propagates the latest right value
   onto every row; keep the left rows.

Cost: exactly ONE shuffle of |L| + |R| rows keyed by the join key — the
same price as a plain equi-join, no range blowup, no driver state. Skew
in a hot key is window-partition skew; ``bucket_width`` switches to the
implemented scale path — windows per (key, time-bucket) with a tiny
second window over per-bucket summaries supplying each bucket's
carry-in — bounding per-task history while computing the identical
result (asserted in tests across widths).

The registered ``asof_events`` query shares this formulation as SQL
text with the DuckDB oracle (engine-specific only in the IGNORE NULLS
placement); DuckDB's native ``ASOF JOIN`` gives an independent
cross-check in tests/test_asof.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, *, key_col: str,
              ts_col: str, value_col: str, tiebreak_col: str,
              out_col: str = "asof_value",
              bucket_width: int | None = None) -> DataFrame:
    """Inclusive backward as-of join (right.ts <= left.ts, per key).

    Returns every left row plus ``out_col`` (NULL when no right row
    precedes it). ``tiebreak_col`` makes equal-timestamp right rows
    deterministic (the max-id one wins, matching the SQL face).

    ``bucket_width`` (same unit as a double-cast of ``ts_col``; epoch
    seconds for timestamps) switches to the hot-key scale path: the
    plain form runs ONE window per key, so a single key with a 10^9-row
    history is a single straggler task. Bucketed, the windows partition
    by (key, time-bucket) — per-task history bounded by the bucket — and
    a second, tiny window over the per-(key, bucket) summaries computes
    each bucket's carry-in (the last right value from strictly earlier
    buckets). Identical output (test_asof asserts equality)."""
    lcols = left.columns
    r = right.select(F.col(key_col), F.col(ts_col).alias("_ts"),
                     F.col(value_col).alias("_v"),
                     F.col(tiebreak_col).alias("_tb"),
                     F.lit(0).alias("_side"))
    l_ = left.withColumn("_ts", F.col(ts_col)) \
             .withColumn("_v", F.lit(None).cast(r.schema["_v"].dataType)) \
             .withColumn("_tb", F.lit(None).cast(r.schema["_tb"].dataType)) \
             .withColumn("_side", F.lit(1))
    tagged = l_.select(*lcols, "_ts", "_v", "_tb", "_side") \
               .unionByName(r, allowMissingColumns=True)

    if bucket_width is None:
        w = Window.partitionBy(key_col) \
                  .orderBy("_ts", "_side", "_tb") \
                  .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        out = tagged.withColumn(out_col,
                                F.last("_v", ignorenulls=True).over(w))
        return out.filter(F.col("_side") == 1).select(*lcols, out_col)

    ts_type = dict(tagged.dtypes)["_ts"]
    if "timestamp" in ts_type:
        # ANSI forbids timestamp->double; epoch seconds via unix_micros
        # (TIMESTAMP_NTZ relabels to TIMESTAMP losslessly)
        secs = F.unix_micros(F.col("_ts").cast("timestamp")) / F.lit(1e6)
    else:
        secs = F.col("_ts").cast("double")
    tagged = tagged.withColumn("_b", F.floor(secs / int(bucket_width)))
    # pass 1: prefix fill WITHIN each (key, bucket) — bounded task size
    w1 = Window.partitionBy(key_col, "_b") \
               .orderBy("_ts", "_side", "_tb") \
               .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    within = tagged.withColumn("_wv",
                               F.last("_v", ignorenulls=True).over(w1))
    # pass 2: one summary row per (key, bucket) — the bucket's final
    # right value (max (ts, tb) wins, matching pass 1's order) — then a
    # per-key window over these FEW rows yields each bucket's carry-in
    # from strictly earlier buckets
    # ordering key only for right rows with a NON-NULL value: the plain
    # path's last(ignorenulls) skips null right values, so a bucket
    # whose latest right row carries NULL must expose its latest
    # non-null value as the carry, not mask earlier ones (review r2)
    summ = tagged.groupBy(key_col, "_b").agg(
        F.max_by("_v", F.when((F.col("_side") == 0)
                              & F.col("_v").isNotNull(),
                              F.struct("_ts", "_tb"))).alias("_bv"))
    w2 = Window.partitionBy(key_col).orderBy("_b") \
               .rowsBetween(Window.unboundedPreceding, -1)
    carry = summ.withColumn("_cv",
                            F.last("_bv", ignorenulls=True).over(w2)) \
                .select(key_col, "_b", "_cv")
    # LEFT join with NULL-SAFE keys: an inner join would silently drop
    # left rows whose key or ts is NULL, and a null-unsafe left join
    # would lose their cross-bucket carry-in (the plain path's window
    # groups NULL keys together, so NULL-key carry is real — review r2)
    carry = carry.withColumnRenamed(key_col, "_ck") \
                 .withColumnRenamed("_b", "_cb")
    cond = (F.col(key_col).eqNullSafe(F.col("_ck"))
            & F.col("_b").eqNullSafe(F.col("_cb")))
    out = within.join(carry, cond, "left") \
                .withColumn(out_col, F.coalesce("_wv", "_cv"))
    return out.filter(F.col("_side") == 1).select(*lcols, out_col)
