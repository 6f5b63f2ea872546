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
in a hot key is window-partition skew, handled the same way as every
window here (pre-salt by coarse time bucket if a single key's history
exceeds a task).

The registered ``asof_events`` query shares this formulation as SQL
text with the DuckDB oracle (engine-specific only in the IGNORE NULLS
placement); DuckDB's native ``ASOF JOIN`` gives an independent
cross-check in tests/test_asof.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, *, key_col: str,
              ts_col: str, value_col: str, tiebreak_col: str,
              out_col: str = "asof_value") -> DataFrame:
    """Inclusive backward as-of join (right.ts <= left.ts, per key).

    Returns every left row plus ``out_col`` (NULL when no right row
    precedes it). ``tiebreak_col`` makes equal-timestamp right rows
    deterministic (the max-id one wins, matching the SQL face).
    """
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
    w = Window.partitionBy(key_col) \
              .orderBy("_ts", "_side", "_tb") \
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = tagged.withColumn(out_col, F.last("_v", ignorenulls=True).over(w))
    return out.filter(F.col("_side") == 1).select(*lcols, out_col)
