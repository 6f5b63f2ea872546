"""Size estimation + physical-strategy helpers (F11, optim batch probe).

Reference analogs:

- ``/root/reference/src/loc2vec/utils.py:112-123`` (``gpu_compute_memory``)
  sums element-count x element-size over a model's tensors to decide what
  fits in device memory. The engine's unit of "does it fit" is the
  broadcast side of a join: :func:`estimate_bytes` reads Catalyst's own
  plan statistics first (free, and exactly what the optimizer's
  autoBroadcastJoinThreshold consults) and falls back to a sampled
  rows-times-row-width estimate when stats are unknown;
  :func:`auto_broadcast_join` turns that into an explicit plan choice.
- ``/root/reference/src/loc2vec/optim.py:21-46`` (``batch_optimiser``)
  doubles the batch until CUDA OOM, then halves back. Crash-probing
  executors is an anti-pattern on a shared cluster, so
  :func:`arrow_batch_records` reproduces the same doubling search
  *by construction*: double the record count until estimated Arrow batch
  bytes exceed the memory budget, halve back, clamp to the caller's max
  — same control flow (including the reference's halve-at-no_samples
  edge), no OOM required. The result feeds
  ``spark.sql.execution.arrow.maxRecordsPerBatch``, which is what
  bounds per-batch memory in every mapInPandas operator here.

Most joins in this engine don't need any of this — Catalyst broadcasts
below-threshold sides automatically. These helpers exist for the two
cases the optimizer can't see: (a) a side whose stats are unknown
(mid-pipeline after UDFs) yet known-small to the caller, and (b) Python
objects (R-trees, weight dicts) broadcast via the SparkContext where
the caller must budget executor memory itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes statistic for the optimized plan, or None
    when the optimizer itself doesn't know (returns its 8-EiB sentinel /
    conf default)."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    size = int(stats.sizeInBytes())
    # unknown stats surface as the defaultSizeInBytes sentinel (~8 EiB)
    if size <= 0 or size >= (1 << 60):
        return None
    return size


def _row_width(df: DataFrame, sample_rows: int) -> int:
    """Avg serialized row width from a bounded Arrow-path sample —
    measured, not declared (variable-width strings/arrays make declared
    widths fiction). Shared by the size estimator and the batch probe so
    the two can't silently diverge."""
    sample = df.limit(sample_rows).toPandas()
    return max(1, int(sample.memory_usage(index=False, deep=True).sum()
                      / max(1, len(sample))))


def sampled_size_bytes(df: DataFrame, sample_rows: int = 1000) -> int:
    """Row-count x sampled-avg-serialized-row-width estimate.

    One count + one bounded sample — two cheap jobs. The width probe
    serializes ``sample_rows`` rows through the same Arrow path the
    engine's operators use, mirroring nelement*element_size from the
    reference."""
    n = df.count()
    if n == 0:
        return 0
    return n * _row_width(df, sample_rows)


def estimate_bytes(df: DataFrame, sample_rows: int = 1000) -> int:
    """F11: best-available size estimate — free plan stats, else sample."""
    size = plan_size_bytes(df)
    return size if size is not None else sampled_size_bytes(df, sample_rows)


def auto_broadcast_join(left: DataFrame, right: DataFrame, on,
                        how: str = "inner",
                        threshold_bytes: int = 10 * 1024 * 1024,
                        ) -> DataFrame:
    """Join with the smaller side explicitly broadcast iff it fits.

    Catalyst already does this when stats exist; this helper makes the
    same decision for stats-less mid-pipeline frames. Over-threshold on
    both sides -> plain join (sort-merge / AQE decides), because a
    too-big broadcast is a driver+executor OOM, the cluster equivalent
    of the reference's CUDA OOM this module exists to avoid.

    The probe is CAPPED: deciding a hint must never cost a full pass
    over an expensive pipeline, so the stats-less fallback counts at
    most threshold/row_width + 1 rows (limit().count() stops early) —
    hitting the cap already proves "too big to broadcast"."""
    def probe(df: DataFrame) -> int:
        size = plan_size_bytes(df)
        if size is not None:
            return size
        width = _row_width(df, 1000)
        cap = threshold_bytes // width + 1
        n = df.limit(cap).count()
        return n * width if n < cap else threshold_bytes + 1

    ls, rs = probe(left), probe(right)
    if min(ls, rs) <= threshold_bytes:
        # operand order (and therefore join semantics) never changes —
        # only the small side gets the hint; Spark honors it when the
        # join type allows that build side and ignores it otherwise
        if rs <= ls:
            return left.join(F.broadcast(right), on, how)
        return F.broadcast(left).join(right, on, how)
    return left.join(right, on, how)


def arrow_batch_records(df: DataFrame, *,
                        mem_budget_bytes: int = 64 * 1024 * 1024,
                        max_records: int = 100_000,
                        start: int = 2,
                        sample_rows: int = 1000) -> int:
    """optim.py batch_optimiser, by construction: largest power-of-two
    record count whose estimated Arrow batch fits ``mem_budget_bytes``.

    Same shape as the reference loop (start at 2, double, halve back on
    overflow, clamp at max), with estimated bytes standing in for the
    try/OOM probe. Apply the result via
    ``spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", n)``.
    """
    n_rows = df.count()
    width = _row_width(df, sample_rows)
    batch = start
    while True:
        # budget check FIRST, on the CURRENT batch — checking only the
        # next double could bless a start value that already exceeds the
        # budget (wide binary rows: 40MB/row at a 64MB budget must yield
        # 1, not start*2's worth of OOM)
        if batch * width > mem_budget_bytes:      # would-OOM -> halve back
            return max(1, batch // 2)
        if batch >= max_records:          # reference: >= max_batch_size
            return max_records
        if n_rows and batch >= n_rows:    # reference: >= no_samples
            return max(1, batch // 2)
        batch *= 2


def apply_arrow_batch(df: DataFrame, **kwargs) -> int:
    """Probe + set maxRecordsPerBatch on df's session; returns the value."""
    n = arrow_batch_records(df, **kwargs)
    df.sparkSession.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(n))
    return n
