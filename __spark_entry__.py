"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (cell-blocked kNN over the
embeddings table — SURVEY.md §7.1) on sf0.01. ``queries()`` /
``oracle_sql()`` expose the operator inventory from SURVEY.md §2; the
implementations live in :mod:`loc2vec_spark.queries`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from loc2vec_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tile-assignment + cell-blocked kNN on sf0.01.

    sf0.01 (not the sf0.001 toy) so the driver's always-run smoke
    query exercises real parallelism — multiple input splits, a real
    shuffle, and the WindowGroupLimit top-k path (VERDICT r3 item 5).
    """
    return _q.run_spark(spark, "/root/testdata/sf0.01", "knn_topk")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    def make(name: str):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return _q.run_spark(spark, sf_dir, name)
        run.__name__ = f"q_{name}"
        return run

    return {name: make(name) for name in _q.QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle for every SQL-expressible query."""
    return {name: q.duck_sql for name, q in _q.QUERIES.items()
            if q.duck_sql is not None}
