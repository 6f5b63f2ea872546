"""Bucketed range join: semantics, plan shape, theta-join equivalence."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from loc2vec_spark.operators.interval import range_join


@pytest.fixture(scope="module")
def fixture(spark):
    rng = np.random.default_rng(9)
    iv = pd.DataFrame({
        "key": rng.integers(0, 20, 300),
        "iv_id": np.arange(300),
        "start": rng.integers(0, 100_000, 300)})
    iv["end"] = iv["start"] + rng.integers(1, 20_000, 300)
    pts = pd.DataFrame({
        "key": rng.integers(0, 20, 2000),
        "pt_id": np.arange(2000),
        "ts": rng.integers(0, 120_000, 2000)})
    return spark.createDataFrame(pts), spark.createDataFrame(iv), pts, iv


def test_matches_naive_pandas_join(spark, fixture):
    pts_df, iv_df, pts, iv = fixture
    got = {(r["pt_id"], r["iv_id"])
           for r in range_join(pts_df, iv_df, key_col="key", ts_col="ts",
                               start_col="start", end_col="end",
                               bucket_width=5_000).collect()}
    m = pts.merge(iv, on="key")
    exp = {(r.pt_id, r.iv_id) for r in
           m[(m.ts >= m.start) & (m.ts <= m.end)].itertuples()}
    assert got == exp
    assert len(exp) > 500  # the check has teeth


def test_no_duplicate_pairs_and_boundaries(spark):
    iv = spark.createDataFrame(
        [(1, 10, 100, 200)], "key INT, iv_id INT, start INT, end INT")
    pts = spark.createDataFrame(
        [(1, 0, 99), (1, 1, 100), (1, 2, 200), (1, 3, 201), (2, 4, 150)],
        "key INT, pt_id INT, ts INT")
    out = range_join(pts, iv, key_col="key", ts_col="ts",
                     start_col="start", end_col="end", bucket_width=7)
    rows = [(r["pt_id"], r["iv_id"]) for r in out.collect()]
    assert sorted(rows) == [(1, 10), (2, 10)]  # inclusive both ends
    assert len(rows) == len(set(rows))  # bucket explode never duplicates


def test_plan_is_equi_join_not_nested_loop(spark, fixture):
    pts_df, iv_df, _, _ = fixture
    out = range_join(pts_df, iv_df, key_col="key", ts_col="ts",
                     start_col="start", end_col="end", bucket_width=5_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the whole point: the range predicate rides an equi-join
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_bucket_width_invariance(spark, fixture):
    pts_df, iv_df, _, _ = fixture
    a = range_join(pts_df, iv_df, key_col="key", ts_col="ts",
                   start_col="start", end_col="end", bucket_width=1_000)
    b = range_join(pts_df, iv_df, key_col="key", ts_col="ts",
                   start_col="start", end_col="end", bucket_width=50_000)
    assert a.exceptAll(b).count() == 0 == b.exceptAll(a).count()


def test_randomized_against_python_reference(spark):
    """40 random cases in one pass (case folded into key): bucketed
    range join vs brute-force python containment, odd widths included."""
    rng = np.random.default_rng(77)
    prow, irow, expected = [], [], set()
    pid = iid = 0
    for case in range(40):
        ivs = []
        for _ in range(int(rng.integers(0, 6))):
            s = int(rng.integers(-50, 50))
            e = s + int(rng.integers(0, 30))
            iid += 1
            ivs.append((iid, s, e))
            irow.append((case, iid, s, e))
        for _ in range(int(rng.integers(0, 10))):
            ts = int(rng.integers(-60, 60))
            pid += 1
            prow.append((case, pid, ts))
            for jid, s, e in ivs:
                if s <= ts <= e:
                    expected.add((pid, jid))
    pts = spark.createDataFrame(prow, "key INT, pt_id INT, ts INT")
    iv = spark.createDataFrame(irow,
                               "key INT, iv_id INT, start INT, end INT")
    for width in (1, 7, 1000):
        got = {(r["pt_id"], r["iv_id"])
               for r in range_join(pts, iv, key_col="key", ts_col="ts",
                                   start_col="start", end_col="end",
                                   bucket_width=width).collect()}
        assert got == expected, f"width={width}"
