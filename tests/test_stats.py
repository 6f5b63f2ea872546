"""A6: distributed covariance / PCA vs numpy ground truth."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from loc2vec_spark.operators import stats

DIM = 8
N = 400


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(42)
    x = rng.normal(size=(N, DIM)).astype(np.float64)
    # plant correlation so PCA has a meaningful top component
    x[:, 1] = 0.8 * x[:, 0] + 0.2 * x[:, 1]
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, emb ARRAY<DOUBLE>")
    return df, x


def test_covariance_matches_numpy(emb_df):
    df, x = emb_df
    cov = stats.covariance(df, emb_col="emb", dim=DIM)
    expected = np.cov(x, rowvar=False, bias=True)
    np.testing.assert_allclose(cov, expected, rtol=1e-10, atol=1e-12)


def test_covariance_skips_null_rows(emb_df, spark):
    df, x = emb_df
    withnull = df.union(spark.createDataFrame(
        [(10_000, None)], "vec_id BIGINT, emb ARRAY<DOUBLE>"))
    cov = stats.covariance(withnull, emb_col="emb", dim=DIM)
    expected = np.cov(x, rowvar=False, bias=True)
    np.testing.assert_allclose(cov, expected, rtol=1e-10, atol=1e-12)


def test_pca_project_matches_numpy(emb_df):
    df, x = emb_df
    k = 3
    out = stats.pca_project(df, id_col="vec_id", emb_col="emb",
                            dim=DIM, k=k)
    got = {r["vec_id"]: np.array(r["pca"]) for r in out.collect()}
    assert len(got) == N and all(len(v) == k for v in got.values())

    cov = np.cov(x, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    comps = vecs[:, ::-1][:, :k].T
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    expected = x @ comps.T
    mat = np.stack([got[i] for i in range(N)])
    np.testing.assert_allclose(mat, expected, rtol=1e-8, atol=1e-10)


def test_pca_components_deterministic_across_partitioning(emb_df):
    df, _ = emb_df
    c1 = stats.pca_components(df.repartition(1), emb_col="emb",
                              dim=DIM, k=2)
    c8 = stats.pca_components(df.repartition(8), emb_col="emb",
                              dim=DIM, k=2)
    # float addition order differs across partitionings; the components
    # must still agree to numerical precision and exact sign
    np.testing.assert_allclose(c1, c8, rtol=1e-9, atol=1e-11)


def test_projection_null_embedding_maps_to_null(emb_df, spark):
    df, _ = emb_df
    withnull = df.union(spark.createDataFrame(
        [(10_000, None)], "vec_id BIGINT, emb ARRAY<DOUBLE>"))
    out = stats.pca_project(withnull, id_col="vec_id", emb_col="emb",
                            dim=DIM, k=2)
    row = out.filter(F.col("vec_id") == 10_000).collect()[0]
    assert row["pca"] is None


def test_a12_regression_matches_numpy_polyfit(spark):
    """Closed-form OLS from exact integer moments vs numpy lstsq."""
    import numpy as np
    import pandas as pd
    from loc2vec_spark import queries as q
    sf = "/root/testdata/sf0.001"
    out = {r.l_returnflag: r for r in
           q.run_spark(spark, sf, "a12_regression").collect()}
    li = pd.read_parquet(f"{sf}/lineitem.parquet")
    assert len(out) == li.l_returnflag.nunique()
    for rf, g in li.groupby("l_returnflag"):
        x = np.floor(g.l_quantity.astype(float).to_numpy())
        y = np.floor(g.l_extendedprice.astype(float).to_numpy())
        slope, intercept = np.polyfit(x, y, 1)
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        r = out[rf]
        assert abs(r.slope - slope) < 1e-4
        assert abs(r.intercept - intercept) < 1e-2
        assert abs(r.r2 - r2) < 1e-4
        assert r.n_rows == len(g)


def test_profile_stats_invariants(spark):
    from loc2vec_spark import queries as q
    sf = "/root/testdata/sf0.01"
    r = q.run_spark(spark, sf, "profile_stats").collect()[0]
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    assert r.n_rows == docs.count()
    assert 0 <= r.null_text <= r.n_rows and 0 <= r.empty_text <= r.n_rows
    assert r.min_chars <= r.mean_chars <= r.max_chars
    assert abs(r.mean_chars - r.sum_chars / r.n_rows) < 1e-6
    assert r.d_lang >= 1 and r.d_source >= 1


def test_dist_drift_invariants(spark):
    """Chi-square terms are non-negative, the slice marginals cover
    every event, and a numpy recomputation of the textbook statistic
    matches the fixed-order SQL expression."""
    import numpy as np

    from loc2vec_spark import queries as q
    sf = "/root/testdata/sf0.01"
    rows = q.run_spark(spark, sf, "dist_drift").collect()
    n_events = spark.read.parquet(f"{sf}/events.parquet").count()
    assert sum(r.o0 + r.o1 for r in rows) == n_events
    c0 = sum(r.o0 for r in rows)
    c1 = sum(r.o1 for r in rows)
    for r in rows:
        assert r.chi2_term >= 0
        expect = 0.0
        for o, c in ((r.o0, c0), (r.o1, c1)):
            e = (r.o0 + r.o1) * c / (c0 + c1)
            expect += (o - e) ** 2 / e
        assert abs(r.chi2_term - expect) < 1e-5


def test_events_funnel_invariants(spark):
    """Ordered-funnel semantics: purchase implies click, stage times
    strictly increase, and durations are consistent; stage reach is
    non-vacuous at sf0.01 in both directions."""
    from loc2vec_spark import queries as q
    rows = q.run_spark(spark, "/root/testdata/sf0.01",
                       "events_funnel").collect()
    assert len(rows) > 0
    for r in rows:
        if r.reached_purchase:
            assert r.reached_click == 1  # strictly-ordered stages
        if r.reached_click:
            assert r.us_view_to_click > 0
        else:
            assert r.us_view_to_click is None
        if r.reached_purchase:
            assert r.us_view_to_purchase > r.us_view_to_click
    assert any(r.reached_purchase for r in rows)
