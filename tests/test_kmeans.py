"""Distributed Lloyd k-means: determinism, convergence, oracle parity.

The bit-exact DuckDB parity of the ``kmeans_latlon`` face is covered by
tools/check_oracles.py; here we pin the operator-level contracts the
oracle can't see: partitioning-independence, monotone SSE, zero-shuffle
assignment plan.
"""

import numpy as np
import pandas as pd
import pytest

from loc2vec_spark.operators import kmeans


@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.Generator(np.random.PCG64(7))
    centers = [(0.0, 0.0), (10.0, 10.0), (-10.0, 5.0), (5.0, -12.0)]
    rows = []
    for i in range(400):
        clat, clon = centers[i % 4]
        rows.append({"vec_id": i,
                     "lat": round(clat + rng.normal(0, 1.0), 6),
                     "lon": round(clon + rng.normal(0, 1.0), 6)})
    return spark.createDataFrame(pd.DataFrame(rows))


def _sse(asg_pdf, cents):
    cmap = {cid: (clat, clon) for cid, clat, clon in cents}
    tot = 0.0
    for r in asg_pdf.itertuples():
        clat, clon = cmap[r.cid]
        tot += (r.lat - clat) ** 2 + (r.lon - clon) ** 2
    return tot


def test_recovers_planted_clusters(spark, pts):
    res = kmeans.lloyd(pts, k=4, iters=4)
    pdf = res.assignments.join(pts, "vec_id").toPandas()
    # each planted cluster maps to exactly one learned cid (clusters are
    # 10+ sigma apart, so 4 iterations nail them)
    for planted in range(4):
        got = pdf[pdf.vec_id % 4 == planted].cid.unique()
        assert len(got) == 1
    assert pdf.cid.nunique() == 4


def test_deterministic_across_partitioning(spark, pts):
    a = kmeans.lloyd(pts, k=4, iters=2)
    b = kmeans.lloyd(pts.repartition(13, "lon"), k=4, iters=2)
    assert a.centroids == b.centroids  # bit-identical, not allclose
    pa = a.assignments.toPandas().sort_values("vec_id").reset_index(drop=True)
    pb = b.assignments.toPandas().sort_values("vec_id").reset_index(drop=True)
    assert pa.equals(pb)


def test_sse_monotone_under_updates(spark, pts):
    res = kmeans.lloyd(pts, k=4, iters=3)
    pdf_pts = pts.toPandas()
    sses = []
    for cents in res.history:
        asg = kmeans.assign_rowwise(pts, cents, "lat", "lon") \
                    .toPandas().merge(pdf_pts, on=["vec_id", "lat", "lon"])
        sses.append(_sse(asg, cents))
    # Lloyd is monotone non-increasing in SSE evaluated at each update
    assert all(b <= a + 1e-9 for a, b in zip(sses, sses[1:]))


def test_assignment_is_rowwise_zero_shuffle(spark, pts):
    cents = [(0, 0.0, 0.0), (1, 10.0, 10.0)]
    out = kmeans.assign_rowwise(pts, cents, "lat", "lon")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan          # no shuffle
    assert "Join" not in plan              # no join — literal centroids
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
