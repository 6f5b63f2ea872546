"""Blocked all-pairs cosine: exactness vs SQL and vs numpy."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from loc2vec_spark.operators.similarity import blocked_pairs_cosine

DIM = 16
N = 150


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(11)
    x = rng.normal(size=(N, DIM)).astype(np.float32)
    # make some near-duplicates so the threshold keeps real pairs
    x[10] = x[3] + 0.01 * rng.normal(size=DIM).astype(np.float32)
    x[77] = x[42]
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")


def _sql_pairs(spark, emb_df, thr):
    from loc2vec_spark.functions import SPARK_BASE, dot_sql, norm_sql
    emb_df.createOrReplaceTempView("emb_t")
    dot = dot_sql("a.embedding", "b.embedding", DIM, SPARK_BASE)
    nrm = norm_sql("embedding", DIM, SPARK_BASE)
    return spark.sql(f"""
        WITH ne AS (SELECT vec_id, embedding, {nrm} AS nrm FROM emb_t)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ({dot}) / (a.nrm * b.nrm) AS cosine
        FROM ne a JOIN ne b ON a.vec_id < b.vec_id
        WHERE ({dot}) / (a.nrm * b.nrm) >= {thr}E0""")


def test_blocked_matches_sql_bitwise(spark, emb_df):
    thr = 0.3
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in blocked_pairs_cosine(
               emb_df, id_col="vec_id", emb_col="embedding",
               dim=DIM, threshold=thr).collect()}
    exp = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in _sql_pairs(spark, emb_df, thr).collect()}
    assert set(got) == set(exp)
    # bit-identical, not allclose: left-to-right accumulation contract
    for k in exp:
        assert got[k] == exp[k], (k, got[k], exp[k])
    # the planted duplicates survive the threshold
    assert (42, 77) in got and got[(42, 77)] == pytest.approx(1.0)


def test_every_unordered_pair_exactly_once(spark, emb_df):
    out = blocked_pairs_cosine(emb_df, id_col="vec_id",
                               emb_col="embedding", dim=DIM,
                               threshold=-2.0)  # keep everything
    n = out.count()
    assert n == N * (N - 1) // 2
    assert out.select("id_a", "id_b").distinct().count() == n
    assert out.filter(F.col("id_a") >= F.col("id_b")).count() == 0


def test_block_count_invariance(spark, emb_df):
    a = blocked_pairs_cosine(emb_df, id_col="vec_id", emb_col="embedding",
                             dim=DIM, threshold=0.5, n_blocks=4)
    b = blocked_pairs_cosine(emb_df, id_col="vec_id", emb_col="embedding",
                             dim=DIM, threshold=0.5, n_blocks=25)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_arrow_kernel_equals_registered_sql_text(spark):
    """The de-registered SQL face (EMBPAIRS_SPARK_SQL) is exactly what
    dedup_embedding's Arrow kernel must reproduce bit-for-bit — this is
    the literal constant the queries_text comment points at, run on the
    real embeddings table it was written for."""
    from loc2vec_spark.queries import DIM as REG_DIM
    from loc2vec_spark.queries_text import EMBPAIRS_SPARK_SQL

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    emb.createOrReplaceTempView("embeddings")
    exp = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in spark.sql(EMBPAIRS_SPARK_SQL).collect()}
    got = {(r["id_a"], r["id_b"]): round(r["cosine"], 6)
           for r in blocked_pairs_cosine(
               emb, id_col="vec_id", emb_col="embedding",
               dim=REG_DIM, threshold=0.3).collect()}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == exp[k], (k, got[k], exp[k])
