"""Distributed Bloom-filter index: no-false-negative guarantee,
false-positive rate under the standard load formula, index table
shape, and the missing-bucket = definitely-new path."""

import numpy as np
from pyspark.sql import functions as F

from loc2vec_spark.operators.bloom import bloom_probe, build_bloom_index

M_BITS, K, NB = 4096, 4, 8


def _keys_df(spark, keys, name="k"):
    return spark.createDataFrame([(int(x),) for x in keys],
                                 f"{name} BIGINT")


def test_no_false_negatives_and_query_face_semantics(spark):
    """Every batch doc whose exact text exists in the corpus partition
    MUST probe bloom_maybe=1 — the guarantee the whole design rests
    on — and bloom_maybe=0 docs must never be exact cross-batch dups."""
    from loc2vec_spark import queries as q
    sf = "/root/testdata/sf0.01"
    out = {r.doc_id: r.bloom_maybe
           for r in q.run_spark(spark, sf, "dedup_bloom").collect()}
    assert len(out) > 0
    docs = spark.read.parquet(f"{sf}/documents.parquet").collect()
    corpus_texts = {d.text for d in docs if d.doc_id % 5 != 0}
    for d in docs:
        if d.doc_id % 5 == 0 and d.text in corpus_texts:
            assert out[d.doc_id] == 1, d.doc_id
    # sf0.01 has zero cross-batch exact dups (verified: every text is
    # unique), so ALL verdicts must be 0 — and that is exactly right
    batch_texts = {d.text for d in docs if d.doc_id % 5 == 0}
    if not (batch_texts & corpus_texts):
        assert all(v == 0 for v in out.values())
    # the check still has teeth: partial bit collisions must occur
    # (bits are really being set and tested, not constant-zero output)
    rows = q.run_spark(spark, sf, "dedup_bloom").collect()
    assert any(r.n_hit > 0 for r in rows), "no bit ever collided"
    assert all(0 <= r.n_hit <= r.n_pos for r in rows)
    # planted membership (true positives) is pinned in
    # test_false_positive_rate_bounded's member check


def test_false_positive_rate_bounded(spark):
    """2000 corpus keys, 1000 disjoint probe keys: measured fpp must sit
    near (1 - e^(-kn/m))^k per bucket (~0.2% at this load) — well under
    2%. A correlated-positions bug (shared multiplier) blows this up to
    the k=1 rate (~20%), so the bound has real teeth."""
    rng = np.random.default_rng(7)
    allk = rng.choice(2**40, size=3000, replace=False)
    corpus, probe = allk[:2000], allk[2000:]
    idx = build_bloom_index(_keys_df(spark, corpus, "key"), "key",
                            k=K, m_bits=M_BITS, n_buckets=NB)
    out = bloom_probe(_keys_df(spark, probe, "key"), idx, "key",
                      k=K, m_bits=M_BITS, n_buckets=NB).collect()
    fpp = sum(r.bloom_maybe for r in out) / len(out)
    assert fpp < 0.02, fpp
    # members: zero false negatives
    mem = bloom_probe(_keys_df(spark, corpus[:500], "key"), idx, "key",
                      k=K, m_bits=M_BITS, n_buckets=NB).collect()
    assert all(r.bloom_maybe == 1 for r in mem)


def test_index_shape_and_missing_bucket(spark):
    idx_df = build_bloom_index(_keys_df(spark, [1, 2, 3], "key"), "key",
                               k=K, m_bits=M_BITS, n_buckets=NB)
    rows = idx_df.collect()
    assert 1 <= len(rows) <= NB
    assert all(len(r.bitmap) == M_BITS // 8 for r in rows)
    assert all(0 <= r.bucket < NB for r in rows)
    # a probe key landing in a bucket with no index row is definitely new
    probe = bloom_probe(_keys_df(spark, range(100), "key"), idx_df,
                        "key", k=K, m_bits=M_BITS, n_buckets=NB)
    missing = probe.filter(~F.col("bucket").isin(
        [r.bucket for r in rows])).collect()
    if missing:  # 100 keys over 8 buckets: expect some
        assert all(r.n_hit == 0 and r.bloom_maybe == 0 for r in missing)
