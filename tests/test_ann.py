"""ANN multi-probe LSH: recall floors + candidate-fraction bounds.

Two regimes, matching BENCH/BASELINE.md's "ANN recall" section:
- planted clusters (the real near-duplicate use case): recall ~1 while
  scoring a small fraction of the table;
- uniform-random embeddings (the driver's tables — the no-structure
  worst case for any LSH): a measured, documented floor well above the
  r1 single-table bucket join.
"""

import numpy as np
import pytest

from loc2vec_spark.queries_text import (_ANN_B, _ANN_T, _ann_ivf_fn,
                                        _ann_multi_fn, _dedup_emb_ivf_fn,
                                        ann_ivf_candidates,
                                        ann_multi_candidates)

DIM = 64


def _exact_top10(X, qidx):
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    np.fill_diagonal(S, -2)
    return {q: set(np.argsort(-S[q])[:10].tolist()) for q in qidx}


def _as_view(spark, X):
    rows = [(int(i), [float(v) for v in X[i]]) for i in range(len(X))]
    spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>") \
         .createOrReplaceTempView("embeddings")


def _recall_and_frac(spark, X, fn=_ann_multi_fn,
                     cand_fn=ann_multi_candidates):
    n = len(X)
    qidx = [i for i in range(n) if i % 25 == 0]
    exact = _exact_top10(X.astype(np.float64), qidx)
    _as_view(spark, X)
    got = {}
    for r in fn(spark, None).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact[q] & got.get(q, set())) for q in qidx)
    recall = hits / (10 * len(qidx))
    n_cand = cand_fn(spark).count()
    frac = n_cand / (len(qidx) * (n - 1))
    return recall, frac


def test_planted_clusters_high_recall_low_scan(spark):
    """40 clusters x 12 members (> k=10, so every exact top-10 is
    in-cluster): near-dup structure -> recall ~1 at a bounded scan."""
    rng = np.random.default_rng(5)
    cents = rng.normal(size=(40, DIM))
    X = np.repeat(cents, 12, axis=0) + 0.05 * rng.normal(size=(480, DIM))
    recall, frac = _recall_and_frac(spark, X.astype(np.float32))
    assert recall >= 0.95, recall
    # 256 buckets/table at n=480 keeps buckets dense; still far from full
    assert frac <= 0.35, frac


def test_uniform_random_floor(spark):
    """No-structure worst case: the documented floor (measured ~0.64 on
    the driver's uniform embeddings at sf0.01/sf0.1)."""
    rng = np.random.default_rng(12)
    X = rng.uniform(-0.217, 0.217, size=(500, DIM)).astype(np.float32)
    recall, frac = _recall_and_frac(spark, X)
    assert recall >= 0.45, recall
    # multi-probe must stay far from a full scan
    assert frac <= 0.45, frac


def test_ivf_planted_clusters_high_recall_low_scan(spark):
    """IVF: near-dup clusters align with quantizer cells -> recall ~1
    while probing nprobe cells per query."""
    rng = np.random.default_rng(5)
    cents = rng.normal(size=(40, DIM))
    X = np.repeat(cents, 12, axis=0) + 0.05 * rng.normal(size=(480, DIM))
    recall, frac = _recall_and_frac(spark, X.astype(np.float32),
                                    _ann_ivf_fn, ann_ivf_candidates)
    assert recall >= 0.95, recall
    assert frac <= 0.45, frac


def test_ivf_uniform_random_floor(spark):
    """No-structure worst case: random Voronoi cells from sampled
    centroids carry little signal on uniform data, so IVF's recall here
    (~0.4 at ~0.22 scan) trails multi-probe LSH (~0.64 at ~0.27) — the
    two scale paths split regimes: IVF wins on clustered (real) corpora
    at a small scan (test above), LSH wins on unstructured noise. Both
    numbers are reported side-by-side in BENCH/BASELINE.md."""
    rng = np.random.default_rng(12)
    X = rng.uniform(-0.217, 0.217, size=(500, DIM)).astype(np.float32)
    recall, frac = _recall_and_frac(spark, X, _ann_ivf_fn,
                                    ann_ivf_candidates)
    assert recall >= 0.3, recall
    # still far better than the random-scan baseline (recall ~= frac)
    assert recall >= 1.5 * frac, (recall, frac)
    assert frac <= 0.35, frac


def test_ivf_dedup_subset_and_cluster_recall(spark):
    """IVF-blocked near-dup pairs are a strict subset of the brute-force
    pair set (same threshold + arithmetic), and on planted clusters the
    blocking loses almost nothing — the regime embedding dedup runs in."""
    from loc2vec_spark.operators.similarity import blocked_pairs_cosine
    rng = np.random.default_rng(5)
    cents = rng.normal(size=(40, DIM))
    X = np.repeat(cents, 12, axis=0) + 0.05 * rng.normal(size=(480, DIM))
    _as_view(spark, X.astype(np.float32))
    brute = {(r["id_a"], r["id_b"])
             for r in blocked_pairs_cosine(
                 spark.table("embeddings"), id_col="vec_id",
                 emb_col="embedding", dim=DIM, threshold=0.3).collect()}
    ivf = {(r["id_a"], r["id_b"])
           for r in _dedup_emb_ivf_fn(spark, None).collect()}
    assert ivf <= brute
    assert len(ivf) >= 0.95 * len(brute), (len(ivf), len(brute))


def test_rank_is_dense_and_bounded(spark):
    rng = np.random.default_rng(1)
    X = rng.normal(size=(200, DIM)).astype(np.float32)
    _as_view(spark, X)
    out = _ann_multi_fn(spark, None).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["ann_rank"])
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 10
    assert _ANN_T == 8 and _ANN_B == 8  # params BENCH documents


def _trained_recall_frac(spark, X, k_cells=16, nprobe=4):
    from loc2vec_spark.operators.ann import (ivf_trained,
                                             ivf_trained_candidates,
                                             train_codebook)
    n = len(X)
    qidx = [i for i in range(n) if i % 25 == 0]
    exact = _exact_top10(X.astype(np.float64), qidx)
    _as_view(spark, X)
    emb = spark.table("embeddings")
    cents = train_codebook(emb, dim=DIM, k_cells=k_cells, iters=3)
    got = {}
    for r in ivf_trained(emb, cents, dim=DIM, nprobe=nprobe).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact[q] & got.get(q, set())) for q in qidx)
    recall = hits / (10 * len(qidx))
    frac = ivf_trained_candidates(emb, cents, dim=DIM, nprobe=nprobe) \
        .count() / (len(qidx) * (n - 1))
    return recall, frac


def test_ivf_trained_beats_sampled_on_clusters(spark):
    """The Lloyd-trained codebook should place centroids ON the planted
    clusters, so recall stays ~1 at a scan no larger than the sampled
    quantizer's."""
    rng = np.random.default_rng(5)
    cents = rng.normal(size=(40, DIM))
    X = np.repeat(cents, 12, axis=0) + 0.05 * rng.normal(size=(480, DIM))
    r_t, f_t = _trained_recall_frac(spark, X.astype(np.float32))
    r_s, f_s = _recall_and_frac(spark, X.astype(np.float32), _ann_ivf_fn,
                                ann_ivf_candidates)
    assert r_t >= 0.95, r_t
    assert r_t >= r_s - 0.02, (r_t, r_s)
    assert f_t <= f_s + 0.05, (f_t, f_s)


def test_ivf_trained_deterministic_across_partitioning(spark):
    from loc2vec_spark.operators.ann import train_codebook
    rng = np.random.default_rng(9)
    X = rng.normal(size=(300, DIM)).astype(np.float32)
    _as_view(spark, X)
    emb = spark.table("embeddings")
    a = train_codebook(emb, dim=DIM, k_cells=8, iters=2)
    b = train_codebook(emb.repartition(17), dim=DIM, k_cells=8, iters=2)
    assert a == b  # bit-identical centroids, not allclose


def test_trained_assignment_plan_is_rowwise(spark):
    """Both assignment strategies are per-row maps — no shuffle, no
    join. The unrolled-literal variant stays pure codegen (valid only
    while k x dim is small enough for janino); the production Arrow
    variant adds exactly one Arrow crossing and nothing else, and must
    agree with the unrolled argmin assignment for ALL rows."""
    from loc2vec_spark.operators.ann import _normalized, train_codebook
    from loc2vec_spark.operators.kmeans import (assign_arrow_vec,
                                                assign_rowwise_vec)
    rng = np.random.default_rng(2)
    X = rng.normal(size=(100, DIM)).astype(np.float32)
    _as_view(spark, X)
    emb = spark.table("embeddings")
    cents = train_codebook(emb, dim=DIM, k_cells=4, iters=1)
    ne = _normalized(emb, "vec_id", "embedding", DIM)
    asg = assign_rowwise_vec(ne, cents, "embedding", DIM, norm_col="nrm")
    plan = asg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    assert "EvalPython" not in plan

    arrow = assign_arrow_vec(ne, cents, "embedding", DIM, norm_col="nrm")
    aplan = arrow._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in aplan and "Join" not in aplan
    assert aplan.count("ArrowEvalPython") == 1, aplan
    a = {r["vec_id"]: r["cid"] for r in asg.collect()}
    b = {r["vec_id"]: r["cid"] for r in arrow.collect()}
    assert a == b


def test_ivf_trained_nprobe_dial_monotone(spark):
    """The nprobe knob trades scan for recall monotonically: probing
    more trained cells never reduces recall, and the candidate set
    grows (the BENCH two-operating-point disclosure, pinned here)."""
    from loc2vec_spark.operators.ann import (ivf_trained,
                                             ivf_trained_candidates,
                                             train_codebook)
    rng = np.random.default_rng(12)
    X = rng.uniform(-0.217, 0.217, size=(300, DIM)).astype(np.float32)
    _as_view(spark, X)
    emb = spark.table("embeddings").cache()
    cents = train_codebook(emb, dim=DIM, k_cells=16, iters=1)
    from loc2vec_spark.queries import QUERIES
    brute = {}
    for r in spark.sql(QUERIES["ann_bruteforce"].spark_sql).collect():
        brute.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    stats = {}
    for nprobe in (2, 8):
        approx = ivf_trained(emb, cents, dim=DIM, nprobe=nprobe)
        hit = sum(1 for r in approx.collect()
                  if r["neighbor_id"] in brute.get(r["query_id"], ()))
        want = sum(len(v) for v in brute.values())
        ncand = ivf_trained_candidates(emb, cents, dim=DIM,
                                       nprobe=nprobe).count()
        stats[nprobe] = (hit / want, ncand)
    assert stats[8][0] >= stats[2][0]          # recall monotone
    assert stats[8][1] > stats[2][1]           # scan grows
    assert stats[8][0] >= 0.5, stats           # high end is useful


def test_semdedup_verdicts_exact_on_onehot_groups(spark):
    """SemDeDup policy face: 50 groups of 3 exact copies of distinct
    one-hot vectors. Within-group cosine is exactly 1, cross-group
    exactly 0 (< tau=0.3), and exact copies always share a coarse cell,
    so the verdict is fully determined: the lowest id of each group is
    the kept exemplar, both higher ids drop with max_cos_lower = 1."""
    from loc2vec_spark.queries_text import _semdedup_fn
    n_groups, per = 50, 3
    X = np.zeros((n_groups * per, DIM), dtype=np.float32)
    for g in range(n_groups):
        X[g * per:(g + 1) * per, g] = 1.0
    _as_view(spark, X)
    rows = {r["vec_id"]: r for r in _semdedup_fn(spark, None).collect()}
    assert len(rows) == n_groups * per
    for vid, r in rows.items():
        if vid % per == 0:
            assert r["is_dup"] == 0, vid
            assert r["max_cos_lower"] is None or r["max_cos_lower"] < 0.3
        else:
            assert r["is_dup"] == 1, vid
            assert r["max_cos_lower"] == 1.0
    # exact copies share a cell, so each group shares one cid
    cids = {}
    for vid, r in rows.items():
        cids.setdefault(vid // per, set()).add(r["cid"])
    assert all(len(s) == 1 for s in cids.values())
