"""IVF-PQ (product quantization): code validity, quantization
distortion, recall floors with refine monotonicity, determinism across
partitioning, and the zero-shuffle encode plan."""

import os

import numpy as np
import pytest

from loc2vec_spark.operators.ann import train_codebook
from loc2vec_spark.operators.pq import (adc_distance, encode_pq,
                                        ivfpq_search, train_pq,
                                        unpack_codes)

# synthetic views, so the dim is free to choose: 32 halves every
# literal-codebook codegen expression vs the driver tables' 64 (compile
# time dominates this module's cost), with identical semantics
DIM = 32
M, KSUB = 8, 16


def _as_view(spark, X):
    rows = [(int(i), [float(v) for v in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    df.createOrReplaceTempView("embeddings")
    return df


def _clustered(n_clusters=40, per=12, noise=0.05, seed=5):
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(n_clusters, DIM))
    X = (np.repeat(cents, per, axis=0)
         + noise * rng.normal(size=(n_clusters * per, DIM)))
    return X.astype(np.float32)


def _exact_top10(X, qidx):
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    np.fill_diagonal(S, -2)
    return {q: set(np.argsort(-S[q])[:10].tolist()) for q in qidx}


@pytest.fixture(scope="module")
def trained(spark):
    """One shared training run: every PQ/IVF codegen argmin over the
    literal codebooks compiles a ~1000-term expression, so retraining
    per test quintuples the suite cost for zero extra coverage."""
    X = _clustered()
    emb = _as_view(spark, X)
    books = train_pq(emb, dim=DIM, m=M, ksub=KSUB, iters=2)
    cents = train_codebook(emb, dim=DIM, k_cells=16, iters=2)
    return X, emb, books, cents


def test_codes_shape_and_range(spark, trained):
    """pq_code is ONE BIGINT (the physical 8-byte claim lives in the
    schema) whose M unpacked 8-bit sub-codes are all in [0, KSUB)."""
    X, emb, books, _ = trained
    assert len(books) == M and all(len(b) == KSUB for b in books)
    cdf = encode_pq(emb, books, dim=DIM)
    assert dict(cdf.dtypes)["pq_code"] == "bigint"
    codes = {r["vec_id"]: unpack_codes(r["pq_code"], M)
             for r in cdf.collect()}
    assert len(codes) == len(X)
    for c in codes.values():
        assert len(c) == M
        assert all(0 <= v < KSUB for v in c)


def test_quantization_distortion_beats_random_codes(spark, trained):
    """Reconstruction MSE of trained codes must be well below random
    code assignment — i.e. the Lloyd loop actually learned subspace
    structure (FAISS's sanity check for a PQ training run)."""
    X, emb, books, _ = trained
    codes = {r["vec_id"]: unpack_codes(r["pq_code"], M)
             for r in encode_pq(emb, books, dim=DIM).collect()}
    Xn = (X.astype(np.float64)
          / np.linalg.norm(X.astype(np.float64), axis=1, keepdims=True))
    Xn = np.round(Xn, 6)
    book_arr = np.array([[comps for _, comps in sorted(b)]
                         for b in books])  # (M, KSUB, subdim)
    subdim = DIM // M

    def mse(code_of):
        tot = 0.0
        for i in range(len(X)):
            rec = np.concatenate([book_arr[m][code_of(i)[m]]
                                  for m in range(M)])
            tot += ((Xn[i] - rec) ** 2).sum()
        return tot / len(X)

    trained = mse(lambda i: codes[i])
    rng = np.random.default_rng(0)
    rand_codes = rng.integers(0, KSUB, size=(len(X), M))
    random_mse = mse(lambda i: rand_codes[i])
    assert trained < 0.5 * random_mse, (trained, random_mse)
    assert subdim * M == DIM


def test_ivfpq_planted_recall(spark, trained):
    """Planted clusters: IVF-PQ with refine recovers most of the exact
    top-10 from 8-byte codes + a 30-row exact shortlist per query."""
    X, emb, books, cents = trained
    _as_view(spark, X)
    qidx = [i for i in range(len(X)) if i % 25 == 0]
    exact = _exact_top10(X.astype(np.float64), qidx)
    got = {}
    out = ivfpq_search(emb, cents, books, dim=DIM, nprobe=4, refine=30)
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = (sum(len(exact[q] & got.get(q, set())) for q in qidx)
              / (10 * len(qidx)))
    assert recall >= 0.85, recall


def test_ivfpq_deterministic_and_refine_monotone(spark):
    # small independent setup (M=4, 160 rows): determinism needs its
    # own books, not the shared module fixture's
    X = _clustered(20, 8, seed=9)
    emb = _as_view(spark, X)
    cents = train_codebook(emb, dim=DIM, k_cells=4, iters=1)
    books = train_pq(emb, dim=DIM, m=4, ksub=8, iters=1)

    def run(parts, refine=20):
        out = ivfpq_search(emb.repartition(parts), cents, books,
                           dim=DIM, nprobe=2, refine=refine)
        return sorted(map(tuple, out.collect()))

    base = run(2)
    assert base == run(13)

    # a larger refine shortlist can only help recall
    qidx = [i for i in range(len(X)) if i % 25 == 0]
    exact = _exact_top10(X.astype(np.float64), qidx)

    def recall(rows):
        got = {}
        for qid, _, nid, _ in rows:
            got.setdefault(qid, set()).add(nid)
        return (sum(len(exact[q] & got.get(q, set())) for q in qidx)
                / (10 * len(qidx)))

    assert recall(run(2, refine=60)) >= recall(base)


def test_encode_plan_is_rowwise(spark, trained):
    """Encoding must be a pure per-row map: no Exchange, no Join, no
    row-at-a-time Python — exactly ONE Arrow crossing (the numpy argmin
    kernel; the unrolled-literal alternative measurably overflows
    janino's method limit at dim=64 and drops the stage to interpreted
    eval — see the pq.py module docstring)."""
    _, emb, books, _ = trained
    plan = (encode_pq(emb, books, dim=DIM)
            ._jdf.queryExecution().executedPlan().toString())
    for bad in ("Exchange", "Join", "BatchEvalPython"):
        assert bad not in plan, plan
    assert plan.count("ArrowEvalPython") == 1, plan


def test_adc_approximates_exact_distance(spark, trained):
    """ADC distance on codes must correlate with the exact normalized
    L2: for each query, the ADC-nearest candidate set overlaps the
    exact-nearest set far above chance (the property that makes the
    refine shortlist work)."""
    X, emb, books, _ = trained
    from pyspark.sql import functions as F

    from loc2vec_spark.operators.pq import _norm_vec_col
    codes = encode_pq(emb, books, dim=DIM) \
        .select(F.col("vec_id").alias("neighbor_id"), "pq_code")
    q = emb.filter(F.col("vec_id") % 100 == 0) \
        .select(F.col("vec_id").alias("query_id"),
                _norm_vec_col("embedding", DIM).alias("q_nx"))
    out = (q.crossJoin(codes)
           .filter(F.col("query_id") != F.col("neighbor_id"))
           .withColumn("adc", adc_distance(books, "q_nx", "pq_code"))
           .collect())
    Xn = (X.astype(np.float64)
          / np.linalg.norm(X.astype(np.float64), axis=1, keepdims=True))
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(
            (r["adc"], r["neighbor_id"]))
    for qid, pairs in by_q.items():
        adc_top = {n for _, n in sorted(pairs)[:15]}
        d = ((Xn - Xn[qid]) ** 2).sum(axis=1)
        d[qid] = np.inf
        exact_top = set(np.argsort(d)[:15].tolist())
        assert len(adc_top & exact_top) >= 8, (qid, adc_top, exact_top)


def test_packed_byte_extraction_parity(spark, trained):
    """JVM-side code_byte_col (the Lloyd-update grouping key) must agree
    with the numpy unpack for every subspace — including codes whose top
    byte sets the int64 sign bit."""
    from pyspark.sql import functions as F

    from loc2vec_spark.operators.pq import code_byte_col
    _, emb, books, _ = trained
    cdf = encode_pq(emb, books, dim=DIM).select(
        "vec_id", "pq_code",
        *[code_byte_col("pq_code", mm).alias(f"b{mm}") for mm in range(M)])
    for r in cdf.collect():
        assert [r[f"b{mm}"] for mm in range(M)] \
            == unpack_codes(r["pq_code"], M), r
    # synthetic sign-bit case: all-0xFF code
    assert unpack_codes(-1, M) == [255] * M
    neg = spark.range(1).select(
        *[code_byte_col(F.lit(-1).cast("long"), mm).alias(f"b{mm}")
          for mm in range(M)]).collect()[0]
    assert [neg[f"b{mm}"] for mm in range(M)] == [255] * M


def test_ksub256_recall_beats_ksub16(spark):
    """The round-3 fidelity upgrade measured at module scale: with
    8-bit codebooks the ADC shortlist recovers (weakly) more of the
    exact top-10 than the old 4-bit books on the same data, and at
    least 0.85 of it absolutely."""
    X = _clustered(30, 20, noise=0.15, seed=11)   # 600 rows
    emb = _as_view(spark, X)
    cents = train_codebook(emb, dim=DIM, k_cells=8, iters=2)
    qidx = [i for i in range(len(X)) if i % 25 == 0]
    exact = _exact_top10(X.astype(np.float64), qidx)

    def recall(ksub):
        books = train_pq(emb, dim=DIM, m=M, ksub=ksub, iters=2)
        out = ivfpq_search(emb, cents, books, dim=DIM, nprobe=4,
                           refine=30)
        got = {}
        for r in out.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return (sum(len(exact[q] & got.get(q, set())) for q in qidx)
                / (10 * len(qidx)))

    r256 = recall(256)
    r16 = recall(16)
    assert r256 >= r16, (r256, r16)
    assert r256 >= 0.85, r256


def test_index_persistence_roundtrip(spark, trained, tmp_path):
    """write_pq_index/read_pq_index: a search over the LOADED index is
    bit-identical to one over the just-built index (doubles round-trip
    parquet exactly), the index parquet is partitioned by cid (probes
    prune to the probed cells' files), and the build carries lineage
    manifests."""
    import os

    from pyspark.sql import functions as F

    from loc2vec_spark.lineage import done_partitions
    from loc2vec_spark.operators.pq import (build_pq_index,
                                            normalized_frame,
                                            read_pq_index,
                                            write_pq_index)

    X, emb, books, cents = trained
    out = str(tmp_path / "pq_index")
    ne = normalized_frame(emb, DIM)
    index = build_pq_index(emb, cents, books, dim=DIM, ne=ne)
    write_pq_index(spark, out, cents, books, index)

    cents_l, books_l, index_l = read_pq_index(spark, out)
    assert cents_l == [(int(c), [float(x) for x in v]) for c, v in cents]
    assert books_l == [[(int(c), [float(x) for x in v]) for c, v in b]
                       for b in books]

    built = sorted(map(tuple, ivfpq_search(
        emb, cents, books, dim=DIM, nprobe=4, refine=30,
        ne=ne, index=index).collect()))
    loaded = sorted(map(tuple, ivfpq_search(
        emb, cents_l, books_l, dim=DIM, nprobe=4, refine=30,
        ne=ne, index=index_l).collect()))
    assert built == loaded and len(built) > 0
    ne.unpersist()

    # physical layout: hive-partitioned by cid + lineage manifests
    assert any(e.startswith("cid=") for e in os.listdir(f"{out}/index"))
    assert len(done_partitions(f"{out}/index")) \
        == index_l.select("cid").distinct().count()
    # probing 2 cells prunes the scan to those partitions
    plan = index_l.filter(F.col("cid").isin(0, 1)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cid" in plan


def test_run_ann_index_job(spark, tmp_path):
    """jobs/run_ann_index.py end-to-end: build + persist + search the
    persisted index in one spark-submit-shaped invocation."""
    import json
    import sys

    X = _clustered(20, 10, seed=13)    # 200 rows
    emb_dir = str(tmp_path / "emb")
    _as_view(spark, X).write.parquet(emb_dir)
    out = str(tmp_path / "annidx")

    sys.path.insert(0, "/root/repo/jobs")
    import run_ann_index
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        run_ann_index.main([
            "--embeddings", emb_dir, "--out", out, "--dim", str(DIM),
            "--k-cells", "4", "--m", "4", "--ksub", "16",
            "--iters", "1", "--query-mod", "25", "--nprobe", "2",
            "--refine", "20", "--keep-session"])
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert summary["index_rows"] == len(X)
    assert summary["search_rows"] > 0
    got = spark.read.parquet(f"{out}/search")
    assert set(got.columns) == {"query_id", "ann_rank", "neighbor_id",
                                "cosine"}


def test_ksub_cap_raises_not_asserts(spark, trained):
    """r3 review: the 8-bit packing cap must survive python -O — a
    ValueError, not a bare assert (a 9-bit argmin index would silently
    bleed into the adjacent sub-code's byte)."""
    _, emb, _, _ = trained
    with pytest.raises(ValueError, match="ksub"):
        train_pq(emb, dim=DIM, m=M, ksub=512, iters=1)


# ---------------------------------------------------------------------------
# coarse-residual mode (round 4 — FAISS by_residual)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def trained_res(spark, trained):
    """Residual codebooks sharing the module fixture's coarse cents."""
    X, emb, _, cents = trained
    books_res = train_pq(emb, dim=DIM, m=M, ksub=KSUB, iters=2,
                         cents=cents)
    return X, emb, books_res, cents


def test_residual_cuts_distortion_on_clustered(spark, trained,
                                               trained_res):
    """The point of by_residual: on clustered data the residual
    ``nx - centroid[cid]`` is a tighter quantization target than nx
    itself, so mean ADC self-distortion (each row scored against its
    OWN code) drops materially. Measured 43% lower at this fixture;
    asserted at 25% to leave seed margin. (On the uniform-random
    driver fixture the inequality REVERSES — see the pq.py module
    docstring — which is why the bench runs residual=False.)"""
    from pyspark.sql import functions as F

    from loc2vec_spark.operators.pq import (_norm_vec_col,
                                            build_pq_index,
                                            normalized_frame,
                                            residual_col)

    X, emb, books_raw, cents = trained
    _, _, books_res, _ = trained_res
    ne = normalized_frame(emb, DIM)

    def self_distortion(books, residual):
        idx = build_pq_index(emb, cents, books, dim=DIM, ne=ne,
                             residual=residual)
        nx = _norm_vec_col("embedding", DIM, norm_col="nrm")
        j = ne.join(idx, ne.vec_id == idx.neighbor_id).withColumn(
            "q_nx", residual_col(cents, nx, "cid") if residual else nx)
        return j.withColumn("e", adc_distance(books, "q_nx", "pq_code")) \
                .agg(F.avg("e")).collect()[0][0]

    d_raw = self_distortion(books_raw, residual=False)
    d_res = self_distortion(books_res, residual=True)
    ne.unpersist()
    assert d_res < 0.75 * d_raw, (d_res, d_raw)


def test_residual_recall_and_determinism(spark, trained_res):
    """Residual search holds the same planted-cluster recall floor as
    the raw path and stays bit-identical across repartitionings (the
    residual is an elementwise zip_with over a constant-folded map —
    no batch-shape dependence)."""
    X, emb, books_res, cents = trained_res
    qidx = [i for i in range(len(X)) if i % 25 == 0]
    exact = _exact_top10(X.astype(np.float64), qidx)

    out = ivfpq_search(emb, cents, books_res, dim=DIM, nprobe=4,
                       refine=30, residual=True)
    rows = sorted(map(tuple, out.collect()))
    got = {}
    for qid, _, nid, _ in rows:
        got.setdefault(qid, set()).add(nid)
    recall = (sum(len(exact[q] & got.get(q, set())) for q in qidx)
              / (10 * len(qidx)))
    assert recall >= 0.85, recall

    again = sorted(map(tuple, ivfpq_search(
        emb.repartition(13), cents, books_res, dim=DIM, nprobe=4,
        refine=30, residual=True).collect()))
    assert rows == again


def test_residual_persistence_records_mode(spark, trained_res,
                                           tmp_path):
    """A residual index round-trips with its mode recorded: read_pq_meta
    reports residual=True and a search over the loaded index is
    bit-identical to one over the just-built index."""
    from loc2vec_spark.operators.pq import (build_pq_index,
                                            normalized_frame,
                                            read_pq_index, read_pq_meta,
                                            write_pq_index)

    X, emb, books_res, cents = trained_res
    out = str(tmp_path / "pq_index_res")
    ne = normalized_frame(emb, DIM)
    index = build_pq_index(emb, cents, books_res, dim=DIM, ne=ne,
                           residual=True)
    write_pq_index(spark, out, cents, books_res, index, residual=True)

    meta = read_pq_meta(spark, out)
    assert meta["residual"] is True and meta["m"] == M
    cents_l, books_l, index_l = read_pq_index(spark, out)
    built = sorted(map(tuple, ivfpq_search(
        emb, cents, books_res, dim=DIM, nprobe=4, refine=30,
        ne=ne, index=index, residual=True).collect()))
    loaded = sorted(map(tuple, ivfpq_search(
        emb, cents_l, books_l, dim=DIM, nprobe=4, refine=30,
        ne=ne, index=index_l, residual=True).collect()))
    ne.unpersist()
    assert built == loaded and len(built) > 0


def test_read_pq_meta_absent_defaults_corrupt_raises(spark, tmp_path):
    """Absent meta = legacy non-residual index (defaults); a CORRUPT
    meta must re-raise, not silently default — scoring non-residual
    queries against residual codes returns garbage neighbors with no
    error (review r4)."""
    from loc2vec_spark.operators.pq import read_pq_meta

    legacy = str(tmp_path / "legacy_index")
    os.makedirs(legacy)                    # index dir with NO meta table
    assert read_pq_meta(spark, legacy) == {"residual": False, "m": 8}

    broken = str(tmp_path / "broken_index")
    os.makedirs(f"{broken}/meta")
    with open(f"{broken}/meta/part-00000.parquet", "wb") as f:
        f.write(b"not a parquet footer at all")
    with pytest.raises(Exception):
        read_pq_meta(spark, broken)


def test_read_pq_meta_without_jvm_gateway(spark, tmp_path, monkeypatch):
    """Spark Connect has no ``sparkContext._jvm``: the legacy default
    must still come back for an absent meta (classified by the
    AnalysisException error class, not the FS probe), and a present
    meta must still read (review r5)."""
    from unittest import mock

    from loc2vec_spark.operators import pq

    legacy = str(tmp_path / "legacy_index")
    os.makedirs(legacy)
    present = str(tmp_path / "ok_index")
    spark.createDataFrame([(True, 4)], "residual boolean, m int") \
        .write.parquet(f"{present}/meta")

    with mock.patch.object(
            type(spark), "sparkContext",
            property(mock.Mock(side_effect=RuntimeError("no gateway")))):
        assert pq.read_pq_meta(spark, legacy) == \
            {"residual": False, "m": 8}
        assert pq.read_pq_meta(spark, present) == \
            {"residual": True, "m": 4}


def test_clustered_regime_bench_floor(spark):
    """Pins the BENCH/BASELINE.md clustered-regime row (r5): residual
    IVF-PQ with a selective coarse quantizer (one cell per planted
    cluster, nprobe/k = 1/8) must hold high recall while ADC-scanning
    only ~nprobe/k of the corpus — the operating point that survives a
    100-TB scale-up. Reduced-size mirror of bench.bench_ann_clustered
    (same noise, same nprobe/k ratio)."""
    from loc2vec_spark.operators.ann import (ivf_trained_candidates,
                                             train_codebook)
    from loc2vec_spark.operators.pq import (ivfpq_shortlist,
                                            normalized_frame)
    X = _clustered(32, 20, noise=0.08, seed=7)   # 640 rows
    emb = _as_view(spark, X)
    cents = train_codebook(emb, dim=DIM, k_cells=32, iters=3)
    books = train_pq(emb, dim=DIM, m=M, ksub=KSUB, iters=3, cents=cents)
    ne = normalized_frame(emb, DIM)
    qidx = [i for i in range(len(X)) if i % 25 == 0]
    exact = _exact_top10(X.astype(np.float64), qidx)
    got = {}
    for r in ivfpq_search(emb, cents, books, dim=DIM, nprobe=4,
                          refine=30, ne=ne, residual=True).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = (sum(len(exact[q] & got.get(q, set())) for q in qidx)
              / (10 * len(qidx)))
    denom = len(qidx) * (len(X) - 1)
    scan = ivf_trained_candidates(emb, cents, dim=DIM, nprobe=4,
                                  ne=ne).count() / denom
    exact_frac = ivfpq_shortlist(emb, cents, books, dim=DIM, nprobe=4,
                                 refine=30, ne=ne,
                                 residual=True).count() / denom
    ne.unpersist()
    assert recall >= 0.85, recall
    assert scan <= 0.30, scan
    assert exact_frac <= 0.06, exact_frac
