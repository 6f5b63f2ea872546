#!/usr/bin/env python
"""Throughput benchmark (driver contract + BASELINE.json metric).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line. The flagship metric (BASELINE.json: "tile-assignment + kNN-triplet
throughput, rows/sec") is measured over a deterministically synthesized
images table of exactly the input_hint shape (FIXTURES.md §1), cached
under .bench_cache/.

Scaling-efficiency evidence (north_rule: N -> 4N executors >= 0.8) comes
from running this same script at two parallelism levels — see
BENCH/run_scaling.py, which writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from loc2vec_spark import queries as qreg  # noqa: E402
from loc2vec_spark.operators import geo, triplets  # noqa: E402
from loc2vec_spark.session import get_spark  # noqa: E402

# oracle-checked queries worth timing at sf0.1 (star-schema + embeddings)
HEADLINE = [
    "tile_assign", "kring_expand", "knn_topk", "negative_farcell",
    "j1_multiway", "a5_histogram", "p6_zscore", "w1_topk", "t1_symdiff",
]

BENCH_RES = 13      # urban disks span ~8 cells at res 13 -> bounded blocks
BENCH_CAP = 16      # per-cell candidate cap (skew control, documented drop)
JOB_CAP = 1024      # jobs/run_mining.py default — the "uncapped" honesty run


def force(df) -> int:
    """Materialize fully (all columns) without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


BENCH_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def timed_warm(df, reps: int | None = None) -> float:
    """Best-of-``reps`` WARM materialization seconds. The first (untimed)
    run pays one-time janino codegen compilation + plan setup; min-of-N
    absorbs shared-host noise (this sandbox shows multi-second jitter),
    which would otherwise swamp the N-vs-4N scaling measurement."""
    force(df)
    reps = reps or BENCH_REPS
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        force(df)
        best = min(best, time.perf_counter() - t0)
    return best


def timed_once(df) -> float:
    """One COLD materialization — for the 50x section, where a single
    run is minutes long and the warm-reps protocol would double a
    15-minute section to correct <1% of JIT/plan-setup time."""
    t0 = time.perf_counter()
    force(df)
    return time.perf_counter() - t0


def _hash_emb(df, dim: int = 8):
    """Deterministic unit-range embedding from the id hash — the kNN
    plan (k-ring explode -> cell equi-join -> fixed-order distance ->
    WindowGroupLimit top-k) is what scale points measure, and it is
    dimension-agnostic; the fixture carries no embedding column."""
    comps = [((F.shiftrightunsigned(F.xxhash64("image_id"), 8 * i)
               .bitwiseAND(F.lit(255))) / F.lit(255.0)).cast("float")
             for i in range(dim)]
    return df.withColumn("emb", F.array(*comps))


def ensure_fixture(n: int) -> str:
    """Deterministic images table (input_hint shape), cached as parquet.

    The cache entry is only valid once fully written: a bench session
    killed mid-write must not leave a partial directory that poisons
    every later run with UNABLE_TO_INFER_SCHEMA. So the fixture is
    built under a ``.tmp`` sibling and atomically renamed into place;
    any leftover ``.tmp`` from a killed run is discarded."""
    out = os.path.join(_REPO, ".bench_cache", f"images_{n}")
    marker = os.path.join(out, "images.parquet")
    if not os.path.exists(marker):
        from loc2vec_spark.fixtures import write_fixtures
        tmp = out + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        write_fixtures(tmp, n_images=n, with_channels=False,
                       bytes_sample_mod=max(1, n // 200))
        shutil.rmtree(out, ignore_errors=True)
        os.rename(tmp, out)
    return marker


def bench_flagship(spark, n_images: int) -> dict:
    """Tile assignment + spatial-triplet generation over the images
    table. Since round 5 the uncapped (job-cap) honesty run is measured
    in EVERY session — including the lite scaling-campaign sessions —
    so its rate carries the same per-round interleaved lo/hi disclosure
    as the flagship metrics instead of riding a single extras session
    (VERDICT r4 item 4: that gap made the r4 cross-session dips
    unattributable by protocol)."""
    path = ensure_fixture(n_images)
    images = spark.read.parquet(path)

    # 1. tile assignment (pure codegen path). The per-row work (regex
    # caption parse + bit math) is tiny, so replicate rows 20x via a
    # broadcast cross join to give the measurement enough compute to
    # resolve parallel speedup above constant overheads.
    repl = 50
    # explicit repartition: small-file open-cost packing collapses the
    # 32 fixture shards into ~2 scan splits; a cluster job would rebalance
    # after a tiny-file scan the same way (the 8 MB shuffle is noise next
    # to the replicated projection work)
    dp = images.sparkSession.sparkContext.defaultParallelism
    wide = images.repartition(2 * dp).crossJoin(F.broadcast(
        images.sparkSession.range(repl).select(F.col("id").alias("_r"))))
    pts_wide = geo.with_cells(geo.with_latlon(wide),
                              resolutions=(5, 7, BENCH_RES))
    t_tile = timed_warm(pts_wide.select("image_id", "_r", "cell_r5",
                                        "cell_r7", f"cell_r{BENCH_RES}"))
    pts = geo.with_cells(geo.with_latlon(images),
                         resolutions=(5, 7, BENCH_RES))

    # 2. triplet candidate table (spatial positive + far-cell negatives).
    # repartition before cache: the packed small-file scan yields 2-4
    # partitions, and everything up to the first shuffle (kring explode +
    # broadcast-join probe + partial agg) inherits that parallelism.
    base = pts.select("image_id", "lat", "lon",
                      F.col(f"cell_r{BENCH_RES}").alias("cell")) \
              .repartition(64).cache()
    base.count()
    trip = triplets.triplet_table_spatial(
        base, id_col="image_id", lat_col="lat", lon_col="lon",
        cell_col="cell", res=BENCH_RES, n_neg=5, cap=BENCH_CAP)
    t_trip = timed_warm(trip)

    # honesty run (VERDICT r1 "wrong" #7): same pipeline at the JOB
    # default cap (jobs/run_mining.py --cap 1024, effectively uncapped at
    # this density) on 1/8 of the rows, so the headline capped number can
    # be compared against an uncapped rate in BASELINE.md. join_salt=32:
    # the fixture concentrates ~80% of rows in 3 urban disks, whose
    # quadratic JOIN OUTPUT lands in ~2 straggler tasks (AQE skew-split
    # keys on shuffle-input bytes and never sees it) — measured 287.5 s
    # unsalted vs 11.2 s at join_salt=32, bit-identical result
    # (test_triplets::test_spatial_positive_identical_across_join_salt).
    # absolute ~50k-row sample (not a fixed fraction): uncapped candidate
    # volume grows quadratically with hot-cell size, so a fraction of a
    # larger fixture (e.g. the 2M-row scaling run) would blow the
    # honesty run up by 100x while measuring nothing new
    mod = max(1, n_images // 50_000)
    base_small = base.filter(F.abs(F.xxhash64("image_id")) % mod == 0) \
                     .cache()
    n_small = base_small.count()
    trip_u = triplets.triplet_table_spatial(
        base_small, id_col="image_id", lat_col="lat", lon_col="lon",
        cell_col="cell", res=BENCH_RES, n_neg=5, cap=JOB_CAP,
        join_salt=32)
    t_trip_u = timed_warm(trip_u, reps=1)
    base_small.unpersist()
    base.unpersist()

    return {
        "tile_assign_fixture_sec": round(t_tile, 3),
        "triplets_fixture_sec": round(t_trip, 3),
        "fixture_rows": n_images,
        "tile_rows_per_sec": round(n_images * repl / t_tile, 1),
        "triplet_rows_per_sec": round(n_images / t_trip, 1),
        "triplet_cap": BENCH_CAP,
        "triplet_jobcap_rows": n_small,
        "triplet_jobcap": JOB_CAP,
        "triplet_jobcap_rows_per_sec": round(n_small / t_trip_u, 1),
    }



def _time_knn(cells_df, dp_mult: int, dp: int) -> float:
    """Warm kNN-top-5 seconds over a prepared (image_id, cell) frame —
    the ONE measurement code path shared by bench_round_rates and both
    halves of bench_scale_point (review r5: three near-verbatim copies
    could silently diverge)."""
    k = _hash_emb(cells_df).repartition(dp_mult * dp).cache()
    k.count()
    t = timed_warm(triplets.knn_topk(
        k, id_col="image_id", emb_col="emb", cell_col="cell",
        res=BENCH_RES, dim=8, k=5, cap=BENCH_CAP), reps=1)
    k.unpersist()
    return t


def _neardup_corpus(spark, docs, repl: int, dp: int):
    """Replicated near-dup corpus: repl copies per doc, replicas
    near-dup via a tiny suffix, ids strided by repl (no collisions).
    Cached; caller must unpersist and restore the documents view."""
    return docs.crossJoin(F.broadcast(
        spark.range(repl).select(F.col("id").alias("_r")))) \
        .withColumn("doc_id", F.col("doc_id") * repl + F.col("_r")) \
        .withColumn("text", F.when(F.col("_r") == 0, F.col("text"))
                    .otherwise(F.concat_ws(" ", F.col("text"),
                                           F.concat(F.lit("rep"),
                                                    F.col("_r"))))) \
        .drop("_r").repartition(dp).cache()


def bench_round_rates(spark, n_images: int, sf_dir: str) -> dict:
    """Per-session kNN + MinHash-LSH-dedup rates (VERDICT r4 item 4).

    Measured in EVERY bench session — lite scaling-campaign rounds
    included — so these two join the flagship metrics in the
    interleaved lo/hi disclosure and a cross-session dip can be
    attributed (engine vs co-tenant) by protocol. Same measurement
    code path as the 1x halves of bench_scale_point (which re-measures
    them same-session for the 10x per-row comparison)."""
    dp = spark.sparkContext.defaultParallelism
    img1 = spark.read.parquet(ensure_fixture(n_images))
    pts1 = geo.with_cells(geo.with_latlon(img1),
                          resolutions=(BENCH_RES,))
    t_knn = _time_knn(pts1.select(
        "image_id", F.col(f"cell_r{BENCH_RES}").alias("cell")), 2, dp)

    # LSH-dedup on a near-dup-replicated corpus, NOT the raw 5k-doc
    # table: the 1x job finishes in well under a second at local[16],
    # so its "rate" is fixed scheduling overhead and an efficiency
    # computed from it measures nothing (round-1 campaign measured 0.39
    # and the job profile showed it overhead-bound). Same replication
    # construction as bench_scale_point's 10x half (bounded intra-group
    # pairs). SPARK_GRAFT_BENCH_LSH_REPL (default 10 = the ~50k-doc
    # corpus the per-round driver artifacts have carried since r4)
    # scales the corpus for scaling-campaign sessions, where even 50k
    # docs is a sub-second job at local[16] and the efficiency would
    # again measure overhead (r5 supplemental campaign runs 50x); the
    # emitted dedup_lsh10_rows field always discloses the actual size.
    from loc2vec_spark.queries_text import lsh_pairs_df
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    repl = int(os.environ.get("SPARK_GRAFT_BENCH_LSH_REPL", "10"))
    big = _neardup_corpus(spark, docs, repl, dp)
    n_big = big.count()
    big.createOrReplaceTempView("documents")
    t_lsh = timed_warm(lsh_pairs_df(spark), reps=1)
    big.unpersist()
    docs.createOrReplaceTempView("documents")
    spark.catalog.clearCache()
    return {
        "knn_rows_per_sec": round(n_images / t_knn, 1),
        "dedup_lsh10_rows": n_big,
        "dedup_lsh10_rows_per_sec": round(n_big / t_lsh, 1),
    }


def bench_ann_recall(spark, sf_dir: str) -> dict:
    """recall@10 + candidate fraction of ann_lsh_multiprobe vs the exact
    ann_bruteforce top-10 on the driver's (uniform-random — worst-case)
    embeddings; see queries_text.py's ANN note and test_ann for the
    planted-cluster regime."""
    from loc2vec_spark.queries_text import (ann_ivf_candidates,
                                            ann_multi_candidates)
    brute = qreg.run_spark(spark, sf_dir, "ann_bruteforce") \
                .select("query_id", "neighbor_id").cache()
    n_want = brute.count()
    n_q = brute.select("query_id").distinct().count()
    n_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    denom_cand = n_q * (n_emb - 1)
    out = {}
    for key, qname, cand_fn in (
            ("ann", "ann_lsh_multiprobe", ann_multi_candidates),
            ("ann_ivf", "ann_ivf", ann_ivf_candidates)):
        approx = qreg.run_spark(spark, sf_dir, qname) \
                     .select("query_id", "neighbor_id")
        n_hit = brute.join(approx, ["query_id", "neighbor_id"]).count()
        out[f"{key}_recall_at10"] = round(n_hit / n_want, 3)
        out[f"{key}_candidate_frac"] = round(
            cand_fn(spark).count() / denom_cand, 3)

    # trained-codebook IVF (operators/ann.py): the production swap of
    # ann_ivf's sampled quantizer — reported on the same harness, at
    # TWO nprobe operating points so the recall/cost knob is measured,
    # not asserted (nprobe=4 is the operator default; nprobe=8 probes
    # half the 16 trained cells — the high-recall end of the dial)
    from loc2vec_spark.operators.ann import (ivf_trained,
                                             ivf_trained_candidates,
                                             train_codebook)
    from loc2vec_spark.operators.pq import normalized_frame
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = train_codebook(emb, dim=64, k_cells=16, iters=3)
    # ONE cached (id, emb, nrm) frame shared by every trained-IVF and
    # IVF-PQ stage below, unpersisted at the end (r2 advice: ne=None
    # re-built + re-cached the base frame once per call and leaked all
    # of them for the session)
    ne = normalized_frame(emb, 64)
    for nprobe, tag in ((4, "ann_ivf_trained"),
                        (8, "ann_ivf_trained_np8")):
        approx_t = ivf_trained(emb, cents, dim=64, nprobe=nprobe,
                               ne=ne).select("query_id", "neighbor_id")
        n_hit_t = brute.join(approx_t, ["query_id", "neighbor_id"]).count()
        out[f"{tag}_recall_at10"] = round(n_hit_t / n_want, 3)
        out[f"{tag}_candidate_frac"] = round(
            ivf_trained_candidates(emb, cents, dim=64, nprobe=nprobe,
                                   ne=ne).count() / denom_cand, 3)
    # IVF-PQ (operators/pq.py): same coarse codebook, candidates scored
    # from packed 8-byte codes (ADC, ksub=256 sub-codebooks), exact
    # vectors touched only for the top-refine shortlist — report recall
    # plus the exact-contact fraction (the quantity PQ exists to
    # shrink; candidate frac equals the trained-IVF number at the same
    # nprobe)
    from loc2vec_spark.operators.pq import (ivfpq_search,
                                            ivfpq_shortlist, train_pq)
    books = train_pq(emb, dim=64, m=8, ksub=256, iters=5)
    # operating point (r4): nprobe=10, refine=80, iters=5 measured
    # 0.805 recall @ 0.040 exact contact on the uniform-random
    # (worst-case) embeddings — past the r3 verdict bar (>=0.75 at
    # <=5%). The binding constraint is CELL-MISS, not ADC fidelity
    # (trained-IVF exact re-rank caps at 0.876 @ nprobe=10): residual
    # encoding was measured and on UNIFORM data it inflates the
    # quantization target (unit centroids nearly orthogonal to unit
    # points -> ||x - c||^2 ~ 1.6 > 1) and LOWERS recall (0.554 vs
    # 0.670 at np8/refine50); on clustered data it cuts ADC distortion
    # 43% (test_pq) — so residual=True is the real-data default and
    # the uniform bench runs residual=False, by measurement.
    nprobe, refine = 10, 80
    approx_pq = ivfpq_search(emb, cents, books, dim=64, nprobe=nprobe,
                             refine=refine, ne=ne) \
        .select("query_id", "neighbor_id")
    n_hit_pq = brute.join(approx_pq, ["query_id", "neighbor_id"]).count()
    out["ann_ivfpq_np10_recall_at10"] = round(n_hit_pq / n_want, 3)
    # ADC-scanned candidate fraction AT THIS nprobe — the IVF candidate
    # set PQ scores from codes (review r4: the report table used to
    # pair np10 recall with the np8 fraction, understating scan cost)
    out["ann_ivfpq_np10_candidate_frac"] = round(
        ivf_trained_candidates(emb, cents, dim=64, nprobe=nprobe,
                               ne=ne).count() / denom_cand, 3)
    # MEASURED exact-vector contact (cells can hold < refine candidates,
    # so the analytic refine * |Q| would overstate it)
    n_exact = ivfpq_shortlist(emb, cents, books, dim=64, nprobe=nprobe,
                              refine=refine, ne=ne).count()
    out["ann_ivfpq_exact_frac"] = round(n_exact / denom_cand, 3)
    ne.unpersist()
    brute.unpersist()
    return out


def bench_ann_clustered(spark) -> dict:
    """IVF-PQ in the planted-cluster regime (VERDICT r4 item 5).

    The uniform-random row above is the no-structure WORST case: cells
    are unselective (62.5% of codes ADC-scanned at nprobe=10/16) and
    residual encoding hurts. Real embeddings cluster; this row measures
    the real-data default (residual=True) on deterministic planted
    clusters (64 clusters x 100 points, dim 64, noise 0.08) with a
    64-cell coarse quantizer at nprobe=8 — cells are now selective, so
    the ADC scan touches ~nprobe/64 of the corpus and the scan
    fraction is the quantity that survives a 100-TB scale-up. Ground
    truth is the driver-side exact top-10 (6400x6400 gram matrix —
    bench-only, never a data-sized collect)."""
    import numpy as np

    from loc2vec_spark.operators.ann import (ivf_trained_candidates,
                                             train_codebook)
    from loc2vec_spark.operators.pq import (ivfpq_search, ivfpq_shortlist,
                                            normalized_frame, train_pq)
    rng = np.random.default_rng(7)
    n_clusters, per, dim = 64, 100, 64
    C = rng.normal(size=(n_clusters, dim))
    X = (np.repeat(C, per, axis=0)
         + 0.08 * rng.normal(size=(n_clusters * per, dim))
         ).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(len(X))],
        "vec_id BIGINT, embedding ARRAY<FLOAT>")
    qidx = list(range(0, len(X), 25))
    Xn = X.astype(np.float64)
    Xn /= np.linalg.norm(Xn, axis=1, keepdims=True)
    S = Xn @ Xn.T
    np.fill_diagonal(S, -2)
    exact = {q: set(np.argsort(-S[q])[:10].tolist()) for q in qidx}

    cents = train_codebook(emb, dim=dim, k_cells=n_clusters, iters=3)
    books = train_pq(emb, dim=dim, m=8, ksub=256, iters=4, cents=cents)
    ne = normalized_frame(emb, dim)
    nprobe, refine = 8, 80
    got: dict[int, set] = {}
    for r in ivfpq_search(emb, cents, books, dim=dim, nprobe=nprobe,
                          refine=refine, ne=ne, residual=True).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = (sum(len(exact[q] & got.get(q, set())) for q in qidx)
              / (10 * len(qidx)))
    denom = len(qidx) * (len(X) - 1)
    n_scan = ivf_trained_candidates(emb, cents, dim=dim, nprobe=nprobe,
                                    ne=ne).count()
    n_exact = ivfpq_shortlist(emb, cents, books, dim=dim, nprobe=nprobe,
                              refine=refine, ne=ne,
                              residual=True).count()
    ne.unpersist()
    return {
        "ann_ivfpq_clustered_recall_at10": round(recall, 3),
        "ann_ivfpq_clustered_scan_frac": round(n_scan / denom, 3),
        "ann_ivfpq_clustered_exact_frac": round(n_exact / denom, 3),
        "ann_ivfpq_clustered_nprobe": nprobe,
    }


def bench_geo_rates(spark, sf_dir: str) -> dict:
    """Scale points for the round-5 geo/trajectory operators (grid
    DBSCAN, DWITHIN radius join, stay-point dwell detection, co-dwell
    pairs, spike filter, grid resample, map matching, Hausdorff
    similarity) at 1x and at a replicated input in the same session.

    Replication offsets vec_id/user_id, which re-hashes every replica
    to NEW positions and NEW users — but on the SAME bounded position
    plane, so the replicated point is a DENSITY STRESS (Nx rows in the
    same geography — the analog of the flagship's "10x rows in the
    SAME 3 disks" row), NOT the constant-density growth model. Two
    metric families follow:

    - constant-work-per-row faces (dbscan, stay, spike, resample,
      mapmatch, segx, idw): rows/sec must hold within ~2x per-row at
      10x — and the bounded plane is the HARD direction for them
      (denser cells, never emptier ones). idw's per-query stencil
      candidate count grows with density, but so does the input row
      count it is normalized by, so flat rows/sec is still the right
      bar; segx is a per-edge broadcast probe, linear by plan shape.
    - pair-forming faces (dwithin, coloc, hausdorff): output-pair
      volume necessarily grows ~density^2 (measured: dwithin 12,425
      -> 1,219,227 pairs at 10x; hausdorff candidates 439k -> 43.9M),
      so rows/sec under stress measures workload growth, not the
      engine. These faces also report pairs/sec — output pairs per
      timed second, the workload-normalized rate that must hold.
      hausdorff's stress point runs at 3x replication (~9x candidate
      volume): its 10x point is ~44M grouped-min candidates = ~350
      timed seconds under this one-execution protocol, out of the
      per-session bench budget (measured per-candidate throughput
      stays flat, 137k/s at 1x vs 127k/s at 10x, in the one-off probe
      that set this policy)."""
    out = {}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_emb, n_ev = emb.count(), ev.count()

    def run_face(qname: str):
        q = qreg.QUERIES[qname]
        return q.fn(spark, sf_dir) if q.fn is not None \
            else spark.sql(q.spark_sql)

    _OPS = (("dbscan_cells", "dbscan", "emb"),
            ("dwithin_join", "dwithin", "emb"),
            ("stay_points", "stay", "ev"),
            ("colocation_pairs", "coloc", "ev"),
            ("traj_spike_filter", "spike", "ev"),
            ("traj_resample", "resample", "ev"),
            ("map_match", "mapmatch", "emb"),
            ("segment_intersections", "segx", "ev"),
            ("idw_interpolate", "idw", "emb"),
            ("hausdorff_pairs", "hausdorff", "ev"))
    _PAIR_OPS = {"dwithin", "coloc", "hausdorff"}

    def measure(tag: str, rows: dict[str, int], skip=()):
        for qname, key, base_key in _OPS:
            if key in skip:
                continue
            df = run_face(qname)
            if key in _PAIR_OPS:
                # count IS the timed action for the pair-forming
                # faces: it executes the identical filtered-join plan
                # (only the final projection is elided) and yields the
                # output-pair count from the SAME run — no second full
                # execution of a minutes-long stress query. The cheap
                # points keep the warm protocol (untimed first run
                # pays janino/plan setup); the hausdorff stress run
                # stays cold like the other minutes-long sections.
                if not (key == "hausdorff" and tag != "geo1"):
                    df.count()   # warm the EXACT timed plan (count)
                t0 = time.perf_counter()
                n_out = df.count()
                t = time.perf_counter() - t0
                out[f"{tag}_{key}_pairs_per_sec"] = round(n_out / t, 1)
            else:
                t = timed_warm(df, reps=1)
            out[f"{tag}_{key}_rows_per_sec"] = round(rows[base_key] / t, 1)
            spark.catalog.clearCache()  # dbscan/coloc interior caches

    emb.createOrReplaceTempView("embeddings")
    ev.createOrReplaceTempView("events")
    # map_match's road-segment side (25 rows, broadcast; constant
    # across the 1x/10x points — the road network doesn't grow with
    # the point table)
    spark.read.parquet(f"{sf_dir}/nation.parquet") \
        .createOrReplaceTempView("nation")
    measure("geo1", {"emb": n_emb, "ev": n_ev})

    dp = spark.sparkContext.defaultParallelism
    uid_stride = 1 + (ev.agg(F.max("user_id")).first()[0] or 0)

    def replicate(n: int):
        rep = spark.range(n).select(F.col("id").alias("_r"))
        e10 = (emb.crossJoin(F.broadcast(rep))
               .withColumn("vec_id", F.col("vec_id") + F.col("_r") * n_emb)
               .drop("_r").repartition(2 * dp))
        v10 = (ev.crossJoin(F.broadcast(rep))
               .withColumn("user_id", F.col("user_id")
                           + F.col("_r") * uid_stride)
               .withColumn("event_id",
                           F.col("event_id") * n + F.col("_r"))
               .drop("_r").repartition(2 * dp))
        e10.createOrReplaceTempView("embeddings")
        v10.createOrReplaceTempView("events")

    replicate(10)
    measure("geo10", {"emb": n_emb * 10, "ev": n_ev * 10},
            skip=("hausdorff",))
    replicate(3)
    measure("geo3", {"emb": n_emb * 3, "ev": n_ev * 3},
            skip=tuple(k for _, k, _ in _OPS if k != "hausdorff"))

    # restore the 1x views for the sections after this one
    emb.createOrReplaceTempView("embeddings")
    ev.createOrReplaceTempView("events")
    spark.catalog.clearCache()
    return out


def bench_scale_point(spark, n_images: int, sf_dir: str) -> dict:
    """10x scale point (r2 verdict item 6): the flagship tile + triplet
    pipelines on a 10x fixture, and MinHash-LSH dedup on a 10x
    documents corpus, all in THIS session — evidence that the
    pruning/salting/bucketing story holds at 10x local scale (per-row
    throughput should sit within ~2x of the sf0.1/400k numbers).

    The 10x corpus is the original 5k documents replicated 10 ways with
    a per-replica suffix token: replicas are NEAR-duplicates, so the
    LSH path does the heavy-duplication work a real crawl re-ingest
    does (bounded: <= C(10,2) intra-group pairs per original, linear in
    corpus size — not an all-pairs blowup)."""
    out = {}
    n10 = 10 * n_images
    path = ensure_fixture(n10)
    images = spark.read.parquet(path)
    dp = spark.sparkContext.defaultParallelism

    repl = 50
    wide = images.repartition(2 * dp).crossJoin(F.broadcast(
        spark.range(repl).select(F.col("id").alias("_r"))))
    pw = geo.with_cells(geo.with_latlon(wide),
                        resolutions=(5, 7, BENCH_RES))
    t_tile = timed_warm(pw.select("image_id", "_r", "cell_r5", "cell_r7",
                                  f"cell_r{BENCH_RES}"), reps=1)
    out["scale10_fixture_rows"] = n10
    out["scale10_tile_rows_per_sec"] = round(n10 * repl / t_tile, 1)

    # triplets, constant-density 10x (the honest 100-TB model: a bigger
    # corpus is MORE geography at the same urban density, not 10x the
    # rows inside the same three city disks): replicate the 1x fixture
    # 10 ways with each replica's longitudes shifted 15 degrees (wrap at
    # the antimeridian) — 30 disjoint city disks, same per-cell density
    img1 = spark.read.parquet(ensure_fixture(n_images))
    pts1 = geo.with_latlon(img1)
    rep = spark.range(10).select(F.col("id").alias("_r"))
    shifted = pts1.crossJoin(F.broadcast(rep)) \
        .withColumn("image_id",
                    F.concat_ws("#", "image_id",
                                F.col("_r").cast("string"))) \
        .withColumn("lon", ((F.col("lon") + F.col("_r") * 15.0 + 180.0)
                            % 360.0) - 180.0) \
        .drop("_r")
    basec = geo.with_cells(shifted, resolutions=(BENCH_RES,),
                           lat_col="lat", lon_col="lon") \
        .select("image_id", "lat", "lon",
                F.col(f"cell_r{BENCH_RES}").alias("cell")) \
        .repartition(4 * dp).cache()
    basec.count()
    tripc = triplets.triplet_table_spatial(
        basec, id_col="image_id", lat_col="lat", lon_col="lon",
        cell_col="cell", res=BENCH_RES, n_neg=5, cap=BENCH_CAP)
    t_tripc = timed_warm(tripc, reps=1)
    basec.unpersist()
    out["scale10_triplet_rows_per_sec"] = round(n10 / t_tripc, 1)

    # triplets, density-stress 10x (10x rows in the SAME three disks —
    # per-cell pair volume grows ~100x before the cap; reported so the
    # density knob is measured, not hidden behind the constant-density
    # number)
    pts = geo.with_cells(geo.with_latlon(images),
                         resolutions=(BENCH_RES,))
    base = pts.select("image_id", "lat", "lon",
                      F.col(f"cell_r{BENCH_RES}").alias("cell")) \
              .repartition(4 * dp).cache()
    base.count()
    trip = triplets.triplet_table_spatial(
        base, id_col="image_id", lat_col="lat", lon_col="lon",
        cell_col="cell", res=BENCH_RES, n_neg=5, cap=BENCH_CAP)
    t_trip = timed_warm(trip, reps=1)
    base.unpersist()
    out["scale10dense_triplet_rows_per_sec"] = round(n10 / t_trip, 1)

    # cell-blocked kNN (J5, the flagship's other half): same 1x vs
    # constant-density-10x protocol, id-hash embedding (_hash_emb)
    t_knn1 = _time_knn(geo.with_cells(pts1, resolutions=(BENCH_RES,))
                       .select("image_id",
                               F.col(f"cell_r{BENCH_RES}").alias("cell")),
                       2, dp)
    # scale1_*, NOT knn_rows_per_sec: main() merges this dict after
    # bench_round_rates' and the shared name silently shadowed the
    # per-round-rates measurement in full sessions (review r5); the
    # scale tables pair this 1x value with the same-session 10x/50x
    out["scale1_knn_rows_per_sec"] = round(n_images / t_knn1, 1)
    t_knn10 = _time_knn(geo.with_cells(shifted, resolutions=(BENCH_RES,),
                                       lat_col="lat", lon_col="lon")
                        .select("image_id",
                                F.col(f"cell_r{BENCH_RES}").alias("cell")),
                        4, dp)
    out["scale10_knn_rows_per_sec"] = round(n10 / t_knn10, 1)

    # dedup_minhash_lsh: 1x baseline and 10x, same session (the 1x
    # number also reconciles against full_suite timings)
    from loc2vec_spark.queries_text import lsh_pairs_df
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("documents")
    n1 = docs.count()
    t1 = timed_warm(lsh_pairs_df(spark), reps=1)
    big = _neardup_corpus(spark, docs, 10, dp)
    n_big = big.count()
    big.createOrReplaceTempView("documents")
    t10 = timed_warm(lsh_pairs_df(spark), reps=1)
    out["dedup_lsh_rows_per_sec"] = round(n1 / t1, 1)
    out["scale10_dedup_lsh_rows"] = n_big
    out["scale10_dedup_lsh_rows_per_sec"] = round(n_big / t10, 1)
    big.unpersist()
    # restore the real view + drop the shingle/signature caches built
    # over the replicated corpus (they are keyed by plan and would
    # otherwise live for the session)
    docs.createOrReplaceTempView("documents")
    spark.catalog.clearCache()
    return out


def bench_scale50(spark, n_images: int, sf_dir: str) -> dict:
    """50x scale point (r3 verdict item 3): flagship tile + triplets,
    cell-blocked kNN, and MinHash-LSH dedup at sf1.0-equivalent volume
    (20M-row fixture / 500k-doc corpus) in THIS session, one decade past
    the 10x point — the open question it answers is memory behavior of
    the band join + WindowGroupLimit at ~50x the round-3 volume.

    Protocol deltas from the 10x section, each deliberate:

    - constant density via a 10-lon x 5-lat shift grid: 50 replicas of
      the 1x fixture, lon shifted (r%10)*15 deg (wrapped), lat shifted
      (r DIV 10 - 2)*6 deg -> 150 disjoint city disks (min separation
      1.13 deg lon / 6 deg lat >> the 0.1 deg disk diameter; lat stays
      within [-72, 72]). Same per-cell density as 1x — the honest
      100-TB model, as in the 10x constant-density path.
    - single COLD runs (timed_once) for the geometric pipelines: each
      run is minutes long, and by this point the session has executed
      the identical plan shapes at 1x and 10x, so janino/JIT setup —
      what the warm protocol exists to exclude — is already paid.
      LSH keeps timed_warm(reps=1) for protocol parity with the 10x
      number it is compared against (the untimed run materializes the
      shingle/signature caches there too).
    - corpus duplication factor HELD AT 10 while the corpus grows
      100x: replicas are grouped 10-per-group and each group's text is
      passed through a distinct 10-letter rotation (translate on
      'etaoinshrd' scrambles nearly every word-3-gram shingle), so
      groups never collide in LSH bands and candidate pairs grow
      LINEARLY (measured: 5.78 pairs/row, 0 cross-group collisions —
      the 10x section's density regime).
      Naive 100-way suffix replication would make every replica a
      near-dup of every other (C(100,2) pairs per original) and
      measure a quadratic blowup the 100-TB design never sees.
    - cap/salt knobs UNCHANGED from 1x/10x (cap=16, no join_salt on
      the capped path) — the per-row comparison is like-for-like.
    """
    out = {}
    n50 = 50 * n_images
    dp = spark.sparkContext.defaultParallelism
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    # data-sized shuffle partitions: the capped triplet join moves
    # ~50x the round-3 bytes; 64 partitions would hold ~0.5 GB each
    # post-explode and spill. AQE coalesces the small ones back.
    spark.conf.set("spark.sql.shuffle.partitions", str(8 * dp))

    img1 = spark.read.parquet(ensure_fixture(n_images))

    # tile assignment: same crossJoin-replication protocol as 1x/10x
    # (identical per-row work: caption regex parse + cell bit math);
    # multiplier 500 = 50 (scale) x 10 (repl — 10 not 50: 2e8 projected
    # rows already dwarf constant overheads ~1000x, and the metric is
    # per-row)
    repl = 10
    wide = img1.repartition(2 * dp).crossJoin(F.broadcast(
        spark.range(50 * repl).select(F.col("id").alias("_r"))))
    pw = geo.with_cells(geo.with_latlon(wide),
                        resolutions=(5, 7, BENCH_RES))
    t_tile = timed_once(pw.select("image_id", "_r", "cell_r5", "cell_r7",
                                  f"cell_r{BENCH_RES}"))
    out["scale50_fixture_rows"] = n50
    out["scale50_tile_rows_per_sec"] = round(n50 * repl / t_tile, 1)

    # 20M distinct points on the shift grid (lat/lon jitter applied
    # BEFORE the shift, as in the 10x path)
    pts1 = geo.with_latlon(img1)
    rep = spark.range(50).select(F.col("id").alias("_r"))
    shifted = pts1.crossJoin(F.broadcast(rep)) \
        .withColumn("image_id",
                    F.concat_ws("#", "image_id",
                                F.col("_r").cast("string"))) \
        .withColumn("lon", ((F.col("lon") + (F.col("_r") % 10) * 15.0
                             + 180.0) % 360.0) - 180.0) \
        .withColumn("lat", F.col("lat")
                    + (F.expr("_r DIV 10") - 2) * 6.0) \
        .drop("_r")

    basec = geo.with_cells(shifted, resolutions=(BENCH_RES,),
                           lat_col="lat", lon_col="lon") \
        .select("image_id", "lat", "lon",
                F.col(f"cell_r{BENCH_RES}").alias("cell")) \
        .repartition(8 * dp).cache()
    basec.count()
    tripc = triplets.triplet_table_spatial(
        basec, id_col="image_id", lat_col="lat", lon_col="lon",
        cell_col="cell", res=BENCH_RES, n_neg=5, cap=BENCH_CAP)
    t_trip = timed_once(tripc)
    out["scale50_triplet_rows_per_sec"] = round(n50 / t_trip, 1)

    # cell-blocked kNN over the same 20M points (id-hash embedding,
    # as at 1x/10x)
    k50 = _hash_emb(basec.select("image_id", "cell"))
    t_knn = timed_once(triplets.knn_topk(
        k50, id_col="image_id", emb_col="emb", cell_col="cell",
        res=BENCH_RES, dim=8, k=5, cap=BENCH_CAP))
    basec.unpersist()
    out["scale50_knn_rows_per_sec"] = round(n50 / t_knn, 1)

    # MinHash-LSH dedup, 500k docs at duplication factor 10
    from loc2vec_spark.queries_text import lsh_pairs_df
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rot = "etaoinshrd"  # 10 distinct letters, 10 distinct rotations
    trans = F.when(F.expr("_r DIV 10") == 0, F.col("text"))
    for g in range(1, 10):
        trans = trans.when(F.expr("_r DIV 10") == g,
                           F.translate(F.col("text"), rot,
                                       rot[g:] + rot[:g]))
    big = docs.crossJoin(F.broadcast(
        spark.range(100).select(F.col("id").alias("_r")))) \
        .withColumn("doc_id", F.col("doc_id") * 100 + F.col("_r")) \
        .withColumn("text",
                    F.when(F.col("_r") % 10 == 0, trans)
                    .otherwise(F.concat(trans, F.lit(" rep"),
                                        (F.col("_r") % 10)
                                        .cast("string")))) \
        .drop("_r").repartition(2 * dp).cache()
    n_big = big.count()
    big.createOrReplaceTempView("documents")
    t_lsh = timed_warm(lsh_pairs_df(spark), reps=1)
    out["scale50_dedup_lsh_rows"] = n_big
    out["scale50_dedup_lsh_rows_per_sec"] = round(n_big / t_lsh, 1)
    big.unpersist()
    docs.createOrReplaceTempView("documents")
    spark.catalog.clearCache()
    spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_images = int(os.environ.get("SPARK_GRAFT_BENCH_N", "400000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) \
        if "sf" in sf_dir else -1.0

    # shuffle partitions sized to DATA, not just cores: the triplet join
    # shuffles ~10^8 pair-rows at N=400k, and 2x4 partitions at local[4]
    # spills (measured: 8x slowdown). 64 keeps partitions memory-resident
    # at every parallelism level; AQE coalesces the small ones.
    spark = get_spark(master=f"local[{cpus}]", app_name="loc2vec_bench",
                      shuffle_partitions=max(64, 2 * cpus))
    # warmup: JIT + parquet footer caches
    qreg.run_spark(spark, sf_dir, "a1_counts").count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        times[name] = round(timed_warm(qreg.run_spark(spark, sf_dir, name)),
                            3)

    # LITE mode (BENCH/run_scaling.py): scaling-campaign sessions carry
    # the flagship + per-round rates (tile/triplet/jobcap/kNN/LSH) but
    # skip the ANN-recall and full-suite breadth extras, which would
    # just stretch each timed session without adding a scaling signal
    lite = os.environ.get("SPARK_GRAFT_BENCH_LITE") == "1"

    flag = bench_flagship(spark, n_images)
    times["tile_assign_fixture"] = flag["tile_assign_fixture_sec"]
    times["triplets_fixture"] = flag["triplets_fixture_sec"]
    # kNN + LSH-dedup ride every session (campaign disclosure, r5)
    rates = bench_round_rates(spark, n_images, sf_dir)
    geo_rates = {} if lite else bench_geo_rates(spark, sf_dir)
    ann = {} if lite else bench_ann_recall(spark, sf_dir)
    if not lite:
        ann.update(bench_ann_clustered(spark))

    # breadth: single warm pass over the non-headline registry (dedup/
    # ANN/text/windows/...) — coarse but tracks regressions per round
    suite_names = [] if lite else \
        [n for n in qreg.QUERIES if n not in HEADLINE]
    suite_t0 = time.perf_counter()
    for name in suite_names:
        force(qreg.run_spark(spark, sf_dir, name))
    suite_sec = round(time.perf_counter() - suite_t0, 3)

    # scale points LAST (each clears the session cache on exit); the
    # 50x section can be skipped for quick local iteration with
    # SPARK_GRAFT_BENCH_SCALE50=0 (driver runs keep it on)
    scale = {} if lite else bench_scale_point(spark, n_images, sf_dir)
    if not lite and os.environ.get("SPARK_GRAFT_BENCH_SCALE50", "1") == "1":
        scale.update(bench_scale50(spark, n_images, sf_dir))

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": cpus,
        "fixture_rows": flag["fixture_rows"],
        "tile_rows_per_sec": flag["tile_rows_per_sec"],
        "triplet_rows_per_sec": flag["triplet_rows_per_sec"],
        "triplet_cap": flag["triplet_cap"],
        "triplet_jobcap": flag["triplet_jobcap"],
        "triplet_jobcap_rows": flag["triplet_jobcap_rows"],
        "triplet_jobcap_rows_per_sec": flag["triplet_jobcap_rows_per_sec"],
        **rates,
        **geo_rates,
        **ann,
        "full_suite_sec": suite_sec,
        "full_suite_queries": len(suite_names),
        **scale,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
