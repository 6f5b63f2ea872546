"""Corpus-preparation operators (queries_corpus.py / operators/corpus.py):
greedy packing semantics + determinism, leak-free split invariant,
vocab top-k plan shape. Cross-engine value equality for all four
queries is covered by test_entry's parametrized mirror."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from loc2vec_spark import queries as q  # noqa: E402
from loc2vec_spark.operators.corpus import pack_greedy  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_pack_greedy_semantics(spark):
    # budget 10: [4,4,4] -> 8 then reset; 12 oversize -> own pack;
    # [3,5,2] -> exactly 10 (boundary is INclusive)
    rows = [(i, 0, nt) for i, nt in enumerate([4, 4, 4, 12, 3, 5, 2])]
    df = spark.createDataFrame(rows, "id long, shard long, nt long")
    out = pack_greedy(df, id_col="id", tokens_col="nt",
                      shard_col="shard", budget=10)
    got = {r["id"]: (r["pack_id"], r["pack_pos"]) for r in out.collect()}
    assert got == {0: (0, 1), 1: (0, 2), 2: (1, 1), 3: (2, 1),
                   4: (3, 1), 5: (3, 2), 6: (3, 3)}


def test_pack_sequences_budget_invariant(spark):
    out = q.run_spark(spark, SF, "pack_sequences")
    agg = (out.groupBy("shard", "pack_id")
              .agg(F.sum("n_tokens").alias("s"), F.count("*").alias("c")))
    bad = agg.filter((F.col("s") > 256) & (F.col("c") > 1)).count()
    assert bad == 0
    # packs are contiguously numbered from 0 per shard
    packs = (out.groupBy("shard")
                .agg(F.min("pack_id").alias("lo"),
                     F.max("pack_id").alias("hi"),
                     F.countDistinct("pack_id").alias("n")).collect())
    for r in packs:
        assert r["lo"] == 0 and r["n"] == r["hi"] + 1


def test_pack_greedy_deterministic_across_parallelism(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", (F.col("doc_id") % 4).alias("shard"),
        (F.length("text") - F.length(F.regexp_replace("text", " ", ""))
         + 1).cast("long").alias("nt"))
    outs = []
    for parts in (1, 7):
        out = pack_greedy(d.repartition(parts), id_col="doc_id",
                          tokens_col="nt", shard_col="shard", budget=200)
        outs.append(sorted(tuple(r) for r in out.collect()))
    assert outs[0] == outs[1]


def test_leakfree_split_no_pair_straddles(spark):
    """Every LSH near-dup candidate pair lands in one split — built
    from the SAME pair pipeline leakfree_split resolves components
    over (queries_text.lsh_pairs_df, the single home of that SQL)."""
    from loc2vec_spark.queries_text import lsh_pairs_df
    split = q.run_spark(spark, SF, "leakfree_split").cache()
    pairs = lsh_pairs_df(spark)
    straddle = (pairs
                .join(split.withColumnRenamed("doc_id", "doc_a")
                           .withColumnRenamed("split", "sa")
                           .select("doc_a", "sa"), "doc_a")
                .join(split.withColumnRenamed("doc_id", "doc_b")
                           .withColumnRenamed("split", "sb")
                           .select("doc_b", "sb"), "doc_b")
                .filter(F.col("sa") != F.col("sb")).count())
    assert pairs.count() > 0 and straddle == 0
    # both splits non-empty (hash split actually splits)
    ns = {r["split"]: r["n"] for r in
          split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(ns) == {"train", "val"} and min(ns.values()) > 0


def test_vocab_topk_plan_is_take_ordered(spark):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    top-k), not a global Sort — the scale contract of the registration."""
    df = q.run_spark(spark, SF, "vocab_topk")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_decontaminate_bounds(spark):
    out = q.run_spark(spark, SF, "decontaminate").collect()
    assert len(out) > 0
    for r in out:
        assert 0.05 <= r["containment"] <= 1.0
        # corpus side excludes the whole eval partition, not just
        # self-pairs (review r2: eval-vs-eval is not contamination)
        assert r["eval_id"] % 20 == 0 and r["corpus_id"] % 20 != 0


def test_mix_sources_weighted_proportions(spark):
    """Kept fraction per weight class tracks w/W (data-derived rates)."""
    out = q.run_spark(spark, SF, "mix_sources")
    per_w = {r["w"]: r["n"] for r in
             out.groupBy("w").agg(F.count("*").alias("n")).collect()}
    assert set(per_w) == {1, 2, 3}
    # monotone in w, and each class near w/3 of its pool (w=1/2/3 pools
    # are 175/175/150 docs: 7, 7, and 6 of the 20 sources)
    assert per_w[1] < per_w[2] < per_w[3]
    total = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert 0 < sum(per_w.values()) < total


def test_doc_rarity_invariants(spark):
    out = q.run_spark(spark, SF, "doc_rarity").collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(out) == docs
    for r in out:
        assert r["min_tf"] <= r["mean_tf"] <= r["max_tf"]
        assert r["rarity_ratio"] > 0
    # the ratio actually varies across docs (non-vacuous signal)
    assert len({r["rarity_ratio"] for r in out}) > docs // 10


def test_dedup_spanfrac_bounds(spark):
    out = q.run_spark(spark, SF, "dedup_spanfrac").collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(out) == docs
    for r in out:
        assert 0 <= r.n_dup_tok <= r.n_tok
        assert abs(r.dup_frac - r.n_dup_tok / r.n_tok) < 1e-6
    # varies across docs (non-vacuous signal on the driver corpus)
    assert len({r.dup_frac for r in out}) > docs // 10


def test_dedup_incremental_verdicts_planted(spark):
    """All three verdict arms on a planted batch/corpus split, and the
    exact > near priority (an exact copy shares every LSH band, so the
    CASE order is what keeps it labeled exact_dup). Cross-checked
    against the DuckDB oracle on the same planted table."""
    import duckdb
    import pandas as pd

    from loc2vec_spark.queries_corpus import _inc_duck, _inc_fn

    rows = [
        # corpus (doc_id % 5 != 0)
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three four five six seven eight nine ten"),
        (3, "lorem ipsum dolor sit amet consectetur adipiscing elit"),
        # batch (doc_id % 5 == 0)
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (5, "one two three four five six seven eight nine ten extra"),
        (10, "qq ww ee rr tt yy uu ii oo pp"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["source"] = "planted"
    spark.createDataFrame(pdf).createOrReplaceTempView("documents")
    got = {r["doc_id"]: r["verdict"]
           for r in _inc_fn(spark, None).collect()}
    assert got == {0: "exact_dup", 5: "near_dup", 10: "new"}

    con = duckdb.connect()
    con.register("documents", pdf)
    from loc2vec_spark.functions import DUCKDB_BASE
    oracle = {r[0]: r[2] for r in con.sql(_inc_duck(DUCKDB_BASE)).fetchall()}
    assert oracle == got


def test_dedup_incremental_nonvacuous_at_sf(spark):
    """On the driver corpus the near_dup arm has teeth (LSH pairs
    straddle the 20% batch slice) and every batch doc gets a row."""
    out = q.run_spark(spark, SF, "dedup_incremental").collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert len(out) == docs.filter("doc_id % 5 = 0").count()
    verdicts = {r["verdict"] for r in out}
    assert "new" in verdicts


def test_bm25_matches_textbook_per_term(spark):
    """The log-free odds idf is a strictly monotone transform of the
    Lucene/ES non-negative idf ln(1 + (N-df+0.5)/(df+0.5)) (the classic
    Robertson ln-odds goes NEGATIVE for terms in >half the docs — this
    fixture's common terms — which is exactly why Lucene adds the 1+),
    so per query term the doc ordering by bm25_term must equal the
    ordering by Lucene BM25; and tf_sat must equal the textbook
    tf-saturation exactly."""
    import math

    sf = "/root/testdata/sf0.01"
    rows = q.run_spark(spark, sf, "bm25_score").collect()
    assert len(rows) > 0
    docs = spark.read.parquet(f"{sf}/documents.parquet").collect()
    toks = {d.doc_id: d.text.split(" ") for d in docs}
    n = len(toks)
    sum_dl = sum(len(t) for t in toks.values())
    avgdl = sum_dl / n
    k1, b = 1.2, 0.75
    by_term: dict = {}
    for r in rows:
        assert r.dl == len(toks[r.doc_id])
        tf_txt = (r.tf * (k1 + 1)) / (r.tf + k1 * (1 - b + b * r.dl / avgdl))
        assert abs(r.tf_sat - tf_txt) < 1e-5
        txt = tf_txt * math.log(1 + (n - r.df + 0.5) / (r.df + 0.5))
        by_term.setdefault(r.tok, []).append((r.doc_id, r.bm25_term, txt))
    assert len(by_term) == 3
    for recs in by_term.values():
        ours = [d for d, _, _ in sorted(recs, key=lambda t: (-t[1], t[0]))]
        txts = [d for d, _, _ in sorted(recs, key=lambda t: (-t[2], t[0]))]
        assert ours == txts  # rank-identical per term
