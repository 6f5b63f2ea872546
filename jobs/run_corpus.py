#!/usr/bin/env python
"""Training-corpus preparation job (task-brief pipeline, spark-submit).

    spark-submit --py-files loc2vec_spark.zip jobs/run_corpus.py \
        --docs <documents.parquet> --out <dir> \
        [--min-quality 0.2] [--langs en,de,fr] [--embeddings <parquet>]

The end-to-end run a 100-TB corpus owner would schedule nightly, wiring
the pipeline operators this engine adds beyond the reference into one
resumable job:

documents table
  -> quality scoring + token counts + language ID    (rowwise, codegen)
  -> filter: min quality, allowed languages
  -> exact dedup (full-text hash groupBy)
  -> MinHash-LSH near-dup pairs -> connected components (transitive
     duplicate clusters, large-star/small-star — no driver graph state)
  -> canonical representative per cluster (min doc_id, the
     dedup_components convention)
  -> deduped corpus written with lineage manifests (bucketed, resumable)
  [-> optional: leak-free train/val split column (component hash),
      training-sequence packing slots (greedy token fold), PII scrub,
      IVF-blocked embedding near-dup pair count]

Every stage is a registered, oracle-checked operator (text_quality,
text_langid, dedup_exact, dedup_minhash_lsh, dedup_components,
dedup_embedding_ivf); this job is their composition, so the
correctness evidence carries over. Prints one JSON stats line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from loc2vec_spark import lineage  # noqa: E402
from loc2vec_spark.queries import QUERIES  # noqa: E402
from loc2vec_spark.session import get_spark  # noqa: E402


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--fmt", default="parquet",
                    choices=["parquet", "jsonl", "csv"],
                    help="input format; jsonl/csv go through "
                         "sources.read_documents with a dead-letter "
                         "quarantine written next to the corpus")
    ap.add_argument("--scrub-pii", action="store_true",
                    help="redact emails/phones in the output text "
                         "(queries_ml.pii_scrub_col)")
    ap.add_argument("--min-quality", type=float, default=0.0,
                    help="min stopword_ratio-based quality score")
    ap.add_argument("--langs", default="",
                    help="comma-separated allowed lang_pred (empty = all)")
    ap.add_argument("--embeddings", default=None,
                    help="optional embeddings parquet for the IVF "
                         "near-dup report")
    ap.add_argument("--split", action="store_true",
                    help="add a leak-free train/val split column "
                         "(hash of the duplicate-cluster component — "
                         "queries_corpus.leakfree_split semantics)")
    ap.add_argument("--mix-weights", default="",
                    help="weighted source mixing after dedup, e.g. "
                         "'src0=3,src1=1' — each source keeps "
                         "w/W * n_min/n_s of its docs (mix_sources "
                         "semantics; unlisted sources weight 1)")
    ap.add_argument("--pack-budget", type=int, default=0,
                    help="if > 0, assign each surviving doc a "
                         "(pack_shard, pack_id, pack_pos) training-"
                         "sequence slot via greedy token packing "
                         "(operators/corpus.pack_greedy)")
    ap.add_argument("--keep-session", action="store_true")
    args = ap.parse_args(argv)

    spark = get_spark(app_name="loc2vec_corpus")
    from loc2vec_spark.packaging import ensure_workers_can_import
    ensure_workers_can_import(spark)

    stats = {}
    if args.fmt == "parquet":
        docs = spark.read.parquet(args.docs)
    else:
        from loc2vec_spark.sources import read_documents
        docs, quarantine = read_documents(spark, args.docs, fmt=args.fmt)
        qpath = os.path.join(args.out, "quarantine")
        quarantine.write.mode("overwrite").parquet(qpath)
        stats["quarantined_rows"] = spark.read.parquet(qpath).count()
    docs.createOrReplaceTempView("documents")
    stats["input_docs"] = docs.count()

    # 1. rowwise annotation: quality + tokens (text_quality) and langid —
    # the registered operators' own SQL, joined on doc_id
    quality = spark.sql(QUERIES["text_quality"].spark_sql)
    langid = spark.sql(QUERIES["text_langid"].spark_sql) \
                  .select("doc_id", "lang_pred")
    annotated = docs.join(quality, "doc_id").join(langid, "doc_id")

    # 2. filters (NULL-safe: NULL text/quality rows are dropped and
    # counted, never silently lost)
    keep = F.coalesce(F.col("stopword_ratio") >= args.min_quality,
                      F.lit(False))
    if args.langs:
        keep = keep & F.col("lang_pred").isin(args.langs.split(","))
    kept = annotated.filter(keep).cache()
    stats["after_quality_filter"] = kept.count()
    stats["filtered_out"] = stats["input_docs"] - stats["after_quality_filter"]

    # 3. exact dedup: one representative (min doc_id) per identical text
    exact = kept.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.count("*").alias("n_exact_copies"))
    survivors = kept.join(exact.select("doc_id", "n_exact_copies"),
                          "doc_id").cache()
    stats["after_exact_dedup"] = survivors.count()

    # 4. near-dup clusters: the registered transitive-closure operator
    # runs over the FULL documents view (its pair generation is the
    # materialized shingle->minhash->band pipeline); survivors then map
    # to their component's canonical id and only canonical docs remain
    comp = QUERIES["dedup_components"].fn(spark, None) \
        .withColumnRenamed("node", "doc_id")
    labeled = survivors.join(comp, "doc_id")
    cluster_sizes = labeled.groupBy("component").agg(
        F.count("*").alias("cluster_size"),
        F.min("doc_id").alias("canonical_id"))
    final = labeled.join(cluster_sizes, "component") \
                   .filter(F.col("doc_id") == F.col("canonical_id")) \
                   .drop("canonical_id")
    stats["near_dup_clusters_collapsed"] = \
        cluster_sizes.filter("cluster_size > 1").count()

    # 5. resumable bucketed write with lineage manifests
    if args.scrub_pii:
        from loc2vec_spark.queries_ml import pii_scrub_col
        final = final.withColumn("text", pii_scrub_col("text"))

    # 5a. optional leak-free split: hash of the duplicate-cluster
    # component (already on every row from stage 4), so a cluster never
    # straddles the train/val boundary — leakfree_split semantics
    if args.split:
        from loc2vec_spark.queries_corpus import _SPLIT_CASE
        final = final.withColumn("split", F.expr(_SPLIT_CASE))

    # 5a'. optional weighted source mixing (before packing, so packs
    # form over the mixture the trainer will actually see)
    if args.mix_weights:
        from loc2vec_spark.queries_corpus import weighted_mix
        weights = {k: int(v) for k, v in
                   (kv.split("=") for kv in args.mix_weights.split(","))}
        final = weighted_mix(final, weights)
        stats["after_mixing"] = final.count()

    # 5b. optional training-sequence packing: greedy token-budget fold
    # over hash shards sized to keep each applyInPandas group bounded
    # (~512 docs/shard at any corpus size — the count is already paid
    # by the stage-3 stats action)
    if args.pack_budget > 0:
        from loc2vec_spark.operators.corpus import pack_greedy
        from loc2vec_spark.queries import _h
        n_shards = max(1, stats["after_exact_dedup"] // 512)
        packed = pack_greedy(
            final.select("doc_id", F.expr(
                f"CAST({_h('doc_id', 83, n_shards)} AS BIGINT)"
            ).alias("pack_shard"), "n_tokens"),
            id_col="doc_id", tokens_col="n_tokens",
            shard_col="pack_shard", budget=args.pack_budget)
        final = final.join(
            packed.select("doc_id", "pack_shard", "pack_id", "pack_pos"),
            "doc_id")
        stats["n_pack_shards"] = n_shards

    cols = ["doc_id", "text", "lang", "lang_pred", "n_tokens",
            "stopword_ratio", "n_exact_copies", "component",
            "cluster_size"]
    cols += [c for c in ("split", "pack_shard", "pack_id", "pack_pos")
             if c in final.columns]
    out_df = final.select(
        *cols, F.pmod(F.xxhash64("doc_id"), F.lit(16)).alias("bucket"))
    index = lineage.write_resumable(out_df,
                                    os.path.join(args.out, "corpus"),
                                    cell_col="bucket", id_col="doc_id")
    stats["final_docs"] = sum(r["rows"] for r in index.values())
    stats["partitions"] = len(index)

    # 6. optional embedding near-dup report (IVF-blocked pairs)
    if args.embeddings:
        spark.read.parquet(args.embeddings) \
             .createOrReplaceTempView("embeddings")
        stats["embedding_near_dup_pairs"] = \
            QUERIES["dedup_embedding_ivf"].fn(spark, None).count()

    print(json.dumps(stats))
    if not args.keep_session:
        spark.stop()
    return stats


if __name__ == "__main__":
    main()
