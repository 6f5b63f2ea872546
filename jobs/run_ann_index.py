#!/usr/bin/env python
"""Build and persist an IVF-PQ ANN index as a job (spark-submit).

    spark-submit --py-files loc2vec_spark.zip jobs/run_ann_index.py \
        --embeddings <parquet> --out <dir> [--dim 64] [--k-cells 16] \
        [--m 8] [--ksub 256] [--train-frac 1] [--query-mod 0]

The production shape of an ANN deploy: train the coarse quantizer +
PQ codebooks ONCE (on a seeded 1/train-frac hash-sample at scale),
encode the base table into the packed-BIGINT codes index, and persist
everything under --out (FAISS write_index, re-expressed as parquet):

    out/centroids   (cid, comps)          kB-sized driver table
    out/codebooks   (m, code, comps)      kB-sized driver table
    out/index       (neighbor_id, pq_code) partitioned by cid with
                    lineage manifests — resumable build, and searches
                    prune to the probed cells' files only

With --query-mod N > 0 the job finishes by searching the PERSISTED
index for every N-th vector (smoke of the read path: the search plan
never re-encodes the base table). Reference analog: the reference
recomputes all-pairs distances per run (triplet_mining.py:103-114,
its own "BAD" note); this job is the amortized replacement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from loc2vec_spark.session import get_spark  # noqa: E402


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--embeddings", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--k-cells", type=int, default=16)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--ksub", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--train-frac", type=int, default=1,
                    help="train on a seeded 1/N hash-sample (the "
                         "10^12-row path; 1 = full table)")
    ap.add_argument("--query-mod", type=int, default=0,
                    help="after building, search the persisted index "
                         "for every N-th vector (0 = build only)")
    ap.add_argument("--nprobe", type=int, default=8)
    ap.add_argument("--refine", type=int, default=50)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--residual", action="store_true",
                    help="FAISS by_residual: train/encode/search on "
                         "coarse residuals — the right mode for "
                         "CLUSTERED embeddings (cuts ADC distortion "
                         "~43%% there); leave off for near-uniform "
                         "data (see operators/pq.py docstring)")
    ap.add_argument("--keep-session", action="store_true",
                    help="do not stop the SparkSession (in-process tests)")
    args = ap.parse_args(argv)

    spark = get_spark(app_name="loc2vec_ann_index")
    from loc2vec_spark.packaging import ensure_workers_can_import
    ensure_workers_can_import(spark)

    from loc2vec_spark.operators.ann import train_codebook
    from loc2vec_spark.operators.pq import (build_pq_index, ivfpq_search,
                                            normalized_frame,
                                            read_pq_index, train_pq,
                                            write_pq_index)

    emb = spark.read.parquet(args.embeddings)
    cents = train_codebook(emb, dim=args.dim, k_cells=args.k_cells,
                           iters=args.iters,
                           train_frac=args.train_frac)
    books = train_pq(emb, dim=args.dim, m=args.m, ksub=args.ksub,
                     iters=args.iters, train_frac=args.train_frac,
                     cents=cents if args.residual else None)
    ne = normalized_frame(emb, args.dim)
    index = build_pq_index(emb, cents, books, dim=args.dim, ne=ne,
                           residual=args.residual)
    manifest = write_pq_index(spark, args.out, cents, books, index,
                              residual=args.residual)
    summary = {"index_rows": sum(r["rows"] for r in manifest.values()),
               "cells": len(manifest), "residual": args.residual}

    if args.query_mod > 0:
        from loc2vec_spark.operators.pq import read_pq_meta
        cents_l, books_l, index_l = read_pq_index(spark, args.out)
        hits = ivfpq_search(emb, cents_l, books_l, dim=args.dim,
                            nprobe=args.nprobe, refine=args.refine,
                            topk=args.topk, query_mod=args.query_mod,
                            ne=ne, index=index_l,
                            residual=read_pq_meta(spark,
                                                  args.out)["residual"])
        hits.write.mode("overwrite").parquet(f"{args.out}/search")
        summary["search_rows"] = \
            spark.read.parquet(f"{args.out}/search").count()
    ne.unpersist()

    print(json.dumps(summary))
    if not args.keep_session:
        spark.stop()


if __name__ == "__main__":
    main()
