#!/usr/bin/env python
"""Trajectory-mining job — the movement-analytics pipeline end to end
(spark-submit).

    spark-submit --py-files loc2vec_spark.zip jobs/run_trajectory.py \
        --events <events parquet> --out <dir> [--keep-session]

Composes the oracle-checked trajectory operator family over an
``events``-table input (the same faces the driver hash-verifies at
sf0.01 — this job is their composition, exactly run_crawl's relation
to warc_records/html_text_extract):

events parquet
  -> stay_points        gaps-and-islands dwell detection (the STAY
     relation every downstream stage composes; lineage-manifested
     resumable write bucketed by the centroid's coarse cell — the
     hot-cell-aware layout the 8x8 OD grid reads back)
  -> od_flows           origin-destination trip matrix (coarse grid)
  -> colocation_pairs   co-dwell user pairs (cell equi-join candidates
     + interval overlap + count threshold)
  -> hausdorff_pairs    similar-trajectory user pairs (symmetric
     squared Hausdorff over stay centroids, shared-cell candidates)

The per-user stay relation is the only data-sized output (resumable,
skew-aware); the three analytics outputs are aggregate-sized and ride
plain overwrite writes. Prints one JSON stats line with the row counts
and the trip-conservation check (every consecutive-stay pair of a user
is exactly one OD trip: n_trips = n_stays - n_users_with_stays).

Reference anchor: the reference's single-process triplet sampling loop
walks per-image neighborhoods in driver memory
(``/root/reference/src/triplet_mining.py:34-58``); here every stage is
a distributed relation with an oracle-checked face.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from loc2vec_spark import lineage  # noqa: E402
from loc2vec_spark.session import get_spark  # noqa: E402


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", required=True,
                    help="events-table parquet (event_id, ts, user_id)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--keep-session", action="store_true")
    args = ap.parse_args(argv)

    spark = get_spark(app_name="loc2vec_trajectory")
    from loc2vec_spark.packaging import ensure_workers_can_import
    ensure_workers_can_import(spark)

    from loc2vec_spark import queries as qreg
    from loc2vec_spark.queries_geo import (_HD_GRID, _colocation_fn,
                                           _hausdorff_fn)

    stats = {}
    events = spark.read.parquet(args.events)
    stats["events"] = events.count()
    events.createOrReplaceTempView("events")

    # 1. stay relation — resumable, bucketed by the centroid's coarse
    # cell (the same 8x8 plane od_flows/hausdorff block on, so the
    # written layout co-locates what those readers join on)
    stays = spark.sql(qreg.QUERIES["stay_points"].spark_sql)
    out_df = stays.withColumn(
        "bucket",
        (F.col("sum_px") - F.col("sum_px") % F.col("n_pts"))
        / F.col("n_pts") / F.lit(_HD_GRID))
    out_df = out_df.withColumn("bucket",
                               F.col("bucket").cast("bigint"))
    stay_dir = os.path.join(args.out, "stay_points")
    index = lineage.write_resumable(out_df, stay_dir,
                                    cell_col="bucket", id_col="user_id")
    written = spark.read.parquet(stay_dir)
    stats["stays"] = written.count()
    stats["users_with_stays"] = written.select("user_id") \
                                       .distinct().count()
    stats["new_partitions"] = len(index)

    # 2-4. aggregate-sized analytics (overwrite: cheap to recompute,
    # and each is an oracle-checked face run verbatim)
    od = spark.sql(qreg.QUERIES["od_flows"].spark_sql)
    od.write.mode("overwrite").parquet(os.path.join(args.out,
                                                    "od_flows"))
    od_rows = spark.read.parquet(os.path.join(args.out, "od_flows"))
    stats["od_cells"] = od_rows.count()
    stats["od_trips"] = od_rows.agg(F.sum("n_trips")).first()[0] or 0
    # trip conservation: LEAD pairs per user = stays - users
    stats["trips_conserved"] = bool(
        stats["od_trips"] == stats["stays"] - stats["users_with_stays"])

    coloc = _colocation_fn(spark, None)
    coloc.write.mode("overwrite").parquet(
        os.path.join(args.out, "colocation_pairs"))
    stats["colocation_pairs"] = spark.read.parquet(
        os.path.join(args.out, "colocation_pairs")).count()

    hd = _hausdorff_fn(spark, None)
    hd.write.mode("overwrite").parquet(
        os.path.join(args.out, "similar_users"))
    stats["similar_user_pairs"] = spark.read.parquet(
        os.path.join(args.out, "similar_users")).count()

    print(json.dumps(stats))
    if not args.keep_session:
        spark.stop()
    return stats


if __name__ == "__main__":
    main()
