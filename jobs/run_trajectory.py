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
  -> stay_points        gaps-and-islands dwell detection, computed
     ONCE and lineage-manifest-written bucketed by the centroid's
     full (gx, gy) coarse cell (gx*9 + gy — base 9 because edge-block
     centroids can land in boundary col/row 8; the co-location key
     every downstream stage joins on)
  -> the WRITTEN stay relation is read back and registered as the
     ``stays`` view; every downstream stage runs its face's body SQL
     over it, so the 3-window stay pipeline executes exactly once per
     job instead of once per consumer:
     - od_flows          origin-destination trip matrix (_OD_BODY)
     - colocation_pairs  co-dwell user pairs (cell equi-join
       candidates + interval overlap + count threshold)
     - hausdorff_pairs   similar-trajectory user pairs (symmetric
       squared Hausdorff over stay centroids)

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
    from loc2vec_spark.queries_geo import (_CO_PAIR_SQL, _CO_SC_SQL,
                                           _HD_BODY, _HD_CEN, _HD_GRID,
                                           _OD_BODY)

    stats = {}
    events = spark.read.parquet(args.events)
    stats["events"] = events.count()
    events.createOrReplaceTempView("events")

    # 1. stay relation — computed ONCE; resumable write bucketed by
    # the centroid's full (gx, gy) coarse cell (the shared _HD_GRID
    # idiom as one expression: exact integer centroid, then the cell
    # id gx*9 + gy — base NINE, not eight: a dwell anchor at the
    # 99999 plane edge with positive mean jitter puts the centroid
    # past 100000, so gx/gy reach 8 on the boundary block and a *8
    # id would alias (0,8) with (1,0) and co-bucket unrelated cells
    # (review r5)
    cell = (f"CAST((sum_px - sum_px % n_pts) / n_pts "
            f"/ {_HD_GRID} AS BIGINT) * 9 "
            f"+ CAST((sum_py - sum_py % n_pts) / n_pts "
            f"/ {_HD_GRID} AS BIGINT)")
    stays = spark.sql(qreg.QUERIES["stay_points"].spark_sql) \
                 .withColumn("bucket", F.expr(cell))
    stay_dir = os.path.join(args.out, "stay_points")
    index = lineage.write_resumable(stays, stay_dir,
                                    cell_col="bucket", id_col="user_id")
    stats["new_partitions"] = len(index)

    # read the WRITTEN relation back — downstream stages consume the
    # materialized bucketed layout, never re-running the stay windows
    written = spark.read.parquet(stay_dir)
    written.createOrReplaceTempView("stays")
    stats["stays"] = written.count()
    stats["users_with_stays"] = written.select("user_id") \
                                       .distinct().count()

    # 2-4. aggregate-sized analytics over the stays view (each the
    # verbatim body SQL of an oracle-checked face; overwrite writes)
    od = spark.sql("WITH " + _OD_BODY)
    od.write.mode("overwrite").parquet(os.path.join(args.out,
                                                    "od_flows"))
    od_rows = spark.read.parquet(os.path.join(args.out, "od_flows"))
    stats["od_cells"] = od_rows.count()
    stats["od_trips"] = od_rows.agg(F.sum("n_trips")).first()[0] or 0
    # trip conservation: LEAD pairs per user = stays - users
    stats["trips_conserved"] = bool(
        stats["od_trips"] == stats["stays"] - stats["users_with_stays"])

    sc = spark.sql(_CO_SC_SQL).cache()   # small; both self-join sides
    sc.createOrReplaceTempView("_traj_sc")
    coloc = spark.sql(_CO_PAIR_SQL.format(sc="_traj_sc"))
    coloc.write.mode("overwrite").parquet(
        os.path.join(args.out, "colocation_pairs"))
    stats["colocation_pairs"] = spark.read.parquet(
        os.path.join(args.out, "colocation_pairs")).count()
    sc.unpersist()

    cen = spark.sql(_HD_CEN).localCheckpoint()  # 5x-referenced
    cen.createOrReplaceTempView("_traj_cen")
    hd = spark.sql("WITH " + _HD_BODY.strip().format(cen="_traj_cen"))
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
