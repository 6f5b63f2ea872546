"""Structured Streaming surface (SURVEY.md §2.8).

The reference is pure batch — its only "stream" is the epoch x batch
Python loop with skip-on-error (``loc2vec_train.py:56-87``,
``data_loading.py:116-119``). The engine's streaming face covers the three
capabilities §2.8 maps onto Spark:

- **resumable incremental processing**: ``incremental_tiling`` runs the
  tile-assignment pipeline as a file-source stream with
  ``Trigger.AvailableNow`` + ``checkpointLocation`` — a re-run picks up
  only files not yet committed to the checkpoint (the streaming analog of
  :mod:`loc2vec_spark.lineage`'s batch manifests, and of the reference's
  reloadable model checkpoint ``loc2vec_run.py:30-31``);
- **late/invalid data handling**: ``quarantine_split`` routes rows that
  fail decode/validation to a dead-letter sink instead of skipping whole
  batches (upgrade over ``data_loading.py:116-119``, documented §5.1);
  event-time lateness is bounded with ``withWatermark``;
- **tumbling event-time windows**: ``windowed_event_counts`` — the
  streaming face of the batch ``events_tumbling`` oracle query
  (fixed-size batch slices ``data_loading.py:61-77`` -> time windows).

Everything is expressed on the streaming DataFrame API so the SAME
transformation functions (``geo.with_latlon``/``geo.with_cells``) serve
batch and stream — Catalyst plans both.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators import geo

# input_hint schema (BASELINE.json): the Iceberg images table shape
IMAGES_SCHEMA = ("image_id STRING, bytes BINARY, w INT, h INT, "
                 "fmt STRING, caption STRING, phash BIGINT")

EVENTS_SCHEMA = ("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
                 "event_type STRING, value DOUBLE, props STRING")


def read_images_stream(spark: SparkSession, src_dir: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over an images-table directory of parquet files.

    ``maxFilesPerTrigger`` bounds per-microbatch work (backpressure); the
    source tracks processed files in the checkpoint log, giving
    exactly-once file-level semantics.
    """
    r = spark.readStream.schema(IMAGES_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(src_dir)


def quarantine_split(images: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, dead_letter) row split — corrupt-row quarantine.

    Valid := parseable caption coordinates, a supported format and
    positive dimensions. The same predicate works on batch or streaming
    frames; the caller sinks ``dead_letter`` separately (S7-style), so
    one bad row never kills a 10^12-row job and is never silently
    dropped either.
    """
    with_loc = geo.with_latlon(images)
    # coalesce to false: fmt/w/h may be NULL (sources.read_image_tree
    # emits NULL fmt for corrupt files), and a NULL predicate would fail
    # BOTH filter(ok) and filter(~ok) — the row would vanish from good
    # AND dead-letter, which is exactly the silent drop this split exists
    # to prevent
    # every format decode_image sniffs (PNG/JPEG/GIF/BMP/TIFF) is a
    # good row; anything else dead-letters as bad_format
    fmt_ok = F.coalesce(
        F.col("fmt").isin("png", "jpg", "gif", "bmp", "tif"),
        F.lit(False))
    ok = F.coalesce(
        F.col("lat").isNotNull() & F.col("lon").isNotNull()
        & fmt_ok & (F.col("w") > 0) & (F.col("h") > 0), F.lit(False))
    flagged = with_loc.withColumn("_ok", ok)
    good = flagged.filter(F.col("_ok")).drop("_ok")
    bad = (flagged.filter(~F.col("_ok"))
                  .drop("_ok", "lat", "lon")
                  .withColumn("quarantine_reason", F.when(
                      ~fmt_ok, F.lit("bad_format"))
                      .otherwise(F.lit("bad_metadata"))))
    return good, bad


def windowed_event_counts(events: DataFrame, *, window: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """Tumbling event-time window with a late-data watermark.

    On a stream, state for a window is dropped once the watermark passes
    its end (bounded state at any input size); on a batch frame the same
    expression computes the identical result.

    sum_value sums DECIMAL(18,4)-quantized values exactly like the
    ``events_tumbling`` oracle query (test_streaming asserts batch-frame
    equality against it): a plain ROUND(SUM(double)) can legitimately
    differ in the 4th decimal between engines/parallelism levels because
    double addition is fold-order-dependent — exactly why the oracle
    uses the decimal form (ADVICE r1).
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    sum_dec = F.sum(F.round(F.col("value"), 4).cast("decimal(18,4)"))
    return (src.groupBy(F.window("ts", window).alias("win"), "event_type")
               .agg(F.count("*").alias("n"),
                    F.round(sum_dec.cast("double"), 4).alias("sum_value"))
               .select(F.col("win.start").alias("win_start"),
                       "event_type", "n", "sum_value"))


def incremental_tiling(spark: SparkSession, src_dir: str, out_dir: str,
                       checkpoint_dir: str,
                       resolutions: tuple[int, ...] = (5, 7, 9)) -> dict:
    """Resumable incremental tile assignment (S8 streaming analog).

    ``AvailableNow`` drains everything currently in ``src_dir`` through
    the normal microbatch machinery and stops; the checkpoint's file log
    makes the NEXT invocation process only newly arrived files.
    foreachBatch gives AT-LEAST-ONCE delivery (a crash between the data
    write and the checkpoint commit replays the batch), so each batch
    writes under its own ``batch_id=<n>`` partition directory with
    overwrite — a replay rewrites the same directory instead of
    appending duplicates, making the sink effectively exactly-once.

    Returns {"batches": n, "rows": total_good, "quarantined": total_bad}.
    """
    stream = read_images_stream(spark, src_dir)
    stats = {"batches": 0, "rows": 0, "quarantined": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.cache()  # each side written AND counted
        good, bad = quarantine_split(batch_df)
        tiled = geo.with_cells(good, resolutions=resolutions) \
            .drop("bytes")
        n_bad = bad.count()
        if n_bad:
            (bad.select("image_id", "fmt", "caption", "quarantine_reason")
                .write.mode("overwrite")
                .parquet(os.path.join(out_dir, "_dead_letter",
                                      f"batch_id={batch_id}")))
        tiled.write.mode("overwrite").partitionBy("cell_r7") \
             .parquet(os.path.join(out_dir, "tiles",
                                   f"batch_id={batch_id}"))
        stats["batches"] += 1
        stats["rows"] += tiled.count()
        stats["quarantined"] += n_bad
        batch_df.unpersist()

    q = (stream.writeStream
               .foreachBatch(sink)
               .option("checkpointLocation", checkpoint_dir)
               .trigger(availableNow=True)
               .start())
    q.awaitTermination()
    return stats


# BIGINT for the integer metadata: the fixture tables are written by
# pandas (int64 parquet physical type), and a declared INT would make
# the file-source scan fail the whole microbatch on type mismatch
MEDIA_SCHEMAS = {
    "audio": ("audio_id STRING, bytes BINARY, rate BIGINT, "
              "n_samples BIGINT, fmt STRING"),
    "video": ("video_id STRING, bytes BINARY, w BIGINT, h BIGINT, "
              "n_frames BIGINT, fps DOUBLE, fmt STRING"),
}


def incremental_media_stats(spark: SparkSession, src_dir: str,
                            out_dir: str, checkpoint_dir: str, *,
                            kind: str) -> dict:
    """Resumable incremental ingestion of a multimodal binary table.

    The media analog of :func:`incremental_tiling`: a file-source stream
    over an audio/video parquet table, each microbatch decoded through
    :func:`..operators.images.decode_av` (WAV / Y4M codec-free paths),
    rows that fail decode landing in a per-batch dead-letter directory
    (``ok=false`` quarantine — the decoder never aborts a batch), good
    stats written under ``batch_id=<n>`` with overwrite for effective
    exactly-once on replay. A re-run drains only files the checkpoint
    has not committed.

    Returns {"batches": n, "rows": good, "quarantined": bad}.
    """
    from .operators.images import decode_av

    id_col = f"{kind}_id"
    stream = spark.readStream.schema(MEDIA_SCHEMAS[kind]).parquet(src_dir)
    stats = {"batches": 0, "rows": 0, "quarantined": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.cache()
        decoded = decode_av(batch_df, kind=kind).cache()
        good = decoded.filter(F.col("ok"))
        # two quarantine classes, NEITHER silently dropped: decode
        # failures (ok=false rows) and NULL-bytes rows, which the
        # decoders filter out BEFORE decoding and so appear in neither
        # ok bucket — without this union they'd vanish from both the
        # output and the counts (the exact silent drop quarantine_split
        # exists to prevent)
        bad = decoded.filter(~F.col("ok")) \
                     .select(id_col, F.lit("decode_failed").alias(
                         "quarantine_reason")) \
                     .unionByName(
                         batch_df.filter(F.col("bytes").isNull())
                                 .select(id_col,
                                         F.lit("null_bytes").alias(
                                             "quarantine_reason")))
        n_bad = bad.count()
        if n_bad:
            bad.write.mode("overwrite").parquet(
                os.path.join(out_dir, "_dead_letter",
                             f"batch_id={batch_id}"))
        good.write.mode("overwrite").parquet(
            os.path.join(out_dir, "stats", f"batch_id={batch_id}"))
        stats["batches"] += 1
        stats["rows"] += good.count()
        stats["quarantined"] += n_bad
        decoded.unpersist()
        batch_df.unpersist()

    q = (stream.writeStream
               .foreachBatch(sink)
               .option("checkpointLocation", checkpoint_dir)
               .trigger(availableNow=True)
               .start())
    q.awaitTermination()
    return stats


def dedup_stream(rows: DataFrame, *, key_cols: list[str], ts_col: str,
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: first arrival per key wins, re-deliveries
    within the watermark are dropped with BOUNDED state.

    The streaming face of the batch ``dedup_exact`` operator: an
    at-least-once upstream (the replay semantics of every foreachBatch
    sink here) re-delivers rows, and an unbounded ``dropDuplicates``
    would grow its state key-set forever at 10^12-row scale.
    ``dropDuplicatesWithinWatermark`` expires a key's state once the
    watermark passes its event time — exact dedup against any
    re-delivery inside the lateness bound, O(active window) state. On a
    batch frame the SAME semantics are computed deterministically: the
    event-time-earliest row per key wins, ties broken by a hash of the
    remaining columns (plain ``dropDuplicates`` keeps an arbitrary
    scan-order row — run-to-run nondeterministic values, review r2).
    """
    if rows.isStreaming:
        return rows.withWatermark(ts_col, watermark) \
                   .dropDuplicatesWithinWatermark(key_cols)
    from pyspark.sql import Window
    others = [c for c in rows.columns if c not in key_cols]
    # full-row key sets leave no tie-break columns — and need none, the
    # candidate rows are identical (xxhash64 requires >= 1 arg)
    tie = F.xxhash64(*others) if others else F.lit(0)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc_nulls_last(), tie)
    return rows.withColumn("_rn", F.row_number().over(w)) \
               .filter(F.col("_rn") == 1).drop("_rn")


def sessionize_stream(events: DataFrame, *, gap: str = "30 minutes",
                      watermark: str = "1 hour") -> DataFrame:
    """Gap-based session windows per user (stateful streaming aggregate).

    ``session_window`` keeps per-user open-session state in the state
    store and emits a session once the watermark passes its close —
    bounded state at any input size. The batch face is the
    ``events_sessionize`` oracle query (lag + running-sum formulation,
    identical session boundaries); on a BATCH frame this same expression
    computes the full result directly, which the tests use for
    stream-equals-batch equivalence.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming \
        else events
    # microsecond epochs: matches events_sessionize exactly (sw.start =
    # first event's timestamp; sw.end = last event + gap)
    return (src.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
               .agg(F.count("*").alias("n_events"))
               .select("user_id",
                       F.unix_micros(F.col("sw.start").cast("timestamp"))
                        .alias("session_start_us"),
                       F.unix_micros(F.col("sw.end").cast("timestamp"))
                        .alias("session_end_us"),
                       "n_events"))


def join_streams(left: DataFrame, right: DataFrame, *,
                 key_col: str = "user_id", left_ts: str = "ts",
                 right_ts: str = "ts", max_delay: str = "10 minutes",
                 left_watermark: str = "30 minutes",
                 right_watermark: str = "30 minutes") -> DataFrame:
    """Watermarked stream-stream INNER join with interval semantics
    (VERDICT r4 item 6): each left event is enriched with every right
    event of the same key whose event time lies in
    ``[left_ts - max_delay, left_ts]`` — the streaming face of the
    batch ``range_events`` / ``asof_events`` family.

    Late-data correctness and BOUNDED state both come from the
    watermark + time-range condition pair: Spark's symmetric hash join
    buffers each side's rows only until the other side's watermark
    passes the last instant they could still match (right rows are
    droppable once ``left_watermark`` passes ``right_ts + max_delay``;
    left rows once ``right_watermark`` passes ``left_ts``), so state is
    O(rows within the lateness bound), never O(stream). Rows later
    than their side's watermark are dropped — the documented contract,
    identical to the windowed aggregates here.

    Right-side columns are prefixed ``r_`` (both sides legitimately
    carry ``event_id``/``value`` in the events shape). On BATCH frames
    the identical join expression computes the full result directly —
    the tests pin stream == batch == the range-join oracle semantics.
    """
    r = right.select(
        F.col(key_col).alias("r_key"),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns
          if c not in (key_col, right_ts)])
    lhs = (left.withWatermark(left_ts, left_watermark)
           if left.isStreaming else left)
    if right.isStreaming:
        r = r.withWatermark("r_ts", right_watermark)
    cond = ((F.col(key_col) == F.col("r_key"))
            & (F.col("r_ts")
               >= F.col(left_ts) - F.expr(f"INTERVAL {max_delay}"))
            & (F.col("r_ts") <= F.col(left_ts)))
    return lhs.join(r, cond, "inner").drop("r_key")


def running_user_stats(events: DataFrame,
                       timeout_minutes: int | None = None) -> DataFrame:
    """Custom stateful operator: cumulative per-user event stats
    maintained in the state store via ``applyInPandasWithState``.

    The reference keeps running loss/metric lists in driver memory
    (``loc2vec_train.py:52-55,85``); here the running state is
    per-group, distributed, and checkpointed — the engine's pattern for
    any custom streaming state Spark's built-in aggregates can't
    express. Emits one updated (user_id, n_events, total_value) row per
    user per microbatch.

    ``timeout_minutes`` arms a processing-time expiry for idle keys
    (timed-out state is removed, never re-armed). Default is NoTimeout:
    with ``Trigger.AvailableNow``, armed processing-time timers keep
    scheduling empty microbatches until they fire, so the drain-and-stop
    pattern the tests use would never terminate.
    """
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    out_schema = ("user_id BIGINT, n_events BIGINT, total_value DOUBLE")
    state_schema = "n BIGINT, total DOUBLE"

    def update(key, pdfs, state: GroupState):
        if timeout_minutes is not None and state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        import pandas as pd
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [round(total, 6)]})

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if timeout_minutes is not None
               else GroupStateTimeout.NoTimeout)
    return (events.groupBy("user_id")
                  .applyInPandasWithState(
                      update, out_schema, state_schema, "update", timeout))


GEOFENCE_OUT_SCHEMA = ("user_id BIGINT, event_id BIGINT, ts TIMESTAMP, "
                       "fence_id INT, transition STRING")


def geofence_transitions(events: DataFrame,
                         fences: list[tuple]) -> DataFrame:
    """Stateful geofence enter/exit detection — the streaming sibling of
    the batch PIP joins (the alerting primitive a location pipeline
    runs 24/7). ``events`` carries (user_id, event_id, ts, lat, lon);
    ``fences`` is a SMALL list of (fence_id, min_lat, min_lon, max_lat,
    max_lon) axis-aligned boxes (the repo's rectangle-PIP idiom),
    closed over as a literal — a continent-scale fence set would take
    the pip_cellcover stencil on the batch path instead.

    Per-user state in the store: (frontier_us, frontier_eid,
    inside_mask) — the strictly-advancing (event-time, event-id)
    frontier and the bitmask of fences the user was last inside
    (fence ids validated to 0 <= id < 63 so the mask fits the BIGINT
    state column). Each microbatch walks the user's rows in
    (ts, event_id) order, recomputes the mask per event, and emits ONE
    row per fence whose membership flipped (transition 'enter' |
    'exit'). Rows with null/NaN coordinates are dropped before the
    walk (a position-less ping must not read as 'outside every fence'
    and fire spurious exits — the quarantine posture every decode path
    in this repo carries). Rows at-or-behind the frontier are DROPPED
    — compared
    lexicographically on (ts, event_id), matching the sort key, so
    distinct same-second events advance instead of being swallowed
    (state-schema note: this 3-column layout replaced a 2-column
    ts-only frontier; a checkpoint written by the old layout cannot be
    restored against it — discard the checkpoint directory when
    upgrading, Spark state schemas are not migratable in place)
    (the late-data contract dedup_stream / join_streams carry;
    state resumes exactly across checkpointed restarts — tested by a
    two-drain run in test_streaming). First sight of a user starts
    from mask 0, so a first event inside a fence emits 'enter'.
    Reference analog: the per-batch triplet re-sampling loop
    (loc2vec_train.py:60-66) — here the per-key incremental state is
    distributed and checkpointed instead of driver-resident."""
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    if not all(0 <= f[0] < 63 for f in fences):
        raise ValueError(
            f"fence ids must satisfy 0 <= id < 63 (mask rides a BIGINT "
            f"state column): {sorted(f[0] for f in fences)}")

    state_schema = "frontier_us BIGINT, frontier_eid BIGINT, mask BIGINT"
    cols = ["user_id", "event_id", "ts", "fence_id", "transition"]

    def update(key, pdfs, state: GroupState):
        import pandas as pd
        batches = [pdf for pdf in pdfs if len(pdf)]
        frontier, f_eid, mask = state.get if state.exists else (-1, -1, 0)
        out = []
        if batches:
            rows = pd.concat(batches)
            rows = (rows[rows["lat"].notna() & rows["lon"].notna()]
                    .sort_values(["ts", "event_id"]))
            for r in rows.itertuples():
                t_us = int(pd.Timestamp(r.ts).value // 1000)
                if (t_us, int(r.event_id)) <= (frontier, f_eid):
                    continue                       # late/dup: drop
                m = 0
                for fid, la0, lo0, la1, lo1 in fences:
                    if la0 <= r.lat <= la1 and lo0 <= r.lon <= lo1:
                        m |= 1 << fid
                changed, fid = m ^ mask, 0
                while changed:
                    if changed & 1:
                        out.append((key[0], int(r.event_id), r.ts, fid,
                                    "enter" if (m >> fid) & 1
                                    else "exit"))
                    changed >>= 1
                    fid += 1
                mask, frontier, f_eid = m, t_us, int(r.event_id)
        state.update((frontier, f_eid, mask))
        yield pd.DataFrame(out, columns=cols)

    return (events.groupBy("user_id")
                  .applyInPandasWithState(
                      update, GEOFENCE_OUT_SCHEMA, state_schema,
                      "append", GroupStateTimeout.NoTimeout))
