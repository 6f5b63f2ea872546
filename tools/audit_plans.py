"""Generate PLANS.md — physical-plan audit of the flagship operators.

For each audited pipeline: operator counts, join strategies, exchanges,
scan schemas (column pruning), WindowGroupLimit presence, Python-eval
nodes. The assertions encode the plan properties the engine promises
(SURVEY.md §4.3); a regression that breaks one fails this script.
"""
from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from loc2vec_spark import queries as qreg
from loc2vec_spark.operators import geo, triplets
from loc2vec_spark.session import get_spark

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def summarize(plan: str) -> dict:
    ops = re.findall(r"^\s*[:+\-\s]*\*?\(?\d*\)?\s*([A-Za-z]+)[\s\[(]",
                     plan, re.M)
    c = Counter(ops)
    schemas = sorted(set(re.findall(r"ReadSchema: (\S+)", plan)))
    # shuffle exchanges print as "Exchange hashpartitioning(...)" /
    # "Exchange SinglePartition" etc.; the lookbehind excludes
    # BroadcastExchange (which is not a shuffle)
    shuffles = len(re.findall(r"(?<!Broadcast)Exchange \w+", plan))
    return {"ops": c, "schemas": schemas,
            "exchanges": shuffles,
            "bhj": c.get("BroadcastHashJoin", 0),
            "smj": c.get("SortMergeJoin", 0),
            "bnlj": c.get("BroadcastNestedLoopJoin", 0),
            "wgl": plan.count("WindowGroupLimit"),
            "python": plan.count("EvalPython") + plan.count("MapInPandas")
                      + plan.count("FlatMapGroupsInPandas")
                      + plan.count("FlatMapCoGroupsInPandas")}


def main() -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=32)
    sections = []

    def audit(name: str, df, expectations: list[tuple[str, bool]]):
        s = summarize(plan_of(df))
        lines = [f"## {name}", ""]
        lines.append(f"- joins: {s['bhj']} broadcast-hash, {s['smj']} "
                     f"sort-merge, {s['bnlj']} nested-loop")
        lines.append(f"- WindowGroupLimit (map-side top-k): {s['wgl']}")
        lines.append(f"- Python eval nodes: {s['python']}")
        for sch in s["schemas"]:
            lines.append(f"- ReadSchema: `{sch[:110]}`")
        ok_all = True
        for desc, ok in expectations:
            lines.append(f"- {'PASS' if ok else 'FAIL'}: {desc}")
            ok_all &= ok
        lines.append("")
        sections.append("\n".join(lines))
        if not ok_all:
            raise SystemExit(f"plan audit failed for {name}")

    # 1. flagship triplet assembly over the input_hint images table
    import tempfile

    from loc2vec_spark.fixtures import write_fixtures
    d = tempfile.mkdtemp()
    write_fixtures(d, n_images=5000, with_channels=False, n_shards=2)
    images = spark.read.parquet(os.path.join(d, "images.parquet"))
    pts = geo.with_cells(geo.with_latlon(images), resolutions=(7, 13))
    base = pts.select("image_id", "lat", "lon",
                      F.col("cell_r13").alias("cell"))
    trip = triplets.triplet_table_spatial(
        base, id_col="image_id", lat_col="lat", lon_col="lon",
        cell_col="cell", res=13, n_neg=5, cap=64)
    p = plan_of(trip)
    s = summarize(p)
    audit("triplet_table_spatial (flagship)", trip, [
        ("bytes column pruned out of every scan",
         all("bytes" not in sch for sch in s["schemas"])),
        ("negative pool joined via broadcast (no shuffle of anchors "
         "against pool)", s["bhj"] >= 1),
        ("window top-k prunes map-side (WindowGroupLimit)", s["wgl"] >= 2),
        ("no Python in the hot path (pure Catalyst)", s["python"] == 0),
        ("no nested-loop joins", s["bnlj"] == 0),
    ])

    # 2. tile assignment (pure projection — no exchanges at all)
    tiles = geo.with_cells(geo.with_latlon(images), resolutions=(5, 7, 9)) \
               .select("image_id", "cell_r5", "cell_r7", "cell_r9")
    s2 = summarize(plan_of(tiles))
    audit("tile assignment", tiles, [
        ("zero shuffles (narrow projection pipeline)",
         s2["exchanges"] == 0),
        ("zero Python crossings (Catalyst expressions only)",
         s2["python"] == 0),
        ("scan pruned to metadata columns",
         all("bytes" not in sch for sch in s2["schemas"])),
    ])

    # 3. oracle-suite kNN (SQL path)
    knn = qreg.run_spark(spark, SF, "knn_topk")
    s3 = summarize(plan_of(knn))
    audit("knn_topk (SQL path)", knn, [
        ("cell equi-join is broadcast-hash (2k-row build side)",
         s3["bhj"] >= 1),
        ("probe side repartitioned (parallel distance eval)",
         "RoundRobinPartitioning" in plan_of(knn)),
        ("ReadSchema = (vec_id, embedding) only",
         any("vec_id" in sch and "label" not in sch
             for sch in s3["schemas"])),
    ])

    # 4. blocked similarity kernel — one Arrow crossing, grouped
    from loc2vec_spark.operators.similarity import blocked_pairs_cosine
    spark.read.parquet(f"{SF}/embeddings.parquet") \
         .createOrReplaceTempView("embeddings")
    sim = blocked_pairs_cosine(spark.table("embeddings"), id_col="vec_id",
                               emb_col="embedding", dim=64, threshold=0.3)
    s4 = summarize(plan_of(sim))
    audit("blocked_pairs_cosine", sim, [
        ("block-pair table broadcast", s4["bhj"] >= 1 or
         "BroadcastExchange" in plan_of(sim)),
        ("exactly one Python (Arrow) crossing", s4["python"] == 1),
    ])

    # 5. multi-probe ANN — bucket equi-join over cached codes
    ann = qreg.run_spark(spark, SF, "ann_lsh_multiprobe")
    p5 = plan_of(ann)
    s5 = summarize(p5)
    audit("ann_lsh_multiprobe", ann, [
        ("candidate generation + scoring are broadcast-hash equi-joins "
         "on (table, code) / vec_id", s5["bhj"] >= 2),
        ("only nested-loop is the 9-row probe-mask stencil broadcast "
         "(like the kring offset stencil)", s5["bnlj"] <= 1
         and "CartesianProduct" not in p5),
        ("code projection computed once and reused from cache",
         p5.count("InMemoryTableScan") >= 2),
        ("scoring stays JVM-side (no Python crossing)", s5["python"] == 0),
    ])

    # 5b. IVF ANN — cached assignment, equi-join cell probe
    ivf = qreg.run_spark(spark, SF, "ann_ivf")
    p5b = plan_of(ivf)
    s5b = summarize(p5b)
    audit("ann_ivf", ivf, [
        ("cell-probe candidate generation + scoring are hash equi-joins",
         s5b["bhj"] + s5b["smj"] >= 2),
        ("the only unkeyed join is the bounded vectors x centroids "
         "assignment (C small, broadcast; its cached plan prints once "
         "per InMemoryTableScan of asg)", s5b["bnlj"] <= 2
         and "CartesianProduct" not in p5b),
        ("N x C assignment computed once and reused from cache "
         "(cells + probes)", p5b.count("InMemoryTableScan") >= 2),
        ("scoring stays JVM-side (no Python crossing)",
         s5b["python"] == 0),
    ])

    # 5c. temporal joins — both must avoid nested-loop/cartesian plans
    asof = qreg.run_spark(spark, SF, "asof_events")
    s5c = summarize(plan_of(asof))
    audit("asof_events (union-tag as-of join)", asof, [
        ("no join operator at all — ONE shuffle (union + window), the "
         "whole point vs a range theta join",
         s5c["bhj"] + s5c["smj"] + s5c["bnlj"] == 0),
        ("single window pass, pure Catalyst", s5c["python"] == 0),
    ])
    rng_q = qreg.run_spark(spark, SF, "range_events")
    p5d = plan_of(rng_q)
    s5d = summarize(p5d)
    audit("range_events (bucketed range join)", rng_q, [
        ("containment rides an equi-join (hash/sort-merge), never "
         "BroadcastNestedLoopJoin",
         s5d["bnlj"] == 0 and "CartesianProduct" not in p5d
         and (s5d["bhj"] + s5d["smj"]) >= 1),
        ("pure Catalyst", s5d["python"] == 0),
    ])

    # 6. connected components — one large-star/small-star round
    from loc2vec_spark.operators.components import (_large_star,
                                                    _small_star)
    edges = spark.range(2000).select(
        (F.col("id") % 997).alias("a"), (F.col("id") % 499).alias("b"))
    rnd = _small_star(_large_star(edges))
    p6 = plan_of(rnd)
    s6 = summarize(p6)
    audit("connected_components (one star round)", rnd, [
        ("per-node min via grouped aggregation (partial+final, "
         "shuffle keyed by node)", s6["ops"].get("HashAggregate", 0) >= 2),
        ("no cartesian/nested-loop anywhere in the round",
         s6["bnlj"] == 0 and "CartesianProduct" not in p6),
        ("pure Catalyst (no Python, no driver graph state)",
         s6["python"] == 0),
    ])

    # 7. phash banded Hamming near-dup — equi-join candidates only
    ph = qreg.run_spark(spark, SF, "dedup_phash")
    p7 = plan_of(ph)
    s7 = summarize(p7)
    audit("dedup_phash (banded Hamming LSH)", ph, [
        ("candidate generation is a hash equi-join on (band, value) — "
         "no cartesian/nested-loop anywhere",
         s7["bnlj"] == 0 and "CartesianProduct" not in p7
         and (s7["bhj"] + s7["smj"]) >= 1),
        ("exact Hamming filter stays JVM-side (bit_count codegen)",
         s7["python"] == 0),
    ])

    # 8. k-means assignment — rowwise literal-centroid argmin
    from loc2vec_spark.operators.kmeans import assign_rowwise
    pts_km = spark.sql(
        "SELECT vec_id, CAST(vec_id % 97 AS DOUBLE) AS lat, "
        "CAST(vec_id % 89 AS DOUBLE) AS lon FROM embeddings")
    asg_km = assign_rowwise(pts_km, [(0, 1.0, 2.0), (1, 50.0, 60.0),
                                     (2, 10.0, 80.0)], "lat", "lon")
    p8 = plan_of(asg_km)
    s8 = summarize(p8)
    audit("kmeans assignment (rowwise argmin)", asg_km, [
        ("zero shuffles AND zero joins — centroids are literals, the "
         "argmin is an array_min expression", s8["exchanges"] == 0
         and s8["bhj"] + s8["smj"] + s8["bnlj"] == 0),
        ("pure Catalyst", s8["python"] == 0),
    ])

    # 9. z-order write plan — one hash exchange on the deterministic
    # bucket key, no global sort (the sampled rangepartitioning mode is
    # the deterministic=False fallback)
    from loc2vec_spark import storage
    zdf = storage.zorder_by(pts_km.selectExpr(
        "vec_id", "CAST(lat AS BIGINT) AS ci", "CAST(lon AS BIGINT) AS cj"),
        "ci", "cj", n_files=8)
    p9 = plan_of(zdf)
    s9 = summarize(p9)
    audit("zorder_by (clustered write shape)", zdf, [
        ("exactly one exchange: hashpartitioning on the probed bucket "
         "key (fixed z-ranges, deterministic layout, no single-task "
         "global sort)",
         s9["exchanges"] == 1 and "hashpartitioning" in p9),
        ("sort is within-partition only (no Exchange SinglePartition)",
         "SinglePartition" not in p9),
        ("pure Catalyst (Morton interleave is arithmetic)",
         s9["python"] == 0),
    ])

    # 10. corpus-preparation batch
    vt = qreg.run_spark(spark, SF, "vocab_topk")
    p10 = plan_of(vt)
    s10 = summarize(p10)
    audit("vocab_topk (heavy hitters)", vt, [
        ("top-k is TakeOrderedAndProject (per-partition top-k merge), "
         "not a global Sort of the vocabulary",
         "TakeOrderedAndProject" in p10),
        # find(), not index(): a regressed plan must print FAIL via
        # audit(), not die in a ValueError while building this list
        ("rank window runs over the 20 survivors only (window input is "
         "the TakeOrdered output)",
         p10.find("TakeOrderedAndProject") > p10.find("Window") >= 0),
        ("pure Catalyst", s10["python"] == 0),
    ])
    dc = qreg.run_spark(spark, SF, "decontaminate")
    p11 = plan_of(dc)
    s11 = summarize(p11)
    audit("decontaminate (eval-set containment)", dc, [
        ("shingle table computed once, read from cache by both the "
         "eval side and the corpus side",
         p11.count("InMemoryTableScan") >= 2),
        ("candidates ride shingle-id equi-joins — no cartesian/"
         "nested-loop", s11["bnlj"] == 0
         and "CartesianProduct" not in p11),
        ("pure Catalyst", s11["python"] == 0),
    ])
    pk = qreg.run_spark(spark, SF, "pack_sequences")
    p12 = plan_of(pk)
    s12 = summarize(p12)
    audit("pack_sequences (greedy packing)", pk, [
        ("exactly one Python (Arrow) crossing — the per-shard fold",
         s12["python"] == 1),
        ("exactly one shuffle — the groupBy(shard) exchange",
         s12["exchanges"] == 1),
        ("scan pruned to (doc_id, text)",
         all("lang" not in sch for sch in s12["schemas"])),
    ])

    mx = qreg.run_spark(spark, SF, "mix_sources")
    p13 = plan_of(mx)
    s13 = summarize(p13)
    audit("mix_sources (weighted mixing)", mx, [
        ("rates dim (per-source counts) joins broadcast — no shuffle "
         "of the document stream onto source", s13["bhj"] >= 1),
        ("scalar n_min rides a broadcast (1-row side), not a shuffle",
         s13["bnlj"] <= 1 and "CartesianProduct" not in p13),
        ("keep-filter is pure codegen (integer cross-multiplication, "
         "no Python)", s13["python"] == 0),
    ])
    dr = qreg.run_spark(spark, SF, "doc_rarity")
    p14 = plan_of(dr)
    s14 = summarize(p14)
    audit("doc_rarity (vocabulary-rarity join)", dr, [
        ("global token-frequency dim joins broadcast back onto the "
         "token stream (vocab-sized build side)", s14["bhj"] >= 1),
        ("no cartesian/nested-loop beyond the 1-row gmean scalar",
         s14["bnlj"] <= 1 and "CartesianProduct" not in p14),
        ("pure Catalyst tokenization (posexplode, no Python)",
         s14["python"] == 0),
    ])

    pc = qreg.run_spark(spark, SF, "pip_cellcover")
    p15 = plan_of(pc)
    s15 = summarize(p15)
    audit("pip_cellcover (grid-blocked spatial join)", pc, [
        ("candidates ride a cell equi-join — no cartesian/"
         "nested-loop anywhere", s15["bnlj"] == 0
         and "CartesianProduct" not in p15),
        ("candidate join computed once, read from cache by both the "
         "full-hit and boundary branches",
         p15.count("InMemoryTableScan") >= 2),
        ("rings reach Python once per polygon cogroup (single "
         "FlatMapCoGroupsInPandas), never per candidate row",
         p15.count("FlatMapCoGroupsInPandas") == 1),
        ("point side scan pruned to (vec_id, lat, lon inputs)",
         all("caption" not in sch for sch in s15["schemas"])),
    ])

    # round-2 batch 3: raster analytics + data quality + interop ids
    qk = qreg.run_spark(spark, SF, "quadkey_assign")
    pqk = plan_of(qk)
    sqk = summarize(pqk)
    audit("quadkey_assign (interop ids)", qk, [
        ("pure codegen projection: zero exchanges, zero joins, zero "
         "Python", sqk["exchanges"] == 0 and sqk["python"] == 0
         and sqk["bhj"] + sqk["smj"] + sqk["bnlj"] == 0),
        ("scan pruned to vec_id only",
         sqk["schemas"] == ["struct<vec_id:bigint>"]),
    ])

    fc = qreg.run_spark(spark, SF, "focal_stats")
    pfc = plan_of(fc)
    sfc = summarize(pfc)
    audit("focal_stats (3x3 focal surface statistics)", fc, [
        ("at most 3 shuffles total (surface agg + final agg) — the two "
         "surface references don't each redo the input scan+agg "
         "exchange", sfc["exchanges"] <= 3),
        ("neighbor probe is a (broadcast) hash equi-join, no cartesian",
         sfc["bhj"] + sfc["smj"] >= 1 and "CartesianProduct" not in pfc),
        ("no Python nodes", sfc["python"] == 0),
    ])

    mi = qreg.run_spark(spark, SF, "morans_i")
    pmi = plan_of(mi)
    smi = summarize(pmi)
    audit("morans_i (spatial autocorrelation)", mi, [
        ("input scanned once: the checkpointed surface feeds every "
         "branch (no parquet scan in the final plan)",
         "Scan ExistingRDD" in pmi and "Scan parquet" not in pmi),
        ("no Python nodes", smi["python"] == 0),
    ])

    dd = qreg.run_spark(spark, SF, "dist_drift")
    pdd = plan_of(dd)
    sdd = summarize(pdd)
    audit("dist_drift (chi-square slice drift)", dd, [
        ("per-type counts cached — totals + final projection read the "
         "cache, events scanned once",
         pdd.count("InMemoryTableScan") >= 2),
        ("no Python nodes", sdd["python"] == 0),
    ])

    es = qreg.run_spark(spark, SF, "events_sliding")
    ses = summarize(plan_of(es))
    audit("events_sliding (native sliding window)", es, [
        ("one shuffle (partial agg before the exchange)",
         ses["exchanges"] == 1),
        ("no joins — the 2x expansion is Catalyst's TimeWindow explode",
         ses["bhj"] + ses["smj"] + ses["bnlj"] == 0),
    ])

    # round-2 batch 4: hotspots, BM25, bloom probe, IVF-PQ, PageRank
    pr = qreg.run_spark(spark, SF, "pagerank_cells")
    ppr = plan_of(pr)
    spr = summarize(ppr)
    audit("pagerank_cells (iterative damped power iteration)", pr, [
        ("surface + edge list materialized once — every iteration "
         "reads stored rows, no parquet rescan in the final plan",
         "Scan ExistingRDD" in ppr and "Scan parquet" not in ppr),
        ("per-iteration contributions ride hash equi-joins (no "
         "cartesian beyond the 1-row n_cells scalar)",
         "CartesianProduct" not in ppr),
        ("no Python nodes", spr["python"] == 0),
    ])

    gg = qreg.run_spark(spark, SF, "getis_gi")
    pgg = plan_of(gg)
    sgg = summarize(pgg)
    audit("getis_gi (Gi* hot-spot z-scores)", gg, [
        ("neighbor probe is a hash equi-join on the aggregated surface; "
         "the only nested-loops are the 9-row stencil + 1-row moments "
         "broadcasts", sgg["bhj"] + sgg["smj"] >= 1 and sgg["bnlj"] <= 2
         and "CartesianProduct" not in pgg),
        ("no Python nodes", sgg["python"] == 0),
    ])

    bm = qreg.run_spark(spark, SF, "bm25_score")
    pbm = plan_of(bm)
    sbm = summarize(pbm)
    audit("bm25_score (log-free BM25)", bm, [
        ("3-row query-term dim + per-doc-length dim join broadcast "
         "onto the tf relation", sbm["bhj"] >= 2),
        ("corpus-stats scalar is the only nested-loop (1-row side)",
         sbm["bnlj"] <= 1 and "CartesianProduct" not in pbm),
        ("pure Catalyst tokenization (posexplode, no Python)",
         sbm["python"] == 0),
    ])

    bl = qreg.run_spark(spark, SF, "dedup_bloom")
    pbl = plan_of(bl)
    sbl = summarize(pbl)
    audit("dedup_bloom (Bloom-filter probe)", bl, [
        ("the (bucket, bitmap) index joins BROADCAST onto the batch "
         "(the index is #buckets rows)", sbl["bhj"] >= 1),
        ("exactly two Arrow crossings: bitmap pack (build) + bit test "
         "(probe)", pbl.count("ArrowEvalPython") == 2),
        ("no cartesian anywhere", sbl["bnlj"] == 0
         and "CartesianProduct" not in pbl),
    ])

    from loc2vec_spark.operators.ann import train_codebook
    from loc2vec_spark.operators.pq import (encode_pq, ivfpq_search,
                                            train_pq)
    emb_pq = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents_pq = train_codebook(emb_pq, dim=64, k_cells=8, iters=1)
    books_pq = train_pq(emb_pq, dim=64, m=8, ksub=256, iters=1)
    pq_df = ivfpq_search(emb_pq, cents_pq, books_pq, dim=64, nprobe=2,
                         refine=20)
    ppq = plan_of(pq_df)
    spq = summarize(ppq)
    code_type = dict(encode_pq(emb_pq, books_pq, dim=64).dtypes)["pq_code"]
    audit("ivfpq_search (IVF-PQ + refine)", pq_df, [
        ("candidates ride the (cid) hash equi-join of the compressed "
         "codes index — no cartesian", spq["bnlj"] == 0
         and "CartesianProduct" not in ppq),
        ("the shipped code column is physically ONE BIGINT (M=8 packed "
         "8-bit sub-codes = 8 B/row, the 32x-below-floats claim in the "
         "schema itself)", code_type == "bigint"),
        ("every per-vector kernel is Arrow (assign/encode/ADC/dot) — "
         "no row-at-a-time Python", ppq.count("BatchEvalPython") == 0
         and ppq.count("ArrowEvalPython") >= 4),
        ("both per-query windows partition by query_id — no "
         "single-partition exchange anywhere in the plan",
         "Exchange SinglePartition" not in ppq),
    ])

    # round-5 batch: crawl front door, GROUPING SETS, AV near-dup,
    # raster checksum faces
    hx = qreg.run_spark(spark, SF, "html_text_extract")
    phx = plan_of(hx)
    shx = summarize(phx)
    audit("html_text_extract (crawl boilerplate strip)", hx, [
        ("exactly one Arrow crossing — the batched html.parser strip "
         "(scalar pandas UDF)", phx.count("ArrowEvalPython") == 1),
        ("embarrassingly parallel: zero shuffles, zero joins",
         shx["exchanges"] == 0
         and shx["bhj"] + shx["smj"] + shx["bnlj"] == 0),
        ("scan pruned to the page-build inputs (n_chars dropped)",
         all("n_chars" not in sch for sch in shx["schemas"])),
    ])

    wr = qreg.run_spark(spark, SF, "warc_records")
    pwr = plan_of(wr)
    swr = summarize(pwr)
    audit("warc_records (WARC write+walk round-trip)", wr, [
        ("exactly one Arrow crossing — the per-batch .warc.gz "
         "write + walk (mapInPandas)", pwr.count("MapInPandas") == 1),
        ("file-parallel: zero shuffles, zero joins",
         swr["exchanges"] == 0
         and swr["bhj"] + swr["smj"] + swr["bnlj"] == 0),
        ("scan pruned to (doc_id, text)",
         swr["schemas"] == ["struct<doc_id:bigint,text:string>"]),
    ])

    gs = qreg.run_spark(spark, SF, "a13_grouping_sets")
    pgs = plan_of(gs)
    sgs = summarize(pgs)
    audit("a13_grouping_sets (multi-granularity aggregate)", gs, [
        ("all grouping sets ride ONE Expand over one scan — not one "
         "scan+aggregate per set", "Expand" in pgs
         and sgs["ops"].get("FileScan", 0) == 1),
        ("single shuffle with map-side partial aggregation",
         sgs["exchanges"] == 1
         and sgs["ops"].get("HashAggregate", 0) >= 2),
        ("pure Catalyst", sgs["python"] == 0),
    ])

    dv = qreg.run_spark(spark, SF, "dedup_video")
    pdv = plan_of(dv)
    sdv = summarize(pdv)
    audit("dedup_video (aligned-frame banded-Hamming LSH)", dv, [
        ("candidate pairs ride the (frame_no, band, value) hash "
         "equi-join — no cartesian/nested-loop anywhere",
         sdv["bnlj"] == 0 and "CartesianProduct" not in pdv
         and sdv["bhj"] + sdv["smj"] >= 1),
        ("exact Hamming filter stays JVM-side (bit_count codegen)",
         "bit_count" in pdv),
        ("frame-hash sequence table computed once (decode chain), "
         "read from cache by BOTH self-join sides",
         pdv.count("InMemoryTableScan") >= 2),
        ("matched-frame count is a grouped partial+final aggregate",
         sdv["ops"].get("HashAggregate", 0) >= 2),
    ])

    da = qreg.run_spark(spark, SF, "dedup_audio")
    pda = plan_of(da)
    sda = summarize(pda)
    audit("dedup_audio (landmark-constellation fingerprints)", da, [
        ("candidate pairs ride the landmark-hash equi-join — no "
         "cartesian/nested-loop anywhere",
         sda["bnlj"] == 0 and "CartesianProduct" not in pda
         and sda["bhj"] + sda["smj"] >= 1),
        ("fingerprint table computed once (one Arrow crossing per "
         "clip batch), read from cache by BOTH self-join sides",
         pda.count("InMemoryTableScan") >= 2),
        ("match counting is a grouped partial+final aggregate",
         sda["ops"].get("HashAggregate", 0) >= 2),
    ])

    ra = qreg.run_spark(spark, SF, "raster_assembly")
    pra = plan_of(ra)
    sra = summarize(pra)
    audit("raster_assembly (per-cell scanline rasterization)", ra, [
        ("exactly one shuffle — the groupBy(cell) exchange feeding "
         "the per-cell cogroup", sra["exchanges"] == 1),
        ("one rasterize crossing (applyInPandas per cell) + one "
         "checksum-decode crossing (mapInPandas), never per-row",
         pra.count("FlatMapGroupsInPandas") == 1
         and pra.count("MapInPandas") == 1),
        ("no joins — assembly is grouped, not paired",
         sra["bhj"] + sra["smj"] + sra["bnlj"] == 0),
    ])

    py = qreg.run_spark(spark, SF, "pyramid_rollup")
    ppy = plan_of(py)
    spy = summarize(ppy)
    audit("pyramid_rollup (res-5 -> res-4 max-pool)", py, [
        ("exactly two shuffles — child-tile grouping + parent-cell "
         "grouping", spy["exchanges"] == 2),
        ("two grouped crossings (rasterize + pool), one decode "
         "crossing; no per-row Python",
         ppy.count("FlatMapGroupsInPandas") == 2
         and ppy.count("MapInPandas") == 1),
        ("no joins — quadrant placement is arithmetic inside the "
         "parent cogroup", spy["bhj"] + spy["smj"] + spy["bnlj"] == 0),
    ])

    cc = qreg.run_spark(spark, SF, "cells_compact")
    pcc = plan_of(cc)
    scc = summarize(pcc)
    audit("cells_compact (multi-resolution cell-set compaction)", cc, [
        ("each level's full-sibling test is a grouped partial+final "
         "aggregate over the shrinking DISTINCT cell surface",
         scc["ops"].get("HashAggregate", 0) >= 4),
        ("level anti-joins broadcast the (tiny) full-parent sets — "
         "no sort-merge, cartesian, or nested-loop anywhere",
         scc["bhj"] >= 2 and scc["smj"] == 0 and scc["bnlj"] == 0
         and "CartesianProduct" not in pcc),
        ("pure Catalyst integer arithmetic (no Python crossing)",
         scc["python"] == 0),
    ])

    sm = qreg.run_spark(spark, SF, "semdedup")
    psm = plan_of(sm)
    ssm = summarize(psm)
    audit("semdedup (within-cluster keep/drop verdicts)", sm, [
        ("candidate pairs ride the within-cluster cid equi-join — "
         "never all-pairs (the id inequality is a post-join filter, "
         "volume bounded by N x cluster_size)",
         ssm["bhj"] + ssm["smj"] >= 2 and "CartesianProduct" not in psm),
        ("the only unkeyed joins are the bounded vectors x centroids "
         "assignment inside the cached prelude (one print per "
         "InMemoryTableScan of asg)", ssm["bnlj"] <= 3
         and psm.count("InMemoryTableScan") >= 2),
        ("max-cosine verdict is a grouped partial+final aggregate; "
         "every vector keeps a row via the left join",
         ssm["ops"].get("HashAggregate", 0) >= 2),
        ("cosines stay JVM-side (no Python crossing)",
         ssm["python"] == 0),
    ])

    db = qreg.run_spark(spark, SF, "dbscan_cells")
    pdb = plan_of(db)
    sdb = summarize(pdb)
    audit("dbscan_cells (grid DBSCAN, per-point verdicts)", db, [
        ("adjacency + verdict joins are hash equi-joins on cell "
         "coords / point id — no cartesian, no distance cross join",
         sdb["bhj"] + sdb["smj"] >= 4 and "CartesianProduct" not in pdb),
        ("the only nested-loop is the bounded 8-row offset stencil "
         "broadcast", sdb["bnlj"] <= 1),
        ("the narrow point projection and the labeled dense-cell "
         "table are cached — the raw input is not rescanned per "
         "verdict branch", pdb.count("InMemoryTableScan") >= 4),
        ("density test is a grouped partial+final aggregate",
         sdb["ops"].get("HashAggregate", 0) >= 2),
        ("verdicts stay JVM-side (no Python crossing)",
         sdb["python"] == 0),
    ])

    sy = qreg.run_spark(spark, SF, "stay_points")
    psy = plan_of(sy)
    ssy = summarize(psy)
    audit("stay_points (gaps-and-islands dwell detection)", sy, [
        ("EXACTLY ONE shuffle — the user_id exchange is reused by all "
         "three window passes and the final grouped aggregate",
         ssy["exchanges"] == 1),
        ("no joins anywhere (segmentation is windows + arithmetic)",
         ssy["bhj"] + ssy["smj"] + ssy["bnlj"] == 0),
        ("single scan, columns pruned", ssy["ops"].get("FileScan", 0) == 1),
        ("pure Catalyst (no Python crossing)", ssy["python"] == 0),
    ])

    odf = qreg.run_spark(spark, SF, "od_flows")
    pod = plan_of(odf)
    sod = summarize(pod)
    audit("od_flows (origin-destination trip matrix)", odf, [
        ("the composed stay relation + LEAD + OD aggregate stay "
         "join-free", sod["bhj"] + sod["smj"] + sod["bnlj"] == 0),
        ("window passes share the user_id partitioning (no extra "
         "exchange per pass: <= 3 shuffles total for stays + trips + "
         "the OD groupBy)", sod["exchanges"] <= 3),
        ("single scan, pure Catalyst", sod["ops"].get("FileScan", 0) == 1
         and sod["python"] == 0),
    ])

    ex = qreg.run_spark(spark, SF, "exif_gps")
    pex = plan_of(ex)
    sex = summarize(pex)
    audit("exif_gps (EXIF APP1/TIFF GPS round trip)", ex, [
        ("exactly two Arrow crossings — JPEG+EXIF synthesis and the "
         "bounded parse — never per-row Python",
         pex.count("MapInPandas") == 2
         and "EvalPython" not in pex),
        ("zero shuffles, zero joins — a pure per-partition decode "
         "pipeline over one pruned scan", sex["exchanges"] == 0
         and sex["bhj"] + sex["smj"] + sex["bnlj"] == 0
         and sex["ops"].get("FileScan", 0) == 1),
    ])

    co = qreg.run_spark(spark, SF, "colocation_pairs")
    pco = plan_of(co)
    sco = summarize(pco)
    audit("colocation_pairs (co-dwell detection)", co, [
        ("candidate pairs ride the (cx, cy) cell equi-join — never "
         "user x user, no cartesian/nested-loop",
         sco["bhj"] + sco["smj"] >= 1 and sco["bnlj"] == 0
         and "CartesianProduct" not in pco),
        ("co-dwell counting is a grouped partial+final aggregate "
         "with the HAVING threshold as a post-agg filter",
         sco["ops"].get("HashAggregate", 0) >= 2),
        ("the stay relation is cached — BOTH self-join sides read the "
         "cache, the 3-window stay pipeline runs once",
         pco.count("InMemoryTableScan") >= 2),
        ("pure Catalyst (no Python crossing)", sco["python"] == 0),
    ])

    dw = qreg.run_spark(spark, SF, "dwithin_join")
    pdw = plan_of(dw)
    sdw = summarize(pdw)
    audit("dwithin_join (cell-blocked radius join)", dw, [
        ("candidates ride the neighbor-cell hash equi-join — never a "
         "distance cross join (no cartesian anywhere)",
         sdw["bhj"] + sdw["smj"] >= 1 and "CartesianProduct" not in pdw),
        ("the only nested-loop is the bounded 9-row offset stencil "
         "broadcast", sdw["bnlj"] <= 1),
        ("the exact squared-distance filter stays JVM-side",
         sdw["python"] == 0 and "dist2" in pdw),
    ])

    gh = qreg.run_spark(spark, SF, "geohash_assign")
    pgh = plan_of(gh)
    sgh = summarize(pgh)
    audit("geohash_assign (base-32 interop ids)", gh, [
        ("pure projection: zero shuffles, zero joins",
         sgh["exchanges"] == 0
         and sgh["bhj"] + sgh["smj"] + sgh["bnlj"] == 0),
        ("single scan, columns pruned to the id input",
         sgh["ops"].get("FileScan", 0) == 1
         and all("embedding" not in s or "vec_id" in s
                 for s in sgh["schemas"])),
        ("bit interleave + alphabet render are whole-stage codegen "
         "expressions (no Python crossing)", sgh["python"] == 0),
    ])

    sp = qreg.run_spark(spark, SF, "traj_spike_filter")
    psp = plan_of(sp)
    ssp = summarize(psp)
    audit("traj_spike_filter (GPS lone-outlier removal)", sp, [
        ("window-only pipeline: zero joins of any kind",
         ssp["bhj"] + ssp["smj"] + ssp["bnlj"] == 0
         and "CartesianProduct" not in psp),
        ("one scan, one user_id shuffle reused by every window pass + "
         "the final aggregate (Catalyst reuses the sort order)",
         ssp["ops"].get("FileScan", 0) == 1 and ssp["exchanges"] <= 2),
        ("the spike predicate is whole-stage codegen (no Python)",
         ssp["python"] == 0),
    ])

    rs = qreg.run_spark(spark, SF, "traj_resample")
    prs = plan_of(rs)
    srs = summarize(prs)
    audit("traj_resample (fixed-grid interpolation)", rs, [
        ("tick expansion is a Generate (explode) node — work is "
         "proportional to emitted ticks, never a tick x segment range "
         "join", srs["ops"].get("Generate", 0) >= 1
         and srs["bhj"] + srs["smj"] + srs["bnlj"] == 0),
        ("no cartesian, no Python crossing",
         "CartesianProduct" not in prs and srs["python"] == 0),
        ("single scan of the events input",
         srs["ops"].get("FileScan", 0) == 1),
    ])

    mm = qreg.run_spark(spark, SF, "map_match")
    pmm = plan_of(mm)
    smm = summarize(pmm)
    audit("map_match (snap to nearest road segment)", mm, [
        ("the tiny segment side rides a broadcast — the only "
         "nested-loop is points x 25 broadcast segments (the honest "
         "plan for a small road set; continent-scale road networks "
         "take the dwithin_join stencil instead)",
         smm["bnlj"] == 1 and "BroadcastExchange" in pmm),
        ("nearest pick is a map-side-pruned window top-1 "
         "(WindowGroupLimit)", smm["wgl"] >= 1),
        ("projection/clamp/distance tree is whole-stage codegen "
         "(no Python)", smm["python"] == 0),
    ])

    hd = qreg.run_spark(spark, SF, "hausdorff_pairs")
    phd = plan_of(hd)
    shd = summarize(phd)
    audit("hausdorff_pairs (trajectory-similarity join)", hd, [
        ("candidate pairs ride the shared-cell equi-join over the "
         "DISTINCT (user, cell) surface — never user x user, no "
         "cartesian", shd["bhj"] + shd["smj"] >= 1
         and "CartesianProduct" not in phd and shd["bnlj"] == 0),
        ("the stay-centroid relation is checkpoint-materialized — all "
         "five references (uc + both directed passes) scan the stored "
         "rows, the 3-window stay pipeline runs once",
         phd.count("Scan ExistingRDD") >= 5
         and "Window" not in phd),
        ("directed max-min distances are grouped partial+final "
         "aggregates, pure Catalyst",
         shd["ops"].get("HashAggregate", 0) >= 2
         and shd["python"] == 0),
    ])

    iq = qreg.run_spark(spark, SF, "image_quality")
    piq = plan_of(iq)
    siq = summarize(piq)
    audit("image_quality (PNG quality gates)", iq, [
        ("exactly two Arrow crossings — PNG synthesis and the decode+"
         "kernel pass — never per-row Python",
         piq.count("MapInPandas") == 2 and "EvalPython" not in piq),
        ("zero shuffles, zero joins — a pure per-partition decode "
         "pipeline over one pruned scan",
         siq["exchanges"] == 0
         and siq["bhj"] + siq["smj"] + siq["bnlj"] == 0
         and siq["ops"].get("FileScan", 0) == 1),
    ])

    sx = qreg.run_spark(spark, SF, "segment_intersections")
    psx = plan_of(sx)
    ssx = summarize(psx)
    audit("segment_intersections (linestring-intersection join)", sx, [
        ("the tiny road side rides a broadcast — the only nested-loop "
         "is edges x 25 broadcast road segments (the honest plan for a "
         "small road set; continent-scale road networks cell-block "
         "edge bboxes via the dwithin_join stencil)",
         ssx["bnlj"] == 1 and "BroadcastExchange" in psx
         and "CartesianProduct" not in psx),
        ("one scan of events; one user_id shuffle feeds both window "
         "passes (rn + LEAD share the sort order)",
         ssx["ops"].get("FileScan", 0) >= 1 and ssx["exchanges"] <= 2),
        ("the four int64 orientation cross-products and the straddle "
         "predicate are whole-stage codegen (no Python, no doubles)",
         ssx["python"] == 0),
    ])

    iw = qreg.run_spark(spark, SF, "idw_interpolate")
    piw = plan_of(iw)
    siw = summarize(piw)
    audit("idw_interpolate (inverse-distance-weighted interpolation)",
          iw, [
        ("candidates ride the dwithin_join neighbor-cell hash "
         "equi-join — never a query x sample cross join",
         siw["bhj"] + siw["smj"] >= 1 and "CartesianProduct" not in piw),
        ("the only nested-loop is the bounded 9-row offset stencil "
         "broadcast", siw["bnlj"] <= 1),
        ("k=3 nearest pick is a map-side-pruned window top-k "
         "(WindowGroupLimit); pivot + IDW blend are grouped "
         "aggregates + one codegen expression (no Python)",
         siw["wgl"] >= 1 and siw["python"] == 0),
    ])

    ir = qreg.run_spark(spark, SF, "image_resize")
    pir = plan_of(ir)
    sir = summarize(pir)
    audit("image_resize (real-PNG thumbnail stage)", ir, [
        ("exactly three Arrow crossings — PNG synthesis, the "
         "decode+resize+re-encode pass, and the decode+checksum "
         "kernel — never per-row Python",
         pir.count("MapInPandas") == 3 and "EvalPython" not in pir),
        ("zero shuffles, zero joins — a pure per-partition pipeline "
         "over one pruned scan",
         sir["exchanges"] == 0
         and sir["bhj"] + sir["smj"] + sir["bnlj"] == 0
         and sir["ops"].get("FileScan", 0) == 1),
    ])

    hdr = ("# PLANS.md — physical-plan audit (generated by "
           "tools/audit_plans.py)\n\n"
           "Every section asserts the plan properties the engine promises "
           "(SURVEY.md §4.3). Regenerate after operator changes; the "
           "script exits nonzero if a promise regresses.\n\n")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write(hdr + "\n".join(sections))
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
