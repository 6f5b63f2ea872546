"""Training-corpus preparation queries (round-2 widening, batch 2):
vocabulary heavy hitters, eval-set decontamination, leakage-free
train/val splits, greedy sequence packing, weighted source mixing,
vocabulary-rarity scoring.

Registered from ``queries._register_extras`` AFTER the queries_ml
extras and BEFORE the rows-only raster pair (driver-window discipline —
every query here carries a full DuckDB value-hash oracle).

These close the remaining gaps a real LLM-pretraining pipeline hits
after dedup: what's in the vocabulary, is the eval benchmark leaking
into the corpus, do duplicate clusters straddle the train/val boundary,
how do variable-length documents become fixed-budget training
sequences, how are sources mixed to target weights, and which docs sit
in a rare-vocabulary band. The reference has none of this surface (it
trains on image tiles); the task brief's training-data pipeline does.

Scale notes per query sit on the registrations; shared themes:
candidate generation stays equi-join (decontamination reuses the
materialized shingle table), folds that need order run inside bounded
hash shards (packing), and split assignment is rowwise hash arithmetic
identical in both engines.
"""

from __future__ import annotations

from .functions import DUCKDB_BASE, SPARK_BASE
from .queries import QUERIES, Q, _h, _reg, _shared
from .queries_text import _components_duck, _ds_cached, _tok

# ===========================================================================
# vocab_topk — global token heavy hitters
# ===========================================================================
# ORDER BY + LIMIT, not a global rank window: Spark plans it as
# TakeOrderedAndProject (per-partition top-k, k*P-row driver merge) —
# scale-safe where ROW_NUMBER() OVER (ORDER BY c) would single-task the
# whole vocabulary. The map-side partial COUNT shrinks the shuffle to
# one row per distinct token per partition first. The rank column is a
# window over the 20 surviving rows only.

_TOPK = 20


def _vocab_sql(base: int) -> str:
    return f"""
WITH {_tok(base)},
tc AS (SELECT tok, COUNT(*) AS n_occurrences FROM tok GROUP BY tok),
top AS (SELECT tok, n_occurrences FROM tc
        ORDER BY n_occurrences DESC, tok LIMIT {_TOPK})
SELECT tok, n_occurrences,
       ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, tok) AS vocab_rank
FROM top
"""


# ===========================================================================
# decontaminate — eval-benchmark shingle containment
# ===========================================================================
# Dedup asks "are A and B near-identical" (Jaccard, symmetric);
# decontamination asks "does corpus doc C CONTAIN eval doc E"
# (containment = |sh(E) ∩ sh(C)| / |sh(E)|, asymmetric) — a corpus page
# quoting a whole benchmark item scores ~1.0 here while its Jaccard can
# be tiny. Eval set = doc_id % 20 = 0 (a deterministic stand-in for the
# broadcast benchmark table a production run would join). Candidates
# come from the same materialized shingle table as the dedup suite —
# equi-join on shingle id, never a cross product; the eval side is tiny
# by construction, so at scale the shingle->eval join broadcasts. The
# corpus side excludes the eval partition entirely (doc_id % 20 <> 0):
# eval-vs-eval overlap is not corpus contamination (review r2).
# Threshold 0.05 keeps the oracle non-vacuous at sf0.01 (including the
# two true containments at 1.0/0.97 — VERDICT r1's de-vacuation rule).

_DECON_BODY = """
SELECT eval_id, corpus_id,
       ROUND(CAST(i AS DOUBLE) / en.n, 6) AS containment
FROM (SELECT e.doc_id AS eval_id, c.doc_id AS corpus_id, COUNT(*) AS i
      FROM (SELECT doc_id, sid FROM {ds} WHERE doc_id % 20 = 0) e
      JOIN {ds} c ON c.sid = e.sid AND c.doc_id % 20 <> 0
      GROUP BY e.doc_id, c.doc_id) inter
JOIN (SELECT doc_id, COUNT(*) AS n FROM {ds}
      WHERE doc_id % 20 = 0 GROUP BY doc_id) en
  ON en.doc_id = inter.eval_id
WHERE CAST(i AS DOUBLE) / en.n >= 0.05E0
"""


def _decon_fn(spark, sf_dir):
    # subqueries over the cached shingle view, not CTEs — see the
    # cache-substitution note above queries_text._JACCARD_BODY
    _ds_cached(spark)
    return spark.sql(_DECON_BODY.format(ds="ds_cached"))


def _decon_duck(base: int) -> str:
    from .queries_text import _shingles
    return (f"WITH {_tok(base)}, {_shingles(base).strip()}, "
            f"q AS ({_DECON_BODY.format(ds='ds')}) SELECT * FROM q")


# ===========================================================================
# leakfree_split — dedup-aware train/val split
# ===========================================================================
# A plain hash split leaks: two near-duplicate documents land on
# opposite sides of the train/val boundary and the eval score is
# contaminated. Splitting by the hash of the duplicate-CLUSTER id
# (connected components over the LSH pairs, exactly dedup_components'
# machinery) keeps every cluster on one side by construction. Rowwise
# hash arithmetic (_h) is identical in both engines; the oracle wraps
# the same recursive-CTE closure dedup_components is checked against.

_SPLIT_SEED, _SPLIT_MOD, _TRAIN_PARTS = 97, 10, 8

_SPLIT_CASE = (f"CASE WHEN {_h('component', _SPLIT_SEED, _SPLIT_MOD)} "
               f"< {_TRAIN_PARTS} THEN 'train' ELSE 'val' END")


def _split_fn(spark, sf_dir):
    from pyspark.sql import functions as F

    from .queries_text import lsh_components_df
    comp = lsh_components_df(spark)
    return comp.select(F.col("node").alias("doc_id"), "component",
                       F.expr(_SPLIT_CASE).alias("split"))


def _split_duck() -> str:
    return (f"WITH q AS ({_components_duck(DUCKDB_BASE)}) "
            f"SELECT node AS doc_id, component, {_SPLIT_CASE} AS split "
            "FROM q")


# ===========================================================================
# pack_sequences — greedy token-budget packing
# ===========================================================================
# The fold is sequential per shard (each pack boundary depends on the
# running total), so no window expression computes it; the operator is
# ONE applyInPandas over seeded hash shards (operators/corpus.py — the
# full semantics + scale contract live there). The oracle replays the
# identical greedy fold as a recursive CTE stepping one row per shard
# per iteration — a genuinely different evaluation strategy, so a hash
# match checks the semantics, not the implementation.

_PACK_SHARDS, _PACK_BUDGET, _PACK_SEED = 8, 256, 83

_PACK_NT = ("CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 "
            "AS BIGINT)")


def _pack_fn(spark, sf_dir):
    from .operators.corpus import pack_greedy
    d = spark.sql(
        f"SELECT doc_id, CAST({_h('doc_id', _PACK_SEED, _PACK_SHARDS)} "
        f"AS BIGINT) AS shard, {_PACK_NT} AS n_tokens FROM documents")
    return pack_greedy(d, id_col="doc_id", tokens_col="n_tokens",
                       shard_col="shard", budget=_PACK_BUDGET)


def _pack_duck() -> str:
    return f"""
WITH RECURSIVE
d AS (SELECT doc_id,
             CAST({_h('doc_id', _PACK_SEED, _PACK_SHARDS)} AS BIGINT)
                 AS shard,
             {_PACK_NT} AS n_tokens
      FROM documents),
r AS (SELECT doc_id, shard, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id)
                 AS rn
      FROM d),
st(shard, rn, doc_id, n_tokens, cum, pack) AS (
    SELECT shard, rn, doc_id, n_tokens, n_tokens, CAST(0 AS BIGINT)
    FROM r WHERE rn = 1
    UNION ALL
    SELECT r.shard, r.rn, r.doc_id, r.n_tokens,
           CASE WHEN st.cum + r.n_tokens > {_PACK_BUDGET}
                THEN r.n_tokens ELSE st.cum + r.n_tokens END,
           CASE WHEN st.cum + r.n_tokens > {_PACK_BUDGET}
                THEN st.pack + 1 ELSE st.pack END
    FROM st JOIN r ON r.shard = st.shard AND r.rn = st.rn + 1)
SELECT doc_id, shard, n_tokens, CAST(pack AS BIGINT) AS pack_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard, pack ORDER BY rn)
            AS BIGINT) AS pack_pos
FROM st
"""


# ===========================================================================
# mix_sources — weighted source mixing with data-derived rates
# ===========================================================================
# stratified_sample's rates are CASE literals; a real mixture job
# derives them from per-source counts AND target weights ("source s
# contributes w_s shares of the smallest source's size"). Two-pass
# shape: per-source counts (tiny agg), the min as a scalar, then a
# rowwise seeded-hash Bernoulli keep via integer cross-multiplication
# (hash * W * n_s < w_s * n_min * M — P(keep) = w_s/W * n_min/n_s,
# always <= 1) — no doubles, identical text in both engines. Weights
# cycle 1..3 from the source id, so the kept mixture is visibly
# non-uniform even on the driver's perfectly balanced sources (the
# de-vacuation rule: equal-share mixing of equal sources keeps
# everything and proves nothing). At scale: counts agg is
# map-side-partial over few groups, the rates dim broadcasts, the
# filter is pure codegen.

_MIX_M, _MIX_SEED, _MIX_W = 1000003, 13, 3

_MIX_SQL = f"""
WITH c AS (SELECT source, COUNT(*) AS n,
                  CAST(SUBSTR(source, 4) AS BIGINT) % {_MIX_W} + 1 AS w
           FROM documents GROUP BY source),
m AS (SELECT MIN(n) AS n_min FROM c)
SELECT d.doc_id, d.source, c.w
FROM documents d JOIN c ON c.source = d.source CROSS JOIN m
WHERE {_h('d.doc_id', _MIX_SEED, _MIX_M)} * {_MIX_W} * c.n
      < c.w * m.n_min * {_MIX_M}
"""


# ===========================================================================
# doc_rarity — per-doc global-vocabulary rarity signal
# ===========================================================================
# The TF-IDF-shaped join: global token frequencies (the vocabulary dim)
# joined back onto each doc's tokens, aggregated per doc. The rarity
# ratio (corpus-mean token frequency / doc-mean token frequency, higher
# = rarer vocabulary) is the standard "gibberish vs boilerplate" filter
# axis; min/max frequency bound the doc's vocabulary band. Continuous
# ratios, not a rare-count threshold: the driver corpus has a 31-token
# vocabulary with no rare tokens at any sf, so any threshold flag is
# vacuously all-zero. Exact integer sums until one final double
# division in identical order — no logs (log is not
# correctly-rounded-guaranteed across engines). At scale: tc is
# vocab-sized (map-side partial agg collapses token skew) and
# broadcastable against the token stream; per-doc groups are bounded.

def _rarity_sql(base: int) -> str:
    return f"""
WITH {_tok(base)},
tc AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
g AS (SELECT CAST(SUM(c * c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
          AS gmean FROM tc),
d AS (SELECT t.doc_id, COUNT(*) AS n_tok,
             MIN(tc.c) AS min_tf, MAX(tc.c) AS max_tf,
             CAST(SUM(tc.c) AS BIGINT) AS sum_tf
      FROM tok t JOIN tc ON tc.tok = t.tok
      GROUP BY t.doc_id)
SELECT doc_id, n_tok, min_tf, max_tf,
       ROUND(CAST(sum_tf AS DOUBLE) / n_tok, 6) AS mean_tf,
       ROUND(g.gmean / (CAST(sum_tf AS DOUBLE) / n_tok), 6)
           AS rarity_ratio
FROM d CROSS JOIN g
"""


# ===========================================================================
# bm25_score — log-free BM25 term scoring against data-derived query terms
# ===========================================================================
# Okapi BM25 (k1=1.2, b=0.75) per (doc, query-term), the standard
# relevance-ranking / quality-filter scorer. Two deviations from the
# textbook form, both deliberate:
#  * log-free idf: the Lucene/ES idf is ln(1 + (N-df+0.5)/(df+0.5))
#    (non-negative; the classic Robertson ln-odds flips sign for terms
#    in >N/2 docs); ln is NOT correctly-rounded across libm versions
#    (doc_rarity note), so the score uses the ODDS itself — a strictly
#    monotone transform of the Lucene idf, hence rank-identical per
#    term (asserted vs math.log in test_corpus) — and every factor
#    stays an exact int64 cross-multiplication until ONE final double
#    division.
#    With k1=6/5, b=3/4, scaling numerator and denominator by 20*sum_dl:
#      tf_sat   = 44*tf*sum_dl / (20*sum_dl*tf + 6*sum_dl + 18*dl*N)
#      bm25_term = tf_sat * (2N - 2df + 1)/(2df + 1)    [one rational]
#    Magnitude: the largest product is 44*tf*sum_dl*(2N-2df+1); at sf1
#    (5e4 docs, ~4e6 total tokens, per-doc tf <~ 100) that is ~2e18 —
#    inside int64 but only ~4x headroom, so beyond ~sf2 the numerator
#    moves to DECIMAL(38,0) partials (same trick as morans_i's note).
#  * per-term rows, not a summed per-doc score: no cross-row double
#    sum, so the oracle hash is fold-order-independent (discipline).
# Query terms are data-derived (vocab ranks 5-7 by global count, token
# tiebreak) so the query is self-contained and non-vacuous at every sf.
# Plan shape: tf is the big relation (doc x distinct-term); q is 3 rows
# and dl/tot are doc-count/scalar dims — every join is an equi-join
# with a broadcastable small side.

def _bm25_sql(base: int) -> str:
    return f"""
WITH {_tok(base)},
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
       FROM tok GROUP BY doc_id),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, tok),
dfr AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
        FROM tf GROUP BY tok),
q AS (SELECT tok, df FROM dfr ORDER BY df DESC, tok LIMIT 3 OFFSET 4)
SELECT t.doc_id, t.tok, t.tf, q.df, d.dl,
       ROUND(CAST(44 * t.tf * sum_dl AS DOUBLE)
             / CAST(20 * sum_dl * t.tf + 6 * sum_dl
                    + 18 * d.dl * n_docs AS DOUBLE), 6) AS tf_sat,
       ROUND(CAST(44 * t.tf * sum_dl
                  * (2 * n_docs - 2 * q.df + 1) AS DOUBLE)
             / CAST((20 * sum_dl * t.tf + 6 * sum_dl
                     + 18 * d.dl * n_docs)
                    * (2 * q.df + 1) AS DOUBLE), 6) AS bm25_term
FROM tf t
JOIN q ON q.tok = t.tok
JOIN dl d ON d.doc_id = t.doc_id
CROSS JOIN tot
"""


def weighted_mix(df, weights: dict, *, source_col: str = "source",
                 id_col: str = "doc_id", seed: int = _MIX_SEED,
                 m: int = _MIX_M):
    """Operator face of mix_sources for jobs: keep each source at
    w_s/W * n_min/n_s (every source contributes w_s shares of the
    smallest source's size). Unlisted sources get weight 1.

    Driver traffic is one tiny per-source count agg (the rates dim,
    broadcast back); the keep filter is the same integer
    cross-multiplied hash-Bernoulli as the mix_sources oracle — no
    doubles, deterministic at any parallelism.
    """
    from pyspark.sql import functions as F
    wmap = F.create_map(*[F.lit(x) for kv in weights.items()
                          for x in kv]) if weights else None
    c = df.groupBy(source_col).agg(F.count("*").alias("__n"))
    if wmap is not None:
        c = c.withColumn("__w", F.coalesce(
            wmap[F.col(source_col)], F.lit(1)).cast("long"))
    else:
        c = c.withColumn("__w", F.lit(1).cast("long"))
    n_min = c.agg(F.min("__n")).first()[0]
    big_w = max(list(weights.values()) + [1]) if weights else 1
    # id reduced mod m BEFORE the Knuth multiply: identical value to
    # the single-mod form, but ids above ~3.5e9 (md5-derived int48
    # keys) can't overflow the int64 product (r2 advice; matches the
    # mix_sources oracle's _h text)
    h = (((F.col(id_col) % m) * F.lit(2654435761) + F.lit(seed)) % m
         + m) % m
    return df.join(F.broadcast(c), source_col) \
             .filter(h * big_w * F.col("__n")
                     < F.col("__w") * F.lit(int(n_min)) * m) \
             .drop("__n", "__w")


# ===========================================================================
# dedup_spanfrac — per-doc duplicated-span coverage fraction
# ===========================================================================
# The span-level dedup signal (Lee et al.-style "what fraction of this
# document's tokens sit inside an n-gram that also occurs in another
# document"): pair queries (dedup_ngram_jaccard) say WHICH docs overlap,
# this says HOW MUCH of each doc is duplicated — the filter axis a
# pipeline thresholds on ("drop docs >80% duplicated"). Cross-doc only:
# a shingle repeated within one doc does not count. Coverage is the
# union of 3-token windows over shared-shingle starts, computed exactly
# via DISTINCT covered positions (no interval arithmetic). At scale:
# shared-shingle detection is a map-side-partial groupBy on the hash
# sid; candidates ride the sid equi-join; covered-position DISTINCT is
# per-doc bounded.

def _spanfrac_sql(base: int) -> str:
    from .functions import md5_id_sql
    sid = md5_id_sql("s", base)
    w = "OVER (PARTITION BY doc_id ORDER BY pos)"
    return f"""
WITH {_tok(base)},
sh AS (SELECT doc_id, pos,
              tok || '_' || LEAD(tok, 1) {w} || '_' || LEAD(tok, 2) {w} AS s
       FROM tok),
shp AS (SELECT doc_id, pos, {sid} AS sid FROM sh WHERE s IS NOT NULL),
shared AS (SELECT sid FROM (SELECT DISTINCT doc_id, sid FROM shp) d
           GROUP BY sid HAVING COUNT(*) >= 2),
cov AS (SELECT DISTINCT p.doc_id, p.pos + o.off AS cpos
        FROM shp p JOIN shared u ON u.sid = p.sid
        CROSS JOIN (SELECT 0 AS off UNION ALL SELECT 1
                    UNION ALL SELECT 2) o),
n AS (SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id)
SELECT n.doc_id, n.n_tok,
       CAST(COALESCE(c.n_dup, 0) AS BIGINT) AS n_dup_tok,
       ROUND(CAST(COALESCE(c.n_dup, 0) AS DOUBLE) / n.n_tok, 6)
           AS dup_frac
FROM n LEFT JOIN (SELECT doc_id, COUNT(*) AS n_dup
                  FROM cov GROUP BY doc_id) c
  ON c.doc_id = n.doc_id
"""


# ===========================================================================
# dedup_incremental — new-batch-vs-corpus dedup (continuous crawl)
# ===========================================================================
# The batch variants above dedup a corpus against ITSELF; a continuous
# crawl pipeline instead asks, per newly-crawled document: is it an
# exact copy of something already in the corpus, a near-duplicate of
# one, or genuinely new? Batch = `doc_id % 5 = 0` (a deterministic 20%
# slice standing in for "today's crawl"); corpus = the rest.
#
# Verdict joins, in priority order (an exact copy is also a near-dup —
# identical shingles give identical signatures — so the CASE tests
# exact first):
#   exact_dup: batch semi-joins corpus on full text. At scale this is
#     an equi-join on xxhash64(text) against the corpus's persisted
#     exact-dedup index — never on the raw string.
#   near_dup: batch LSH band tuples equi-join the corpus's band tuples.
#     At scale the corpus side IS the persisted LSH index (one table
#     bucketed on (band, x, y), appended as batches are accepted), so
#     the probe is a bucket-local join that never reshuffles the corpus;
#     the batch side is small enough to broadcast. Here both sides read
#     one signature table split by the batch predicate — the same
#     relation, with the split expressed as partition pruning.
# Every verdict row is computed rowwise from two LEFT-JOIN existence
# probes — no cross product, no skew (band buckets are minhash-uniform).

_INC_BATCH = "doc_id % 5 = 0"
_INC_BODY = f"""
SELECT d.doc_id, d.source,
       CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
            WHEN n.doc_id IS NOT NULL THEN 'near_dup'
            ELSE 'new' END AS verdict
FROM (SELECT doc_id, source FROM documents WHERE {_INC_BATCH}) d
LEFT JOIN (SELECT DISTINCT b.doc_id
           FROM documents b JOIN documents c ON c.text = b.text
           WHERE b.{_INC_BATCH} AND NOT (c.{_INC_BATCH})) e
  ON e.doc_id = d.doc_id
LEFT JOIN (SELECT DISTINCT a.doc_id
           FROM (SELECT * FROM {{bands}} WHERE {_INC_BATCH}) a
           JOIN (SELECT * FROM {{bands}} WHERE NOT ({_INC_BATCH})) c
             ON a.band = c.band AND a.x = c.x AND a.y = c.y) n
  ON n.doc_id = d.doc_id
"""


def _inc_fn(spark, sf_dir):
    from .queries_text import _BANDS_SUB, _sig_cached
    _sig_cached(spark)
    return spark.sql(_INC_BODY.format(bands=_BANDS_SUB.format(
        sig="sig_cached")))


def _inc_duck(base: int) -> str:
    from .queries_text import _BANDS_SUB, _SIG, _shingles
    return (f"WITH {_tok(base)}, {_shingles(base).strip()}, {_SIG} "
            + _INC_BODY.format(bands=_BANDS_SUB.format(sig="sig")))


# ===========================================================================
# dedup_bloom — Bloom-filter first probe of batch-vs-corpus dedup
# ===========================================================================
# The cheap front of dedup_incremental: a distributed Bloom index over
# the corpus text keys (operators/bloom.py — the filter is a
# (bucket, bitmap) TABLE, never a driver object), probed by the batch.
# bloom_maybe = 0 is a GUARANTEED-new verdict (no false negatives), so
# those docs skip the exact/LSH probes entirely; the false-positive
# rate is measured in test_bloom. The oracle is a different algorithm
# over the same hash text: positions as rows, DISTINCT corpus position
# set, LEFT-join bit test — bitmap and set formulations must agree on
# every verdict.

def _bloom_key(base: int) -> str:
    from .functions import md5_id_sql
    return md5_id_sql("text", base)


def _bloom_fn(spark, sf_dir):
    from .operators.bloom import bloom_probe, build_bloom_index
    keys = spark.sql(f"SELECT doc_id, {_bloom_key(SPARK_BASE)} AS key "
                     "FROM documents")
    corpus = keys.filter(f"NOT ({_INC_BATCH})")
    batch = keys.filter(_INC_BATCH)
    idx = build_bloom_index(corpus, "key")
    return bloom_probe(batch, idx, "key") \
        .select("doc_id", "bucket", "n_pos", "n_hit", "bloom_maybe")


def _bloom_duck(base: int) -> str:
    from .operators.bloom import bloom_bucket_sql, bloom_pos_sql
    parts = " UNION ALL ".join(
        f"SELECT doc_id, bucket, {bloom_pos_sql('key', j, 4096)} AS pos "
        "FROM kb" for j in range(4))
    return f"""
WITH keys AS (SELECT doc_id, {_bloom_key(base)} AS key FROM documents),
kb AS (SELECT doc_id, key, {bloom_bucket_sql('key', 8)} AS bucket
       FROM keys),
pos AS ({parts}),
corpus AS (SELECT DISTINCT bucket, pos FROM pos
           WHERE NOT ({_INC_BATCH})),
bp AS (SELECT DISTINCT doc_id, bucket, pos FROM pos
       WHERE {_INC_BATCH}),
agg AS (SELECT b.doc_id, b.bucket,
               CAST(COUNT(*) AS INT) AS n_pos,
               CAST(SUM(CASE WHEN c.pos IS NOT NULL THEN 1 ELSE 0 END)
                    AS INT) AS n_hit
        FROM bp b LEFT JOIN corpus c
          ON c.bucket = b.bucket AND c.pos = b.pos
        GROUP BY b.doc_id, b.bucket)
SELECT doc_id, bucket, n_pos, n_hit,
       CASE WHEN n_hit = n_pos THEN 1 ELSE 0 END AS bloom_maybe
FROM agg
"""


def register_corpus_extras() -> None:
    # idempotent under every import entry point (register_ann_ivf /
    # register_ml_extras pattern)
    if "vocab_topk" in QUERIES:
        return
    _reg("vocab_topk", Q(
        tables=("documents",),
        spark_sql=_vocab_sql(SPARK_BASE),
        duck_sql=_vocab_sql(DUCKDB_BASE),
        doc=f"corpus: global top-{_TOPK} token frequencies — ORDER BY + "
            "LIMIT plans as TakeOrderedAndProject (per-partition top-k), "
            "rank window only over the survivors"))
    _reg("decontaminate", Q(
        tables=("documents",), fn=_decon_fn,
        duck_sql=_decon_duck(DUCKDB_BASE),
        doc="corpus: eval-set decontamination — asymmetric shingle "
            "containment of eval docs in corpus docs over the "
            "materialized shingle table (equi-join candidates only)"))
    _reg("leakfree_split", Q(
        tables=("documents",), fn=_split_fn,
        duck_sql=_split_duck(),
        doc="corpus: duplicate-cluster-aware train/val split — hash of "
            "the connected-component id, so near-dup clusters never "
            "straddle the boundary; vs the recursive-CTE closure oracle"))
    _reg("pack_sequences", Q(
        tables=("documents",), fn=_pack_fn,
        duck_sql=_pack_duck(),
        doc=f"corpus: greedy sequence packing into {_PACK_BUDGET}-token "
            f"packs over {_PACK_SHARDS} hash shards — sequential fold "
            "via ONE applyInPandas (operators/corpus.py) vs a "
            "recursive-CTE replay oracle"))
    _shared("mix_sources", ("documents",), _MIX_SQL,
            doc="corpus: weighted source mixing — data-derived rates "
                "(w_s shares of the smallest source) via integer "
                "cross-multiplied hash-Bernoulli; counts agg + "
                "broadcast rates dim + codegen filter")
    _reg("doc_rarity", Q(
        tables=("documents",),
        spark_sql=_rarity_sql(SPARK_BASE),
        duck_sql=_rarity_sql(DUCKDB_BASE),
        doc="corpus: per-doc vocabulary-rarity ratio + term-frequency "
            "band — the TF-IDF-shaped join (global counts dim joined "
            "back onto the token stream)"))
    _reg("bm25_score", Q(
        tables=("documents",),
        spark_sql=_bm25_sql(SPARK_BASE),
        duck_sql=_bm25_sql(DUCKDB_BASE),
        doc="corpus: log-free BM25 (k1=1.2, b=0.75) per doc x "
            "query-term — odds idf (rank-identical monotone transform "
            "of the Lucene ln(1+odds) idf), exact int64 "
            "cross-multiplication, one final double division; query "
            "terms = vocab ranks 5-7"))
    _reg("dedup_spanfrac", Q(
        tables=("documents",),
        spark_sql=_spanfrac_sql(SPARK_BASE),
        duck_sql=_spanfrac_sql(DUCKDB_BASE),
        doc="dedup: per-doc duplicated-span coverage — fraction of "
            "token positions inside a cross-doc-shared 3-gram (exact "
            "union via DISTINCT covered positions; sid equi-join "
            "candidates)"))
    _reg("dedup_incremental", Q(
        tables=("documents",), fn=_inc_fn,
        duck_sql=_inc_duck(DUCKDB_BASE),
        doc="dedup: incremental new-batch-vs-corpus verdicts (exact "
            "semi-probe + LSH-band probe of the corpus index; the "
            "continuous-crawl workflow — batch joins the persisted "
            "index, corpus never reshuffles)"))
    _reg("dedup_bloom", Q(
        tables=("documents",), fn=_bloom_fn,
        duck_sql=_bloom_duck(DUCKDB_BASE),
        doc="dedup: distributed Bloom-filter first probe — (bucket, "
            "bitmap) index TABLE over corpus keys, batch probes via "
            "bucket equi-join + Arrow bit test; no false negatives, "
            "oracle = set-semi-join formulation of the same filter"))


# Completion hook for the queries_corpus-first import path (mirrors
# queries_ml's): the `from .queries import ...` line above pulls the
# whole registration chain in before register_corpus_extras exists, so
# queries._register_extras skipped us via its hasattr guard.
from . import queries as _queries_mod  # noqa: E402

if ("dedup_phash" in _queries_mod.QUERIES
        and "vocab_topk" not in _queries_mod.QUERIES):
    register_corpus_extras()
    _queries_mod._finalize_window_order()
