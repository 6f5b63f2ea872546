"""Training-data pipeline queries: dedup, text analysis, similarity search.

Registered into the same QUERIES dict as :mod:`loc2vec_spark.queries`.
These are the large-scale-pipeline operators the engine adds beyond the
reference's own inventory (task brief: dedup via exact/minhash/simhash/
n-gram-jaccard/embedding-cosine, ANN search, text quality/langid/token/
fingerprint), each with a DuckDB oracle over the driver's ``documents`` /
``embeddings`` tables.

Portability notes:
- token ids come from DENSE_RANK over the distinct-token sort (binary
  UTF-8 collation is the default in both Spark and DuckDB), giving both
  engines identical integer ids without a shared string-hash function;
- minhash/simhash then work on those integer ids with the same
  multiplicative hashes as everywhere else in the engine.
"""

from __future__ import annotations

from .functions import DUCKDB_BASE, SPARK_BASE, cosine_sql
from .queries import DIM, Q, _h, _reg

# ---------------------------------------------------------------------------
# tokenizer fragments (the only engine-specific text in this module)
# ---------------------------------------------------------------------------

TOK_SPARK = ("tok AS (SELECT doc_id, p.pos AS pos, p.tok AS tok "
             "FROM documents "
             "LATERAL VIEW posexplode(split(text, ' ')) p AS pos, tok)")
TOK_DUCK = ("tok AS (SELECT doc_id, pos, string_split(text, ' ')[pos + 1] "
            "AS tok FROM documents "
            "CROSS JOIN (SELECT unnest(range(256)) AS pos) p "
            "WHERE pos < len(string_split(text, ' ')))")

# distinct-token integer ids — identical in both engines (binary collation)
TID = ("tid AS (SELECT tok, DENSE_RANK() OVER (ORDER BY tok) AS tok_id "
       "FROM (SELECT DISTINCT tok FROM tok) d)")

# word 3-gram shingles + distinct per doc + global shingle ids
SHINGLES = """
sh AS (SELECT a.doc_id, a.tok || '_' || b.tok || '_' || c.tok AS s
       FROM tok a
       JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
shd AS (SELECT DISTINCT doc_id, s FROM sh),
sid AS (SELECT s, DENSE_RANK() OVER (ORDER BY s) AS sid
        FROM (SELECT DISTINCT s FROM shd) d),
ds AS (SELECT doc_id, sid FROM shd JOIN sid USING (s))
"""


def _with_tok(body: str, extra_ctes: str = "") -> tuple[str, str]:
    """(spark_sql, duck_sql) wrapping engine-specific tokenizer CTEs."""
    return (f"WITH {TOK_SPARK}{extra_ctes}\n{body}",
            f"WITH {TOK_DUCK}{extra_ctes}\n{body}")


def _reg_tok(name: str, body: str, extra_ctes: str = "", doc: str = "",
             tables: tuple[str, ...] = ("documents",)) -> None:
    s, d = _with_tok(body, extra_ctes)
    _reg(name, Q(tables=tables, spark_sql=s, duck_sql=d, doc=doc))


# ===========================================================================
# Deduplication
# ===========================================================================

_reg("dedup_exact", Q(tables=("documents",), spark_sql="""
SELECT text, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
""", duck_sql="""
SELECT text, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
""", doc="dedup: exact (hash-groupBy on full text; canonical = min id)"))

_reg_tok("dedup_ngram_jaccard", f"""
, cnts AS (SELECT doc_id, COUNT(*) AS n FROM ds GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM ds a JOIN ds b ON a.sid = b.sid AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
SELECT doc_a, doc_b,
       ROUND(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 6) AS jaccard
FROM inter
JOIN cnts ca ON ca.doc_id = doc_a
JOIN cnts cb ON cb.doc_id = doc_b
WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.05E0
""".replace(", cnts", "cnts", 1),
         extra_ctes=", " + SHINGLES.strip() + ",",
         doc="dedup: word-3-gram Jaccard pairs (shingle equi-join, no "
             "cross product)")

# minhash signature: 8 hashes over shingle ids; LSH: 4 bands x 2 rows
_MH = [(2654435761 + 2 * t, 40503 + 3 * t) for t in range(8)]
_SIG = ("sig AS (SELECT doc_id, " + ", ".join(
    f"MIN((sid * {a} + {b}) % 2147483647) AS h{t}"
    for t, (a, b) in enumerate(_MH)) + " FROM ds GROUP BY doc_id)")
_BANDS = ("bands AS (" + " UNION ALL ".join(
    f"SELECT doc_id, {band} AS band, h{2 * band} AS x, h{2 * band + 1} AS y "
    f"FROM sig" for band in range(4)) + ")")

_reg_tok("dedup_minhash_lsh", f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands
FROM bands a
JOIN bands b ON a.band = b.band AND a.x = b.x AND a.y = b.y
            AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
""", extra_ctes=", " + SHINGLES.strip() + f", {_SIG}, {_BANDS}",
         doc="dedup: MinHash(8) + LSH(4 bands x 2) candidate pairs — "
             "shingle->minhash->band->bucket-join")

_reg_tok("dedup_minhash_sig", f"""
SELECT doc_id, {", ".join(f"h{t}" for t in range(8))} FROM sig
""", extra_ctes=", " + SHINGLES.strip() + f", {_SIG}",
         doc="dedup: MinHash signatures (deterministic, integer-id based)")

# 16-bit simhash over token ids (frequency-weighted)
_BITSUMS = ", ".join(
    f"SUM(CASE WHEN ((tok_id * {2654435761 + 5 * b} + {97 + 11 * b}) "
    f"% 2147483647) % 2 = 1 THEN 1 ELSE -1 END) AS s{b}"
    for b in range(16))
_SIMHASH = " + ".join(
    f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16))

_reg_tok("dedup_simhash", f"""
, bits AS (SELECT doc_id, {_BITSUMS}
           FROM tok JOIN tid USING (tok) GROUP BY doc_id)
SELECT doc_id, {_SIMHASH} AS simhash16 FROM bits
""".replace(", bits", "bits", 1),
         extra_ctes=f", {TID},",
         doc="dedup: 16-bit SimHash fingerprint (sign-sum of seeded "
             "per-token hash bits)")


def _embpairs_sql(base: int) -> str:
    cos = cosine_sql("a.embedding", "b.embedding", DIM, base)
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({cos}, 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {cos} >= 0.3E0
"""


_reg("dedup_embedding", Q(tables=("embeddings",),
                          spark_sql=_embpairs_sql(SPARK_BASE),
                          duck_sql=_embpairs_sql(DUCKDB_BASE),
                          doc="dedup: embedding-cosine near-dup pairs "
                              "(brute force baseline; LSH variant = "
                              "ann_lsh_bucket)"))


# ===========================================================================
# Similarity search (ANN)
# ===========================================================================

def _ann_brute_sql(base: int) -> str:
    cos = cosine_sql("q.embedding", "c.embedding", DIM, base)
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {cos} AS cosine
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id % 25 = 0),
ranked AS (SELECT query_id, neighbor_id, cosine,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id)
                      AS ann_rank
           FROM scored)
SELECT query_id, ann_rank, neighbor_id, ROUND(cosine, 6) AS cosine
FROM ranked WHERE ann_rank <= 10
"""


_reg("ann_bruteforce", Q(tables=("embeddings",),
                         spark_sql=_ann_brute_sql(SPARK_BASE),
                         duck_sql=_ann_brute_sql(DUCKDB_BASE),
                         doc="similarity: brute-force cosine top-10 "
                             "(exact baseline)"))


def _ann_lsh_sql(base: int) -> str:
    code = " + ".join(
        f"(CASE WHEN CAST(embedding[{i + base}] AS DOUBLE) > 0.0E0 "
        f"THEN {1 << i} ELSE 0 END)" for i in range(8))
    cos = cosine_sql("q.embedding", "c.embedding", DIM, base)
    return f"""
WITH codes AS (SELECT vec_id, embedding, {code} AS code FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cosine
  FROM codes q JOIN codes c ON q.code = c.code AND c.vec_id <> q.vec_id
  WHERE q.vec_id % 25 = 0),
ranked AS (SELECT query_id, neighbor_id, cosine,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id)
                      AS ann_rank
           FROM scored)
SELECT query_id, ann_rank, neighbor_id, ROUND(cosine, 6) AS cosine
FROM ranked WHERE ann_rank <= 10
"""


_reg("ann_lsh_bucket", Q(tables=("embeddings",),
                         spark_sql=_ann_lsh_sql(SPARK_BASE),
                         duck_sql=_ann_lsh_sql(DUCKDB_BASE),
                         doc="similarity: sign-projection LSH bucket join "
                             "(scale path — bucket equi-join instead of "
                             "all-pairs)"))


# ===========================================================================
# Text analysis
# ===========================================================================

def _hits(word: str) -> str:
    """Occurrence count of a word in text via replace-length arithmetic."""
    w = f" {word} "
    pad = "' ' || text || ' '"
    return (f"CAST((LENGTH({pad}) - LENGTH(REPLACE({pad}, '{w}', ''))) "
            f"/ {len(w)} AS BIGINT)")


_QUALITY_SQL = f"""
SELECT doc_id,
       LENGTH(text) AS n_char,
       LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_tokens,
       ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
             / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1), 6)
           AS avg_word_len,
       {_hits('the')} + {_hits('a')} + {_hits('of')} AS stopword_hits,
       ROUND(CAST({_hits('the')} + {_hits('a')} + {_hits('of')} AS DOUBLE)
             / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1), 6)
           AS stopword_ratio
FROM documents
"""

_reg("text_quality", Q(tables=("documents",), spark_sql=_QUALITY_SQL,
                       duck_sql=_QUALITY_SQL,
                       doc="text: quality scoring (length / word-length / "
                           "stopword ratios)"))

_TOKENS_SQL = """
SELECT doc_id,
       LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS ws_tokens,
       CAST(CEIL(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / 4.0E0)
            AS BIGINT) AS bpe_est_tokens
FROM documents
"""

_reg("text_tokens", Q(tables=("documents",), spark_sql=_TOKENS_SQL,
                      duck_sql=_TOKENS_SQL,
                      doc="text: token counting (whitespace + chars/4 "
                          "BPE estimate)"))

# langid: keyword-hit scoring against tiny per-language lists; argmax via
# CASE cascade (deterministic tie-break by list order)
_EN = f"({_hits('the')} + {_hits('a')} + {_hits('fast')} + {_hits('value')})"
_DE = f"({_hits('der')} + {_hits('die')} + {_hits('und')})"
_FR = f"({_hits('le')} + {_hits('la')} + {_hits('et')})"

_LANGID_SQL = f"""
SELECT doc_id, lang,
       CASE WHEN {_EN} >= {_DE} AND {_EN} >= {_FR} AND {_EN} > 0 THEN 'en'
            WHEN {_DE} >= {_FR} AND {_DE} > 0 THEN 'de'
            WHEN {_FR} > 0 THEN 'fr'
            ELSE 'unk' END AS lang_pred,
       {_EN} AS score_en, {_DE} AS score_de, {_FR} AS score_fr
FROM documents
"""

_reg("text_langid", Q(tables=("documents",), spark_sql=_LANGID_SQL,
                      duck_sql=_LANGID_SQL,
                      doc="text: language-ID heuristic (keyword n-gram "
                          "hit scoring)"))

_reg_tok("text_fingerprint", """
SELECT t.doc_id,
       SUM(tok_id * (t.pos + 1)) % 2147483647 AS fingerprint,
       COUNT(*) AS n_tokens
FROM tok t JOIN tid USING (tok)
GROUP BY t.doc_id
""", extra_ctes=f", {TID}",
         doc="text: document fingerprint (position-weighted rolling hash "
             "over collation-stable token ids)")
