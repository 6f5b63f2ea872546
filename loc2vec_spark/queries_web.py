"""Driver-contract faces of the crawl front door (WARC container +
HTML extraction, VERDICT r4 item 2).

Both faces run the REAL byte paths — build_warc writes genuine
WARC/1.0 gzip-member archives that parse_warc walks back, and
html_extract runs the real html.parser strip — over inputs synthesized
deterministically from the driver's ``documents`` table (pure-ASCII
single-spaced text, verified clean, so the DuckDB oracles are plain
string concatenation). A hash match therefore verifies the container
writer+walker round-trip and the boilerplate strip against independent
SQL derivations, the same mirror-oracle posture as the raster faces.

Registered from ``queries._register_extras`` (window placement is
declarative — queries.DRIVER_WINDOW).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T

from .queries import QUERIES, Q, _reg

# ---------------------------------------------------------------------------
# html_text_extract — synthesized page per document, real parser strip
# ---------------------------------------------------------------------------
# Four page variants exercise distinct parser paths (aside subtree,
# comment, entity decode in kept content, nested div); every variant's
# expected text is the same SQL concat the oracle computes.

_HTML_BUILD = """
SELECT doc_id,
       '<html><head><title>Doc ' || doc_id || ' (' || source
       || ')</title><script>var x = 1;</script><style>.a{margin:0}'
       || '</style></head><body><nav>home | about</nav><h1>' || lang
       || ' document</h1><p>' || text || '</p>'
       || CASE doc_id % 4
            WHEN 0 THEN '<aside>sponsored links</aside>'
            WHEN 1 THEN '<!-- tracking pixel -->'
            WHEN 2 THEN '<p>terms &amp; conditions</p>'
            ELSE '<div><p>appendix note</p></div>'
          END
       || '<footer>(c) corpus</footer></body></html>' AS html
FROM documents
"""

_HTML_ORACLE = """
SELECT doc_id,
       'Doc ' || doc_id || ' (' || source || ')' AS title,
       lang || ' document ' || text
       || CASE doc_id % 4 WHEN 2 THEN ' terms & conditions'
                          WHEN 3 THEN ' appendix note'
                          ELSE '' END AS text,
       CAST(LENGTH(lang || ' document ' || text
            || CASE doc_id % 4 WHEN 2 THEN ' terms & conditions'
                               WHEN 3 THEN ' appendix note'
                               ELSE '' END) AS BIGINT) AS n_chars
FROM documents
"""


def _html_fn(spark, sf_dir):
    from pyspark.sql import functions as F
    from .operators.html import html_extract_udf
    pages = spark.sql(_HTML_BUILD)
    return (pages.withColumn("ex", html_extract_udf()("html"))
            .select("doc_id", "ex.title", "ex.text",
                    F.length("ex.text").cast("bigint").alias("n_chars")))


# ---------------------------------------------------------------------------
# warc_records — write real .warc.gz bytes per batch, walk them back
# ---------------------------------------------------------------------------

_WARC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("payload_text", T.StringType()),
    T.StructField("payload_bytes", T.LongType()),
])

_WARC_ORACLE = """
SELECT doc_id,
       CASE WHEN doc_id % 5 = 0 THEN 404 ELSE 200 END AS status,
       'text/plain; charset=utf-8' AS content_type,
       text AS payload_text,
       CAST(LENGTH(text) AS BIGINT) AS payload_bytes
FROM documents
"""


def _warc_fn(spark, sf_dir):
    from .operators.warc import build_warc, parse_warc

    def roundtrip(batches):
        for pdf in batches:
            recs = [{
                "uri": f"http://corpus.test/doc/{int(d)}",
                "date": "2026-01-01T00:00:00Z",
                "status": 404 if int(d) % 5 == 0 else 200,
                "content_type": "text/plain; charset=utf-8",
                "body": str(t).encode("utf-8"),
            } for d, t in zip(pdf["doc_id"], pdf["text"])]
            # REAL bytes: gzip-member archive written then walked back
            parsed = parse_warc(build_warc(recs, gzip_members=True))
            yield pd.DataFrame({
                "doc_id": [int(r["uri"].rsplit("/", 1)[1])
                           for r in parsed],
                "status": [r["status"] for r in parsed],
                "content_type": [r["content_type"] for r in parsed],
                "payload_text": [r["body"].decode("utf-8")
                                 for r in parsed],
                "payload_bytes": [len(r["body"]) for r in parsed],
            })

    docs = spark.table("documents").select("doc_id", "text")
    return docs.mapInPandas(roundtrip, _WARC_SCHEMA)


def register_web_extras() -> None:
    if "html_text_extract" in QUERIES:
        return
    _reg("html_text_extract", Q(
        tables=("documents",), fn=_html_fn, duck_sql=_HTML_ORACLE,
        doc="crawl ingestion: per-document synthesized page through the "
            "REAL html.parser boilerplate strip (script/style/nav/aside/"
            "footer subtrees + comments dropped, entities decoded, "
            "whitespace collapsed) vs a plain SQL concat oracle; "
            "Arrow-batched pandas UDF, embarrassingly parallel"))
    _reg("warc_records", Q(
        tables=("documents",), fn=_warc_fn, duck_sql=_WARC_ORACLE,
        doc="crawl ingestion: per-batch REAL .warc.gz write + walk "
            "round-trip (gzip members, HTTP payload parse, bounded "
            "inflate) vs the source-column oracle; file-parallel at "
            "scale via sources-style binaryFile ingest (read_warc)"))


# Completion hook for the exotic queries_web-first import path (same
# rationale as queries_ml's): _register_extras may have run while this
# module was mid-initialization and skipped us via its hasattr guard.
from . import queries as _queries_mod  # noqa: E402

if ("w6_ranks" in _queries_mod.QUERIES
        and "html_text_extract" not in _queries_mod.QUERIES):
    register_web_extras()
    _queries_mod._finalize_window_order()
