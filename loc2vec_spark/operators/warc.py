"""WARC (Web ARChive) container ingestion — the crawl front door
(VERDICT r4 item 2).

Real LLM corpora arrive as ``.warc`` / ``.warc.gz`` archives (Common
Crawl layout: one gzip member per record). Pure stdlib: a writer for
fixtures, a record walker with the repo-wide parser-hardening contract,
and a Spark source with the same dead-letter split as
``sources.read_documents``.

Reference anchor: the S1 directory-as-table scan
(``/root/reference/src/data_loading.py:142-149``) generalized to the
archive container per SURVEY.md §2.10.

Hardening (round-4 discipline, see test_fuzz_media's contract):
- ONE exception contract — every structural corruption raises
  ValueError, so Spark quarantine paths are uniform;
- no header-driven allocation: Content-Length is validated against the
  remaining buffer BEFORE any slice;
- bounded gzip inflation — each member inflates through a
  max_length-capped decompressobj with an explicit ``eof`` check (a
  truncated trailer must quarantine, not decode as ok) and a global
  expansion cap so a gzip bomb cannot OOM an executor.

Scale shape: archives are whole-file units (gzip members are not
independently seekable without an index), so the Spark face parallelizes
per FILE via the binaryFile source — the Common Crawl operating model
(~1 GB per .warc.gz, 10^5-10^6 files per crawl). Record walking is
per-file CPU-bound Python over Arrow batches; at 100 TB the unit of
retry/quarantine is also the file, which is what operators actually
want when a crawler truncates an upload.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

#: refuse to inflate any single archive past this many bytes (gzip can
#: expand ~1000:1; text crawl data is ~3-10x). Generous for real shards,
#: fatal for bombs.
MAX_INFLATE = 1 << 31  # 2 GiB

_CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# writer (fixtures/tests; also the round-trip half of the warc_records
# query face)
# ---------------------------------------------------------------------------

def build_warc(records: list[dict], *, gzip_members: bool = False) -> bytes:
    """Records -> WARC/1.0 bytes.

    Each record dict: ``uri``, ``date`` (ISO string), ``status`` (int),
    ``content_type`` (of the HTTP payload), ``body`` (bytes). Emitted as
    WARC-Type: response with an HTTP/1.1 response payload — the Common
    Crawl shape. ``gzip_members=True`` compresses each record as its own
    gzip member (the ``.warc.gz`` convention, which is what makes the
    format splittable-by-record for indexers).
    """
    out = []
    for i, r in enumerate(records):
        body = r["body"]
        http = (f"HTTP/1.1 {int(r['status'])} "
                f"{_REASONS.get(int(r['status']), 'OK')}\r\n"
                f"Content-Type: {r['content_type']}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
                ).encode("ascii") + body
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{i:032x}>\r\n"
            f"WARC-Date: {r['date']}\r\n"
            f"WARC-Target-URI: {r['uri']}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("ascii")
        rec = head + http + _CRLF + _CRLF
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            rec = co.compress(rec) + co.flush()
        out.append(rec)
    return b"".join(out)


_REASONS = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
            500: "Internal Server Error"}


# ---------------------------------------------------------------------------
# walker
# ---------------------------------------------------------------------------

def _gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members -> inflated bytes, bomb-capped, with
    per-member trailer verification (the png_codec zlib lesson: a
    max_length-capped decompressobj skips the CRC check one-shot
    decompress performs — check ``eof`` explicitly)."""
    out, total, rest = [], 0, data
    while rest:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            chunk = d.decompress(rest, MAX_INFLATE - total + 1)
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member: {e!r}") from e
        total += len(chunk)
        if total > MAX_INFLATE:
            raise ValueError(
                f"archive inflates past the {MAX_INFLATE}-byte cap "
                "(gzip bomb or wrong file)")
        if not d.eof:
            raise ValueError("truncated gzip member (missing trailer)")
        out.append(chunk)
        rest = d.unused_data
    return b"".join(out)


def parse_warc(data: bytes) -> list[dict]:
    """WARC bytes (plain or .gz) -> list of record dicts.

    Each: ``{warc_type, record_id, uri, date, status, content_type,
    body}`` — ``status``/``content_type``/``body`` from the parsed HTTP
    payload for msgtype=response records, else None/payload-as-body.
    Raises ValueError on any structural corruption (the uniform
    quarantine contract); use :func:`parse_warc_safe` to keep the
    records that precede the corruption.
    """
    records, err = parse_warc_safe(data)
    if err is not None:
        raise ValueError(err)
    return records


def parse_warc_safe(data: bytes) -> tuple[list[dict], str | None]:
    """Like :func:`parse_warc` but returns ``(prefix_records, err)``:
    every record successfully walked before the first corruption, plus
    the error string (None when the whole archive is clean). A crawler
    that died mid-upload loses the tail, not the shard."""
    try:
        if data[:2] == b"\x1f\x8b":
            data = _gunzip_members(data)
    except ValueError as e:
        # whole-archive decompression failure: nothing salvageable
        # beyond what inflated — be conservative and quarantine all
        return [], str(e)
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        try:
            pos, rec = _parse_record(data, pos)
        except ValueError as e:
            return records, f"record {len(records)} at byte {pos}: {e}"
        records.append(rec)
    return records, None


def _parse_record(data: bytes, pos: int) -> tuple[int, dict]:
    if data[pos:pos + 5] != b"WARC/":
        raise ValueError("expected WARC/ version line")
    hdr_end = data.find(_CRLF + _CRLF, pos)
    if hdr_end < 0:
        raise ValueError("unterminated record header")
    try:
        lines = data[pos:hdr_end].decode("utf-8").split("\r\n")
    except UnicodeDecodeError as e:
        raise ValueError(f"undecodable record header: {e!r}") from e
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, sep, v = line.partition(":")
        if not sep:
            raise ValueError(f"malformed header line {line!r}")
        headers[k.strip().lower()] = v.strip()
    try:
        clen = int(headers["content-length"])
    except KeyError:
        raise ValueError("missing Content-Length") from None
    except ValueError:
        raise ValueError(
            f"bad Content-Length {headers['content-length']!r}") from None
    body_start = hdr_end + 4
    # validate BEFORE slicing: a 2^63 Content-Length must not drive any
    # allocation or index arithmetic
    if clen < 0 or body_start + clen > len(data):
        raise ValueError(
            f"Content-Length {clen} overruns the archive")
    payload = data[body_start:body_start + clen]
    tail = body_start + clen
    if data[tail:tail + 4] != _CRLF + _CRLF:
        raise ValueError("missing record terminator (truncated record)")
    rec = {
        "warc_type": headers.get("warc-type"),
        "record_id": headers.get("warc-record-id"),
        "uri": headers.get("warc-target-uri"),
        "date": headers.get("warc-date"),
        "status": None,
        "content_type": headers.get("content-type"),
        "body": payload,
    }
    if "msgtype=response" in (headers.get("content-type") or ""):
        rec.update(_parse_http(payload))
    return tail + 4, rec


def _parse_http(payload: bytes) -> dict:
    head_end = payload.find(_CRLF + _CRLF)
    if head_end < 0:
        raise ValueError("HTTP payload without header terminator")
    try:
        lines = payload[:head_end].decode("utf-8").split("\r\n")
        parts = lines[0].split(" ", 2)
        status = int(parts[1])
    except (UnicodeDecodeError, IndexError, ValueError) as e:
        raise ValueError(f"malformed HTTP status line: {e!r}") from e
    ctype = None
    for line in lines[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
    return {"status": status, "content_type": ctype,
            "body": payload[head_end + 4:]}


# ---------------------------------------------------------------------------
# Spark source
# ---------------------------------------------------------------------------

WARC_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("body", T.BinaryType()),
    T.StructField("err", T.StringType()),
])


def read_warc(spark: SparkSession, path: str, *,
              persist: bool = False) -> tuple[DataFrame, DataFrame]:
    """WARC archive glob -> ``(good, quarantine)`` DataFrames.

    good: (path, uri, warc_date, status, content_type, body) — one row
    per cleanly parsed record of ANY WARC type (request/metadata/
    conversion records land here too, with ``status`` NULL when the
    payload carries no HTTP status line — WET-style conversion records
    are the common case; filter on ``status IS NOT NULL`` or
    content_type for response-only views, as jobs/run_crawl.py's
    funnel does with a NULL-coalesced key). quarantine: (path, err) —
    one row per
    archive whose walk hit a corruption, after salvaging the records
    that preceded it (parse_warc_safe). Same contract as
    ``sources.read_documents``: a bad shard of 10^12 must neither kill
    the job nor vanish silently.

    Lifecycle: by default nothing is cached — each returned frame
    re-walks the archives when consumed, so consuming BOTH costs two
    decompress passes but pins zero storage (at the operating point of
    ~1 GB/archive x 10^5-10^6 archives, caching the parsed bodies would
    park the whole decompressed corpus in executor storage for the
    session, which is the wrong default; review r5). ``persist=True``
    restores the single-walk split for small/interactive reads — the
    caller owns release (``spark.catalog.clearCache()`` or unpersisting
    either returned frame's common ancestor at session end).
    """
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def walk(batches):
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                recs, err = parse_warc_safe(bytes(blob))
                for r in recs:
                    rows.append((p, r["uri"], r["date"], r["status"],
                                 r["content_type"], r["body"], None))
                if err is not None:
                    rows.append((p, None, None, None, None, None, err))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields])

    parsed = files.mapInPandas(walk, WARC_SCHEMA)
    if persist:
        parsed = parsed.cache()
    good = parsed.filter(F.col("err").isNull()).drop("err")
    quarantine = parsed.filter(F.col("err").isNotNull()) \
        .select("path", "err")
    return good, quarantine
