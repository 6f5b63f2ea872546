"""HTML main-content extraction for crawl ingestion (VERDICT r4 item 2).

Real LLM corpora arrive as WARC archives of raw HTML; the text the
pipeline wants is the page's content with boilerplate (scripts, styles,
navigation, chrome) stripped. This is the payload-side half of the
crawl front door — ``operators/warc.py`` walks the container, this
module turns one HTML payload into ``(title, text)``.

Reference anchor: the S1 directory-as-table scan
(``/root/reference/src/data_loading.py:142-149``) generalized to crawl
payloads per SURVEY.md §2.10.

Pure stdlib (``html.parser``); no external boilerplate-removal libs in
this environment, so the strip is structural: a DROP set of subtrees
(``script style noscript template nav header footer aside``) plus
comments and the ``<title>`` (reported separately), with all remaining
text whitespace-collapsed. That covers templated chrome exactly; a
statistical main-content classifier is out of scope and documented as
such. Parsing is per-row CPU-bound with zero shared state, so the
Spark face is an Arrow-batched pandas UDF — embarrassingly parallel at
100 TB.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F, types as T

#: subtrees whose text is never page content
DROP_TAGS = frozenset({
    "script", "style", "noscript", "template",
    "nav", "header", "footer", "aside",
})

#: elements with no closing tag — must not affect the drop-depth counter
_VOID_TAGS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
})


class _Extractor(HTMLParser):
    """Streaming extractor: one pass, O(depth) state."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._drop = 0
        self._in_title = False       # inside any <title> element
        self._capture_title = False  # ... and it is THE document title
        self._title_done = False
        self._title: list[str] = []
        self._chunks: list[str] = []

    def _end_title_capture(self) -> None:
        # a real <title> contains no markup at all: ANY tag event while
        # capturing (start, end, or void) means the title was unclosed
        # tag soup — stop here rather than swallow the rest of the
        # document into the title (and delete it from the text).
        # The document-title slot is consumed only when some text was
        # actually captured: an empty/immediately-terminated <title/>
        # must not discard the page's real title (review r5)
        if self._capture_title and any(s.strip() for s in self._title):
            self._title_done = True
        self._in_title = self._capture_title = False

    def handle_starttag(self, tag, attrs):
        if self._in_title:
            self._end_title_capture()
        if tag in _VOID_TAGS:
            return
        if tag in DROP_TAGS:
            self._drop += 1
        elif tag == "title":
            self._in_title = True
            # the DOCUMENT title is the first <title> outside any
            # dropped subtree; later ones (<svg><title> icon labels,
            # duplicate titles in body soup) are chrome, not content
            self._capture_title = self._drop == 0 and not self._title_done

    def handle_endtag(self, tag):
        if self._in_title:
            # </title> is the normal close; any OTHER end tag is the
            # unclosed-title soup case again (e.g. <title>Oops</head>)
            self._end_title_capture()
        if tag in DROP_TAGS:
            # max() guards stray close tags in malformed HTML: the
            # parser is forgiving by contract (crawl payloads are never
            # well-formed), so depth must never go negative and start
            # dropping content that was outside any DROP subtree
            self._drop = max(0, self._drop - 1)

    def handle_data(self, data):
        if self._in_title:
            # non-document titles contribute to neither field
            if self._capture_title:
                self._title.append(data)
        elif self._drop == 0 and not data.isspace():
            self._chunks.append(data)


def html_extract(html: str) -> tuple[str, str]:
    """One HTML document -> (title, text).

    Text is every data chunk outside DROP subtrees, joined and
    whitespace-collapsed to single spaces (crawl text is compared and
    deduplicated downstream — a stable whitespace convention matters
    more than layout fidelity). Entities are decoded
    (``convert_charrefs``). Malformed markup never raises: html.parser
    recovers, and a truncated page simply yields the text seen so far —
    structural corruption is the CONTAINER's job to flag (warc.py).
    """
    p = _Extractor()
    p.feed(html)
    p.close()
    title = " ".join(" ".join(p._title).split())
    text = " ".join(" ".join(p._chunks).split())
    return title, text


HTML_EXTRACT_TYPE = T.StructType([
    T.StructField("title", T.StringType()),
    T.StructField("text", T.StringType()),
])


def html_extract_udf():
    """Lazy factory (module-level @pandas_udf needs a live session —
    breaks pytest collection): struct<title, text> pandas UDF."""

    @F.pandas_udf(HTML_EXTRACT_TYPE)
    def _extract(html: pd.Series) -> pd.DataFrame:
        pairs = [html_extract(h) if h is not None else (None, None)
                 for h in html]
        return pd.DataFrame(pairs, columns=["title", "text"])

    return _extract
