"""Deterministic mutation fuzz over the crawl front door's quarantine
contract (same harness shape as test_fuzz_media): every mutated or
truncated archive must either parse or raise ValueError — no
struct.error/zlib.error/UnicodeDecodeError/IndexError escapes from
``parse_warc``; ``parse_warc_safe`` must NEVER raise (it returns the
salvage + err tuple); and ``html_extract`` must never raise on any
byte soup at all (the page-level contract: structural corruption is
the container's job to flag)."""

import numpy as np
import pytest

from loc2vec_spark.operators import warc as W
from loc2vec_spark.operators.html import html_extract

N_MUT = 150


def _records():
    return [{
        "uri": f"http://corpus.test/doc/{i}",
        "date": "2026-01-01T00:00:00Z",
        "status": 404 if i % 5 == 0 else 200,
        "content_type": "text/html; charset=utf-8",
        "body": (f"<html><head><title>Doc {i}</title></head>"
                 f"<body><p>body {i} text</p></body></html>"
                 ).encode("utf-8"),
    } for i in range(6)]


def _mutations(data: bytes, seed: int):
    """N_MUT seeded 1-3-byte flips + N_MUT//4 truncations."""
    rng = np.random.default_rng(seed)
    b = np.frombuffer(data, dtype=np.uint8)
    for _ in range(N_MUT):
        m = b.copy()
        idx = rng.integers(0, len(m), int(rng.integers(1, 4)))
        m[idx] = rng.integers(0, 256, len(idx))
        yield m.tobytes()
    for _ in range(N_MUT // 4):
        yield data[: int(rng.integers(0, len(data)))]


@pytest.mark.parametrize("gz,seed", [(False, 21), (True, 22)])
def test_parse_warc_fuzz_contract(gz, seed):
    data = W.build_warc(_records(), gzip_members=gz)
    for blob in _mutations(data, seed):
        try:
            W.parse_warc(blob)
        except ValueError:
            pass  # the one documented quarantine signal


@pytest.mark.parametrize("gz,seed", [(False, 23), (True, 24)])
def test_parse_warc_safe_never_raises(gz, seed):
    data = W.build_warc(_records(), gzip_members=gz)
    for blob in _mutations(data, seed):
        recs, err = W.parse_warc_safe(blob)
        assert isinstance(recs, list)
        assert err is None or isinstance(err, str)


def test_html_extract_never_raises_on_byte_soup():
    page = ("<html><head><title>T</title><script>x</script></head>"
            "<body><nav>n</nav><p>fish &amp; chips</p>"
            "<div><p>deep</p></div><footer>f</footer></body></html>"
            ).encode("utf-8")
    rng = np.random.default_rng(25)
    b = np.frombuffer(page, dtype=np.uint8)
    for _ in range(N_MUT):
        m = b.copy()
        idx = rng.integers(0, len(m), int(rng.integers(1, 4)))
        m[idx] = rng.integers(0, 256, len(idx))
        title, text = html_extract(m.tobytes().decode("latin-1"))
        assert isinstance(title, str) and isinstance(text, str)
    for cut in range(0, len(page), 7):
        title, text = html_extract(page[:cut].decode("latin-1"))
        assert isinstance(title, str) and isinstance(text, str)
