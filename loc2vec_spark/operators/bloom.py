"""Distributed Bloom-filter index — the cheap first probe of
incremental (crawl-batch) dedup.

`queries_corpus.dedup_incremental` answers new-batch-vs-corpus verdicts
with an exact semi-probe + LSH-band probe; both join the batch against
the corpus INDEX. At 10^12 corpus keys even the semi-probe's hash join
reshuffles the batch against a huge build side. The standard first
line (every production dedup/cache stack) is a Bloom filter: k seeded
bit positions per key, no false negatives, tunable false-positive rate
— "definitely new" documents skip the expensive probes entirely.

Spark-first shape — the filter is a TABLE, not a driver bitmap:

- **build**: corpus keys -> (bucket, k positions) rowwise (pure
  portable SQL hash arithmetic) -> groupBy(bucket) packs each bucket's
  ``m_bits`` window into one BINARY bitmap via an Arrow kernel. One
  shuffle of (bucket, position) pairs; the index is #buckets rows x
  m_bits/8 bytes, partitionable to any scale (a driver-side bitmap for
  10^12 keys would be ~1 TB — a non-starter, which is why
  `pyspark.sql.DataFrame.stat.bloomFilter`'s driver-object design is
  not the 100-TB shape).
- **probe**: batch keys -> (bucket, positions) -> LEFT equi-join on
  bucket (the index side is small per bucket and broadcastable) ->
  Arrow kernel tests the k bits. Missing bucket row == all-zero bitmap
  == definitely new.

Guarantees: no false negatives by construction (same hash text on both
sides); false-positive rate ~ (1 - e^(-kn/m))^k per bucket, measured
in test_bloom. Positions use per-hash DISTINCT odd multipliers — a
shared multiplier with varying addends would make every key's k
positions parallel shifts of each other (perfectly correlated bits:
fpp collapses to the k=1 rate).

Portability: the position arithmetic is plain modular SQL (identical
text in Spark and DuckDB), so the `dedup_bloom` query face is
oracle-checked bit-exactly against a set-semi-join formulation of the
same filter — a different algorithm (no bitmap) that must agree on
every verdict. At production scale the key could switch to
xxhash64(text) Spark-side; md5-derived int48 keys keep the oracle
engine-portable here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

# per-hash odd multipliers (murmur/xxhash-family primes) + addends; the
# bucket gets its OWN multiplier (sharing pos_0's would tie the bucket
# to pos_0's residue and strip that hash's entropy within a bucket).
# Key is reduced mod _P first so every product stays < 2^63 (ANSI
# mode); the product is reduced mod the PRIME _P before the final
# mod m — m is a power of two, and ``(x*K) % 2^b`` depends only on
# ``x % 2^b`` (the multiplier cancels), which collapses every position
# to the key's residue class: measured fpp 0.397 instead of the ~2e-3
# theory value until the double-mod fixed it (test_bloom pins this).
_KJ = (2654435761, 2246822519, 3266489917, 668265263, 40503)
_SJ = (17, 59, 101, 149, 131)
_P = 1000000007


def bloom_pos_sql(key: str, j: int, m_bits: int) -> str:
    """Portable SQL for bit position j of ``key`` in [0, m_bits)."""
    return (f"((((({key}) % {_P}) * {_KJ[j]} + {_SJ[j]}) % {_P}) "
            f"% {m_bits} + {m_bits}) % {m_bits}")


def bloom_bucket_sql(key: str, n_buckets: int) -> str:
    """Portable SQL for the bucket of ``key`` in [0, n_buckets)."""
    return (f"((((({key}) % {_P}) * {_KJ[4]} + {_SJ[4]}) % {_P}) "
            f"% {n_buckets} + {n_buckets}) % {n_buckets}")


def _keyed(df: DataFrame, key_col: str, *, k: int, m_bits: int,
           n_buckets: int) -> DataFrame:
    pos = [F.expr(bloom_pos_sql(key_col, j, m_bits)) for j in range(k)]
    return df.withColumn("bucket",
                         F.expr(bloom_bucket_sql(key_col, n_buckets))) \
             .withColumn("positions", F.array_distinct(F.array(*pos)))


def build_bloom_index(df: DataFrame, key_col: str, *, k: int = 4,
                      m_bits: int = 4096,
                      n_buckets: int = 8) -> DataFrame:
    """(bucket, bitmap BINARY) — one groupBy shuffle of (bucket, pos)."""
    m_bytes = (m_bits + 7) // 8

    @F.pandas_udf("binary")
    def pack(poslists: pd.Series) -> pd.Series:
        out = []
        for pl in poslists:
            bits = np.zeros(m_bytes, dtype=np.uint8)
            p = np.asarray(pl, dtype=np.int64)
            np.bitwise_or.at(bits, p // 8,
                             np.left_shift(1, (p % 8)).astype(np.uint8))
            out.append(bits.tobytes())
        return pd.Series(out)

    pos = (_keyed(df, key_col, k=k, m_bits=m_bits, n_buckets=n_buckets)
           .select("bucket", F.explode("positions").alias("pos"))
           .distinct())
    return (pos.groupBy("bucket")
            .agg(F.collect_list("pos").alias("pl"))
            .select("bucket", pack("pl").alias("bitmap")))


def bloom_probe(batch: DataFrame, index: DataFrame, key_col: str, *,
                k: int = 4, m_bits: int = 4096, n_buckets: int = 8,
                broadcast_index: bool = True) -> DataFrame:
    """Adds ``n_pos``, ``n_hit``, ``bloom_maybe`` (1 = maybe in corpus,
    0 = DEFINITELY new). Left join: an absent bucket is all-zero.

    ``broadcast_index=True`` is right while n_buckets x m_bits/8 fits
    an executor (the default 8 x 512 B certainly does); a 10^12-key
    deployment sizes n_buckets into the thousands with MB bitmaps —
    pass False there and the probe becomes a plain (bucket) hash
    equi-join, each task reading only its buckets' bitmaps."""
    @F.pandas_udf("int")
    def hits(bitmap: pd.Series, poslists: pd.Series) -> pd.Series:
        out = np.zeros(len(bitmap), dtype=np.int32)
        for i, (bm, pl) in enumerate(zip(bitmap, poslists)):
            if bm is None:
                continue
            bits = np.frombuffer(bm, dtype=np.uint8)
            p = np.asarray(pl, dtype=np.int64)
            out[i] = int(((bits[p // 8] >> (p % 8)) & 1).sum())
        return pd.Series(out)

    kb = _keyed(batch, key_col, k=k, m_bits=m_bits, n_buckets=n_buckets)
    idx = F.broadcast(index) if broadcast_index else index
    return (kb.join(idx, "bucket", "left")
            .withColumn("n_pos", F.size("positions"))
            .withColumn("n_hit", hits(F.col("bitmap"), F.col("positions")))
            .withColumn("bloom_maybe",
                        (F.col("n_hit") == F.col("n_pos")).cast("int"))
            .drop("bitmap", "positions"))
