"""Oracle output-type lint: no HUGEINT/DECIMAL may reach an output column.

DuckDB promotes SUM over any integer type to HUGEINT (int128) — including
windowed SUMs — and fetchall() masks it (python ints), but the round
driver's arrow/pandas transfer renders HUGEINT as float64/decimal, so the
value hash diverges from Spark's int64 even though every value is equal.
CORRECTNESS_r01's only two hash_match:false rows (f2_json_date,
text_fingerprint) were exactly the two queries with a naked integer-SUM
output column.

This lint runs ``DESCRIBE <oracle>`` (type inference only, no execution,
no Spark session) for every registered oracle and fails on any output
column typed HUGEINT/UHUGEINT/DECIMAL. Raw DECIMAL outputs are banned for
the same reason: engine-stable queries CAST to DOUBLE or BIGINT at the
output boundary (intermediate decimal math is fine and invisible here).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad = []
    for name, sql in sorted(entry.oracle_sql().items()):
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: describe error {type(ex).__name__}: {ex}")
            bad.append(name)
            continue
        hits = [(c, ty) for c, ty, *_ in rows
                if any(ty.upper().startswith(b) for b in BANNED)]
        if hits:
            print(f"FAIL {name}: driver-unstable output types {hits}")
            bad.append(name)
        else:
            print(f"OK   {name}: {len(rows)} cols")
    print(f"\n{len(bad)} failing: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
