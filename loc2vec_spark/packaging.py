"""spark-submit --py-files packaging (BASELINE.json north_rule).

Builds a zip of the ``loc2vec_spark`` package and registers it with a
running session via ``sparkContext.addPyFile`` so Python workers can
import engine modules inside pandas UDFs. On a real cluster the same zip
ships as ``spark-submit --py-files loc2vec_spark.zip jobs/run_tiling.py``.
"""

from __future__ import annotations

import os
import zipfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))


def build_pyfiles_zip(out_path: str | None = None) -> str:
    """Zip the package (source only) for --py-files / addPyFile."""
    out_path = out_path or os.path.join(
        os.path.dirname(_PKG_DIR), ".bench_cache", "loc2vec_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join("loc2vec_spark",
                                   os.path.relpath(full, _PKG_DIR))
                zf.write(full, rel)
    return out_path


_REGISTERED: set[int] = set()


def ensure_workers_can_import(spark) -> None:
    """Idempotently ship the package zip to this session's Python workers."""
    key = id(spark.sparkContext)
    if key in _REGISTERED:
        return
    spark.sparkContext.addPyFile(build_pyfiles_zip())
    _REGISTERED.add(key)
