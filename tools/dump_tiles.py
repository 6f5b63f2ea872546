"""Sampled-tile debug sink (SURVEY.md §2.1 S9 residue).

The reference renders sample tiles for eyeballing
(``/root/reference/src/loc2vec/data_loading.py:83-99``). The engine's
analog: pick ``k`` seeded sample images per res-7 cell (W2 semantics —
deterministic hash pick, not unseeded random), decode their PNG bytes
with the engine codec, and write ``<out>/cell=<c>/<image_id>.png`` plus
an ``index.json``. The SAMPLING is distributed (WindowGroupLimit top-k
per cell, runs on any input size); only the k-per-cell sample rows are
collected, so this stays a debug tool, not a data path.

Usage:  python tools/dump_tiles.py <images.parquet> <out_dir> [k]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window, functions as F


def sample_tiles(images: DataFrame, k: int = 3, res: int = 7,
                 seed: int = 42) -> DataFrame:
    """k seeded sample rows per res-``res`` cell, rows with bytes only."""
    from loc2vec_spark.operators import geo
    pts = geo.with_cells(geo.with_latlon(images), resolutions=(res,))
    cell = f"cell_r{res}"
    w = Window.partitionBy(cell).orderBy(
        F.xxhash64("image_id", F.lit(seed)), "image_id")
    return (pts.filter(F.col("bytes").isNotNull()
                       & F.col("fmt").isin("png", "pngq"))
               .withColumn("pick", F.row_number().over(w))
               .filter(F.col("pick") <= k)
               .select("image_id", F.col(cell).alias("cell"), "fmt",
                       "caption", "bytes"))


def dump(images: DataFrame, out_dir: str, k: int = 3, res: int = 7) -> dict:
    from loc2vec_spark.png_codec import decode_png
    rows = sample_tiles(images, k=k, res=res).collect()
    index = []
    for r in rows:
        arr = decode_png(bytes(r["bytes"]))
        cell_dir = os.path.join(out_dir, f"cell={r['cell']}")
        os.makedirs(cell_dir, exist_ok=True)
        path = os.path.join(cell_dir, f"{r['image_id']}.png")
        with open(path, "wb") as f:
            f.write(bytes(r["bytes"]))
        index.append({"image_id": r["image_id"], "cell": int(r["cell"]),
                      "fmt": r["fmt"], "caption": r["caption"],
                      "shape": list(arr.shape), "path": path})
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "index.json"), "w") as f:
        json.dump(index, f, indent=1)
    return {"tiles": len(index),
            "cells": len({e['cell'] for e in index})}


def main() -> None:
    src = sys.argv[1]
    out = sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    from loc2vec_spark.session import get_spark
    spark = get_spark(master="local[4]", app_name="dump_tiles")
    stats = dump(spark.read.parquet(src), out, k=k)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
