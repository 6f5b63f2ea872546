"""Broadcast point-in-polygon spatial join (J6).

The reference performs this offline before rasterization (channel
semantics at ``/root/reference/README.md:9-25`` imply tile/point ∈ OSM
polygon layer); the engine makes it a first-class operator per
BASELINE.json:north_star ("broadcast-R-tree point-in-polygon join").

Plan shape: the polygon side is the SMALL side (OSM layer extracts:
10^3..10^6 features) — it is collected once on the driver, packed into
flat numpy arrays, and broadcast to every executor; the point side
(10^12 rows) streams through an Arrow-vectorized pandas UDF that does a
vectorized bbox prefilter + exact ray-cast, emitting (point, layer)
match rows. No shuffle of the big side at all — the join is
embarrassingly parallel over point partitions.

At sandbox polygon counts (~700) a vectorized bbox matrix beats tree
descent; the broadcast payload carries STR-sorted bbox arrays so an
interior-node prefilter can be added without changing the operator
surface when the polygon side grows.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


def pack_polygons(polys: pd.DataFrame) -> dict:
    """osm_layers rows -> flat numpy arrays (the broadcast payload).

    Rings are padded to max vertex count by repeating the last vertex
    (zero-length edges never flip the ray-cast crossing parity).
    STR-style packing: polygons sorted by bbox center x then y, so bbox
    ranges of contiguous chunks stay tight for future tree levels.
    """
    polys = polys.sort_values(["minx", "miny", "layer_id"]).reset_index(drop=True)
    m = len(polys)
    nv = max(len(r) for r in polys.ring)
    xs = np.full((m, nv), np.nan)
    ys = np.full((m, nv), np.nan)
    for i, ring in enumerate(polys.ring):
        r = np.asarray([list(p) for p in ring], dtype=np.float64)
        xs[i, :len(r)] = r[:, 0]
        ys[i, :len(r)] = r[:, 1]
        xs[i, len(r):] = r[-1, 0]
        ys[i, len(r):] = r[-1, 1]
    return {
        "layer_id": polys.layer_id.to_numpy(np.int64),
        "channel": polys.channel.to_numpy(),
        "minx": polys.minx.to_numpy(np.float64),
        "miny": polys.miny.to_numpy(np.float64),
        "maxx": polys.maxx.to_numpy(np.float64),
        "maxy": polys.maxy.to_numpy(np.float64),
        "xs": xs, "ys": ys,
    }


def point_in_polygons(pack: dict, lon: np.ndarray,
                      lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized PIP: returns (point_idx, poly_idx) match pairs.

    bbox prefilter (vectorized matrix, chunked to bound memory) then an
    exact even-odd ray cast on the candidate pairs only.
    """
    n = len(lon)
    pt_out, pl_out = [], []
    chunk = max(1, 2_000_000 // max(1, len(pack["minx"])))
    for s in range(0, n, chunk):
        lo_ = lon[s:s + chunk, None]
        la_ = lat[s:s + chunk, None]
        cand = ((lo_ >= pack["minx"][None, :]) & (lo_ <= pack["maxx"][None, :])
                & (la_ >= pack["miny"][None, :])
                & (la_ <= pack["maxy"][None, :]))
        pi, pj = np.nonzero(cand)
        if len(pi) == 0:
            continue
        px, py = lon[s + pi], lat[s + pi]
        x1 = pack["xs"][pj]          # (pairs, nv)
        y1 = pack["ys"][pj]
        x2 = np.roll(x1, -1, axis=1)
        y2 = np.roll(y1, -1, axis=1)
        crosses = (y1 > py[:, None]) != (y2 > py[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (py[:, None] - y1) / (y2 - y1) + x1
        hits = crosses & (px[:, None] < xint)
        inside = (hits.sum(axis=1) % 2).astype(bool)
        pt_out.append(s + pi[inside])
        pl_out.append(pj[inside])
    if not pt_out:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    return np.concatenate(pt_out), np.concatenate(pl_out)


def pip_join(spark: SparkSession, pts: DataFrame, polys: pd.DataFrame, *,
             id_col: str, lat_col: str = "lat",
             lon_col: str = "lon") -> DataFrame:
    """Broadcast PIP join: (id, layer_id, channel) for every containment.

    ``polys`` is the driver-side polygon table (osm_layers schema,
    FIXTURES.md §3). Inner-join semantics: points in no polygon emit
    nothing; points in k polygons emit k rows.
    """
    pack = pack_polygons(polys)
    bc = spark.sparkContext.broadcast(pack)
    in_schema_id_type = dict(
        (f.name, f.dataType) for f in pts.schema.fields)[id_col]
    out_schema = T.StructType([
        T.StructField(id_col, in_schema_id_type),
        T.StructField("layer_id", T.LongType()),
        T.StructField("channel", T.StringType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = bc.value
        for pdf in batches:
            lon = pdf[lon_col].to_numpy(np.float64)
            lat = pdf[lat_col].to_numpy(np.float64)
            pi, pj = point_in_polygons(p, lon, lat)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy()[pi],
                "layer_id": p["layer_id"][pj],
                "channel": p["channel"][pj],
            })

    cols = pts.select(id_col, lat_col, lon_col)
    return cols.mapInPandas(gen, schema=out_schema)
