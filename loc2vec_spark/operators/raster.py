"""Raster <-> vector tile assembly (north_star: "12-channel rasterization
as a raster<->vector groupBy.applyInPandas over tile cells").

The reference consumes pre-rasterized OSM channel PNGs
(``/root/reference/README.md:5-25``, 12 channels per
``config.toml:4``) — the rasterizer itself lives outside its repo. The
engine supplies it: vector polygon features are assigned to the tile
cells their bboxes overlap, grouped by cell, and each group is scanline-
rasterized into one grayscale PNG per channel with the engine's own
codec. Output rows: (cell, channel, png, nnz).

Scale shape: one applyInPandas group per tile cell; group size is
bounded by features-intersecting-one-tile (geometry-local, independent
of table size), so no salting is needed here — the skew lever for this
stage is tile resolution. Writing partitioned by cell_r7 with hot-cell
salting happens at the sink (lineage.write_partitioned).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .. import cells
from ..png_codec import encode_png

CHANNELS12 = [  # /root/reference/README.md:9-25
    "roads_major", "roads_other", "rails", "greenspace", "water",
    "industrial", "railway_land", "residential", "commercial", "retail",
    "misc_land", "buildings",
]


def cell_bounds(cell: int) -> tuple[float, float, float, float]:
    """(minlon, minlat, maxlon, maxlat) of a cell."""
    c = int(cell)
    res = c >> cells.RES_SHIFT
    n = 1 << res
    i, j = c & cells.IJ_MASK, (c >> cells.J_SHIFT) & cells.IJ_MASK
    minlon = i * 360.0 / n - 180.0
    minlat = j * 180.0 / n - 90.0
    return minlon, minlat, minlon + 360.0 / n, minlat + 180.0 / n


def rasterize_polygon(ring_x: np.ndarray, ring_y: np.ndarray,
                      bounds: tuple[float, float, float, float],
                      px: int) -> np.ndarray:
    """Even-odd scanline fill of one polygon onto a px*px uint8 grid.

    Row origin at the tile's south edge (row 0 = min latitude); the PNG
    writer flips to image convention (row 0 = north) at encode time.
    """
    minlon, minlat, maxlon, maxlat = bounds
    out = np.zeros((px, px), dtype=np.uint8)
    yy = minlat + (np.arange(px) + 0.5) * (maxlat - minlat) / px
    x1, y1 = ring_x, ring_y
    x2, y2 = np.roll(ring_x, -1), np.roll(ring_y, -1)
    for r in range(px):
        py = yy[r]
        crosses = (y1 > py) != (y2 > py)
        if not crosses.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2[crosses] - x1[crosses]) * (py - y1[crosses]) \
                / (y2[crosses] - y1[crosses]) + x1[crosses]
        xint = np.sort(xint)
        # fill between pairs of crossings
        for a, b in zip(xint[0::2], xint[1::2]):
            lo = int(np.ceil((a - minlon) / (maxlon - minlon) * px - 0.5))
            hi = int(np.floor((b - minlon) / (maxlon - minlon) * px - 0.5))
            lo, hi = max(lo, 0), min(hi, px - 1)
            if hi >= lo:
                out[r, lo:hi + 1] = 255
    return out


def polygons_to_cells(polys: pd.DataFrame, res: int) -> pd.DataFrame:
    """Assign each polygon to every cell its bbox overlaps (driver-side —
    the polygon table is the small side; at larger feature counts this
    becomes the same explode-ranges job in Spark)."""
    rows = []
    n = 1 << res
    for r in polys.itertuples():
        i0, j0 = (int(x) for x in cells.latlon_to_ij(r.miny, r.minx, res))
        i1, j1 = (int(x) for x in cells.latlon_to_ij(r.maxy, r.maxx, res))
        for jj in range(j0, j1 + 1):
            for ii in range(i0, i1 + 1):
                rows.append({
                    "cell": int(cells.ij_to_cell(ii, jj, res)),
                    "layer_id": int(r.layer_id),
                    "channel": r.channel,
                    "ring_x": [float(p[0]) for p in r.ring],
                    "ring_y": [float(p[1]) for p in r.ring],
                })
    return pd.DataFrame(rows)


RASTER_SCHEMA = T.StructType([
    T.StructField("cell", T.LongType()),
    T.StructField("channel", T.StringType()),
    T.StructField("png", T.BinaryType()),
    T.StructField("nnz", T.LongType()),
])


def rasterize_tiles(spark: SparkSession, features: DataFrame, *,
                    px: int = 64) -> DataFrame:
    """features (cell, channel, ring_x, ring_y) -> one PNG per
    (cell, channel) via groupBy(cell).applyInPandas."""

    def assemble(key, pdf):
        cell = int(key[0])
        bounds = cell_bounds(cell)
        planes: dict[str, np.ndarray] = {}
        for r in pdf.itertuples():
            mask = rasterize_polygon(np.asarray(r.ring_x, dtype=np.float64),
                                     np.asarray(r.ring_y, dtype=np.float64),
                                     bounds, px)
            ch = r.channel
            planes[ch] = np.maximum(planes.get(
                ch, np.zeros((px, px), dtype=np.uint8)), mask)
        out = []
        for ch in sorted(planes):
            img = planes[ch][::-1]  # south-up grid -> image row order
            out.append({"cell": cell, "channel": ch,
                        "png": encode_png(img),
                        "nnz": int((img > 0).sum())})
        return pd.DataFrame(out, columns=["cell", "channel", "png", "nnz"])

    return features.groupBy("cell").applyInPandas(assemble, RASTER_SCHEMA)


CHECKSUM_SCHEMA = T.StructType([
    T.StructField("cell", T.LongType()),
    T.StructField("channel", T.StringType()),
    T.StructField("pixel_checksum", T.LongType()),
    T.StructField("set_pixels", T.LongType()),
])


def tile_checksums(tiles: DataFrame) -> DataFrame:
    """(cell, channel, png, ...) -> (cell, channel, pixel_checksum,
    set_pixels): decode each tile PNG and reduce its SET pixels to an
    order-free exact integer pair, giving the raster stage a
    SQL-comparable face (VERDICT r4 item 1).

    pixel id = image_row * w + col; checksum = sum over set pixels of
    (pid + 1) * (pid + 7919) — exact in int64 up to megapixel tiles, and
    sensitive to every pixel's position. Because the input pixels come
    from decode_png over the REAL encoded tile bytes, a hash match
    verifies the rasterizer, the PNG codec round-trip, and the grid
    math against an independent SQL derivation of the pixel set."""
    from ..png_codec import decode_png

    def gen(batches):
        for pdf in batches:
            cks, cnt = [], []
            for png in pdf["png"]:
                img = decode_png(bytes(png))
                if img.ndim == 3:
                    img = img[:, :, 0]
                h, w = img.shape
                pid = (np.arange(h, dtype=np.int64)[:, None] * w
                       + np.arange(w, dtype=np.int64)[None, :])
                mask = img > 0
                cks.append(int(((pid + 1) * (pid + 7919))[mask].sum()))
                cnt.append(int(mask.sum()))
            yield pd.DataFrame({
                "cell": pdf["cell"].astype("int64"),
                "channel": pdf["channel"],
                "pixel_checksum": pd.Series(cks, dtype="int64"),
                "set_pixels": pd.Series(cnt, dtype="int64")})

    return tiles.mapInPandas(gen, CHECKSUM_SCHEMA)


def tile_pyramid(tiles: DataFrame, *, res: int, parent_res: int,
                 px: int = 64) -> DataFrame:
    """Roll tiles up one or more levels: 2^d x 2^d child tiles -> one
    parent tile per channel (d = res - parent_res).

    Each child raster is max-pooled down by 2^d and placed into the
    parent grid at its (i, j) offset; overlapping contributions merge
    with ``max`` — associative and commutative, so the rollup is safe
    under any partitioning/salting and can chain level by level
    (multi-resolution pyramid; the raster face of GROUP BY ROLLUP over
    cell_r5/cell_r7 — SURVEY.md §2.4).

    Input/output rows: (cell, channel, png, nnz) — output cells at
    ``parent_res``.
    """
    d = res - parent_res
    if d <= 0:
        raise ValueError("parent_res must be coarser than res")
    if px % (1 << d):
        raise ValueError(f"px={px} not divisible by 2^{d}")
    sub = px >> d

    from ..png_codec import decode_png

    tagged = tiles.withColumn(
        "parent", F.expr(cells.parent_sql("cell", res, parent_res)))

    def assemble(key, pdf):
        parent = int(key[0])
        planes: dict[str, np.ndarray] = {}
        for r in pdf.itertuples():
            i, j = (int(x) for x in cells.cell_ij(int(r.cell)))
            oi, oj = i & ((1 << d) - 1), j & ((1 << d) - 1)
            img = decode_png(bytes(r.png))
            if img.ndim == 3:
                img = img[:, :, 0]
            # max-pool px -> sub (block max keeps set-cover semantics)
            pooled = img.reshape(sub, 1 << d, sub, 1 << d).max((1, 3))
            plane = planes.setdefault(
                r.channel, np.zeros((px, px), dtype=np.uint8))
            # image rows run north->south: j offset counts from the top
            r0 = (((1 << d) - 1) - oj) * sub
            c0 = oi * sub
            block = plane[r0:r0 + sub, c0:c0 + sub]
            plane[r0:r0 + sub, c0:c0 + sub] = np.maximum(block, pooled)
        out = []
        for ch in sorted(planes):
            out.append({"cell": parent, "channel": ch,
                        "png": encode_png(planes[ch]),
                        "nnz": int((planes[ch] > 0).sum())})
        return pd.DataFrame(out, columns=["cell", "channel", "png", "nnz"])

    return tagged.groupBy("parent").applyInPandas(assemble, RASTER_SCHEMA)
