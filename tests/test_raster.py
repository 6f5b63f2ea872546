"""Raster assembly tests: scanline fill vs PIP oracle, end-to-end tiles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from loc2vec_spark import cells, fixtures
from loc2vec_spark.operators import raster
from loc2vec_spark.png_codec import decode_png


def test_rasterize_square_exact():
    # unit square polygon in the middle of a cell -> filled block
    bounds = (0.0, 0.0, 1.0, 1.0)
    rx = np.array([0.25, 0.75, 0.75, 0.25])
    ry = np.array([0.25, 0.25, 0.75, 0.75])
    img = raster.rasterize_polygon(rx, ry, bounds, 64)
    # pixel centers in (0.25, 0.75) are set
    centers = (np.arange(64) + 0.5) / 64
    inside = (centers > 0.25) & (centers < 0.75)
    expect = np.zeros((64, 64), dtype=np.uint8)
    expect[np.ix_(inside, inside)] = 255
    assert np.array_equal(img, expect)


def test_rasterize_matches_pip_per_pixel():
    """Every set pixel center must be inside the polygon (even-odd)."""
    from tests.test_pip import _inside
    rng = np.random.Generator(np.random.PCG64(33))
    bounds = (10.0, 20.0, 11.0, 21.0)
    angles = np.sort(rng.uniform(0, 2 * np.pi, 9))
    rx = 10.5 + 0.4 * np.cos(angles)
    ry = 20.5 + 0.4 * np.sin(angles)
    img = raster.rasterize_polygon(rx, ry, bounds, 32)
    ring = list(zip(rx, ry))
    xs = 10.0 + (np.arange(32) + 0.5) / 32
    ys = 20.0 + (np.arange(32) + 0.5) / 32
    for r in range(32):
        for c in range(32):
            assert bool(img[r, c]) == _inside(ring, xs[c], ys[r]), (r, c)


def test_polygons_to_cells_covers_bbox():
    polys = fixtures.osm_layers_pdf(per_disk=5, n_global=5)
    feats = raster.polygons_to_cells(polys, res=7)
    assert len(feats) >= len(polys)
    for r in feats.itertuples():
        minlon, minlat, maxlon, maxlat = raster.cell_bounds(r.cell)
        p = polys[polys.layer_id == r.layer_id].iloc[0]
        # cell bbox overlaps polygon bbox
        assert not (maxlon < p.minx or minlon > p.maxx
                    or maxlat < p.miny or minlat > p.maxy)


def test_rasterize_tiles_end_to_end(spark):
    polys = fixtures.osm_layers_pdf(per_disk=10, n_global=5)
    feats = raster.polygons_to_cells(polys, res=7)
    fdf = spark.createDataFrame(feats)
    tiles = raster.rasterize_tiles(spark, fdf).toPandas()
    assert len(tiles) > 0
    assert set(tiles.columns) == {"cell", "channel", "png", "nnz"}
    # png decodes, shape 64x64, nnz consistent
    for _, t in tiles.head(10).iterrows():
        img = decode_png(t.png)
        assert img.shape == (64, 64)
        assert int((img > 0).sum()) == t.nnz
    # at least one tile has actual coverage
    assert (tiles.nnz > 0).any()
    # determinism across partitioning
    tiles2 = raster.rasterize_tiles(spark, fdf.repartition(7)).toPandas()
    a = sorted(map(tuple, tiles[["cell", "channel", "nnz"]].to_numpy()))
    b = sorted(map(tuple, tiles2[["cell", "channel", "nnz"]].to_numpy()))
    assert a == b
