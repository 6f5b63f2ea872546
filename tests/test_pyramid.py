"""Tile pyramid rollup: geometry, overlay semantics, partition safety."""

import numpy as np
import pytest

from loc2vec_spark import cells
from loc2vec_spark.operators.raster import RASTER_SCHEMA, tile_pyramid
from loc2vec_spark.png_codec import decode_png, encode_png

RES, PRES, PX = 8, 7, 16  # one level: 2x2 children per parent


def _tile_rows(parent_i, parent_j):
    """Four children of one parent; each child's raster is all-255."""
    rows = []
    for oi in (0, 1):
        for oj in (0, 1):
            c = int(cells.ij_to_cell(parent_i * 2 + oi, parent_j * 2 + oj,
                                     RES))
            img = np.full((PX, PX), 255, dtype=np.uint8)
            rows.append((c, "roads_major", bytearray(encode_png(img)),
                         PX * PX))
    return rows


@pytest.fixture(scope="module")
def tiles(spark):
    rows = _tile_rows(10, 20) + _tile_rows(11, 20)
    return spark.createDataFrame(rows, RASTER_SCHEMA)


def test_pyramid_merges_children(spark, tiles):
    out = tile_pyramid(tiles, res=RES, parent_res=PRES, px=PX).collect()
    assert len(out) == 2
    for r in out:
        assert cells.cell_res(r["cell"]) == PRES
        img = decode_png(bytes(r["png"]))
        if img.ndim == 3:
            img = img[:, :, 0]
        # four full children cover the whole parent
        assert (img == 255).all()
        assert r["nnz"] == PX * PX


def test_pyramid_places_partial_children(spark):
    # only the (oi=0, oj=0) child present -> bottom-left quadrant filled
    c = int(cells.ij_to_cell(10 * 2, 20 * 2, RES))
    img = np.full((PX, PX), 255, dtype=np.uint8)
    tiles = spark.createDataFrame(
        [(c, "water", bytearray(encode_png(img)), PX * PX)], RASTER_SCHEMA)
    out = tile_pyramid(tiles, res=RES, parent_res=PRES, px=PX).collect()
    assert len(out) == 1
    got = decode_png(bytes(out[0]["png"]))
    if got.ndim == 3:
        got = got[:, :, 0]
    h = PX // 2
    # oj=0 = south half = BOTTOM rows of the image (image is north-up)
    assert (got[h:, :h] == 255).all()
    assert (got[:h, :] == 0).all() and (got[h:, h:] == 0).all()
    assert out[0]["nnz"] == h * h


def test_pyramid_partitioning_invariant(spark, tiles):
    a = sorted((r["cell"], r["channel"], bytes(r["png"]))
               for r in tile_pyramid(tiles.repartition(1), res=RES,
                                     parent_res=PRES, px=PX).collect())
    b = sorted((r["cell"], r["channel"], bytes(r["png"]))
               for r in tile_pyramid(tiles.repartition(7), res=RES,
                                     parent_res=PRES, px=PX).collect())
    assert a == b


def test_pyramid_two_levels_chain(spark, tiles):
    lvl1 = tile_pyramid(tiles, res=RES, parent_res=PRES, px=PX)
    lvl2 = tile_pyramid(lvl1, res=PRES, parent_res=PRES - 1, px=PX)
    out = lvl2.collect()
    assert len(out) == 1
    assert cells.cell_res(out[0]["cell"]) == PRES - 1
