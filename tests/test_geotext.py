"""WKT/GeoJSON polygon ingestion: parse, explode, and PIP equivalence."""

import json

import numpy as np
import pytest

from loc2vec_spark import geotext
from loc2vec_spark.fixtures import osm_layers_pdf as synth_osm_pdf
from loc2vec_spark.operators import pip


def test_wkt_roundtrip_fixture_rings():
    pdf = synth_osm_pdf()
    for ring in pdf.ring:
        back = geotext.parse_wkt(geotext.to_wkt(ring))
        assert len(back) == 1
        # parse returns the spec's closed ring; engine rings are open
        assert np.allclose(back[0][:-1], [list(p) for p in ring])


def test_multipolygon_explodes_parts():
    wkt = ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), "
           "((5 5, 6 5, 6 6, 5 5)))")
    parts = geotext.parse_wkt(wkt)
    assert len(parts) == 2
    pdf = geotext.polygons_from_text([(7, "water_a", wkt)])
    assert len(pdf) == 2
    assert set(pdf.layer_id) == {7}
    assert pdf.minx.tolist() == [0.0, 5.0]


def test_geojson_polygon_and_feature():
    geom = {"type": "Polygon",
            "coordinates": [[[0, 0], [2, 0], [2, 2], [0, 0]]]}
    assert geotext.parse_geojson(geom) == [[[0, 0], [2, 0], [2, 2], [0, 0]]]
    feat = json.dumps({"type": "Feature", "properties": {},
                       "geometry": geom})
    assert geotext.parse_geojson(feat) == geotext.parse_geojson(geom)


def test_holes_rejected_not_dropped():
    wkt = ("POLYGON ((0 0, 10 0, 10 10, 0 0), "
           "(4 4, 5 4, 5 5, 4 4))")
    with pytest.raises(ValueError, match="holes"):
        geotext.parse_wkt(wkt)
    geo = {"type": "Polygon",
           "coordinates": [[[0, 0], [9, 0], [9, 9], [0, 0]],
                           [[4, 4], [5, 4], [5, 5], [4, 4]]]}
    with pytest.raises(ValueError, match="holes"):
        geotext.parse_geojson(geo)


def test_malformed_inputs_raise():
    for bad in ("LINESTRING (0 0, 1 1)",
                "POLYGON ((0 0, 1 1))",            # not closed / < 4 pts
                "POLYGON ((0 0, 1, 1 1, 0 0))"):   # bad pair
        with pytest.raises(ValueError):
            geotext.parse_wkt(bad)


def test_pip_join_identical_through_wkt(spark):
    """Fixture polygons -> WKT text -> parsed back -> packed: the PIP
    result must be identical to packing the fixture table directly."""
    polys = synth_osm_pdf()
    records = [(r.layer_id, r.channel, geotext.to_wkt(r.ring))
               for r in polys.itertuples()]
    via_text = geotext.polygons_from_text(records)
    # points at bbox centers + jitter: guaranteed real matches, so the
    # equivalence below is not vacuously two empty results
    rng = np.random.default_rng(3)
    lon = ((polys.minx + polys.maxx) / 2).to_numpy() \
        + rng.uniform(-0.5, 0.5, len(polys))
    lat = ((polys.miny + polys.maxy) / 2).to_numpy() \
        + rng.uniform(-0.5, 0.5, len(polys))
    a = pip.point_in_polygons(pip.pack_polygons(polys), lon, lat)
    b = pip.point_in_polygons(pip.pack_polygons(via_text), lon, lat)
    assert len(a[0]) > 50  # real hits
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


def test_empty_geometries_raise_loudly():
    for bad in ("POLYGON EMPTY", "MULTIPOLYGON EMPTY", "POLYGON ()",
                "MULTIPOLYGON ((0 0, 1 0, 1 1, 0 0))"):  # single-paren part
        with pytest.raises(ValueError):
            geotext.parse_wkt(bad)


def test_empty_input_gives_typed_frame():
    pdf = geotext.polygons_from_text([])
    assert list(pdf.columns) == ["layer_id", "channel", "kind", "ring",
                                 "minx", "miny", "maxx", "maxy"]
    assert len(pdf) == 0


def test_geojson_altitude_positions_accepted():
    geom = {"type": "Polygon",
            "coordinates": [[[0, 0, 5.0], [2, 0, 5.0], [2, 2, 5.0],
                             [0, 0, 5.0]]]}
    assert geotext.parse_geojson(geom) == [[[0, 0], [2, 0], [2, 2], [0, 0]]]
