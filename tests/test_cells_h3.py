"""Real-H3 backend parity tests — run only where the h3 package exists
(not this sandbox; the quadtree cells.py remains the default grid).
The importable surface and the no-h3 error path are tested everywhere."""

import numpy as np
import pytest

from loc2vec_spark import cells_h3

h3 = pytest.importorskip("h3") if cells_h3.HAS_H3 else None


def test_clean_error_without_h3():
    if cells_h3.HAS_H3:
        pytest.skip("h3 installed — error path not reachable")
    with pytest.raises(ImportError, match="quadtree"):
        cells_h3.latlon_to_cell(0.0, 0.0, 7)
    with pytest.raises(ImportError, match="quadtree"):
        cells_h3.kring(0, 1)


@pytest.mark.skipif(not cells_h3.HAS_H3, reason="h3 not installed")
class TestWithH3:
    def test_roundtrip_center(self):
        lat = np.array([51.5, -33.9, 0.0])
        lon = np.array([-0.1, 151.2, 0.0])
        ids = cells_h3.latlon_to_cell(lat, lon, 9)
        clat, clon = cells_h3.cell_center(ids)
        assert np.allclose(clat, lat, atol=0.01)
        assert np.allclose(clon, lon, atol=0.01)

    def test_parent_contains_child(self):
        ids = cells_h3.latlon_to_cell([48.85], [2.35], 9)
        par = cells_h3.cell_to_parent(ids, 7)
        assert (cells_h3.cell_to_parent(ids, 7) == par).all()

    def test_kring_symmetric_and_padded(self):
        c = int(cells_h3.latlon_to_cell([40.7], [-74.0], 8)[0])
        ring = cells_h3.kring(c, 1)
        assert c in ring and len(ring) in (6 + 1, 7)  # hex (or pentagon)
        for nb in ring:
            assert c in cells_h3.kring(nb, 1)
        arr = cells_h3.kring_array([c], 1)
        assert arr.shape == (1, 7)
        assert set(arr[0][arr[0] >= 0]) == set(ring)

    def test_spark_column_face(self, spark):
        df = spark.createDataFrame(
            [(1, 51.5, -0.1), (2, None, 10.0)],
            "id BIGINT, lat DOUBLE, lon DOUBLE")
        out = df.withColumn(
            "cell", cells_h3.cell_col_pandas("lat", "lon", 7)).collect()
        by_id = {r["id"]: r["cell"] for r in out}
        assert by_id[1] == int(cells_h3.latlon_to_cell([51.5], [-0.1], 7)[0])
        assert by_id[2] is None  # NULL-safe like cells.cell_sql
