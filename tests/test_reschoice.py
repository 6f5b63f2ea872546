"""Resolution chooser (SURVEY §4.1(c)): one-pass multi-res occupancy."""

import numpy as np
import pandas as pd
import pytest

from loc2vec_spark.cells import choose_resolution


@pytest.fixture(scope="module")
def pts(spark):
    # 3 dense urban disks + sparse background, ~20k points — the fixture
    # shape the tiling jobs run on
    rng = np.random.default_rng(7)
    disks = [(51.5, -0.1), (48.85, 2.35), (40.7, -74.0)]
    lat, lon = [], []
    for clat, clon in disks:
        lat.append(clat + 0.05 * rng.standard_normal(6000))
        lon.append(clon + 0.05 * rng.standard_normal(6000))
    lat.append(rng.uniform(-60, 70, 2000))
    lon.append(rng.uniform(-180, 180, 2000))
    pdf = pd.DataFrame({"lat": np.concatenate(lat),
                        "lon": np.concatenate(lon)})
    return spark.createDataFrame(pdf).cache()


def test_occupancy_monotone_decreasing(spark, pts):
    _, occ = choose_resolution(pts, "lat", "lon",
                               target_rows_per_cell=100,
                               res_candidates=range(4, 14))
    vals = [occ[r] for r in range(4, 14)]
    # finer cells can only shrink mean occupancy (within sketch error)
    for a, b in zip(vals, vals[1:]):
        assert b <= a * 1.1, (a, b)


def test_target_tracks_choice(spark, pts):
    coarse, _ = choose_resolution(pts, "lat", "lon",
                                  target_rows_per_cell=5000,
                                  res_candidates=range(4, 14))
    fine, _ = choose_resolution(pts, "lat", "lon",
                                target_rows_per_cell=20,
                                res_candidates=range(4, 14))
    assert fine > coarse
    # chosen res actually sits near its target
    _, occ = choose_resolution(pts, "lat", "lon",
                               target_rows_per_cell=20,
                               res_candidates=range(4, 14))
    assert occ[fine] == pytest.approx(20, rel=3.0)


def test_single_job_one_row(spark, pts):
    # the chooser is ONE aggregate — no per-resolution jobs; proxy check:
    # it returns occupancies for every candidate from a single .first()
    best, occ = choose_resolution(pts, "lat", "lon",
                                  target_rows_per_cell=100,
                                  res_candidates=range(3, 16))
    assert set(occ) == set(range(3, 16))
    assert best in occ
