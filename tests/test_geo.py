"""with_latlon / with_cells / kring_explode operator tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from loc2vec_spark import cells, fixtures
from loc2vec_spark.operators import geo


@pytest.fixture(scope="module")
def images(spark, fixture_dir):
    return spark.read.parquet(f"{fixture_dir}/images.parquet")


def test_with_latlon_parses_caption_with_jitter(spark, images):
    pdf = geo.with_latlon(images).select("image_id", "lat", "lon").toPandas()
    for _, row in pdf.head(40).iterrows():
        i = int(row.image_id.split("_")[1])
        lat0, lon0 = fixtures.row_latlon(i)
        # caption carries 6dp; jitter adds <= 1e-4
        assert abs(row.lat - lat0) < 1e-4 + 1e-6
        assert abs(row.lon - lon0) < 1e-4 + 1e-6
        # jitter is deterministic: phash-derived, not zero for most rows
    assert pdf.lat.notna().all()


def test_with_cells_expression_matches_numpy(spark, images):
    df = geo.with_cells(geo.with_latlon(images), resolutions=(5, 7, 9))
    pdf = df.select("lat", "lon", "cell_r5", "cell_r7", "cell_r9").toPandas()
    for r in (5, 7, 9):
        expect = cells.latlon_to_cell(pdf.lat.to_numpy(),
                                      pdf.lon.to_numpy(), r)
        assert np.array_equal(pdf[f"cell_r{r}"].to_numpy(), expect)


def test_pandas_udf_path_agrees_with_expression(spark, images):
    base = geo.with_latlon(images)
    a = geo.with_cells(base, resolutions=(7,)).select("image_id", "cell_r7")
    b = geo.with_cells_pandas(base, resolutions=(7,)) \
           .select("image_id", F.col("cell_r7").alias("cell_udf"))
    joined = a.join(b, "image_id")
    assert joined.filter(F.col("cell_r7") != F.col("cell_udf")).count() == 0


def test_kring_explode_matches_oracle(spark, images):
    df = geo.with_cells(geo.with_latlon(images), resolutions=(7,))
    out = geo.kring_explode(df.select("image_id", "cell_r7"),
                            "cell_r7", res=7, k=1)
    got = (out.groupBy("image_id", "cell_r7")
              .agg(F.sort_array(F.collect_set("nb_cell")).alias("ring"))
              .toPandas())
    for _, row in got.iterrows():
        assert list(row.ring) == cells.kring(int(row.cell_r7), 1)


def test_cell_assignment_is_codegen(spark, images):
    """Tile assignment must stay JVM-side: no Python/Arrow eval nodes and
    the parquet scan must prune to the needed columns."""
    df = geo.with_cells(geo.with_latlon(images), resolutions=(7,)) \
            .select("image_id", "cell_r7")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "*(1)" in plan  # whole-stage codegen star
    scan = plan[plan.index("ReadSchema"):]
    assert "bytes" not in scan  # column pruning: never read image payloads


def test_geom_stats_matches_numpy_shoelace(spark):
    """Shoelace area/centroid vs an independent numpy implementation on
    the same synthesized kite vertices."""
    from loc2vec_spark import queries as q
    out = {int(r.pid): r for r in
           q.run_spark(spark, "/root/testdata/sf0.001", "geom_stats")
            .collect()}
    for key in out:
        cx = ((key * 40503) % 300000) - 150000
        cy = ((key * 2654435761) % 120000) - 60000
        a_w = 500 + (key % 7) * 300
        a_s = 300 + (key % 5) * 400
        a_e = 400 + (key % 11) * 250
        a_n = 200 + (key % 13) * 350
        v = np.array([[cx - a_w, cy], [cx, cy - a_s],
                      [cx + a_e, cy], [cx, cy + a_n]], dtype=np.float64)
        x, y = v[:, 0], v[:, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        cross = x * y2 - x2 * y
        area = abs(cross.sum()) / 2.0 / 1e6
        clon = ((x + x2) * cross).sum() / (3.0 * cross.sum()) / 1e3
        clat = ((y + y2) * cross).sum() / (3.0 * cross.sum()) / 1e3
        r = out[key]
        assert abs(r.area_deg2 - area) < 1e-5
        assert abs(r.centroid_lon - clon) < 1e-5
        assert abs(r.centroid_lat - clat) < 1e-5
        # the kite is irregular: centroid is NOT the synthesis center
        if a_w != a_e or a_s != a_n:
            assert (abs(r.centroid_lon - cx / 1e3) > 1e-6
                    or abs(r.centroid_lat - cy / 1e3) > 1e-6)


def test_traj_stats_invariants(spark):
    from loc2vec_spark import queries as q
    sf = "/root/testdata/sf0.01"
    out = q.run_spark(spark, sf, "traj_stats").collect()
    per_user = {r["user_id"]: r["n"] for r in
                spark.read.parquet(f"{sf}/events.parquet")
                     .groupBy("user_id").agg(F.count("*").alias("n"))
                     .collect()}
    assert len(out) == len(per_user)
    for r in out:
        assert r.n_steps == per_user[r.user_id] - 1
        assert 0 <= r.max_step_sq <= r.path_sq_sum
        # Cauchy-Schwarz: (net displacement)^2 <= n * sum of step^2
        assert r.net_disp_sq <= max(1, r.n_steps) * r.path_sq_sum
    assert len({r.path_sq_sum for r in out}) > len(out) // 2


def test_focal_stats_invariants(spark):
    """Sparse-raster focal semantics: the self cell always contributes
    (nb_n >= 1, nb_sum >= own count, nb_max >= own count), nb_n <= 9,
    focal_mean = nb_sum / nb_n exactly; row set = occupied res-5 cells.
    Cross-checked against a numpy re-aggregation of the same surface."""
    import numpy as np

    from loc2vec_spark import queries as q
    sf = "/root/testdata/sf0.01"
    out = q.run_spark(spark, sf, "focal_stats").collect()
    surface = {(r.ci, r.cj): r.n_pts for r in out}
    assert len(out) == len(surface)  # one row per occupied cell
    n = 1 << 5
    for r in out:
        assert 1 <= r.nb_n <= 9
        assert r.nb_sum >= r.n_pts and r.nb_max >= r.n_pts
        assert abs(r.focal_mean - r.nb_sum / r.nb_n) < 1e-9
        nbrs = [surface[((r.ci + di) % n, r.cj + dj)]
                for di in (-1, 0, 1) for dj in (-1, 0, 1)
                if ((r.ci + di) % n, r.cj + dj) in surface
                and 0 <= r.cj + dj < n]
        assert r.nb_n == len(nbrs)
        assert r.nb_sum == sum(nbrs) and r.nb_max == max(nbrs)
    assert any(r.nb_n > 1 for r in out)  # adjacency has teeth


def test_morans_i_matches_numpy_definition(spark):
    """The scaled-deviation integer formulation equals the textbook
    Moran's I = (N/W) * sum_w (x_i-mean)(x_j-mean) / sum (x_i-mean)^2
    computed in floating point from the same occupied-cell surface."""
    import numpy as np

    from loc2vec_spark import queries as q
    sf = "/root/testdata/sf0.01"
    row = q.run_spark(spark, sf, "morans_i").collect()[0]
    surf = {(r.ci, r.cj): r.n_pts
            for r in q.run_spark(spark, sf, "focal_stats").collect()}
    xs = np.array(list(surf.values()), dtype=np.float64)
    mean = xs.mean()
    n = 1 << 5
    num, w = 0.0, 0
    for (ci, cj), x in surf.items():
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                key = ((ci + di) % n, cj + dj)
                if 0 <= cj + dj < n and key in surf:
                    num += (x - mean) * (surf[key] - mean)
                    w += 1
    assert row.n_cells == len(surf) and row.w_pairs == w > 0
    expect = (len(surf) / w) * num / ((xs - mean) ** 2).sum()
    assert abs(row.morans_i - expect) < 1e-5
    assert -1.5 <= row.morans_i <= 1.5  # sane magnitude


def test_getis_gi_matches_numpy_definition(spark):
    """The integer-moment Gi* formulation equals the textbook
    Gi*(i) = (sum_j w_ij x_j - xbar*W_i) / (s*sqrt((n*W_i - W_i^2)/(n-1)))
    with binary 3x3 weights including self, computed in floating point
    from the same occupied-cell surface."""
    import numpy as np

    from loc2vec_spark import queries as q
    sf = "/root/testdata/sf0.01"
    rows = q.run_spark(spark, sf, "getis_gi").collect()
    surf = {(r.ci, r.cj): r.n_pts
            for r in q.run_spark(spark, sf, "focal_stats").collect()}
    assert {(r.ci, r.cj) for r in rows} == set(surf)  # occupied cells
    xs = np.array(list(surf.values()), dtype=np.float64)
    nn, mean = len(xs), xs.mean()
    s = np.sqrt((xs * xs).mean() - mean * mean)
    grid = 1 << 5
    for r in rows:
        w, gsum = 0, 0
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                key = ((r.ci + di) % grid, r.cj + dj)
                if 0 <= r.cj + dj < grid and key in surf:
                    w += 1
                    gsum += surf[key]
        assert (r.w, r.gsum) == (w, gsum)
        expect = ((gsum - mean * w)
                  / (s * np.sqrt((nn * w - w * w) / (nn - 1))))
        assert abs(r.gi_z - expect) < 1e-5
    # hot spots exist in the clustered fixture: some |z| well above 0
    assert max(abs(r.gi_z) for r in rows) > 1.0


def test_pagerank_cells_matches_numpy_power_iteration(spark):
    """The decimal-quantized iterative formulation equals two textbook
    damped power-iteration steps computed in float64 from the same
    occupied-cell adjacency graph (quantization error <= 1e-12/step)."""
    import numpy as np

    from loc2vec_spark import queries as q
    sf = "/root/testdata/sf0.01"
    rows = q.run_spark(spark, sf, "pagerank_cells").collect()
    surf = {(r.ci, r.cj) for r in q.run_spark(spark, sf,
                                              "focal_stats").collect()}
    assert {(r.ci, r.cj) for r in rows} == surf
    grid = 1 << 5
    nbrs = {}
    for (ci, cj) in surf:
        nbrs[(ci, cj)] = [((ci + di) % grid, cj + dj)
                          for di in (-1, 0, 1) for dj in (-1, 0, 1)
                          if not (di == 0 and dj == 0)
                          and 0 <= cj + dj < grid
                          and ((ci + di) % grid, cj + dj) in surf]
    n = len(surf)
    pr = {c: 1.0 / n for c in surf}
    for _ in range(2):
        nxt = {c: 0.0 for c in surf}
        for c, pv in pr.items():
            d = len(nbrs[c])
            for nb in nbrs[c]:
                nxt[nb] += pv / d
        pr = {c: 0.15 / n + 0.85 * nxt[c] for c in surf}
    for r in rows:
        assert r.deg == len(nbrs[(r.ci, r.cj)])
        assert abs(r.pagerank - pr[(r.ci, r.cj)]) < 1e-8, (r.ci, r.cj)
    total = sum(r.pagerank for r in rows)
    assert 0.2 < total <= 1.0 + 1e-9  # dangling mass leaks, never grows


# ---------------------------------------------------------------------------
# compact_cells / uncompact_cells / compact_cells_df (H3 compact analog)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255)),
                min_size=1, max_size=200),
       st.integers(4, 8), st.integers(0, 4))
def test_compact_roundtrip_property(ij, res, min_res):
    """uncompact(compact(s), res) == unique(s) for arbitrary cell sets,
    and the compact cover is disjoint (leaf counts sum exactly)."""
    i = np.array([p[0] for p in ij], dtype=np.int64) % (1 << res)
    j = np.array([p[1] for p in ij], dtype=np.int64) % (1 << res)
    s = cells.ij_to_cell(i, j, res)
    comp = cells.compact_cells(s, min_res=min_res)
    back = cells.uncompact_cells(comp, res)
    assert np.array_equal(back, np.unique(s))
    # disjointness: expanded leaf counts sum to the unique input size
    d = res - (comp >> cells.RES_SHIFT)
    assert int((np.int64(1) << (2 * d)).sum()) == np.unique(s).size
    # every output res respects the floor
    assert int((comp >> cells.RES_SHIFT).min()) >= min_res


def test_compact_full_block_collapses_to_ancestor():
    """A complete 4^d block compacts to its single res-(r-d) ancestor."""
    res, d = 6, 3
    k = np.arange(1 << d, dtype=np.int64)
    ci = (5 << d) + np.repeat(k, 1 << d)
    cj = (2 << d) + np.tile(k, 1 << d)
    s = cells.ij_to_cell(ci, cj, res)
    comp = cells.compact_cells(s)
    assert comp.size == 1
    assert comp[0] == int(cells.ij_to_cell(
        np.array([5]), np.array([2]), res - d)[0])
    # min_res floor stops the collapse partway
    comp2 = cells.compact_cells(s, min_res=res - 1)
    assert np.all(comp2 >> cells.RES_SHIFT == res - 1)
    assert comp2.size == 4 ** (d - 1)


def test_compact_rejects_mixed_res_and_handles_empty():
    empty = cells.compact_cells(np.array([], dtype=np.int64))
    assert empty.size == 0
    assert cells.uncompact_cells(empty, 9).size == 0
    mixed = np.array([int(cells.ij_to_cell(np.array([1]), np.array([1]), 5)[0]),
                      int(cells.ij_to_cell(np.array([1]), np.array([1]), 6)[0])])
    with pytest.raises(ValueError):
        cells.compact_cells(mixed)
    with pytest.raises(ValueError):
        cells.uncompact_cells(np.array([int(mixed[1])]), 5)


def test_compact_cells_df_matches_numpy(spark, images):
    """Distributed compaction over the fixture's occupied res-12 surface
    agrees cell-for-cell (and leaf-count-for-leaf-count) with the numpy
    face, including duplicates in the input."""
    df = geo.with_cells(geo.with_latlon(images), resolutions=(12,))
    out = geo.compact_cells_df(df, "cell_r12", min_res=8).toPandas()
    s = df.select("cell_r12").toPandas().cell_r12.to_numpy()
    expect = cells.compact_cells(s, min_res=8)
    got = np.sort(out.cell.to_numpy())
    assert np.array_equal(got, expect)
    # n_leaves/res columns agree with the id's embedded resolution
    assert (out.res.to_numpy() ==
            (out.cell.to_numpy() >> cells.RES_SHIFT)).all()
    assert (out.n_leaves.to_numpy() ==
            4 ** (12 - out.res.to_numpy())).all()
    # distributed face round-trips too
    back = cells.uncompact_cells(out.cell.to_numpy(), 12)
    assert np.array_equal(back, np.unique(s))


def test_compact_cells_df_empty_and_mixed(spark):
    empty = spark.createDataFrame([], "cell long")
    assert geo.compact_cells_df(empty).count() == 0
    mixed = spark.createDataFrame(
        [(int(cells.ij_to_cell(np.array([1]), np.array([1]), 5)[0]),),
         (int(cells.ij_to_cell(np.array([1]), np.array([1]), 6)[0]),)],
        "cell long")
    with pytest.raises(ValueError):
        geo.compact_cells_df(mixed)


# ---------------------------------------------------------------------------
# geohash_encode / geohash *_sql faces (interop id #3)
# ---------------------------------------------------------------------------

def test_geohash_known_vectors():
    """Canonical geohash test vectors (public reference values)."""
    assert cells.geohash_encode([57.64911], [10.40744], 12)[0] == \
        "u4pruydqqvj8"
    assert cells.geohash_encode([48.669], [-4.329], 5)[0] == "gbsuv"
    assert cells.geohash_encode([0.0], [0.0], 8)[0] == "s0000000"
    # lon 180 wraps to -180, lat 90 clamps to the top row
    assert cells.geohash_encode([90.0], [180.0], 6)[0] == \
        cells.geohash_encode([89.9999999], [-180.0], 6)[0]


@settings(max_examples=40, deadline=None)
@given(st.floats(-90, 90, allow_nan=False),
       st.floats(-180, 180, allow_nan=False, exclude_max=True),
       st.integers(1, 11))
def test_geohash_prefix_law(lat, lon, prec):
    """Truncating a geohash IS the lower-precision geohash (the nesting
    property range scans rely on)."""
    full = cells.geohash_encode([lat], [lon], 12)[0]
    assert cells.geohash_encode([lat], [lon], prec)[0] == full[:prec]


def test_geohash_sql_matches_numpy(spark):
    """The portable SQL face (units -> interleave -> alphabet) agrees
    with the numpy face on random coordinates, through Spark."""
    rng = np.random.default_rng(11)
    lat = rng.uniform(-90, 90, 300)
    lon = rng.uniform(-180, 180, 300)
    df = spark.createDataFrame(
        [(float(a), float(o)) for a, o in zip(lat, lon)], "lat double, lon double")
    lu, la = cells.geohash_units_sql("lat", "lon", 8)
    df.createOrReplaceTempView("_gh_pts")
    got = spark.sql(f"""
        WITH u AS (SELECT lat, lon, {lu} AS lu, {la} AS la FROM _gh_pts),
        b AS (SELECT lat, lon,
                     {cells.geohash_uint_sql('lu', 'la', 8)} AS g FROM u)
        SELECT {cells.geohash_chars_sql('g', 8)} AS gh FROM b
    """).toPandas().gh.to_numpy()
    assert (got == cells.geohash_encode(lat, lon, 8)).all()


# ---------------------------------------------------------------------------
# dbscan_points_df (grid DBSCAN)
# ---------------------------------------------------------------------------

def _cell_center(ci, cj, res):
    n = 1 << res
    return ((cj + 0.5) / n * 180.0 - 90.0, (ci + 0.5) / n * 360.0 - 180.0)


def test_dbscan_planted_grid_exact():
    """Planted structure at res 10 / minpts 4: two adjacent dense cells
    (one cluster), one isolated dense cell (second cluster), an
    antimeridian-wrapped dense pair (third cluster), a border point in
    a sparse diagonal neighbor, and a far noise point. Every verdict
    and label (min member cell id) is fully determined."""
    from loc2vec_spark.session import get_spark
    spark = get_spark(master="local[4]")
    res, n = 10, 1 << 10
    rows, pid = [], 0

    def put(ci, cj, k):
        nonlocal pid
        lat, lon = _cell_center(ci, cj, res)
        for _ in range(k):
            rows.append((pid, lat, lon))
            pid += 1

    put(100, 200, 4)   # dense A1
    put(101, 200, 4)   # dense A2 (adjacent -> cluster A)
    put(500, 600, 4)   # dense B (isolated cluster)
    put(0, 300, 4)     # dense W1
    put(n - 1, 300, 4) # dense W2 (adjacent to W1 via lon wrap)
    put(102, 201, 1)   # border: sparse, diagonal neighbor of A2
    put(900, 100, 1)   # noise
    df = spark.createDataFrame(rows, "pid long, lat double, lon double")
    out = geo.dbscan_points_df(df, "pid", res=res, minpts=4).toPandas() \
             .set_index("pid").sort_index()

    def nid(ci, cj):
        return cj * (1 << 29) + ci

    a, b, w = nid(100, 200), nid(500, 600), nid(0, 300)
    for i in range(8):
        assert out.loc[i].role == "core" and out.loc[i].cluster == a
    for i in range(8, 12):
        assert out.loc[i].role == "core" and out.loc[i].cluster == b
    for i in range(12, 20):   # wrap pair collapses to one cluster
        assert out.loc[i].role == "core" and out.loc[i].cluster == w, i
    assert out.loc[20].role == "border" and out.loc[20].cluster == a
    assert out.loc[21].role == "noise" and np.isnan(out.loc[21].cluster)


def test_dbscan_all_sparse_is_noise(spark):
    df = spark.createDataFrame(
        [(i, float(i), float(i)) for i in range(5)],
        "pid long, lat double, lon double")
    out = geo.dbscan_points_df(df, "pid", res=12, minpts=2).toPandas()
    assert (out.role == "noise").all()
    assert out.cluster.isna().all()


def test_compact_cells_df_early_break_and_no_persist(spark):
    """A set with NO complete sibling group returns at input res on the
    first level (early break), and persist=False agrees with the
    default path."""
    # 4 cells, all in distinct parent groups -> nothing compacts
    ci = np.array([0, 2, 4, 6], dtype=np.int64)
    cj = np.array([0, 2, 4, 6], dtype=np.int64)
    s = [int(c) for c in cells.ij_to_cell(ci, cj, 9)]
    df = spark.createDataFrame([(c,) for c in s], "cell long")
    for persist in (True, False):
        out = geo.compact_cells_df(df, min_res=0, persist=persist) \
                 .toPandas().sort_values("cell")
        assert out.cell.tolist() == sorted(s)
        assert (out.res == 9).all() and (out.n_leaves == 1).all()


# ---------------------------------------------------------------------------
# dwithin_join (radius spatial join)
# ---------------------------------------------------------------------------

def test_dwithin_blocking_complete_vs_bruteforce(spark):
    """The 3x3 cell-blocked join finds EXACTLY the brute-force pair set
    (same planar-degree metric) on random points, radius at the
    blocking bound."""
    rng = np.random.default_rng(5)
    lat = rng.uniform(-89, 89, 400)
    lon = rng.uniform(-180, 180, 400)
    # densify: half the points get a nearby twin so pairs exist
    lat[200:] = lat[:200] + rng.uniform(-0.01, 0.01, 200)
    lon[200:] = lon[:200] + rng.uniform(-0.01, 0.01, 200)
    df = spark.createDataFrame(
        [(i, float(a), float(o)) for i, (a, o) in enumerate(zip(lat, lon))],
        "pid long, lat double, lon double")
    r = 180.0 / (1 << 14)          # exactly the res-14 bound
    out = geo.dwithin_join(df, df, radius=r, res=14,
                           id_left="pid", id_right="pid")
    got = {(a, b) for a, b in
           out.filter(F.col("id_a") < F.col("id_b"))
              .select("id_a", "id_b").toPandas().itertuples(index=False)}
    dlat = lat[:, None] - lat[None, :]
    dlon = (lon[:, None] - lon[None, :] + 180.0) % 360.0 - 180.0
    d2 = dlat * dlat + dlon * dlon
    ii, jj = np.where(d2 <= r * r)
    expect = {(int(a), int(b)) for a, b in zip(ii, jj) if a < b}
    assert got == expect and len(expect) > 50


def test_dwithin_antimeridian_pair_and_radius_guard(spark):
    df = spark.createDataFrame(
        [(0, 10.0, 179.999), (1, 10.0, -179.999), (2, 10.0, 0.0)],
        "pid long, lat double, lon double")
    out = geo.dwithin_join(df, df, radius=0.01, res=14,
                           id_left="pid", id_right="pid") \
             .filter(F.col("id_a") < F.col("id_b")).toPandas()
    assert len(out) == 1                       # the wrapped pair only
    assert (out.id_a[0], out.id_b[0]) == (0, 1)
    assert abs(out.dist2[0] - 0.002**2) < 1e-12
    with pytest.raises(ValueError):
        geo.dwithin_join(df, df, radius=0.02, res=14)  # > cell extent


def test_geohash_sql_faces_reject_unrepresentable_precision():
    """The SQL faces do double FLOOR-division bit extraction — exact
    only under 2^53 (precision <= 10); 11+ must raise, the numpy face
    still serves them (known-vector tested at 12)."""
    for fn in (lambda p: cells.geohash_units_sql("lat", "lon", p),
               lambda p: cells.geohash_uint_sql("lu", "la", p),
               lambda p: cells.geohash_chars_sql("g", p)):
        fn(10)  # boundary ok
        with pytest.raises(ValueError):
            fn(11)


def test_stay_points_matches_numpy_replay(spark):
    """The gaps-and-islands SQL agrees with an independent numpy replay
    of the same dwell-block derivation on a planted 3-user event set."""
    import datetime as dt

    import pandas as pd
    base = dt.datetime(2024, 1, 1)
    rows = [(u * 100 + i, u, base + dt.timedelta(seconds=60 * i + u))
            for u in range(3) for i in range(27)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp")
    df.createOrReplaceTempView("events")
    from loc2vec_spark.queries import QUERIES
    got = spark.sql(QUERIES["stay_points"].spark_sql).toPandas() \
               .sort_values(["user_id", "seg_id"]).reset_index(drop=True)

    # independent replay
    expect = []
    for u in range(3):
        evs = sorted([e for e, uu, _ in rows if uu == u])
        segs, seg_id, prev = {}, 0, None
        for rn, e in enumerate(evs, start=1):
            blk = (rn - 1) // 10
            px = (u * 2654435761 + blk * 40503 + 17) % 100000 + (e * 101) % 5
            py = (u * 40503 + blk * 2654435761 + 71) % 100000 + (e * 211) % 5
            if prev is None or (px - prev[0]) ** 2 + (py - prev[1]) ** 2 > 50:
                seg_id += 1
            segs.setdefault(seg_id, []).append((e, px, py))
            prev = (px, py)
        for sid, pts in segs.items():
            if len(pts) >= 5:
                expect.append((u, sid, len(pts), min(p[0] for p in pts),
                               max(p[0] for p in pts),
                               sum(p[1] for p in pts),
                               sum(p[2] for p in pts)))
    exp = pd.DataFrame(expect, columns=list(got.columns)) \
            .sort_values(["user_id", "seg_id"]).reset_index(drop=True)
    assert len(exp) >= 6                      # 2 full blocks per user min
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_od_flows_trip_conservation(spark):
    """OD flows compose the stay relation: total trips == total stays
    minus one per user with stays (each consecutive-stay pair is one
    trip), and every OD cell is on the 8x8 grid."""
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    rows = [(u * 1000 + i, u, base + dt.timedelta(seconds=60 * i + u))
            for u in range(4) for i in range(35)]
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp") \
        .createOrReplaceTempView("events")
    from loc2vec_spark.queries import QUERIES
    stays = spark.sql(QUERIES["stay_points"].spark_sql).toPandas()
    od = spark.sql(QUERIES["od_flows"].spark_sql).toPandas()
    per_user = stays.groupby("user_id").size()
    expect_trips = int((per_user - 1).clip(lower=0).sum())
    assert expect_trips > 0
    assert int(od.n_trips.sum()) == expect_trips
    for c in ("ox", "oy", "dx", "dy"):
        # 0..8, not 0..7: an edge-anchored dwell block's centroid can
        # pass 100000 (anchor 99999 + positive mean jitter), landing
        # in the boundary col/row 8 — see the _OD_CELL note
        assert od[c].between(0, 8).all()


def test_colocation_pairs_matches_pandas_replay(spark):
    """Co-dwell pairs agree with an independent pandas replay (cell
    join + interval-overlap + threshold) over the SAME stay relation,
    and respect user_a < user_b / count >= 2 contracts."""
    import datetime as dt

    import pandas as pd
    base = dt.datetime(2024, 1, 1)
    # event ids interleave globally (the events-table shape) — the
    # overlap test runs on event-id spans, so ids must be a shared axis
    rows = [(i * 60 + u, u, base + dt.timedelta(seconds=60 * i + u))
            for u in range(60) for i in range(400)]
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp") \
        .createOrReplaceTempView("events")
    from loc2vec_spark.queries import QUERIES
    stays = spark.sql(QUERIES["stay_points"].spark_sql).toPandas()
    from loc2vec_spark.queries_geo import _colocation_fn
    got = _colocation_fn(spark, None).toPandas()

    sc = stays.assign(cx=(stays.sum_px // (stays.n_pts * 12500)),
                      cy=(stays.sum_py // (stays.n_pts * 12500)))
    m = sc.merge(sc, on=["cx", "cy"], suffixes=("_a", "_b"))
    m = m[(m.user_id_a < m.user_id_b)
          & (m.first_event_a <= m.last_event_b)
          & (m.first_event_b <= m.last_event_a)]
    exp = (m.groupby(["user_id_a", "user_id_b"]).size()
            .reset_index(name="n_codwells"))
    exp = exp[exp.n_codwells >= 2].reset_index(drop=True)
    got2 = got.sort_values(["user_a", "user_b"]).reset_index(drop=True)
    exp2 = exp.sort_values(["user_id_a", "user_id_b"]) \
              .reset_index(drop=True)
    assert len(got2) == len(exp2) > 0
    assert (got2.user_a.to_numpy() == exp2.user_id_a.to_numpy()).all()
    assert (got2.user_b.to_numpy() == exp2.user_id_b.to_numpy()).all()
    assert (got2.n_codwells.to_numpy() == exp2.n_codwells.to_numpy()).all()
    assert (got2.user_a < got2.user_b).all()
    assert (got2.n_codwells >= 2).all()


# ---------------------------------------------------------------------------
# late-r5 second wave: traj_spike_filter / traj_resample / map_match /
# hausdorff_pairs
# ---------------------------------------------------------------------------

def test_traj_spike_filter_matches_python_replay(spark):
    """The lone-outlier spike rule agrees with an independent python
    replay on a planted 3-user event set, and at least one planted
    displacement is actually detected."""
    import datetime as dt

    import pandas as pd
    base = dt.datetime(2024, 1, 1)
    rows = [(u * 100 + i, u, base + dt.timedelta(seconds=60 * i + u))
            for u in range(3) for i in range(40)]
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp") \
        .createOrReplaceTempView("events")
    from loc2vec_spark.queries import QUERIES
    got = spark.sql(QUERIES["traj_spike_filter"].spark_sql).toPandas() \
               .sort_values("user_id").reset_index(drop=True)

    TH = 100_000_000

    def d2(a, b):
        return (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2

    expect = []
    for u in range(3):
        evs = sorted(e for e, uu, _ in rows if uu == u)
        pts = []
        for rn, e in enumerate(evs, start=1):
            blk = (rn - 1) // 10
            px = (u * 2654435761 + blk * 40503 + 17) % 100000 \
                + (e * 101) % 5
            py = (u * 40503 + blk * 2654435761 + 71) % 100000 \
                + (e * 211) % 5
            if e % 17 == 0:
                px += 40000
            if e % 23 == 0:
                py -= 40000
            pts.append((px, py))
        spikes = [0] * len(pts)
        for i in range(1, len(pts) - 1):
            if (d2(pts[i], pts[i - 1]) > TH
                    and d2(pts[i + 1], pts[i]) > TH
                    and d2(pts[i + 1], pts[i - 1]) <= TH):
                spikes[i] = 1
        expect.append((u, len(pts), sum(spikes),
                       sum(p[0] for p, s in zip(pts, spikes) if not s),
                       sum(p[1] for p, s in zip(pts, spikes) if not s)))
    exp = pd.DataFrame(expect, columns=list(got.columns))
    assert exp.n_spikes.sum() > 0           # planted spikes detected
    assert (exp.n_spikes < exp.n_pts).all()  # never everything
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  exp.astype("int64"))


def test_traj_resample_matches_python_replay(spark):
    """6h-grid resampling: ticks are exactly the grid points strictly
    inside each segment's (t, t1] span, and the interpolated positions
    match the replayed fixed-order double expression."""
    import datetime as dt

    import numpy as np
    base = dt.datetime(2024, 1, 1)
    # 4h sampling over 48h -> segments straddle 6h ticks irregularly
    rows = [(u * 50 + i, u, base + dt.timedelta(hours=4 * i,
                                                seconds=u * 7 + i))
            for u in range(2) for i in range(13)]
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp") \
        .createOrReplaceTempView("events")
    from loc2vec_spark.queries import QUERIES
    got = spark.sql(QUERIES["traj_resample"].spark_sql).toPandas() \
               .sort_values(["user_id", "tick"]).reset_index(drop=True)

    STEP = 21_600_000_000
    EPOCH = dt.datetime(1970, 1, 1)
    expect = []
    for u in range(2):
        evs = sorted((ts, e) for e, uu, ts in rows if uu == u)
        pts = []
        for rn, (ts, e) in enumerate(evs, start=1):
            blk = (rn - 1) // 10
            px = (u * 2654435761 + blk * 40503 + 17) % 100000 \
                + (e * 101) % 5
            py = (u * 40503 + blk * 2654435761 + 71) % 100000 \
                + (e * 211) % 5
            # exact integer micros (never float total_seconds)
            t = ((ts - EPOCH).days * 86_400_000_000
                 + (ts - EPOCH).seconds * 1_000_000
                 + (ts - EPOCH).microseconds)
            pts.append((t, px, py))
        for (t, px, py), (t1, px1, py1) in zip(pts, pts[1:]):
            for k in range(t // STEP + 1, t1 // STEP + 1):
                r = float(k * STEP - t) / float(t1 - t)
                expect.append((u, k, px + (px1 - px) * r,
                               py + (py1 - py) * r))
    exp = sorted(expect)
    assert len(exp) > 10
    assert len(got) == len(exp)
    assert (got.user_id.to_numpy()
            == np.array([e[0] for e in exp])).all()
    assert (got.tick.to_numpy() == np.array([e[1] for e in exp])).all()
    assert np.allclose(got.ix.to_numpy(),
                       np.array([e[2] for e in exp]), rtol=1e-12)
    assert np.allclose(got.iy.to_numpy(),
                       np.array([e[3] for e in exp]), rtol=1e-12)


def test_map_match_matches_numpy_replay(spark):
    """Snap-to-segment agrees with a numpy clamped-projection replay
    (argmin with seg_id tiebreak) over the same derived points/segments,
    and every point is matched exactly once."""
    import numpy as np
    spark.createDataFrame([(k,) for k in range(8)],
                          "n_nationkey long") \
        .createOrReplaceTempView("nation")
    spark.createDataFrame([(v, [0.0]) for v in range(200)],
                          "vec_id long, embedding array<double>") \
        .createOrReplaceTempView("embeddings")
    from loc2vec_spark.queries import PTS, QUERIES
    from loc2vec_spark.queries_geo import _BLAT, _BLON
    got = spark.sql(QUERIES["map_match"].spark_sql).toPandas() \
               .sort_values("vec_id").reset_index(drop=True)
    pts = spark.sql(f"WITH {PTS} SELECT vec_id, lat, lon FROM pts") \
               .toPandas().sort_values("vec_id")
    segs = spark.sql(f"""
        SELECT n_nationkey AS seg_id, {_BLON} AS ax, {_BLAT} AS ay,
               {_BLON} + CAST((n_nationkey % 5) - 2 AS DOUBLE) AS bx,
               {_BLAT} + CAST(1 + (n_nationkey % 3) AS DOUBLE) AS by
        FROM nation""").toPandas().sort_values("seg_id")

    px = pts.lon.to_numpy()[:, None]
    py = pts.lat.to_numpy()[:, None]
    ax, ay = segs.ax.to_numpy()[None], segs.ay.to_numpy()[None]
    bx, by = segs.bx.to_numpy()[None], segs.by.to_numpy()[None]
    t = np.clip(((px - ax) * (bx - ax) + (py - ay) * (by - ay))
                / ((bx - ax) ** 2 + (by - ay) ** 2), 0.0, 1.0)
    d2 = (px - (ax + t * (bx - ax))) ** 2 + (py - (ay + t * (by - ay))) ** 2
    best = np.argmin(d2, axis=1)           # first min = lowest seg_id
    assert len(got) == len(pts)            # one match per point
    assert (got.vec_id.to_numpy() == pts.vec_id.to_numpy()).all()
    assert (got.seg_id.to_numpy()
            == segs.seg_id.to_numpy()[best]).all()
    assert np.allclose(got.snap_d2.to_numpy(),
                       d2[np.arange(len(pts)), best], rtol=1e-12)
    assert np.allclose(got.seg_t.to_numpy(),
                       t[np.arange(len(pts)), best], rtol=1e-12)
    assert got.seg_t.between(0.0, 1.0).all()


def test_hausdorff_pairs_matches_python_replay(spark):
    """Symmetric squared Hausdorff over stay centroids agrees with an
    independent python replay (shared-cell candidates, directed
    max-min both ways, threshold), exact int64."""
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    rows = [(i * 60 + u, u, base + dt.timedelta(seconds=60 * i + u))
            for u in range(40) for i in range(300)]
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp") \
        .createOrReplaceTempView("events")
    from loc2vec_spark.queries import QUERIES
    stays = spark.sql(QUERIES["stay_points"].spark_sql).toPandas()
    from loc2vec_spark.queries_geo import _hausdorff_fn
    got = _hausdorff_fn(spark, None).toPandas() \
        .sort_values(["user_a", "user_b"]).reset_index(drop=True)

    cen: dict[int, list[tuple[int, int]]] = {}
    cells_of: dict[int, set[tuple[int, int]]] = {}
    for r in stays.itertuples():
        cx = int(r.sum_px) // int(r.n_pts)
        cy = int(r.sum_py) // int(r.n_pts)
        cen.setdefault(int(r.user_id), []).append((cx, cy))
        cells_of.setdefault(int(r.user_id), set()) \
                .add((cx // 12500, cy // 12500))
    users = sorted(cen)
    exp = []
    for i, ua in enumerate(users):
        for ub in users[i + 1:]:
            if not (cells_of[ua] & cells_of[ub]):
                continue
            h = 0
            for side_a, side_b in ((cen[ua], cen[ub]),
                                   (cen[ub], cen[ua])):
                for p in side_a:
                    m = min((p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2
                            for q in side_b)
                    h = max(h, m)
            if h <= 400_000_000:
                exp.append((ua, ub, h))
    exp.sort()
    assert len(exp) > 0
    assert len(got) == len(exp)
    for col, idx in (("user_a", 0), ("user_b", 1), ("hausdorff_d2", 2)):
        assert (got[col].to_numpy()
                == [e[idx] for e in exp]).all(), col
    assert (got.user_a < got.user_b).all()


def test_segment_intersections_matches_python_replay(spark):
    """The reported (edge, road) pairs — and ONLY those — properly
    intersect under an exact-integer replay of the four-orientation
    straddle predicate over the same derived edges and road chords."""
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    rows = [(i * 60 + u, u, base + dt.timedelta(seconds=60 * i + u))
            for u in range(20) for i in range(200)]
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp") \
        .createOrReplaceTempView("events")
    spark.createDataFrame([(k,) for k in range(12)],
                          "n_nationkey long") \
        .createOrReplaceTempView("nation")
    from loc2vec_spark.queries import QUERIES
    got = spark.sql(QUERIES["segment_intersections"].spark_sql).toPandas()

    pos: dict[int, list[tuple[int, int, int]]] = {}
    for (eid, u, ts) in rows:
        pos.setdefault(u, []).append((ts, eid))
    for u in pos:
        pos[u] = [((u * 2654435761 + ((rn - 1) // 10) * 40503 + 17)
                   % 100000 + (eid * 101) % 5,
                   (u * 40503 + ((rn - 1) // 10) * 2654435761 + 71)
                   % 100000 + (eid * 211) % 5)
                  for rn, (ts, eid) in enumerate(sorted(pos[u]), start=1)]
    roads = [(k, (k * 2654435761 + 99991) % 100000,
              (k * 40503 + 777) % 100000,
              (k * 7919 + 54321) % 100000,
              (k * 104729 + 3333) % 100000) for k in range(12)]

    def orient(ax, ay, bx, by, cx, cy):
        return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

    exp = set()
    for u, pts in pos.items():
        for rn, ((ax, ay), (ex, ey)) in enumerate(zip(pts, pts[1:]),
                                                  start=1):
            for (sid, cx, cy, dx, dy) in roads:
                o1 = orient(ax, ay, ex, ey, cx, cy)
                o2 = orient(ax, ay, ex, ey, dx, dy)
                o3 = orient(cx, cy, dx, dy, ax, ay)
                o4 = orient(cx, cy, dx, dy, ex, ey)
                if o1 * o2 < 0 and o3 * o4 < 0:
                    exp.add((u, rn, sid, o1, o2))
    assert len(got) == len(exp) > 0
    assert set(map(tuple, got[["user_id", "edge_rn", "seg_id",
                               "cross_c", "cross_d"]]
                   .itertuples(index=False))) == exp


def test_idw_interpolate_matches_numpy_replay(spark):
    """IDW values equal a brute-force numpy replay (top-3 by (d2, id),
    smoothed 1/(1+d2) weights) and every value is a convex blend: it
    lies within [min, max] of its three neighbor values."""
    import numpy as np
    from loc2vec_spark.queries import PTS, run_spark
    from loc2vec_spark.queries_geo import _IDW_RADIUS
    sf = "/root/testdata/sf0.001"
    got = run_spark(spark, sf, "idw_interpolate").toPandas() \
        .sort_values("query_id").reset_index(drop=True)
    pts = spark.sql(f"WITH {PTS} SELECT vec_id, lat, lon FROM pts") \
               .toPandas()
    q = pts[pts.vec_id % 20 == 0].reset_index(drop=True)
    s = pts[pts.vec_id % 20 != 0].reset_index(drop=True)

    def wrap(x):
        return np.fmod(np.fmod(x + 180.0, 360.0) + 360.0, 360.0) - 180.0

    dlat = q.lat.to_numpy()[:, None] - s.lat.to_numpy()[None]
    dlon = wrap(q.lon.to_numpy()[:, None] - s.lon.to_numpy()[None])
    d2 = dlat * dlat + dlon * dlon
    exp_rows = []
    for qi in range(len(q)):
        cand = [(d2[qi, si], int(s.vec_id[si]))
                for si in range(len(s))
                if d2[qi, si] <= _IDW_RADIUS * _IDW_RADIUS]
        if len(cand) < 3:
            continue
        top = sorted(cand)[:3]
        ws = [1.0 / (1.0 + d) for d, _ in top]
        vs = [float(sid % 997) for _, sid in top]
        exp_rows.append((int(q.vec_id[qi]), top[0][1],
                         (vs[0] * ws[0] + vs[1] * ws[1] + vs[2] * ws[2])
                         / (ws[0] + ws[1] + ws[2]),
                         min(vs), max(vs)))
    exp_rows.sort()
    assert len(got) == len(exp_rows) > 0
    assert (got.query_id.to_numpy()
            == [r[0] for r in exp_rows]).all()
    assert (got.nn_id.to_numpy() == [r[1] for r in exp_rows]).all()
    assert np.allclose(got.idw_value.to_numpy(),
                       [r[2] for r in exp_rows], rtol=1e-12)
    lo = np.array([r[3] for r in exp_rows])
    hi = np.array([r[4] for r in exp_rows])
    v = got.idw_value.to_numpy()
    assert ((v >= lo - 1e-9) & (v <= hi + 1e-9)).all()
