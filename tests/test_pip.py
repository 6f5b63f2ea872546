"""PIP broadcast join (J6) vs a brute-force pure-python oracle."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from loc2vec_spark import fixtures
from loc2vec_spark.operators import geo, pip


def _inside(ring, px, py):
    """Textbook even-odd ray cast, scalar (the oracle)."""
    n = len(ring)
    inside = False
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            if px < xint:
                inside = not inside
    return inside


@pytest.fixture(scope="module")
def polys():
    return fixtures.osm_layers_pdf(per_disk=30, n_global=20)


def test_pack_roundtrip(polys):
    pack = pip.pack_polygons(polys)
    assert len(pack["layer_id"]) == len(polys)
    assert pack["xs"].shape == pack["ys"].shape
    assert np.isfinite(pack["xs"]).all()


def test_vectorized_matches_scalar_oracle(polys):
    rng = np.random.Generator(np.random.PCG64(21))
    # mix of global points and points near polygon centers (so hits exist)
    lat = np.concatenate([rng.uniform(-60, 60, 200),
                          polys.miny.to_numpy()[:50] + 0.01])
    lon = np.concatenate([rng.uniform(-180, 180, 200),
                          polys.minx.to_numpy()[:50] + 0.01])
    pack = pip.pack_polygons(polys)
    pi, pj = pip.point_in_polygons(pack, lon, lat)
    got = {(int(a), int(pack["layer_id"][b])) for a, b in zip(pi, pj)}
    rings = {int(r.layer_id): [tuple(p) for p in r.ring]
             for r in polys.itertuples()}
    expect = set()
    for a in range(len(lon)):
        for lid, ring in rings.items():
            if _inside(ring, lon[a], lat[a]):
                expect.add((a, lid))
    assert got == expect
    assert len(expect) > 0  # the test actually exercised hits


def test_pip_join_spark(spark, polys):
    # points at polygon bbox centers guarantee containment for convex-ish
    pdf = pd.DataFrame({
        "pid": np.arange(len(polys), dtype=np.int64),
        "lat": (polys.miny + polys.maxy).to_numpy() / 2.0,
        "lon": (polys.minx + polys.maxx).to_numpy() / 2.0,
    })
    pts = spark.createDataFrame(pdf)
    out = pip.pip_join(spark, pts, polys, id_col="pid").toPandas()
    assert set(out.columns) == {"pid", "layer_id", "channel"}
    # oracle comparison
    rings = {int(r.layer_id): [tuple(p) for p in r.ring]
             for r in polys.itertuples()}
    expect = {(int(row.pid), lid)
              for _, row in pdf.iterrows()
              for lid, ring in rings.items()
              if _inside(ring, row.lon, row.lat)}
    got = {(int(r.pid), int(r.layer_id)) for _, r in out.iterrows()}
    assert got == expect
    assert len(got) >= len(polys) * 0.5  # most centers are inside


def _star_polygon(rng, cx, cy, nv=8, rmin=0.3, rmax=1.5):
    """Random star-shaped (simple, generally non-convex) ring."""
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    rad = rng.uniform(rmin, rmax, nv)
    return np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)],
                    axis=1)


def test_cover_cells_superset_and_full_soundness():
    """Cover contains every inside point's cell; full cells are truly
    fully inside (sampled)."""
    rng = np.random.Generator(np.random.PCG64(7))
    res, n = 9, 1 << 9
    for t in range(20):
        ring = _star_polygon(rng, rng.uniform(-100, 100),
                             rng.uniform(-50, 50))
        cells, full = pip.cover_cells_one(ring, res)
        cover = set(cells.tolist())
        full_set = set(cells[full].tolist())
        # random points in the polygon bbox
        px = rng.uniform(ring[:, 0].min(), ring[:, 0].max(), 300)
        py = rng.uniform(ring[:, 1].min(), ring[:, 1].max(), 300)
        ring_l = [tuple(p) for p in ring]
        from loc2vec_spark import cells as C
        pc = C.latlon_to_cell(py, px, res)
        for k in range(len(px)):
            inside = _inside(ring_l, px[k], py[k])
            if inside:
                assert int(pc[k]) in cover
            if int(pc[k]) in full_set:
                assert inside  # full cell => every point inside
    assert len(full_set) >= 0  # smoke: loop ran


def test_cellcover_join_equals_broadcast_join(spark):
    """The no-broadcast scale path returns the exact same relation as
    the broadcast ray-cast join, on non-convex polygons."""
    rng = np.random.Generator(np.random.PCG64(11))
    rows = []
    for lid in range(25):
        ring = _star_polygon(rng, rng.uniform(-90, 90),
                             rng.uniform(-45, 45))
        rows.append({"layer_id": lid, "channel": f"ch{lid % 3}",
                     "ring": [tuple(p) for p in ring],
                     "minx": ring[:, 0].min(), "miny": ring[:, 1].min(),
                     "maxx": ring[:, 0].max(), "maxy": ring[:, 1].max()})
    polys = pd.DataFrame(rows)
    # points: global scatter + concentrations near polygon centers
    lat = np.concatenate([rng.uniform(-60, 60, 500),
                          np.repeat((polys.miny + polys.maxy) / 2.0, 8)
                          + rng.normal(0, 0.7, 200)])
    lon = np.concatenate([rng.uniform(-180, 180, 500),
                          np.repeat((polys.minx + polys.maxx) / 2.0, 8)
                          + rng.normal(0, 0.7, 200)])
    pts = spark.createDataFrame(pd.DataFrame({
        "pid": np.arange(len(lat), dtype=np.int64),
        "lat": lat, "lon": lon}))
    bcast = pip.pip_join(spark, pts, polys, id_col="pid")
    cover = pip.cellcover_pip_join(
        spark, pts, pip.polys_to_sdf(spark, polys), res=8, id_col="pid")
    got_b = {(int(r.pid), int(r.layer_id), r.channel)
             for r in bcast.collect()}
    got_c = {(int(r.pid), int(r.layer_id), r.channel)
             for r in cover.collect()}
    assert got_c == got_b
    assert len(got_b) > 50  # non-vacuous: real hits on both paths


def test_cover_cells_unique_for_antimeridian_touching_ring():
    """A circumpolar ring touching both +/-180 must not emit the wrapped
    i=0 column twice (duplicate cover rows would duplicate join output).
    """
    ring = np.array([[-180.0, -80.0], [180.0, -80.0],
                     [180.0, -70.0], [-180.0, -70.0]])
    cells_, full = pip.cover_cells_one(ring, 4)
    assert len(cells_) == len(set(cells_.tolist()))
    assert len(full) == len(cells_)


def test_cover_max_cells_guard():
    ring = np.array([[-170.0, -80.0], [170.0, -80.0],
                     [170.0, 80.0], [-170.0, 80.0]])
    with pytest.raises(ValueError, match="coarser cover res"):
        pip.cover_cells_one(ring, 12, max_cells=1000)


def test_pip_join_on_fixture_images(spark, fixture_dir, polys):
    images = spark.read.parquet(f"{fixture_dir}/images.parquet")
    pts = geo.with_latlon(images).select("image_id", "lat", "lon")
    out = pip.pip_join(spark, pts, polys, id_col="image_id")
    n = out.count()
    assert n > 0  # urban-disk polygons catch urban-disk images
    # every match respects the bbox (sanity against the prefilter)
    joined = out.join(pts, "image_id")
    bb = spark.createDataFrame(
        polys[["layer_id", "minx", "miny", "maxx", "maxy"]])
    viol = (joined.join(bb, "layer_id")
            .filter(~((F.col("lon") >= F.col("minx"))
                      & (F.col("lon") <= F.col("maxx"))
                      & (F.col("lat") >= F.col("miny"))
                      & (F.col("lat") <= F.col("maxy")))))
    assert viol.count() == 0


def _rect(cx, cy, hw, hh):
    return [(cx - hw, cy - hh), (cx + hw, cy - hh),
            (cx + hw, cy + hh), (cx - hw, cy + hh)]


def test_pip_join_multiring_even_odd(spark):
    """Round 3: pip_join supports multi-ring layers (shapefile even-odd
    convention) — a layer_id spanning several rows combines outer rings,
    holes, and islands by containment-count parity. The scalar oracle is
    the per-ring ray cast XORed across the layer's rings."""
    def row(lid, chan, ring):
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        return {"layer_id": lid, "channel": chan, "ring": ring,
                "minx": min(xs), "miny": min(ys),
                "maxx": max(xs), "maxy": max(ys)}

    polys = pd.DataFrame([
        # layer 1: square with a hole, and an island inside the hole
        row(1, "water", _rect(10.0, 10.0, 4.0, 4.0)),       # outer
        row(1, "water", _rect(10.0, 10.0, 2.0, 2.0)),       # hole
        row(1, "water", _rect(10.0, 10.0, 0.5, 0.5)),       # island
        # layer 2: two disjoint parts (multipolygon)
        row(2, "park", _rect(-20.0, 0.0, 1.0, 1.0)),
        row(2, "park", _rect(-24.0, 0.0, 1.0, 1.0)),
        # layer 3: plain single ring (regression: identity semantics)
        row(3, "retail", _rect(30.0, -10.0, 2.0, 2.0)),
    ])

    pts = [
        ("ring_band", 10.0, 13.0),      # layer1: outer only -> IN
        ("in_hole", 10.0, 11.0),        # outer+hole -> OUT
        ("on_island", 10.0, 10.1),      # outer+hole+island -> IN
        ("outside", 10.0, 20.0),        # nothing
        ("part_a", -20.0, 0.5),         # layer2 part A -> IN
        ("part_b", -24.0, -0.5),        # layer2 part B -> IN
        ("between", -22.0, 0.0),        # between parts -> OUT
        ("plain", 30.0, -10.0),         # layer3 -> IN
    ]
    df = spark.createDataFrame(
        [(n, la, lo) for n, lo, la in pts],
        "pid STRING, lat DOUBLE, lon DOUBLE")
    got = {(r["pid"], r["layer_id"], r["channel"])
           for r in pip.pip_join(spark, df, polys, id_col="pid").collect()}
    assert got == {("ring_band", 1, "water"), ("on_island", 1, "water"),
                   ("part_a", 2, "park"), ("part_b", 2, "park"),
                   ("plain", 3, "retail")}

    # cross-check against the scalar oracle XORed across rings
    expect = set()
    for n, lo, la in pts:
        for lid in polys.layer_id.unique():
            sub = polys[polys.layer_id == lid]
            parity = sum(_inside([tuple(p) for p in r.ring], lo, la)
                         for r in sub.itertuples()) % 2
            if parity:
                expect.add((n, int(lid), sub.channel.iloc[0]))
    assert got == expect


def test_cellcover_rejects_multiring_up_front(spark):
    """r3 review: a point deep inside a hole sees only FULL cover cells
    of both rings, so the refine-side assert never fires — the contract
    must be validated before the cover join. pack_polygons likewise
    rejects rings of one layer disagreeing on channel."""
    polys = pd.DataFrame([
        {"layer_id": 1, "channel": "water",
         "ring": _rect(10.0, 10.0, 4.0, 4.0),
         "minx": 6.0, "miny": 6.0, "maxx": 14.0, "maxy": 14.0},
        {"layer_id": 1, "channel": "water",
         "ring": _rect(10.0, 10.0, 2.0, 2.0),
         "minx": 8.0, "miny": 8.0, "maxx": 12.0, "maxy": 12.0},
    ])
    pts = spark.createDataFrame([("p0", 10.0, 10.0)],
                                "pid STRING, lat DOUBLE, lon DOUBLE")
    with pytest.raises(Exception) as ei:
        pip.cellcover_pip_join(spark, pts, pip.polys_to_sdf(spark, polys),
                               res=9, id_col="pid").collect()
    assert "one ring per layer_id" in str(ei.value)

    bad_chan = polys.copy()
    bad_chan.loc[1, "channel"] = None
    with pytest.raises(ValueError, match="more than one channel"):
        pip.pack_polygons(bad_chan)
