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

Multi-ring features (round 3): a layer_id spanning several polygon rows
is a multipolygon with shapefile even-odd semantics — outer parts,
holes, and islands combine by containment-count parity
(:func:`_layer_parity`). The cell-cover capacity path below keeps the
simpler one-ring-per-layer contract and asserts it loudly (split
multipolygon PARTS into per-ring layer ids upstream; features with
holes need this broadcast path).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..cells import MAX_RES, ij_to_cell


def pack_polygons(polys: pd.DataFrame) -> dict:
    """osm_layers rows -> flat numpy arrays (the broadcast payload).

    Rings are padded to max vertex count by repeating the last vertex
    (zero-length edges never flip the ray-cast crossing parity).
    STR-style packing: polygons sorted by bbox center x then y, so bbox
    ranges of contiguous chunks stay tight for future tree levels.
    """
    polys = polys.sort_values(["minx", "miny", "layer_id"]).reset_index(drop=True)
    # channel must be uniform per layer_id: with multi-ring layers
    # (even-odd, pip_join) the emitted channel is a LAYER attribute, and
    # silently picking one ring's value would mis-label features whose
    # hole rows carry placeholders (r3 review). Enforced here so every
    # consumer of the pack shares the guarantee.
    nch = polys.groupby("layer_id")["channel"].nunique(dropna=False)
    bad = nch[nch > 1]
    if len(bad):
        raise ValueError(
            f"pack_polygons: layer_id(s) {bad.index.tolist()[:5]} carry "
            f"more than one channel value across their rings; channel "
            f"is a per-layer attribute — set every ring row of a layer "
            f"to the feature's channel")
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


def _layer_parity(pack: dict, pi: np.ndarray,
                  pj: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-ring containment pairs -> per-LAYER even-odd pairs.

    A layer_id may span several rows of the polygon table (multipolygon
    parts and holes, shapefile even-odd convention): a point is inside
    the layer iff it is inside an ODD number of the layer's rings —
    outer ring only = in, outer + hole = out, outer + hole + island =
    in. Single-ring layers reduce to the identity (each (point, ring)
    pair appears once)."""
    lay = pack["layer_id"][pj]
    pairs = np.stack([pi.astype(np.int64), lay], axis=1)
    uniq, counts = np.unique(pairs, axis=0, return_counts=True)
    keep = (counts % 2).astype(bool)
    return uniq[keep, 0], uniq[keep, 1]


def pip_join(spark: SparkSession, pts: DataFrame, polys: pd.DataFrame, *,
             id_col: str, lat_col: str = "lat",
             lon_col: str = "lon") -> DataFrame:
    """Broadcast PIP join: (id, layer_id, channel) for every containment.

    ``polys`` is the driver-side polygon table (osm_layers schema,
    FIXTURES.md §3). Inner-join semantics: points in no polygon emit
    nothing; points in k layers emit k rows. A layer_id appearing on
    several rows is a MULTI-RING feature (multipolygon parts / holes)
    combined with shapefile even-odd semantics — see
    :func:`_layer_parity` (round 3; the cell-cover capacity path keeps
    its one-ring-per-layer contract and asserts it loudly).
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
        # channel is uniform per layer (pack_polygons enforces it), so
        # a sorted layer->channel lookup derived from the one broadcast
        # pack suffices — no second broadcast (r3 review)
        order = np.argsort(p["layer_id"], kind="stable")
        lay_sorted = p["layer_id"][order]
        chan_sorted = p["channel"][order]
        for pdf in batches:
            lon = pdf[lon_col].to_numpy(np.float64)
            lat = pdf[lat_col].to_numpy(np.float64)
            pi, pj = point_in_polygons(p, lon, lat)
            pi2, lay2 = _layer_parity(p, pi, pj)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy()[pi2],
                "layer_id": lay2,
                "channel": chan_sorted[np.searchsorted(lay_sorted, lay2)],
            })

    cols = pts.select(id_col, lat_col, lon_col)
    return cols.mapInPandas(gen, schema=out_schema)


# ---------------------------------------------------------------------------
# Cell-cover (polyfill-style) PIP join — the no-broadcast scale path.
#
# pip_join above broadcasts the WHOLE polygon side; that caps it at
# driver/executor memory (~10^6 small features). When the polygon side
# is itself web-scale (a full OSM landuse extract), the standard
# distributed-spatial-join strategy (Sedona/BigQuery style) is grid
# blocking: cover each polygon with grid cells (H3 polyfill analog),
# assign each point its cell, equi-join on the cell id, and run the
# exact test only on candidate pairs. Both sides shuffle on a key with
# bounded fanout; nothing is broadcast, nothing is O(points x polys).
#
# Cells fully interior to a polygon are tagged full=true and skip the
# exact test entirely (accept immediately) — in dense layers most
# matches resolve with zero geometry work. The full test is
# conservative: all 4 cell corners inside AND no polygon edge's
# (eps-padded) bbox touches the cell — an edge that could cross the
# cell demotes it to boundary, so a full tag is always sound.
#
# Measured tradeoff (400k points x 110 polygons, local[8], identical
# 208,991-row output): broadcast ray-cast 1.24s vs cell-cover 3.53s —
# at small polygon counts the broadcast path wins ~3x and remains the
# default; the cover join is the CAPACITY path for polygon sides that
# exceed broadcast/executor memory, where the broadcast operator simply
# cannot run.
#
# Coordinate contract (same planar semantics as pip_join's ray cast):
# rings are expressed in [-180, 180] x [-90, 90] and must NOT cross the
# antimeridian (split such features upstream, as OSM extracts do). A
# ring that merely TOUCHES +/-180 on both sides is handled: the cover
# dedupes the wrapped i=0 column (review r2 — without the dedup a
# circumpolar ring emitted cell 0 twice and the join produced duplicate
# (point, polygon) rows).
# ---------------------------------------------------------------------------

_COVER_SCHEMA = T.StructType([
    T.StructField("layer_id", T.LongType()),
    T.StructField("channel", T.StringType()),
    T.StructField("cell", T.LongType()),
    T.StructField("full", T.BooleanType()),
])


def cover_cells_one(ring_xy: np.ndarray, res: int, *,
                    max_cells: int = 4096,
                    eps: float = 1e-9) -> tuple[np.ndarray, np.ndarray]:
    """One polygon ring -> (cells int64, full bool) covering its bbox.

    Candidate set = every cell whose bbox intersects the polygon bbox —
    a superset of the cells containing any interior point, so the cover
    join never loses a match. Cell ids are deduplicated (a ring touching
    both +/-180 maps columns i=0 and i=n onto the same cell; full only
    if every duplicate classified full). Raises (no silent truncation)
    when the polygon spans more than ``max_cells`` cells at ``res``; the
    caller should coarsen the cover resolution.
    """
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    n = 1 << res
    x, y = ring_xy[:, 0], ring_xy[:, 1]
    minx, maxx, miny, maxy = x.min(), x.max(), y.min(), y.max()
    # i range in the unwrapped frame (mod n only when emitting ids);
    # j clamps like latlon_to_ij. Rings never cross the antimeridian
    # (module contract above), so [minx, maxx] is the true lon extent.
    i0 = int(np.floor((minx + 180.0) / 360.0 * n))
    i1 = int(np.floor((maxx + 180.0) / 360.0 * n))
    j0 = int(np.clip(np.floor((miny + 90.0) / 180.0 * n), 0, n - 1))
    j1 = int(np.clip(np.floor((maxy + 90.0) / 180.0 * n), 0, n - 1))
    ni_, nj_ = i1 - i0 + 1, j1 - j0 + 1
    if ni_ * nj_ > max_cells:
        raise ValueError(
            f"polygon covers {ni_ * nj_} cells at res {res} "
            f"(> max_cells={max_cells}); use a coarser cover res")
    ii, jj = np.meshgrid(np.arange(i0, i1 + 1), np.arange(j0, j1 + 1),
                         indexing="ij")
    ii, jj = ii.ravel(), jj.ravel()
    cx0 = ii * 360.0 / n - 180.0
    cx1 = (ii + 1) * 360.0 / n - 180.0
    cy0 = jj * 180.0 / n - 90.0
    cy1 = (jj + 1) * 180.0 / n - 90.0

    # corner-inside: even-odd ray cast of the 4 cell corners (c, 4)
    px = np.stack([cx0, cx1, cx0, cx1], axis=1)[:, :, None]   # (c,4,1)
    py = np.stack([cy0, cy0, cy1, cy1], axis=1)[:, :, None]
    x1, y1 = x[None, None, :], y[None, None, :]
    x2 = np.roll(x, -1)[None, None, :]
    y2 = np.roll(y, -1)[None, None, :]
    crosses = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
    corners_in = ((crosses & (px < xint)).sum(axis=2) % 2
                  ).astype(bool).all(axis=1)                  # (c,)

    # edge-bbox overlap (eps-padded): any edge that could touch the cell
    exmin = np.minimum(x, np.roll(x, -1)) - eps
    exmax = np.maximum(x, np.roll(x, -1)) + eps
    eymin = np.minimum(y, np.roll(y, -1)) - eps
    eymax = np.maximum(y, np.roll(y, -1)) + eps
    touch = ~((exmax[None, :] < cx0[:, None])
              | (exmin[None, :] > cx1[:, None])
              | (eymax[None, :] < cy0[:, None])
              | (eymin[None, :] > cy1[:, None]))
    full = corners_in & ~touch.any(axis=1)

    cells = ij_to_cell(ii % n, jj, res)
    # dedupe wrapped columns (i=0 vs i=n map to the same cell when the
    # ring touches both +/-180): full only if ALL duplicates are full
    uniq, inv = np.unique(cells, return_inverse=True)
    fullu = np.ones(len(uniq), dtype=bool)
    np.logical_and.at(fullu, inv, full)
    return uniq, fullu


def polygon_cover(polys_sdf: DataFrame, res: int, *,
                  max_cells_per_poly: int = 4096) -> DataFrame:
    """Distributed polyfill: osm_layers-shaped DataFrame -> cover rows.

    Input schema: (layer_id, channel, xs array<double>, ys array<double>)
    — one closed ring per polygon (see :func:`polys_to_sdf`). Output =
    ``_COVER_SCHEMA`` — deliberately ring-free (review r2): carrying the
    ring per cover row would duplicate it onto every candidate point in
    the downstream join; the refine stage gets geometry once per polygon
    via cogroup instead.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in _COVER_SCHEMA}
            for row in pdf.itertuples():
                ring = np.stack([np.asarray(row.xs, dtype=np.float64),
                                 np.asarray(row.ys, dtype=np.float64)],
                                axis=1)
                cells, full = cover_cells_one(
                    ring, res, max_cells=max_cells_per_poly)
                out["layer_id"].extend([row.layer_id] * len(cells))
                out["channel"].extend([row.channel] * len(cells))
                out["cell"].extend(cells.tolist())
                out["full"].extend(full.tolist())
            yield pd.DataFrame(out)

    return polys_sdf.select("layer_id", "channel", "xs", "ys") \
        .mapInPandas(gen, schema=_COVER_SCHEMA)


def polys_to_sdf(spark: SparkSession, polys: pd.DataFrame) -> DataFrame:
    """osm_layers pandas shape (ring = list of (x, y)) -> the Spark shape
    polygon_cover consumes. At real scale the polygon table is already a
    distributed dataset with array columns; this adapter serves the
    fixture path."""
    pdf = pd.DataFrame({
        "layer_id": polys.layer_id.astype("int64"),
        "channel": polys.channel,
        "xs": [[float(p[0]) for p in ring] for ring in polys.ring],
        "ys": [[float(p[1]) for p in ring] for ring in polys.ring],
    })
    schema = T.StructType([
        T.StructField("layer_id", T.LongType()),
        T.StructField("channel", T.StringType()),
        T.StructField("xs", T.ArrayType(T.DoubleType())),
        T.StructField("ys", T.ArrayType(T.DoubleType())),
    ])
    return spark.createDataFrame(pdf, schema=schema)


def cellcover_pip_join(spark: SparkSession, pts: DataFrame,
                       polys_sdf: DataFrame, *, res: int, id_col: str,
                       lat_col: str = "lat", lon_col: str = "lon",
                       max_cells_per_poly: int = 4096) -> DataFrame:
    """Grid-blocked PIP join: equi-join on cover cells, exact test on
    boundary candidates only. Same output contract as :func:`pip_join`
    (inner-join semantics, identical even-odd + bbox accept rule), no
    broadcast of the polygon side.

    A point lies in exactly one cell and a polygon's cover dedupes its
    cells, so each (point, polygon) pair meets at most once — no dedup
    stage needed.

    Plan shape (review r2): the candidate join carries only slim rows
    (id, coords, layer, full) — no ring payload. Full-cell hits resolve
    JVM-side with a plain filter+project (no Arrow crossing at all);
    boundary candidates shuffle by layer_id and cogroup with the
    polygon side, so each ring crosses into Python once per polygon
    group instead of once per candidate row. ``cand`` is persisted
    because both branches read it (an uncached union would recompute
    the cover join per branch); at one action over the returned union
    each candidate partition materializes once. Skew note: a hot
    polygon's boundary candidates form one cogroup — bounded by
    perimeter cells only (interior matches took the full-cell path),
    which is what keeps the worst case linear in boundary length.
    """
    from ..cells import cell_col

    # one-ring-per-layer contract, validated UP FRONT (r3 review: the
    # refine()-side assert only fires when a multi-ring layer has
    # boundary candidates — a point deep inside a hole sees only FULL
    # cells of both rings and the full-cell path would silently emit
    # wrong rows). One tiny distributed agg over the polygon side.
    dup = polys_sdf.groupBy("layer_id") \
        .agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1) \
        .limit(1).collect()
    if dup:
        raise ValueError(
            f"cellcover_pip_join: layer_id {dup[0]['layer_id']} carries "
            f"{dup[0]['n']} rings; one ring per layer_id is the "
            f"documented contract for the cell-cover path (split "
            f"multipolygon parts into per-ring layer ids upstream; "
            f"features with holes need the broadcast pip_join, which "
            f"implements even-odd multi-ring semantics)")

    cover = polygon_cover(polys_sdf, res,
                          max_cells_per_poly=max_cells_per_poly)
    pts_c = pts.select(id_col, lat_col, lon_col) \
        .withColumn("__cell", cell_col(lat_col, lon_col, res))
    cand = pts_c.join(cover, pts_c["__cell"] == cover["cell"]) \
        .select(id_col, lat_col, lon_col, "layer_id", "channel", "full") \
        .persist()

    full_hits = cand.filter(F.col("full")) \
        .select(id_col, "layer_id", "channel")

    in_schema_id_type = dict(
        (f.name, f.dataType) for f in pts.schema.fields)[id_col]
    out_schema = T.StructType([
        T.StructField(id_col, in_schema_id_type),
        T.StructField("layer_id", T.LongType()),
        T.StructField("channel", T.StringType()),
    ])

    def refine(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            id_col: pd.Series([], dtype="object"),
            "layer_id": pd.Series([], dtype="int64"),
            "channel": pd.Series([], dtype="object")})
        # one-ring-per-layer contract, re-checked BEFORE the empty-left
        # early return (defense in depth behind the driver-side
        # validation above; r2 advice + r3 review ordering fix): a
        # silent iloc[0] would drop every extra ring of a
        # multipolygon/hole feature
        if len(right) > 1:
            raise ValueError(
                f"cellcover_pip_join: layer_id {right['layer_id'].iloc[0]} "
                f"carries {len(right)} rings; one ring per layer_id is "
                f"the documented contract (split multipolygons into "
                f"per-ring layer ids upstream)")
        if len(left) == 0 or len(right) == 0:
            return empty
        g0 = right.iloc[0]
        # bracket access: pandas Series.xs is a METHOD, so attribute
        # access on the 'xs' column returns it instead
        xs = np.asarray(g0["xs"], dtype=np.float64)
        ys = np.asarray(g0["ys"], dtype=np.float64)
        pack = {"layer_id": np.array([g0["layer_id"]], dtype=np.int64),
                "channel": np.array([g0["channel"]]),
                "minx": np.array([xs.min()]), "miny": np.array([ys.min()]),
                "maxx": np.array([xs.max()]), "maxy": np.array([ys.max()]),
                "xs": xs[None, :], "ys": ys[None, :]}
        lon = left[lon_col].to_numpy(np.float64)
        lat = left[lat_col].to_numpy(np.float64)
        pi, _ = point_in_polygons(pack, lon, lat)
        return pd.DataFrame({
            id_col: left[id_col].to_numpy()[pi],
            "layer_id": np.full(len(pi), g0["layer_id"], dtype=np.int64),
            "channel": np.full(len(pi), g0["channel"], dtype=object)})

    boundary = cand.filter(~F.col("full")) \
        .select(id_col, lat_col, lon_col, "layer_id")
    refined = boundary.groupBy("layer_id").cogroup(
        polys_sdf.select("layer_id", "channel", "xs", "ys")
                 .groupBy("layer_id")) \
        .applyInPandas(refine, schema=out_schema)
    return full_hits.unionByName(refined)
