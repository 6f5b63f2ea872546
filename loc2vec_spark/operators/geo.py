"""Location derivation + tile (cell) assignment operators.

The reference's location identity lives only in PNG filenames
(``/root/reference/src/loc2vec/loc2vec_run.py:26-27``); per
BASELINE.json:north_star the engine derives (lat, lon) from image metadata
(caption parse + phash jitter, FIXTURES.md §1) and assigns every row to
multi-resolution cells. The whole path is Catalyst expressions — regexp
extraction, integer bit math, floor arithmetic — so tile assignment runs
inside whole-stage codegen with zero Python crossings. A pandas-UDF variant
(:func:`with_cells_pandas`) exists for API parity with the BASELINE.json
"vectorized pandas/Arrow UDF" phrasing and is tested to agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import cells

# ---------------------------------------------------------------------------
# (lat, lon) from image metadata — caption parse + phash jitter
# ---------------------------------------------------------------------------

JITTER_DEG = 1e-4  # FIXTURES.md: low phash bits seed +/-1e-4 deg jitter

# phash is signed int64; & works on negatives in both Spark and numpy
# (two's complement), masks select low 20 / next 20 bits.
_MASK20 = (1 << 20) - 1


def _jitter_expr(shift: int) -> str:
    """SQL text: phash bits [shift, shift+20) -> uniform(-1e-4, 1e-4)."""
    return (f"((CAST(SHIFTRIGHT(phash, {shift}) & {_MASK20} AS DOUBLE) "
            f"/ {_MASK20} - 0.5) * {2 * JITTER_DEG})")


def with_latlon(images: DataFrame,
                caption_col: str = "caption") -> DataFrame:
    """Parse lat/lon out of the caption and apply deterministic phash jitter.

    Pure built-ins: regexp_extract + cast + bit math (no UDF).
    """
    # try_cast + nullif: a malformed/missing caption yields NULL lat/lon
    # (quarantine row) instead of failing the job under ANSI mode — at
    # 10^12 rows a single bad caption must never abort the pipeline
    # (corrupt-row dead-letter semantics, SURVEY.md §2.8).
    lat_s = (f"TRY_CAST(NULLIF(REGEXP_EXTRACT({caption_col}, "
             r"'lat=(-?\\d+\\.\\d+)', 1), '') AS DOUBLE)")
    lon_s = (f"TRY_CAST(NULLIF(REGEXP_EXTRACT({caption_col}, "
             r"'lon=(-?\\d+\\.\\d+)', 1), '') AS DOUBLE)")
    return (images
            .withColumn("lat", F.expr(lat_s) + F.expr(_jitter_expr(0)))
            .withColumn("lon", F.expr(lon_s) + F.expr(_jitter_expr(20))))


# ---------------------------------------------------------------------------
# cell assignment
# ---------------------------------------------------------------------------

def with_cells(df: DataFrame, resolutions: tuple[int, ...] = (5, 7, 9),
               lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Add ``cell_r{R}`` columns (Catalyst expressions, codegen hot path)."""
    for r in resolutions:
        df = df.withColumn(f"cell_r{r}", cells.cell_col(lat_col, lon_col, r))
    return df


def with_cells_pandas(df: DataFrame,
                      resolutions: tuple[int, ...] = (5, 7, 9),
                      lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Same as :func:`with_cells` via an Arrow-vectorized pandas UDF.

    Kept for parity with BASELINE.json:input_hint phrasing and as the
    template for cell math too complex for SQL (e.g. a real H3 backend).
    Tested to agree exactly with the expression path.
    """
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    def make(res: int):
        @pandas_udf(T.LongType())
        def _cell(lat: pd.Series, lon: pd.Series) -> pd.Series:
            la = lat.to_numpy(np.float64)
            lo = lon.to_numpy(np.float64)
            out = pd.Series(cells.latlon_to_cell(la, lo, res), dtype="Int64")
            out[np.isnan(la) | np.isnan(lo)] = pd.NA  # quarantine -> NULL
            return out
        return _cell

    for r in resolutions:
        df = df.withColumn(f"cell_r{r}",
                           make(r)(F.col(lat_col), F.col(lon_col)))
    return df


# ---------------------------------------------------------------------------
# k-ring expansion — explode a cell into its neighborhood (built-ins only)
# ---------------------------------------------------------------------------

def kring_explode(df: DataFrame, cell_colname: str, res: int,
                  k: int = 1, out_col: str = "nb_cell") -> DataFrame:
    """One output row per (row, neighbor-cell-in-ring-k).

    Longitude wraps; past-pole neighbors are dropped — matches
    :func:`loc2vec_spark.cells.kring` exactly. Implemented as an explode
    over a literal offset stencil + integer math: stays JVM-side.
    """
    n = 1 << res
    offs = F.array(*[
        F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
        for di, dj in cells.kring_offsets(k)
    ])
    i_expr = cells.cell_i_sql(cell_colname)
    j_expr = cells.cell_j_sql(cell_colname)
    df = (df
          .withColumn("_off", F.explode(offs))
          .withColumn("_nj", F.expr(j_expr) + F.col("_off.dj"))
          .filter((F.col("_nj") >= 0) & (F.col("_nj") < n))
          .withColumn(out_col, F.expr(
              cells.neighbor_sql(i_expr, j_expr, "_off.di", "_off.dj", res)))
          .drop("_off", "_nj"))
    return df


# ---------------------------------------------------------------------------
# derived lat/lon for the driver's star-schema tables (oracle suite only)
# ---------------------------------------------------------------------------

def derived_latlon_sql(id_expr: str) -> tuple[str, str]:
    """Deterministic skewed (lat, lon) from an integer key — portable SQL.

    The driver's testdata tables carry no coordinates, so the oracle suite
    derives them: 80% of rows land in 3 urban disks (mirrors FIXTURES.md's
    skew profile; production tables carry real lat/lon from metadata and
    skip this). Identical text evaluates in Spark SQL and DuckDB; integer
    mixing keeps it exact (bit-identical doubles on both engines).

    NOTE: multiplier bounds — safe for ids up to ~3.4e9 (no int64 overflow).
    """
    # NOTE: every float literal uses E-notation — a bare `139.6503` parses
    # as DECIMAL in both Spark and DuckDB and their decimal arithmetic
    # rounds differently; `139.6503E0` is a double literal in both.
    h1 = f"((({id_expr}) * 2654435761) % 1000000)"
    h2 = f"((({id_expr}) * 40503 + 12345) % 1000000)"
    c = f"(({id_expr}) % 3)"
    urban_lat = (f"(CASE {c} WHEN 0 THEN 51.5074E0 WHEN 1 THEN 40.7128E0 "
                 f"ELSE 35.6762E0 END + ({h1} / 1000000.0E0 - 0.5E0) * 0.1E0)")
    urban_lon = (f"(CASE {c} WHEN 0 THEN -0.1278E0 WHEN 1 THEN -74.006E0 "
                 f"ELSE 139.6503E0 END + ({h2} / 1000000.0E0 - 0.5E0) * 0.1E0)")
    lat = (f"(CASE WHEN (({id_expr}) % 5) < 4 THEN {urban_lat} "
           f"ELSE ({h1} / 1000000.0E0) * 120.0E0 - 60.0E0 END)")
    lon = (f"(CASE WHEN (({id_expr}) % 5) < 4 THEN {urban_lon} "
           f"ELSE ({h2} / 1000000.0E0) * 360.0E0 - 180.0E0 END)")
    return lat, lon


# ---------------------------------------------------------------------------
# multi-resolution cell-set compaction (H3 compact_cells analog)
# ---------------------------------------------------------------------------

def compact_cells_df(df: DataFrame, cell_col: str = "cell",
                     min_res: int = 0, *,
                     persist: bool = True) -> DataFrame:
    """Distributed H3-``compact_cells`` analog: collapse every complete
    4-sibling group of occupied cells into its parent, recursing on the
    produced parents down to ``min_res``.

    Input: any DataFrame with a same-resolution cell column (duplicates
    fine — the operator works on the DISTINCT occupied-cell surface).
    Output: ``(cell BIGINT, res INT, n_leaves BIGINT)`` — a disjoint
    mixed-resolution cover of exactly the input cell set, ``n_leaves``
    the number of input-resolution cells each output cell covers.

    Scale shape: the loop runs on the aggregated DISTINCT surface
    (#occupied-cells rows, orders below the input at 100 TB); each level
    is ONE groupBy on the shrinking parent key + one left_anti equi-join.
    Every level is counted and the loop stops at the first level with
    no complete sibling group, exactly like the numpy face, under BOTH
    lifecycles. With ``persist=True`` (default) the count also
    materializes each level's cached full-parent set before its two
    reads (anti-join + next level);
    the per-level caches are MEMORY_AND_DISK on the shrinking parent
    surface and release with the session. No driver-side cell data
    beyond the input-resolution scalar and one count per level.

    Mirrors :func:`loc2vec_spark.cells.compact_cells` (the numpy face —
    parity property-tested in test_geo) and the shared-SQL oracle face
    ``cells_compact`` in queries_geo.py."""
    from .. import cells as C

    cur = df.select(F.col(cell_col).cast("long").alias("cell")).distinct()
    res_row = cur.agg(
        F.min(F.shiftright("cell", C.RES_SHIFT)).alias("lo"),
        F.max(F.shiftright("cell", C.RES_SHIFT)).alias("hi")).first()
    if res_row["lo"] is None:
        base = df.sparkSession
        return base.createDataFrame(
            [], "cell long, res int, n_leaves long")
    if res_row["lo"] != res_row["hi"]:
        raise ValueError("compact_cells_df expects a same-resolution set")
    res0 = res = int(res_row["hi"])
    if min_res > res:
        raise ValueError("min_res must be <= the input resolution")

    def tag(d: DataFrame, r: int) -> DataFrame:
        return d.select("cell", F.lit(r).cast("int").alias("res"),
                        F.lit(4 ** (res0 - r)).cast("long")
                         .alias("n_leaves"))

    out = None
    while res > min_res:
        par = cur.withColumn(
            "parent", F.expr(C.parent_sql("cell", res, res - 1)))
        full = (par.groupBy("parent").count()
                .filter(F.col("count") == 4)
                .select(F.col("parent").alias("cell")))
        if persist:
            full = full.persist()
        # early stop runs in BOTH lifecycles (review r5: it used to be
        # persist-only, so persist=False silently stacked every level
        # down to min_res even after compaction was exhausted); under
        # persist the count also materializes the cache for its two
        # downstream reads, without it the count is the price of a
        # bounded plan depth
        if full.count() == 0:
            break  # no complete group left — nothing above changes
        rem = (par.join(full.select(F.col("cell").alias("parent")),
                        "parent", "left_anti").select("cell"))
        out = tag(rem, res) if out is None else \
            out.unionByName(tag(rem, res))
        cur, res = full, res - 1
    final = tag(cur, res)
    return final if out is None else out.unionByName(final)


# ---------------------------------------------------------------------------
# radius (DWITHIN) spatial join — cell-blocked, never a distance cross join
# ---------------------------------------------------------------------------

def planar_dist2_sql(lat_a: str, lon_a: str, lat_b: str, lon_b: str) -> str:
    """SQL text for the squared planar-degree distance with longitude
    wrap (dlon folded into [-180, 180) by the portable double-mod) —
    one fixed-order IEEE-double expression, identical text in Spark and
    DuckDB so oracle hashes hold bit-for-bit. Planar degrees are the
    engine's grid metric; a geodesic (haversine) final predicate is a
    drop-in swap at the exact-filter stage but is kept out of oracle
    faces (libm trig is not cross-engine ULP-stable)."""
    dlat = f"(({lat_a}) - ({lat_b}))"
    dlon = (f"(((({lon_a}) - ({lon_b}) + 180.0E0) % 360.0E0 + 360.0E0) "
            f"% 360.0E0 - 180.0E0)")
    return f"({dlat} * {dlat} + {dlon} * {dlon})"


def dwithin_join(left: DataFrame, right: DataFrame, *, radius: float,
                 res: int, id_left: str = "id", id_right: str = "id",
                 lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """ST_DWithin-style radius join: every (left, right) pair within
    ``radius`` planar degrees (squared-distance predicate from
    :func:`planar_dist2_sql`), the range-join sibling of the
    cell-blocked kNN join (top-k) and the PIP join (containment).

    Blocking: both sides tile at ``res``; candidates are the 3x3
    neighbor-cell equi-join (left x 9-offset broadcast stencil against
    the right side's cell key — longitude wraps). This is COMPLETE iff
    ``radius`` <= the cell's latitude extent 180/2^res (a pair within
    the radius can then differ by at most one cell index per axis), so
    the constructor enforces it. Scale shape: one shuffle per side on
    the cell key, a bounded 9-row nested-loop stencil, an equi-join,
    and a JVM-side exact filter — candidate volume is radius-local,
    never |L| x |R|.

    Returns ``(id_left, id_right, dist2)``; pass ``id_left=id_right``
    named differently for a self-join and filter ``id_a < id_b``
    downstream. Oracle face ``dwithin_join`` in queries_geo.py checks
    it against the brute-force theta join at sf0.01."""
    if res < 2:
        # with n = 2^res < 4 columns the stencil's -1/+1 longitude
        # offsets alias modulo n ((ci-1) % 2 == (ci+1) % 2), so a
        # neighbor-column pair would join twice and the returned pair
        # relation would carry exact duplicate rows
        raise ValueError(
            f"res {res} < 2: the 3x3 stencil needs >= 4 longitude "
            f"columns for its offsets to stay distinct modulo 2^res")
    if radius > 180.0 / (1 << res):
        raise ValueError(
            f"radius {radius} exceeds the res-{res} cell extent "
            f"{180.0 / (1 << res)}; 3x3 blocking would miss pairs")
    spark = left.sparkSession
    n = 1 << res
    ci_sql, cj_sql = cells.ij_sql(lat_col, lon_col, res)

    def prep(df: DataFrame, idc: str, side: str) -> DataFrame:
        return df.select(F.col(idc).alias(f"id_{side}"),
                         F.col(lat_col).alias(f"lat_{side}"),
                         F.col(lon_col).alias(f"lon_{side}"),
                         F.expr(ci_sql).alias(f"ci_{side}"),
                         F.expr(cj_sql).alias(f"cj_{side}"))

    la, rb = prep(left, id_left, "a"), prep(right, id_right, "b")
    offs = spark.createDataFrame(
        [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)],
        "di int, dj int")
    cand = (la.crossJoin(F.broadcast(offs))
            .select("id_a", "lat_a", "lon_a",
                    ((F.col("ci_a") + F.col("di") + n) % n).alias("ci_b"),
                    (F.col("cj_a") + F.col("dj")).alias("cj_b"))
            .join(rb, ["ci_b", "cj_b"]))
    d2 = planar_dist2_sql("lat_a", "lon_a", "lat_b", "lon_b")
    return (cand.withColumn("dist2", F.expr(d2))
                .filter(F.col("dist2") <= radius * radius)
                .select("id_a", "id_b", "dist2"))


# ---------------------------------------------------------------------------
# grid DBSCAN (density clustering over the occupied-cell surface)
# ---------------------------------------------------------------------------

def dbscan_points_df(df: DataFrame, id_col: str = "id",
                     lat_col: str = "lat", lon_col: str = "lon", *,
                     res: int = 14, minpts: int = 4,
                     persist: bool = True) -> DataFrame:
    """Grid-based DBSCAN: density clusters over the occupied-cell
    surface, one verdict row per input point.

    Semantics (the cell-blocked DBSCAN family, cf. GriDBSCAN/GriT —
    here the grid IS the epsilon neighborhood, so verdicts are exact
    for the stated definition, not an approximation of metric DBSCAN):

    - a cell is DENSE iff it holds >= ``minpts`` points;
    - clusters are connected components of the 8-neighbor adjacency
      graph over dense cells (longitude wraps, latitude clamps —
      :func:`loc2vec_spark.cells.ij_sql` conventions), labeled by the
      minimum member cell id (deterministic);
    - a point in a dense cell is ``core`` with its cell's cluster;
    - a point in a sparse cell adjacent to >= 1 dense cell is
      ``border`` with the MINIMUM adjacent cluster label;
    - everything else is ``noise`` (cluster NULL).

    Scale shape: the per-point stage is one groupBy on (ci, cj) — the
    same shuffle key the tiling path uses; everything after runs on the
    DISTINCT dense-cell surface (orders below the input at 100 TB).
    Adjacency is a broadcast 8-offset stencil + equi-join (never a
    distance cross join), components is the large-star/small-star
    operator (no driver graph state), and the core/border verdicts are
    (ci, cj) equi-joins back to the point table. Noise never enters
    the component computation.

    Returns ``(id_col, cluster BIGINT nullable, role STRING)``.
    Mirrored by the recursive-CTE oracle face ``dbscan_cells`` in
    queries_geo.py.

    ``persist=True`` (default) caches the two multiply-read interior
    tables — the narrow (pid, ci, cj) projection (read by the density
    aggregate, the core join, the sparse anti-join, and the output
    spine: 4 rescans of the RAW input otherwise) and the labeled
    dense-cell table (read 3x). Both are MEMORY_AND_DISK and released
    with the session (or ``spark.catalog.clearCache()``); pass
    ``persist=False`` when the caller manages materialization."""
    from .components import connected_components

    spark = df.sparkSession
    n = 1 << res
    ci_sql, cj_sql = cells.ij_sql(lat_col, lon_col, res)
    p = df.select(F.col(id_col).alias("pid"),
                  F.expr(ci_sql).alias("ci"), F.expr(cj_sql).alias("cj"))
    if persist:
        p = p.persist()
    d = (p.groupBy("ci", "cj").count()
          .filter(F.col("count") >= minpts)
          .select("ci", "cj",
                  (F.col("cj") * (1 << 29) + F.col("ci")).alias("nid")))
    offs = spark.createDataFrame(
        [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)
         if (di, dj) != (0, 0)], "di int, dj int")

    def neighbors(src: DataFrame, keep: list) -> DataFrame:
        return (src.crossJoin(F.broadcast(offs))
                .select(*keep,
                        ((F.col("ci") + F.col("di") + n) % n).alias("nci"),
                        (F.col("cj") + F.col("dj")).alias("ncj")))

    dn = d.select(F.col("ci").alias("nci"), F.col("cj").alias("ncj"),
                  F.col("nid").alias("t"))
    e = neighbors(d, ["nid"]).join(dn, ["nci", "ncj"]) \
                             .select(F.col("nid").alias("s"), "t")
    comp = connected_components(e, d.select("nid")).select(
        F.col("node").alias("nid"), F.col("component").alias("cluster"))
    dc = d.join(comp, "nid").select("ci", "cj", "cluster")
    if persist:
        dc = dc.persist()
    core = p.join(dc, ["ci", "cj"]).select("pid", "cluster")
    sp = p.join(dc.select("ci", "cj"), ["ci", "cj"], "left_anti")
    bord = (neighbors(sp, ["pid"])
            .join(dc.select(F.col("ci").alias("nci"),
                            F.col("cj").alias("ncj"), "cluster"),
                  ["nci", "ncj"])
            .groupBy("pid").agg(F.min("cluster").alias("cluster")))
    return (p.select("pid")
            .join(core.withColumnRenamed("cluster", "_c1"), "pid", "left")
            .join(bord.withColumnRenamed("cluster", "_c2"), "pid", "left")
            .select(F.col("pid").alias(id_col),
                    F.coalesce("_c1", "_c2").alias("cluster"),
                    F.when(F.col("_c1").isNotNull(), F.lit("core"))
                     .when(F.col("_c2").isNotNull(), F.lit("border"))
                     .otherwise(F.lit("noise")).alias("role")))
