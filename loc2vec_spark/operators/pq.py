"""IVF-PQ: product-quantized ANN — the compressed-candidate scale path.

IVF-flat (`operators/ann.py`) re-ranks every candidate against the
EXACT float vectors, so the candidate join ships dim x 4 bytes per row
(256 B at dim=64). At 10^12 vectors that join IS the job. Product
quantization (Jegou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — the FAISS IVFPQ design) compresses each vector to
M sub-codes. Here M=8 subspaces x 8-bit codes (ksub=256 sub-centroids,
the FAISS-standard codebook size), physically PACKED into one BIGINT:
the codes relation really ships 8 bytes per vector, 32x below the raw
floats — not an array<int> that merely encodes 8 bytes (round-2 review
finding: the claimed size must exist in the schema, not the prose).
Candidates are scored from codes alone (ADC — asymmetric distance
computation: exact query side, quantized candidate side), and only the
top ``refine`` ADC survivors per query ever touch the exact vectors
(FAISS's IVFPQR refinement stage).

Physical strategy note — why every per-vector kernel here is
Arrow/numpy, not unrolled literal expressions: PQ's encode is
M x ksub x subdim + norm terms in ONE projection (~16k doubles at
dim=64/ksub=256), and even the k x dim coarse argmin fused into the
candidate join — measured: janino rejects the generated method
(>64 KiB) and Spark silently drops the WHOLE stage to interpreted
expression evaluation. A numpy-vectorized pandas UDF is both faster
than that fallback and size-independent: one Arrow crossing per stage,
the `operators/similarity.py` blocked-kernel discipline (and the numpy
analog of FAISS's SIMD ADC loop). The coarse IVF probe uses the
same-discipline Arrow kernel (`kmeans.assign_arrow_vec`).

Spark-first shape:

- **training** (`train_pq`): per-subspace Lloyd over unit-normalized
  vectors — assignment is the same Arrow encode kernel, updates are
  fold-order-free DECIMAL sums with ksub x M rows of driver traffic per
  iteration, on a seeded hash-sample (``train_frac``) exactly like
  `ann.train_codebook`;
- **encoding** (`encode_pq`): one Arrow pass adds ``pq_code``
  (BIGINT — M 8-bit codes packed little-endian) — no join, no shuffle;
  the codes table is the only thing the ANN candidate join ever ships;
- **search** (`ivfpq_search`): coarse IVF probe -> (cid) equi-join
  against the CODES table -> ADC distance from codes (the codebook
  rides the task closure, never a join side) -> per-query
  top-``refine`` window over codes only -> exact-cosine re-rank of
  those ``refine`` rows (the only contact with the float vectors) ->
  top-k.

Coarse-residual mode (round 4 — FAISS ``by_residual``): with
``cents`` passed to :func:`train_pq` and ``residual=True`` threaded
through build/search, codes quantize ``nx - centroid[cid]`` and the
query side of the ADC residualizes per probed cell. MEASURED: on
clustered data (the real-embedding regime) residual cuts mean ADC
distortion 43% (test_pq); on the uniform-random worst-case fixture it
*inflates* the target (unit centroids are near-orthogonal to unit
points, ``||x - c||^2 ~ 1.6``) and lowers recall — so the uniform
bench runs ``residual=False`` and clustered deployments should run
``residual=True`` (``read_pq_meta`` records which mode a persisted
index used).

Determinism: normalized components are 6dp-quantized, numpy argmin
takes the first minimal code, ADC is fixed-order float64, the residual
is an elementwise ``zip_with`` over a constant-folded centroid map,
final ranks tie-break on neighbor_id — bit-identical at any
parallelism (test_pq asserts across repartitionings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.utils import AnalysisException
from pyspark.sql.window import Window

from .kmeans import assign_arrow_vec, seed_hash_col

# row-chunk for the encode broadcast: (chunk, ksub, subdim) float64 is
# ~32 MB at ksub=256/subdim=8 — bounds peak memory independently of the
# Arrow batch size (per-row reductions, so chunking never changes bits)
_ENC_CHUNK = 2048


def _norm_vec_col(vec_col: str, dim: int, norm_col: str | None = None):
    """Unit-normalized, 6dp-quantized array<double> of the first ``dim``
    components (dim terms — compiles fine in codegen).

    ``norm_col``: reuse a precomputed norm column (normalized_frame's
    ``nrm``) instead of re-deriving the 64-term sum — BIT-identical:
    both build the same left-to-right IEEE double sum of squares
    (functions.norm_sql), so sqrt agrees exactly (r3 review)."""
    if norm_col is not None:
        nrm = F.col(norm_col)
    else:
        dot = None
        for i in range(dim):
            t = (F.col(vec_col)[i].cast("double")
                 * F.col(vec_col)[i].cast("double"))
            dot = t if dot is None else dot + t
        nrm = F.sqrt(dot)
    return F.transform(
        F.slice(F.col(vec_col), 1, dim),
        lambda x: F.round(x.cast("double") / nrm, 6))


def _books_arr(books: list[list[tuple]]) -> np.ndarray:
    """(M, ksub, subdim) float64 array from the books structure."""
    return np.asarray([[comps for _, comps in sorted(b)] for b in books],
                      dtype=np.float64)


def residual_col(cents: list[tuple], nx_col, cid_col: str = "cid"):
    """JVM-side coarse residual: ``nx - centroid[cid]`` (FAISS IVFPQ's
    ``by_residual`` — Jegou et al. §IV encode the offset from the coarse
    cell, whose spread is far smaller than the raw vectors', so the
    same ksub=256 budget buys a finer quantizer).

    Pure Catalyst: the centroid table is a constant-folded map literal
    (k x dim doubles — one precomputed object, not per-row codegen) and
    the subtraction is ``zip_with`` — elementwise IEEE doubles, so the
    residual is bit-deterministic at any parallelism. ``nx_col`` may be
    a name or a Column (the normalized-vector expression)."""
    pairs = []
    for cid, comps in sorted(cents):
        pairs.append(F.lit(int(cid)))
        pairs.append(F.array(*[F.lit(float(x)) for x in comps]))
    cmap = F.create_map(*pairs)
    nx = F.col(nx_col) if isinstance(nx_col, str) else nx_col
    cent = F.element_at(cmap, F.col(cid_col).cast("int"))
    return F.zip_with(nx, cent, lambda x, c: x - c)


def unpack_codes(packed: int, m: int) -> list[int]:
    """The M 8-bit sub-codes of one packed BIGINT (little-endian byte
    order: sub-code mm lives at bits [8*mm, 8*mm+8))."""
    u = np.uint64(np.int64(packed).astype(np.uint64))
    return [int((u >> np.uint64(8 * mm)) & np.uint64(0xFF))
            for mm in range(m)]


def code_byte_col(code_col, mm: int) -> "F.Column":
    """Spark column extracting sub-code ``mm`` from the packed BIGINT
    (JVM-side shift+mask — no Python crossing for per-subspace slices).
    ``code_col`` is a column name or a Column expression."""
    c = F.col(code_col) if isinstance(code_col, str) else code_col
    return F.shiftrightunsigned(c, 8 * mm).bitwiseAND(F.lit(255))


def _unpack_np(code: pd.Series, m: int) -> np.ndarray:
    """(n, M) int64 sub-code matrix from the packed BIGINT series."""
    u = code.to_numpy().astype(np.int64).view(np.uint64)
    shifts = (np.arange(m) * 8).astype(np.uint64)
    return ((u[:, None] >> shifts[None, :])
            & np.uint64(0xFF)).astype(np.int64)


def _encode_udf(books: list[list[tuple]]):
    """array<double> nx -> packed BIGINT code, numpy-vectorized per
    Arrow batch: per subspace, ||x_m - c||^2 argmin over ksub
    sub-centroids (first minimal index — deterministic), the M 8-bit
    winners packed little-endian into one int64.

    Distances are per-row reductions `((sub - C)**2).sum(axis=-1)`
    (broadcast over the centroid axis), NOT the expanded
    `-2 sub @ C.T + ...` gemm: BLAS picks shape-dependent kernels whose
    rounding varies with the Arrow batch size, so a near-tie between
    two sub-centroids could flip with partitioning — the same
    batch-independence rule as `kmeans.assign_arrow_vec` (review r2
    batch 4). Row-chunked at ``_ENC_CHUNK`` purely to bound the
    (chunk, ksub, subdim) temporary; chunking cannot change any row's
    code."""
    barr = _books_arr(books)
    m, ksub, subdim = barr.shape
    if ksub > 256:
        # a bare assert is stripped under python -O, and a 9-bit argmin
        # index would silently bleed into the next sub-code's byte
        # (r3 review) — raise regardless of interpreter flags
        raise ValueError("packed 8-bit sub-codes cap ksub at 256")

    @pandas_udf("long")
    def enc(nx: pd.Series) -> pd.Series:
        if len(nx) == 0:
            return pd.Series([], dtype=np.int64)
        X = np.stack(nx.to_numpy())            # (n, dim) float64
        n = X.shape[0]
        packed = np.zeros(n, dtype=np.uint64)
        for lo in range(0, n, _ENC_CHUNK):
            sub = X[lo:lo + _ENC_CHUNK].reshape(-1, m, subdim)
            for mm in range(m):
                d2 = ((sub[:, mm, None, :] - barr[mm][None, :, :]) ** 2
                      ).sum(axis=2)            # (chunk, ksub)
                codes = np.argmin(d2, axis=1).astype(np.uint64)
                packed[lo:lo + _ENC_CHUNK] |= codes << np.uint64(8 * mm)
        return pd.Series(packed.view(np.int64))

    return enc


def _adc_udf(books: list[list[tuple]]):
    """(query nx array<double>, candidate packed BIGINT code) -> ADC
    squared-L2 double, one unpack + one gather per Arrow batch."""
    barr = _books_arr(books)
    m, ksub, subdim = barr.shape

    @pandas_udf("double")
    def adc(nx: pd.Series, code: pd.Series) -> pd.Series:
        if len(nx) == 0:
            return pd.Series([], dtype=np.float64)
        Q = np.stack(nx.to_numpy()).reshape(-1, m, subdim)
        C = _unpack_np(code, m)                            # (n, M)
        rec = barr[np.arange(m)[None, :], C]               # (n, M, subdim)
        d = ((Q - rec) ** 2).sum(axis=(1, 2))
        return pd.Series(d)

    return adc


def adc_distance(books: list[list[tuple]], nx_col: str,
                 code_col: str) -> "F.Column":
    """ADC column: exact (normalized) query side vs quantized candidate
    side; the codebook rides the task closure (~128 kB at
    M=8/ksub=256/dim=64), never a join side."""
    return _adc_udf(books)(F.col(nx_col), F.col(code_col))


def train_pq(emb_df: DataFrame, *, dim: int, m: int = 8, ksub: int = 256,
             iters: int = 3, seed: int = 177, id_col: str = "vec_id",
             emb_col: str = "embedding", train_frac: int = 1,
             cents: list[tuple] | None = None) -> list[list[tuple]]:
    """Train M per-subspace codebooks; returns
    ``books[m] = [(code, [subdim floats]), ...]`` (ksub entries each).

    One cached normalized (sampled) training set; per iteration one
    Arrow encode pass assigns ALL M codes, then M tiny groupBy(byte)
    updates (ksub groups, subdim decimal sums each) — driver traffic is
    M x ksub rows per iteration, never the data.

    ``cents``: coarse IVF centroids — when given, codebooks are trained
    on coarse RESIDUALS ``nx - centroid[cid]`` (FAISS ``by_residual``),
    using the SAME assignment kernel (raw vector + exact norm) the
    index build and the search probes use, so train/encode/ADC all
    quantize one distribution. Pass the same ``cents`` with
    ``residual=True`` to :func:`build_pq_index` / :func:`ivfpq_search`.
    """
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    if ksub > 256:
        raise ValueError("packed 8-bit sub-codes cap ksub at 256")
    subdim = dim // m
    if cents is not None:
        from ..functions import SPARK_BASE, norm_sql
        nf = emb_df.selectExpr(
            id_col, emb_col,
            f"{norm_sql(emb_col, dim, SPARK_BASE)} AS nrm")
        asg = assign_arrow_vec(nf, cents, emb_col, dim, norm_col="nrm")
        ne = asg.select(id_col, residual_col(
            cents, _norm_vec_col(emb_col, dim, norm_col="nrm"),
            "cid").alias("nx"))
    else:
        ne = emb_df.select(id_col, _norm_vec_col(emb_col, dim).alias("nx"))
    if train_frac > 1:
        ne = ne.filter(seed_hash_col(id_col, seed) % train_frac == 0)
    ne = ne.cache()

    # seed pick per subspace: the ksub rows with smallest (hash, id),
    # one window over the sample — same discipline as kmeans.lloyd.
    # NOTE: the unpartitioned Window relies on Spark 4's
    # WindowGroupLimit rewrite to prune map-side to top-ksub; on an
    # engine without that optimization this would be a single-task
    # global sort of the TRAINING SAMPLE (bounded by train_frac), not
    # of the data (round-2 verdict note).
    wseed = Window.orderBy(seed_hash_col(id_col, seed), F.col(id_col))
    seed_rows = (ne.withColumn("rn", F.row_number().over(wseed))
                 .filter(F.col("rn") <= ksub).orderBy("rn").collect())
    if len(seed_rows) < ksub:
        raise ValueError(
            f"PQ training sample has {len(seed_rows)} rows < ksub={ksub}; "
            f"lower ksub or train_frac")
    books = [[(c, [float(r["nx"][mm * subdim + i]) for i in range(subdim)])
              for c, r in enumerate(seed_rows)] for mm in range(m)]

    for _ in range(iters):
        asg = ne.select(
            "nx", _encode_udf(books)(F.col("nx")).alias("pq_code")).cache()
        asg.count()  # materialize once; M group-bys share the scan
        for mm in range(m):
            sums = [F.sum(F.col("nx")[mm * subdim + i]
                          .cast("decimal(28,6)")).cast("double")
                    .alias(f"s{i}") for i in range(subdim)]
            rows = (asg.groupBy(code_byte_col("pq_code", mm).alias("c"))
                    .agg(F.count(F.lit(1)).alias("n"), *sums).collect())
            got = {int(r["c"]): [r[f"s{i}"] / r["n"] for i in range(subdim)]
                   for r in rows}
            # empty cells keep their previous centroid (standard Lloyd)
            books[mm] = [(c, got.get(c, comps))
                         for c, comps in books[mm]]
        asg.unpersist()
    ne.unpersist()
    return books


def encode_pq(emb_df: DataFrame, books: list[list[tuple]], *, dim: int,
              id_col: str = "vec_id", emb_col: str = "embedding",
              norm_col: str | None = None) -> DataFrame:
    """(id, pq_code BIGINT — M packed 8-bit sub-codes) — one Arrow pass,
    no join, no shuffle; the shipped index row really is 8 B of code.
    ``norm_col``: reuse a precomputed norm (normalized_frame's nrm) —
    bit-identical, skips the dim-term norm recompute."""
    ne = emb_df.select(
        id_col, _norm_vec_col(emb_col, dim, norm_col=norm_col).alias("nx"))
    return ne.select(id_col,
                     _encode_udf(books)(F.col("nx")).alias("pq_code"))


def normalized_frame(emb_df: DataFrame, dim: int,
                     id_col: str = "vec_id",
                     emb_col: str = "embedding") -> DataFrame:
    """(id, emb, nrm) cached — the one scan assignment, probes and both
    re-rank sides share. Returned as an explicit handle so callers
    running many searches can ``.unpersist()`` it between batches
    instead of relying on ``spark.catalog.clearCache()`` (round-2
    verdict item: session-lifetime cache accumulation)."""
    from ..functions import SPARK_BASE, norm_sql
    nrm = norm_sql(emb_col, dim, SPARK_BASE)
    return emb_df.selectExpr(id_col, emb_col, f"{nrm} AS nrm").cache()


# back-compat alias (pre-round-3 private name)
_normalized_cached = normalized_frame


def build_pq_index(emb_df: DataFrame, cents: list[tuple],
                   books: list[list[tuple]], *, dim: int,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   ne: DataFrame | None = None,
                   residual: bool = False) -> DataFrame:
    """The compressed index relation: (neighbor_id, cid, pq_code BIGINT)
    — ONE pass over the (shared cached) normalized frame: coarse-assign,
    then encode in the same projection (no self-join — the cid the
    residual needs is already on the row). This is the ONLY relation
    the ANN candidate join ever ships at scale; persist it with
    :func:`write_pq_index` (partitioned by cid) so probes read just the
    probed cells' files.

    ``residual=True``: codes quantize ``nx - centroid[cid]`` (books
    must come from ``train_pq(..., cents=cents)``)."""
    if ne is None:
        ne = normalized_frame(emb_df, dim, id_col, emb_col)
    asg = assign_arrow_vec(ne, cents, emb_col, dim, norm_col="nrm")
    # encode from the cached normalized frame AND its precomputed nrm:
    # saves the dim-term norm recompute over the largest relation here
    # (bit-identical — see _norm_vec_col)
    nx = _norm_vec_col(emb_col, dim, norm_col="nrm")
    rx = residual_col(cents, nx, "cid") if residual else nx
    return asg.select(F.col(id_col).alias("neighbor_id"), "cid",
                      _encode_udf(books)(rx).alias("pq_code"))


def ivfpq_shortlist(emb_df: DataFrame, cents: list[tuple],
                    books: list[list[tuple]], *, dim: int,
                    nprobe: int = 4, refine: int = 30,
                    query_mod: int = 25, id_col: str = "vec_id",
                    emb_col: str = "embedding",
                    ne: DataFrame | None = None,
                    index: DataFrame | None = None,
                    residual: bool = False) -> DataFrame:
    """(query_id, neighbor_id) ADC shortlist — the exact-contact set.

    Exposed separately so the bench can MEASURE the exact-vector
    contact fraction (a query whose probed cells hold fewer than
    ``refine`` candidates contributes fewer rows than refine * |Q|,
    so the analytic product overstates contact — review r2 batch 4).

    ``index``: a prebuilt/persisted (neighbor_id, cid, pq_code)
    relation (:func:`build_pq_index` / :func:`read_pq_index`); when
    omitted it is computed inline from ``emb_df``.

    ``residual=True``: the query side of the ADC is residualized PER
    PROBED CELL (``q_nx - centroid[cid]`` after the nprobe explode), so
    ADC(q, code) estimates ``||(q - c) - decode(code)||^2 =
    ||q - (c + decode(code))||^2`` — the FAISS residual ADC identity.
    Must match how the index was encoded.
    """
    if ne is None:
        ne = normalized_frame(emb_df, dim, id_col, emb_col)
    if index is None:
        index = build_pq_index(emb_df, cents, books, dim=dim,
                               id_col=id_col, emb_col=emb_col, ne=ne,
                               residual=residual)

    queries = ne.filter(F.col(id_col) % query_mod == 0)
    q_nx = _norm_vec_col(emb_col, dim, norm_col="nrm")
    probes = assign_arrow_vec(queries, cents, emb_col, dim,
                              norm_col="nrm", nprobe=nprobe) \
        .select(F.col(id_col).alias("query_id"), q_nx.alias("q_nx"),
                "cid")
    if residual:
        probes = probes.select(
            "query_id", residual_col(cents, "q_nx", "cid").alias("q_nx"),
            "cid")

    wadc = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    return (probes.join(index, "cid")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("adc", adc_distance(books, "q_nx", "pq_code"))
            .select("query_id", "neighbor_id", "adc")
            .withColumn("adc_rank", F.row_number().over(wadc))
            .filter(F.col("adc_rank") <= refine)
            .select("query_id", "neighbor_id"))


def ivfpq_search(emb_df: DataFrame, cents: list[tuple],
                 books: list[list[tuple]], *, dim: int, nprobe: int = 4,
                 topk: int = 10, refine: int = 30, query_mod: int = 25,
                 id_col: str = "vec_id",
                 emb_col: str = "embedding",
                 ne: DataFrame | None = None,
                 index: DataFrame | None = None,
                 residual: bool = False) -> DataFrame:
    """IVF-PQ + refine: candidates scored from codes (ADC), exact cosine
    only for the top-``refine`` per query. Same output contract as
    `ann.ivf_trained`: (query_id, ann_rank, neighbor_id, cosine).

    Pass ``ne=normalized_frame(...)`` to share/own the cached base
    frame across repeated searches (and ``ne.unpersist()`` after);
    without it one is built per call and lives until the session's
    cache is cleared. Pass ``index=read_pq_index(...)[2]`` to search a
    persisted index instead of re-encoding the base table.
    ``residual``: must match how books/index were trained/encoded (the
    exact-cosine re-rank itself is residual-agnostic)."""
    if ne is None:
        ne = normalized_frame(emb_df, dim, id_col, emb_col)
    shortlist = ivfpq_shortlist(emb_df, cents, books, dim=dim,
                                nprobe=nprobe, refine=refine,
                                query_mod=query_mod, id_col=id_col,
                                emb_col=emb_col, ne=ne, index=index,
                                residual=residual)

    from .ann import dot_products
    q = ne.select(F.col(id_col).alias("query_id"),
                  F.col(emb_col).alias("q_emb"), F.col("nrm").alias("q_n"))
    c = ne.select(F.col(id_col).alias("neighbor_id"),
                  F.col(emb_col).alias("c_emb"), F.col("nrm").alias("c_n"))
    dot = dot_products(F.col("q_emb"), F.col("c_emb"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id")
    return (shortlist.join(q, "query_id").join(c, "neighbor_id")
            .withColumn("cosine", dot / (F.col("q_n") * F.col("c_n")))
            .withColumn("ann_rank", F.row_number().over(w))
            .filter(F.col("ann_rank") <= topk)
            .select("query_id", "ann_rank", "neighbor_id",
                    F.round("cosine", 6).alias("cosine")))


# ---------------------------------------------------------------------------
# index persistence (round 3): the production shape of an ANN deploy is
# "build the index ONCE as a job, search it many times" — FAISS's
# write_index/read_index, re-expressed as parquet tables. The codebooks
# are kB-sized driver tables; the codes index is a real dataset written
# through lineage.write_partitioned partitioned by cid, which buys (a)
# resumable, manifest-checksummed builds (S6/S8) and (b) PARTITION
# PRUNING on search: a probe filters cid IN (<nprobe cells>), so the
# scan touches only the probed cells' files — at 10^12 rows a search
# reads nprobe/k_cells of the index, not all of it.
# ---------------------------------------------------------------------------

def write_pq_index(spark, out_dir: str, cents: list[tuple],
                   books: list[list[tuple]], index: DataFrame,
                   *, residual: bool = False) -> dict:
    """Persist (coarse centroids, PQ codebooks, codes index) under
    ``out_dir``; returns the index's lineage manifest dict.
    ``residual`` is recorded in a meta table so a later reader searches
    the index in the encoding mode it was built with
    (:func:`read_pq_meta`)."""
    from .. import lineage
    spark.createDataFrame([(bool(residual), len(books))],
                          "residual BOOLEAN, m INT") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(f"{out_dir}/meta")
    cent_rows = [(int(cid), [float(x) for x in comps])
                 for cid, comps in cents]
    spark.createDataFrame(cent_rows,
                          "cid INT, comps ARRAY<DOUBLE>") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(f"{out_dir}/centroids")
    book_rows = [(mm, int(code), [float(x) for x in comps])
                 for mm, book in enumerate(books)
                 for code, comps in book]
    spark.createDataFrame(book_rows,
                          "m INT, code INT, comps ARRAY<DOUBLE>") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(f"{out_dir}/codebooks")
    # cache around the lineage write: write_partitioned materializes
    # the frame TWICE (parquet write, then the manifest aggregation) —
    # uncached, the assign + encode kernels and the id join would run
    # end-to-end twice over the largest relation of the build (r3
    # review)
    index = index.persist()
    try:
        return lineage.write_partitioned(index, f"{out_dir}/index",
                                         cell_col="cid",
                                         id_col="neighbor_id")
    finally:
        index.unpersist()


def read_pq_index(spark, out_dir: str
                  ) -> tuple[list[tuple], list[list[tuple]], DataFrame]:
    """Load a persisted index: (cents, books, index_df). Doubles round-
    trip parquet exactly, so a search over the loaded index is
    bit-identical to one over the just-built index (test_pq)."""
    cents = [(int(r["cid"]), [float(x) for x in r["comps"]])
             for r in spark.read.parquet(f"{out_dir}/centroids")
             .orderBy("cid").collect()]
    brows = spark.read.parquet(f"{out_dir}/codebooks") \
        .orderBy("m", "code").collect()
    m = 1 + max(int(r["m"]) for r in brows)
    books = [[] for _ in range(m)]
    for r in brows:
        books[int(r["m"])].append(
            (int(r["code"]), [float(x) for x in r["comps"]]))
    index = spark.read.parquet(f"{out_dir}/index") \
        .select("neighbor_id", F.col("cid").cast("int").alias("cid"),
                "pq_code")
    return cents, books, index


def read_pq_meta(spark, out_dir: str) -> dict:
    """Encoding-mode metadata of a persisted index:
    ``{"residual": bool, "m": int}``. Indexes written before the meta
    table existed (round 3) were all non-residual — a meta table that
    is genuinely ABSENT reads as ``residual=False``. Any other read
    failure (corrupt footer, permissions, partial overwrite) re-raises:
    silently defaulting there would score non-residual queries against
    residual codes and return garbage neighbors with no error
    (review r4). Absence is probed through the Hadoop FS API rather
    than by substring-matching Spark's AnalysisException text — the
    error string is version-dependent ("PATH_NOT_FOUND" vs "Path does
    not exist"), so a runtime upgrade would have broken the legacy
    default path (ADVICE r4). Spark Connect sessions have no
    ``sparkContext._jvm`` gateway at all, so when the probe is
    unavailable the classification falls back to the read itself,
    matching the STRUCTURED error class first and the legacy text only
    after it (review r5)."""
    _LEGACY = {"residual": False, "m": 8}
    meta = f"{out_dir}/meta"
    try:
        sc = spark.sparkContext
        path = sc._jvm.org.apache.hadoop.fs.Path(meta)
        fs = path.getFileSystem(sc._jsc.hadoopConfiguration())
        exists = bool(fs.exists(path))
    except Exception:
        exists = None  # no JVM gateway (Spark Connect) — probe below
    if exists is False:
        return _LEGACY
    try:
        r = spark.read.parquet(meta).collect()[0]
    except AnalysisException as e:
        if exists is None:
            # getCondition is the current accessor; getErrorClass is
            # its deprecated pre-4.0 name (kept as fallback for older
            # runtimes); raw text is the last resort for runtimes with
            # neither
            get = (getattr(e, "getCondition", None)
                   or getattr(e, "getErrorClass", None))
            cls = get() if get else None
            if cls == "PATH_NOT_FOUND" or (
                    cls is None and "Path does not exist" in str(e)):
                return _LEGACY
        raise
    return {"residual": bool(r["residual"]), "m": int(r["m"])}
