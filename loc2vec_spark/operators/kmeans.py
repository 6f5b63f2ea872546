"""Distributed k-means (Lloyd) over 2-D point columns.

The reference has no clustering stage, but a training-data pipeline at
10^12 rows needs one constantly: IVF coarse quantizers for ANN
(`queries_text.ann_ivf` samples its quantizer; this trains one),
semantic dedup bucketing, and geo region discovery over the tile table.

Spark-first shape — each Lloyd iteration is:

- **assignment**: the k centroids live on the driver (k rows), so the
  argmin is a pure ROWWISE expression — ``array_min`` over an array of
  (d2, cid) literal structs (struct ordering = distance with cid
  tie-break). Zero shuffle, whole-stage codegen, no join at all: the
  broadcast-join formulation this replaces still shuffled N*k rows into
  a per-point window;
- **update**: one partial-aggregatable groupBy(cid) (k groups) computing
  the mean via fold-order-independent DECIMAL sums, then a k-row
  ``collect()`` (the only driver traffic: k rows per iteration, never
  the data).

Determinism contract (same result at any parallelism / partitioning):
inputs are 6dp-quantized, means are exact decimal sums divided once in
double, distances are one fixed-order double expression, ties break on
cid — so the assignment is a pure function of the input set. The
``kmeans_latlon`` query face checks this bit-exactly against a DuckDB
oracle that unrolls the same iterations as nested CTEs.

Seeding: the initial centroids are the k points with the smallest
seeded multiplicative hash of their id (portable SQL, same pick in the
oracle) — deterministic k-means++-style spread would need a sequential
driver loop over k; hash-pick is one top-k window and is the documented
trade.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_KNUTH = 2654435761  # same multiplier as queries._h


def seed_hash_col(id_col: str, seed: int, mod: int = 1000003):
    return F.expr(f"((({id_col} * {_KNUTH} + {seed}) % {mod} + {mod}) "
                  f"% {mod})")


@dataclass
class KMeansResult:
    assignments: DataFrame          # id, cid
    centroids: list[tuple]          # (cid, clat, clon) after last update
    history: list[list[tuple]]      # centroids after each iteration


def assign_rowwise(points: DataFrame, cents: list[tuple],
                   lat_col: str, lon_col: str) -> DataFrame:
    """Add ``cid`` = argmin_c dist2(point, c) as a rowwise expression.

    ``cents`` is [(cid, clat, clon)]: literals, not a join side. The
    distance text matches the SQL oracle term order exactly:
    (lat-clat)*(lat-clat) + (lon-clon)*(lon-clon).
    """
    structs = []
    for cid, clat, clon in cents:
        d2 = ((F.col(lat_col) - F.lit(clat))
              * (F.col(lat_col) - F.lit(clat))
              + (F.col(lon_col) - F.lit(clon))
              * (F.col(lon_col) - F.lit(clon)))
        structs.append(F.struct(d2.alias("d2"),
                                F.lit(int(cid)).alias("cid")))
    best = F.array_min(F.array(*structs))
    return points.withColumn("cid", best["cid"])


def lloyd(points: DataFrame, *, k: int = 4, iters: int = 2,
          seed: int = 77, id_col: str = "vec_id",
          lat_col: str = "lat", lon_col: str = "lon") -> KMeansResult:
    """Run ``iters`` Lloyd iterations; see module docstring for the
    exact-arithmetic determinism contract. ``points[lat_col/lon_col]``
    must already be 6dp-quantized doubles (callers: ROUND(x, 6))."""
    pts = points.select(id_col, lat_col, lon_col)

    # seed pick: k smallest (hash, id) — one top-k window, no global sort
    # of the data (WindowGroupLimit prunes map-side like w1_topk)
    wseed = Window.orderBy(seed_hash_col(id_col, seed), F.col(id_col))
    cents = [(i, r[lat_col], r[lon_col]) for i, r in enumerate(
        pts.withColumn("rn", F.row_number().over(wseed))
           .filter(F.col("rn") <= k).orderBy("rn").collect())]

    history: list[list[tuple]] = []
    asg = None
    for _ in range(iters):
        asg = assign_rowwise(pts, cents, lat_col, lon_col)
        # exact decimal sums -> one double division: fold-order-free
        upd = (asg.groupBy("cid").agg(
            (F.sum(F.col(lat_col).cast("decimal(18,6)")).cast("double")
             / F.count(F.lit(1))).alias("clat"),
            (F.sum(F.col(lon_col).cast("decimal(18,6)")).cast("double")
             / F.count(F.lit(1))).alias("clon")))
        cents = sorted((r["cid"], r["clat"], r["clon"])
                       for r in upd.collect())  # k rows, not the data
        history.append(cents)
    return KMeansResult(
        assignments=asg.select(id_col, "cid"),
        centroids=history[-1], history=history)


# ---------------------------------------------------------------------------
# vector (spherical) k-means — IVF codebook training
# ---------------------------------------------------------------------------

def _unit(vec: list[float]) -> list[float]:
    n = sum(x * x for x in vec) ** 0.5
    return [x / n for x in vec] if n > 0 else vec


def assign_rowwise_vec(df: DataFrame, cents: list[tuple], vec_col: str,
                       dim: int, *, norm_col: str,
                       nprobe: int = 1) -> DataFrame:
    """Centroid assignment over an array column, rowwise.

    ``cents`` is [(cid, [unit components])] — literals. Score is cosine
    = dot(vec, c) / nrm (centroids are unit), expression order fixed
    (term i before i+1, matching functions.dot_sql). nprobe=1 adds
    ``cid``; nprobe>1 explodes the nprobe best as (cid, crank).

    Zero shuffle, zero join: the sampled-quantizer IVF's N x C cross
    join + per-vector window (queries_text._ivf_prelude) exists because
    its centroids are a *relation* shared with the SQL oracle; with a
    driver-side codebook the argmax folds into whole-stage codegen.
    """
    structs = []
    for cid, comps in cents:
        dot = None
        for i, c in enumerate(comps[:dim]):
            term = F.col(vec_col)[i].cast("double") * F.lit(float(c))
            dot = term if dot is None else dot + term
        score = -(dot / F.col(norm_col))  # negate: array_min = best
        structs.append(F.struct(score.alias("negcos"),
                                F.lit(int(cid)).alias("cid")))
    arr = F.array(*structs)
    if nprobe == 1:
        return df.withColumn("cid", F.array_min(arr)["cid"])
    ranked = F.slice(F.array_sort(arr), 1, nprobe)
    return (df.withColumn("__pr", ranked)
              .select("*", F.posexplode("__pr").alias("__i", "__s"))
              .withColumn("cid", F.col("__s.cid"))
              .withColumn("crank", F.col("__i") + 1)
              .drop("__pr", "__i", "__s"))


def assign_arrow_vec(df: DataFrame, cents: list[tuple], vec_col: str,
                     dim: int, *, norm_col: str,
                     nprobe: int = 1) -> DataFrame:
    """Centroid assignment over an array column — Arrow/numpy kernel.

    Same contract as :func:`assign_rowwise_vec`, different physical
    strategy: the unrolled literal argmin is whole-stage codegen ONLY
    while k x dim stays small — at k=8..16, dim=64 the generated
    method exceeds janino's 64 KiB limit and Spark silently drops the
    stage (and anything fused into it, e.g. the downstream candidate
    join) to interpreted eval (measured; see operators/pq.py). This
    kernel is one Arrow crossing with generated-code size independent
    of k x dim — numpy dot per centroid.

    Determinism: per-row dots are pairwise reductions over the vector
    length only (never the batch), cosine ties break to the smallest
    cid via a stable argsort, so assignments are bit-identical at any
    parallelism and batch size. ``nrm`` is taken from the caller's
    column (the fixed-order SQL chain), so cosine VALUES stay
    consistent with the rest of the ANN stack.
    """
    from pyspark.sql.functions import pandas_udf

    order_c = sorted(cents)
    C = np.asarray([comps[:dim] for _, comps in order_c],
                   dtype=np.float64)                    # (k, dim)
    cids = np.asarray([cid for cid, _ in order_c], dtype=np.int32)
    np_ = min(nprobe, len(order_c))

    @pandas_udf("array<int>")
    def top_cids(vec: pd.Series, nrm: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(vec.to_numpy()).astype(np.float64)[:, :dim]
        dots = np.empty((len(X), len(C)), dtype=np.float64)
        for j in range(len(C)):
            # (X * C[j]).sum(1): reduction along the row only — the
            # batched X @ C.T gemm may pick shape-dependent kernels
            # whose rounding varies with batch size (nondeterministic
            # across partitionings)
            dots[:, j] = (X * C[j]).sum(axis=1)
        cos = dots / nrm.to_numpy(dtype=np.float64)[:, None]
        idx = np.argsort(-cos, axis=1, kind="stable")[:, :np_]
        return pd.Series(list(cids[idx]))

    probed = top_cids(F.col(vec_col), F.col(norm_col))
    if nprobe == 1:
        return df.withColumn("cid", probed[0])
    return (df.withColumn("__pr", probed)
              .select("*", F.posexplode("__pr").alias("__i", "__s"))
              .withColumn("cid", F.col("__s"))
              .withColumn("crank", F.col("__i") + 1)
              .drop("__pr", "__i", "__s"))


def lloyd_vec(points: DataFrame, *, dim: int, k: int = 16, iters: int = 3,
              seed: int = 77, id_col: str = "vec_id",
              vec_col: str = "embedding",
              norm_col: str = "nrm") -> KMeansResult:
    """Spherical k-means over an array<float> column (IVF codebook).

    Same execution shape as :func:`lloyd`, with the assignment as the
    Arrow kernel (zero shuffle, one crossing — the unrolled literal
    argmin overflows codegen at k=16 x dim=64), one k-group partial
    agg per iteration
    (``dim`` decimal sums per group — fold-order-free), k rows collected
    per iteration. Updated centroids are re-normalized to unit in fixed
    driver-side order, so results are bit-identical at any parallelism.
    """
    pts = points.select(id_col, vec_col, norm_col)

    # seed pick: unpartitioned window + rn<=k relies on Spark 4's
    # WindowGroupLimit rewrite to prune map-side to top-k; on an engine
    # without it this is a single-task global sort of the (sampled)
    # training input — r2 verdict note, same caveat at lloyd() and
    # pq.train_pq
    wseed = Window.orderBy(seed_hash_col(id_col, seed), F.col(id_col))
    seed_rows = (pts.withColumn("rn", F.row_number().over(wseed))
                 .filter(F.col("rn") <= k).orderBy("rn").collect())
    cents = [(i, _unit([float(x) for x in r[vec_col]]))
             for i, r in enumerate(seed_rows)]

    sums = [F.sum(F.round(F.col(vec_col)[i].cast("double"), 6)
                  .cast("decimal(28,6)")).cast("double").alias(f"s{i}")
            for i in range(dim)]
    history: list[list[tuple]] = []
    asg = None
    for _ in range(iters):
        # Arrow kernel, not the unrolled literal argmin: at the default
        # k=16, dim=64 the unrolled form exceeds janino's method limit
        # and the whole assignment+agg stage ran interpreted
        asg = assign_arrow_vec(pts, cents, vec_col, dim,
                               norm_col=norm_col, nprobe=1)
        rows = (asg.groupBy("cid")
                .agg(F.count(F.lit(1)).alias("n"), *sums).collect())
        cents = sorted(
            (r["cid"], _unit([r[f"s{i}"] / r["n"] for i in range(dim)]))
            for r in rows)
        history.append(cents)
    return KMeansResult(assignments=asg.select(id_col, "cid"),
                        centroids=history[-1], history=history)
