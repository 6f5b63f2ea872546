"""Trained-codebook IVF-flat ANN (the production face of ann_ivf).

``queries_text.ann_ivf`` deliberately uses a *sampled* coarse quantizer
so the whole pipeline shares SQL text with its DuckDB oracle; its
docstring promises that a production codebook is Lloyd-trained and
broadcast. This module delivers that swap: centroids come from
:func:`operators.kmeans.lloyd_vec` (spherical k-means), and both the
home-cell assignment and the nprobe probes are per-row Arrow kernels
over the driver-side codebook (`kmeans.assign_arrow_vec`) — the N x C
assignment cross join and its per-vector window disappear from the
plan entirely. (The unrolled literal-expression variant this replaces
overflowed janino's 64 KiB method limit at k x dim >= ~512 and
silently ran interpreted — see assign_arrow_vec's docstring.)

Plan shape: Arrow assignment (zero shuffle, one crossing) -> (cid)
hash equi-join for candidates -> exact cosine re-rank (Arrow dot
kernel) with a per-query top-k window.
Everything downstream of the codebook is identical to ann_ivf, so
test_ann checks trained-vs-sampled recall on the same harness.

At 10^12 rows: train on a seeded sample (``train_frac``), not the full
table — Lloyd cost is per-iteration O(sample x k x dim) with k rows of
driver traffic; assignment of the full table stays one Arrow pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from .kmeans import assign_arrow_vec, lloyd_vec, seed_hash_col


def _normalized(emb_df: DataFrame, id_col: str, emb_col: str,
                dim: int) -> DataFrame:
    from ..functions import SPARK_BASE, norm_sql
    nrm = norm_sql(emb_col, dim, SPARK_BASE)
    return emb_df.selectExpr(id_col, emb_col, f"{nrm} AS nrm")


def _dot_products_udf():
    """Arrow dot-product kernel for the exact re-rank stage (lazy
    factory: a module-level @pandas_udf would demand an active
    SparkSession at import time).

    The unrolled 64-term expression alternative pushed the re-rank
    stage (two joins + dot + window in one whole-stage-codegen span)
    past janino's 64 KiB method limit at dim=64 — Spark logged
    'Code grows beyond 64 KB' and silently ran the stage INTERPRETED
    (measured on the sf0.01 embeddings table). One numpy batch per
    Arrow crossing is both faster than that fallback and
    size-independent. Per-row pairwise summation depends only on the
    vector length, never on batch composition, so results are
    deterministic at any parallelism (test_ann determinism).
    """
    @pandas_udf("double")
    def dots(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype=np.float64)
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        return pd.Series((A * B).sum(axis=1))

    return dots


def dot_products(a, b):
    return _dot_products_udf()(a, b)


def train_codebook(emb_df: DataFrame, *, dim: int, k_cells: int = 16,
                   iters: int = 3, seed: int = 77,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   train_frac: int = 1) -> list[tuple]:
    """Lloyd-train unit centroids; ``train_frac`` > 1 trains on a seeded
    1/train_frac hash-sample (the 10^12-row path)."""
    ne = _normalized(emb_df, id_col, emb_col, dim)
    if train_frac > 1:
        ne = ne.filter(seed_hash_col(id_col, seed) % train_frac == 0)
    return lloyd_vec(ne, dim=dim, k=k_cells, iters=iters, seed=seed,
                     id_col=id_col, vec_col=emb_col).centroids


def ivf_trained(emb_df: DataFrame, cents: list[tuple], *, dim: int,
                nprobe: int = 4, topk: int = 10, query_mod: int = 25,
                id_col: str = "vec_id", emb_col: str = "embedding",
                ne: DataFrame | None = None) -> DataFrame:
    """Top-``topk`` cosine neighbors for every ``query_mod``-th vector,
    probing the ``nprobe`` nearest trained cells. Returns (query_id,
    ann_rank, neighbor_id, cosine).

    Pass ``ne`` (a cached (id, emb, nrm) frame, e.g.
    ``pq.normalized_frame``) to share the base-table cache across
    repeated searches and own its ``unpersist()``; without it one is
    cached per call and lives until the session cache is cleared."""
    if ne is None:
        ne = _normalized(emb_df, id_col, emb_col, dim).cache()

    cells = assign_arrow_vec(ne, cents, emb_col, dim, norm_col="nrm") \
        .select(F.col(id_col).alias("neighbor_id"), "cid")
    probes = assign_arrow_vec(
        ne.filter(F.col(id_col) % query_mod == 0), cents, emb_col, dim,
        norm_col="nrm", nprobe=nprobe) \
        .select(F.col(id_col).alias("query_id"), "cid")

    cand = (probes.join(cells, "cid")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id").distinct())

    q = ne.select(F.col(id_col).alias("query_id"),
                  F.col(emb_col).alias("q_emb"), F.col("nrm").alias("q_n"))
    c = ne.select(F.col(id_col).alias("neighbor_id"),
                  F.col(emb_col).alias("c_emb"), F.col("nrm").alias("c_n"))
    dot = dot_products(F.col("q_emb"), F.col("c_emb"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id")
    return (cand.join(q, "query_id").join(c, "neighbor_id")
            .withColumn("cosine", dot / (F.col("q_n") * F.col("c_n")))
            .withColumn("ann_rank", F.row_number().over(w))
            .filter(F.col("ann_rank") <= topk)
            .select("query_id", "ann_rank", "neighbor_id",
                    F.round("cosine", 6).alias("cosine")))


def ivf_trained_candidates(emb_df: DataFrame, cents: list[tuple], *,
                           dim: int, nprobe: int = 4, query_mod: int = 25,
                           id_col: str = "vec_id",
                           emb_col: str = "embedding",
                           ne: DataFrame | None = None) -> DataFrame:
    """Candidate pairs only — the bench recall harness reports candidate
    fraction next to recall (same contract as ann_ivf_candidates)."""
    if ne is None:
        ne = _normalized(emb_df, id_col, emb_col, dim)
    cells = assign_arrow_vec(ne, cents, emb_col, dim, norm_col="nrm") \
        .select(F.col(id_col).alias("neighbor_id"), "cid")
    probes = assign_arrow_vec(
        ne.filter(F.col(id_col) % query_mod == 0), cents, emb_col, dim,
        norm_col="nrm", nprobe=nprobe) \
        .select(F.col(id_col).alias("query_id"), "cid")
    return (probes.join(cells, "cid")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id").distinct())
