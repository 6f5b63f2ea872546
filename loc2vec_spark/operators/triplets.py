"""Triplet assembly + cell-blocked kNN mining (the flagship pipeline).

Replaces the reference's O(n^2) all-pairs distance matrix
(``/root/reference/src/loc2vec/triplet_mining.py:103-114`` — the author's
own comment at ``:17-20`` flags it as BAD) with the north-star plan:
k-ring expansion -> equi-join on cell -> within-group distance sort via
window functions. At 10^12 rows the all-pairs join is impossible; the
cell-blocked join shuffles each row to O(ring^2) cells and compares only
within spatially-plausible blocks.

Also re-expresses the reference's triplet assembly
(``data_loading.py:104-113``): positive = nearest in-ring neighbor (J2 as a
cell-neighbor join), negative = seeded far-cell sample (J4; the reference's
contiguous-block hack is reproduced exactly in ``compat`` mode).

Determinism: every ordering is tie-broken by id, every random pick is a
seeded integer hash — output is identical at any parallelism (the scaling
bench depends on this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .. import cells
from ..functions import SPARK_BASE, euclid_sql
from .geo import kring_explode

# portable multiplicative hash (same text runs in DuckDB for the oracle)
_KNUTH = 2654435761


def _hash_sql(expr: str, seed: int, mod: int) -> str:
    return f"(((({expr}) * {_KNUTH} + {seed}) % {mod} + {mod}) % {mod})"


# ---------------------------------------------------------------------------
# J5 + W1: cell-blocked kNN
# ---------------------------------------------------------------------------

def knn_topk(pts: DataFrame, *, id_col: str, emb_col: str,
             cell_col: str, res: int, dim: int, k: int = 5,
             ring: int = 1, include_dist: bool = True) -> DataFrame:
    """Top-k nearest in-ring neighbors per row.

    pts must carry (id_col, emb_col, cell_col at resolution ``res``).
    Output: (anchor_id, rank, neighbor_id[, dist]) — dist rounded to 6dp,
    computed in double with a fixed-order expression so the DuckDB oracle
    hashes identically.
    """
    a = pts.select(F.col(id_col).alias("anchor_id"),
                   F.col(emb_col).alias("a_emb"),
                   F.col(cell_col).alias("a_cell"))
    a = kring_explode(a, "a_cell", res, k=ring, out_col="nb_cell")
    c = pts.select(F.col(id_col).alias("neighbor_id"),
                   F.col(emb_col).alias("c_emb"),
                   F.col(cell_col).alias("c_cell"))
    cand = (a.join(c, F.col("nb_cell") == F.col("c_cell"))
             .filter(F.col("anchor_id") != F.col("neighbor_id"))
             .withColumn("dist", F.expr(
                 euclid_sql("a_emb", "c_emb", dim, SPARK_BASE))))
    w = Window.partitionBy("anchor_id").orderBy("dist", "neighbor_id")
    out = (cand.withColumn("rank", F.row_number().over(w))
               .filter(F.col("rank") <= k))
    sel = [F.col("anchor_id"), F.col("rank"), F.col("neighbor_id")]
    if include_dist:
        sel.append(F.round("dist", 6).alias("dist"))
    return out.select(*sel)


# ---------------------------------------------------------------------------
# J2: positive = nearest in-ring neighbor (k=1 degenerate kNN)
# ---------------------------------------------------------------------------

def positive_join(pts: DataFrame, *, id_col: str, emb_col: str,
                  cell_col: str, res: int, dim: int) -> DataFrame:
    """(anchor_id, positive_id): the single nearest in-ring neighbor,
    tie-broken by id (FIXTURES.md triplets_golden schema)."""
    top1 = knn_topk(pts, id_col=id_col, emb_col=emb_col, cell_col=cell_col,
                    res=res, dim=dim, k=1, ring=1, include_dist=False)
    return top1.select(F.col("anchor_id"),
                       F.col("neighbor_id").alias("positive_id"))


# ---------------------------------------------------------------------------
# J4: negative sampling
# ---------------------------------------------------------------------------

def negative_sample_farcell(pts: DataFrame, *, id_col: str, cell_col: str,
                            res: int, n_neg: int = 5, ring: int = 1,
                            seed: int = 42, n_buckets: int = 64) -> DataFrame:
    """Seeded far-cell negatives: for each anchor, ``n_neg`` rows whose cell
    lies OUTSIDE the anchor's k-ring (Chebyshev grid distance > ring, with
    longitude wraparound).

    Scale plan: anchors and candidates are both hashed into ``n_buckets``
    pseudo-random buckets and joined bucket-to-bucket — a uniform 1/B
    sampling join, NOT a cross join; each anchor sees ~N/B candidates.
    Deterministic: bucket assignment and final pick order are integer
    hashes of ids.
    """
    n = 1 << res
    i_a, j_a = cells.cell_i_sql("a_cell"), cells.cell_j_sql("a_cell")
    i_c, j_c = cells.cell_i_sql("c_cell"), cells.cell_j_sql("c_cell")
    # Chebyshev distance with lon wrap
    di = f"ABS({i_a} - {i_c})"
    dlon = f"LEAST({di}, {n} - {di})"
    dlat = f"ABS({j_a} - {j_c})"
    far = f"GREATEST({dlon}, {dlat}) > {ring}"

    a = (pts.select(F.col(id_col).alias("anchor_id"),
                    F.col(cell_col).alias("a_cell"),
                    _id_hash_col(id_col, seed, n_buckets).alias("bkt")))
    c = (pts.select(F.col(id_col).alias("neg_id"),
                    F.col(cell_col).alias("c_cell"),
                    _id_hash_col(id_col, seed + 1, n_buckets).alias("bkt")))
    cand = (a.join(c, "bkt")
             .filter(F.col("anchor_id") != F.col("neg_id"))
             .filter(F.expr(far)))
    order = _id_hash_col("neg_id", seed + 2, 1_000_000_007)
    w = Window.partitionBy("anchor_id").orderBy(order.asc(), "neg_id")
    return (cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= n_neg)
                .select("anchor_id", "rank", "neg_id"))


def _id_hash_col(colname: str, seed: int, mod: int):
    """Portable deterministic hash of an id column -> [0, mod).

    Works for bigint ids directly; string ids go through a stable
    digit-extraction (ids in this engine embed their index: img_00000042).
    """
    e = (f"CAST(REGEXP_REPLACE(CAST({colname} AS STRING), '[^0-9]', '') "
         f"AS BIGINT)")
    return F.expr(_hash_sql(f"COALESCE({e}, 0)", seed, mod))


def negative_sample_compat(pts: DataFrame, *, id_col: str,
                           batch_size: int = 16,
                           seed: int = 42) -> DataFrame:
    """Reference-compat negatives (``data_loading.py:109-112``): order rows
    by id, cut into fixed batches (remainder DROPPED, ``:101-102``), and for
    batch b pair position p with row [r_b + p] where r_b is a seeded offset
    in [0, N - batch_size] — the reference's random contiguous block, made
    deterministic by seeding r_b with a hash of b.

    Output: (anchor_id, neg_id).
    """
    w = Window.orderBy("anchor_id")
    df = pts.select(F.col(id_col).alias("anchor_id")) \
            .withColumn("rn", F.row_number().over(w) - 1)
    total = df.count()
    n_batches = total // batch_size  # remainder drop (W4 compat)
    if n_batches == 0:
        return df.select("anchor_id").limit(0) \
                 .withColumn("neg_id", F.col("anchor_id"))
    hi = total - batch_size + 1
    df = df.filter(F.col("rn") < n_batches * batch_size)
    df = (df.withColumn("b", F.floor(F.col("rn") / batch_size))
            .withColumn("p", F.col("rn") % batch_size)
            .withColumn("r", F.expr(_hash_sql("b", seed, hi)))
            .withColumn("neg_rn", F.col("r") + F.col("p")))
    idx = pts.select(F.col(id_col).alias("neg_id")) \
             .withColumn("neg_rn", F.row_number().over(
                 Window.orderBy("neg_id")) - 1)
    return (df.join(idx, "neg_rn", "inner")
              .select("anchor_id", "neg_id"))


# ---------------------------------------------------------------------------
# full triplet candidate table (E1 re-expressed: J1+J2+J4)
# ---------------------------------------------------------------------------

def triplet_candidates(pts: DataFrame, *, id_col: str, emb_col: str,
                       cell_col: str, res: int, dim: int,
                       n_neg: int = 5, seed: int = 42) -> DataFrame:
    """(anchor_id, cell, positive_id, negative_ids[n_neg]) — the engine's
    parity output for the reference's Tensor_Loader triplet assembly."""
    pos = positive_join(pts, id_col=id_col, emb_col=emb_col,
                        cell_col=cell_col, res=res, dim=dim)
    neg = negative_sample_farcell(pts, id_col=id_col, cell_col=cell_col,
                                  res=res, n_neg=n_neg, seed=seed)
    negs = (neg.groupBy("anchor_id")
               .agg(F.sort_array(F.collect_list(
                   F.struct("rank", "neg_id"))).alias("s"))
               .select("anchor_id",
                       F.col("s.neg_id").alias("negative_ids")))
    anchors = pts.select(F.col(id_col).alias("anchor_id"),
                         F.col(cell_col).alias("cell"))
    return (anchors.join(pos, "anchor_id", "left")
                   .join(negs, "anchor_id", "left"))
