"""A6: distributed covariance + PCA projection (partial+final aggregation).

The reference PCA-reduces embeddings to 120 dims before its O(n^2)
distance matrix (``/root/reference/src/loc2vec/optim.py:53-62``, invoked at
``triplet_mining.py:107-110``) via a driver-side ``np.cov`` over the whole
matrix — impossible beyond one node. Here the second-moment matrix is a
classic partial+final aggregation: each Arrow batch contributes
``(n, sum_x, X^T X)`` partials (mapInPandas, numpy), the driver reduces the
tiny per-batch rows and eigendecomposes a dim x dim matrix, and the
projection is a broadcast matmul in a pandas UDF. Driver work is O(dim^2)
regardless of row count — the plan at 10^12 rows is byte-identical.

SQL face for the oracle suite: ``queries.py:a6_cov`` (covariance entries
via exact decimal sums).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def second_moments(df: DataFrame, *, emb_col: str, dim: int) -> tuple:
    """(n, sum_x[dim], xtx[dim, dim]) over all rows — one Spark job.

    Null embeddings are skipped (quarantine semantics: a corrupt row must
    not abort or skew the moment estimates).
    """
    out_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("sum_x", T.ArrayType(T.DoubleType())),
        T.StructField("xtx", T.ArrayType(T.DoubleType())),
    ])

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        m = np.zeros((dim, dim))
        for b in batches:
            col = b[emb_col].dropna()
            if not len(col):
                continue
            x = np.asarray(col.tolist(), dtype=np.float64)
            n += x.shape[0]
            s += x.sum(axis=0)
            m += x.T @ x
        yield pd.DataFrame({"n": [n], "sum_x": [s.tolist()],
                            "xtx": [m.reshape(-1).tolist()]})

    rows = df.select(emb_col).mapInPandas(partials, out_schema).collect()
    n = sum(r["n"] for r in rows)
    s = np.sum([np.array(r["sum_x"]) for r in rows], axis=0)
    m = np.sum([np.array(r["xtx"]).reshape(dim, dim) for r in rows], axis=0)
    return n, s, m


def covariance(df: DataFrame, *, emb_col: str, dim: int) -> np.ndarray:
    """Population covariance matrix (E[xy] - E[x]E[y])."""
    n, s, m = second_moments(df, emb_col=emb_col, dim=dim)
    if n == 0:
        return np.zeros((dim, dim))
    mu = s / n
    return m / n - np.outer(mu, mu)


def pca_components(df: DataFrame, *, emb_col: str, dim: int,
                   k: int) -> np.ndarray:
    """Top-k principal components, rows = components.

    Deterministic sign convention: each component is flipped so its
    largest-|.|-magnitude coordinate is positive (eigh sign is otherwise
    arbitrary and would break run-to-run reproducibility).
    """
    cov = covariance(df, emb_col=emb_col, dim=dim)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    comps = vecs[:, ::-1][:, :k].T            # top-k, rows=components
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps


def pca_project(df: DataFrame, *, id_col: str, emb_col: str, dim: int,
                k: int, out_col: str = "pca") -> DataFrame:
    """Project rows onto the top-k components (optim.py:53-62 parity).

    Two jobs total: the moments pass and the projection pass; the
    components matrix is broadcast (J7 pattern — same as the reference's
    once-loaded weights, loc2vec_run.py:28-31).
    """
    comps = pca_components(df, emb_col=emb_col, dim=dim, k=k)
    bc = df.sparkSession.sparkContext.broadcast(comps)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def project(emb: pd.Series) -> pd.Series:
        c = bc.value
        mask = emb.notna().to_numpy()
        vals = []
        if mask.any():
            x = np.asarray(emb[mask].tolist(), dtype=np.float64)
            vals = (x @ c.T).tolist()
        it = iter(vals)
        return pd.Series([next(it) if ok else None for ok in mask],
                         dtype=object)

    return df.select(F.col(id_col), project(F.col(emb_col)).alias(out_col))
