"""Sequence packing for training-corpus preparation.

``pack_greedy`` bins documents into fixed token-budget "packs" (context
windows) — the standard LLM-pretraining packing step that turns a
variable-length corpus into dense training sequences. The fold is
inherently sequential per shard (each pack boundary depends on the
running total), so it cannot be a window expression; it runs as ONE
``applyInPandas`` over seeded hash shards:

- shard assignment is a rowwise hash (embarrassingly parallel, no
  skew: shards are uniform by construction), so the only shuffle is
  the groupBy(shard) exchange;
- within a shard the greedy fold is a small Python loop over the
  Arrow-delivered batch — bounded work because the CALLER sizes the
  shard count to the data (rows/shard stays O(budgeted), exactly like
  percell_cap bounds kNN candidate lists);
- the output is deterministic at any parallelism: shard and order
  (id ascending) are pure functions of the row.

Semantics (mirrored exactly by the recursive-CTE oracle in
queries_corpus.py): rows are taken in ascending id order per shard;
the first row opens pack 0 with its own token count; each later row
joins the current pack unless that would exceed ``budget``, in which
case it opens the next pack. An oversize row (n_tokens > budget)
therefore always sits in a pack of its own — no special case needed
in either engine.

The reference has no packing stage (it trains on fixed-size image
tiles); this operator is part of the task brief's training-data
pipeline surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def pack_greedy(df: DataFrame, *, id_col: str, tokens_col: str,
                shard_col: str, budget: int) -> DataFrame:
    """Greedy token-budget packing per shard.

    ``df`` must carry ``id_col`` (orderable), ``tokens_col`` (int64)
    and ``shard_col`` (int). Returns the input columns plus
    ``pack_id`` (0-based per shard) and ``pack_pos`` (1-based within
    pack).
    """
    out_schema = T.StructType(
        list(df.select(id_col, shard_col, tokens_col).schema)
        + [T.StructField("pack_id", T.LongType()),
           T.StructField("pack_pos", T.LongType())])

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf[tokens_col].isna().any():
            # NULL token counts (e.g. NULL text upstream) have no
            # defined pack; fail loudly with the cause instead of an
            # opaque NaN->int cast error inside the Arrow worker
            raise ValueError(
                f"pack_greedy: NULL {tokens_col} in shard "
                f"{pdf[shard_col].iloc[0]!r}; filter or impute before "
                "packing")
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(
            drop=True)
        packs, poss = [], []
        cum, pack, pos = 0, 0, 0
        for nt in pdf[tokens_col]:
            nt = int(nt)
            if pos > 0 and cum + nt > budget:
                pack += 1
                cum, pos = nt, 1
            else:
                cum += nt
                pos += 1
            packs.append(pack)
            poss.append(pos)
        pdf = pdf[[id_col, shard_col, tokens_col]].copy()
        pdf["pack_id"] = pd.Series(packs, dtype="int64")
        pdf["pack_pos"] = pd.Series(poss, dtype="int64")
        return pdf

    return (df.select(id_col, shard_col, tokens_col)
              .groupBy(shard_col).applyInPandas(fold, out_schema))
