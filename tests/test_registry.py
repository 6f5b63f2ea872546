"""Driver-window registration-order invariants (no SparkSession).

The round driver records only the first ~50 entries of the registry in
registration order, so the order is part of the driver contract: the 50
contract/pipeline queries must precede the extras under EVERY import
entry point (the circular queries <-> queries_text import makes this
easy to silently invert — review finding r2)."""

import subprocess
import sys

_PROBE = ("import loc2vec_spark.{first}; "
          "import loc2vec_spark.queries as q; "
          "print('\\n'.join(q.QUERIES))")


def _order(first: str) -> list[str]:
    out = subprocess.run(
        [sys.executable, "-c", _PROBE.format(first=first)],
        capture_output=True, text=True, check=True, cwd="/root/repo")
    return out.stdout.strip().splitlines()


def test_order_is_import_order_independent() -> None:
    assert _order("queries") == _order("queries_text")


def test_queries_geo_first_import_does_not_crash() -> None:
    """The third public entry point (review r2: it AttributeError'd via
    the partial-module register_raster call). Its order legitimately
    shifts pip_exact/raster later — the driver enters via queries — but
    the full registry must exist."""
    assert sorted(_order("queries_geo")) == sorted(_order("queries"))


def test_contract_block_precedes_extras() -> None:
    names = _order("queries")
    idx = {n: i for i, n in enumerate(names)}
    extras = ["ann_ivf", "dedup_embedding_ivf", "asof_events",
              "range_events", "events_sliding", "w6_ranks", "a9_cube",
              "a10_multidistinct", "profile_stats", "dist_drift",
              "quadkey_assign",
              "dedup_phash", "zorder_locality", "kmeans_latlon",
              "stratified_sample", "a11_percentiles", "text_pii_scrub",
              "text_repetition", "a12_regression", "vocab_topk", "decontaminate",
              "leakfree_split", "pack_sequences", "mix_sources",
              "doc_rarity", "bm25_score", "dedup_spanfrac",
              "dedup_incremental", "dedup_bloom",
              "geom_stats",
              "traj_stats", "pip_cellcover", "focal_stats", "morans_i",
              "getis_gi", "pagerank_cells", "events_funnel",
              "raster_assembly", "pyramid_rollup"]
    n_contract = len(names) - len(extras)
    # every non-extra (contract/pipeline) query sits in the first block
    for n in names:
        if n not in extras:
            assert idx[n] < n_contract, (n, idx[n])
    # extras keep their documented internal order, after the block
    assert [n for n in names if n in extras] == extras
    assert idx["ann_ivf"] == n_contract
