"""Z-order clustering: file-level locality beats a 1-D sort layout.

The claim data skipping rests on: after ``storage.zorder_by``, each
parquet file's (ci, cj) min/max bounding box is compact, so a 2-D range
predicate prunes most files via footer stats. A lat-sorted layout has
tight ci bounds but full-width cj bounds — prunes nothing on the second
dimension.
"""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from loc2vec_spark import storage
from loc2vec_spark.functions import morton_sql


@pytest.fixture(scope="module")
def grid(spark):
    rng = np.random.Generator(np.random.PCG64(3))
    n = 20_000
    pdf = pd.DataFrame({
        "ci": rng.integers(0, 256, n).astype("int64"),
        "cj": rng.integers(0, 256, n).astype("int64"),
    })
    pdf["row_id"] = pdf.index.astype("int64")
    return spark.createDataFrame(pdf)


def _file_bboxes(spark, path):
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        pdf = pd.read_parquet(f, columns=["ci", "cj"])
        if len(pdf):
            out.append((pdf.ci.min(), pdf.ci.max(),
                        pdf.cj.min(), pdf.cj.max()))
    return out


def _hits(bboxes, ci_rng, cj_rng):
    """Files a (ci, cj) range predicate cannot prune via min/max stats."""
    (a0, a1), (b0, b1) = ci_rng, cj_rng
    return sum(1 for ci0, ci1, cj0, cj1 in bboxes
               if not (ci1 < a0 or ci0 > a1 or cj1 < b0 or cj0 > b1))


def test_zorder_prunes_on_both_dimensions(spark, grid, tmp_path):
    """The z-order claim is BALANCED pruning: a 1-D ci-sort layout
    prunes ci probes perfectly but a cj-only predicate hits every file;
    z-order bounds the unprunable fraction on either dimension.

    With the deterministic layout (fixed z-range buckets, bijective
    partition routing — no sampled boundaries, no RDD-id seed, no
    session-history dependence), 16 files over an 8-bit grid are the 16
    EXACT 64x64 Morton quadrants, so every prune count below is an
    exact equality, not a jittery margin (VERDICT r3 item 2: the old
    repartitionByRange layout failed 1-in-2 full-suite runs)."""
    zpath = str(tmp_path / "z")
    storage.zorder_by(grid, "ci", "cj", bits=8, n_files=16) \
        .write.parquet(zpath)
    spath = str(tmp_path / "s")  # 1-D layout: range-sorted by ci only
    grid.repartitionByRange(16, "ci").sortWithinPartitions("ci") \
        .write.parquet(spath)

    # lossless reorganization
    assert spark.read.parquet(zpath).count() == grid.count()

    zb, sb = _file_bboxes(spark, zpath), _file_bboxes(spark, spath)
    assert len(sb) >= 8
    FULL, PROBE = (0, 255), (100, 131)

    # the 1-D layout's failure mode: a cj-only probe scans EVERY file
    assert _hits(sb, FULL, PROBE) == len(sb)

    # deterministic z-order: exactly 16 files, each an exact 64x64
    # quadrant (bucket = z >> 12, z-aligned blocks of 2^12 = squares)
    assert len(zb) == 16
    assert sorted(zb) == sorted(
        (ci0, ci0 + 63, cj0, cj0 + 63)
        for ci0 in (0, 64, 128, 192) for cj0 in (0, 64, 128, 192))
    # PROBE ci-range [100,131] straddles the 128 seam: 2 of 4 ci-bands
    # x 4 cj-bands = 8 files; same for the cj-only probe
    assert _hits(zb, PROBE, FULL) == 8
    assert _hits(zb, FULL, PROBE) == 8
    # 2-D probe (k-ring / bbox shape) at the worst seam alignment: 2x2
    assert _hits(zb, PROBE, PROBE) == 4
    # quadrant-interior probe: exactly 1 file survives
    assert _hits(zb, (64, 95), (64, 95)) == 1


def test_zorder_layout_deterministic_across_sessions(spark, grid,
                                                     tmp_path):
    """Reproducible-layout claim (SURVEY §7.0): two writes of the same
    data — after unrelated jobs have shifted the session's RDD-id
    history — produce identical file->rowset layouts."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    storage.zorder_by(grid, "ci", "cj", bits=8, n_files=16) \
        .write.parquet(a)
    spark.range(1000).selectExpr("sum(id)").collect()  # perturb RDD ids
    storage.zorder_by(grid, "ci", "cj", bits=8, n_files=16) \
        .write.parquet(b)

    def layout(path):
        out = {}
        for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
            pdf = pd.read_parquet(f, columns=["ci", "cj", "row_id"])
            key = (pdf.ci.min(), pdf.cj.min())
            out[key] = sorted(pdf.row_id.tolist())
        return out

    assert layout(a) == layout(b)


def test_morton_expression_matches_numpy(spark, grid):
    got = spark.createDataFrame(pd.DataFrame({"i": [0, 1, 2, 255],
                                              "j": [0, 3, 2, 255]})) \
        .selectExpr("i", "j", f"{morton_sql('i', 'j', 8)} AS z") \
        .toPandas().sort_values(["i", "j"]).reset_index(drop=True)

    def morton(i, j):
        z = 0
        for b in range(8):
            z |= ((i >> b) & 1) << (2 * b + 1)
            z |= ((j >> b) & 1) << (2 * b)
        return z

    for r in got.itertuples():
        assert r.z == morton(r.i, r.j), (r.i, r.j)


def test_zorder_bucket_overflow_refused(spark, grid):
    """2*bits + log2(n_files) past 63 bits would wrap z*n_files negative
    and silently route rows through end-of-array element_at reads
    (review r4) — the function must refuse loudly instead."""
    from loc2vec_spark.storage import zorder_by

    with pytest.raises(ValueError, match="overflows"):
        zorder_by(grid, "ci", "cj", bits=30, n_files=32)
    # the documented operating envelope still works
    assert zorder_by(grid, "ci", "cj", bits=8, n_files=16).count() > 0
