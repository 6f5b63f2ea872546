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
    z-order bounds the unprunable fraction on either dimension."""
    zpath = str(tmp_path / "z")
    storage.zorder_by(grid, "ci", "cj", bits=8, n_files=16) \
        .write.parquet(zpath)
    spath = str(tmp_path / "s")  # 1-D layout: range-sorted by ci only
    grid.repartitionByRange(16, "ci").sortWithinPartitions("ci") \
        .write.parquet(spath)

    # lossless reorganization
    assert spark.read.parquet(zpath).count() == grid.count()

    zb, sb = _file_bboxes(spark, zpath), _file_bboxes(spark, spath)
    assert len(zb) >= 8 and len(sb) >= 8
    FULL, PROBE = (0, 255), (100, 131)

    # the 1-D layout's failure mode: a cj-only probe scans EVERY file
    assert _hits(sb, FULL, PROBE) == len(sb)
    # z-order: either single-dimension probe prunes a real fraction.
    # Margins allow +-1-2 files of boundary jitter: repartitionByRange
    # SAMPLES its range boundaries with a seed derived from the RDD id,
    # i.e. from how many RDDs the shared session created before this
    # test — a session-history dependence that shifted splits off the
    # quadrant seams when unrelated tests ran first (12/16 observed vs
    # 11/16 solo). The 1-D contrast above stays exact (16/16 unpruned).
    assert _hits(zb, PROBE, FULL) <= 0.8 * len(zb)
    assert _hits(zb, FULL, PROBE) <= 0.8 * len(zb)
    # and a 2-D probe (the k-ring / bbox scan shape) still prunes a
    # sizeable fraction — (100,131) deliberately straddles the Z
    # curve's top-level quadrant seam at 128, its worst alignment
    # (6/16 solo, up to 9/16 observed under full-suite RDD-id history
    # — the same seed dependence as the note above); a
    # quadrant-interior probe prunes far more
    assert _hits(zb, PROBE, PROBE) <= 0.65 * len(zb)
    assert _hits(zb, (64, 95), (64, 95)) <= 0.45 * len(zb)


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
