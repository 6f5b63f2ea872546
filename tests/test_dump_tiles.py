"""S9 debug sink: seeded per-cell tile sampling + PNG dump (was
smoke-only in round 1 — now pytest-verified)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from dump_tiles import dump, sample_tiles  # noqa: E402

from loc2vec_spark.png_codec import decode_png  # noqa: E402


@pytest.fixture(scope="module")
def images(spark, fixture_dir):
    # unpersist on teardown: the shared-session cache otherwise substitutes
    # into OTHER modules' reads of the same parquet (cache substitution is
    # plan-level), turning their pruned parquet scans into full-width
    # InMemoryTableScans and breaking test_geo's ReadSchema pruning assert
    df = spark.read.parquet(
        os.path.join(fixture_dir, "images.parquet")).cache()
    yield df
    df.unpersist()


def test_sampling_is_seeded_and_capped(spark, images):
    a = sample_tiles(images, k=2).collect()
    b = sample_tiles(images, k=2).collect()
    assert sorted(r["image_id"] for r in a) \
        == sorted(r["image_id"] for r in b)  # deterministic pick
    per_cell = {}
    for r in a:
        per_cell[r["cell"]] = per_cell.get(r["cell"], 0) + 1
    assert per_cell and max(per_cell.values()) <= 2
    # a different seed picks a (generally) different sample
    c = sample_tiles(images, k=2, seed=7).collect()
    assert {r["image_id"] for r in c} != {r["image_id"] for r in a}


def test_dump_writes_decodable_pngs_and_index(spark, images, tmp_path):
    out = str(tmp_path / "tiles")
    stats = dump(images, out, k=2)
    assert stats["tiles"] > 0 and stats["cells"] > 0
    index = json.load(open(os.path.join(out, "index.json")))
    assert len(index) == stats["tiles"]
    for entry in index[:5]:
        arr = decode_png(open(entry["path"], "rb").read())
        assert list(arr.shape) == entry["shape"]
        assert entry["path"].endswith(f"{entry['image_id']}.png")
