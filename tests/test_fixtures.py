"""Fixture invariants (FIXTURES.md §Invariants)."""

import numpy as np

from loc2vec_spark import fixtures
from loc2vec_spark.png_codec import decode_png, psnr


def test_bit_identical_regeneration():
    a = fixtures.images_pdf(50)
    b = fixtures.images_pdf(50)
    assert a.equals(b)


def test_png_rows_roundtrip_and_caption():
    pdf = fixtures.images_pdf(30)
    for _, row in pdf.iterrows():
        i = int(row.image_id.split("_")[1])
        px = fixtures.row_pixels(i)
        dec = decode_png(row.bytes)
        if row.fmt == "png":
            assert np.array_equal(dec, px)
        else:  # pngq lossy
            assert psnr(px, dec) >= 40.0
        lat, lon = fixtures.row_latlon(i)
        assert row.caption == fixtures.row_caption(i, lat, lon)
        assert f"lat={lat:.6f}" in row.caption


def test_skew_profile():
    """80% of rows in 3 urban disks -> at least one hot res-7 cell."""
    from loc2vec_spark import cells
    pdf = fixtures.images_pdf(500, with_bytes=False)
    lats, lons = zip(*(fixtures.row_latlon(i) for i in range(500)))
    c7 = cells.latlon_to_cell(np.array(lats), np.array(lons), 7)
    _, counts = np.unique(c7, return_counts=True)
    assert counts.max() >= 100  # hot cell exists (salting testable)


def test_channels_table_drops_pairs():
    pdf = fixtures.images_channels_pdf(100)
    n_pairs = len(pdf)
    assert n_pairs < 100 * 12  # ~3% dropped
    assert n_pairs > 100 * 12 * 0.9
    assert set(pdf.channel.unique()) == set(fixtures.CHANNELS)


def test_osm_layers_bbox_consistent():
    pdf = fixtures.osm_layers_pdf(per_disk=20, n_global=10)
    assert len(pdf) == 70
    for _, row in pdf.iterrows():
        xs = [p[0] for p in row.ring]
        ys = [p[1] for p in row.ring]
        assert row.minx == min(xs) and row.maxx == max(xs)
        assert row.miny == min(ys) and row.maxy == max(ys)
        assert 5 <= len(row.ring) <= 12
