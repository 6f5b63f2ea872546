"""Deterministic synthetic fixtures (FIXTURES.md) — seed 42, no external data.

Generates the engine's primary input tables at small scale:

- ``images``          — BASELINE.json:input_hint shape, exactly
- ``images_channels`` — reference directory-as-table layout (D1/D4,
  ``/root/reference/src/loc2vec/data_loading.py:138-214``)
- ``osm_layers``      — vector polygon table for the PIP join (J6)

Every row is regenerable independently from its index (PCG64(seed + i)), so
fixtures are bit-identical across runs and machines — this replaces the
reference's unseeded ``random`` (``data_loading.py:111``,
``triplet_mining.py:147``) with the engine's determinism contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .png_codec import encode_png, encode_pngq

SEED = 42

URBAN_CENTERS = [
    (51.5074, -0.1278),    # London
    (40.7128, -74.0060),   # New York
    (35.6762, 139.6503),   # Tokyo
]
URBAN_RADIUS_DEG = 0.05

ADJS = ["quiet", "busy", "green", "gray", "old", "new", "wide", "narrow",
        "wet", "dry", "steep", "flat", "dense", "sparse", "bright", "dark"]
NOUNS = ["street", "river", "park", "yard", "station", "bridge", "block",
         "market", "harbor", "field", "tower", "alley", "square", "depot",
         "garden", "mill"]

CHANNELS = [  # /root/reference/README.md:9-25, config.toml:4 (12 channels)
    "roads_major", "roads_other", "rails", "greenspace", "water",
    "industrial", "railway_land", "residential", "commercial", "retail",
    "misc_land", "buildings",
]


def mix64(x: int) -> int:
    """splitmix64 finalizer — stable integer hash, no library dep.

    Used for ``phash`` and anywhere a seeded per-row integer is needed.
    """
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def phash_of(i: int) -> int:
    """Signed-int64 view of mix64(i) (parquet/Spark long)."""
    h = mix64(i)
    return h - (1 << 64) if h >= (1 << 63) else h


def row_latlon(i: int) -> tuple[float, float]:
    """True (pre-jitter) location of row i. 80% urban-disk clustered
    (skew source, FIXTURES.md), 20% global uniform."""
    rng = np.random.Generator(np.random.PCG64(SEED + i))
    if i % 5 < 4:
        clat, clon = URBAN_CENTERS[i % 3]
        r = URBAN_RADIUS_DEG * np.sqrt(rng.uniform())
        theta = rng.uniform(0.0, 2.0 * np.pi)
        return clat + r * np.sin(theta), clon + r * np.cos(theta)
    return rng.uniform(-60.0, 60.0), rng.uniform(-180.0, 180.0)


def row_caption(i: int, lat: float, lon: float) -> str:
    rng = np.random.Generator(np.random.PCG64(SEED * 1000 + i))
    adj = ADJS[int(rng.integers(16))]
    noun = NOUNS[int(rng.integers(16))]
    return f"tile at lat={lat:.6f} lon={lon:.6f}; {adj} {noun}"


def row_pixels(i: int, h: int = 64, w: int = 64) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(SEED + 10_000_000 + i))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def images_pdf(n: int, with_bytes: bool = True,
               bytes_sample_mod: int = 1) -> pd.DataFrame:
    """The ``images`` table as pandas (callers write it to parquet).

    ``bytes_sample_mod=m`` keeps bytes only for i % m == 0 (bench mode —
    FIXTURES.md sf_bench nulls bytes except a sample)."""
    rows = []
    for i in range(n):
        lat, lon = row_latlon(i)
        fmt = "pngq" if i % 10 == 0 else "png"
        data = None
        if with_bytes and i % bytes_sample_mod == 0:
            px = row_pixels(i)
            data = encode_pngq(px) if fmt == "pngq" else encode_png(px)
        rows.append({
            "image_id": f"img_{i:08d}",
            "bytes": data,
            "w": np.int32(64),
            "h": np.int32(64),
            "fmt": fmt,
            "caption": row_caption(i, lat, lon),
            "phash": np.int64(phash_of(i)),
        })
    pdf = pd.DataFrame(rows)
    pdf["w"] = pdf["w"].astype("int32")
    pdf["h"] = pdf["h"].astype("int32")
    pdf["phash"] = pdf["phash"].astype("int64")
    return pdf


def images_channels_pdf(n: int, drop_rate: float = 0.03) -> pd.DataFrame:
    """Tall per-channel raster rows; ~3% of (image, channel) pairs dropped
    (PCG64(SEED+1)) to exercise the semi/anti-join squeeze (J3) and the
    equal-cardinality check (P5)."""
    rng = np.random.Generator(np.random.PCG64(SEED + 1))
    keep = rng.uniform(size=(n, len(CHANNELS))) >= drop_rate
    rows = []
    for i in range(n):
        for c, ch in enumerate(CHANNELS):
            if not keep[i, c]:
                continue
            crng = np.random.Generator(
                np.random.PCG64(SEED + 7919 * (c + 1) + i))
            px = crng.integers(0, 256, size=(16, 16), dtype=np.uint8)
            rows.append({"image_id": f"img_{i:08d}", "channel": ch,
                         "bytes": encode_png(px)})
    return pd.DataFrame(rows)


def osm_layers_pdf(per_disk: int = 200, n_global: int = 100) -> pd.DataFrame:
    """Convex-ish polygons: ``per_disk`` around each urban center plus
    ``n_global`` spread worldwide. Precomputed bbox enables the
    SQL-expressible containment oracle for the R-tree PIP join (J6)."""
    rows = []
    m_total = per_disk * len(URBAN_CENTERS) + n_global
    for m in range(m_total):
        rng = np.random.Generator(np.random.PCG64(SEED + 100000 + m))
        if m < per_disk * len(URBAN_CENTERS):
            clat, clon = URBAN_CENTERS[m // per_disk]
            clat += rng.uniform(-0.04, 0.04)
            clon += rng.uniform(-0.04, 0.04)
            radius = rng.uniform(0.002, 0.02)
        else:
            clat = rng.uniform(-60.0, 60.0)
            clon = rng.uniform(-179.0, 179.0)
            radius = rng.uniform(0.1, 1.5)
        nv = int(rng.integers(5, 13))
        angles = np.sort(rng.uniform(0.0, 2.0 * np.pi, size=nv))
        radii = radius * rng.uniform(0.6, 1.0, size=nv)
        ys = clat + radii * np.sin(angles)
        xs = clon + radii * np.cos(angles)
        ring = [[float(x), float(y)] for x, y in zip(xs, ys)]
        rows.append({
            "layer_id": np.int64(m),
            "channel": CHANNELS[m % len(CHANNELS)],
            "kind": CHANNELS[m % len(CHANNELS)].split("_")[0],
            "ring": ring,
            "minx": float(xs.min()), "miny": float(ys.min()),
            "maxx": float(xs.max()), "maxy": float(ys.max()),
        })
    pdf = pd.DataFrame(rows)
    pdf["layer_id"] = pdf["layer_id"].astype("int64")
    return pdf


def _write_images_shard(job: tuple) -> None:
    """Write rows [lo, hi) of the images table to one parquet part file.

    Row i is generated purely from its index (PCG64(seed+i)), so shards
    are independent and parallel generation is bit-identical to serial.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    lo, hi, bytes_sample_mod, path = job
    rows = []
    for i in range(lo, hi):
        lat, lon = row_latlon(i)
        fmt = "pngq" if i % 10 == 0 else "png"
        data = None
        if i % bytes_sample_mod == 0:
            px = row_pixels(i)
            data = encode_pngq(px) if fmt == "pngq" else encode_png(px)
        rows.append({
            "image_id": f"img_{i:08d}", "bytes": data,
            "w": np.int32(64), "h": np.int32(64), "fmt": fmt,
            "caption": row_caption(i, lat, lon),
            "phash": np.int64(phash_of(i)),
        })
    pdf = pd.DataFrame(rows)
    schema = pa.schema([
        ("image_id", pa.string()), ("bytes", pa.binary()),
        ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
        ("caption", pa.string()), ("phash", pa.int64()),
    ])
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema,
                                        preserve_index=False),
                   path, row_group_size=4096)


def write_fixtures(out_dir: str, n_images: int = 1000,
                   with_channels: bool = True,
                   bytes_sample_mod: int = 1,
                   n_shards: int | None = None) -> None:
    """Write all fixture tables as parquet under ``out_dir``.

    ``images.parquet`` is a DIRECTORY of ``n_shards`` part files: Spark
    assigns scan splits per file (and only at row-group boundaries within
    one), so a single monolithic file = one scan task = zero scan
    parallelism (measured: it inverted the 8->32-core scaling bench).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    if n_shards is None:
        n_shards = min(32, max(1, n_images // 2000))
    img_dir = os.path.join(out_dir, "images.parquet")
    os.makedirs(img_dir, exist_ok=True)
    per = (n_images + n_shards - 1) // n_shards
    jobs = [(s * per, min((s + 1) * per, n_images), bytes_sample_mod,
             os.path.join(img_dir, f"part-{s:05d}.parquet"))
            for s in range(n_shards) if s * per < n_images]
    if n_shards > 1 and n_images >= 50_000:
        import multiprocessing as mp
        with mp.Pool(min(16, len(jobs))) as pool:
            pool.map(_write_images_shard, jobs)
    else:
        for j in jobs:
            _write_images_shard(j)
    if with_channels:
        ch = images_channels_pdf(min(n_images, 2000))
        pq.write_table(pa.Table.from_pandas(ch, preserve_index=False),
                       os.path.join(out_dir, "images_channels.parquet"))
    osm = osm_layers_pdf()
    pq.write_table(pa.Table.from_pandas(osm, preserve_index=False),
                   os.path.join(out_dir, "osm_layers.parquet"))
