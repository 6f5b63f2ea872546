"""EXIF GPS/orientation extraction — the real-world location source.

The engine's location identity derives from captions
(``operators/geo.with_latlon``, mirroring the reference's
filename-parsed identity, ``loc2vec_run.py:26-27``); real photo corpora
carry the location in EXIF APP1 GPS tags instead. This module writes
and parses that container shape with pure stdlib ``struct`` walks:

- :func:`build_exif_app1` — an APP1 segment (Exif\\0\\0 + TIFF) with
  IFD0 orientation/DateTime and a GPS sub-IFD (lat/lon refs +
  3-rational coordinates), in either byte order.
- :func:`splice_app1` — insert the segment after an existing JPEG's
  SOI (the canonical APP1 position).
- :func:`parse_exif` — bounded segment walk + TIFF/IFD parse with the
  media decoders' quarantine contract: every offset and count is
  validated against the APP1 payload before any slice, corrupt input
  raises ValueError (never a crash, never unbounded allocation).
- :func:`exif_gps_df` — the Arrow-batched extraction operator:
  (id, bytes) -> (id, lat, lon, orientation, datetime, ok, err), one
  mapInPandas crossing, dead-letter rows inline (ok=false + err).

Driver face ``exif_gps`` (queries_geo.py): planted integer
micro-degree GPS rationals round-trip through the REAL writer + parser
and hash-match a pure-SQL derivation of the same integers.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T

_MAX_APP1 = 1 << 16  # APP1 length field is 16-bit; hard bound

# TIFF tag ids
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_GPS_IFD = 0x8825
_GPS_LAT_REF, _GPS_LAT = 0x0001, 0x0002
_GPS_LON_REF, _GPS_LON = 0x0003, 0x0004

# TIFF field types: (id, byte size per value)
_SHORT, _LONG, _ASCII, _RATIONAL = 3, 4, 2, 5
_TYPE_SIZE = {_SHORT: 2, _LONG: 4, _ASCII: 1, _RATIONAL: 8}


def _rationals(value_e6: int) -> list[tuple[int, int]]:
    """Unsigned micro-degrees -> the 3-slot (deg, min, sec) rational
    list, planted exactly: degrees carry the full value at denominator
    10^6, minutes/seconds are 0/1 — legal EXIF (any denominator) and
    integer-exact on the way back."""
    return [(value_e6, 1_000_000), (0, 1), (0, 1)]


def build_exif_app1(lat_e6: int, lon_e6: int, *, orientation: int = 1,
                    datetime_str: str = "2024:01:01 00:00:00",
                    byte_order: str = "II") -> bytes:
    """APP1 bytes (marker + length + Exif\\0\\0 + TIFF) carrying GPS
    micro-degrees, orientation, and DateTime. ``byte_order`` is the
    TIFF endianness ("II" little, "MM" big) — both occur in the wild
    and the parser handles both."""
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    e = "<" if byte_order == "II" else ">"
    dt = (datetime_str.encode("ascii") + b"\x00")[:20].ljust(20, b"\x00")

    def entry(tag: int, typ: int, count: int, value: bytes) -> bytes:
        if len(value) <= 4:
            return struct.pack(f"{e}HHI", tag, typ, count) \
                + value.ljust(4, b"\x00")
        raise AssertionError("inline entry > 4 bytes")

    def entry_off(tag: int, typ: int, count: int, off: int) -> bytes:
        return struct.pack(f"{e}HHII", tag, typ, count, off)

    # layout (offsets from TIFF start): header 8, IFD0 at 8 with 3
    # entries (2 + 3*12 + 4 = 42 bytes -> ends 50), DateTime data at
    # 50 (20 bytes -> 70), GPS IFD at 70 with 4 entries (2 + 4*12 + 4
    # = 54 -> ends 124), lat rationals at 124 (24), lon at 148 (24).
    ifd0_off, dt_off, gps_off = 8, 50, 70
    lat_off, lon_off = 124, 148

    tiff = bytearray()
    tiff += byte_order.encode() + struct.pack(f"{e}HI", 42, ifd0_off)
    tiff += struct.pack(f"{e}H", 3)
    tiff += entry(_TAG_ORIENTATION, _SHORT, 1,
                  struct.pack(f"{e}H", orientation))
    tiff += entry_off(_TAG_DATETIME, _ASCII, 20, dt_off)
    tiff += entry_off(_TAG_GPS_IFD, _LONG, 1, gps_off)
    tiff += struct.pack(f"{e}I", 0)          # no next IFD
    assert len(tiff) == dt_off
    tiff += dt
    assert len(tiff) == gps_off
    tiff += struct.pack(f"{e}H", 4)
    tiff += entry(_GPS_LAT_REF, _ASCII, 2,
                  (b"N\x00" if lat_e6 >= 0 else b"S\x00"))
    tiff += entry_off(_GPS_LAT, _RATIONAL, 3, lat_off)
    tiff += entry(_GPS_LON_REF, _ASCII, 2,
                  (b"E\x00" if lon_e6 >= 0 else b"W\x00"))
    tiff += entry_off(_GPS_LON, _RATIONAL, 3, lon_off)
    tiff += struct.pack(f"{e}I", 0)
    assert len(tiff) == lat_off
    for num, den in _rationals(abs(lat_e6)) + _rationals(abs(lon_e6)):
        tiff += struct.pack(f"{e}II", num, den)
    payload = b"Exif\x00\x00" + bytes(tiff)
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def splice_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI (the EXIF position)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


def _walk_to_app1(data: bytes) -> bytes | None:
    """JPEG segment walk to the first Exif APP1 payload (after the
    Exif\\0\\0 prefix); None when absent. Bounded: every segment
    length is checked against the buffer before the jump."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # ISO/IEC 10918-1 B.1.1.2: any number of 0xFF fill bytes may
        # precede a marker — skip them (decode_jpeg does the same)
        while data[pos + 1] == 0xFF:
            pos += 1
            if pos + 4 > len(data):
                return None
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:        # SOS — entropy data; EXIF must precede
            return None
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        if seglen < 2 or pos + 2 + seglen > len(data):
            raise ValueError("segment length overruns the file")
        if marker == 0xE1 and data[pos + 4:pos + 10] == b"Exif\x00\x00":
            return data[pos + 10:pos + 2 + seglen]
        pos += 2 + seglen
    return None


class _Tiff:
    """Bounded TIFF reader over the APP1 payload."""

    def __init__(self, buf: bytes):
        if len(buf) > _MAX_APP1:
            raise ValueError("APP1 payload exceeds the 16-bit bound")
        if len(buf) < 8:
            raise ValueError("TIFF header truncated")
        order = buf[:2]
        if order == b"II":
            self.e = "<"
        elif order == b"MM":
            self.e = ">"
        else:
            raise ValueError(f"bad TIFF byte order {order!r}")
        self.buf = buf
        magic, self.ifd0 = struct.unpack(self.e + "HI", buf[2:8])
        if magic != 42:
            raise ValueError(f"bad TIFF magic {magic}")

    def read(self, off: int, n: int) -> bytes:
        if off < 0 or off + n > len(self.buf):
            raise ValueError("TIFF offset overruns the APP1 payload")
        return self.buf[off:off + n]

    def ifd(self, off: int) -> dict[int, tuple[int, int, bytes]]:
        (n,) = struct.unpack(self.e + "H", self.read(off, 2))
        if n > 256:
            raise ValueError(f"IFD entry count {n} implausible")
        out = {}
        for i in range(n):
            ent = self.read(off + 2 + 12 * i, 12)
            tag, typ, cnt = struct.unpack(self.e + "HHI", ent[:8])
            size = _TYPE_SIZE.get(typ, 1) * cnt
            if size > _MAX_APP1:
                raise ValueError("IFD value size implausible")
            if size <= 4:
                val = ent[8:8 + max(size, 1)]
            else:
                (voff,) = struct.unpack(self.e + "I", ent[8:12])
                val = self.read(voff, size)
            out[tag] = (typ, cnt, val)
        return out

    def rationals(self, raw: bytes, cnt: int) -> list[tuple[int, int]]:
        return [struct.unpack(self.e + "II", raw[8 * i:8 * i + 8])
                for i in range(cnt)]


def _dms_to_degrees(rats: list[tuple[int, int]]) -> float:
    scale = [1.0, 60.0, 3600.0]
    total = 0.0
    for (num, den), s in zip(rats[:3], scale):
        if den == 0:
            raise ValueError("zero-denominator GPS rational")
        total += num / den / s
    return total


def parse_exif(data: bytes) -> dict:
    """JPEG bytes -> {orientation, datetime, lat, lon} (any field None
    when absent). lat/lon are signed float degrees (ref-applied).
    Raises ValueError on corrupt structure — the quarantine contract
    shared with the other media probes (struct.error from a mutated
    type/count field that shrinks an inline value below its read size
    is converted at this boundary; found by the mutation fuzz)."""
    try:
        return _parse_exif_inner(data)
    except struct.error as ex:
        raise ValueError(f"truncated TIFF field: {ex}") from ex


def _parse_exif_inner(data: bytes) -> dict:
    payload = _walk_to_app1(data)
    out = {"orientation": None, "datetime": None,
           "lat": None, "lon": None}
    if payload is None:
        return out
    t = _Tiff(payload)
    ifd0 = t.ifd(t.ifd0)
    if _TAG_ORIENTATION in ifd0:
        # tolerate the LONG-typed orientation some writers emit; any
        # other type degrades to None rather than aborting the record
        # (the GPS payload on the same record is still valuable)
        typ, _, val = ifd0[_TAG_ORIENTATION]
        if typ == _SHORT:
            out["orientation"] = struct.unpack(t.e + "H", val[:2])[0]
        elif typ == _LONG:
            out["orientation"] = struct.unpack(t.e + "I", val[:4])[0]
    if _TAG_DATETIME in ifd0:
        _, _, val = ifd0[_TAG_DATETIME]
        out["datetime"] = val.split(b"\x00")[0].decode(
            "ascii", errors="replace")
    if _TAG_GPS_IFD in ifd0:
        (gps_off,) = struct.unpack(t.e + "I", ifd0[_TAG_GPS_IFD][2][:4])
        gps = t.ifd(gps_off)
        if _GPS_LAT in gps and _GPS_LON in gps:
            typ, cnt, raw = gps[_GPS_LAT]
            if typ != _RATIONAL or cnt < 3:
                raise ValueError("GPS latitude is not 3 rationals")
            lat = _dms_to_degrees(t.rationals(raw, 3))
            typ, cnt, raw = gps[_GPS_LON]
            if typ != _RATIONAL or cnt < 3:
                raise ValueError("GPS longitude is not 3 rationals")
            lon = _dms_to_degrees(t.rationals(raw, 3))
            if _GPS_LAT_REF in gps and \
                    gps[_GPS_LAT_REF][2][:1] == b"S":
                lat = -lat
            if _GPS_LON_REF in gps and \
                    gps[_GPS_LON_REF][2][:1] == b"W":
                lon = -lon
            out["lat"], out["lon"] = lat, lon
    return out


EXIF_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("lat", T.DoubleType()),
    T.StructField("lon", T.DoubleType()),
    T.StructField("orientation", T.IntegerType()),
    T.StructField("datetime", T.StringType()),
    T.StructField("ok", T.BooleanType()),
    T.StructField("err", T.StringType()),
])


def exif_gps_df(images: DataFrame, bytes_col: str = "bytes",
                id_col: str = "image_id") -> DataFrame:
    """(id, jpeg bytes) -> EXIF GPS/orientation rows, one Arrow
    crossing, corrupt rows dead-lettered inline (ok=false, err set) —
    feed the ok rows into ``geo.with_cells`` for EXIF-driven tiling."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    if data is None:
                        raise ValueError("NULL bytes")
                    r = parse_exif(bytes(data))
                    rows.append((str(iid), r["lat"], r["lon"],
                                 r["orientation"], r["datetime"],
                                 True, None))
                except ValueError as ex:
                    rows.append((str(iid), None, None, None, None,
                                 False, str(ex)[:200]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in EXIF_SCHEMA.fields])

    return images.select(id_col, bytes_col).mapInPandas(gen, EXIF_SCHEMA)
