"""WKT / GeoJSON polygon ingestion for the PIP join (geo source face).

The reference consumes OSM polygon layers prepared offline
(``/root/reference/README.md:9-25``); real OSM extracts arrive as WKT or
GeoJSON text. These parsers convert either format into the engine's
``osm_layers`` table shape — one row per outer ring with bbox columns —
which feeds :func:`loc2vec_spark.operators.pip.pack_polygons` directly.
Pure python/numpy, no geo libraries (none exist in this sandbox, and at
the polygon side's scale — the driver-collected broadcast side — a
dependency buys nothing).

Coordinate convention matches PIP and both specs: x = lon, y = lat.

Scope, stated plainly:
- POLYGON and MULTIPOLYGON (each part becomes its own row sharing
  layer_id; PIP "point in layer" then means "in any part", with a
  DISTINCT on (point, layer) downstream if one match row per layer is
  required).
- Interior rings (holes) are REJECTED with a clear error, not silently
  dropped: the packed ray-cast tests one ring per row, so a hole would
  need grouped even-odd parity across rows — a real feature, not a
  parsing detail to paper over.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd

_WKT_RE = re.compile(r"\s*(POLYGON|MULTIPOLYGON)\s*(.*)\s*$",
                     re.IGNORECASE | re.DOTALL)


def _parse_ring(txt: str) -> list[list[float]]:
    pts = []
    for pair in txt.split(","):
        xy = pair.split()
        if len(xy) != 2:
            raise ValueError(f"bad WKT coordinate pair {pair!r}")
        pts.append([float(xy[0]), float(xy[1])])
    if len(pts) < 4 or pts[0] != pts[-1]:
        raise ValueError("WKT ring must be closed with >= 4 points")
    return pts


def _split_groups(body: str) -> list[str]:
    """Split a parenthesized WKT body into top-level groups."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                groups.append(body[start:i])
    if depth != 0:
        raise ValueError("unbalanced parentheses in WKT")
    return groups


def parse_wkt(wkt: str) -> list[list[list[float]]]:
    """WKT POLYGON/MULTIPOLYGON -> list of outer rings [[x, y], ...]."""
    m = _WKT_RE.match(wkt)
    if not m:
        raise ValueError(f"unsupported WKT geometry: {wkt[:40]!r}")
    kind, body = m.group(1).upper(), m.group(2).strip()
    # EMPTY geometries (real OSM extracts contain them) and any body not
    # wrapped in parens raise the documented loud error, not IndexError
    if not body.startswith("("):
        raise ValueError(f"empty or malformed {kind} body: {body[:20]!r}")
    if kind == "POLYGON":
        rings = _split_groups(body[1:-1])
        if not rings:
            raise ValueError("POLYGON with no rings")
        if len(rings) > 1:
            raise ValueError("polygon holes are not supported (see "
                             "module docstring)")
        return [_parse_ring(rings[0])]
    parts = []
    for part in _split_groups(body[1:-1]):
        rings = _split_groups(part)
        if not rings:
            # a well-formed MULTIPOLYGON part is always ((...)); a
            # single-paren part is a POLYGON body smuggled in — reject,
            # never silently accept (review r2)
            raise ValueError("malformed MULTIPOLYGON part (parts must "
                             "be double-parenthesized)")
        if len(rings) > 1:
            raise ValueError("polygon holes are not supported (see "
                             "module docstring)")
        parts.append(_parse_ring(rings[0]))
    if not parts:
        raise ValueError("MULTIPOLYGON with no parts")
    return parts


def parse_geojson(geom: str | dict) -> list[list[list[float]]]:
    """GeoJSON Polygon/MultiPolygon geometry -> list of outer rings."""
    g = json.loads(geom) if isinstance(geom, str) else geom
    if g.get("type") == "Feature":
        g = g["geometry"]
    t = g.get("type")
    if t == "Polygon":
        polys = [g["coordinates"]]
    elif t == "MultiPolygon":
        polys = g["coordinates"]
    else:
        raise ValueError(f"unsupported GeoJSON geometry type {t!r}")
    out = []
    for rings in polys:
        if len(rings) > 1:
            raise ValueError("polygon holes are not supported (see "
                             "module docstring)")
        # RFC 7946 allows a third (altitude) element per position —
        # accept and drop it rather than crash on valid extracts
        ring = [[float(p[0]), float(p[1])] for p in rings[0]]
        if len(ring) < 4 or ring[0] != ring[-1]:
            raise ValueError("GeoJSON ring must be closed with >= 4 "
                             "points")
        out.append(ring)
    return out


def polygons_from_text(records, *, fmt: str = "wkt") -> pd.DataFrame:
    """(layer_id, channel, geometry-text) iterable -> osm_layers table.

    MULTIPOLYGON parts explode to one row each (shared layer_id/channel).
    Output matches the fixture schema consumed by ``pip.pack_polygons``:
    layer_id, channel, kind, ring, minx, miny, maxx, maxy.
    """
    parse = parse_wkt if fmt == "wkt" else parse_geojson
    rows = []
    for layer_id, channel, geom in records:
        for closed in parse(geom):
            # both text specs close rings (first == last); the engine's
            # ring format is OPEN — the ray-cast closes implicitly via
            # the last->first edge — so strip the closing vertex here
            ring = closed[:-1]
            xs = np.array([p[0] for p in ring])
            ys = np.array([p[1] for p in ring])
            rows.append({
                "layer_id": np.int64(layer_id),
                "channel": channel,
                "kind": str(channel).split("_")[0],
                "ring": ring,
                "minx": float(xs.min()), "miny": float(ys.min()),
                "maxx": float(xs.max()), "maxy": float(ys.max()),
            })
    cols = ["layer_id", "channel", "kind", "ring",
            "minx", "miny", "maxx", "maxy"]
    # typed-but-empty frame for empty input: pack_polygons downstream
    # would otherwise KeyError on the missing columns
    pdf = pd.DataFrame(rows, columns=cols)
    pdf["layer_id"] = pdf["layer_id"].astype("int64")
    return pdf


def to_wkt(ring) -> str:
    """Engine (open) ring -> WKT POLYGON text (closes the ring per spec;
    round-trip tests, debug dumps)."""
    pts = [list(p) for p in ring]
    if pts[0] != pts[-1]:
        pts.append(pts[0])
    body = ", ".join(f"{x} {y}" for x, y in pts)
    return f"POLYGON (({body}))"
