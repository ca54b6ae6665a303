"""Minimal dependency-free ESRI shapefile reader (SURVEY §2.1 S10).

The reference loads admin-boundary shapefiles with geopandas and joins
records against them (transform/sources/desinventar.py:30-49).
Geopandas is not in this container — but the shapefile main file (.shp)
and attribute file (.dbf, dBase III) are simple fixed-layout binary
formats (the public ESRI whitepaper), so the two shape types the
reference uses (Point, Polygon) are parsed here directly.

Design note for scale: an admin-boundary table is a DIMENSION — a few
thousand rows joined against 10^10 facts. The right plan is: parse on
the driver (or one task), produce a small DataFrame, and let the join
side broadcast it (exactly what ``priority_fallback_join`` does). A
distributed shapefile scan would be over-engineering for a side table.

Geometry is emitted as GeoJSON strings — the repo's geometry currency
(``functions/geo`` parses, bboxes and simplifies it).
"""

from __future__ import annotations

import json
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SHAPE_NULL, SHAPE_POINT, SHAPE_POLYGON = 0, 1, 5


def _ring_area2(ring: list[list[float]]) -> float:
    """Twice the signed shoelace area; > 0 counter-clockwise, < 0
    clockwise. Per the ESRI spec, outer rings are clockwise and holes
    counter-clockwise."""
    s = 0.0
    for i in range(len(ring) - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        s += x1 * y2 - x2 * y1
    return s


def _point_in_ring(pt: list[float], ring: list[list[float]]) -> bool:
    """Ray-casting point-in-polygon (boundary cases unimportant here:
    used only to assign a hole to its containing outer ring)."""
    x, y = pt
    inside = False
    for i in range(len(ring) - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        if (y1 > y) != (y2 > y):
            xin = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if xin > x:
                inside = not inside
    return inside


def _rings_to_geojson(rings: list[list[list[float]]]) -> dict:
    """ESRI type-5 rings → GeoJSON Polygon or MultiPolygon. ESRI stores
    multipart polygons as a flat ring list with outer rings clockwise
    and holes counter-clockwise; GeoJSON nests holes under their outer
    ring, so a record with >1 outer ring must become a MultiPolygon —
    emitting it as one Polygon would make the other outers read as
    holes of the first (wrong areas/containment for multipart admin
    boundaries)."""
    outers = [r for r in rings if _ring_area2(r) < 0]
    holes = [r for r in rings if _ring_area2(r) >= 0]
    if not outers:  # degenerate writer: all rings CCW — first is outer
        outers, holes = rings[:1], rings[1:]
    if len(outers) == 1:
        return {"type": "Polygon", "coordinates": [outers[0]] + holes}
    polys = [[o] for o in outers]
    for h in holes:
        for j, o in enumerate(outers):
            if h and _point_in_ring(h[0], o):
                polys[j].append(h)
                break
        else:
            polys[0].append(h)  # unmatched hole: keep, don't drop data
    return {"type": "MultiPolygon", "coordinates": polys}


def parse_shp(data: bytes) -> list[dict | None]:
    """Parse a .shp main file → list of GeoJSON-able dicts (None for
    null shapes). Supports Point (1) and Polygon (5), including
    multipart polygons (multiple clockwise outer rings →
    MultiPolygon)."""
    (file_code,) = struct.unpack(">i", data[0:4])
    if file_code != 9994:
        raise ValueError(f"not a shapefile: file code {file_code}")
    (file_len_words,) = struct.unpack(">i", data[24:28])
    end = file_len_words * 2
    shapes: list[dict | None] = []
    off = 100
    while off < end:
        (_recno, content_words) = struct.unpack(">ii", data[off : off + 8])
        off += 8
        rec = data[off : off + content_words * 2]
        off += content_words * 2
        (stype,) = struct.unpack("<i", rec[0:4])
        if stype == SHAPE_NULL:
            shapes.append(None)
        elif stype == SHAPE_POINT:
            x, y = struct.unpack("<dd", rec[4:20])
            shapes.append({"type": "Point", "coordinates": [x, y]})
        elif stype == SHAPE_POLYGON:
            num_parts, num_points = struct.unpack("<ii", rec[36:44])
            parts = list(struct.unpack(f"<{num_parts}i", rec[44 : 44 + 4 * num_parts]))
            pts_off = 44 + 4 * num_parts
            flat = struct.unpack(
                f"<{2 * num_points}d", rec[pts_off : pts_off + 16 * num_points]
            )
            pts = [[flat[2 * i], flat[2 * i + 1]] for i in range(num_points)]
            bounds = parts + [num_points]
            rings = [pts[bounds[i] : bounds[i + 1]] for i in range(num_parts)]
            shapes.append(_rings_to_geojson(rings))
        else:
            raise ValueError(f"unsupported shape type {stype}")
    return shapes


def parse_dbf(data: bytes) -> pd.DataFrame:
    """Parse a dBase III .dbf attribute file → DataFrame. Supports the
    C (character) and N (numeric) field types the reference's admin
    shapefiles carry."""
    n_records, header_size, record_size = struct.unpack("<ihh", data[4:12])
    fields = []
    off = 32
    while data[off] != 0x0D:
        desc = data[off : off + 32]
        name = desc[0:11].split(b"\x00")[0].decode("ascii")
        ftype = chr(desc[11])
        length = desc[16]
        decimals = desc[17]
        fields.append((name, ftype, length, decimals))
        off += 32
    rows = []
    for r in range(n_records):
        rec = data[header_size + r * record_size : header_size + (r + 1) * record_size]
        if rec[0:1] == b"*":  # deleted row
            continue
        vals, pos = {}, 1
        for name, ftype, length, decimals in fields:
            raw = rec[pos : pos + length].decode("ascii", errors="replace").strip()
            pos += length
            if ftype == "N":
                if raw == "":
                    vals[name] = None
                elif decimals > 0:
                    vals[name] = float(raw)
                else:
                    vals[name] = int(raw)
            else:
                vals[name] = raw
        rows.append(vals)
    return pd.DataFrame(rows, columns=[f[0] for f in fields])


def shapefile_to_pandas(shp_bytes: bytes, dbf_bytes: bytes | None) -> pd.DataFrame:
    """Join shapes with their attribute rows (positional, per the spec)
    into one DataFrame with a ``geometry`` GeoJSON-string column."""
    shapes = parse_shp(shp_bytes)
    geo = pd.DataFrame(
        {"geometry": [None if s is None else json.dumps(s) for s in shapes]}
    )
    if dbf_bytes is None:
        return geo
    attrs = parse_dbf(dbf_bytes)
    if len(attrs) != len(geo):
        raise ValueError(f".dbf rows ({len(attrs)}) != .shp shapes ({len(geo)})")
    return pd.concat([attrs.reset_index(drop=True), geo], axis=1)


def read_shapefile(spark: SparkSession, shp_path: str,
                   dbf_path: str | None = None) -> DataFrame:
    """Shapefile → (small) Spark DataFrame, ready to be the broadcast
    dim side of ``priority_fallback_join``."""
    with open(shp_path, "rb") as f:
        shp = f.read()
    dbf = None
    if dbf_path is not None:
        with open(dbf_path, "rb") as f:
            dbf = f.read()
    return spark.createDataFrame(shapefile_to_pandas(shp, dbf))
