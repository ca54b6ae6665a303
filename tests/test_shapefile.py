"""Dependency-free shapefile reader: bytes built by hand per the ESRI
whitepaper layout, parsed back, and used as the broadcast dim side of
the priority-fallback join (the reference's admin-boundary pattern)."""

from __future__ import annotations

import json
import struct

from pyspark.sql import functions as F

from montandon_etl_spark.sources.shapefile import (
    parse_dbf,
    parse_shp,
    shapefile_to_pandas,
)


def _shp_bytes(records: list[bytes]) -> bytes:
    body = b""
    for i, content in enumerate(records):
        body += struct.pack(">ii", i + 1, len(content) // 2) + content
    total_words = (100 + len(body)) // 2
    header = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_words)
    header += struct.pack("<ii", 1000, 5) + struct.pack("<dddd", 0, 0, 10, 10)
    header += struct.pack("<dddd", 0, 0, 0, 0)
    assert len(header) == 100
    return header + body


def _polygon_record(rings: list[list[tuple[float, float]]]) -> bytes:
    pts = [p for ring in rings for p in ring]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    parts, acc = [], 0
    for ring in rings:
        parts.append(acc)
        acc += len(ring)
    out = struct.pack("<i", 5)
    out += struct.pack("<dddd", min(xs), min(ys), max(xs), max(ys))
    out += struct.pack("<ii", len(rings), len(pts))
    out += struct.pack(f"<{len(parts)}i", *parts)
    for x, y in pts:
        out += struct.pack("<dd", x, y)
    return out


def _point_record(x: float, y: float) -> bytes:
    return struct.pack("<i", 1) + struct.pack("<dd", x, y)


def _dbf_bytes(rows: list[tuple[str, int]]) -> bytes:
    # two fields: NAME C(8), CODE N(4)
    fields = [(b"NAME", "C", 8), (b"CODE", "N", 4)]
    descs = b""
    for name, ftype, length in fields:
        descs += name.ljust(11, b"\x00") + ftype.encode() + b"\x00" * 4
        descs += bytes([length, 0]) + b"\x00" * 14
    header_size = 32 + len(descs) + 1
    record_size = 1 + sum(f[2] for f in fields)
    header = bytes([3, 124, 1, 1]) + struct.pack("<ihh", len(rows), header_size, record_size)
    header += b"\x00" * 20 + descs + b"\x0d"
    body = b""
    for name, code in rows:
        body += b" " + name.ljust(8).encode() + str(code).rjust(4).encode()
    return header + body + b"\x1a"


SQUARE = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
TRI = [(5.0, 5.0), (8.0, 5.0), (5.0, 9.0), (5.0, 5.0)]


def test_parse_shp_and_dbf_roundtrip():
    shp = _shp_bytes([_polygon_record([SQUARE]), _polygon_record([TRI]),
                      _point_record(1.5, 2.5)])
    dbf = _dbf_bytes([("north", 10), ("south", 20), ("cap", 30)])
    shapes = parse_shp(shp)
    assert shapes[0]["type"] == "Polygon"
    assert shapes[0]["coordinates"] == [[list(p) for p in SQUARE]]
    assert shapes[1]["coordinates"] == [[list(p) for p in TRI]]
    assert shapes[2] == {"type": "Point", "coordinates": [1.5, 2.5]}
    attrs = parse_dbf(dbf)
    assert list(attrs.NAME) == ["north", "south", "cap"]
    assert list(attrs.CODE) == [10, 20, 30]
    pdf = shapefile_to_pandas(shp, dbf)
    assert json.loads(pdf.geometry[2])["coordinates"] == [1.5, 2.5]


CW_SQUARE = [(0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0)]
CCW_HOLE = [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)]
CW_SQUARE2 = [(10.0, 10.0), (10.0, 14.0), (14.0, 14.0), (14.0, 10.0), (10.0, 10.0)]


def test_parse_shp_polygon_with_hole_any_ring_order():
    """ESRI rings are a flat list; the hole (CCW) must nest under the
    outer (CW) regardless of stored order."""
    shp = _shp_bytes([_polygon_record([CCW_HOLE, CW_SQUARE])])
    g = parse_shp(shp)[0]
    assert g["type"] == "Polygon"
    assert g["coordinates"][0] == [list(p) for p in CW_SQUARE]
    assert g["coordinates"][1] == [list(p) for p in CCW_HOLE]


def test_parse_shp_multipart_polygon():
    """Two clockwise outer rings in ONE type-5 record → MultiPolygon
    (a single Polygon would read ring 2 as a hole of ring 1 — wrong
    area/containment for multipart admin boundaries)."""
    shp = _shp_bytes([_polygon_record([CW_SQUARE, CW_SQUARE2, CCW_HOLE])])
    g = parse_shp(shp)[0]
    assert g["type"] == "MultiPolygon"
    assert len(g["coordinates"]) == 2
    # the hole lands under the outer ring that contains it
    assert g["coordinates"][0][0] == [list(p) for p in CW_SQUARE]
    assert g["coordinates"][0][1] == [list(p) for p in CCW_HOLE]
    assert g["coordinates"][1] == [[list(p) for p in CW_SQUARE2]]


def test_shapefile_as_broadcast_dim(spark, tmp_path):
    """The reference pattern end-to-end: shapefile → dim table →
    priority-fallback join against a fact frame, plus the geometry
    flowing through parse_polygon/bbox."""
    from montandon_etl_spark.functions.geo import parse_polygon, polygon_bbox
    from montandon_etl_spark.operators.relational import priority_fallback_join
    from montandon_etl_spark.sources.shapefile import read_shapefile

    shp_p = tmp_path / "admin.shp"
    dbf_p = tmp_path / "admin.dbf"
    shp_p.write_bytes(_shp_bytes([_polygon_record([SQUARE]), _polygon_record([TRI])]))
    dbf_p.write_bytes(_dbf_bytes([("north", 10), ("south", 20)]))
    dims = read_shapefile(spark, str(shp_p), str(dbf_p))
    assert dims.count() == 2

    # geometry currency: GeoJSON parses through the geo operators
    bb = (
        parse_polygon(dims, "geometry")
        .select("NAME", polygon_bbox("geom").alias("bb"))
        .select("NAME", "bb.xmin", "bb.xmax")
        .collect()
    )
    got = {r["NAME"]: (r["xmin"], r["xmax"]) for r in bb}
    assert got == {"north": (0.0, 4.0), "south": (5.0, 8.0)}

    facts = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99)], "fact_id int, admin_code int"
    )
    joined = priority_fallback_join(
        facts,
        [(dims.select("CODE"), "admin_exact", ["CODE"])],
        ["admin_code"],
    )
    lvl = {r["fact_id"]: r["match_level"] for r in joined.collect()}
    assert lvl == {1: "admin_exact", 2: "admin_exact", 3: None}
