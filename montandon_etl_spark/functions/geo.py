"""Geometry operators (SURVEY.md §2: F3 geometry validation, P8
geometry simplification, S10 admin-geometry side tables).

The reference validates GeoJSON coordinate shapes with pydantic unions
(validators/gdacs_geometry.py:56-70), simplifies geometries with
shapely (transform/sources/desinventar.py:118-122), and joins records
to admin shapefiles (desinventar.py:30-49). Spark-first equivalents:

- validation: ``from_json`` against a nested-array GeoJSON schema +
  validity columns (no Python);
- bbox/centroid: pure nested-array expressions over the parsed
  coordinates (aggregate/transform/flatten — JVM-side, codegen'd);
- simplification: Douglas-Peucker implemented directly (pure
  arithmetic, no geometry dependency) inside Arrow-batched
  ``mapInPandas`` — the same semantics the reference delegates to
  shapely's ``simplify(tolerance)``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# GeoJSON Polygon: coordinates = array<array<array<double>>>
POLYGON_SCHEMA = (
    "type string, coordinates array<array<array<double>>>"
)


def parse_polygon(df: DataFrame, geojson_col: str) -> DataFrame:
    """Schema-on-read GeoJSON polygon parse + validity flag (F3)."""
    parsed = F.from_json(F.col(geojson_col), POLYGON_SCHEMA)
    # PERMISSIVE from_json yields a struct of NULLs (not a NULL struct)
    # on corrupt input, so the validity predicate must coalesce to False
    return df.withColumn("geom", parsed).withColumn(
        "geom_valid",
        F.coalesce(
            (parsed["type"] == "Polygon") & (F.size(parsed["coordinates"]) > 0),
            F.lit(False),
        ),
    )


def polygon_bbox(geom_col: str = "geom") -> F.Column:
    """Bounding box of a parsed polygon as struct(xmin, ymin, xmax,
    ymax) — flatten + aggregate, fully JVM-side."""
    def _agg(idx: int, fn: str) -> F.Column:
        init = "cast(" + ("9e99" if fn == "least" else "-9e99") + " as double)"
        return F.expr(
            f"aggregate(flatten({geom_col}.coordinates), {init},"
            f" (acc, p) -> {fn}(acc, p[{idx}]))"
        )
    return F.struct(
        _agg(0, "least").alias("xmin"),
        _agg(1, "least").alias("ymin"),
        _agg(0, "greatest").alias("xmax"),
        _agg(1, "greatest").alias("ymax"),
    )


def polygon_vertex_count(geom_col: str = "geom") -> F.Column:
    return F.size(F.flatten(F.col(f"{geom_col}.coordinates")))


def _perp_dist(p, a, b) -> float:
    """Perpendicular distance from point p to the line through a-b
    (distance to a when the segment is degenerate)."""
    import math

    ax, ay = a
    bx, by = b
    px, py = p
    dx, dy = bx - ax, by - ay
    if dx == 0 and dy == 0:
        return math.hypot(px - ax, py - ay)
    return abs(dy * px - dx * py + bx * ay - by * ax) / math.hypot(dx, dy)


def douglas_peucker(pts: list, tolerance: float) -> list:
    """Iterative Douglas-Peucker polyline simplification: drop every
    vertex whose perpendicular distance to the kept-neighbor chord is
    within ``tolerance``. Deterministic, dependency-free."""
    if len(pts) <= 2:
        return list(pts)
    keep = [False] * len(pts)
    keep[0] = keep[-1] = True
    stack = [(0, len(pts) - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        dmax, idx = -1.0, -1
        for m in range(i + 1, j):
            d = _perp_dist(pts[m], pts[i], pts[j])
            if d > dmax:
                dmax, idx = d, m
        if dmax > tolerance:
            keep[idx] = True
            stack.append((i, idx))
            stack.append((idx, j))
    return [p for p, k in zip(pts, keep) if k]


def simplify_geometries(
    df: DataFrame, geojson_col: str, id_col: str, tolerance: float = 0.01
) -> DataFrame:
    """Polygon simplification via mapInPandas (reference:
    geom.simplify(tolerance=0.01, preserve_topology=True),
    transform/sources/desinventar.py:118-122) — Douglas-Peucker
    implemented directly, so no geometry library is needed.

    Each ring (closed: first == last) is simplified as a polyline
    anchored at its endpoints; a ring that would collapse below 4
    points (degenerate polygon) keeps its original vertices. Output per
    row: the simplified GeoJSON plus before/after vertex counts (the
    observability a pipeline filters/monitors on). Arrow-batched, 1:1
    row contract.
    """
    import json

    schema = f"{id_col} long, simplified string, n_before int, n_after int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for rid, gj in zip(pdf[id_col], pdf[geojson_col]):
                geom = json.loads(gj)
                n_before = n_after = 0
                rings = []
                for ring in geom.get("coordinates", []):
                    pts = [tuple(p) for p in ring]
                    simp = douglas_peucker(pts, tolerance)
                    if len(simp) < 4:  # keep polygons non-degenerate
                        simp = pts
                    n_before += len(pts)
                    n_after += len(simp)
                    rings.append([list(p) for p in simp])
                simplified = {"type": geom.get("type"), "coordinates": rings}
                out.append((rid, json.dumps(simplified), n_before, n_after))
            yield pd.DataFrame(
                out, columns=[id_col, "simplified", "n_before", "n_after"]
            )

    return df.select(id_col, geojson_col).mapInPandas(batches, schema=schema)


def point_in_ring(px, py, ring) -> F.Column:
    """Ray-cast point-in-polygon test as a pure SQL expression (even-
    odd rule over the ring's edges, wrap-around closing edge). The
    crossing test is the textbook one-division form, written with a
    FIXED parenthesization — ``((bx-ax)*(py-ay))/(by-ay)+ax`` — so a
    SQL oracle computing the identical expression tree gets identical
    IEEE doubles. The degenerate horizontal-edge division never
    matters: the first conjunct is false exactly when by==ay, and
    ``false AND x`` is false regardless of x in both engines.
    ``px``/``py``/``ring`` are SQL fragments (column names or
    expressions); ring is ``array<array<double>>`` of [x, y] vertices,
    open (no repeated last vertex)."""
    return F.expr(f"""
      (size(filter(transform(sequence(1, size({ring})), i -> named_struct(
          'ax', element_at(element_at({ring}, i), 1),
          'ay', element_at(element_at({ring}, i), 2),
          'bx', element_at(element_at({ring}, i % size({ring}) + 1), 1),
          'by', element_at(element_at({ring}, i % size({ring}) + 1), 2))),
        e -> ((e.ay > {py}) != (e.by > {py})) AND
             ({px} < ((e.bx - e.ax) * ({py} - e.ay)) / (e.by - e.ay)
                     + e.ax))) % 2) = 1""")


def point_in_polygon_join(points: DataFrame, polys: DataFrame,
                          id_col: str, x_col: str, y_col: str,
                          poly_id_col: str, ring_col: str,
                          cell: float = 1.0) -> DataFrame:
    """Spatial join: which polygon contains each point — the
    reference's hazard-event → admin-boundary matching
    (transform/sources/desinventar.py:30-49 does this through
    shapefile lookups) as a real distributed spatial join.

    Shape (the engine's universal block-then-verify idiom): each
    polygon explodes to the grid CELLS its bbox overlaps (bounded by
    geometry size / cell², a config choice); each point lands in
    exactly ONE cell; candidates come from a broadcast equi-join on
    the cell (admin tables are small — thousands of polygons), and the
    exact ray-cast verifies. A point can meet a given polygon in only
    one cell, so no dedup pass is needed. Zero shuffles on the point
    side beyond the final projection — the scan streams through a
    broadcast hash join and a codegen'd verify.

    Returns ``(id, poly_id)`` for contained points only (points on an
    edge/vertex follow the raw even-odd rule — callers wanting closed
    semantics buffer their polygons)."""
    b = polys.select(
        F.col(poly_id_col),
        F.col(ring_col).alias("_ring"),
        F.expr(f"aggregate(transform({ring_col}, v -> element_at(v, 1)),"
               f" cast('Infinity' as double), (a, x) -> least(a, x))")
        .alias("_x0"),
        F.expr(f"aggregate(transform({ring_col}, v -> element_at(v, 1)),"
               f" cast('-Infinity' as double), (a, x) -> greatest(a, x))")
        .alias("_x1"),
        F.expr(f"aggregate(transform({ring_col}, v -> element_at(v, 2)),"
               f" cast('Infinity' as double), (a, y) -> least(a, y))")
        .alias("_y0"),
        F.expr(f"aggregate(transform({ring_col}, v -> element_at(v, 2)),"
               f" cast('-Infinity' as double), (a, y) -> greatest(a, y))")
        .alias("_y1"))
    cells = (b
             .withColumn("_cx", F.explode(F.sequence(
                 F.floor(F.col("_x0") / F.lit(cell)).cast("bigint"),
                 F.floor(F.col("_x1") / F.lit(cell)).cast("bigint"))))
             .withColumn("_cy", F.explode(F.sequence(
                 F.floor(F.col("_y0") / F.lit(cell)).cast("bigint"),
                 F.floor(F.col("_y1") / F.lit(cell)).cast("bigint"))))
             .select(poly_id_col, "_ring", "_cx", "_cy"))
    pts = points.select(
        F.col(id_col), F.col(x_col).alias("_px"),
        F.col(y_col).alias("_py"),
        F.floor(F.col(x_col) / F.lit(cell)).cast("bigint").alias("_cx"),
        F.floor(F.col(y_col) / F.lit(cell)).cast("bigint").alias("_cy"))
    cand = pts.join(F.broadcast(cells), ["_cx", "_cy"])
    return (cand.filter(point_in_ring("_px", "_py", "_ring"))
            .select(id_col, poly_id_col))
