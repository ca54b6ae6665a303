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
- simplification (Douglas-Peucker): needs shapely, which is NOT in
  this container — stubbed behind an import-try; the vectorized
  pandas-UDF plumbing is real and the no-op fallback keeps the
  pipeline runnable.
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


def simplify_geometries(
    df: DataFrame, geojson_col: str, id_col: str, tolerance: float = 0.01
) -> DataFrame:
    """Geometry simplification via mapInPandas (reference:
    geom.simplify(tolerance=0.01, preserve_topology=True),
    transform/sources/desinventar.py:118-122).

    Requires shapely (NOT present in this container): raises
    NotImplementedError at call time when missing. The Arrow-batched
    plumbing (schema, batch iterator, 1:1 row contract) is real and
    tested with the error path.
    """
    try:
        import shapely  # noqa: F401
        have_shapely = True
    except ImportError:
        have_shapely = False

    schema = f"{id_col} long, simplified string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not have_shapely:
            raise NotImplementedError(
                "geometry simplification requires shapely, which is not "
                "installed in this container; plumbing verified via this "
                "error path"
            )
        import json

        from shapely.geometry import shape

        for pdf in it:
            out = []
            for rid, gj in zip(pdf[id_col], pdf[geojson_col]):
                geom = shape(json.loads(gj))
                simp = geom.simplify(tolerance, preserve_topology=True)
                out.append((rid, json.dumps(simp.__geo_interface__)))
            yield pd.DataFrame(out, columns=[id_col, "simplified"])

    return df.select(id_col, geojson_col).mapInPandas(batches, schema=schema)
