"""Geo/XML operators + the CdcPipelinePlan object."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from montandon_etl_spark.functions.geo import (
    parse_polygon,
    polygon_vertex_count,
    simplify_geometries,
)
from montandon_etl_spark.oracle import replay_oracle
from montandon_etl_spark.plans import CdcPipelinePlan
from montandon_etl_spark.sources.changelog import write_changelog
from montandon_etl_spark.sources.xmlsrc import xml_records
from tests.conftest import assert_state_equals_oracle


def test_parse_polygon_invalid_rows_kept(spark):
    df = spark.createDataFrame(
        [(1, '{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,0]]]}'),
         (2, "not json"),
         (3, '{"type":"Point","coordinates":[[[1,2]]]}')],
        "id long, gj string",
    )
    # NB: drop the nested geom struct before toPandas — pyarrow in this
    # environment segfaults converting struct<array<array<array<double>>>>
    out = (
        parse_polygon(df, "gj")
        .withColumn("nv", polygon_vertex_count())
        .drop("geom")
        .toPandas()
    )
    out = out.sort_values("id").reset_index(drop=True)
    assert list(out["geom_valid"]) == [True, False, False]  # recorded, not dropped
    assert out["nv"][0] == 4
    assert len(out) == 3


def test_simplify_geometries_douglas_peucker(spark):
    """Collinear vertices within tolerance are dropped; a spike beyond
    tolerance survives; near-degenerate rings keep their vertices."""
    import json

    sq_collinear = ('{"type":"Polygon","coordinates":'
                    '[[[0,0],[0.5,0.000001],[1,0],[1,1],[0,1],[0,0]]]}')
    sq_spike = ('{"type":"Polygon","coordinates":'
                '[[[0,0],[0.5,0.3],[1,0],[1,1],[0,1],[0,0]]]}')
    triangle = '{"type":"Polygon","coordinates":[[[0,0],[1,0],[0,1],[0,0]]]}'
    df = spark.createDataFrame(
        [(1, sq_collinear), (2, sq_spike), (3, triangle)], "id long, gj string"
    )
    out = {r["id"]: r for r in
           simplify_geometries(df, "gj", "id", tolerance=0.01).collect()}
    assert (out[1]["n_before"], out[1]["n_after"]) == (6, 5)  # midpoint dropped
    ring1 = json.loads(out[1]["simplified"])["coordinates"][0]
    assert [0.5, 0.000001] not in ring1 and len(ring1) == 5
    assert (out[2]["n_before"], out[2]["n_after"]) == (6, 6)  # spike kept
    assert (out[3]["n_before"], out[3]["n_after"]) == (4, 4)  # can't go below 4


def test_simplify_geometries_pure_python_matches_udf():
    """The same douglas_peucker function drives both the UDF and any
    oracle use — spot-check the pure form on a known polyline."""
    from montandon_etl_spark.functions.geo import douglas_peucker

    line = [(0.0, 0.0), (1.0, 0.05), (2.0, 0.0), (3.0, 2.0), (4.0, 0.0)]
    # (2,0) and (3,2) deviate from their chords beyond 0.1; (1,0.05) not
    assert douglas_peucker(line, 0.1) == [
        (0.0, 0.0), (2.0, 0.0), (3.0, 2.0), (4.0, 0.0)
    ]
    assert douglas_peucker(line, 0.01) == line  # everything significant


def test_xml_malformed_yields_zero_rows(spark):
    df = spark.createDataFrame(
        [(1, "<doc><r><a>x</a></r><r><a>y</a></r></doc>"),
         (2, "<doc><r><a>unclosed"),
         (3, None)],
        "id long, x string",
    )
    out = xml_records(df, "id", "x", "r", {"a": "val"}).toPandas()
    assert len(out) == 2  # two rows from doc 1; malformed + null skipped
    assert sorted(out["val"]) == ["x", "y"]


def test_cdc_pipeline_plan_batch_and_explain(spark, tmp_path, small_changelog):
    log_dir = str(tmp_path / "log")
    write_changelog(small_changelog, log_dir, n_chunks=4)
    plan = CdcPipelinePlan(
        changelog_dir=log_dir,
        table_path=str(tmp_path / "pages"),
        n_buckets=4,
    )
    txt = plan.explain(spark)
    assert "Physical Plan" in txt and "extract_text" in txt
    table = plan.run_batch(spark, n_batches=2)
    assert_state_equals_oracle(table.read(spark).toPandas(),
                               replay_oracle(small_changelog))
