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


def test_simplify_geometries_stub_raises(spark):
    df = spark.createDataFrame(
        [(1, '{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,0]]]}')],
        "id long, gj string",
    )
    with pytest.raises(Exception, match="shapely"):
        simplify_geometries(df, "gj", "id").collect()


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
