"""Extractor: determinism, decode policy, oracle ≡ UDF byte-identity."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from montandon_etl_spark.functions.extract import (
    extract_text_bytes,
    extract_text_udf,
    language_id,
)
from montandon_etl_spark.sources.changelog import gen_changelog


def test_basic_strip():
    html = b"<html><head><title>T</title><script>no()</script></head><body><p>Hello &amp; world</p><div>line two</div></body></html>"
    text, lang = extract_text_bytes(html)
    assert text == "T\nHello & world\nline two"
    assert "no()" not in text


def test_invalid_utf8_replacement_policy():
    text, _ = extract_text_bytes(b"<p>ok</p>\xff\xfe")
    assert text == "ok\n��".strip() or "�" in text
    # pinned: exact output
    assert text == "ok\n��"


def test_none_and_empty():
    assert extract_text_bytes(None) == ("", "und")
    assert extract_text_bytes(b"") == ("", "und")


def test_entities_and_nbsp():
    text, _ = extract_text_bytes(b"<p>a&nbsp;&nbsp;b &lt;tag&gt;</p>")
    assert text == "a b <tag>"


def test_language_id_deterministic():
    assert language_id("the quick fox is in the house and it was for the dog") == "en"
    assert language_id("el perro y la casa de los niños en la ciudad") == "es"
    assert language_id("zzz qqq www") == "und"
    assert language_id("") == "und"


def test_udf_byte_identical_to_oracle(spark, small_changelog):
    """input_hint invariant: Arrow-vectorized form ≡ pure oracle, per row."""
    pdf = small_changelog[small_changelog.op == "upsert"].head(300)
    sdf = spark.createDataFrame(pdf[["seq", "url", "warc_ts", "op", "html"]])
    got = (
        sdf.withColumn("_x", extract_text_udf(F.col("html")))
        .select("seq", F.col("_x.text").alias("text"), F.col("_x.lang").alias("lang"))
        .toPandas()
        .sort_values("seq")
        .reset_index(drop=True)
    )
    expected = [extract_text_bytes(h) for h in pdf.sort_values("seq")["html"]]
    for i, (etext, elang) in enumerate(expected):
        assert got["text"][i] == etext, f"row {i} text mismatch"
        assert got["lang"][i] == elang, f"row {i} lang mismatch"


def test_generator_deterministic():
    a = gen_changelog(200, 80, seed=7)
    b = gen_changelog(200, 80, seed=7)
    pd.testing.assert_frame_equal(a, b)
    c = gen_changelog(200, 80, seed=8)
    assert not a["html"].equals(c["html"])
