"""Tests: SQL-function surface (register_all) and the curation pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_sql_function_surface(spark):
    from zerox_spark.functions import register_all
    from zerox_spark.synth import synth_pages

    register_all(spark)
    synth_pages(spark, SF_SMOKE).limit(20).createOrReplaceTempView("pages_v")
    rows = spark.sql(
        "SELECT url, zerox_extract(html) AS md, zerox_page_count(html) AS np "
        "FROM pages_v"
    ).collect()
    assert len(rows) == 20
    assert all(r.np >= 1 for r in rows)
    assert any("# Document" in r.md for r in rows)
    fp = spark.sql(
        "SELECT zerox_fingerprint('the quick brown fox jumps over it') AS f"
    ).collect()[0].f
    assert len(fp) > 0


def test_curation_removes_injected_duplicates(spark):
    from zerox_spark.operators.curation import curate
    from zerox_spark.operators.dedup import (
        DUP_EXACT_OFFSET, DUP_NEAR_OFFSET, with_injected_duplicates,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = curate(with_injected_duplicates(docs), quality_min=0.0)
    ids = {r.doc_id for r in out.collect()}
    # no injected exact copy survives (original doc_id is smaller)
    assert not any(i >= DUP_EXACT_OFFSET for i in ids)
    # no injected near-dup survives either
    assert not any(DUP_NEAR_OFFSET <= i < DUP_EXACT_OFFSET for i in ids)
    # but non-duplicated originals do
    assert any(i < DUP_NEAR_OFFSET for i in ids)
