"""Tests: payload capping (I4 analog), filename-rule divergence (P4 vs P5),
retry wrapper (O6), markdown file sink (K1), extractor registry (M1)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

from zerox_spark.extract.core import ExtractConfig, extract_document, get_extractor
from zerox_spark.extract.fences import sanitize_filename, sanitize_filename_node
from zerox_spark.sinks import export_markdown_files, run_retries


def test_payload_cap_truncates_at_tag_boundary():
    big = (
        b"<html><body><article>"
        + b"<p>chunk of text</p>" * 100
        + b"</article></body></html>"
    )
    out = extract_document(big, None, ExtractConfig(max_payload_bytes=500))
    assert out[0].status == "SUCCESS"
    # truncated but parsed: fewer paragraphs than the full doc would give
    assert 0 < out[0].markdown.count("chunk of text") < 100


def test_payload_cap_disabled_with_zero():
    big = b"<article><p>" + b"x" * 1000 + b"</p></article>"
    out = extract_document(big, None, ExtractConfig(max_payload_bytes=0))
    assert out[0].content_length >= 1000


def test_filename_rules_diverge_as_documented():
    # SURVEY.md §7(d): PY underscores every non-alnum; Node strips
    # non-word chars and underscores only whitespace
    assert sanitize_filename("My Doc (v2).pdf") == "my_doc__v2_"
    assert sanitize_filename_node("My Doc (v2).pdf") == "my_doc_v2"


def test_run_retries_retries_then_raises():
    calls = []

    def flaky_ok():
        calls.append(1)
        if len(calls) < 2:
            raise OSError("transient")
        return "ok"

    assert run_retries(flaky_ok, max_retries=1) == "ok"
    with pytest.raises(OSError):
        run_retries(lambda: (_ for _ in ()).throw(OSError("always")), max_retries=2)


def test_extractor_registry():
    layout = get_extractor("layout")
    pages = layout(b"%PDF-SYNTH 1.0\n%%page no=1 w=10.0 h=10.0\n"
                   b"%%line y=5.0 x=1.0 size=10.0 text=hello world\n", None)
    assert pages[0][1] == "hello world"
    with pytest.raises(ValueError):
        get_extractor("gpt-4o")  # no network models in this engine


def test_export_markdown_files(spark, tmp_path):
    from zerox_spark.extract.core import ExtractConfig as EC
    from zerox_spark.operators.extract import extract_pages
    from zerox_spark.synth import synth_pages

    out = tmp_path / "md"
    ex = extract_pages(synth_pages(spark, SF_SMOKE).limit(10), EC(), 4)
    n = export_markdown_files(ex, str(out))
    assert n == 10
    sample = sorted(out.iterdir())[0]
    assert sample.suffix == ".md" and sample.read_text()


def test_lineage_mixed_schema_old_sink_dir(spark, tmp_path):
    """A sink dir written by an older engine version (lineage rows without
    max_warc_ts) must still support the watermark aggregation after new
    rows are appended — mergeSchema yields nulls for the old files."""
    from pyspark.sql import Row, functions as F

    from zerox_spark.sinks import ParquetSnapshotSink

    sink = ParquetSnapshotSink(str(tmp_path / "s"))
    old = spark.createDataFrame(
        [
            Row(
                job_id="old", partition_id=1, input_split="x", doc_count=1,
                page_count=1, checksum="0", elapsed_ms=1, status="SUCCESS",
            )
        ]
    )
    old.write.mode("append").parquet(sink.lineage_path)
    import datetime

    new = spark.createDataFrame(
        [
            Row(
                job_id="new", partition_id=2, input_split="y", doc_count=1,
                page_count=1, checksum="0", elapsed_ms=1, status="SUCCESS",
                max_warc_ts=datetime.datetime(2024, 1, 2),
            )
        ]
    )
    new.write.mode("append").parquet(sink.lineage_path)
    wm = (
        sink.read_lineage(spark)
        .agg(F.max("max_warc_ts").alias("wm"))
        .collect()[0]
        .wm
    )
    assert wm == datetime.datetime(2024, 1, 2)
