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
