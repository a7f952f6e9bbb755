"""Tests: the single-document zerox() convenience API, hybrid fallback,
per-block content scores."""

from __future__ import annotations

from zerox_spark.api import zerox
from zerox_spark.extract.core import ExtractConfig, extract_document
from zerox_spark.extract.markdown import html_to_markdown

HTML = (
    b"<html><body><article><h1>Doc</h1><p>body text of the document</p>"
    b"</article></body></html>"
)


def test_zerox_api_shape(tmp_path):
    f = tmp_path / "My Doc.html"
    f.write_bytes(HTML)
    out = zerox(file_path=str(f), output_dir=str(tmp_path / "md"))
    assert out.file_name == "my_doc"
    assert out.pages[0].markdown == "# Doc\n\nbody text of the document"
    assert out.summary == {"total_pages": 1, "ocr": {"successful": 1, "failed": 0}}
    assert out.completion_time > 0
    assert out.input_tokens == 0  # documented divergence: no LLM
    assert (tmp_path / "md" / "my_doc.md").read_text() == out.markdown


def test_zerox_api_select_pages_on_pdf():
    pdf = (
        b"%PDF-SYNTH 1.0\n"
        b"%%page no=1 w=10.0 h=10.0\n%%line y=5.0 x=1.0 size=10.0 text=one\n"
        b"%%page no=2 w=10.0 h=10.0\n%%line y=5.0 x=1.0 size=10.0 text=two\n"
        b"%%page no=3 w=10.0 h=10.0\n%%line y=5.0 x=1.0 size=10.0 text=three\n"
    )
    out = zerox(content=pdf, select_pages=[2])
    assert [(p.page_no, p.markdown) for p in out.pages] == [(2, "two")]


def test_hybrid_falls_back_to_text_on_failure():
    cfg = ExtractConfig(hybrid=True, trust_text=False)
    out = extract_document(b"PK\x03\x04broken-office-doc", "fallback text", cfg)
    assert out[0].status == "SUCCESS"
    assert out[0].markdown == "fallback text"
    # without hybrid the same input is an ERROR row
    out2 = extract_document(
        b"PK\x03\x04broken-office-doc", "fallback text",
        ExtractConfig(trust_text=False),
    )
    assert out2[0].status == "ERROR"


def test_link_heavy_block_scores_below_one():
    md, spans = html_to_markdown(
        "<article><p>plain prose paragraph with no links at all okay</p>"
        "<p>mixed prose going on for quite a while before the"
        " <a href='http://x/a'>linked text</a> and then a longer tail of"
        " ordinary words that keeps link density low</p>"
        "</article>"
    )
    scores = {md[s:e][:11]: sc for _, s, e, sc in spans}
    assert scores["plain prose"] == 1.0
    mixed = [sc for _, s, e, sc in spans if "linked text" in md[s:e]][0]
    assert 0.0 < mixed < 1.0
