"""Tests: giant-document block chunking (the splitTallImage analog)."""

from __future__ import annotations

from zerox_spark.extract.chunking import chunk_blocks
from zerox_spark.extract.core import ExtractConfig, extract_document
from zerox_spark.extract.markdown import html_to_markdown


def _giant_html(n_paras: int = 60) -> bytes:
    body = "".join(f"<p>paragraph number {i} with several words</p>" for i in range(n_paras))
    return f"<html><body><article>{body}</article></body></html>".encode()


def test_chunk_blocks_respects_block_boundaries():
    md, spans = html_to_markdown(_giant_html().decode())
    pages = chunk_blocks(md, spans, chunk_chars=400)
    assert len(pages) > 1
    # reassembling pages (with the seam restored) reproduces the document
    assert "\n\n".join(p for p, _ in pages) == md
    for text, page_spans in pages:
        assert text and not text.startswith("\n")
        for kind, s, e, _ in page_spans:
            assert text[s:e]  # spans re-based correctly
        # no block was split: every page is whole paragraphs
        assert all(text[s:e].startswith("paragraph") for _, s, e, _ in page_spans)


def test_chunking_off_by_default_and_opt_in():
    payload = _giant_html()
    assert len(extract_document(payload, None)) == 1
    chunked = extract_document(payload, None, ExtractConfig(chunk_chars=400))
    assert len(chunked) > 1
    assert [p.page_no for p in chunked] == list(range(1, len(chunked) + 1))
    joined = "\n\n".join(p.markdown for p in chunked)
    whole = extract_document(payload, None)[0].markdown
    assert joined == whole  # chunking changes the page model, not the bytes


def test_small_doc_untouched():
    md, spans = html_to_markdown("<article><p>tiny</p></article>")
    assert chunk_blocks(md, spans, 400) == [(md, spans)]
