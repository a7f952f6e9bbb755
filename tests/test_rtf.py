"""Unit tests: RTF group/control-word extraction (extract/rtf.py)."""

from __future__ import annotations

import pytest

from zerox_spark.extract.core import ExtractConfig, extract_document
from zerox_spark.extract.rtf import rtf_to_pages
from zerox_spark.synth import render_rtf


def test_rtf_renderer_two_pages_destinations_stripped():
    pages = rtf_to_pages(render_rtf(9, "w1 w2 w3"))
    assert [(n, md) for n, md, _ in pages] == [
        (1, "Document 9\n\nw1 w2 w3"),
        (2, "Section 9\n\nw1 w2 w3"),
    ]
    # fonttbl / {\*\generator} text must never leak
    assert "Times" not in pages[0][1]
    assert "zerox-spark-synth" not in pages[0][1]


def test_rtf_escapes_unicode_and_uc_skip():
    payload = (
        br"{\rtf1\ansi\uc1 caf\u233? x \'e9 \{a\} \\ \tab b\par}"
    )
    md = rtf_to_pages(payload)[0][1]
    assert md == "café x é {a} \\ b"


def test_rtf_uc0_no_fallback_and_negative_u():
    # \uc0: no fallback char follows \uN; negative \u is cp+65536
    payload = b"{\\rtf1\\uc0\\u-10179\\u-8704  ok\\par}"
    md = rtf_to_pages(payload)[0][1]
    assert md == "\U0001f600 ok"  # surrogate pair 0xD83D 0xDE00


def test_rtf_bin_payload_skipped_not_emitted():
    payload = b"{\\rtf1 a\\bin5 \x00\x01BINb\\par}"
    # \bin5 consumes ' ' + 4 raw bytes? no: param 5 → 5 bytes after the
    # control word's delimiter space: \x00\x01BIN — none of it is content
    md = rtf_to_pages(payload)[0][1]
    assert md == "ab"


def test_rtf_line_and_page_and_escaped_crlf():
    payload = b"{\\rtf1 one\\line two\\par\\page three\\par}"
    pages = rtf_to_pages(payload)
    assert [(n, md) for n, md, _ in pages] == [
        (1, "one two"),
        (2, "three"),
    ]


def test_rtf_routes_through_extract_document():
    out = extract_document(
        render_rtf(3, "hello world"), None, ExtractConfig(trust_text=False)
    )
    assert out[0].status == "SUCCESS"
    assert out[0].markdown == "Document 3\n\nhello world"


def test_rtf_mangled_markup_degrades_not_crashes():
    payload = b"{\\rtf1 text \\unknowncw99 more {\\unclosed stuff\\par"
    md = rtf_to_pages(payload)[0][1]
    assert "text" in md and "more" in md and "stuff" in md


def test_rtf_no_content_contained():
    out = extract_document(
        b"{\\rtf1{\\fonttbl{\\f0 F;}}}", None, ExtractConfig(trust_text=False)
    )
    assert out[0].status == "ERROR"
    assert "no content" in out[0].error


def test_non_rtf_brace_text_stays_plain_text():
    """A plain-text doc that merely starts with '{' is NOT rtf-routed."""
    out = extract_document(
        b"{note} first line\n\nsecond paragraph",
        None,
        ExtractConfig(trust_text=False),
    )
    assert out[0].status == "SUCCESS"
    assert out[0].markdown == "{note} first line\n\nsecond paragraph"


def test_rtf_strategy_registry():
    from zerox_spark.extract.core import get_extractor

    fn = get_extractor("rtf")
    assert fn(b"{\\rtf1 hi\\par}", None)[0][1] == "hi"
    with pytest.raises(ValueError, match="not an RTF"):
        fn(b"plain", None)


def test_rtf_par_inside_destination_does_not_split_visible_text():
    """A \\par (or escaped CRLF) inside a skipped destination must not
    flush/split the surrounding visible paragraph."""
    payload = b"{\\rtf1 Hello {\\footnote note text\\par more}world\\par}"
    pages = rtf_to_pages(payload)
    assert [md for _, md, _ in pages] == ["Hello world"]
    paged = b"{\\rtf1 one{\\header h\\page x}two\\par}"
    assert [md for _, md, _ in rtf_to_pages(paged)] == ["onetwo"]


def test_rtf_undefined_cp1252_raw_byte_degrades_not_crashes():
    payload = b"{\\rtf1 a\x81b\\par}"
    md = rtf_to_pages(payload)[0][1]
    assert md.startswith("a") and md.endswith("b")
