"""Byte-identical golden tests (the north_rule correctness gate).

Two layers, mirroring the reference's snapshot strategy
(shared/outputs/0001-0040.md):

1. fixture goldens — handcrafted edge-case docs (tests/fixtures.py) frozen
   in tests/goldens/*.md; compared as BYTES.
2. corpus parity — the extractor over every synthesized sf0.001/sf0.01
   document must equal the closed-form expected output
   (synth.expected_markdown_pages), byte-for-byte per (url, page).
"""

from __future__ import annotations

import pathlib

import duckdb
import pytest

from tests.fixtures import FIXTURES
from tests.gen_goldens import render

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "goldens"


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_fixture_golden_bytes(name: str):
    got = render(name, FIXTURES[name]).encode("utf-8")
    want = (GOLDEN_DIR / f"{name}.md").read_bytes()
    assert got == want, f"golden drift for {name}"


def test_empty_payload_is_error_row():
    from zerox_spark.extract.core import extract_document

    out = extract_document(b"", None)
    assert out[0].status == "ERROR" and out[0].markdown == ""


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_corpus_byte_parity(sf: str):
    from zerox_spark.extract.core import extract_document
    from zerox_spark.operators.fold import apply_maintain_format
    from zerox_spark.synth import (
        expected_markdown_pages,
        is_fast,
        render_payload,
    )

    rows = duckdb.sql(
        f"SELECT doc_id, text, lang, source FROM '/root/testdata/{sf}/documents.parquet'"
    ).fetchall()
    assert rows
    for doc_id, text, lang, source in rows:
        payload = render_payload(doc_id, text, lang, source)
        trusted = text if is_fast(doc_id) else ""
        pages = extract_document(payload, trusted)
        folded = apply_maintain_format(
            [(p.page_no, p.markdown, p.status) for p in pages]
        )
        got = [(no, md) for no, md, _ in folded]
        assert got == expected_markdown_pages(doc_id, text, source), doc_id
