"""WARC ingestion: archive bytes → pages table → extraction, end to end."""

from __future__ import annotations

import datetime as dt

from zerox_spark.warc import parse_warc, read_warc, write_warc


def _records(doc_ids, text="alpha beta gamma delta epsilon zeta"):
    from zerox_spark.synth import doc_ts, doc_url, render_html

    return [
        (
            doc_url(i, "src0"),
            doc_ts(i).replace(tzinfo=None),
            render_html(i, text, "en", "src0"),
        )
        for i in doc_ids
    ]


def test_warc_roundtrip_gz_and_plain():
    recs = _records([2, 4, 6])
    for compress in (True, False):
        got = list(parse_warc(write_warc(recs, compress=compress)))
        assert got == recs


def test_warc_truncated_and_resync():
    recs = _records([2, 4, 6])
    plain = write_warc(recs, compress=False)
    # truncated mid-record: whole-record prefix survives
    assert len(list(parse_warc(plain[:-30]))) == 2
    # non-response record skipped; garbage between records resyncs
    extra = (
        b"WARC/1.0\r\nWARC-Type: request\r\nContent-Length: 3\r\n\r\nxyz\r\n\r\n"
        + b"garbage"
        + b"\r\n\r\n"
        + plain
    )
    assert len(list(parse_warc(extra))) == 3


def test_warc_oversized_record_skipped_not_fatal():
    from zerox_spark import warc as W

    recs = _records([2, 4])
    big = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://big.example/x\r\n"
        + f"Content-Length: {W.MAX_RECORD_BYTES + 100}\r\n\r\n".encode()
    )
    # oversized record APPEARS complete (length within data) → skipped,
    # following records still parse
    payload = big + b"\x00" * (W.MAX_RECORD_BYTES + 100) + b"\r\n\r\n"
    got = list(parse_warc(payload + write_warc(recs, compress=False)))
    assert [u for u, _, _ in got] == [u for u, _, _ in recs]


def test_read_warc_to_extraction_end_to_end(spark, tmp_path):
    """warc.gz files on disk → read_warc → extract_pages → the SAME
    markdown the closed-form spec predicts — the full raw-crawl-to-table
    loop."""
    from zerox_spark.extract.core import ExtractConfig
    from zerox_spark.operators.extract import extract_pages
    from zerox_spark.synth import expected_markdown_pages

    text = "the fast key order sort table scan merge part window small"
    ids_a, ids_b = [2, 4], [6, 8]
    (tmp_path / "a.warc.gz").write_bytes(write_warc(_records(ids_a, text)))
    (tmp_path / "b.warc.gz").write_bytes(write_warc(_records(ids_b, text)))

    pages = read_warc(spark, str(tmp_path / "*.warc.gz"), lang="en")
    ex = extract_pages(pages, ExtractConfig(trust_text=False), 4)
    got = {
        (r.url, r.page_no): r.markdown
        for r in ex.select("url", "page_no", "markdown").collect()
    }
    from zerox_spark.synth import doc_url

    expected = {}
    for i in ids_a + ids_b:
        for page_no, md in expected_markdown_pages(i, text, "src0"):
            expected[(doc_url(i, "src0"), page_no)] = md
    assert got == expected
