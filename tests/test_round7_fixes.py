"""Round-7 correctness fixes (the ADVICE r6 items), pinned.

- pdf: a BDC with fewer than two operands still OPENS a marked-content
  frame, so BDC/EMC nesting stays balanced on malformed streams and a
  later EMC can never close an enclosing /ActualText frame early.
- pdf: a single-stream /XFA whose XDP has NO datasets packet yields no
  field lines at all (the old whole-document fallback emitted template/
  config captions as 'field: value' lines).
- office_crypto: a multi-edit encrypted .ppt decrypts EVERY (persist id,
  offset) pair across the UserEdit chain — superseded copies included —
  so the linear record walker never parses leftover ciphertext; and
  adversarial persist directories with overlapping ranges raise the
  contained structure-mismatch error instead of double-transforming the
  overlap.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from zerox_spark.extract import office_crypto as oc
from zerox_spark.extract.cfb import write_cfb
from zerox_spark.extract.core import ExtractConfig, extract_document
from zerox_spark.extract.pdf import _rc4, real_pdf_to_pages
from zerox_spark.synth import _assemble_pdf, _det_bytes, _ppt_rec


# --------------------------------------------------------------------------
# BDC operand-starved marked-content balance


def _one_page(content: bytes) -> bytes:
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /Encoding /WinAnsiEncoding >>"
        ),
        4: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"
        ),
        5: (
            b"<< /Length %d >>\nstream\n" % len(content)
            + content
            + b"\nendstream"
        ),
    }
    return _assemble_pdf(objs)


def test_bare_bdc_keeps_actualtext_frame_balanced():
    # the bare (operand-less) BDC must push a frame: its matching EMC then
    # pops THAT frame, and the outer /ActualText span still covers every
    # run painted inside it — including the one after the inner EMC
    c = (
        b"BT /F1 12 Tf 72 700 Td"
        b" /Span << /ActualText (GOOD) >> BDC"
        b" (bad1) Tj BDC (bad2) Tj EMC (bad3) Tj EMC ET"
    )
    assert real_pdf_to_pages(_one_page(c))[0][1] == "GOOD"


def test_bare_bdc_unmatched_emc_still_contained():
    # nesting desync the other way: more EMC than frames — must not raise
    c = b"BT /F1 12 Tf 72 700 Td (keep) Tj EMC EMC ET"
    assert real_pdf_to_pages(_one_page(c))[0][1] == "keep"


# --------------------------------------------------------------------------
# single-stream XFA without a datasets packet


def test_xfa_without_datasets_emits_no_field_lines():
    ops = b"BT /F1 20 Tf 72 720 Td (XForm 9) Tj ET"
    comp = zlib.compress(ops)
    xdp = (
        b"<xdp:xdp xmlns:xdp='http://ns.adobe.com/xdp/'>"
        b"<template><subform><field name='f1'>"
        b"<caption><text>Click here</text></caption>"
        b"</field></subform></template>"
        b"<config><present><pdf><fontInfo><typeface>Myriad Pro"
        b"</typeface></fontInfo></pdf></present></config>"
        b"</xdp:xdp>"
    )
    objs = {
        1: (
            b"<< /Type /Catalog /Pages 2 0 R"
            b" /AcroForm << /Fields [] /XFA 6 0 R >> >>"
        ),
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /Encoding /WinAnsiEncoding >>"
        ),
        4: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 3 0 R >> >>"
            b" /Contents 5 0 R >>"
        ),
        5: (
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
            + comp
            + b"\nendstream"
        ),
        6: (
            b"<< /Length %d >>\nstream\n" % len(xdp) + xdp + b"\nendstream"
        ),
    }
    pages = real_pdf_to_pages(_assemble_pdf(objs))
    assert pages and "XForm 9" in pages[0][1]
    md = "\n".join(p[1] for p in pages)
    # the template caption and config strings must NOT surface as values
    assert "Click here" not in md
    assert "Myriad" not in md


# --------------------------------------------------------------------------
# multi-edit encrypted .ppt


def _enc_ppt(doc_id: int, extra_dir_entries: bytes = b"", two_edits: bool = False) -> bytes:
    """A render_ppt_encrypted-style deck, optionally with a SECOND edit
    whose re-persisted DocumentContainer supersedes the first (both copies
    encrypted, as PowerPoint leaves them), or with adversarial extra
    persist-directory entries."""

    def slide(title: str, para: str) -> bytes:
        recs = _ppt_rec(0, 0, 0x03F3, bytes(20))
        recs += _ppt_rec(0, 0, 0x0F9F, struct.pack("<I", 0))
        recs += _ppt_rec(0, 0, 0x0FA0, title.encode("utf-16-le"))
        recs += _ppt_rec(0, 0, 0x0F9F, struct.pack("<I", 1))
        recs += _ppt_rec(0, 0, 0x0FA0, para.encode("utf-16-le"))
        return recs

    def doc_container(tag: str) -> bytes:
        sltw = _ppt_rec(0xF, 0, 0x0FF0, slide(f"Document {doc_id}", tag))
        return _ppt_rec(0xF, 0, 0x03E8, sltw)

    salt = _det_bytes(f"ppt7:{doc_id}", 16)
    base = oc._xls_capi_base(salt, oc.DEFAULT_PASSWORD)
    cs_rec = _ppt_rec(
        0xF, 0, oc.PPT_CRYPTSESSION,
        oc.build_legacy_encryption_header(salt, capi=True),
    )

    doc_v1 = doc_container("version one")
    enc_v1 = _rc4(oc._xls_block_key(base, 1, True, 16), doc_v1)
    off_v1, off_cs = 0, len(enc_v1)
    off_pd1 = off_cs + len(cs_rec)
    pd1_body = struct.pack("<III", (2 << 20) | 1, off_v1, off_cs)
    pd1 = _ppt_rec(0, 0, oc.PPT_PERSISTDIR, pd1_body + extra_dir_entries)
    off_ue1 = off_pd1 + len(pd1)
    ue1 = _ppt_rec(
        0, 0, oc.PPT_USEREDIT,
        struct.pack(
            "<IHBBIIIIHHI", 0, 0, 0, 3, 0, off_pd1, 1, 3, 0, 0, 2
        ),
    )
    stream = enc_v1 + cs_rec + pd1 + ue1
    cur_edit = off_ue1
    if two_edits:
        off_v2 = off_ue1 + len(ue1)
        doc_v2 = doc_container("version two")
        enc_v2 = _rc4(oc._xls_block_key(base, 1, True, 16), doc_v2)
        off_pd2 = off_v2 + len(enc_v2)
        pd2 = _ppt_rec(
            0, 0, oc.PPT_PERSISTDIR,
            struct.pack("<III", (2 << 20) | 1, off_v2, off_cs),
        )
        off_ue2 = off_pd2 + len(pd2)
        ue2 = _ppt_rec(
            0, 0, oc.PPT_USEREDIT,
            struct.pack(
                "<IHBBIIIIHHI", 0, 0, 0, 3, off_ue1, off_pd2, 1, 3, 0, 0, 2
            ),
        )
        stream += enc_v2 + pd2 + ue2
        cur_edit = off_ue2
    cu = _ppt_rec(
        0, 0, oc.PPT_CURRENTUSER,
        struct.pack(
            "<IIIHHBBHI",
            0x14, oc.PPT_TOKEN_ENCRYPTED, cur_edit, 0, 0x03F4, 3, 0, 0, 0,
        ),
    )
    return write_cfb([("PowerPoint Document", stream), ("Current User", cu)])


def test_ppt_multi_edit_decrypts_superseded_copies():
    payload = _enc_ppt(11, two_edits=True)
    pages = extract_document(payload, None, ExtractConfig(trust_text=False))
    assert all(p.status == "SUCCESS" for p in pages)
    md = "\n".join(p.markdown for p in pages)
    # the current edit's content extracts...
    assert "version two" in md
    # ...and nothing surfaced as mojibake: every emitted char is sane text
    assert "�" not in md


def test_ppt_single_edit_still_roundtrips():
    pages = extract_document(
        _enc_ppt(11), None, ExtractConfig(trust_text=False)
    )
    assert all(p.status == "SUCCESS" for p in pages)
    assert "version one" in "\n".join(p.markdown for p in pages)


def test_ppt_overlapping_persist_ranges_contained():
    # adversarial directory: persist 5 points INSIDE persist 1's extent —
    # decrypting both would double-RC4 the overlap after the first header
    # validated; the decryptor must refuse with the contained error
    payload = _enc_ppt(
        11, extra_dir_entries=struct.pack("<II", (1 << 20) | 5, 4)
    )
    pages = extract_document(payload, None, ExtractConfig(trust_text=False))
    assert len(pages) == 1 and pages[0].status == "ERROR"
    assert "persist" in (pages[0].error or "")


def test_ppt_duplicate_offset_under_two_ids_contained():
    # same offset listed under two persist ids: refuse, don't double-RC4
    payload = _enc_ppt(
        11, extra_dir_entries=struct.pack("<II", (1 << 20) | 5, 0)
    )
    pages = extract_document(payload, None, ExtractConfig(trust_text=False))
    assert len(pages) == 1 and pages[0].status == "ERROR"


# --------------------------------------------------------------------------
# simhash vectorization (round 7): UDF output ≡ the old 64-column agg


def test_simhash_udf_matches_agg_formulation(spark):
    from pyspark.sql import functions as F

    from zerox_spark.operators.dedup import (
        _bit_lit,
        simhash,
        with_injected_duplicates,
    )
    from tests.conftest import SF_SMOKE

    corpus = with_injected_duplicates(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ).limit(150)
    # the historical aggregation formulation, inline as the reference
    sh = corpus.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("w"),
    ).select("doc_id", F.xxhash64(F.col("w")).alias("h"))
    bit_sums = sh.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(_bit_lit(i)) != 0, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    acc = F.when(F.col("b0") > 0, _bit_lit(0)).otherwise(F.lit(0).cast("long"))
    for i in range(1, 64):
        acc = acc.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, _bit_lit(i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    ref = {r.doc_id: r.s for r in bit_sums.select("doc_id", acc.alias("s")).collect()}
    got = {r.doc_id: r.simhash for r in simhash(corpus).collect()}
    assert got == ref and len(got) == 150
