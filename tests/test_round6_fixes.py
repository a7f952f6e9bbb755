"""Round-6 fixes and features, pinned.

ADVICE r5 items:
- a /V4 crypt filter whose /CF entry (or /CFM) is MISSING defaults to
  /None per ISO 32000-1 §7.6.5 — pass-through, never RC4-garble
- known symbol-family BaseFonts (Wingdings, ZapfDingbats, ...) never get
  the cp1252 last-resort fill — they drop instead of emitting mojibake
- BIFF8 revision/locking records (UsrExcl/FileLock/RRDInfo/RRDHeadEr)
  are plaintext-exempt on encrypt AND decrypt (MS-XLS 2.2.10)
- /EncryptMetadata false leaves the /Metadata stream untouched by the
  cipher (it is stored in the clear)
"""

from __future__ import annotations

import zlib

import pytest

from zerox_spark.extract.pdf import (
    Document,
    Name,
    PdfError,
    Stream,
    _is_symbol_family,
    real_pdf_to_pages,
)
from zerox_spark.synth import _assemble_pdf


class _StubDoc:
    """resolve-identity stand-in for Font/_is_symbol_family unit tests."""

    def resolve(self, obj, depth: int = 0):
        return obj

    def stream_bytes(self, st: Stream) -> bytes:
        return st.raw


# --------------------------------------------------------------------------
# ADVICE #1: missing /CF entry or /CFM → identity (spec default /None)


def _v4_identity_pdf() -> bytes:
    """A /V4-encrypted PDF whose /StmF names a filter with NO /CF entry:
    per §7.6.5 the default /CFM is /None → nothing is actually encrypted,
    and the cleartext content must extract verbatim."""
    content = b"BT /F1 20 Tf 72 720 Td (Cleartext survives) Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
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
            f"<< /Length {len(content)} >>\nstream\n".encode()
            + content
            + b"\nendstream"
        ),
        6: (
            b"<< /Filter /Standard /V 4 /R 4 /CF << >>"
            b" /StmF /StdCF /StrF /StdCF >>"
        ),
    }
    return _assemble_pdf(
        objs, b"/Encrypt 6 0 R /ID [<0102030405060708> <0102030405060708>] "
    )


def test_missing_cf_entry_is_identity_not_rc4():
    pages = real_pdf_to_pages(_v4_identity_pdf())
    assert len(pages) == 1
    assert "Cleartext survives" in pages[0][1]


def test_unknown_cfm_still_raises():
    payload = _v4_identity_pdf().replace(
        b"/CF << >>", b"/CF << /StdCF << /CFM /AESV9 >> >>"
    )
    with pytest.raises(PdfError):
        real_pdf_to_pages(payload)


# --------------------------------------------------------------------------
# ADVICE #2: symbol-family BaseFonts never get the cp1252 fill


@pytest.mark.parametrize(
    "base,expected",
    [
        ("Wingdings", True),
        ("Wingdings2", True),
        ("ABCDEF+Wingdings-Regular", True),
        ("ZapfDingbats", True),
        ("Symbol", True),
        ("Webdings", True),
        ("Marlett", True),
        ("Helvetica", False),
        ("ABCDEF+TimesNewRoman", False),
        ("SymbolMT-NOT", True),  # prefix match is intentional
    ],
)
def test_symbol_family_detection(base, expected):
    fdict = {Name("BaseFont"): Name(base)}
    assert _is_symbol_family(_StubDoc(), fdict) is expected


def test_symbolic_dingbat_font_drops_instead_of_mojibake():
    from zerox_spark.extract.pdf import Font

    fdict = {
        Name("Subtype"): Name("TrueType"),
        Name("BaseFont"): Name("ABCDEF+Wingdings"),
        Name("FontDescriptor"): {Name("Flags"): 4},
    }
    font = Font(_StubDoc(), fdict)
    assert font.decode(b"\x4a\x4b\x4c") == ""  # drops, no Latin mojibake


def test_symbolic_latin_font_still_gets_recall_fill():
    from zerox_spark.extract.pdf import Font

    fdict = {
        Name("Subtype"): Name("TrueType"),
        Name("BaseFont"): Name("ABCDEF+SomeCorpFont"),
        Name("FontDescriptor"): {Name("Flags"): 4},
    }
    font = Font(_StubDoc(), fdict)
    assert font.decode(b"Hello") == "Hello"


# --------------------------------------------------------------------------
# ADVICE #3: BIFF8 plaintext-exempt records round-trip unchanged


def test_usrexcl_payload_survives_encrypt_decrypt():
    import struct

    from zerox_spark.extract import office_crypto as oc

    def rec(op: int, body: bytes) -> bytes:
        return struct.pack("<HH", op, len(body)) + body

    wb = (
        rec(0x0809, b"\x00" * 16)  # BOF
        + rec(0x0194, b"USREXCL-CLEAR-01")  # UsrExcl
        + rec(0x0195, b"FILELOCK-CLEAR-1")  # FileLock
        + rec(0x0196, b"RRDINFO-CLEAR-01")  # RRDInfo
        + rec(0x0138, b"RRDHEADER-CLEAR!")  # RRDHeadEr
        + rec(0x0203, struct.pack("<HHHd", 0, 0, 0, 1.5))  # Number
        + rec(0x000A, b"")  # EOF
    )
    enc = oc.encrypt_xls_stream(wb, b"\x11" * 16)
    # the clear payloads appear verbatim in the ENCRYPTED stream
    for marker in (
        b"USREXCL-CLEAR-01",
        b"FILELOCK-CLEAR-1",
        b"RRDINFO-CLEAR-01",
        b"RRDHEADER-CLEAR!",
    ):
        assert marker in enc
    # round trip: decrypt leaves FilePass in place (documented) — every
    # OTHER record must come back byte-identical
    dec = oc.decrypt_xls_stream(enc)

    def records(buf: bytes):
        pos, out = 0, []
        while pos + 4 <= len(buf):
            op, ln = struct.unpack_from("<HH", buf, pos)
            out.append((op, buf[pos + 4 : pos + 4 + ln]))
            pos += 4 + ln
        return out

    assert [r for r in records(dec) if r[0] != oc.XLS_FILEPASS] == records(wb)


# --------------------------------------------------------------------------
# ADVICE #4: /EncryptMetadata false → /Metadata stream passes the cipher


def test_metadata_stream_skips_decryption_when_cleartext():
    xml = b"<x:xmpmeta>clear</x:xmpmeta>"

    class _Crypt:
        encrypt_metadata = False
        cfm = "rc4"
        str_cfm = "rc4"

        def decrypt(self, num, gen, data):
            return bytes(b ^ 0xFF for b in data)  # would garble

    doc = Document.__new__(Document)
    doc._decoded = {}
    doc._budget = 1 << 20
    doc.crypt = _Crypt()
    meta = Stream({Name("Type"): Name("Metadata")}, xml)
    meta.objnum = 7
    assert doc.stream_bytes(meta) == xml
    # control: an ordinary stream still goes through the cipher
    other = Stream({}, xml)
    other.objnum = 8
    assert doc.stream_bytes(other) == bytes(b ^ 0xFF for b in xml)


def test_metadata_stream_decrypts_when_encrypt_metadata_true():
    xml = b"<x:xmpmeta>enc</x:xmpmeta>"

    class _Crypt:
        encrypt_metadata = True
        cfm = "rc4"
        str_cfm = "rc4"

        def decrypt(self, num, gen, data):
            return bytes(b ^ 0xFF for b in data)

    doc = Document.__new__(Document)
    doc._decoded = {}
    doc._budget = 1 << 20
    doc.crypt = _Crypt()
    meta = Stream({Name("Type"): Name("Metadata")}, bytes(b ^ 0xFF for b in xml))
    meta.objnum = 7
    assert doc.stream_bytes(meta) == xml


_ = zlib  # keep import for later fixture additions


# --------------------------------------------------------------------------
# round-6 features: figure placeholders, Type 3 fonts, accented subset
# fonts, XFA datasets, encrypted legacy .doc/.ppt

import pathlib
import struct

from zerox_spark.extract.core import extract_document
from zerox_spark.synth import (
    _assemble_pdf as _asm,
    expected_pdf_accent_page,
    expected_pdf_real_pages,
    expected_pdf_xfa_page,
    render_doc_encrypted,
    render_pdf_accent_cff,
    render_pdf_accent_post,
    render_pdf_real,
    render_pdf_xfa,
    render_ppt_encrypted,
)

_FIXTURES = pathlib.Path(__file__).parent / "fixtures"
TEXT = (
    "quarterly revenue grew nine percent across the northern region"
    " while costs held flat"
)


def _success_pages(payload: bytes):
    pages = extract_document(payload, None)
    assert all(p.status == "SUCCESS" for p in pages), [
        (p.status, p.error) for p in pages
    ]
    return [(p.page_no, p.markdown) for p in pages]


class TestFigurePlaceholder:
    def test_figure_variant_roundtrip(self):
        for doc_id in (4, 10, 16, 22):
            got = _success_pages(render_pdf_real(doc_id, TEXT))
            assert got == expected_pdf_real_pages(doc_id, TEXT)
            assert "![figure](#)" in got[0][1]
            assert "![figure](#)" not in got[1][1]

    def test_type3_variant_roundtrip(self):
        for doc_id in (5, 11, 17, 23):
            got = _success_pages(render_pdf_real(doc_id, TEXT))
            assert got == expected_pdf_real_pages(doc_id, TEXT)

    def _one_page(self, content: bytes, xobj: bytes | None = None) -> bytes:
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
            3: (
                b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
                b" /Encoding /WinAnsiEncoding >>"
            ),
            4: (
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
                b" /Resources << /Font << /F1 3 0 R >>"
                + (b" /XObject << /Im0 6 0 R >>" if xobj else b"")
                + b" >> /Contents 5 0 R >>"
            ),
            5: (
                b"<< /Length %d >>\nstream\n" % len(content)
                + content
                + b"\nendstream"
            ),
        }
        if xobj:
            objs[6] = xobj
        return _asm(objs)

    _IMG = (
        b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2"
        b" /ColorSpace /DeviceGray /BitsPerComponent 8 /Length 4 >>\n"
        b"stream\n\x00\x01\x02\x03\nendstream"
    )

    def test_small_image_is_decoration_not_figure(self):
        # a 12×12-pt bullet never becomes a figure placeholder
        content = (
            b"BT /F1 20 Tf 72 720 Td (Head line) Tj ET\n"
            b"q 12 0 0 12 72 600 cm /Im0 Do Q\n"
            b"BT /F1 11 Tf 72 500 Td (Body line) Tj ET"
        )
        md = _success_pages(self._one_page(content, self._IMG))[0][1]
        assert "![figure](#)" not in md
        assert "Head line" in md and "Body line" in md

    def test_inline_image_emits_placeholder(self):
        content = (
            b"BT /F1 20 Tf 72 720 Td (Head line) Tj ET\n"
            b"q 100 0 0 80 72 580 cm"
            b" BI /W 2 /H 2 /CS /G /BPC 8 ID \x00\x01\x02\x03 EI Q\n"
            b"BT /F1 11 Tf 72 500 Td (Body line) Tj ET"
        )
        md = _success_pages(self._one_page(content))[0][1]
        assert md == "# Head line\n\n![figure](#)\n\nBody line"

    def test_tiled_strips_collapse_to_one_placeholder(self):
        # one image painted as four adjacent strips (a common generator
        # pattern) → a single placeholder block
        strips = b"\n".join(
            b"q 400 0 0 30 72 %d cm /Im0 Do Q" % (600 - 30 * i)
            for i in range(4)
        )
        content = (
            b"BT /F1 20 Tf 72 720 Td (Head line) Tj ET\n" + strips +
            b"\nBT /F1 11 Tf 72 400 Td (Body line) Tj ET"
        )
        md = _success_pages(self._one_page(content, self._IMG))[0][1]
        assert md.count("![figure](#)") == 1

    def test_image_only_page_stays_contained_error(self):
        # a scanned page (one full-page image, no text) keeps the honest
        # no-OCR contract: contained ERROR, not a placeholder-only SUCCESS
        content = b"q 468 0 0 648 72 72 cm /Im0 Do Q"
        pages = extract_document(self._one_page(content, self._IMG), None)
        assert [p.status for p in pages] == ["ERROR"]


class TestAccentSubsetFonts:
    def test_cff_sid_roundtrip(self):
        for doc_id in (5, 13, 21, 77):
            got = _success_pages(render_pdf_accent_cff(doc_id))
            assert got == [(1, expected_pdf_accent_page(doc_id, "cff"))]

    def test_ttf_post_roundtrip(self):
        for doc_id in (6, 14, 22, 78):
            got = _success_pages(render_pdf_accent_post(doc_id))
            assert got == [(1, expected_pdf_accent_page(doc_id, "post"))]

    def test_fixture_pins(self):
        assert _success_pages(
            (_FIXTURES / "accent_cff.pdf").read_bytes()
        ) == [(1, "# Résumé 5\n\nLe café coûte 15 euros déjà")]
        assert _success_pages(
            (_FIXTURES / "accent_post.pdf").read_bytes()
        ) == [(1, "# Übersicht 6\n\nStraße Nr 16 für Köln")]

    def test_font_program_bitflip_contained(self):
        # flipping any byte of the embedded font program must never raise
        # and never emit DIFFERENT accented chars — drops and errors only
        base = render_pdf_accent_cff(5)
        start = base.find(b"stream", base.find(b"/FontFile3"))
        for pos in range(start + 10, start + 60):
            broken = bytearray(base)
            broken[pos] ^= 0xFF
            pages = extract_document(bytes(broken), None)
            for p in pages:
                assert p.status in ("SUCCESS", "ERROR")


class TestXfaDatasets:
    def test_roundtrip(self):
        for doc_id in (7, 15, 23, 55):
            got = _success_pages(render_pdf_xfa(doc_id))
            assert got == [(1, expected_pdf_xfa_page(doc_id))]

    def test_fixture_pin(self):
        assert _success_pages((_FIXTURES / "xfa_form.pdf").read_bytes()) == [
            (1, "# XForm 7\n\napplicant: Applicant 7\n\namount: 49")
        ]

    def test_malformed_datasets_xml_contained(self):
        pdf = render_pdf_xfa(7).replace(b"</xfa:datasets>", b"</broken")
        pages = extract_document(pdf, None)
        # broken packet → values drop, the page's own text survives
        assert pages[0].status == "SUCCESS"
        assert "XForm 7" in pages[0].markdown
        assert "applicant" not in pages[0].markdown

    def test_widget_values_suppress_datasets_fold(self):
        # when ANY annotation carried a value, the datasets fold must not
        # run (it would duplicate the widget harvest)
        from zerox_spark.synth import render_pdf_form

        pdf = render_pdf_form(3, TEXT)
        md = _success_pages(pdf)[0][1]
        assert md.count("Applicant 3") == 1


class TestEncryptedLegacyOffice:
    def test_doc_rc4_roundtrip(self):
        from zerox_spark.synth import render_doc

        for doc_id, capi in ((9, False), (13, True)):
            got = _success_pages(render_doc_encrypted(doc_id, TEXT, capi))
            clear = _success_pages(render_doc(doc_id, TEXT))
            assert got == clear

    def test_ppt_capi_roundtrip(self):
        got = _success_pages(render_ppt_encrypted(11, TEXT))
        assert got[0][1].startswith("# Document 11")
        assert TEXT in got[0][1]
        assert got[1][1].startswith("# Section 11")

    def test_fixture_pins(self):
        for name, did in (("doc_rc4.cfb", 9), ("doc_capi.cfb", 13)):
            got = _success_pages((_FIXTURES / name).read_bytes())
            assert got == [
                (1, f"Document {did}\n\n{TEXT}"),
                (
                    2,
                    f"Section {did}\n\n"
                    "quarterly revenue grew nine percent across the"
                    " northern region while",
                ),
            ], name
        got = _success_pages((_FIXTURES / "ppt_capi.cfb").read_bytes())
        assert got[0] == (1, f"# Document 11\n\n{TEXT}")

    def test_wrong_password_contained(self):
        # a non-default password is indistinguishable from a corrupted
        # verifier: flip one verifier byte → the reader must refuse with
        # a clear password error, never walk a garbled piece table
        from zerox_spark.extract.cfb import CfbReader, write_cfb

        doc = render_doc_encrypted(9, TEXT, capi=False)
        cfb = CfbReader(doc)
        table = bytearray(cfb.read_stream("1Table"))
        table[20] ^= 0xFF  # RC4 header: ver(4) + salt(16) + verifier
        p = extract_document(
            write_cfb(
                [
                    ("WordDocument", cfb.read_stream("WordDocument")),
                    ("1Table", bytes(table)),
                ]
            ),
            None,
        )[0]
        assert p.status == "ERROR" and "password" in (p.error or "")

        ppt = render_ppt_encrypted(11, TEXT)
        cfb = CfbReader(ppt)
        stream = bytearray(cfb.read_stream("PowerPoint Document"))
        csp = "Microsoft Enhanced Cryptographic Provider v1.0\x00".encode(
            "utf-16-le"
        )
        idx = bytes(stream).find(csp)
        assert idx > 0
        stream[idx + len(csp) + 4 + 16] ^= 0xFF  # CAPI verifier byte
        p = extract_document(
            write_cfb(
                [
                    ("PowerPoint Document", bytes(stream)),
                    ("Current User", cfb.read_stream("Current User")),
                ]
            ),
            None,
        )[0]
        assert p.status == "ERROR" and "password" in (p.error or "")

    def test_doc_bitflip_never_raises(self):
        base = render_doc_encrypted(9, TEXT, capi=False)
        for pos in range(700, len(base), max(1, len(base) // 80)):
            broken = bytearray(base)
            broken[pos] ^= 0xFF
            for p in extract_document(bytes(broken), None):
                assert p.status in ("SUCCESS", "ERROR")

    def test_ppt_bitflip_never_raises(self):
        base = render_ppt_encrypted(11, TEXT)
        for pos in range(600, len(base), max(1, len(base) // 80)):
            broken = bytearray(base)
            broken[pos] ^= 0xFF
            for p in extract_document(bytes(broken), None):
                assert p.status in ("SUCCESS", "ERROR")


_ = struct  # symmetry with the fuzz helpers above


def test_xfa_entity_bomb_rejected():
    # a billion-laughs datasets packet must be refused pre-parse (ET
    # expands internal entities; the 4 MB cap checks pre-expansion bytes)
    bomb = (
        '<!DOCTYPE x [<!ENTITY a "aaaaaaaaaa">'
        '<!ENTITY b "&a;&a;&a;&a;&a;&a;&a;&a;&a;&a;">]>'
        '<xfa:datasets xmlns:xfa="http://www.xfa.org/schema/xfa-data/1.0/">'
        "<xfa:data><f><v>&b;</v></f></xfa:data></xfa:datasets>"
    ).encode()
    pdf = render_pdf_xfa(7)
    from zerox_spark.synth import _XFA_DATASETS

    ds = _XFA_DATASETS.format(d=7, a=49).encode()
    assert ds in pdf
    # splice the bomb in with a corrected /Length
    broken = pdf.replace(
        b"<< /Length %d >>\nstream\n" % len(ds) + ds,
        b"<< /Length %d >>\nstream\n" % len(bomb) + bomb,
    )
    import time

    t0 = time.time()
    pages = extract_document(broken, None)
    assert time.time() - t0 < 5
    # page text survives, the poisoned packet contributes nothing
    assert pages[0].status == "SUCCESS"
    assert "applicant" not in pages[0].markdown


def test_type3_fontmatrix_scales_widths():
    # §9.6.5: Type 3 /Widths are glyph-space — a dvips-style
    # FontMatrix [0.01 ...] means width 50 = 0.5 text units, which the
    # /1000-convention store must hold as 500
    from zerox_spark.extract.pdf import Font

    def fdict(matrix):
        return {
            Name("Subtype"): Name("Type3"),
            Name("FontMatrix"): matrix,
            Name("FirstChar"): 65,
            Name("Widths"): [50.0, 70.0],
            Name("Encoding"): {Name("Differences"): [65, Name("A"), Name("B")]},
        }

    f = Font(_StubDoc(), fdict([0.01, 0, 0, 0.01, 0, 0]))
    assert f.width(65) == 500.0 and f.width(66) == 700.0
    # the standard matrix is a no-op
    f = Font(_StubDoc(), fdict([0.001, 0, 0, 0.001, 0, 0]))
    assert f.width(65) == 50.0
    # decode still rides /Differences
    assert f.decode(b"AB") == "AB"


def test_type3_letter_spaced_tj_with_coarse_matrix():
    # end-to-end: a Type 3 font with FontMatrix [0.01 ...] and
    # glyph-space widths through the exact-advance TJ path — kern -60
    # (0.06 em) must merge, word gaps must split, exactly like the
    # standard-matrix fonts
    import zlib as _z

    text = "UNITED WORDS HERE"
    chars = sorted(set(text) - {" "})
    diffs = " ".join(f"{ord(c)} /{c}" for c in chars)
    parts = []
    for i, w in enumerate(text.split(" ")):
        if i:
            parts.append("-700")
        for j, ch in enumerate(w):
            if j:
                parts.append("-60")
            parts.append(f"({ch})")
    content = f"BT /F1 12 Tf 72 700 Td [{' '.join(parts)}] TJ ET".encode()
    comp = _z.compress(content)
    widths = " ".join(["50"] * 224)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Font /Subtype /Type3"
            b" /FontBBox [0 0 100 100] /FontMatrix [0.01 0 0 0.01 0 0]"
            b" /CharProcs << "
            + " ".join(f"/{c} 6 0 R" for c in chars).encode()
            + b" >> /Encoding << /Differences ["
            + diffs.encode()
            + b"] >> /FirstChar 32 /LastChar 255 /Widths ["
            + widths.encode()
            + b"] >>"
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
        6: b"<< /Length 7 >>\nstream\n50 0 d0\nendstream",
    }
    pages = real_pdf_to_pages(_assemble_pdf(objs))
    assert pages and pages[0][1] == "UNITED WORDS HERE"


# --------------------------------------------------------------------------
# /ActualText marked-content spans (§14.9.4 — the replacement-text
# semantics poppler honors: ligature fix-ups, dehyphenation, alt text)


class TestActualText:
    def _one_page(self, content: bytes, props: bytes | None = None) -> bytes:
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
            3: (
                b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
                b" /Encoding /WinAnsiEncoding >>"
            ),
            4: (
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
                b" /Resources << /Font << /F1 3 0 R >>"
                + (b" /Properties << /MC0 6 0 R >>" if props else b"")
                + b" >> /Contents 5 0 R >>"
            ),
            5: (
                b"<< /Length %d >>\nstream\n" % len(content)
                + content
                + b"\nendstream"
            ),
        }
        if props:
            objs[6] = props
        return _assemble_pdf(objs)

    def test_inline_span_replaces_shown_text(self):
        c = (
            b"BT /F1 12 Tf 72 700 Td (The ) Tj"
            b" /Span << /ActualText (effective) >> BDC (e@ective) Tj EMC"
            b" ( rate) Tj ET"
        )
        assert real_pdf_to_pages(self._one_page(c))[0][1] == (
            "The effective rate"
        )

    def test_empty_actualtext_removes_content(self):
        c = (
            b"BT /F1 12 Tf 72 700 Td (estab) Tj"
            b" /Span << /ActualText () >> BDC (-HYPHEN-) Tj EMC ET"
        )
        assert real_pdf_to_pages(self._one_page(c))[0][1] == "estab"

    def test_indirect_properties_and_utf16(self):
        at = b"\xfe\xff" + "naïve".encode("utf-16-be")
        props = b"<< /ActualText <" + at.hex().encode() + b"> >>"
        c = (
            b"BT /F1 12 Tf 72 700 Td /Span /MC0 BDC (na@ve) Tj EMC"
            b" ( idea) Tj ET"
        )
        assert real_pdf_to_pages(self._one_page(c, props))[0][1] == (
            "naïve idea"
        )

    def test_plain_bmc_emc_transparent_and_unbalanced_tolerated(self):
        c = b"BT /F1 12 Tf 72 700 Td /P BMC (kept) Tj EMC ET"
        assert real_pdf_to_pages(self._one_page(c))[0][1] == "kept"
        c = b"BT /F1 12 Tf 72 700 Td EMC (survives) Tj EMC EMC ET"
        assert real_pdf_to_pages(self._one_page(c))[0][1] == "survives"

    def test_nested_spans_outer_wins(self):
        c = (
            b"BT /F1 12 Tf 72 700 Td"
            b" /Span << /ActualText (OUTER) >> BDC (a) Tj"
            b" /Span << /ActualText (inner) >> BDC (b) Tj EMC"
            b" (c) Tj EMC ET"
        )
        assert real_pdf_to_pages(self._one_page(c))[0][1] == "OUTER"

    def test_variant5_heading_is_actualtext_borne(self):
        # the synth Type 3 variant paints a scrambled heading whose true
        # text exists ONLY in /ActualText — the family oracle therefore
        # locks the feature
        import re

        from zerox_spark.synth import render_pdf_real

        pdf = render_pdf_real(5, TEXT)
        streams = [
            zlib.decompress(m.group(1))
            for m in re.finditer(rb"stream\n(.*?)\nendstream", pdf, re.S)
            if m.group(1).startswith(b"\x78")
        ]
        assert any(b"ActualText" in s for s in streams)
        pages = real_pdf_to_pages(pdf)
        assert pages[0][1].startswith("# Document 5")


# --------------------------------------------------------------------------
# wrapped-cell column merge (round 6): 2-3 consecutive lines whose wide
# aligned gaps form 2-3 columns of PROSE cells read column-major — the
# "(State or other jurisdiction of | (I.R.S. Employer" 10-Q shape


class TestWrappedCellMerge:
    def _pdf(self, ops: str) -> bytes:
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
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
                b"<< /Length %d >>\nstream\n" % len(ops.encode())
                + ops.encode()
                + b"\nendstream"
            ),
        }
        return _assemble_pdf(objs)

    def test_parenthetical_pair_reads_column_major(self):
        ops = "\n".join(
            [
                "BT /F1 10 Tf 72 700 Td (heading words here) Tj ET",
                "BT /F1 10 Tf 90 650 Td (State or other jurisdiction of) Tj ET",
                "BT /F1 10 Tf 330 650 Td (I.R.S. Employer words) Tj ET",
                "BT /F1 10 Tf 92 636 Td (incorporation or organization) Tj ET",
                "BT /F1 10 Tf 332 636 Td (Identification No. here) Tj ET",
            ]
        )
        md = real_pdf_to_pages(self._pdf(ops))[0][1]
        flat = md.replace("\n", " ")
        assert "State or other jurisdiction of incorporation or organization" in flat
        assert "I.R.S. Employer words Identification No. here" in flat

    def test_value_table_stays_row_major(self):
        # numeric value cells must keep row association
        ops = "\n".join(
            [
                "BT /F1 10 Tf 72 650 Td (Total revenue for year) Tj ET",
                "BT /F1 10 Tf 330 650 Td (100) Tj ET",
                "BT /F1 10 Tf 72 636 Td (Net operating income) Tj ET",
                "BT /F1 10 Tf 330 636 Td (50) Tj ET",
            ]
        )
        md = real_pdf_to_pages(self._pdf(ops))[0][1].replace("\n", " ")
        assert md.index("Total revenue for year") < md.index("100")
        assert md.index("100") < md.index("Net operating income")

    def test_long_prose_columns_read_column_major(self):
        # a 6-row aligned window of LONG cells on both sides is
        # indistinguishable from two prose columns sharing a line grid —
        # the XY-cut prose gate reads it column-major (each column
        # contiguous); only short value cells force row-major
        ops = "\n".join(
            f"BT /F1 10 Tf {x} {700 - 14 * i} Td ({side}cell{i} extra words) Tj ET"
            for i in range(6)
            for x, side in ((72, "left"), (330, "right"))
        )
        md = real_pdf_to_pages(self._pdf(ops))[0][1].replace("\n", " ")
        assert md.index("leftcell5") < md.index("rightcell0")


# --------------------------------------------------------------------------
# round-6 self-review regressions


class TestReviewRound6:
    def test_vh_size_bomb_contained_fast(self):
        # a crafted verifierHashSize must be rejected at parse, never
        # drive gigabytes of RC4 keystream per password attempt
        import time

        from zerox_spark.extract.cfb import CfbReader, write_cfb

        base = render_doc_encrypted(9, TEXT, capi=True)
        cfb = CfbReader(base)
        table = bytearray(cfb.read_stream("1Table"))
        csp = "Microsoft Enhanced Cryptographic Provider v1.0\x00".encode(
            "utf-16-le"
        )
        at = bytes(table).find(csp) + len(csp) + 4 + 16 + 16
        struct.pack_into("<I", table, at, 0xFFFFFFF0)
        bomb = write_cfb(
            [
                ("WordDocument", cfb.read_stream("WordDocument")),
                ("1Table", bytes(table)),
            ]
        )
        t0 = time.time()
        p = extract_document(bomb, None)[0]
        assert time.time() - t0 < 5
        assert p.status == "ERROR"
        assert "out of range" in (p.error or "")

    def test_image_only_appearance_falls_back_to_value(self):
        # a widget whose /AP paints ONLY an image (signature stamp) must
        # still emit the typed /V
        img = (
            b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2"
            b" /ColorSpace /DeviceGray /BitsPerComponent 8 /Length 4 >>\n"
            b"stream\n\x00\x01\x02\x03\nendstream"
        )
        ap = b"q 180 0 0 40 10 5 cm /Im0 Do Q"
        objs = {
            1: (
                b"<< /Type /Catalog /Pages 2 0 R"
                b" /AcroForm << /Fields [6 0 R] >> >>"
            ),
            2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
            3: (
                b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
                b" /Encoding /WinAnsiEncoding >>"
            ),
            4: (
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
                b" /Resources << /Font << /F1 3 0 R >> >>"
                b" /Contents 5 0 R /Annots [6 0 R] >>"
            ),
            5: (
                b"<< /Length 44 >>\nstream\n"
                b"BT /F1 20 Tf 72 720 Td (Form head) Tj ET\nendstream"
            ),
            6: (
                b"<< /Type /Annot /Subtype /Widget /FT /Tx"
                b" /T (applicant) /V (John Q Applicant)"
                b" /Rect [72 600 372 650] /AP << /N 7 0 R >> >>"
            ),
            7: (
                b"<< /Type /XObject /Subtype /Form /BBox [0 0 300 50]"
                b" /Resources << /XObject << /Im0 8 0 R >> >>"
                b" /Length %d >>\nstream\n" % len(ap)
                + ap
                + b"\nendstream"
            ),
            8: img,
        }
        md = real_pdf_to_pages(_assemble_pdf(objs))[0][1]
        assert "John Q Applicant" in md

    def test_hairline_rule_image_is_not_a_figure(self):
        content = (
            b"BT /F1 20 Tf 72 720 Td (Head line) Tj ET\n"
            b"q 468 0 0 1 72 700 cm /Im0 Do Q\n"
            b"BT /F1 11 Tf 72 600 Td (Body line) Tj ET"
        )
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
            3: (
                b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
                b" /Encoding /WinAnsiEncoding >>"
            ),
            4: (
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
                b" /Resources << /Font << /F1 3 0 R >>"
                b" /XObject << /Im0 6 0 R >> >>"
                b" /Contents 5 0 R >>"
            ),
            5: (
                b"<< /Length %d >>\nstream\n" % len(content)
                + content
                + b"\nendstream"
            ),
            6: (
                b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2"
                b" /ColorSpace /DeviceGray /BitsPerComponent 8"
                b" /Length 4 >>\nstream\n\x00\x01\x02\x03\nendstream"
            ),
        }
        md = real_pdf_to_pages(_assemble_pdf(objs))[0][1]
        assert "![figure](#)" not in md

    def test_header_row_does_not_swallow_wrapped_pair(self):
        # a short header row above a wrapped prose pair: the pair's own
        # window must still merge column-major
        ops = "\n".join(
            [
                "BT /F1 10 Tf 90 664 Td (Name) Tj ET",
                "BT /F1 10 Tf 330 664 Td (Date) Tj ET",
                "BT /F1 10 Tf 90 650 Td (State or other jurisdiction of) Tj ET",
                "BT /F1 10 Tf 330 650 Td (I.R.S. Employer words) Tj ET",
                "BT /F1 10 Tf 92 636 Td (incorporation or organization) Tj ET",
                "BT /F1 10 Tf 332 636 Td (Identification No. here) Tj ET",
            ]
        )
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
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
                b"<< /Length %d >>\nstream\n" % len(ops.encode())
                + ops.encode()
                + b"\nendstream"
            ),
        }
        flat = real_pdf_to_pages(_assemble_pdf(objs))[0][1].replace("\n", " ")
        assert (
            "State or other jurisdiction of incorporation or organization"
            in flat
        )


class TestReviewRound6Pass2:
    def test_four_row_aligned_table_stays_whole_row_major(self):
        # a 4+-row aligned window of long cells is a real table: it must
        # pass through WHOLE — never shed rows until a trailing pair or
        # triple merges column-major
        ops = "\n".join(
            f"BT /F1 10 Tf {x} {700 - 14 * i} Td ({side}term{i} definition words) Tj ET"
            for i in range(4)
            for x, side in ((90, "alpha"), (330, "beta"))
        )
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
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
                b"<< /Length %d >>\nstream\n" % len(ops.encode())
                + ops.encode()
                + b"\nendstream"
            ),
        }
        from zerox_spark.extract.pdf import (
            _interpret as _interp,
            _IDENTITY as _ID,
            Document as _Doc,
            _merge_wrapped_cells,
            runs_to_lines,
        )

        doc = _Doc(_assemble_pdf(objs))
        page = list(doc.pages())[0]
        content = doc.stream_bytes(doc.resolve(page[Name("Contents")]))
        res = doc.resolve(page.get(Name("Resources"))) or {}
        runs = []
        _interp(doc, content, res, runs, _ID, 0)
        # bypass XY-cut (which may column-cut this prose shape) — the
        # line assembler itself must keep all four rows row-major
        texts = [ln.text for ln in runs_to_lines(runs)]
        assert texts == [
            f"alphaterm{i} definition words betaterm{i} definition words"
            for i in range(4)
        ]

    def test_standard_ooxml_zero_vhsize_rejected(self):
        import hashlib as _hl

        from zerox_spark.extract import office_crypto as oc
        from zerox_spark.extract.cfb import write_cfb
        from zerox_spark.synth import render_xlsx

        info, pkg = oc.encrypt_ooxml_standard(
            render_xlsx(6), _hl.sha256(b"s").digest()[:16]
        )
        # verifierHashSize sits after header + salt_size(4)+salt(16)+verifier(16)
        (hdr_size,) = struct.unpack_from("<I", info, 8)
        at = 12 + hdr_size + 4 + 16 + 16
        broken = bytearray(info)
        struct.pack_into("<I", broken, at, 0)
        p = extract_document(
            write_cfb(
                [("EncryptionInfo", bytes(broken)), ("EncryptedPackage", pkg)]
            ),
            None,
        )[0]
        assert p.status == "ERROR"
        assert "out of range" in (p.error or "")


# --------------------------------------------------------------------------
# property tests: the new line-assembly paths never lose or duplicate text


class TestLayoutProperties:
    def test_merge_preserves_word_multiset(self):
        # whatever windows merge, the words on the page are exactly the
        # words in the runs — no loss, no duplication, for a sweep of
        # geometries (aligned, misaligned, ragged, value-like, prose)
        from collections import Counter

        from zerox_spark.extract.pdf import Run, runs_to_lines

        rng_words = [f"w{i}tok" for i in range(40)]
        for seed in range(30):
            runs = []
            y = 700.0
            n_lines = 2 + seed % 5
            k = 1 + seed % 3
            for li in range(n_lines):
                x = 72.0
                for c in range(k):
                    nw = 1 + (seed + li + c) % 4
                    words = [
                        rng_words[(seed * 7 + li * 5 + c * 3 + wi) % 40]
                        for wi in range(nw)
                    ]
                    text = " ".join(words)
                    w_est = 5.0 * len(text)
                    runs.append(Run(x, y, 10.0, text, x + w_est, y))
                    x += w_est + (8.0 if seed % 2 else 40.0)
                y -= 10.0 + (seed % 7)
            want = Counter(
                w for r in runs for w in r.text.split(" ")
            )
            got = Counter(
                w
                for ln in runs_to_lines(runs)
                for w in ln.text.split(" ")
                if w
            )
            assert got == want, seed

    def test_actualtext_replacement_is_exact(self):
        # nested/unbalanced spans over arbitrary content: output text is
        # outside-text plus each outermost span's ActualText, in order
        content = (
            b"BT /F1 12 Tf 72 700 Td (pre ) Tj"
            b" /Span << /ActualText (ONE) >> BDC (dropped a) Tj"
            b" /Span << /ActualText (inner) >> BDC (dropped b) Tj EMC"
            b" (dropped c) Tj EMC"
            b" ( mid ) Tj"
            b" /Span << /ActualText () >> BDC (erased) Tj EMC"
            b" (post) Tj ET"
        )
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
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
                b"<< /Length %d >>\nstream\n" % len(content)
                + content
                + b"\nendstream"
            ),
        }
        md = real_pdf_to_pages(_assemble_pdf(objs))[0][1]
        assert md == "pre ONE mid post"
        assert "dropped" not in md and "erased" not in md


def test_cmap_format12_unicode_inversion():
    # modern fonts carry their Unicode map as a (3,10) format-12
    # subtable; glyph→unicode inversion must ride it like (3,1)
    from zerox_spark.extract.truetype import decode_map_from_ttf

    def sfnt(tables):
        out = bytearray(
            struct.pack(">IHHHH", 0x00010000, len(tables), 0, 0, 0)
        )
        off = 12 + 16 * len(tables)
        recs = b""
        body = b""
        for tag, data in tables:
            recs += tag + struct.pack(">III", 0, off, len(data))
            body += data
            off += len(data)
        return bytes(out) + recs + body

    cmap6 = struct.pack(">HHHHH", 6, 18, 0, 0x80, 4) + b"".join(
        struct.pack(">H", g) for g in (1, 2, 3, 4)
    )
    groups = [
        (0xE9, 0xE9, 1),
        (0xFC, 0xFC, 2),
        (0xDF, 0xDF, 3),
        (0x20AC, 0x20AC, 4),
    ]
    cmap12 = struct.pack(
        ">HHIII", 12, 0, 16 + 12 * len(groups), 0, len(groups)
    ) + b"".join(struct.pack(">III", s, e, g) for s, e, g in groups)
    cmap = struct.pack(">HH", 0, 2)
    cmap += struct.pack(">HHI", 1, 0, 4 + 8 * 2)
    cmap += struct.pack(">HHI", 3, 10, 4 + 8 * 2 + len(cmap6))
    cmap += cmap6 + cmap12
    m = decode_map_from_ttf(sfnt([(b"cmap", cmap)]))
    assert m == {0x80: "é", 0x81: "ü", 0x82: "ß", 0x83: "€"}


def test_cmap_format12_bomb_bounded():
    # a crafted group list claiming 4-billion-code ranges must stay
    # within the glyph budget, not loop forever
    import time

    from zerox_spark.extract.truetype import _parse_code_to_glyph

    sub = struct.pack(">HHIII", 12, 0, 16 + 12, 0, 1) + struct.pack(
        ">III", 0, 0xFFFFFFF0, 1
    )
    t0 = time.time()
    out = _parse_code_to_glyph(sub)
    assert time.time() - t0 < 5
    assert len(out) <= 65_536


class TestCmap12ReviewFixes:
    @staticmethod
    def _sfnt(tables):
        out = bytearray(
            struct.pack(">IHHHH", 0x00010000, len(tables), 0, 0, 0)
        )
        off = 12 + 16 * len(tables)
        recs = b""
        body = b""
        for tag, data in tables:
            recs += tag + struct.pack(">III", 0, off, len(data))
            body += data
            off += len(data)
        return bytes(out) + recs + body

    @staticmethod
    def _cmap(records):
        head = struct.pack(">HH", 0, len(records))
        off = 4 + 8 * len(records)
        dirs = b""
        body = b""
        for (plat, enc), sub in records:
            dirs += struct.pack(">HHI", plat, enc, off)
            body += sub
            off += len(sub)
        return head + dirs + body

    _CMAP6 = struct.pack(">HHHHH", 6, 14, 0, 0x80, 2) + struct.pack(
        ">HH", 1, 2
    )

    def test_end_clamped_valid_groups_survive(self):
        from zerox_spark.extract.truetype import decode_map_from_ttf

        groups = [(0xE9, 0xE9, 1), (0x10FFF0, 0xFFFFFFFF, 2)]
        cmap12 = struct.pack(
            ">HHIII", 12, 0, 16 + 12 * len(groups), 0, len(groups)
        ) + b"".join(struct.pack(">III", *g) for g in groups)
        font = self._sfnt(
            [(b"cmap", self._cmap([((1, 0), self._CMAP6), ((3, 10), cmap12)]))]
        )
        m = decode_map_from_ttf(font)  # must not raise, é must survive
        assert m.get(0x80) == "é"

    def test_unparseable_310_does_not_shadow_31(self):
        from zerox_spark.extract.truetype import decode_map_from_ttf

        fmt13 = struct.pack(">HHIII", 13, 0, 28, 0, 1) + struct.pack(
            ">III", 0xE9, 0xE9, 1
        )
        # valid (3,1) format 6 mapping unicode é -> glyph 1
        u6 = struct.pack(">HHHHH", 6, 12, 0, 0xE9, 1) + struct.pack(">H", 1)
        font = self._sfnt(
            [
                (
                    b"cmap",
                    self._cmap(
                        [((1, 0), self._CMAP6), ((3, 10), fmt13), ((3, 1), u6)]
                    ),
                )
            ]
        )
        assert decode_map_from_ttf(font).get(0x80) == "é"

    def test_supplementary_pua_dropped(self):
        from zerox_spark.extract.truetype import decode_map_from_ttf

        groups = [(0xF0001, 0xF0001, 1)]
        cmap12 = struct.pack(">HHIII", 12, 0, 28, 0, 1) + struct.pack(
            ">III", *groups[0]
        )
        font = self._sfnt(
            [(b"cmap", self._cmap([((1, 0), self._CMAP6), ((3, 10), cmap12)]))]
        )
        m = decode_map_from_ttf(font)
        assert 0x80 not in m  # PUA never transcribed

    def test_wrapping_glyph_ids_dropped_not_guessed(self):
        from zerox_spark.extract.truetype import _parse_code_to_glyph

        sub = struct.pack(">HHIII", 12, 0, 28, 0, 1) + struct.pack(
            ">III", 0x41, 0x43, 0xFFFF - 1
        )
        out = _parse_code_to_glyph(sub)
        # 0x41->0xFFFE, 0x42->0xFFFF kept; 0x43 would wrap -> dropped
        assert out == {0x41: 0xFFFE, 0x42: 0xFFFF}
