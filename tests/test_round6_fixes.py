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
