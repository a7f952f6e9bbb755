"""Legacy Office payloads (.xls BIFF8, .doc Word97) — stdlib extraction.

The reference converts these through libreoffice (convertFileToPdf,
node-zerox/src/utils/file.ts:129-150) and, for spreadsheets, routes sheets
to pages (extractPagesFromStructuredDataFile, file.ts:311-329). Both binary
formats are public ([MS-XLS], [MS-DOC]); this module implements the subset
that carries the text:

- .xls: the ``Workbook`` stream's BIFF8 record list — BOUNDSHEET sheet
  names/offsets, SST shared strings (with CONTINUE-spanning strings and the
  per-continuation compression flag), LABELSST/LABEL/NUMBER/RK/MULRK/
  BOOLERR cells. Sheet k → page k with the same ``## Sheet: name`` +
  first-row-``<th>`` table form as the OOXML path (ooxml.py), so xlsx and
  xls of the same workbook extract identically.
- .doc: FIB (wIdent/flags/ccpText at their [MS-DOC] offsets, fcClx/lcbClx
  at FIB bytes 0x01A2/0x01A6) → piece table (Pcdt/PlcPcd in the
  ``0Table``/``1Table`` stream selected by fWhichTblStm) → text pieces
  (cp1252-compressed or UTF-16). Paragraph marks (\\r) split paragraphs,
  \\x0c splits pages, \\x07 (cell/row marks) ends a paragraph, field/other
  control chars are dropped. Styles live in a separate FKP/stylesheet layer
  the rasterizing reference never surfaces either — every paragraph emits
  as a ``para`` block.

Number formatting matches the xlsx path: integral floats render without the
trailing ``.0`` (the xlsx JS lib's number.toString() semantics).
"""

from __future__ import annotations

import struct

from zerox_spark.extract.cfb import CfbReader
from zerox_spark.extract.markdown import Block, join_blocks
from zerox_spark.extract.ooxml import grids_to_pages

# --- BIFF8 record opcodes ---------------------------------------------------
XLS_BOF = 0x0809
XLS_EOF = 0x000A
XLS_BOUNDSHEET = 0x0085
XLS_SST = 0x00FC
XLS_CONTINUE = 0x003C
XLS_LABELSST = 0x00FD
XLS_LABEL = 0x0204
XLS_NUMBER = 0x0203
XLS_RK = 0x027E
XLS_MULRK = 0x00BD
XLS_BOOLERR = 0x0205


def _fmt_num(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _rk_value(rk: int) -> str:
    mul100 = rk & 0x01
    if rk & 0x02:  # 30-bit signed integer
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        num = float(v)
    else:  # top 30 bits of an IEEE double
        num = struct.unpack("<d", struct.pack("<Q", (rk & ~0x3) << 32))[0]
    if mul100:
        num /= 100.0
    return _fmt_num(num)


class _Records:
    """BIFF record walker over a stream, with CONTINUE-aware payload
    access for the SST."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def __iter__(self):
        data, n = self.data, len(self.data)
        pos = self.pos
        while pos + 4 <= n:
            op, ln = struct.unpack_from("<HH", data, pos)
            body_at = pos + 4
            if body_at + ln > n:
                break  # truncated record → stop, keep what we have
            yield op, body_at, ln
            pos = body_at + ln


def _parse_sst(data: bytes, body_at: int, ln: int) -> list[str]:
    """SST record + its CONTINUE records. Strings spanning a CONTINUE
    boundary re-read the compression flag byte at the boundary
    ([MS-XLS] 2.5.293)."""
    segments: list[tuple[int, int]] = [(body_at, ln)]
    pos = body_at + ln
    while pos + 4 <= len(data):
        op, cln = struct.unpack_from("<HH", data, pos)
        if op != XLS_CONTINUE:
            break
        segments.append((pos + 4, cln))
        pos = pos + 4 + cln

    seg_i = 0
    off = segments[0][0]

    def remaining() -> int:
        start, ln_ = segments[seg_i]
        return start + ln_ - off

    def advance_segment() -> None:
        nonlocal seg_i, off
        seg_i += 1
        if seg_i >= len(segments):
            raise ValueError("SST truncated (ran out of CONTINUE records)")
        off = segments[seg_i][0]

    def read(n: int) -> bytes:
        nonlocal off
        out = b""
        while n:
            if remaining() == 0:
                advance_segment()
            take = min(n, remaining())
            out += data[off : off + take]
            off += take
            n -= take
        return out

    def read_chars(n_chars: int, high: bool) -> str:
        """Characters may span segments; each continuation restarts with
        its own grbit flag byte."""
        nonlocal off
        out = []
        while n_chars:
            if remaining() == 0:
                advance_segment()
                high = bool(read(1)[0] & 0x01)
            width = 2 if high else 1
            avail = remaining() // width
            take = min(n_chars, avail)
            if take == 0:
                # a lone byte of a utf-16 char never happens in valid files
                raise ValueError("SST char split across segment")
            raw = read(take * width)
            out.append(
                raw.decode("utf-16-le" if high else "cp1252", "replace")
            )
            n_chars -= take
        return "".join(out)

    total = struct.unpack("<II", read(8))[1]
    strings: list[str] = []
    for _ in range(total):
        cch = struct.unpack("<H", read(2))[0]
        grbit = read(1)[0]
        high = bool(grbit & 0x01)
        ext = bool(grbit & 0x04)
        rich = bool(grbit & 0x08)
        c_run = struct.unpack("<H", read(2))[0] if rich else 0
        cb_ext = struct.unpack("<I", read(4))[0] if ext else 0
        strings.append(read_chars(cch, high))
        if c_run:
            read(4 * c_run)
        if cb_ext:
            read(cb_ext)
    return strings


def _short_unicode(data: bytes, pos: int) -> tuple[str, int]:
    """BIFF8 ShortXLUnicodeString (u8 length): (text, bytes_consumed)."""
    cch = data[pos]
    high = bool(data[pos + 1] & 0x01)
    width = 2 if high else 1
    raw = data[pos + 2 : pos + 2 + cch * width]
    return (
        raw.decode("utf-16-le" if high else "cp1252", "replace"),
        2 + cch * width,
    )


def _long_unicode(data: bytes, pos: int) -> str:
    """BIFF8 XLUnicodeString (u16 length) — used by LABEL cells."""
    cch = struct.unpack_from("<H", data, pos)[0]
    high = bool(data[pos + 2] & 0x01)
    width = 2 if high else 1
    raw = data[pos + 3 : pos + 3 + cch * width]
    return raw.decode("utf-16-le" if high else "cp1252", "replace")


def xls_to_grids(
    payload: bytes, cfb: CfbReader | None = None
) -> list[tuple[str, list[list[str]]]]:
    """.xls bytes → [(sheet_name, rows)] in workbook order (same output
    contract as ooxml.xlsx_to_grids). Pass an already-open ``cfb`` to skip
    re-parsing the container (the dispatcher does)."""
    if cfb is None:
        cfb = CfbReader(payload)
    names = cfb.stream_names()
    stream_name = "Workbook" if "Workbook" in names else (
        "Book" if "Book" in names else None
    )
    if stream_name is None:
        raise ValueError("CFB has no Workbook/Book stream")
    wb = cfb.read_stream(stream_name)
    from zerox_spark.extract.office_crypto import decrypt_xls_stream

    # FilePass (RC4 / RC4 CryptoAPI under the default password) → plain
    # stream; unencrypted workbooks pass through untouched
    wb = decrypt_xls_stream(wb)

    sst: list[str] = []
    sheets: list[tuple[str, int]] = []  # (name, BOF offset)
    for op, at, ln in _Records(wb):
        if op == XLS_SST:
            sst = _parse_sst(wb, at, ln)
        elif op == XLS_BOUNDSHEET:
            bof = struct.unpack_from("<I", wb, at)[0]
            name, _ = _short_unicode(wb, at + 6)
            sheets.append((name, bof))
        elif op == XLS_EOF and sheets:
            break  # end of workbook globals substream
    if not sheets:
        raise ValueError("xls has no BOUNDSHEET records")

    grids = []
    for name, bof in sheets:
        cells: dict[int, dict[int, str]] = {}
        for op, at, ln in _Records(wb, bof):
            if op == XLS_EOF:
                break
            if op == XLS_LABELSST:
                rw, col, _ixfe, isst = struct.unpack_from("<HHHI", wb, at)
                if isst < len(sst):
                    cells.setdefault(rw, {})[col] = sst[isst]
            elif op == XLS_NUMBER:
                rw, col, _ixfe = struct.unpack_from("<HHH", wb, at)
                num = struct.unpack_from("<d", wb, at + 6)[0]
                cells.setdefault(rw, {})[col] = _fmt_num(num)
            elif op == XLS_RK:
                rw, col, _ixfe, rk = struct.unpack_from("<HHHI", wb, at)
                cells.setdefault(rw, {})[col] = _rk_value(rk)
            elif op == XLS_MULRK:
                rw, col_first = struct.unpack_from("<HH", wb, at)
                n_rk = (ln - 6) // 6
                for i in range(n_rk):
                    rk = struct.unpack_from("<I", wb, at + 4 + i * 6 + 2)[0]
                    cells.setdefault(rw, {})[col_first + i] = _rk_value(rk)
            elif op == XLS_LABEL:
                rw, col, _ixfe = struct.unpack_from("<HHH", wb, at)
                cells.setdefault(rw, {})[col] = _long_unicode(wb, at + 6)
            elif op == XLS_BOOLERR:
                rw, col, _ixfe, val, is_err = struct.unpack_from(
                    "<HHHBB", wb, at
                )
                if not is_err:
                    cells.setdefault(rw, {})[col] = (
                        "true" if val else "false"
                    )
        rows = []
        for rw in sorted(cells):
            vals = [cells[rw][c] for c in sorted(cells[rw])]
            if any(v != "" for v in vals):
                rows.append(vals)
        grids.append((name, rows))
    return grids


def xls_to_pages(
    payload: bytes, cfb: CfbReader | None = None
) -> list[tuple[int, str, list[tuple[str, int, int, float]]]]:
    """Sheet k → page k — the SAME grids_to_pages contract as the xlsx
    path (ooxml.py), so xls and xlsx of one workbook extract
    byte-identically."""
    return grids_to_pages(xls_to_grids(payload, cfb))


# ---------------------------------------------------------------------------
# .doc (Word 97 binary)

_FIB_WIDENT = 0xA5EC
_FIB_FLAGS_OFF = 0x0A
_FIB_CCPTEXT_OFF = 0x4C
_FIB_FCCLX_OFF = 0x01A2
_F_WHICH_TBL_STM = 0x0200


def doc_to_text(payload: bytes, cfb: CfbReader | None = None) -> str:
    """Main-document text of a Word97 .doc via the piece table. Pass an
    already-open ``cfb`` to skip re-parsing the container."""
    if cfb is None:
        cfb = CfbReader(payload)
    word = cfb.read_stream("WordDocument")
    if len(word) < 0x01AA:
        raise ValueError("WordDocument stream too short for a FIB")
    if struct.unpack_from("<H", word, 0)[0] != _FIB_WIDENT:
        raise ValueError("not a Word97 FIB")
    flags = struct.unpack_from("<H", word, _FIB_FLAGS_OFF)[0]
    table_name = "1Table" if flags & _F_WHICH_TBL_STM else "0Table"
    table = cfb.read_stream(table_name)
    if flags & 0x0100:  # fEncrypted ([MS-DOC] 2.5.2)
        if flags & 0x8000:
            # fObfuscation: XOR obfuscation — the XOR array is a table
            # this engine deliberately does not fabricate; contained
            raise ValueError("obfuscated doc (XOR — password required)")
        # RC4 / RC4-CryptoAPI under the default or empty password
        # (office_crypto.transform_doc_streams); a real password raises
        # a contained ValueError there — never a garbled piece-table walk
        from zerox_spark.extract.office_crypto import transform_doc_streams

        word, table = transform_doc_streams(word, table)
    ccp_text = struct.unpack_from("<I", word, _FIB_CCPTEXT_OFF)[0]
    fc_clx, lcb_clx = struct.unpack_from("<II", word, _FIB_FCCLX_OFF)
    if lcb_clx == 0:
        raise ValueError("doc has no Clx (piece table)")
    clx = table[fc_clx : fc_clx + lcb_clx]

    # Clx = Prc* then Pcdt(0x02 lcb PlcPcd)
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:  # Prc: 0x01, cbGrpprl, data
        if pos + 3 > len(clx):
            raise ValueError("Clx Prc header truncated")
        # cbGrpprl is UNSIGNED ([MS-DOC] 2.9.210); a signed read lets a
        # corrupt payload make `pos` stop advancing → infinite loop on an
        # executor core. Bound it so pos strictly advances or we raise.
        cb = struct.unpack_from("<H", clx, pos + 1)[0]
        if cb > len(clx) - pos - 3:
            raise ValueError(f"Clx Prc cbGrpprl out of range: {cb}")
        pos += 3 + cb
    if pos >= len(clx) or clx[pos] != 0x02:
        raise ValueError("Clx has no Pcdt")
    lcb = struct.unpack_from("<I", clx, pos + 1)[0]
    plc = clx[pos + 5 : pos + 5 + lcb]
    n = (len(plc) - 4) // 12
    if n <= 0:
        raise ValueError("empty piece table")
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    # emitted-output bound: ccp_text is an attacker-controlled u32 (up to
    # ~4G chars) and pieces may OVERLAP — a small PlcPcd whose PCDs all
    # point at the same fc region re-emits the same WordDocument bytes
    # thousands of times, bypassing every container-size bound. A legit doc
    # emits ≤ len(word_stream) chars (pieces don't overlap; utf-16 halves
    # that), so 8× is generous margin; exceeding it raises into the
    # contained-ERROR path.
    from zerox_spark.extract.ooxml import MAX_OUTPUT_CHARS

    max_out = min(ccp_text, 8 * len(word), MAX_OUTPUT_CHARS)
    out: list[str] = []
    taken = 0
    emitted = 0
    for i in range(n):
        if taken >= ccp_text:
            break
        pcd_off = (n + 1) * 4 + i * 8
        fc_raw = struct.unpack_from("<I", plc, pcd_off + 2)[0]
        n_chars = min(cps[i + 1], ccp_text) - cps[i]
        if n_chars <= 0:
            continue
        if fc_raw & 0x40000000:  # compressed: cp1252, fc is doubled
            fc = (fc_raw & 0x3FFFFFFF) // 2
            raw = word[fc : fc + n_chars]
            piece = raw.decode("cp1252", "replace")
        else:
            fc = fc_raw & 0x3FFFFFFF
            raw = word[fc : fc + n_chars * 2]
            piece = raw.decode("utf-16-le", "replace")
        emitted += len(piece)
        if emitted > max_out:
            raise ValueError(
                f"doc piece table emits more than {max_out} chars "
                "(overlapping pieces)"
            )
        out.append(piece)
        taken += n_chars
    return "".join(out)


def doc_to_pages(
    payload: bytes, cfb: CfbReader | None = None
) -> list[tuple[int, str, list[tuple[str, int, int, float]]]]:
    """Paragraph blocks, pages split on explicit page breaks (\\x0c)."""
    text = doc_to_text(payload, cfb)
    # normalize Word control chars: \x07 cell/row mark and \x0b soft break
    # end a line; field and object markers are dropped
    text = text.replace("\x07", "\r").replace("\x0b", "\r")
    for ch in ("\x13", "\x14", "\x15", "\x01", "\x08", "\x02"):
        text = text.replace(ch, "")
    pages_src = text.split("\x0c")
    out = []
    for chunk in pages_src:
        paras = [p.strip() for p in chunk.split("\r")]
        blocks = [Block("para", p) for p in paras if p]
        if not blocks:
            continue
        markdown, spans = join_blocks(blocks)
        out.append((len(out) + 1, markdown, spans))
    if not out:
        raise ValueError("doc produced no content")
    return out


# ---------------------------------------------------------------------------
# .ppt (PowerPoint 97 binary — the last legacy-Office family the reference
# routes through libreoffice, README.md:508; [MS-PPT] record stream)

PPT_SLIDEPERSIST = 0x03F3
PPT_TEXTHEADER = 0x0F9F
PPT_TEXTCHARS = 0x0FA0
PPT_TEXTBYTES = 0x0FA8
_PPT_MAX_DEPTH = 16


def ppt_to_pages(
    payload: bytes, cfb: CfbReader | None = None
) -> list[tuple[int, str, list[tuple[str, int, int, float]]]]:
    """Slide k → page k from the ``PowerPoint Document`` record stream:
    SlidePersistAtom (in SlideListWithText) starts a slide, TextHeaderAtom
    sets the text type, TextCharsAtom (utf-16) / TextBytesAtom (cp1252)
    carry the text. Title text (txType 0/6) → '# ' heading, everything else
    → paragraphs split on \\r — the same page shape as the pptx path.

    The record walk is linear (each byte visited once per nesting level,
    depth capped), so emitted output is bounded by the stream size — no
    piece-table-style overlap amplification exists in this format."""
    if cfb is None:
        cfb = CfbReader(payload)
    stream = cfb.read_stream("PowerPoint Document")
    if "Current User" in cfb.stream_names():
        # encrypted decks flag themselves in the CurrentUserAtom header
        # token; RC4-CryptoAPI persist objects decrypt under the default/
        # empty password (office_crypto.decrypt_ppt_document), a real
        # password raises a contained ValueError — clear decks pass
        # through untouched
        from zerox_spark.extract.office_crypto import decrypt_ppt_document

        stream = decrypt_ppt_document(
            stream, cfb.read_stream("Current User")
        )
    slides: list[list[tuple[int, str]]] = []
    tx_type = [1]

    def walk(pos: int, end: int, depth: int) -> None:
        if depth > _PPT_MAX_DEPTH:
            raise ValueError("ppt record nesting too deep")
        while pos + 8 <= end:
            verinst, rectype, reclen = struct.unpack_from(
                "<HHI", stream, pos
            )
            body = pos + 8
            if reclen > end - body:
                break  # truncated record → stop, keep what we have
            if rectype == 0x2F14:  # CryptSession10Container ([MS-PPT]
                # 2.3.5): RC4-CryptoAPI-encrypted deck; PowerPoint has no
                # default password → honestly locked, clear contained
                # error instead of a garbled walk
                raise ValueError("encrypted ppt (password required)")
            if verinst & 0xF == 0xF:  # container: payload is nested records
                walk(body, body + reclen, depth + 1)
            elif rectype == PPT_SLIDEPERSIST:
                slides.append([])
                tx_type[0] = 1  # text type never persists across slides
            elif rectype == PPT_TEXTHEADER:
                if reclen >= 4:
                    tx_type[0] = struct.unpack_from("<I", stream, body)[0]
            elif rectype in (PPT_TEXTCHARS, PPT_TEXTBYTES):
                raw = stream[body : body + reclen]
                text = raw.decode(
                    "utf-16-le" if rectype == PPT_TEXTCHARS else "cp1252",
                    "replace",
                )
                if not slides:
                    slides.append([])
                slides[-1].append((tx_type[0], text))
            pos = body + reclen

    walk(0, len(stream), 0)
    out = []
    for texts in slides:
        blocks = []
        for ttype, text in texts:
            for para in text.split("\r"):
                para = para.strip()
                if not para:
                    continue
                if ttype in (0, 6):  # title / centerTitle placeholders
                    blocks.append(Block("heading", f"# {para}"))
                else:
                    blocks.append(Block("para", para))
        if not blocks:
            continue
        markdown, spans = join_blocks(blocks)
        out.append((len(out) + 1, markdown, spans))
    if not out:
        raise ValueError("ppt produced no content")
    return out


# ---------------------------------------------------------------------------
# .wpd (WordPerfect 5.x/6.x — the last reference input type with a public
# byte-level layout, README.md:500; libreoffice-routed like the rest)

WPD_MAGIC = b"\xffWPC"


def is_wpd(payload: bytes) -> bool:
    return payload[:4] == WPD_MAGIC


def wpd_to_pages(
    payload: bytes,
) -> list[tuple[int, str, list[tuple[str, int, int, float]]]]:
    """WordPerfect text extraction — the documented WP 5.x byte model:
    the prefix header carries the document-area offset at byte 4 (u32 LE);
    from there, bytes 0x20-0x7E are literal text, 0x80 is a soft space,
    0x0A a hard return (paragraph), 0x0C a hard page break; 0xA9 a
    breakable hyphen. Fixed/variable function groups (0xC0-0xFF) carry a
    trailing length we honor when sane, else single-byte skip — mangled
    groups degrade to dropped formatting, never a crash. Linear walk, so
    output ≤ input."""
    if not is_wpd(payload):
        raise ValueError("not a WPD payload")
    if len(payload) < 16:
        raise ValueError("WPD truncated before header")
    doc_start = struct.unpack_from("<I", payload, 4)[0]
    if not 4 <= doc_start <= len(payload):
        raise ValueError(f"WPD document offset out of range: {doc_start}")
    data = payload
    i, n = doc_start, len(data)
    pages: list[list[str]] = [[]]
    cur: list[str] = []

    def end_para() -> None:
        text = " ".join("".join(cur).split())
        cur.clear()
        if text:
            pages[-1].append(text)

    while i < n:
        b = data[i]
        if 0x20 <= b <= 0x7E:
            cur.append(chr(b))
            i += 1
        elif b == 0x80:  # WP soft space
            cur.append(" ")
            i += 1
        elif b in (0x0A, 0x0D):  # hard/soft return → paragraph/space
            if b == 0x0A:
                end_para()
            else:
                cur.append(" ")
            i += 1
        elif b == 0x0C:  # hard page
            end_para()
            if pages[-1]:
                pages.append([])
            i += 1
        elif b == 0xA9:  # breakable hyphen
            cur.append("-")
            i += 1
        elif 0xD0 <= b <= 0xFF and i + 4 <= n:
            # variable-length function group: WP closes the group with the
            # opening code; its u16 size sits before that close. Honor the
            # trailing-size convention when it lands on a matching close
            # byte, else fall back to single-byte skip.
            size = struct.unpack_from("<H", data, i + 2)[0]
            if 4 <= size <= n - i and data[i + size - 1] == b:
                i += size
            else:
                i += 1
        elif 0xC0 <= b <= 0xCF:
            # fixed-length multi-byte function: also closed by a repeat of
            # the opening code (WP5.x convention, e.g. extended-character
            # [C0, char, charset, C0]). Skip to the close within the
            # documented max fixed size so the binary payload bytes never
            # leak into text; mangled → single-byte skip.
            close = data.find(bytes([b]), i + 1, i + 16)
            i = close + 1 if close != -1 else i + 1
        else:
            i += 1  # control/function byte we don't model — drop
    end_para()
    out = []
    for paras in pages:
        if not paras:
            continue
        markdown, spans = join_blocks([Block("para", p) for p in paras])
        out.append((len(out) + 1, markdown, spans))
    if not out:
        raise ValueError("wpd produced no content")
    return out


# ---------------------------------------------------------------------------
# router


def cfb_to_pages(
    payload: bytes,
) -> list[tuple[int, str, list[tuple[str, int, int, float]]]]:
    """Dispatch a CFB payload by its stream names. The container (FAT,
    directory, mini-stream) is parsed ONCE and the open reader is passed
    down — no double parse on the hot extract path."""
    cfb = CfbReader(payload)
    names = set(cfb.stream_names())
    if "EncryptionInfo" in names and "EncryptedPackage" in names:
        # ECMA-376 encrypted OOXML rides INSIDE a CFB container; Excel's
        # default password (VelvetSweatshop) opens the common "protected
        # workbook" crawl shape — a real password raises a contained
        # ValueError (extract/office_crypto.py)
        from zerox_spark.extract.office_crypto import decrypt_ooxml_package
        from zerox_spark.extract.ooxml import ooxml_to_pages

        zip_bytes = decrypt_ooxml_package(
            cfb.read_stream("EncryptionInfo"),
            cfb.read_stream("EncryptedPackage"),
        )
        if zip_bytes[:2] != b"PK":
            raise ValueError("decrypted Office package is not a zip")
        return ooxml_to_pages(zip_bytes)
    if "Workbook" in names or "Book" in names:
        return xls_to_pages(payload, cfb)
    if "WordDocument" in names:
        return doc_to_pages(payload, cfb)
    if "PowerPoint Document" in names:
        return ppt_to_pages(payload, cfb)
    raise ValueError(
        "CFB container is not xls/doc/ppt (streams: "
        + ",".join(sorted(names)[:5])
        + ")"
    )
