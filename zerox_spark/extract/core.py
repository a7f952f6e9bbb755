"""Per-document extraction dispatch — the engine's analog of the reference's
``processOCR`` (node-zerox/src/index.ts:256-355) with its routing stage
(index.ts:161-213) and error containment (ErrorMode.IGNORE,
index.ts:338-352).

Routing (logical-plan branch per document):

1. trusted pre-extracted ``text`` → fast path, no DOM work
   (node-zerox/src/index.ts:167-168 routing);
2. ``%SHEET`` magic → structured-sheet fast path, sheet = page (the Excel
   branch: extractPagesFromStructuredDataFile, file.ts:311-329);
3. ``%PDF`` magic bytes → layout pass (layout.py);
4. ``PK`` magic → OOXML zip+XML extraction (ooxml.py): xlsx sheet-per-page
   (convertExcelToHtml analog, file.ts:210-276), docx heading/list/table
   pages (the convertFileToPdf route, file.ts:129-150, without libreoffice);
5. CFB magic → legacy Office extraction (cfb.py + legacy_office.py):
   .xls BIFF8 sheet-per-page, .doc Word97 piece-table text;
6. anything else → HTML pipeline (tokenize → DOM → score → markdown);
7. empty/undecodable payload → ERROR page with content "" and
   content_length 0, job continues (the IGNORE containment).

A user-supplied ``ExtractConfig.extractor`` callable replaces steps 2-4
entirely — the customModelFunction extension point
(node-zerox/src/types.ts:9-15, invoked index.ts:287-298).

Determinism guarantees: NFC unicode normalization, CRLF→LF, a single
whitespace-collapse rule in the emitter, no environment lookups.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field

from zerox_spark.extract.fences import format_markdown
from zerox_spark.extract.layout import is_pdf, pdf_to_pages
from zerox_spark.extract.markdown import html_to_markdown
from zerox_spark.extract.pages import normalize_select_pages, select_and_renumber
from zerox_spark.extract.sheets import is_sheet, sheets_to_pages

STATUS_SUCCESS = "SUCCESS"
STATUS_ERROR = "ERROR"


def _builtin_html(html: bytes, text: str | None):
    src = html.decode("utf-8", errors="replace").replace("\r\n", "\n")
    markdown, spans = html_to_markdown(src)
    return [(1, markdown, spans)]


def _builtin_layout(html: bytes, text: str | None):
    return pdf_to_pages(html)


def _builtin_sheets(html: bytes, text: str | None):
    return sheets_to_pages(html)


# strategy registry — the createModel factory analog (SURVEY.md §2.5 M1,
# node-zerox/src/models/index.ts:48-80): named extractor strategies a
# pipeline can select explicitly instead of the magic-byte auto-routing.
def _builtin_ooxml(html: bytes, text: str | None):
    from zerox_spark.extract.ooxml import ooxml_to_pages

    return ooxml_to_pages(html)


def _builtin_cfb(html: bytes, text: str | None):
    from zerox_spark.extract.legacy_office import cfb_to_pages

    return cfb_to_pages(html)


def _builtin_delimited(html: bytes, text: str | None):
    from zerox_spark.extract.delimited import (
        delimited_to_pages,
        sniff_delimiter,
    )

    src = _decode_payload(html).replace("\r\n", "\n").replace("\r", "\n")
    delim = sniff_delimiter(src)
    if delim is None:
        raise ValueError("payload is not a consistent delimited table")
    return delimited_to_pages(src, delim)


def _builtin_rtf(html: bytes, text: str | None):
    from zerox_spark.extract.rtf import rtf_to_pages

    return rtf_to_pages(html)


EXTRACTORS: dict[str, object] = {
    "auto": None,  # full dispatch below (the default)
    "readability": _builtin_html,
    "layout": _builtin_layout,
    "sheets": _builtin_sheets,
    "ooxml": _builtin_ooxml,
    "legacy_office": _builtin_cfb,
    "delimited": _builtin_delimited,
    "rtf": _builtin_rtf,
}


def get_extractor(name: str):
    """Resolve a named strategy; raises at plan time on unknown names (the
    validate-at-init pattern, modellitellm.py:33-38)."""
    if name not in EXTRACTORS:
        raise ValueError(
            f"unknown extractor {name!r}; known: {sorted(EXTRACTORS)}"
        )
    return EXTRACTORS[name]


@dataclass
class PageResult:
    page_no: int
    markdown: str
    content_length: int
    status: str
    error: str | None = None
    spans: list[tuple[str, int, int, float]] = field(default_factory=list)


@dataclass
class ExtractConfig:
    """Per-run knobs (subset of ZeroxArgs, node-zerox/src/types.ts:4-44,
    that are meaningful for a deterministic extractor). Validated at
    construction — config errors fail before job submit, the reference's
    validate-at-init pattern (py_zerox/pyzerox/models/modellitellm.py:33-38)."""

    select_pages: list[int] | None = None
    maintain_format: bool = False  # inline fold in operators/extract.py
    error_mode: str = "IGNORE"  # IGNORE | THROW (node-zerox/src/types.ts:172-175)
    trust_text: bool = True  # honor the pre-extracted text fast path
    # customModelFunction analog (node-zerox/src/types.ts:9-15): a callable
    # (html_bytes, text) → [(page_no, markdown, spans)] replacing the
    # built-in extractor; must be deterministic and picklable (it ships to
    # executors inside the UDF closure)
    extractor: object | None = None
    # hybrid extraction analog (HybridInput {imagePaths, text},
    # node-zerox/src/types.ts:197-200): the reference feeds OCR images AND
    # caller-provided text jointly to the model; deterministically, the text
    # channel serves as the fallback — a document whose payload fails to
    # extract yields the trusted text instead of an ERROR page
    hybrid: bool = False
    # giant-doc page chunking (full splitTallImage analog, extract/
    # chunking.py): single-page results longer than this split into multiple
    # pages at block boundaries. None = off (the default page model)
    chunk_chars: int | None = None
    # payload bound — the compressImage analog (15 MB cap + quality ladder,
    # node-zerox/src/index.ts:68, image.ts:78-114): an oversized payload is
    # deterministically truncated at the last tag boundary before the cap
    # (salting spreads heavy *rows*; this bounds work *within* one row —
    # SURVEY.md §7 hard part (c), the I5 intra-doc analog)
    max_payload_bytes: int = 15 * 1024 * 1024

    def __post_init__(self) -> None:
        self.select_pages = normalize_select_pages(self.select_pages)
        if self.error_mode not in ("IGNORE", "THROW"):
            raise ValueError(f"bad error_mode {self.error_mode!r}")
        if self.extractor is not None and not callable(self.extractor):
            raise ValueError("extractor must be callable")


def _finalize(markdown: str) -> str:
    markdown = markdown.replace("\r\n", "\n").replace("\r", "\n")
    markdown = unicodedata.normalize("NFC", markdown)
    return format_markdown(markdown)


def extract_document(
    html: bytes | None,
    text: str | None,
    config: ExtractConfig | None = None,
) -> list[PageResult]:
    """Extract one document into its ordered page results. Never raises in
    IGNORE mode — failures become ERROR pages (content "", length 0, per
    node-zerox/src/index.ts:344-351)."""
    config = config or ExtractConfig()
    try:
        raw_pages = _extract_raw(html, text, config)
        if (
            config.chunk_chars
            and len(raw_pages) == 1
            and len(raw_pages[0][1]) > config.chunk_chars
        ):
            from zerox_spark.extract.chunking import chunk_blocks

            raw_pages = [
                (i + 1, md, spans)
                for i, (md, spans) in enumerate(
                    chunk_blocks(
                        raw_pages[0][1], raw_pages[0][2], config.chunk_chars
                    )
                )
            ]
        selected = select_and_renumber(raw_pages, config.select_pages)
        out = []
        for page_no, markdown, spans in selected:
            # spans are computed on the PRE-finalize markdown; NFC
            # composition or a whole-page fence unwrap can shrink the
            # string (identity on ASCII content). Clamp so the
            # [start, end) ⊆ [0, len) invariant holds for consumers —
            # offsets into mutated regions are best-effort by contract.
            n = len(markdown)
            spans = [
                (k, min(s, n), min(e, n), sc) for k, s, e, sc in spans
            ]
            out.append(
                PageResult(
                    page_no=page_no,
                    markdown=markdown,
                    content_length=len(markdown),
                    status=STATUS_SUCCESS,
                    spans=spans,
                )
            )
        return out
    except Exception as exc:  # noqa: BLE001 — containment is the contract
        if config.error_mode == "THROW":
            raise
        if config.hybrid and text:
            md = _finalize(text)
            return [
                PageResult(
                    page_no=1,
                    markdown=md,
                    content_length=len(md),
                    status=STATUS_SUCCESS,
                    spans=[("para", 0, len(md), 1.0)],
                )
            ]
        return [
            PageResult(
                page_no=1,
                markdown="",
                content_length=0,
                status=STATUS_ERROR,
                error=f"{type(exc).__name__}: {exc}",
            )
        ]


def _cap_payload(html: bytes, cap: int) -> bytes:
    """Deterministic truncation of an oversized payload at the last '>' (or
    newline, for the line-oriented PDF/sheet grammars) before the cap — the
    error-tolerant parsers then see well-formed-enough input. The reference
    bounds payloads the same way in spirit (recompress until under the cap,
    image.ts:78-114): lose fidelity, never fail the document."""
    head = html[:cap]
    cut = max(head.rfind(b">"), head.rfind(b"\n"))
    return head[: cut + 1] if cut > 0 else head


def _extract_raw(
    html: bytes | None,
    text: str | None,
    config: ExtractConfig,
    _depth: int = 0,
) -> list[tuple[int, str, list]]:
    if config.trust_text and text:
        return [(1, _finalize(text), [("para", 0, len(text), 1.0)])]
    if not html:
        raise ValueError("empty document payload")
    if config.max_payload_bytes and len(html) > config.max_payload_bytes:
        if (
            html[:2] == b"PK"
            or html[:4] == b"\xd0\xcf\x11\xe0"
            or (
                html[:4] == b"%PDF"
                and not html.startswith(b"%PDF-SYNTH")
            )
            or html[:2] == b"\x1f\x8b"  # gzip
            or html[:3] == b"BZh"  # bzip2
            or html[:6] == b"\xfd7zXZ\x00"  # xz
        ):
            # byte-truncating a CONTAINER just corrupts it (any oversized
            # xlsx would become an ERROR row); containers instead pass
            # whole to parsers that enforce their own bounds — zip member
            # decompressed-size guard (ooxml._read_member), CFB sector cap
            # (cfb._MAX_SECTORS), PDF stream/object/page budgets
            # (pdf.MAX_STREAM_BYTES & co) — so per-row work stays bounded
            # without losing every large office document. Compressed
            # transfer encodings (gzip/bzip2/xz) are containers too:
            # byte-truncation corrupts the stream, so they pass whole to
            # the bounded decompressors (input + 4x output budgets) and
            # the DECOMPRESSED payload is re-capped on re-dispatch. The
            # line-oriented %PDF-SYNTH grammar keeps the newline-boundary
            # truncation (safe there by construction).
            pass
        else:
            html = _cap_payload(html, config.max_payload_bytes)
    if config.extractor is not None:
        pages = config.extractor(html, text)  # type: ignore[operator]
        return [(no, _finalize(md), spans) for no, md, spans in pages]
    if html[:4] == b"\xd0\xcf\x11\xe0":
        # legacy-Office CFB (checkIsCFBFile, file.ts:89-92): stdlib
        # container+payload extraction (extract/cfb.py + legacy_office.py —
        # the convertFileToPdf route, file.ts:129-150, without libreoffice).
        # A CFB that is not xls/doc, or a corrupt one, raises → contained
        # ERROR in IGNORE mode.
        from zerox_spark.extract.legacy_office import cfb_to_pages

        pages = cfb_to_pages(html)
        if not pages:
            raise ValueError("CFB payload with no pages")
        return [(no, _finalize(md), spans) for no, md, spans in pages]
    if html[:4] == b"\xffWPC":
        # WordPerfect (README.md:500): WP5.x byte-model text extraction
        from zerox_spark.extract.legacy_office import wpd_to_pages

        pages = wpd_to_pages(html)
        return [(no, _finalize(md), spans) for no, md, spans in pages]
    if html[:5] == b"{\\rtf":
        # RTF (README.md:495): group/control-word parse → paragraph blocks,
        # \page splits pages (extract/rtf.py) — no more control-word soup
        # through the plain-text fallback
        from zerox_spark.extract.rtf import rtf_to_pages

        pages = rtf_to_pages(html)
        return [(no, _finalize(md), spans) for no, md, spans in pages]
    if is_sheet(html):
        pages = sheets_to_pages(html)
        if not pages:
            raise ValueError("sheet payload with no sheets")
        return [(no, _finalize(md), spans) for no, md, spans in pages]
    if is_pdf(html):
        pages = pdf_to_pages(html)
        if not pages:
            raise ValueError("PDF payload with no pages")
        return [(no, _finalize(md), spans) for no, md, spans in pages]
    if html[:2] == b"PK":
        # OOXML zip container: stdlib zip+XML extraction (extract/ooxml.py —
        # the convertExcelToHtml / convertFileToPdf analog, file.ts:129-150,
        # 210-276). A PK payload that is not xlsx/docx (odt, plain zip)
        # raises → contained ERROR in IGNORE mode.
        from zerox_spark.extract.ooxml import ooxml_to_pages

        pages = ooxml_to_pages(html)
        if not pages:
            raise ValueError("OOXML payload with no pages")
        return [(no, _finalize(md), spans) for no, md, spans in pages]
    # binary/media guard (round-3 What's-wrong #1): a crawl is full of
    # image/font/archive/audio payloads; none may reach the latin-1-total
    # decode below and extract as SUCCESS mojibake. Recognized images get a
    # distinct reason (the reference's image inputs exist to be OCR'd,
    # node-zerox/src/index.ts:171-182 — a deterministic engine's honest
    # outcome is a contained ERROR, same contract as image-only PDFs).
    from zerox_spark.extract.sniff import IMAGE_KINDS, sniff_binary

    bin_kind = sniff_binary(html)
    if bin_kind in ("gzip", "bzip2", "xz"):
        # crawl tables routinely store the raw transfer-encoded body;
        # decompress (bounded) and re-dispatch — a gzip'd html page is an
        # html page, not binary. The depth guard stops alternating-wrapper
        # chains (gzip→bz2→gzip→…) that the per-scheme nested checks
        # cannot see across schemes.
        if _depth >= 2:
            raise ValueError("compression nesting too deep")
        if bin_kind == "gzip":
            inner = _gunzip_payload(html, config)
        else:
            inner = _bounded_decompress(bin_kind, html, config)
        return _extract_raw(inner, text, config, _depth + 1)
    if bin_kind is not None:
        if bin_kind in IMAGE_KINDS:
            raise ValueError(
                f"image payload ({bin_kind}) has no text layer — no OCR"
            )
        raise ValueError(f"binary/media payload ({bin_kind})")
    src = _decode_payload(html)
    src = src.replace("\r\n", "\n").replace("\r", "\n")
    if _looks_binary(src):
        # magic-less binary (raw compressed fragments, truncated media):
        # control-character density no real text document has
        raise ValueError("binary payload (unprintable content)")
    if not src.lstrip().startswith("<"):
        # csv/tsv structured fast path (README.md:506-507): a consistent
        # delimited grid extracts as one first-row-<th> table page, the
        # same sheet contract as %SHEET/xlsx/xls (extract/delimited.py)
        from zerox_spark.extract.delimited import (
            delimited_to_pages,
            sniff_delimiter,
        )

        delim = sniff_delimiter(src)
        if delim is not None:
            pages = delimited_to_pages(src, delim)
            return [(no, _finalize(md), spans) for no, md, spans in pages]
        # plain-text document (.txt is a first-class reference input type,
        # README.md:488-513): paragraphs on blank lines, no DOM pass
        return [_plain_text_page(src)]
    if src.lstrip().startswith("<?xml"):
        page = _generic_xml_page(src)
        if page is not None:
            return [page]
    markdown, spans = html_to_markdown(src)
    return [(1, _finalize(markdown), spans)]


def _generic_xml_page(src: str) -> tuple[int, str, list] | None:
    """Standalone XML document (the reference's 'xml' input type,
    README.md:498): element text nodes in document order → paragraph
    blocks, one page. Returns None — falling back to the error-tolerant
    HTML pipeline — for XHTML (root <html>), unparseable XML, or anything
    carrying a DTD (entity-expansion guard; the HTML tokenizer never
    expands custom entities)."""
    if "<!DOCTYPE" in src or "<!ENTITY" in src:
        return None
    if len(src) > 4 * 1024 * 1024:
        # ET materializes a ~10× element tree; with 32 concurrent executor
        # threads that transient matters — oversized XML takes the linear
        # scanning tokenizer path instead (still extracts text content)
        return None
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(src)
    except ET.ParseError:
        return None
    if root.tag.split("}")[-1].lower() == "html":
        return None
    paras: list[str] = []

    def walk(el) -> None:  # text nodes in true document order
        t = _WS_RUN.sub(" ", (el.text or "")).strip()
        if t:
            paras.append(t)
        for child in el:
            walk(child)
            tail = _WS_RUN.sub(" ", (child.tail or "")).strip()
            if tail:
                paras.append(tail)

    walk(root)
    if not paras:
        return None
    from zerox_spark.extract.markdown import Block, join_blocks

    markdown, spans = join_blocks([Block("para", p) for p in paras])
    return (1, _finalize(markdown), spans)


# charset resolution — the mime/extension fallback-chain analog
# (node-zerox/src/utils/file.ts:64-85) for crawl payloads: BOM → declared
# <meta charset>/xml-decl in the first 1 KiB → UTF-8 → permissive fallback.
# Deterministic: fixed probe order, stdlib codecs only.
_CHARSET_RE = re.compile(
    rb"""charset\s*=\s*["']?\s*([a-zA-Z0-9_-]{2,20})""",
)
_CHARSET_ALIASES = {
    "utf8": "utf-8", "utf-8": "utf-8",
    "latin1": "latin-1", "latin-1": "latin-1", "iso-8859-1": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252",
    "us-ascii": "ascii", "ascii": "ascii",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
}


def _gunzip_payload(html: bytes, config: "ExtractConfig") -> bytes:
    """Bounded gzip inflate for transfer-encoded crawl payloads: output is
    capped at 4× the payload budget and raised incrementally (a bomb dies
    at the cap, never after materializing); nested gzip (bomb shape) and
    empty results are contained errors."""
    import zlib

    cap = (config.max_payload_bytes or 16 * 1024 * 1024) * 4
    out: list[bytes] = []
    total = 0
    data = html
    members = 0
    try:
        # gzip files are a SEQUENCE of members (RFC 1952 §2.2; gzip -c a b
        # > ab.gz); decode them all, same budget across the whole payload
        while data and members < 64:
            members += 1
            d = zlib.decompressobj(31)  # gzip wrapper
            chunk = d.decompress(data, 1 << 20)
            while True:
                total += len(chunk)
                if total > cap:
                    raise ValueError("gzip payload expands past the budget")
                out.append(chunk)
                if not d.unconsumed_tail:
                    break
                chunk = d.decompress(d.unconsumed_tail, 1 << 20)
                if not chunk and d.unconsumed_tail:
                    break  # no progress — corrupt tail
            tail = d.flush()
            total += len(tail)
            if total > cap:
                raise ValueError("gzip payload expands past the budget")
            out.append(tail)
            data = d.unused_data if d.eof else b""
            if data[:2] != b"\x1f\x8b":
                break  # trailing non-gzip bytes: ignore (padding/garbage)
        if data[:2] == b"\x1f\x8b":
            raise ValueError("gzip payload exceeds the member cap")
    except zlib.error as exc:
        if not any(out):
            raise ValueError(f"corrupt gzip payload: {exc}") from exc
        # a corrupt LATER member truncates — keep what decoded (the same
        # tolerance the WARC reader applies to damaged archives)
    data = b"".join(out)
    if not data:
        raise ValueError("gzip payload decompressed to nothing")
    from zerox_spark.extract.sniff import sniff_binary

    if sniff_binary(data) == "gzip":
        raise ValueError("nested gzip payload")
    return data


def _bounded_decompress(
    kind: str, html: bytes, config: "ExtractConfig"
) -> bytes:
    """Bounded bz2/xz inflate with the gzip path's exact contract:
    incremental budget enforcement, multi-stream concatenation (pbzip2 and
    `xz -c a b` emit stream sequences), corrupt-later-stream truncation,
    nested-compression rejection."""
    import bz2
    import lzma

    mk, magic = {
        "bzip2": (bz2.BZ2Decompressor, b"BZh"),
        "xz": (lzma.LZMADecompressor, b"\xfd7zXZ\x00"),
    }[kind]
    cap = (config.max_payload_bytes or 16 * 1024 * 1024) * 4
    out: list[bytes] = []
    total = 0
    data = html
    streams = 0
    try:
        while data and streams < 64:
            streams += 1
            d = mk()
            buf = data
            while True:
                chunk = d.decompress(buf, 1 << 20)
                buf = b""
                total += len(chunk)
                if total > cap:
                    raise ValueError(
                        f"{kind} payload expands past the budget"
                    )
                out.append(chunk)
                if d.eof or d.needs_input:
                    break
            data = d.unused_data if d.eof else b""
            if data[: len(magic)] != magic:
                break  # trailing non-stream bytes: ignore
        if data[: len(magic)] == magic:
            raise ValueError(f"{kind} payload exceeds the stream cap")
    except (OSError, EOFError, lzma.LZMAError) as exc:
        if not any(out):
            raise ValueError(f"corrupt {kind} payload: {exc}") from exc
        # corrupt later stream truncates — keep what decoded
    joined = b"".join(out)
    if not joined:
        raise ValueError(f"{kind} payload decompressed to nothing")
    from zerox_spark.extract.sniff import sniff_binary

    if sniff_binary(joined) == kind:
        # same-scheme-in-scheme is the classic bomb shape; a DIFFERENT
        # scheme inside is legitimate layering (bz2 dump of gzip bodies)
        # and is bounded by the dispatch depth guard instead
        raise ValueError(f"nested {kind} payload")
    return joined


def _decode_payload(html: bytes) -> str:
    if html[:3] == b"\xef\xbb\xbf":
        return html[3:].decode("utf-8", errors="replace")
    if html[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return html.decode("utf-16", errors="replace")
    m = _CHARSET_RE.search(html[:1024])
    if m:
        enc = _CHARSET_ALIASES.get(m.group(1).decode("ascii", "replace").lower())
        if enc and enc not in ("utf-16", "utf-16-le", "utf-16-be"):
            try:
                return html.decode(enc)
            except UnicodeDecodeError:
                pass  # lying charset declaration → fall through
    try:
        return html.decode("utf-8")
    except UnicodeDecodeError:
        # undeclared 8-bit content: latin-1 is total (never fails) and is
        # the HTML5 fallback family for unlabeled legacy bytes
        return html.decode("latin-1")


_PARA_SPLIT = re.compile(r"\n\s*\n")
_WS_RUN = re.compile(r"\s+")

# C0 controls that never appear in text (tab/newline/CR/formfeed excluded),
# C1 controls (the latin-1-total fallback maps bytes 0x80-0x9f there; real
# text never carries them — even mislabeled cp1252 smart quotes stay rare),
# plus the replacement char a lying-charset decode leaves behind
_BINARYISH = re.compile("[\x00-\x08\x0b\x0e-\x1f\x7f\x80-\x9f�]")
_BINARY_RATIO = 0.02
_BINARY_MIN_LEN = 24


def _looks_binary(src: str) -> bool:
    """Printable-ratio guard: text whose control-char/replacement density
    exceeds any real document's is binary that slipped past the magic table.
    Probes a bounded prefix so the check is O(1) per row."""
    probe = src[:65536]
    if len(probe) < _BINARY_MIN_LEN:
        return False
    hits = len(_BINARYISH.findall(probe))
    return hits / len(probe) > _BINARY_RATIO


def _plain_text_page(src: str) -> tuple[int, str, list]:
    paras = [
        _WS_RUN.sub(" ", p).strip() for p in _PARA_SPLIT.split(src)
    ]
    paras = [p for p in paras if p]
    markdown = "\n\n".join(paras)
    spans, pos = [], 0
    for i, p in enumerate(paras):
        if i:
            pos += 2
        spans.append(("para", pos, pos + len(p), 1.0))
        pos += len(p)
    return (1, _finalize(markdown), spans)
