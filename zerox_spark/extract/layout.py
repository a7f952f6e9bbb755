"""pdfminer-style layout pass over PDF payloads — two grammars, one model.

~3% of Common-Crawl-style rows in the corpus carry a ``%PDF`` magic-byte
binary (FIXTURES.md §1). Two front-ends feed the SAME ``LayoutPage`` →
valley-segmentation → classification pipeline:

1. **Born-digital real PDFs** (``%PDF-1.x``) — extract/pdf.py: stdlib COS
   parse, FlateDecode, ToUnicode CMaps, content-stream interpretation into
   positioned text runs (the reference's #1 input type; its conversion
   pipeline ``node-zerox/src/utils/file.ts:153-207`` exists to consume
   these, via rasterize+OCR — we read the text layer directly).
2. **Synthetic layout grammar** (``%PDF-SYNTH``) — the deterministic corpus
   format below, kept as the oracle-friendly second grammar.

Synthetic payload grammar (produced by synth.py; one directive per line):

    %PDF-SYNTH 1.0
    %%page no=<int> w=<float> h=<float>
    %%line y=<float> x=<float> size=<float> [kind=tr|th] text=<utf-8 text>

Block segmentation generalizes the reference's tall-image whitespace-valley
splitter (`splitTallImage`, node-zerox/src/utils/image.ts:116-231): there,
rows of near-empty pixels ≥ MIN_SPLIT_RUN tall are split candidates; here,
vertical gaps between consecutive text lines larger than VALLEY_GAP points
split blocks. Same idea — find density valleys, split there — transplanted
from pixel space to layout space.

Classification:
- size ≥ H1_SIZE → '#' heading, ≥ H2_SIZE → '##' heading,
- kind=tr/th lines (cells separated by '|') → HTML table rows (dialect:
  tables stay HTML, node-zerox/src/constants.ts:15),
- numeric-only line in the bottom margin (y < FOOTER_Y) →
  <page_number>n</page_number>,
- everything else → paragraph (lines within a block joined by single spaces).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from zerox_spark.extract.markdown import Block, join_blocks

PDF_MAGIC = b"%PDF"
SYNTH_MAGIC = b"%PDF-SYNTH"

VALLEY_GAP = 32.0  # points; > one blank line of 10pt text with leading
H1_SIZE = 18.0
H2_SIZE = 14.0
FOOTER_Y = 60.0

# the deterministic image placeholder the born-digital interpreter emits
# for image XObjects (reference dialect: shared/systemPrompt.txt mandates
# image placeholders; goldens use ``![...](#)``)
FIGURE_PLACEHOLDER = "![figure](#)"

_PAGE_RE = re.compile(r"^%%page\s+no=(\d+)\s+w=([\d.]+)\s+h=([\d.]+)\s*$")
_LINE_RE = re.compile(
    r"^%%line\s+y=([\d.]+)\s+x=([\d.]+)\s+size=([\d.]+)"
    r"(?:\s+kind=(\w+))?\s+text=(.*)$"
)


@dataclass
class LayoutLine:
    y: float
    x: float
    size: float
    kind: str  # '' | 'tr' | 'th'
    text: str
    # reading-order region from layout analysis (XY-cut, extract/pdf.py):
    # lines are ordered region-major, then top-down. The synthetic grammar
    # always emits region 0, so its ordering is untouched.
    region: int = 0


@dataclass
class LayoutPage:
    no: int
    width: float
    height: float
    lines: list[LayoutLine] = field(default_factory=list)


def is_pdf(payload: bytes) -> bool:
    """Magic-byte sniff, the checkIsPdfFile analog
    (node-zerox/src/utils/file.ts:95-98)."""
    return payload[:4] == PDF_MAGIC


def parse_pdf(payload: bytes) -> list[LayoutPage]:
    """Parse a PDF payload into LayoutPages: real ``%PDF-1.x`` documents go
    through the born-digital parser (extract/pdf.py); the ``%PDF-SYNTH``
    grammar parses below. Unknown directives are ignored (error tolerance —
    a corrupt line must not kill a 10^12-row job)."""
    if is_pdf(payload) and not payload.startswith(SYNTH_MAGIC):
        from zerox_spark.extract.pdf import parse_real_pdf

        return parse_real_pdf(payload)
    pages: list[LayoutPage] = []
    text = payload.decode("utf-8", errors="replace")
    for raw in text.split("\n"):
        m = _PAGE_RE.match(raw)
        if m:
            try:
                pages.append(
                    LayoutPage(
                        int(m.group(1)), float(m.group(2)), float(m.group(3))
                    )
                )
            except ValueError:
                pass  # [\d.]+ admits '1.2.3' — skip the directive, not the doc
            continue
        m = _LINE_RE.match(raw)
        if m and pages:
            try:
                pages[-1].lines.append(
                    LayoutLine(
                        y=float(m.group(1)),
                        x=float(m.group(2)),
                        size=float(m.group(3)),
                        kind=m.group(4) or "",
                        text=m.group(5),
                    )
                )
            except ValueError:
                pass  # same: one corrupt line must not kill the document
    return pages


def segment_page(page: LayoutPage) -> list[Block]:
    """Reading-order block segmentation of one layout page. Lines sort
    region-major (XY-cut regions from the real-PDF front-end; always 0 for
    the synthetic grammar) so multi-column pages read column-by-column."""
    lines = sorted(page.lines, key=lambda l: (l.region, -l.y, l.x))
    groups: list[list[LayoutLine]] = []
    for line in lines:
        if groups and _same_block(groups[-1][-1], line):
            groups[-1].append(line)
        else:
            groups.append([line])
    blocks: list[Block] = []
    for group in groups:
        for blk in _classify(group, page):
            if (
                blk.kind == "figure"
                and blocks
                and blocks[-1].kind == "figure"
            ):
                continue  # strips of one tiled image → one placeholder
            blocks.append(blk)
    return blocks


def _same_block(prev: LayoutLine, line: LayoutLine) -> bool:
    if prev.region != line.region:
        return False  # a region boundary is always a block boundary
    if (prev.kind in ("tr", "th")) != (line.kind in ("tr", "th")):
        return False
    gap = prev.y - line.y
    return 0 <= gap <= VALLEY_GAP


def _classify(group: list[LayoutLine], page: LayoutPage) -> list[Block]:
    first = group[0]
    if first.kind in ("tr", "th"):
        return [_table_block(group)]
    if first.size >= H2_SIZE:
        level = 1 if first.size >= H1_SIZE else 2
        text = " ".join(l.text.strip() for l in group if l.text.strip())
        return [Block("heading", "#" * level + " " + text)] if text else []
    if (
        len(group) == 1
        and first.y < FOOTER_Y
        and first.text.strip().isdigit()
    ):
        return [Block("page_number", f"<page_number>{first.text.strip()}</page_number>")]
    text = " ".join(l.text.strip() for l in group if l.text.strip())
    if text and set(text.split(" ")) == {FIGURE_PLACEHOLDER}:
        # an image tiled into strips paints one placeholder per piece —
        # a placeholder-only block collapses to a single figure mark
        return [Block("figure", FIGURE_PLACEHOLDER)]
    return [Block("para", text)] if text else []


def _table_block(group: list[LayoutLine]) -> Block:
    parts = ["<table>"]
    for line in group:
        cell_tag = "th" if line.kind == "th" else "td"
        parts.append("<tr>")
        for cell in line.text.split("|"):
            parts.append(f"<{cell_tag}>{cell.strip()}</{cell_tag}>")
        parts.append("</tr>")
    parts.append("</table>")
    return Block("table", "".join(parts))


def pdf_to_pages(
    payload: bytes,
) -> list[tuple[int, str, list[tuple[str, int, int, float]]]]:
    """Full layout pass: payload → [(page_no, markdown, spans)] in page order."""
    if is_pdf(payload) and not payload.startswith(SYNTH_MAGIC):
        from zerox_spark.extract.pdf import real_pdf_to_pages

        return real_pdf_to_pages(payload)
    out = []
    for page in parse_pdf(payload):
        markdown, spans = join_blocks(segment_page(page))
        out.append((page.no, markdown, spans))
    out.sort(key=lambda t: t[0])
    return out
